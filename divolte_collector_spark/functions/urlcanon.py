"""Canonical-URL normalization for URL-identity dedup.

Composes the §2.6 URI surface (functions/uri.py — parse_url accessors
mirroring UriValueProducer, DslRecordMapping.java:449-530) into the
normalization crawl dedup needs:

- scheme and host lowercased;
- the scheme's default port stripped (443/https, 80/http), any other
  port kept;
- tracking parameters (``utm_*`` by default) dropped;
- surviving query parameters sorted by key (then value);
- the fragment discarded;
- a query string that becomes empty loses its ``?`` entirely.

The query string is canonicalized at the RAW byte level: parameters
are split and sorted WITHOUT URL-decoding, and values keep everything
after the first ``=``. Decoding before the rebuild is a correctness
trap: ``?a=%26b%3D2`` (one param whose value is ``&b=2``) would
rebuild to the same bytes as ``?a=&b=2`` (two params), silently
merging distinct pages — so percent-encoding differences deliberately
do NOT merge (``%41`` != ``A``), the conservative direction for an
identity key. The decoded multimap view stays in
functions/querystring.py for the mapping DSL.

Everything is JVM-side Column expressions — a narrow map over the
scan, so canonical-URL dedup costs the same as exact dedup: one
hash-groupBy on the derived key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from divolte_collector_spark.functions.uri import (
    uri_host,
    uri_port,
    uri_raw_path,
    uri_raw_query,
    uri_scheme,
)

DEFAULT_PORTS = {"https": 443, "http": 80}

_BIG = 1 << 20  # "rest of string" length for substr


def raw_qs_entries(qs: Column) -> Column:
    """Raw query string -> array<struct<key,value>> with NO decoding:
    the key is everything before the first ``=``, the value everything
    after it (so ``a=b=c`` keeps value ``b=c``), valueless params map
    to ``""``. Byte-preserving on purpose — see the module docstring."""
    return F.transform(
        F.split(qs, "&"),
        lambda p: F.struct(
            F.substring_index(p, "=", 1).alias("key"),
            F.when(
                p.contains("="),
                p.substr(
                    F.length(F.substring_index(p, "=", 1)) + 2, F.lit(_BIG)
                ),
            )
            .otherwise(F.lit(""))
            .alias("value"),
        ),
    )


def _parts_parity(url: Column) -> tuple[Column, Column, Column, Column, Column]:
    """(scheme, host, port, raw_path, raw_query) via the §2.6 parse_url
    accessors — java.net.URI semantics, one regex pass per part."""
    return (
        uri_scheme(url),
        uri_host(url),
        uri_port(url),
        uri_raw_path(url),
        uri_raw_query(url),
    )


def _parts_fast(url: Column) -> tuple[Column, Column, Column, Column, Column]:
    """The same five parts from regex-free string splits — cheap
    substring arithmetic instead of five regex evaluations (measured
    ~5x on the canonicalization map). Correct for the standard
    ``scheme://host[:port]/path[?query][#fragment]`` shape; NOT for
    userinfo (``u@h``) or IPv6-literal hosts — use the parity path
    (fast=False) for those. Equivalence on the standard shape is
    pinned in tests/test_urlcanon.py."""
    no_frag = F.substring_index(url, "#", 1)
    scheme = F.substring_index(no_frag, "://", 1)
    rest = no_frag.substr(F.length(scheme) + 4, F.lit(_BIG))
    # split the query off FIRST: a path-less URL ('https://h?a=1') has
    # its '?' before any '/', and splitting on '/' first would fold the
    # whole query string into the host
    rest_nq = F.substring_index(rest, "?", 1)
    raw_query = F.nullif(
        rest.substr(F.length(rest_nq) + 2, F.lit(_BIG)), F.lit("")
    )
    hostport = F.substring_index(rest_nq, "/", 1)
    raw_path = rest_nq.substr(F.length(hostport) + 1, F.lit(_BIG))
    host = F.substring_index(hostport, ":", 1)
    port = F.nullif(
        hostport.substr(F.length(host) + 2, F.lit(_BIG)), F.lit("")
    ).try_cast("int")
    return scheme, host, port, raw_path, raw_query


def _canonical_from_parts(
    scheme_raw: Column,
    host_raw: Column,
    port: Column,
    raw_path: Column,
    raw_query: Column,
    tracking_prefix: str,
) -> Column:
    scheme = F.lower(scheme_raw)
    host = F.lower(host_raw)
    default_port = F.lit(None).cast("int")
    for s, p in DEFAULT_PORTS.items():
        default_port = F.when(scheme == s, p).otherwise(default_port)
    port_part = F.when(
        port.isNull() | (port == default_port), F.lit("")
    ).otherwise(F.concat(F.lit(":"), port.cast("string")))
    kept = F.array_sort(
        F.filter(
            F.when(raw_query.isNull(), F.array()).otherwise(
                raw_qs_entries(raw_query)
            ),
            lambda e: ~e.key.startswith(tracking_prefix),
        )
    )
    qstr = F.array_join(
        F.transform(kept, lambda e: F.concat(e.key, F.lit("="), e.value)), "&"
    )
    q_part = F.when(qstr == "", F.lit("")).otherwise(
        F.concat(F.lit("?"), qstr)
    )
    # parse_url PATH is null for a path-less URL; a null leg would null
    # the whole concat
    return F.concat(
        scheme, F.lit("://"), host, port_part,
        F.coalesce(raw_path, F.lit("")), q_part,
    )


def canonical_url(
    url: Column, tracking_prefix: str = "utm_", fast: bool = False
) -> Column:
    """Normalize ``url`` to its canonical identity string.

    ``fast=True`` swaps the parse_url accessors for the regex-free
    split decomposition (see :func:`_parts_fast`); both modes produce
    identical output for standard-shaped URLs. Prefer
    :func:`with_canonical_url` in query plans — the single-Column form
    re-evaluates shared subtrees inside interpreted
    higher-order-function chains."""
    parts = _parts_fast(url) if fast else _parts_parity(url)
    return _canonical_from_parts(*parts, tracking_prefix)


def with_canonical_url(
    df: DataFrame,
    url: Column,
    out_col: str = "canonical_url",
    tracking_prefix: str = "utm_",
    fast: bool = True,
) -> DataFrame:
    """Add ``out_col`` = canonical form of ``url`` via STAGED selects.

    The single-Column form composes one expression tree in which
    shared pieces (the url itself, the split chain, the sorted param
    array) are referenced more than once; the higher-order-function
    chain is interpreted, so every reference re-evaluates its whole
    subtree — measured 28.7 s for the 10x-events canonicalization map
    versus 8.6 s staged (3.3x). Staging each intermediate as a NAMED
    column across selects makes every piece evaluate once per row;
    Catalyst's CollapseProject keeps the stages because the duplicated
    expressions are non-cheap. Same output, same narrow-map plan —
    only the expression wiring differs. The input ``url`` expression
    itself is staged first, so an expensive synthesized url evaluates
    once, not once per derived part."""
    staged = df.select("*", url.alias("_uc_url"))
    if fast:
        # stage the split chain too: each link is referenced by the
        # next AND by its own derived parts
        staged = (
            staged.select(
                "*",
                F.substring_index(F.col("_uc_url"), "#", 1).alias("_uc_nf"),
            )
            .select(
                "*",
                F.substring_index(F.col("_uc_nf"), "://", 1).alias("_uc_sr"),
            )
            .select(
                "*",
                F.col("_uc_nf")
                .substr(F.length("_uc_sr") + 4, F.lit(_BIG))
                .alias("_uc_rest"),
            )
            .select(
                # query split FIRST: a path-less URL has '?' before '/'
                "*",
                F.substring_index(F.col("_uc_rest"), "?", 1).alias(
                    "_uc_rnq"
                ),
            )
            .select(
                "*",
                F.nullif(
                    F.col("_uc_rest").substr(
                        F.length("_uc_rnq") + 2, F.lit(_BIG)
                    ),
                    F.lit(""),
                ).alias("_uc_q"),
                F.substring_index(F.col("_uc_rnq"), "/", 1).alias("_uc_hp"),
            )
            .select(
                "*",
                F.col("_uc_rnq")
                .substr(F.length("_uc_hp") + 1, F.lit(_BIG))
                .alias("_uc_pa"),
                F.substring_index(F.col("_uc_hp"), ":", 1).alias("_uc_hr"),
            )
            .select(
                "*",
                F.lower(F.col("_uc_sr")).alias("_uc_s"),
                F.lower(F.col("_uc_hr")).alias("_uc_h"),
                F.nullif(
                    F.col("_uc_hp").substr(
                        F.length("_uc_hr") + 2, F.lit(_BIG)
                    ),
                    F.lit(""),
                )
                .try_cast("int")
                .alias("_uc_p"),
            )
        )
        chain_cols = ["_uc_nf", "_uc_sr", "_uc_rest", "_uc_rnq", "_uc_hp",
                      "_uc_hr"]
    else:
        u = F.col("_uc_url")
        staged = staged.select(
            "*",
            F.lower(uri_scheme(u)).alias("_uc_s"),
            F.lower(uri_host(u)).alias("_uc_h"),
            uri_port(u).alias("_uc_p"),
            uri_raw_path(u).alias("_uc_pa"),
            uri_raw_query(u).alias("_uc_q"),
        )
        chain_cols = []
    default_port = F.lit(None).cast("int")
    for s, p in DEFAULT_PORTS.items():
        default_port = F.when(F.col("_uc_s") == s, p).otherwise(default_port)
    staged = staged.select(
        "*",
        F.when(
            F.col("_uc_p").isNull() | (F.col("_uc_p") == default_port),
            F.lit(""),
        )
        .otherwise(F.concat(F.lit(":"), F.col("_uc_p").cast("string")))
        .alias("_uc_pp"),
        F.array_sort(
            F.filter(
                F.when(F.col("_uc_q").isNull(), F.array()).otherwise(
                    raw_qs_entries(F.col("_uc_q"))
                ),
                lambda e: ~e.key.startswith(tracking_prefix),
            )
        ).alias("_uc_kept"),
    ).select(
        "*",
        F.array_join(
            F.transform(
                F.col("_uc_kept"),
                lambda e: F.concat(e.key, F.lit("="), e.value),
            ),
            "&",
        ).alias("_uc_qs"),
    )
    out = staged.select(
        "*",
        F.concat(
            F.col("_uc_s"),
            F.lit("://"),
            F.col("_uc_h"),
            F.col("_uc_pp"),
            F.coalesce(F.col("_uc_pa"), F.lit("")),
            F.when(F.col("_uc_qs") == "", F.lit("")).otherwise(
                F.concat(F.lit("?"), F.col("_uc_qs"))
            ),
        ).alias(out_col),
    )
    return out.drop(
        "_uc_url", "_uc_s", "_uc_h", "_uc_p", "_uc_pa", "_uc_q", "_uc_pp",
        "_uc_kept", "_uc_qs", *chain_cols,
    )
