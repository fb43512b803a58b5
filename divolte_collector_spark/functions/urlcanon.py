"""Canonical-URL normalization for URL-identity dedup.

Composes the §2.6 URI surface (functions/uri.py — parse_url accessors
mirroring UriValueProducer, DslRecordMapping.java:449-530) and the
query-string grammar (functions/querystring.py) into the normalization
crawl dedup needs:

- scheme and host lowercased;
- the scheme's default port stripped (443/https, 80/http), any other
  port kept;
- tracking parameters (``utm_*`` by default) dropped;
- surviving query parameters sorted by key (then value);
- the fragment discarded;
- a query string that becomes empty loses its ``?`` entirely.

Everything is JVM-side Column expressions (whole-stage codegen) — a
narrow map over the scan, so canonical-URL dedup costs the same as
exact dedup: one hash-groupBy on the derived key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from divolte_collector_spark.functions.querystring import qs_entries
from divolte_collector_spark.functions.uri import (
    uri_host,
    uri_port,
    uri_raw_path,
    uri_raw_query,
    uri_scheme,
)

DEFAULT_PORTS = {"https": 443, "http": 80}

_BIG = 1 << 20  # "rest of string" length for substr


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
    """The same five parts from regex-free string splits — one pass of
    cheap substring arithmetic instead of five regex evaluations
    (measured ~5x on the canonicalization map). Correct for the
    standard ``scheme://host[:port]/path[?query][#fragment]`` shape;
    NOT for userinfo (``u@h``) or IPv6-literal hosts — use the parity
    path (fast=False) for those. Equivalence on the standard shape is
    pinned in tests/test_urlcanon.py."""
    no_frag = F.substring_index(url, "#", 1)
    scheme = F.substring_index(no_frag, "://", 1)
    rest = no_frag.substr(F.length(scheme) + 4, F.lit(_BIG))
    hostport = F.substring_index(rest, "/", 1)
    pathq = rest.substr(F.length(hostport) + 1, F.lit(_BIG))
    raw_path = F.substring_index(pathq, "?", 1)
    raw_query = F.nullif(
        pathq.substr(F.length(raw_path) + 2, F.lit(_BIG)), F.lit("")
    )
    host = F.substring_index(hostport, ":", 1)
    port = F.nullif(
        hostport.substr(F.length(host) + 2, F.lit(_BIG)), F.lit("")
    ).try_cast("int")
    return scheme, host, port, raw_path, raw_query


def canonical_url(
    url: Column, tracking_prefix: str = "utm_", fast: bool = False
) -> Column:
    """Normalize ``url`` to its canonical identity string.

    ``fast=True`` swaps the parse_url accessors for the regex-free
    split decomposition (see :func:`_parts_fast`); both modes produce
    identical output for standard-shaped URLs."""
    scheme_raw, host_raw, port, raw_path, raw_query = (
        _parts_fast(url) if fast else _parts_parity(url)
    )
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
            F.coalesce(qs_entries(raw_query), F.array()),
            lambda e: ~e.key.startswith(tracking_prefix),
        )
    )
    qstr = F.array_join(
        F.transform(kept, lambda e: F.concat(e.key, F.lit("="), e.value)), "&"
    )
    q_part = F.when(qstr == "", F.lit("")).otherwise(
        F.concat(F.lit("?"), qstr)
    )
    return F.concat(scheme, F.lit("://"), host, port_part, raw_path, q_part)


def with_canonical_url(
    df: DataFrame,
    url: Column,
    out_col: str = "canonical_url",
    tracking_prefix: str = "utm_",
    fast: bool = True,
) -> DataFrame:
    """Add ``out_col`` = canonical form of ``url`` via STAGED selects.

    The single-Column form above composes one expression tree in which
    shared pieces (the query string, the sorted param array) are
    referenced more than once; the higher-order-function chain is
    interpreted, so every reference re-evaluates its whole subtree —
    measured 28.7 s for the 10x-events canonicalization map versus
    8.6 s staged (3.3x). Staging each intermediate as a NAMED column
    across selects makes every piece evaluate once per row; Catalyst's
    CollapseProject keeps the stages because the duplicated
    expressions are non-cheap. Same output, same narrow-map plan —
    only the expression wiring differs."""
    parts = _parts_fast(url) if fast else _parts_parity(url)
    scheme_raw, host_raw, port, raw_path, raw_query = parts
    staged = df.select(
        "*",
        F.lower(scheme_raw).alias("_uc_s"),
        F.lower(host_raw).alias("_uc_h"),
        port.alias("_uc_p"),
        raw_path.alias("_uc_pa"),
        raw_query.alias("_uc_q"),
    )
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
                F.coalesce(qs_entries(F.col("_uc_q")), F.array()),
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
            F.col("_uc_pa"),
            F.when(F.col("_uc_qs") == "", F.lit("")).otherwise(
                F.concat(F.lit("?"), F.col("_uc_qs"))
            ),
        ).alias(out_col),
    )
    return out.drop(
        "_uc_s", "_uc_h", "_uc_p", "_uc_pa", "_uc_q", "_uc_pp",
        "_uc_kept", "_uc_qs",
    )
