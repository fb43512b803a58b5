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

from pyspark.sql import Column
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


def canonical_url(url: Column, tracking_prefix: str = "utm_") -> Column:
    """Normalize ``url`` to its canonical identity string."""
    scheme = F.lower(uri_scheme(url))
    host = F.lower(uri_host(url))
    port = uri_port(url)
    default_port = F.lit(None).cast("int")
    for s, p in DEFAULT_PORTS.items():
        default_port = F.when(scheme == s, p).otherwise(default_port)
    port_part = F.when(
        port.isNull() | (port == default_port), F.lit("")
    ).otherwise(F.concat(F.lit(":"), port.cast("string")))
    kept = F.array_sort(
        F.filter(
            F.coalesce(qs_entries(uri_raw_query(url)), F.array()),
            lambda e: ~e.key.startswith(tracking_prefix),
        )
    )
    qstr = F.array_join(
        F.transform(kept, lambda e: F.concat(e.key, F.lit("="), e.value)), "&"
    )
    q_part = F.when(qstr == "", F.lit("")).otherwise(
        F.concat(F.lit("?"), qstr)
    )
    return F.concat(
        scheme, F.lit("://"), host, port_part, uri_raw_path(url), q_part
    )
