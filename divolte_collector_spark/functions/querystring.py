"""Query-string multimap parsing (reference §2.6).

The reference parses a raw query string into
``map<string, array<string>>`` — URL-decoded keys and values, multiple
values per key preserved in order, valueless params mapping to ``""``
(QueryStringParser.java:37-79; exposed to the DSL as ``uri.query()``,
DslRecordMapping.java:522-560).

Spark's ``str_to_map`` is single-valued, so the multimap is composed
from array expressions — all JVM-side (whole-stage codegen), no UDF:

    split '&' -> entry structs (key, value) -> group values by key.

The per-row grouping is O(distinct_keys * pairs) which is fine for the
short query strings this exists for (the reference's wire protocol has
~15 params).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def qs_entries(qs: Column) -> Column:
    """Raw query string -> array<struct<key,value>> with URL-decoding.

    Valueless params (no '=') decode to value "" per
    QueryStringParser.java:61-66; the VALUE is everything after the
    FIRST '=' (``t=dGVzdA==`` keeps its base64 padding, ``a=b=c``
    keeps ``b=c``), matching the reference parser and this repo's own
    Python checksum decode — split_part at index 2 would truncate at
    the second separator.
    """
    pairs = F.split(qs, "&")
    return F.transform(
        pairs,
        lambda p: F.struct(
            F.try_url_decode(F.substring_index(p, "=", 1)).alias("key"),
            F.try_url_decode(
                F.when(
                    p.contains("="),
                    p.substr(
                        F.length(F.substring_index(p, "=", 1)) + 2,
                        F.lit(1 << 20),
                    ),
                ).otherwise(F.lit(""))
            ).alias("value"),
        ),
    )


def qs_multimap(qs: Column) -> Column:
    """Raw query string -> map<string, array<string>> (multi-valued).

    A parameter whose KEY fails URL decoding (``a%zz=1``) is absent
    from the map rather than a null key — map_from_arrays raises
    NULL_MAP_KEY at runtime otherwise, failing the whole job on one
    corrupt request (the uri.py contract is undecodable => absent)."""
    entries = qs_entries(qs)
    keys = F.filter(
        F.array_distinct(F.transform(entries, lambda e: e.key)),
        lambda k: k.isNotNull(),
    )
    return F.map_from_arrays(
        keys,
        F.transform(
            keys,
            lambda k: F.transform(
                F.filter(entries, lambda e: e.key == k), lambda e: e.value
            ),
        ),
    )


def qs_value(qs_map: Column, key: str) -> Column:
    """First value for key (uri.query().value(k), DslRecordMapping.java:540-545)."""
    return F.element_at(F.element_at(qs_map, F.lit(key)), 1)


def qs_value_list(qs_map: Column, key: str) -> Column:
    """All values for key (uri.query().valueList(k), DslRecordMapping.java:547-551)."""
    return F.element_at(qs_map, F.lit(key))

# --- Python twin of the strict JVM decode (Arrow decode path) ----------------

import re as _re

_PCT_RUN = _re.compile(r"(?:%[0-9a-fA-F]{2})+")


def try_url_decode_py(s: "str | None") -> "str | None":
    """Exact Python twin of ``F.try_url_decode`` (java.net.URLDecoder
    UTF-8 semantics), used by the Arrow-batched wire decoder so both
    decode paths agree byte-for-byte:

    - ``+`` -> space;
    - runs of valid ``%XX`` escapes -> bytes, decoded UTF-8 with
      U+FFFD replacement (``%FF`` -> one replacement char, exactly
      java's ``new String(bytes, UTF_8)``);
    - any stray/truncated/non-hex ``%`` -> None (decode failure);
    - None -> None.

    Pinned against the JVM function over an adversarial corpus in
    tests/test_wire_sources.py.
    """
    if s is None:
        return None
    s = s.replace("+", " ")
    if "%" not in s:
        return s
    out: list[str] = []
    last = 0
    for m in _PCT_RUN.finditer(s):
        seg = s[last : m.start()]
        if "%" in seg:  # a '%' not opening a valid escape
            return None
        out.append(seg)
        run = m.group(0)
        out.append(bytes.fromhex(run.replace("%", "")).decode("utf-8", "replace"))
        last = m.end()
    seg = s[last:]
    if "%" in seg:
        return None
    out.append(seg)
    return "".join(out)
