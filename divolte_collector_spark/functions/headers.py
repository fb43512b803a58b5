"""HTTP header value operators (reference §2.8).

``header(name)`` produces *all* occurrences of a header, each split on
commas with RFC-7230 quoted-string and backslash-escape handling, each
value trimmed of surrounding whitespace (HeaderValueParser.java:20-124
— behavior reimplemented from the grammar: values separated by ``,``,
``"``-quoted segments keep commas/spaces, ``\\``-escapes inside quotes
are unwrapped; empty values — doubled/trailing commas, empty quoted
strings, whitespace-only segments — are skipped entirely).

Quoted-string scanning is inherently stateful, so the split is a small
pure function in an Arrow-batched pandas UDF (headers are short; this
is off the analytics hot path). Accessors (first/last/get/
commaSeparated) are plain array expressions.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql import types as T


def split_header_value(value: str) -> list[str]:
    """Split one raw header line into its comma-separated values.

    Exact port of the reference grammar (HeaderValueParser.java:20-193):
    - values split on top-level commas; EMPTY values are skipped
      (trailing/doubled commas yield nothing);
    - quoted strings keep their content verbatim (incl. commas and
      edge whitespace) with backslash escapes resolved;
    - runs of SP/HT between tokens inside one value collapse to a
      single space; leading/trailing whitespace of a value is dropped.
    """
    out: list[str] = []
    i, n = 0, len(value)
    while i < n:
        buf: list[str] = []
        # loop until a non-empty value is accumulated or input ends
        while i < n and not buf:
            while i < n and value[i] in " \t":  # *(SP|HT)
                i += 1
            ws_skipped = False
            while i < n:
                c = value[i]
                if c == ",":
                    i += 1
                    break
                if c == '"':
                    i += 1
                    if ws_skipped:
                        buf.append(" ")
                        ws_skipped = False
                    while i < n:  # quoted-string with \-escapes
                        q = value[i]
                        if q == '"':
                            i += 1
                            break
                        if q == "\\":
                            i += 1
                            if i < n:
                                buf.append(value[i])
                                i += 1
                        else:
                            buf.append(q)
                            i += 1
                else:
                    if ws_skipped:
                        buf.append(" ")
                        ws_skipped = False
                    start = i
                    i += 1
                    while i < n and value[i] not in '," \t':
                        i += 1
                    buf.append(value[start:i])
                if i < n and value[i] in " \t":
                    ws_skipped = True
                    while i < n and value[i] in " \t":
                        i += 1
        if buf:
            out.append("".join(buf))
    return out


@pandas_udf(T.ArrayType(T.StringType()))
def split_header_value_udf(s: pd.Series) -> pd.Series:
    return s.map(lambda v: None if v is None else split_header_value(v), na_action="ignore")


@pandas_udf(T.ArrayType(T.StringType()))
def split_header_lines_udf(s: pd.Series) -> pd.Series:
    """array of raw header lines -> flattened comma-split values."""

    def go(lines):
        if lines is None:
            return None
        out: list[str] = []
        for line in lines:
            if line is not None:
                out.extend(split_header_value(line))
        return out

    return s.map(go, na_action="ignore")


def header_values(headers_map: Column, name: str) -> Column:
    """``header(n)`` over a ``map<string, array<string>>`` of raw header
    lines (keys lowercase): every occurrence comma-split and flattened,
    order preserved (DslRecordMapping.java:658-663)."""
    return split_header_lines_udf(F.element_at(headers_map, F.lit(name.lower())))


def header_first(values: Column) -> Column:
    """``.first()`` (DslRecordMapping.java:670). ``try_element_at``:
    out-of-range is ABSENT (null), not an error — ANSI element_at
    would throw on an empty value list."""
    return F.try_element_at(values, F.lit(1))


def header_last(values: Column) -> Column:
    """``.last()`` (DslRecordMapping.java:680)."""
    return F.try_element_at(values, F.lit(-1))


def header_get(values: Column, i: int) -> Column:
    """``.get(i)``: 0-based; negative counts from the end; any
    out-of-range index is absent (DslRecordMapping.java:701-720)."""
    return F.try_element_at(values, F.lit(i + 1 if i >= 0 else i))


def header_comma_separated(values: Column) -> Column:
    """``.commaSeparated()`` (DslRecordMapping.java:722-726)."""
    return F.array_join(values, ",")


# --- X-Forwarded-For peer replacement ---------------------------------------

#: dotted-quad IPv4, octets 0-255
_IPV4_RE = (
    r"(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
    r"(\.(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])){3}"
)
#: RFC-4291 textual IPv6 (full, '::'-compressed, and IPv4-mapped tails)
_IPV6_RE = (
    r"("
    r"([0-9A-Fa-f]{1,4}:){7}[0-9A-Fa-f]{1,4}"
    r"|([0-9A-Fa-f]{1,4}:){1,7}:"
    r"|([0-9A-Fa-f]{1,4}:){1,6}:[0-9A-Fa-f]{1,4}"
    r"|([0-9A-Fa-f]{1,4}:){1,5}(:[0-9A-Fa-f]{1,4}){1,2}"
    r"|([0-9A-Fa-f]{1,4}:){1,4}(:[0-9A-Fa-f]{1,4}){1,3}"
    r"|([0-9A-Fa-f]{1,4}:){1,3}(:[0-9A-Fa-f]{1,4}){1,4}"
    r"|([0-9A-Fa-f]{1,4}:){1,2}(:[0-9A-Fa-f]{1,4}){1,5}"
    r"|[0-9A-Fa-f]{1,4}:(:[0-9A-Fa-f]{1,4}){1,6}"
    r"|:((:[0-9A-Fa-f]{1,4}){1,7}|:)"
    r"|([0-9A-Fa-f]{1,4}:){1,4}:" + _IPV4_RE +
    r"|::([Ff]{4}:)?" + _IPV4_RE +
    r")"
)
_IP_LITERAL_RE = f"^({_IPV4_RE}|{_IPV6_RE})$"


def is_ip_literal(col: Column) -> Column:
    """True when ``col`` is a textual IPv4 or IPv6 address literal."""
    return col.rlike(_IP_LITERAL_RE)


def xff_remote_host(xff_line: Column, peer: Column) -> Column:
    """Peer address under ``use_x_forwarded_for`` — the reference's
    ProxyAdjacentPeerAddressHandler.java:40-58: from the LAST
    ``X-Forwarded-For`` header line (``getLast``; with an
    ``array<string>`` of repeated headers pass
    ``F.element_at(col, -1)``), take the substring after its last
    comma, trimmed; if that parses as an address the peer is replaced,
    otherwise (or with no XFF at all) the original peer stands.

    One deliberate divergence: the reference's
    ``InetAddress.getByName`` would also DNS-resolve a hostname entry;
    a distributed engine must not do per-row DNS, so only address
    LITERALS are accepted — a hostname falls back to the peer like any
    unparseable entry.
    """
    candidate = F.trim(F.element_at(F.split(xff_line, ","), -1))
    return F.when(is_ip_literal(candidate), candidate).otherwise(peer)


def xff_scheme(proto_line: Column, scheme: Column) -> Column:
    """Request scheme under a proxy — the second half of
    ProxyAdjacentPeerAddressHandler.java (:60): the FIRST
    ``X-Forwarded-Proto`` value replaces the scheme verbatim when
    present (the reference applies it with no validation; with an
    ``array<string>`` of repeated headers pass
    ``F.element_at(col, 1)``)."""
    first = F.trim(F.element_at(F.split(proto_line, ","), 1))
    return F.when(
        proto_line.isNotNull() & (first != ""), first
    ).otherwise(scheme)
