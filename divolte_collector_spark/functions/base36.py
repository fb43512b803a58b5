"""Base36 wire codec (reference tryParseBase36Long/Int,
ClientSideCookieEventHandler.java:263-281; encoding side is JS
``Number.toString(36)`` in divolte.js).

All JVM-side: ``F.conv`` + regex validation. Java's
``Long.parseLong(s, 36)`` returns null-on-failure in the reference's
``tryParse`` wrappers; ``conv`` alone is lenient (parses garbage as 0),
so inputs are validated with an anchored rlike first — invalid => null,
matching tryParse semantics exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_B36_RE = "^-?[0-9a-zA-Z]+$"


def try_parse_base36_long(col: Column) -> Column:
    """Base36 string -> long; null when not parseable (tryParse).

    The sign is applied by multiplication, not a CASE branch: the
    branch form duplicated the whole conv() subtree into both arms,
    and with ~7 wire params per decode the duplicated trees dominated
    Janino whole-stage-codegen compile time (a fixed ~seconds per
    plan). Here conv() appears exactly once per call site.
    """
    sign = F.when(col.startswith("-"), F.lit(-1)).otherwise(F.lit(1)).cast("long")
    # Normalize the magnitude (lowercase, sign and leading zeros
    # stripped — at least one digit kept) and range-gate it BEFORE
    # conv: under ANSI mode conv() THROWS on unsigned-64 overflow, so
    # one garbage wire param like c=zzzzzzzzzzzzzz would kill the whole
    # batch (found by the decode-differential corpus). Equal-length
    # lowercase base36 compares lexicographically (digits 0-9a-z are in
    # ASCII order), so magnitude <= Long.MAX_VALUE ("1y2p0ij32e8e7",
    # 13 digits) is a length test plus one string compare. Anything
    # above nulls — including -2^63 exactly, matching the try_cast
    # behavior this function always had.
    m = F.regexp_replace(
        F.regexp_replace(F.lower(col), "^-", ""), "^0+(?=.)", ""
    )
    in_range = (F.length(m) < 13) | (
        (F.length(m) == 13) & (m <= F.lit("1y2p0ij32e8e7"))
    )
    magnitude = F.conv(m, 36, 10).try_cast("long")
    return F.when(col.rlike(_B36_RE) & in_range, sign * magnitude)


def try_parse_base36_int(col: Column) -> Column:
    """Base36 string -> int; null when not parseable or out of range.

    try_cast(long -> int) nulls on overflow (ANSI try semantics), which
    is exactly the range check — an explicit ``between`` guard would
    triple the expression tree (the long-parse chain re-inlined per
    reference), bloating codegen for every base36 wire param.
    """
    return try_parse_base36_long(col).try_cast("int")


def base36_encode(col: Column) -> Column:
    """Long -> lowercase base36 (JS ``toString(36)`` / Java
    ``Long.toString(v, 36)``)."""
    neg = col < 0
    body = F.lower(F.conv(F.abs(col).cast("string"), 10, 36))
    return F.when(neg, F.concat(F.lit("-"), body)).otherwise(body)


# --- Python twins (Arrow-batched decode path) --------------------------------

import re as _re

_B36_RE_PY = _re.compile(r"^-?[0-9a-zA-Z]+$")

_LONG_MAX = (1 << 63) - 1
_INT_MIN, _INT_MAX = -(1 << 31), (1 << 31) - 1


_B36_DIGITS = "0123456789abcdefghijklmnopqrstuvwxyz"


def base36_encode_py(v: "int | None") -> "str | None":
    """Exact Python twin of :func:`base36_encode` (Java
    ``Long.toString(v, 36)``): lowercase digits, ``-`` prefix for
    negatives, ``"0"`` for zero — byte-identical to the JVM
    ``conv(abs, 10, 36)`` path for every signed-64 value (pinned in
    tests). Used where a python stage must render a base36 wire param
    (the wire-roundtrip checksum ``x=``) without an extra JVM hop."""
    if v is None:
        return None
    neg = v < 0
    if neg:
        v = -v
    if v == 0:
        return "0"
    out = []
    while v:
        out.append(_B36_DIGITS[v % 36])
        v //= 36
    s = "".join(reversed(out))
    return "-" + s if neg else s


def try_parse_base36_long_py(s: "str | None") -> "int | None":
    """Exact Python twin of :func:`try_parse_base36_long` (same regex
    gate; same overflow-to-null: ``conv`` saturates at unsigned-64 max
    and ``try_cast(long)`` nulls anything whose magnitude exceeds
    2^63-1, including -2^63 itself)."""
    if s is None:
        return None
    # fast path: isascii+isalnum is exactly [0-9a-zA-Z]+ and <=12
    # digits cannot overflow (36^12 < 2^63) — skips the regex for
    # every well-formed wire param
    if len(s) <= 12 and s.isascii() and s.isalnum():
        return int(s, 36)
    if not _B36_RE_PY.match(s):
        return None
    neg = s.startswith("-")
    magnitude = int(s[1:] if neg else s, 36)
    if magnitude > _LONG_MAX:
        return None
    return -magnitude if neg else magnitude


def try_parse_base36_int_py(s: "str | None") -> "int | None":
    """Twin of :func:`try_parse_base36_int` (long parse, then
    try_cast-to-int range check)."""
    v = try_parse_base36_long_py(s)
    if v is None or not (_INT_MIN <= v <= _INT_MAX):
        return None
    return v
