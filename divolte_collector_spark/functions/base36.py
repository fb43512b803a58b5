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
    magnitude = F.conv(F.regexp_replace(col, "^-", ""), 36, 10).try_cast("long")
    return F.when(col.rlike(_B36_RE), sign * magnitude)


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
