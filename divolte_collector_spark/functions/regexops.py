"""Regex match operators (reference §2.7, MatcherValueProducer,
DslRecordMapping.java:407-444).

Java semantics: ``matcher.matches()`` is a FULL-string match;
``group(n)``/``group(name)`` yield null when there is no match. Spark's
``regexp_extract`` returns '' (not null) on no-match — wrapped with a
match guard so absence propagates correctly.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F


def _full_anchor(regex: str) -> str:
    return f"^(?:{regex})$"


def matches(col: Column, regex: str) -> Column:
    """``match(re).against(x).matches()`` — full-string match; absent
    input stays absent."""
    return F.when(col.isNotNull(), col.rlike(_full_anchor(regex)))


def match_group(col: Column, regex: str, group: int | str) -> Column:
    """``.group(n)`` / ``.group(name)``: null when the regex does not
    match the full string. A matched-but-empty group yields '' in Java
    only when the group participated; Java returns null for
    non-participating groups — regexp_extract can't distinguish, so ''
    maps to null (the reference's Optional.ofNullable on group()
    collapses the same way for absent groups, DslRecordMapping.java:427-437).
    """
    if isinstance(group, str):
        # resolve named group to its index (Java numbers groups
        # left-to-right). The DSL accepts Java syntax ``(?<name>...)``;
        # Python's re needs ``(?P<name>...)`` for the compile-time
        # lookup only — the Spark-side regex stays as written (JVM).
        compiled = re.compile(re.sub(r"\(\?<([A-Za-z][A-Za-z0-9]*)>", r"(?P<\1>", regex))
        if group not in compiled.groupindex:
            raise ValueError(f"no group named {group!r} in regex {regex!r}")
        idx = compiled.groupindex[group]
    else:
        idx = group
    anchored = _full_anchor(regex)
    extracted = F.regexp_extract(col, anchored, idx)
    return F.when(col.rlike(anchored), F.nullif(extracted, F.lit("")))
