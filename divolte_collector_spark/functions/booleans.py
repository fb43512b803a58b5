"""Optional-boolean algebra (reference §2.12, DslRecordMapping.java).

The DSL's conditions are ``Optional<Boolean>`` compositions, NOT SQL
three-valued logic:

- ``a.and(b)`` / ``a.or(b)``: if *either* side is absent the result is
  absent (:1154-1176). SQL 3VL differs: ``true OR null = true`` — so
  plain ``|``/``&`` must not be used.
- ``a.equalTo(b)`` producer-vs-producer compares the Optionals: two
  absents are EQUAL (true) (:1047-1053); vs a literal, absent => false
  (:1055-1060).
- ``not(x)``: absent-preserving (:1178-1183) — Spark's ``~`` already
  propagates null, matching.
- ``isPresent()/isAbsent()``: always defined (:1062-1070).
- ``when(cond)``: an absent condition means the block does NOT run
  (:144-163) => ``cond_holds`` below.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def opt_and(a: Column, b: Column) -> Column:
    return F.when(a.isNull() | b.isNull(), F.lit(None).cast("boolean")).otherwise(a & b)


def opt_or(a: Column, b: Column) -> Column:
    return F.when(a.isNull() | b.isNull(), F.lit(None).cast("boolean")).otherwise(a | b)


def opt_not(a: Column) -> Column:
    return ~a


def equal_to(a: Column, b: Column) -> Column:
    """Producer vs producer: Optional equality — both absent => true."""
    return a.eqNullSafe(b)


def equal_to_literal(a: Column, lit) -> Column:
    """Producer vs literal: absent => false (always defined)."""
    return a.eqNullSafe(F.lit(lit)) & a.isNotNull()


def is_present(a: Column) -> Column:
    return a.isNotNull()


def is_absent(a: Column) -> Column:
    return a.isNull()


def cond_holds(cond: Column) -> Column:
    """Collapse an optional condition to definite: absent => false —
    the guard form used by ``when(cond) apply {...}``."""
    return F.coalesce(cond, F.lit(False))
