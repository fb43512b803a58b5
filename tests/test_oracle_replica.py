"""Regression tests for the local oracle replica (tools/check_oracle.py)
and the signed-zero discipline of gated query outputs.

The round-4 driver failure class: Spark's JVM double arithmetic can
emit IEEE ``-0.0`` (e.g. ``0 * -2.25``) where DuckDB's decimal-then-
cast path emits ``+0.0``; the driver's exact value hash distinguishes
them, so the replica's strict mode must too (it silently folded
``-0.0 -> 0.0`` for four rounds), and no gated query should emit a
negative zero at all (``+ F.lit(0.0)`` normalizes it).
"""

from __future__ import annotations

import importlib.util

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, FloatType

from divolte_collector_spark.queries import all_queries

SF_DIR = "/root/testdata/sf0.001"


def _load_check_oracle():
    spec = importlib.util.spec_from_file_location(
        "check_oracle", "/root/repo/tools/check_oracle.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_strict_norm_preserves_signed_zero():
    co = _load_check_oracle()
    # strict mode is byte-faithful to the driver hash: -0.0 != 0.0
    assert co.norm_cell(-0.0, strict=True) != co.norm_cell(0.0, strict=True)
    assert co.norm_cell(-0.0, strict=True) == "-0.0"
    # loose mode still folds the sign away (diagnostic convenience)
    assert co.norm_cell(-0.0, strict=False) == co.norm_cell(0.0, strict=False)
    # and strict repr stays exact for ordinary doubles
    assert co.norm_cell(0.1 + 0.2, strict=True) == repr(0.30000000000000004)


def test_no_gated_query_emits_negative_zero(spark):
    """Property (VERDICT r4 #9): no double/float cell of any gated
    query output is a negative zero. JVM ``Double.toString(-0.0)``
    is ``"-0.0"``, so casting to string detects the sign without
    ANSI-unsafe division, and the check aggregates executor-side
    without collecting result rows."""
    offenders = {}
    for name, rq in sorted(all_queries().items()):
        df = rq.fn(spark, SF_DIR)
        fcols = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (DoubleType, FloatType))
        ]
        if not fcols:
            continue
        aggs = [
            F.sum(
                F.when(
                    (F.col(c) == 0)
                    & F.col(c).cast("string").startswith("-"),
                    1,
                ).otherwise(0)
            ).alias(c)
            for c in fcols
        ]
        row = df.agg(*aggs).collect()[0]
        bad = [c for c in fcols if (row[c] or 0) > 0]
        if bad:
            offenders[name] = bad
        spark.catalog.clearCache()
    assert not offenders, f"negative-zero cells in: {offenders}"
