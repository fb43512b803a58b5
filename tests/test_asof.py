"""Generic as-of join operator: backward/forward, exact-match policy,
tolerance, null when no match."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from divolte_collector_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _frames(spark):
    trades = spark.createDataFrame(
        [
            ("A", "2024-01-01 10:00:05", 1),
            ("A", "2024-01-01 10:00:10", 2),
            ("B", "2024-01-01 10:00:03", 3),
            ("C", "2024-01-01 10:00:03", 4),  # no quotes at all
        ],
        "sym string, t string, trade_id int",
    ).withColumn("t", F.col("t").cast("timestamp"))
    quotes = spark.createDataFrame(
        [
            ("A", "2024-01-01 10:00:04", 100.0),
            ("A", "2024-01-01 10:00:05", 101.0),  # exact tie with trade 1
            ("A", "2024-01-01 10:00:08", 102.0),
            ("B", "2024-01-01 10:00:30", 200.0),  # only AFTER B's trade
        ],
        "sym string, qt string, px double",
    ).withColumn("qt", F.col("qt").cast("timestamp"))
    return trades, quotes


def test_backward_with_exact_matches(spark):
    trades, quotes = _frames(spark)
    out = {
        r.trade_id: r
        for r in asof_join(trades, quotes, "sym", "t", "qt").collect()
    }
    assert out[1].asof_px == 101.0  # exact match taken
    assert out[2].asof_px == 102.0  # latest <= 10:00:10
    assert out[3].asof_px is None  # B's only quote is in the future
    assert out[4].asof_px is None  # C has no quotes
    assert out[1].asof_qt == _ts("2024-01-01 10:00:05")


def test_backward_strict(spark):
    trades, quotes = _frames(spark)
    out = {
        r.trade_id: r
        for r in asof_join(
            trades, quotes, "sym", "t", "qt", allow_exact_matches=False
        ).collect()
    }
    assert out[1].asof_px == 100.0  # strictly earlier only


def test_forward(spark):
    trades, quotes = _frames(spark)
    out = {
        r.trade_id: r
        for r in asof_join(
            trades, quotes, "sym", "t", "qt", direction="forward"
        ).collect()
    }
    assert out[1].asof_px == 101.0  # exact match
    assert out[3].asof_px == 200.0  # B's future quote now matches
    assert out[2].asof_px is None  # nothing at/after 10:00:10 for A


def test_tolerance(spark):
    trades, quotes = _frames(spark)
    out = {
        r.trade_id: r
        for r in asof_join(
            trades, quotes, "sym", "t", "qt", tolerance_seconds=1.5
        ).collect()
    }
    assert out[1].asof_px == 101.0  # delta 0
    assert out[2].asof_px is None  # best match is 2s old > 1.5s


def test_left_columns_preserved(spark):
    trades, quotes = _frames(spark)
    out = asof_join(trades, quotes, "sym", "t", "qt")
    assert set(trades.columns) <= set(out.columns)
    assert out.count() == trades.count()


def test_range_join_semantics(spark):
    """Half-open [lo, hi) bands, multi-bucket spanning, left-null when
    no band contains the point, hash join not nested-loop."""
    from divolte_collector_spark.operators.rangejoin import range_join

    facts = spark.createDataFrame(
        [(0.0,), (499.9,), (500.0,), (1999.99,), (2000.0,), (-5.0,)], "v double"
    )
    bands = spark.createDataFrame(
        [(0.0, 500.0, "low"), (500.0, 2000.0, "mid")], "lo double, hi double, tag string"
    )
    out = {
        r.v: r.tag
        for r in range_join(facts, bands, "v", bucket_width=100.0).collect()
    }
    assert out[0.0] == "low"
    assert out[499.9] == "low"
    assert out[500.0] == "mid"  # hi exclusive, lo inclusive
    assert out[1999.99] == "mid"
    assert out[2000.0] is None  # beyond all bands
    assert out[-5.0] is None

    plan = range_join(facts, bands, "v", bucket_width=100.0)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
