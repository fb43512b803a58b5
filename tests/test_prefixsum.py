"""Distributed global prefix sum: parity with the single-task global
window it replaces, including null order keys (nulls-first peers)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from divolte_collector_spark.operators.prefixsum import global_cumsum


def _naive(df, order_col, value_col):
    w = Window.orderBy(order_col).rangeBetween(Window.unboundedPreceding, 0)
    return df.withColumn("cumsum", F.sum(value_col).over(w))


def test_matches_global_window(spark):
    df = spark.range(500).select(
        F.col("id").alias("k"), (F.col("id") % 7 + 1).alias("v")
    )
    got = {
        r.k: r.cumsum
        for r in global_cumsum(df, "k", "v", bucket_width=50).collect()
    }
    want = {r.k: r.cumsum for r in _naive(df, "k", "v").collect()}
    assert got == want


def test_null_order_keys_form_first_peer_group(spark):
    df = spark.createDataFrame(
        [(None, 10), (None, 5), (1, 1), (2, 2), (3, 3)],
        "k int, v int",
    )
    rows = global_cumsum(df, "k", "v", bucket_width=2).collect()
    got = sorted(
        [(r.k, r.cumsum) for r in rows],
        key=lambda t: (t[0] is not None, t[0] or 0),
    )
    # nulls sort first and are frame peers: both carry the null-group
    # total (15); non-null rows accumulate on top of it
    want = sorted(
        [(r.k, r.cumsum) for r in _naive(df, "k", "v").collect()],
        key=lambda t: (t[0] is not None, t[0] or 0),
    )
    assert got == want
    assert dict(want)[1] == 16  # sanity: 15 (nulls) + 1


def test_global_cumsum_fractional_values(spark):
    # REGRESSION: per-bucket offsets were truncated with int(), so a
    # double value column produced wrong cumulative sums
    from divolte_collector_spark.operators.prefixsum import global_cumsum

    df = spark.createDataFrame(
        [(0, 0.5), (1, 0.5), (2, 0.5)], "ord long, v double"
    )
    out = {
        r.ord: r.csum
        for r in global_cumsum(
            df, order_col="ord", value_col="v", out_col="csum",
            bucket_width=1.0,
        ).collect()
    }
    assert out == {0: 0.5, 1: 1.0, 2: 1.5}


def test_adaptive_bucket_width_bounds_driver_step(spark):
    """The default (no bucket, no width) derives the bucket width from
    the key span: ~10k buckets whether the key range is 200 or 10^8 —
    the driver-side prefix loop must NOT grow with the key space."""
    from divolte_collector_spark.operators.prefixsum import (
        _TARGET_BUCKETS,
        _derive_bucket_width,
        global_cumsum,
    )

    # keys sparse over a 10^8 range: a fixed width of 1000 would make
    # 10^5 buckets; the derived width keeps it at the target
    df = spark.range(0, 2000).select(
        (F.col("id") * 50_000).alias("k"), F.lit(1).alias("v")
    )
    width = _derive_bucket_width(df, "k")
    span = (2000 - 1) * 50_000
    n_buckets = span / width + 1
    assert n_buckets <= _TARGET_BUCKETS + 2, (width, n_buckets)

    got = {
        r.k: r.cumsum for r in global_cumsum(df, "k", "v").collect()
    }
    assert got[0] == 1
    assert got[50_000 * 1999] == 2000

    # tiny span (fractional keys): still multi-bucket-safe and correct
    df2 = spark.range(0, 100).select(
        (F.col("id") / 1000.0).alias("k"), F.lit(1).alias("v")
    )
    got2 = {r.k: r.cumsum for r in global_cumsum(df2, "k", "v").collect()}
    assert got2[0.099] == 100
