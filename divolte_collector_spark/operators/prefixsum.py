"""Distributed global prefix sum (cumulative sum over a total order).

The naive formulation — ``sum(x) OVER (ORDER BY k)`` with no
PARTITION BY — collapses the whole table into ONE window task (Spark
even warns: "No Partition Defined for Window operation"). At 100 TB
that is a single-executor sort of the entire dataset: the classic
scan-primitive trap.

The scalable shape is the textbook two-phase parallel scan:

1. bucket rows by a MONOTONE function of the order key (same order
   key ⇒ same bucket; bucket boundaries respect the order);
2. per-bucket totals (one small aggregation), prefix-summed on the
   driver — |buckets| values, the only sequential step;
3. per-bucket cumulative sums via a window PARTITIONED by bucket
   (parallel across buckets), plus the broadcast bucket offset.

Cost: one aggregation shuffle + one window shuffle, both partitioned;
driver traffic is |buckets| longs. The result is identical to the
global-window formulation for any monotone bucketing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


#: driver-side bucket budget for the adaptive width: the prefix loop
#: and the broadcast offset dimension stay ~10k rows at ANY key range
#: (10B docs or 10 — the serial step is scale-invariant)
_TARGET_BUCKETS = 10_000


def _derive_bucket_width(df: DataFrame, order_col: str) -> float:
    """Bucket width from the order key's observed span (one
    column-pruned min/max aggregate), targeting ``_TARGET_BUCKETS``.
    A float width keeps fractional order keys multi-bucket; any
    positive width is monotone under ``(col / width).cast("long")``."""
    lo, hi = df.agg(
        F.min(order_col).cast("double"), F.max(order_col).cast("double")
    ).first()
    span = 0.0 if lo is None else float(hi) - float(lo)
    return (span / _TARGET_BUCKETS) or 1.0


def global_cumsum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    bucket: Column | None = None,
    bucket_width: int | None = None,
    out_col: str = "cumsum",
) -> DataFrame:
    """See ``global_cumsum_with_total`` — same scan, total discarded."""
    return global_cumsum_with_total(
        df, order_col, value_col, bucket, bucket_width, out_col
    )[0]


def global_cumsum_with_total(
    df: DataFrame,
    order_col: str,
    value_col: str,
    bucket: Column | None = None,
    bucket_width: int | None = None,
    out_col: str = "cumsum",
) -> tuple[DataFrame, int | float]:
    """Add ``out_col`` = cumulative sum of ``value_col`` in ``order_col``
    order (inclusive), computed with two partitioned shuffles instead
    of a single-task global window. Also returns the GRAND TOTAL of
    ``value_col``: the driver-side prefix loop computes it anyway (the
    final accumulator), so callers that need sum(value) — e.g. to
    place a sampling grid on the cumulative axis — get it for free
    instead of paying a second full scan plus a one-partition agg.

    ``bucket`` must be monotone non-decreasing in ``order_col``; the
    default buckets a numeric order key by ``bucket_width``. When
    ``bucket_width`` is None (the default) it is DERIVED from the
    order key's span — min/max via one column-pruned aggregate, a
    width targeting ``_TARGET_BUCKETS`` — so the driver-side prefix
    loop collects ~10k bucket totals regardless of key range. A fixed
    width would make the "small" serial step grow with the key space
    (10B row ids / 1000 = 10M rows to the driver per query).

    EAGER when deriving: the width derivation runs a min/max Spark
    job over the full upstream plan AT CALL TIME (plan construction
    is no longer lazy/free). On hot or repeated paths over expensive
    inputs, pass an explicit ``bucket_width`` (or a precomputed
    ``bucket`` column) to skip that extra scan — the adaptive default
    trades one cheap aggregate for driver-side scale safety. Ties in
    ``order_col`` are broken deterministically only if the key is
    unique — supply a unique key (the usual case: a row id).

    Null order keys land in a dedicated FIRST bucket, matching the
    global-window formulation (Spark's ascending ORDER BY sorts nulls
    first); within it all rows tie, so they share one cumulative value
    — exactly the RANGE-frame peer behavior of the naive window.
    """
    if bucket is None and bucket_width is None:
        bucket_width = _derive_bucket_width(df, order_col)
    b = bucket if bucket is not None else (F.col(order_col) / bucket_width).cast(
        "long"
    )
    # nulls-first sentinel: a null order key (or a bucket fn yielding
    # null) gets a bucket strictly below any real one, so the driver
    # prefix loop never sees None and the rows keep a defined position
    _NULL_BUCKET = -(1 << 62)
    with_bucket = df.withColumn("_psb", F.coalesce(b, F.lit(_NULL_BUCKET)))

    totals = (
        with_bucket.groupBy("_psb")
        .agg(F.sum(F.col(value_col)).alias("_t"))
        .collect()
    )
    # sequential prefix over |buckets| values — the only serial step.
    # Offsets keep the VALUE column's numeric family: truncating a
    # fractional bucket total to int would silently corrupt the
    # cumulative sum for float value columns.
    from pyspark.sql.types import (
        ByteType,
        IntegerType,
        LongType,
        ShortType,
    )

    integral = isinstance(
        df.schema[value_col].dataType,
        (ByteType, ShortType, IntegerType, LongType),
    )
    offsets: dict[int, float] = {}
    acc = 0 if integral else 0.0
    for row in sorted(totals, key=lambda r: r["_psb"]):
        offsets[row["_psb"]] = acc
        acc += row["_t"] or 0

    # ship offsets back as a broadcast dimension (|buckets| rows) — a
    # literal map expression would grow the plan linearly with buckets
    spark = df.sparkSession
    off_type = "long" if integral else "double"
    cast = int if integral else float
    offset_df = spark.createDataFrame(
        [(int(k), cast(v)) for k, v in offsets.items()],
        f"_psb long, _off {off_type}",
    )
    w = Window.partitionBy("_psb").orderBy(order_col)
    out = (
        with_bucket.join(F.broadcast(offset_df), "_psb")
        .withColumn(out_col, F.sum(F.col(value_col)).over(w) + F.col("_off"))
        .drop("_psb", "_off")
    )
    return out, acc
