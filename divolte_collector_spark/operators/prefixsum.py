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

from collections.abc import Sequence

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


def str_prefix_long(col: Column, nbytes: int = 7) -> Column:
    """Monotone numeric embedding of a string's first ``nbytes`` UTF-8
    bytes: big-endian, zero-padded on the right, so ``s1 <= s2`` under
    binary collation implies ``embed(s1) <= embed(s2)`` (UTF-8 byte
    order equals code-point order, and left-aligned padding keeps the
    prefix relation: ``"ab" < "b"`` maps to ``0x61620000.. < 0x62000..``).
    Equal embeddings do NOT imply equal strings (they share a prefix),
    so this is a BUCKETING key — ties stay together — never an ORDER
    key. ``nbytes`` caps at 7 so the value fits a signed long."""
    if not 1 <= nbytes <= 7:
        raise ValueError("nbytes must be in 1..7 for a signed long")
    return F.conv(
        F.rpad(
            F.hex(F.substring(col.cast("binary"), 1, nbytes)),
            2 * nbytes,
            "0",
        ),
        16,
        10,
    ).cast("long")


def ntile_from_rank(rank: Column, n: int, k: int) -> Column:
    """Closed-form ``ntile(k)`` from an exact 1-based global rank over
    ``n`` rows — SQL ntile semantics (first ``n % k`` tiles get one
    extra row). Pure integer arithmetic: the divisions are over exact
    multiples (``x - x % b``), so the result is bit-identical to the
    window-function formulation for any ``n < 2**53``. This is how a
    global ``ntile`` rides the two-phase scan instead of a single
    unpartitioned WindowExec task."""
    base, rem = divmod(n, k)
    if base == 0:
        # fewer rows than tiles: each row its own tile
        return rank.cast("int")

    def idiv(x: Column, b: int) -> Column:
        return ((x - (x % F.lit(b))) / F.lit(b)).cast("long")

    cut = rem * (base + 1)
    rest = F.lit(rem) + idiv(rank - 1 - cut, base) + 1
    if rem == 0:
        return rest.cast("int")
    first = idiv(rank - 1, base + 1) + 1
    return F.when(rank <= cut, first).otherwise(rest).cast("int")


# (app_id, table_path, label) -> (table signature, spans tuple,
# offsets dict, total). The two eager jobs global_row_number runs at
# plan-construction (span min/max + |buckets| totals collect) are a
# pure function of the input relation, so callers whose input derives
# from ONE table can memoize them per (application, table generation)
# — the same signature-keyed pattern as the LSH corpus-size memo
# (queries/documents.py _LSH_HEAVY_CACHE). A regenerated table
# changes its signature and forces a fresh scan; a repeated build
# (plan cache disabled, bench --cold, repeated service calls) skips
# both jobs.
_GRN_MEMO: dict = {}


def _grn_span(df: DataFrame, span_aggs: list) -> tuple:
    """Eager job 1: min/max span probe (separated for testability)."""
    return tuple(df.agg(*span_aggs).first())


def _grn_bucket_totals(with_bucket: DataFrame) -> list:
    """Eager job 2: per-bucket row counts (separated for testability)."""
    return (
        with_bucket.groupBy("_psb")
        .agg(F.count(F.lit(1)).alias("_t"))
        .collect()
    )


def global_row_number(
    df: DataFrame,
    order_by: Sequence[Column],
    bucket_by: Column,
    *,
    bucket_width: float | None = None,
    tie_bucket_by: Column | None = None,
    tie_buckets: int = 64,
    out_col: str = "rn",
    memo: tuple[str, str] | None = None,
) -> tuple[DataFrame, int]:
    """Exact global 1-based ``row_number()`` over the total order
    ``order_by``, computed with the same two-phase scan as
    ``global_cumsum`` instead of a single-task unpartitioned window.

    ``bucket_by`` must be numeric and monotone NON-DECREASING along
    ``order_by`` (for a descending primary key pass its negation);
    rows with equal primary keys land in one bucket, so the
    within-bucket ``row_number`` — PARTITIONED by bucket, ordered by
    the full composite ``order_by`` — plus the driver-prefixed bucket
    offset reproduces the global window exactly, including ties broken
    by the trailing unique key.

    Tie skew: when the primary key is coarse (a few thousand distinct
    days/counts over billions of rows), every tie group IS a bucket
    and the window task inherits it whole. ``tie_bucket_by`` — a
    numeric column monotone in the order WITHIN equal primary keys
    (``str_prefix_long`` of the unique trailing key is the usual
    choice, monotone GLOBALLY so trivially monotone within ties) —
    subdivides each primary bucket into up to ``tie_buckets`` slices,
    bounding the window partition at tie_group/tie_buckets rows. The
    combined bucket id ``primary * tie_buckets + tie_slice`` stays
    lexicographically monotone because the slice is clamped below
    ``tie_buckets``. Slicing engages ONLY in the coarse-integral-key
    regime (integral key, observed span within the driver budget,
    no explicit ``bucket_width``), where each primary bucket is an
    exact key value — a bucket spanning two distinct keys would let
    the trailing-key slice reorder rows across the primary order. On
    fine-grained keys the hint is ignored: width bucketing already
    bounds partitions at ~n/10k rows there, and the pathological
    tie mass (a handful of distinct values over billions of rows)
    is by construction a coarse key.

    EAGER: runs one min/max aggregate (width derivation) and one
    |buckets|-row collect (the serial prefix) at call time. Returns
    ``(df + out_col, total_row_count)`` — the count falls out of the
    prefix accumulator for free, and callers deriving ntile/quantile
    positions from the rank always need it.

    ``memo=(table_path, label)`` memoizes BOTH eager jobs per
    (application, table generation): valid only when ``df`` is a pure
    deterministic function of the single table at ``table_path`` and
    ``label`` uniquely names this derivation (the caller's contract —
    two different inputs sharing a label would serve wrong offsets).
    """
    spans = offsets = None
    acc = 0
    memo_key = sig = None
    if memo is not None:
        from divolte_collector_spark import session as sess

        table_path, label = memo
        sig = sess._path_signature(table_path)
        app_id = df.sparkSession.sparkContext.applicationId
        for k in [k for k in _GRN_MEMO if k[0] != app_id]:
            del _GRN_MEMO[k]
        memo_key = (app_id, table_path, label)
        hit = _GRN_MEMO.get(memo_key)
        if hit is not None and hit[0] == sig:
            spans, offsets, acc = hit[1], hit[2], hit[3]

    span_aggs = [
        F.min(bucket_by).cast("double"),
        F.max(bucket_by).cast("double"),
    ]
    if tie_bucket_by is not None:
        span_aggs += [
            F.min(tie_bucket_by).cast("double"),
            F.max(tie_bucket_by).cast("double"),
        ]
    if spans is None:
        spans = _grn_span(df, span_aggs)
    lo, hi = spans[0], spans[1]
    span = 0.0 if lo is None else float(hi) - float(lo)

    # Tie slicing is SOUND only while two distinct primary keys can
    # never share a primary bucket — otherwise the slice (a function
    # of the TRAILING key) would reorder rows across the primary
    # ordering and corrupt ranks. That holds exactly when the key is
    # integral and each bucket spans <= 1 key value, so slices engage
    # on the COARSE-integral-key regime (the one where tie mass
    # concentrates by pigeonhole: a few thousand distinct
    # days/counts over billions of rows) via exact-VALUE primary
    # buckets, capped so the composite bucket count stays within the
    # driver budget. Fine-grained keys keep the width bucketing with
    # no slices — there each bucket already holds ~n/_TARGET_BUCKETS
    # rows of many values and the window partitions are bounded
    # without help.
    from pyspark.sql.types import (
        ByteType,
        IntegerType,
        LongType,
        ShortType,
    )

    integral = isinstance(
        df.select(bucket_by.alias("_b")).schema[0].dataType,
        (ByteType, ShortType, IntegerType, LongType),
    )
    slice_cap = max(64, _TARGET_BUCKETS // tie_buckets)
    slicing = (
        tie_bucket_by is not None
        and integral
        and bucket_width is None
        and span <= slice_cap
    )
    if slicing:
        pb = bucket_by.cast("long")  # exact value: ties own the bucket
        tlo = spans[2] if spans[2] is not None else 0.0
        thi = spans[3] if spans[3] is not None else 0.0
        twidth = ((float(thi) - float(tlo)) / tie_buckets) or 1.0
        tb = F.least(
            ((tie_bucket_by - F.lit(float(tlo))) / twidth).cast("long"),
            F.lit(tie_buckets - 1),
        )
        b = pb * tie_buckets + F.coalesce(tb, F.lit(0))
    else:
        if bucket_width is None:
            bucket_width = (span / _TARGET_BUCKETS) or 1.0
        b = (bucket_by / bucket_width).cast("long")
    _NULL_BUCKET = -(1 << 62)
    with_bucket = df.withColumn("_psb", F.coalesce(b, F.lit(_NULL_BUCKET)))

    if offsets is None:
        totals = _grn_bucket_totals(with_bucket)
        offsets = {}
        acc = 0
        for row in sorted(totals, key=lambda r: r["_psb"]):
            offsets[row["_psb"]] = acc
            acc += row["_t"]
        if memo_key is not None:
            _GRN_MEMO[memo_key] = (sig, spans, dict(offsets), acc)

    spark = df.sparkSession
    offset_df = spark.createDataFrame(
        [(int(k), int(v)) for k, v in offsets.items()] or [(0, 0)],
        "_psb long, _off long",
    )
    w = Window.partitionBy("_psb").orderBy(*order_by)
    out = (
        with_bucket.join(F.broadcast(offset_df), "_psb")
        .withColumn(
            out_col, F.row_number().over(w).cast("long") + F.col("_off")
        )
        .drop("_psb", "_off")
    )
    return out, acc
