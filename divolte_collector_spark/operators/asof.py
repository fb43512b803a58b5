"""Generic as-of join (SURVEY §2.15 Ext — "joins ... range/as-of via
inequality conditions").

Canonical single-shuffle formulation: tag both sides, UNION them, and
run one window per key ordered by (time, side) — each left row picks
up the most recent right row's payload via ``last(..., ignorenulls)``.
No pairwise join explosion: a naive ``l JOIN r ON key AND r.t <= l.t``
materializes O(|matches|²) pairs per key before aggregation; the union
window streams every partition exactly once. One shuffle on the key,
cost O((|L|+|R|) log) for the sort — the shape that survives 100 TB
(and skewed keys hit AQE's partition splitting like any other window).

Semantics (matching common dataframe-library as-of joins):
- ``direction='backward'``: latest right row with r.t <= l.t
  (``allow_exact_matches=False`` makes it strictly earlier);
- ``direction='forward'``: earliest right row with r.t >= l.t;
- ``tolerance`` (seconds): match discarded when |l.t - r.t| exceeds it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_time: str,
    right_time: str,
    value_cols: list[str] | None = None,
    direction: str = "backward",
    allow_exact_matches: bool = True,
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Attach the as-of right-side values to every left row.

    Returns the left DataFrame plus, for each of ``value_cols`` (default:
    every non-key, non-time right column), an ``asof_<col>`` column, and
    ``asof_<right_time>`` with the matched right timestamp (null when no
    match / outside tolerance).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    keys = [on] if isinstance(on, str) else list(on)
    value_cols = value_cols or [
        c for c in right.columns if c not in (*keys, right_time)
    ]

    lt = F.col(left_time)
    rt = F.col(right_time)
    l_tagged = left.select(
        *keys,
        lt.alias("_t"),
        F.lit(1).alias("_is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
        F.lit(None).cast(
            right.select(
                F.struct(rt.alias("_rt"), *[F.col(c) for c in value_cols]).alias("s")
            ).schema["s"].dataType
        ).alias("_r"),
    )
    r_tagged = right.select(
        *keys,
        rt.alias("_t"),
        F.lit(0).alias("_is_left"),
        F.lit(None)
        .cast(
            left.select(
                F.struct(*[F.col(c) for c in left.columns]).alias("s")
            ).schema["s"].dataType
        )
        .alias("_l"),
        F.struct(rt.alias("_rt"), *[F.col(c) for c in value_cols]).alias("_r"),
    )
    both = l_tagged.unionByName(r_tagged)

    # ordering: for backward matches the right row must sort BEFORE the
    # left row it serves. Exact-match ties: right first when exact
    # matches are allowed, left first when they aren't.
    if direction == "forward":
        order = [F.col("_t").desc(), (F.col("_is_left") if allow_exact_matches else (1 - F.col("_is_left"))).asc()]
    else:
        order = [F.col("_t").asc(), (F.col("_is_left") if allow_exact_matches else (1 - F.col("_is_left"))).asc()]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = both.withColumn("_m", F.last("_r", ignorenulls=True).over(w)).filter(
        F.col("_is_left") == 1
    )
    if tolerance_seconds is not None:
        delta = F.abs(
            F.unix_micros(F.col("_t").cast("timestamp"))
            - F.unix_micros(F.col("_m._rt").cast("timestamp"))
        )
        matched = matched.withColumn(
            "_m",
            F.when(delta <= int(tolerance_seconds * 1_000_000), F.col("_m")),
        )
    out_cols = [F.col(f"_l.{c}").alias(c) for c in left.columns]
    out_cols.append(F.col("_m._rt").alias(f"asof_{right_time}"))
    out_cols.extend(F.col(f"_m.{c}").alias(f"asof_{c}") for c in value_cols)
    return matched.select(*out_cols)
