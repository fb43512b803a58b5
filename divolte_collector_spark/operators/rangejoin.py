"""Generic numeric range join (SURVEY §2.15 Ext — "range/as-of via
inequality conditions"; the geo-IP operator is this pattern
specialized to IPv4, operators/geoip.py).

Joining facts to interval dims on ``lo <= point < hi`` naively gives
Catalyst only a non-equi condition — a BroadcastNestedLoopJoin that
scans EVERY range per fact row. The bucket strategy restores an
equi-key: each range explodes into the fixed-width buckets it spans
(dim side only, once), facts compute their bucket, and the join is a
broadcast HASH join on bucket with the BETWEEN as residual. Per fact
row the residual checks only the handful of ranges sharing its bucket.

At 100 TB the fact side never shuffles (broadcast dim) and never
nested-loops; the only tuning knob is ``bucket_width`` — wide enough
that ranges span few buckets, narrow enough that buckets hold few
ranges."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_join(
    facts: DataFrame,
    ranges: DataFrame,
    point: str | Column,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bucket_width: float = 1.0,
    how: str = "left",
) -> DataFrame:
    """Join interval attributes onto facts where
    ``lo <= point < hi`` (half-open, the standard band semantics).

    ``ranges`` must be broadcastable (a dimension); its ``lo``/``hi``
    bounds plus any attribute columns are attached to each fact row
    (nulls when no interval contains the point and ``how='left'``).
    """
    point_col = F.col(point) if isinstance(point, str) else point
    bucketed = ranges.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bucket_width).cast("long"),
                # end bucket = floor(hi / w): registering one bucket
                # too many when hi sits exactly on a boundary is
                # harmless (the strict `point < hi` residual discards
                # it), while the subtract-epsilon trick DROPPED matches
                # whenever hi lay within epsilon above a boundary
                F.floor(F.col(hi_col) / bucket_width).cast("long"),
            )
        ),
    )
    facts_b = facts.withColumn(
        "_bucket", F.floor(point_col / bucket_width).cast("long")
    )
    cond = (
        (facts_b["_bucket"] == bucketed["_bucket"])
        & (point_col >= bucketed[lo_col])
        & (point_col < bucketed[hi_col])
    )
    return facts_b.join(F.broadcast(bucketed), cond, how).drop("_bucket")
