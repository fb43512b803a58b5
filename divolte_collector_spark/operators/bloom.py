"""Distributed Bloom-filter membership as DataFrame bit arithmetic.

A Bloom filter over a key column, built and probed without any UDF:

- :func:`build_bloom` folds the key relation into per-bucket bitmaps —
  rows of (bucket, word, bits) where ``bits`` is the bit_or of the
  64-bit words covering the k hash positions. The aggregation is
  partial (map-side combine), and the result is bounded by
  ``buckets * m / 64`` longs no matter how many keys went in: the only
  state that moves is sketch-sized.
- :func:`probe_bloom` joins a probe relation against the broadcast
  bitmaps and adds a boolean ``maybe_member`` column: False is a
  PROOF of absence (Bloom has no false negatives), True is
  "present or false positive" at the usual ``(1 - e^(-kn/m))^k``
  rate, to be settled by an exact check on the True sliver only.

The bucket dimension exists for scale: at a 100 TB history the bitmap
total is chosen via m-per-bucket, and each bucket's build aggregates
independently (no single hot reducer); probes hash straight to their
bucket's rows of the broadcast.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SEEDS = (1001, 2003, 3011)


def _bucket(key: Column, buckets: int) -> Column:
    return F.pmod(F.xxhash64(key), F.lit(buckets))


def _positions(key: Column, m: int, seeds: tuple[int, ...]) -> Column:
    return F.array(
        *[F.pmod(F.xxhash64(key, F.lit(s)), F.lit(m)) for s in seeds]
    )


_WORD = "pos DIV 64"
_MASK = "shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))"


def build_bloom(
    keys: DataFrame,
    key_col: str,
    m: int = 8192,
    buckets: int = 4,
    seeds: tuple[int, ...] = DEFAULT_SEEDS,
) -> DataFrame:
    """Fold ``keys[key_col]`` into Bloom bitmaps: one row per
    (bucket, word) with the OR of all members' bits. Output is at most
    ``buckets * m / 64`` rows regardless of input size."""
    key = F.col(key_col)
    return (
        keys.select(
            _bucket(key, buckets).alias("bkt"),
            F.explode(_positions(key, m, seeds)).alias("pos"),
        )
        .select("bkt", F.expr(_WORD).alias("word"), F.expr(_MASK).alias("mask"))
        .groupBy("bkt", "word")
        .agg(F.bit_or("mask").alias("bits"))
    )


def probe_bloom(
    df: DataFrame,
    key_col: str,
    blooms: DataFrame,
    m: int = 8192,
    buckets: int = 4,
    seeds: tuple[int, ...] = DEFAULT_SEEDS,
) -> DataFrame:
    """Add ``maybe_member`` to ``df``: False proves ``key_col`` was
    never inserted into ``blooms`` (built with IDENTICAL m/buckets/
    seeds); True must be settled exactly. The bitmaps ride a broadcast
    join; the probe itself never shuffles ``df``."""
    key = F.col(key_col)
    # Tag each input row with a unique id before the k-way explode so the
    # regroup restores EXACTLY the input rows: duplicate probe rows stay
    # duplicated, and map-typed payload columns (which groupBy cannot key
    # on) ride through as first() aggregates rather than grouping keys.
    tagged = df.withColumn("_rid", F.monotonically_increasing_id())
    probed = (
        tagged.select(
            "_rid", *df.columns,
            _bucket(key, buckets).alias("_bkt"),
            F.explode(_positions(key, m, seeds)).alias("pos"),
        )
        .select(
            "_rid", *df.columns, "_bkt",
            F.expr(_WORD).alias("_word"), F.expr(_MASK).alias("_mask"),
        )
        .join(
            F.broadcast(
                blooms.select(
                    F.col("bkt").alias("_bkt"),
                    F.col("word").alias("_word"),
                    "bits",
                )
            ),
            ["_bkt", "_word"],
            "left",
        )
    )
    hit = (
        F.col("bits").isNotNull()
        & (F.col("bits").bitwiseAND(F.col("_mask")) == F.col("_mask"))
    )
    return (
        probed.groupBy("_rid")
        .agg(
            *[F.first(c).alias(c) for c in df.columns],
            (F.min(hit.cast("int")) == 1).alias("maybe_member"),
        )
        .drop("_rid")
    )
