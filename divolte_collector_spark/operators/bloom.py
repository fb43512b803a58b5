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
    max_literal_words: int = 65536,
) -> DataFrame:
    """Add ``maybe_member`` to ``df``: False proves ``key_col`` was
    never inserted into ``blooms`` (built with IDENTICAL m/buckets/
    seeds); True must be settled exactly.

    Two physical strategies, both shuffle-free over ``df``:

    - **Literal map** (small filters): the bitmap relation is
      sketch-sized by construction (at most ``buckets * m / 64`` longs
      regardless of how many keys went in), so it collects to the
      driver and rides into the plan as one literal map (the same
      bounded-driver-state discipline as the k-means centroids); each
      row then tests its k bit positions with plain integer
      expressions — no Exchange, no Join.
    - **Broadcast joins** (past ``max_literal_words`` populated words):
      a literal ``create_map`` with millions of entries is a
      multi-million-node Catalyst expression that blows up planning, so
      a realistically sized filter instead probes with k broadcast
      hash joins on (bucket, word) — still narrow over ``df``, and the
      per-executor cost is one shared copy of the bitmap instead of an
      expression-tree walk. (The OLD explode+join+regroup formulation
      shuffled the k-times-exploded fact relation through a
      per-row-unique groupBy; the k-join form never shuffles ``df``.)
    """
    wpb = (m + 63) // 64  # words per bucket
    key = F.col(key_col)
    bkt = _bucket(key, buckets)

    def _word_mask(s: int):
        pos = F.pmod(F.xxhash64(key, F.lit(s)), F.lit(m))
        word = F.floor(pos / F.lit(64)).cast("long")
        # F.shiftleft only takes a literal shift; call the SQL function
        # directly to shift by a per-row column
        mask = F.call_function(
            "shiftleft", F.lit(1).cast("long"), (pos % 64).cast("int")
        )
        return word, mask

    # plan selection is CAPACITY-driven (buckets * words-per-bucket),
    # not population-driven: capacity bounds both the collect() and the
    # literal expression size without executing the build twice, at the
    # cost of sending a sparse-but-huge-m filter down the join path
    # (where it still works, just without the literal-map fast plan)
    if buckets * wpb <= max_literal_words:
        entries: list = []
        for r in blooms.collect():
            entries.append(F.lit(int(r["bkt"]) * wpb + int(r["word"])))
            entries.append(F.lit(int(r["bits"])))
        if not entries:
            return df.withColumn("maybe_member", F.lit(False))
        lookup = F.create_map(*entries)
        hits = []
        for s in seeds:
            word, mask = _word_mask(s)
            bits = F.element_at(lookup, bkt * wpb + word)
            hits.append(bits.isNotNull() & (bits.bitwiseAND(mask) == mask))
        maybe = hits[0]
        for h in hits[1:]:
            maybe = maybe & h
        return df.withColumn("maybe_member", maybe)

    # large-filter path: k broadcast hash joins on (bucket, word)
    probe = df.withColumn("_bb", bkt)
    hit_cols = []
    for i, s in enumerate(seeds):
        word, mask = _word_mask(s)
        side = blooms.select(
            F.col("bkt").alias(f"_jb{i}"),
            F.col("word").alias(f"_jw{i}"),
            F.col("bits").alias(f"_bits{i}"),
        )
        probe = probe.withColumn(f"_w{i}", word).withColumn(f"_m{i}", mask)
        probe = probe.join(
            F.broadcast(side),
            (F.col("_bb") == F.col(f"_jb{i}"))
            & (F.col(f"_w{i}") == F.col(f"_jw{i}")),
            "left",
        )
        hit_cols.append(
            F.col(f"_bits{i}").isNotNull()
            & (
                F.col(f"_bits{i}").bitwiseAND(F.col(f"_m{i}"))
                == F.col(f"_m{i}")
            )
        )
    maybe = hit_cols[0]
    for h in hit_cols[1:]:
        maybe = maybe & h
    probe = probe.withColumn("maybe_member", maybe)
    return probe.select(*df.columns, "maybe_member")
