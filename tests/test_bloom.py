"""operators/bloom.py: the Bloom guarantees the dedup query leans on.

- NO FALSE NEGATIVES: every inserted key probes maybe_member=True —
  this is the property that lets probe-negative rows skip the exact
  anti-join entirely. Property-tested over random key sets.
- False positives exist but are rare at the default sizing, and every
  one is caught by the exact verification the query performs.
- The bitmap relation is bounded by buckets * m / 64 regardless of
  how many keys were inserted.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from divolte_collector_spark.operators.bloom import build_bloom, probe_bloom


def _keys_df(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "k string")


def test_no_false_negatives_random_sets(spark):
    rng = random.Random(42)
    for trial in range(3):
        members = [f"m{trial}_{rng.randrange(10**9)}" for _ in range(300)]
        blooms = build_bloom(_keys_df(spark, members), "k")
        out = probe_bloom(_keys_df(spark, members), "k", blooms).collect()
        assert len(out) == len(set(members))
        assert all(r.maybe_member for r in out), "false negative!"


def test_non_members_mostly_rejected_and_fp_is_one_sided(spark):
    members = [f"in{i}" for i in range(200)]
    others = [f"out{i}" for i in range(500)]
    blooms = build_bloom(_keys_df(spark, members), "k")
    out = probe_bloom(_keys_df(spark, others), "k", blooms).collect()
    fp = sum(1 for r in out if r.maybe_member)
    # 200 keys * 3 hashes in 4x8192 bits: fp rate ~ (kn/(buckets*m))^k
    # per bucket — a handful at most; the exact check absorbs any
    assert fp < 25
    # and a definite-negative is exactly that: none of these are members
    assert all(not r.maybe_member or r.k.startswith("out") for r in out)


def test_bitmap_relation_is_bounded(spark):
    members = [f"x{i}" for i in range(2000)]
    blooms = build_bloom(_keys_df(spark, members), "k", m=512, buckets=2)
    rows = blooms.collect()
    assert len(rows) <= 2 * 512 // 64
    assert blooms.columns == ["bkt", "word", "bits"]


def test_probe_preserves_input_columns(spark):
    df = spark.createDataFrame([("a", 1), ("b", 2)], "k string, payload int")
    blooms = build_bloom(_keys_df(spark, ["a"]), "k")
    out = {r.k: r for r in probe_bloom(df, "k", blooms).collect()}
    assert out["a"].payload == 1 and out["b"].payload == 2
    assert out["a"].maybe_member


def test_probe_preserves_duplicate_rows(spark):
    # REGRESSION: grouping on all input columns collapsed duplicate
    # probe rows; the contract is add-a-column, cardinality unchanged
    df = spark.createDataFrame(
        [("a", 1), ("a", 1), ("b", 2)], "k string, payload int"
    )
    blooms = build_bloom(_keys_df(spark, ["a"]), "k")
    out = probe_bloom(df, "k", blooms).collect()
    assert len(out) == 3
    assert sorted((r.k, r.payload, r.maybe_member) for r in out) == [
        ("a", 1, True), ("a", 1, True), ("b", 2, False)
    ]


def test_probe_tolerates_map_typed_payload(spark):
    # REGRESSION: groupBy cannot key on map columns; the row-id regroup
    # must let them ride through
    df = spark.createDataFrame(
        [("a", {"x": 1}), ("b", {"y": 2})], "k string, meta map<string,int>"
    )
    blooms = build_bloom(_keys_df(spark, ["a"]), "k")
    out = {r.k: r for r in probe_bloom(df, "k", blooms).collect()}
    assert out["a"].meta == {"x": 1} and out["a"].maybe_member
    assert out["b"].meta == {"y": 2} and not out["b"].maybe_member


def test_probe_is_a_narrow_map_no_shuffle(spark):
    # the probe's contract: no explode, no join, no shuffle of df —
    # the bitmaps ride as one literal map
    df = spark.createDataFrame([("a",), ("b",)], "k string")
    blooms = build_bloom(_keys_df(spark, ["a"]), "k")
    plan = probe_bloom(df, "k", blooms)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_large_filter_broadcast_join_path_matches_literal_path(spark):
    """Past max_literal_words the probe switches from a literal-map
    expression to k broadcast hash joins (a realistically sized filter
    as a create_map literal is a multi-million-node Catalyst
    expression); both strategies must agree bit-for-bit and the join
    path must still never shuffle the probe side."""
    members = [f"in{i}" for i in range(200)]
    probes = members[:50] + [f"out{i}" for i in range(300)]
    blooms = build_bloom(_keys_df(spark, members), "k")
    lit = probe_bloom(_keys_df(spark, probes), "k", blooms)
    joined = probe_bloom(
        _keys_df(spark, probes), "k", blooms, max_literal_words=0
    )
    assert sorted((r.k, r.maybe_member) for r in lit.collect()) == sorted(
        (r.k, r.maybe_member) for r in joined.collect()
    )
    # k broadcast joins over the probe side; the only exchanges allowed
    # are the sketch-sized build-side aggregations (build_bloom's
    # groupBy), never a shuffle join of the probe relation
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # (AQE prints the final AND initial plan, so count is 2x the joins)
    assert plan.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
