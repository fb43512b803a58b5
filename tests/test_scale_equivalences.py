"""Randomized equivalence proofs for the scale formulations.

The oracle gate checks each scale-shaped query against fixed corpora;
these tests check the underlying CLAIMS on seeded random data, where
the pruning arguments actually have to hold:

- salted two-phase per-group top-K == one-window top-K
- salted replicate join == plain join
- count-min-sketch min-over-rows upper-bounds every true count
  (the no-false-negative candidate argument)
"""

from __future__ import annotations

import random
from collections import Counter

from pyspark.sql import Window
from pyspark.sql import functions as F


def test_salted_topk_equals_global_topk(spark):
    rng = random.Random(7)
    # skewed groups: group 0 holds half the rows
    rows = [
        (i, rng.choice([0, 0, 0, 0, 1, 2, 3]), rng.random())
        for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "id long, grp int, noise double")
    K, SALTS = 7, 5
    rk = F.md5(F.col("id").cast("string"))

    w_direct = Window.partitionBy("grp").orderBy(rk, "id")
    direct = (
        df.withColumn("r", F.row_number().over(w_direct))
        .filter(F.col("r") <= K).select("grp", "id")
    )
    w1 = Window.partitionBy("grp", F.col("id") % SALTS).orderBy(rk, "id")
    w2 = Window.partitionBy("grp").orderBy(rk, "id")
    two_phase = (
        df.withColumn("r1", F.row_number().over(w1))
        .filter(F.col("r1") <= K)
        .withColumn("r2", F.row_number().over(w2))
        .filter(F.col("r2") <= K).select("grp", "id")
    )
    assert sorted(map(tuple, direct.collect())) == sorted(
        map(tuple, two_phase.collect())
    )


def test_salted_replicate_join_equals_plain_join(spark):
    rng = random.Random(11)
    fact = spark.createDataFrame(
        [(i, rng.randrange(20)) for i in range(3000)], "row_id long, key int"
    )
    dim = spark.createDataFrame(
        [(k, f"v{k}") for k in range(20)], "key int, payload string"
    )
    S = 6
    plain = fact.join(dim, "key").select("row_id", "payload")
    salted_fact = fact.withColumn(
        "_salt", F.pmod(F.xxhash64("row_id"), F.lit(S)).cast("int")
    )
    salted_dim = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(S)]))
    )
    salted = salted_fact.join(
        salted_dim.hint("SHUFFLE_HASH"), ["key", "_salt"]
    ).select("row_id", "payload")
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_cms_min_upper_bounds_every_true_count(spark):
    rng = random.Random(3)
    toks = [f"t{rng.randrange(40)}" for _ in range(5000)]
    true_counts = Counter(toks)
    df = spark.createDataFrame([(t,) for t in toks], "tok string")
    SEEDS, W = (101, 211, 307), 32  # small W forces real collisions
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("i"),
                F.pmod(F.xxhash64(F.col("tok"), F.lit(s)), F.lit(W)).alias(
                    "slot"
                ),
            )
            for i, s in enumerate(SEEDS)
        ]
    )
    sketch = {
        (r.i, r.slot): r.c
        for r in df.select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.i").alias("i"), F.col("c.slot").alias("slot"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    probe = (
        df.distinct()
        .select("tok", F.explode(cells).alias("c"))
        .select("tok", F.col("c.i").alias("i"), F.col("c.slot").alias("slot"))
        .collect()
    )
    upper: dict[str, int] = {}
    per_tok: dict[str, list[int]] = {}
    for r in probe:
        per_tok.setdefault(r.tok, []).append(sketch[(r.i, r.slot)])
    for tok, cs in per_tok.items():
        upper[tok] = min(cs)
    # every true count is bounded above by the sketch minimum, so a
    # threshold filter on the sketch can never drop a real heavy hitter
    for tok, n in true_counts.items():
        assert upper[tok] >= n, (tok, upper[tok], n)
    # and with W=32 there ARE collisions, so the bound is doing work
    assert any(upper[t] > true_counts[t] for t in true_counts)


def test_nn_descent_recall_curve_is_monotone(spark):
    """The gated convergence curve (ann_nnd_convergence) must
    be non-decreasing round over round and strictly better than the
    init ring by the final round: each round's per-node top-K is taken
    over a candidate superset of the previous round's edges, so
    neighbor quality can only improve (deterministic tiebreaks)."""
    from divolte_collector_spark.queries.embeddings import (
        q_nn_descent_convergence,
    )

    rows = sorted(
        q_nn_descent_convergence(spark, "/root/testdata/sf0.001").collect(),
        key=lambda r: r.round_id,
    )
    assert [r.round_id for r in rows] == [0, 1, 2, 3]
    recalls = [r.recall_ppm for r in rows]
    assert all(a <= b for a, b in zip(recalls, recalls[1:])), recalls
    assert recalls[-1] > recalls[0], recalls


def test_bq_rerank_recall_curve_is_monotone(spark):
    """The gated BQ frontier (ann_bq_rerank_recall) must be
    non-decreasing in shortlist size: a larger Hamming shortlist is a
    superset of candidates for the exact rerank, so recall against the
    exact top-K can only grow."""
    from divolte_collector_spark.queries.embeddings import (
        q_bq_rerank_recall,
        _BQ_SHORTLISTS,
    )

    rows = sorted(
        q_bq_rerank_recall(spark, "/root/testdata/sf0.001").collect(),
        key=lambda r: r.shortlist_size,
    )
    assert [r.shortlist_size for r in rows] == list(_BQ_SHORTLISTS)
    recalls = [r.recall_ppm for r in rows]
    assert all(a <= b for a, b in zip(recalls, recalls[1:])), recalls
    assert recalls[-1] > recalls[0], recalls


def test_pair_blowup_warning_fires_past_bound():
    """The pair-list clustering path must self-warn when the verified
    pair relation leaves its intended regime (> _PAIR_BLOWUP_FACTOR
    pairs/doc) and point at the O(docs) star path, and stay silent
    below the bound (VERDICT r9 item 6)."""
    import warnings

    from divolte_collector_spark.queries.documents import (
        _PAIR_BLOWUP_FACTOR,
        warn_if_pair_blowup,
    )

    n_docs = 1000
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        assert not warn_if_pair_blowup(_PAIR_BLOWUP_FACTOR * n_docs, n_docs)
        assert caught == []
        assert warn_if_pair_blowup(_PAIR_BLOWUP_FACTOR * n_docs + 1, n_docs)
        assert len(caught) == 1
        assert issubclass(caught[0].category, ResourceWarning)
        assert "dedup_star_representatives" in str(caught[0].message)
    # zero docs must not divide/compare away the warning
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        assert warn_if_pair_blowup(_PAIR_BLOWUP_FACTOR + 1, 0)
        assert len(caught) == 1


def test_nnd_heavy_rescore_equals_broadcast_rescore(spark):
    """The past-broadcast NN-Descent re-score shape (repartitioned
    candidates + SHUFFLE_HASH vector joins) never triggers at local
    volumes (gate: vector table > broadcast threshold), so pin its
    semantics directly: same candidate list, same vectors, both shapes
    must produce the identical top-K graph."""
    from pyspark.sql import functions as F

    from divolte_collector_spark.queries.embeddings import (
        _nnd_heavy_parts,
        _nnd_score_topk,
        as_double,
        norm,
    )

    e = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select("vec_id", as_double("embedding").alias("emb"))
        .withColumn("nrm", norm(F.col("emb")))
    )
    ids = e.select("vec_id")
    cand = (
        ids.withColumn("dst", (F.col("vec_id") * 7 + 3) % 20)
        .select(F.col("vec_id").alias("src"), "dst")
        .filter(F.col("src") != F.col("dst"))
    )
    plain = _nnd_score_topk(cand, e, None)
    heavy = _nnd_score_topk(cand, e, 8)
    rows = lambda df: sorted(map(tuple, df.collect()))
    assert rows(plain) == rows(heavy)
    assert rows(plain)  # non-degenerate
    # and the heavy plan really is the streamed-hash shape
    plan = heavy._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_nnd_heavy_gate_keys_on_broadcastability():
    """The heavy re-score shape must engage only past the broadcast
    regime (measured same-boot at 100x: forcing the shuffle while the
    vector table still broadcasts is ~5x slower), and the partition
    count must scale with candidate bytes once it does."""
    from divolte_collector_spark.queries.embeddings import _nnd_heavy_parts

    THRESH = 64 * 1024 * 1024  # the session default, passed explicitly
    # 200k x dim64 = 51 MB parquet-equivalent: broadcastable -> None
    assert _nnd_heavy_parts(200_000, 64, 32, THRESH) is None
    # 1M x dim64 = 256 MB: past broadcast -> a bounded partition count
    p = _nnd_heavy_parts(1_000_000, 64, 32, THRESH)
    assert p is not None and 32 <= p <= 2048
    # monotone in corpus size, capped
    p4 = _nnd_heavy_parts(4_000_000, 64, 32, THRESH)
    assert p4 >= p and p4 <= 2048
    # a lowered live threshold moves the boundary with it (the gate
    # reads the conf, not a copy of session.py's value)
    assert _nnd_heavy_parts(200_000, 64, 32, 16 * 1024 * 1024) is not None
    # broadcast disabled (-1 -> 0 bytes): everything takes the
    # shuffled shape
    assert _nnd_heavy_parts(10_000, 64, 32, 0) is not None


def test_broadcast_threshold_parse(spark):
    """_broadcast_threshold_bytes parses the conf's size-string forms
    and maps 'broadcast disabled' to 0."""
    from divolte_collector_spark.queries.embeddings import (
        _broadcast_threshold_bytes,
    )

    key = "spark.sql.autoBroadcastJoinThreshold"
    orig = spark.conf.get(key)
    try:
        for raw, want in [
            ("67108864", 64 << 20),
            ("64MB", 64 << 20),
            ("10m", 10 << 20),
            ("1g", 1 << 30),
            ("512k", 512 << 10),
            ("-1", 0),
        ]:
            spark.conf.set(key, raw)
            assert _broadcast_threshold_bytes(spark) == want, raw
    finally:
        spark.conf.set(key, orig)


def test_lsh_star_verify_shj_path_equals_broadcast_path(spark):
    """The past-broadcast star-edge verify shape (SHUFFLE_HASH on the
    doc-array side, dedup_star_representatives) triggers only above
    _LSH_SHJ_DOC_THRESHOLD, which local volumes never reach — pin that
    forcing it produces the identical representative relation (the
    pair verifiers moved to the payload-carrying first-band join in
    round 10 and no longer have a hint to force)."""
    import divolte_collector_spark.queries.documents as docs
    from divolte_collector_spark.queries import all_queries

    sf = "/root/testdata/sf0.001"
    fn = all_queries()["dedup_star_representatives"].fn
    rows = lambda df: sorted(map(tuple, df.collect()))
    plain = rows(fn(spark, sf))
    orig = docs._LSH_SHJ_DOC_THRESHOLD
    try:
        docs._LSH_SHJ_DOC_THRESHOLD = -1  # force the heavy shape
        # no plan assertion: the query materializes its CC rounds
        # eagerly inside fn(), so the returned plan is the final
        # representative selection — the hinted verify joins already
        # EXECUTED under the forced threshold; equality is the pin
        assert rows(fn(spark, sf)) == plain
    finally:
        docs._LSH_SHJ_DOC_THRESHOLD = orig
    assert plain  # non-degenerate


def test_lsh_verify_heavy_counts_once_per_table_generation(spark):
    """The verify-join shape decision runs exactly ONE count action
    per (application, sf_dir, documents generation): repeat calls hit
    the signature-keyed memo, and a changed table signature forces a
    recount (the same invalidation contract as the table cache)."""
    import divolte_collector_spark.queries.documents as docs

    sf = "/root/testdata/sf0.001"
    calls = {"n": 0}
    # patch the CONCRETE DataFrame class (Spark 4's classic subclass
    # defines its own count; patching the abstract base misses it)
    cls = type(docs._docs(spark, sf))
    orig_count = cls.count

    def counting(self):
        calls["n"] += 1
        return orig_count(self)

    docs._LSH_HEAVY_CACHE.clear()
    cls.count = counting
    try:
        a = docs._lsh_verify_heavy(spark, sf)
        b = docs._lsh_verify_heavy(spark, sf)
        c = docs._lsh_verify_heavy(spark, sf)
        assert a == b == c
        assert calls["n"] == 1
        # a regenerated table (different signature) must recount
        key = (spark.sparkContext.applicationId, sf)
        sig, heavy = docs._LSH_HEAVY_CACHE[key]
        docs._LSH_HEAVY_CACHE[key] = (("stale",), heavy)
        assert docs._lsh_verify_heavy(spark, sf) == a
        assert calls["n"] == 2
        assert docs._LSH_HEAVY_CACHE[key][0] == sig
    finally:
        cls.count = orig_count
        docs._LSH_HEAVY_CACHE.clear()


def test_quantize_divides_by_unrounded_scale(spark, tmp_path):
    """embedding_quantize_int8 must divide by the RAW scale, not the
    round(scale, 9) output column.

    Regression pin for a lateral-column-alias hazard: when the working
    scale column shared the name of the rounded output alias, Spark 4.1
    resolved the divisor INSIDE the transform lambda to round(scale, 9)
    — flipping floor(x/scale + 0.5) on half-integer boundary vectors
    and diverging from the oracle (found by the 100x strict sweep).
    The vector below is such a boundary case, lifted from the scaled
    corpus (both values are float32-exact):
      scale        = 0.2931281328201294 / 127 = 0.002308095534016767
      x/scale+0.5  = 113.0000013...  -> 113   (raw scale, correct)
      x/round(scale,9)+0.5 = 112.9999987... -> 112  (the bug)
    """
    x0 = 0.2596607506275177
    mx = 0.2931281328201294
    df = spark.createDataFrame(
        [(1, [x0, mx], 0)], "vec_id bigint, embedding array<float>, label int"
    )
    out = str(tmp_path / "quantdir")
    df.write.parquet(f"{out}/embeddings.parquet")

    from divolte_collector_spark.queries.embeddings import q_quantize_int8

    row = q_quantize_int8(spark, out).collect()[0]
    assert row.q == "[113,127]"
