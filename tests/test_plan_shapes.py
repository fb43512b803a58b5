"""Physical-plan assertions: the plans we ship are the plans we
designed (SURVEY §4 / the 100 TB notes in each query's docstring).
Regression-guards pushdown, broadcast strategy, and partial
aggregation — the properties that decide whether a query survives a
1000x scale-up, which row-count tests can't see."""

from __future__ import annotations

from divolte_collector_spark.plans import audit, explain_formatted
from divolte_collector_spark.queries import all_queries

SF = "/root/testdata/sf0.001"


def _audit(spark, name: str):
    return audit(all_queries()[name].fn(spark, SF))


def _assert_only_spread_exchanges(spark, name: str, key: str):
    """Every Exchange in the plan (if any) must be the session
    spread_scan itself — hashpartitioning on the spread key. Keeps the
    regression-detection power of the old ``n_exchanges == 0`` gates:
    an accidental join/aggregate/round-robin shuffle hashes on a
    different key (or none) and fails here, while the adaptive spread
    (absent on a cluster-scale many-partition scan) passes."""
    import re

    plan = explain_formatted(all_queries()[name].fn(spark, SF))
    args = re.findall(
        r"\(\d+\) Exchange\s*\nInput[^\n]*\nArguments: ([^\n]+)", plan
    )
    n_exchanges = len(
        re.findall(r"^\(\d+\) Exchange\b", plan, flags=re.M)
    )
    assert len(args) == n_exchanges, (name, plan)
    assert len(args) <= 1, (name, args)
    for a in args:
        assert a.startswith(f"hashpartitioning({key}#"), (name, a)


def test_q6_filters_pushed_to_scan(spark):
    a = _audit(spark, "q6_forecast_revenue")
    # all predicates reach the parquet scan
    pushed = ";".join(a.pushed_filters)
    for frag in ("l_shipdate", "l_discount,0.04", "l_quantity,24"):
        assert frag in pushed
    # column pruning: 4 needed columns, not the 11-column row
    assert len(a.read_schemas) == 1
    assert "l_returnflag" not in a.read_schemas[0]
    assert "l_extendedprice" in a.read_schemas[0]
    assert a.n_exchanges == 1  # single partial+final agg exchange


def test_q5_dimensions_broadcast(spark):
    a = _audit(spark, "q5_regional_revenue")
    assert a.n_broadcast_hash_joins == 5  # orders,customer,supplier,nation,region
    assert not a.has_nested_loop_join
    assert not a.has_cartesian_product
    assert a.n_exchanges == 1  # only the final groupBy shuffles


def test_q1_partial_aggregation(spark):
    plan = explain_formatted(all_queries()["q1_pricing_summary"].fn(spark, SF))
    # partial (map-side) agg before the exchange, final after
    assert plan.count("HashAggregate") >= 2
    assert "Exchange" in plan


def test_exact_dedup_single_shuffle(spark):
    a = _audit(spark, "dedup_exact")
    assert a.n_exchanges == 1


def test_geoip_broadcast_not_nested_loop(spark):
    a = _audit(spark, "geoip_enrich_events")
    assert a.n_broadcast_hash_joins >= 1
    assert not a.has_nested_loop_join


def test_ann_ivf_no_cartesian(spark):
    a = _audit(spark, "ann_ivf_bucketed")
    assert not a.has_cartesian_product


def test_sessionize_single_shuffle_on_user(spark):
    # the windows and the session agg share the user_id partitioning
    a = _audit(spark, "sessionize_30min")
    assert a.n_exchanges == 1


def test_json_source_parses_body_once(spark):
    """The round-12 json_source fix (sources/json_source.py): the body
    parse is staged ONCE, and the `_complete` completeness check is
    guarded by a spark_partition_id() CASE so PushDownPredicates cannot
    clone the six-parse subtree below the upstream exchange (measured
    10x). Both rely on CURRENT Catalyst behavior — a Spark upgrade
    that constant-folds the always-true guard would silently revert to
    the cloned-predicate plan, which this pin catches as from_json
    reappearing more than once."""
    plan = explain_formatted(
        all_queries()["json_source_roundtrip"].fn(spark, SF)
    )
    assert plan.count("from_json") == 1, plan.count("from_json")
    # the guard survived optimization (not constant-folded away)
    assert "SPARK_PARTITION_ID" in plan
    # and the completeness filter stayed ABOVE the decode projection:
    # the Filter node references the projected _complete column rather
    # than re-deriving it from `body` (a clone would put a from_json
    # inside the Filter condition — already excluded by count == 1)
    import re

    m = re.search(r"\(\d+\) Filter\s*\nInput[^\n]*\nCondition : ([^\n]+)", plan)
    assert m and "_complete" in m.group(1), m and m.group(1)


def test_wire_decode_parses_once(spark):
    # the guarded parse keeps python UDF evaluation to the two decode
    # UDFs (checksum murmur + mincode); no duplicated eval nodes
    a = _audit(spark, "browser_wire_roundtrip")
    assert a.n_python_eval_nodes <= 3  # encode murmur + decode pair
    assert not a.has_cartesian_product


def test_sign_lsh_near_dup_no_cartesian(spark):
    # the LSH variant exists precisely to kill the all-pairs join:
    # candidates must come from an equi-join on (band, key)
    a = _audit(spark, "embedding_near_dup_lsh")
    assert not a.has_cartesian_product
    assert not a.has_nested_loop_join


def test_kmeans2_no_fact_shuffle_for_assignment(spark):
    # assignment is map-side against driver-held centroids; the only
    # shuffles are the pair-dedup/recompute aggregations and the final
    # top-k window — never a fact-vs-centroid join
    a = _audit(spark, "refined_ivf_kmeans")
    assert not a.has_cartesian_product
    assert not a.has_nested_loop_join


def test_jsonpath_filter_single_python_stage(spark):
    # the three indefinite paths evaluate in ONE ArrowEvalPython node
    # (common json parse amortized per batch); definite paths stay on
    # the JVM as get_json_object
    a = _audit(spark, "wire_params_jsonpath")
    assert a.n_python_eval_nodes <= 1
    # narrow map over the scan; the only exchange permitted is the
    # adaptive single-file spread itself (session.spread_scan — absent
    # on a cluster-scale many-partition scan). Asserting the exchange
    # KEY keeps the old zero-exchange gate's regression power: an
    # accidental join/aggregate shuffle would not hash on event_id.
    _assert_only_spread_exchanges(spark, "wire_params_jsonpath", "event_id")


def test_avro_container_roundtrip_no_shuffle(spark):
    # encode+decode is a narrow mapInPandas pipeline over the scan
    a = _audit(spark, "avro_container_roundtrip")
    assert not a.has_cartesian_product
    assert a.n_exchanges <= 1


def test_quantize_narrow_map_no_shuffle(spark):
    a = _audit(spark, "embedding_quantize_int8")
    assert a.n_exchanges == 0
    assert a.n_python_eval_nodes == 0  # pure array expressions


def test_salted_agg_two_exchanges(spark):
    # phase 1 shuffles on (key, salt) — the whole point: a hot key
    # spreads over N_SALT reducers; phase 2 is the tiny merge
    a = _audit(spark, "hot_key_salted_agg")
    assert a.n_exchanges == 2
    assert not a.has_cartesian_product


def test_decontamination_broadcasts_eval_side(spark):
    # the eval shingle set broadcasts; the corpus never shuffles on
    # the shingle key (only the per-doc count aggregates)
    a = _audit(spark, "decontaminate_against_eval")
    assert a.n_broadcast_hash_joins >= 1
    assert not a.has_cartesian_product


def test_pii_and_repetition_narrow_maps(spark):
    # narrow maps; repetition_filter carries the one adaptive
    # single-file spread exchange (session.spread_scan — absent on a
    # cluster-scale many-partition scan); the exchange-key assertion
    # keeps the old zero-exchange gate's regression power
    for name in ("pii_redact", "repetition_filter"):
        a = _audit(spark, name)
        _assert_only_spread_exchanges(spark, name, "doc_id")
        assert a.n_python_eval_nodes == 0, name


def test_training_shards_no_single_partition_scan(spark):
    # the whole point of the two-phase prefix sum: the naive global
    # window would show "Exchange SinglePartition" and one window task
    from divolte_collector_spark.plans import explain_formatted

    df = all_queries()["training_shard_manifest"].fn(spark, SF)
    plan = explain_formatted(df)
    assert "SinglePartition" not in plan
    a = _audit(spark, "training_shard_manifest")
    assert not a.has_cartesian_product
    assert a.n_broadcast_hash_joins >= 1  # bucket offsets broadcast


def test_new_round2_aggregates_bounded_shuffles(spark):
    # pivot = two-level aggregate ((day, type) partial then per-day
    # pivot); profiling = count-distinct expand + merge. Both bounded
    # at 2 exchanges with no joins — pinned so a regression to a
    # distinct-job-per-column or implicit-pivot shape surfaces here
    for name in ("pivot_event_type_daily", "profile_events"):
        a = _audit(spark, name)
        assert a.n_exchanges <= 2, name
        assert not a.has_cartesian_product, name


def test_scalar_subquery_nlj_is_one_row_broadcast(spark):
    # q11/q22 compare against a SCALAR aggregate (total value / avg
    # balance): Catalyst plans that as BroadcastNestedLoopJoin with the
    # ONE-ROW aggregate broadcast — constant-size state at any scale,
    # not an O(n^2) join. Pinned here so an audit red-flag on NLJ is
    # recognized as the scalar-subquery shape, and so a regression that
    # turns it into a real NLJ over a multi-row side would change the
    # aggregate structure asserted below.
    from divolte_collector_spark.plans import explain_formatted

    for name in ("q11_important_parts", "q22_idle_customers"):
        a = _audit(spark, name)
        assert a.has_nested_loop_join, name  # the scalar-subquery join
        plan = explain_formatted(all_queries()[name].fn(spark, SF))
        assert "BroadcastNestedLoopJoin" in plan
        assert not a.has_cartesian_product, name


def test_every_gated_query_scale_discipline(spark):
    """Global safety net over the ENTIRE gated surface: no gated query
    may plan a CartesianProduct, a row-at-a-time Python UDF
    (BatchEvalPython — every Python crossing must be Arrow-batched), or
    an unexpected nested-loop join. The NLJ allowlist is the four
    documented shapes: the two scalar-subquery one-row broadcasts
    (q11/q22, pinned above), the broadcast-20-query-vectors kNN scan,
    and the all-pairs embedding near-dup that is explicitly gated as
    the exact-recall baseline beside its LSH sibling. A new query that
    trips this must either fix its plan or earn a documented entry."""
    NLJ_ALLOWED = {
        "q11_important_parts",
        "q22_idle_customers",
        "knn_bruteforce_cosine",
        "vector_near_dup_exact",
        # one-row broadcast of the bin totals (scalar-subquery shape)
        "snapshot_drift_psi",
        # one-row estimate x one-row exact (scalar-subquery shape)
        "sketch_corpus_overlap",
        # broadcast-20-query-vectors scan, same shape as the kNN baseline
        "rank_fusion_rrf",
        # contains the exact ground-truth scan (the kNN baseline shape)
        "recall_ann_vs_exact",
        # one-row broadcast of (total, ordered-fold sum of weights)
        "temperature_source_mix",
        # one-row broadcast of the corpus token count
        "token_unigram_logprob",
        # one-row broadcasts of the target/raw feature totals
        "sample_dsir_importance",
        # one-row broadcast of the graph node count (scalar-subquery)
        "recsys_item_pagerank",
        # one-row broadcast of the global max timestamp
        "agg_user_rfm_segments",
        # one-row broadcast of the integer clip bounds
        "value_winsorized_stats",
        # broadcast-5-query-series scan, same shape as the kNN baseline
        "timeseries_similarity_topk",
        # contains the exact ground-truth scan (the kNN baseline shape)
        # the frontier's recall is measured against
        "ann_recall_probe_frontier",
        # the 50-probe exact ground-truth scan (the kNN baseline shape)
        # the NN-Descent graph's recall is measured against
        "vector_nn_descent_recall",
        # same exact ground-truth scan, reused across the 4-round
        # convergence curve (scored once, detached)
        "ann_nnd_convergence",
        # broadcast-20-probe scan over the 16-byte packed BQ relation
        # (the kNN-baseline shape at 1/16th the broadcast width)
        "ann_bq_hamming_topk",
        # same broadcast-probe Hamming scan PLUS the exact ground-truth
        # baseline it measures recall against (two documented NLJs)
        "ann_bq_rerank_recall",
        # 20-row systematic-grid broadcast into the interval-
        # containment join (tiny-broadcast range-join shape)
        "sample_pps_systematic",
    }
    failures = []
    for name, rq in sorted(all_queries().items()):
        try:
            a = audit(rq.fn(spark, SF))
        except Exception as exc:  # noqa: BLE001 — collect, report all
            failures.append(f"{name}: build error {exc!r:.120}")
            continue
        if a.has_cartesian_product:
            failures.append(f"{name}: CartesianProduct in plan")
        if a.n_rowwise_python_nodes:
            failures.append(f"{name}: row-wise BatchEvalPython node")
        if a.has_nested_loop_join and name not in NLJ_ALLOWED:
            failures.append(f"{name}: undocumented nested-loop join")
    assert not failures, "\n".join(failures)


def test_source_quota_two_phase_skew_safe(spark):
    # phase 1 shuffles on (source, salt) — a hot domain spreads over
    # N_SALT reducers; phase 2 ranks only the pruned survivors
    a = _audit(spark, "source_quota_sample")
    assert a.n_exchanges == 2
    assert not a.has_cartesian_product
    assert a.read_schemas == ["struct<doc_id:bigint,source:string>"]


def test_seeded_permutation_no_global_window(spark):
    # global positions via the two-phase prefix scan: ONE partitioned
    # window exchange + the broadcast bucket-offset join — never a
    # single-task ORDER BY over the whole corpus
    a = _audit(spark, "seeded_corpus_permutation")
    assert a.n_exchanges == 1
    assert a.n_broadcast_hash_joins == 1
    assert not a.has_cartesian_product


def test_heavy_hitters_sketch_broadcast(spark):
    # candidate generation and exact verification both read broadcast
    # sides (the 192-cell sketch, then the candidate list) — the full
    # token multiset is never shuffled by token
    a = _audit(spark, "token_heavy_hitters")
    assert a.n_broadcast_hash_joins >= 2
    assert not a.has_cartesian_product
    assert not a.has_nested_loop_join


def test_bloom_incremental_broadcast_bitmaps(spark):
    # the bloom bitmaps ride a broadcast join to the batch scan; the
    # probe-and-flag path never shuffles history rows to batch rows
    a = _audit(spark, "prefilter_bloom_incremental_dedup")
    assert a.n_broadcast_hash_joins >= 2
    assert not a.has_cartesian_product
    assert not a.has_nested_loop_join
    assert a.n_rowwise_python_nodes == 0


def test_sequence_funnel_single_shuffle(spark):
    # journey strings come from ONE aggregation keyed by user (no
    # window, no per-step self-joins); the scan is pruned to 4 columns
    a = _audit(spark, "sequence_funnel_pattern")
    assert a.n_exchanges == 1
    assert not a.has_cartesian_product


def test_skew_salted_join_shuffled_hash(spark):
    # the salted join must actually shuffle on (key, salt) — a
    # broadcast would hide the skew-spreading shape the query pins
    from divolte_collector_spark.plans import explain_formatted

    a = _audit(spark, "skew_salted_replicate_join")
    assert a.n_broadcast_hash_joins == 0
    assert a.n_exchanges == 3  # fact, replicated dim, final agg
    plan = explain_formatted(
        all_queries()["skew_salted_replicate_join"].fn(spark, SF)
    )
    assert "ShuffledHashJoin" in plan


def test_vector_index_probe_partition_pruning(spark, tmp_path):
    # the on-disk IVF layout's reason to exist: probing must prune to
    # the candidate lists' partitions at planning time
    from pyspark.sql import functions as F

    from divolte_collector_spark.plans import explain_formatted

    df = spark.range(100).select(
        F.col("id").alias("vec_id"), (F.col("id") % 8).alias("cid")
    )
    df.write.partitionBy("cid").parquet(str(tmp_path / "lists"))
    probe = spark.read.parquet(str(tmp_path / "lists")).filter(
        F.col("cid").isin([1, 3])
    )
    plan = explain_formatted(probe)
    assert "PartitionFilters" in plan and "cid" in plan.split(
        "PartitionFilters", 1
    )[1][:120]
    assert probe.count() == 26  # 13 rows in each of lists 1 and 3


def test_line_dedup_two_agg_shuffles_no_skewed_window(spark):
    # keeper-relation formulation: line agg + doc reassembly are the
    # only wide steps; no window over the (skewable) line partition,
    # no python, no cartesian
    a = _audit(spark, "text_line_dedup")
    assert a.n_exchanges == 2
    assert not a.has_cartesian_product
    assert a.n_python_eval_nodes == 0


def test_quality_linear_is_pure_narrow_map(spark):
    # the corpus gate is a map over the scan: NO exchange at all
    a = _audit(spark, "text_quality_linear")
    assert a.n_exchanges == 0
    assert a.n_python_eval_nodes == 0


def test_bpe_apply_single_vocab_shuffle(spark):
    # one vocabulary aggregation; the merge chain is narrow over the
    # distinct-word relation
    a = _audit(spark, "tokenizer_bpe_apply")
    assert a.n_exchanges == 1
    assert a.n_python_eval_nodes == 0


def test_blocklist_literal_map_no_join(spark):
    # the literal-sized blocklist folds to arrays_overlap: no join
    # operator of any kind in the plan, one count shuffle
    a = _audit(spark, "url_blocklist_filter")
    assert a.n_exchanges == 1
    assert a.n_broadcast_hash_joins == 0
    assert not a.has_nested_loop_join


def test_snapshot_diff_joins_on_hashes_not_bodies(spark):
    # full outer join shuffles both snapshots once each; equality
    # travels as md5, so no document text in the join keys
    a = _audit(spark, "snapshot_diff_docs")
    assert a.n_exchanges == 2
    assert not a.has_cartesian_product


def test_incremental_line_dedup_shape(spark):
    # history distinct + batch anti-join side + doc reassembly = three
    # exchanges; the intra-batch keeper agg reuses the anti-join's
    # line partitioning (no fourth)
    a = _audit(spark, "text_line_dedup_incremental")
    assert a.n_exchanges == 3
    assert not a.has_cartesian_product
    assert a.n_python_eval_nodes == 0


def test_constraint_validation_single_pass(spark):
    # one conditional-aggregate pass (+ the distinct leg for the
    # uniqueness constraint); never one scan per constraint
    a = _audit(spark, "validate_event_constraints")
    assert a.n_exchanges == 2
    assert a.n_python_eval_nodes == 0


def test_linear_attribution_single_window_shuffle(spark):
    # all per-campaign running counts share one user_id window: one
    # exchange, no purchases-x-clicks self-join
    a = _audit(spark, "utm_linear_attribution")
    assert a.n_exchanges == 1
    assert a.n_broadcast_hash_joins == 0


def test_cdc_apply_single_aggregation(spark):
    # last-op-wins folds to max(struct) per key: one exchange with
    # map-side partial aggregation, no window over the key partition
    a = _audit(spark, "table_cdc_apply")
    assert a.n_exchanges == 1


def test_truncate_renorm_pure_map(spark):
    a = _audit(spark, "vector_truncate_renorm")
    assert a.n_exchanges == 0
    assert a.n_python_eval_nodes == 0


def test_ts_similarity_broadcasts_query_side(spark):
    # the query-series side must broadcast (kNN shape) — losing it
    # would shuffle-join candidates against queries and regress the
    # 100 TB scoring pass silently
    a = _audit(spark, "timeseries_similarity_topk")
    assert not a.has_cartesian_product
    plan = explain_formatted(
        all_queries()["timeseries_similarity_topk"].fn(
            spark, SF
        )
    )
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_recall_frontier_scores_once_broadcasts_probes(spark):
    """The frontier must score candidates ONCE (a single BroadcastHash
    join of the tiny query-probe relation against the assigned fact)
    and derive every probe setting by narrow explode+filter — a
    re-scoring or shuffle-join formulation would multiply the 100 TB
    scoring pass by the number of probe settings."""
    plan = explain_formatted(
        all_queries()["ann_recall_probe_frontier"].fn(spark, SF)
    )
    # every join in the plan is a broadcast equi-join (cell scoring,
    # hits semi-join, tiny cand/hits merge) except the one documented
    # exact-baseline NLJ; nothing shuffles both sides
    assert plan.count("BroadcastHashJoin") >= 1
    assert "SortMergeJoin" not in plan
    import re

    # exact baseline only (formatted explain names each node twice:
    # once in the tree, once in the detail section — count node ids)
    assert len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin", plan)) == 1
    # per-probe fan-out is a generator (explode), not a per-setting join
    assert "Generate" in plan

def test_covisitation_self_join_not_broadcast(spark):
    """The basket self-join's sides grow with the table, so the plan
    must co-partition on the order key rather than broadcast: under
    the threshold the build side is a whole table copy per task
    (measured 17.2 s vs 3.4 s at 10x volume, BASELINE.md round 9),
    over it the planner falls back anyway — pin the one plan that
    holds at every volume."""
    plan = explain_formatted(
        all_queries()["recsys_covisitation"].fn(spark, SF)
    )
    assert "SortMergeJoin" in plan
    assert "BroadcastHashJoin" not in plan


def test_nn_descent_rounds_are_equi_joins(spark):
    """NN-Descent's per-round work must stay id-equi-joins over the
    O(n*K) edge list (linear in n), and rounds must be lineage-
    truncated: the final plan is ONE round's shape over a detached
    edge-list scan — one self-equi-join for the two-hop candidates,
    broadcast/equi re-scoring joins, no nested loop (the one-row
    count broadcast seeding the stride ring lives behind the round-1
    detach). Without the truncation the analyzed plan grows ~6x per
    round (measured: 2,360 physical nodes for 2 rounds) — driver
    explosion, not a cluster cost, so only the plan shape can catch
    it. The recall gate adds exactly one documented NLJ (the 50-probe
    exact-baseline scan)."""
    import re

    # build each query ONCE — these builds eagerly materialize the
    # detached rounds (real Spark jobs), unlike the lazy plans the
    # rest of this file re-builds freely
    g = all_queries()["vector_nn_descent_graph"].fn(spark, SF)
    a = audit(g)
    assert not a.has_cartesian_product
    assert a.n_rowwise_python_nodes == 0
    plan = explain_formatted(g)
    assert len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin", plan)) == 0
    # constant-size round plan: the 6x-per-round clone blowup is gone
    node_ids = [int(m) for m in re.findall(r"\((\d+)\) \w", plan)]
    assert max(node_ids) < 200, f"round plan grew to {max(node_ids)} nodes"
    rdf = all_queries()["vector_nn_descent_recall"].fn(spark, SF)
    r = audit(rdf)
    assert not r.has_cartesian_product
    plan_r = explain_formatted(rdf)
    assert len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin", plan_r)) == 1
    # the 4-round convergence curve must stay flat too: every round's
    # graph AND the exact probe set are detached, so the final plan is
    # four bounded hit-count joins over scans — adding a round extends
    # the curve without deepening any lineage
    cdf = all_queries()["ann_nnd_convergence"].fn(spark, SF)
    c = audit(cdf)
    assert not c.has_cartesian_product
    plan_c = explain_formatted(cdf)
    node_ids_c = [int(m) for m in re.findall(r"\((\d+)\) \w", plan_c)]
    # ~64 nodes per round-join x 4 rounds (measured 255 total); the
    # un-truncated formulation measured 2,360 nodes for TWO rounds
    assert max(node_ids_c) < 320, (
        f"convergence plan grew to {max(node_ids_c)} nodes"
    )

def test_ivf_incremental_append_leaves_history(spark, tmp_path):
    """The per-ingest step must be O(batch): history part-files stay
    byte-identical across the append (no rewrite, no re-assignment),
    the append only ADDS files, and the batch-assignment plan reads
    the embeddings scan with the batch modulo filter pushed — it never
    references the history lists at all."""
    import os

    from divolte_collector_spark.queries.embeddings import (
        _INC_BATCH_MOD,
        _ivf_incremental_append,
        _ivf_incremental_build,
    )

    base = str(tmp_path / "ivf")
    c1 = _ivf_incremental_build(spark, SF, base)

    def snapshot():
        # data files only: _SUCCESS markers and .crc sidecars are
        # commit metadata Hadoop rewrites on every job
        out = {}
        for root, _, files in os.walk(f"{base}/lists"):
            for f in files:
                if f.startswith((".", "_")):
                    continue
                p = os.path.join(root, f)
                st = os.stat(p)
                out[p] = (st.st_mtime_ns, st.st_size)
        return out

    before = snapshot()
    _ivf_incremental_append(spark, SF, base, c1)
    after = snapshot()
    # every history file unchanged, nothing deleted
    for p, sig in before.items():
        assert after.get(p) == sig, f"history file touched: {p}"
    added = set(after) - set(before)
    assert added, "append produced no new part files"
    # the merged index holds the whole corpus; the appended rows are
    # exactly the batch fifth
    from divolte_collector_spark.session import load_table

    merged = spark.read.parquet(f"{base}/lists")
    total = merged.count()
    batch_n = merged.filter(
        (merged.vec_id % _INC_BATCH_MOD) == _INC_BATCH_MOD - 1
    ).count()
    corpus = load_table(spark, SF, "embeddings").count()
    assert total == corpus
    assert 0 < batch_n < total
    assert batch_n == corpus // _INC_BATCH_MOD

def test_rerank_stage_candidate_bounded(spark):
    """Two-stage retrieval: the corpus-wide pass is the cheap sparse
    scorer; the expensive pair stage must stay candidate-bounded — the
    Q*N candidate list and the 4-row query table BROADCAST into the
    payload scan (the corpus is read, never shuffled, for stage 2),
    and the stub pair scorer is JVM-side md5 (no Python eval node to
    regress into a per-row UDF)."""
    a = _audit(spark, "text_rerank_stage")
    assert not a.has_cartesian_product
    assert not a.has_nested_loop_join
    assert a.n_broadcast_hash_joins >= 3  # terms, candidates, queries
    assert a.n_python_eval_nodes == 0

def test_pps_sampling_two_phase_scan(spark):
    """PPS systematic sampling must use the two-phase prefix scan (no
    single-task global ORDER BY over the corpus) and keep the
    interval-containment join a TINY-broadcast nested loop — the grid
    is K=20 rows regardless of corpus size, so the NLJ is constant
    work per fact row, not O(n^2)."""
    df = all_queries()["sample_pps_systematic"].fn(spark, SF)
    plan = explain_formatted(df)
    # ZERO SinglePartition exchanges: the corpus total comes from the
    # prefix scan's driver-side bucket loop (global_cumsum_with_total),
    # so there is no second scan and no one-partition total aggregate;
    # the cumulative axis comes from the partitioned two-phase scan,
    # never a global-ORDER-BY window.
    assert "SinglePartition" not in plan
    assert "hashpartitioning(_psb" in plan  # the bucketed window scan
    a = audit(df)
    assert not a.has_cartesian_product
    assert a.has_nested_loop_join  # the documented 20-row grid join
    assert "BroadcastNestedLoopJoin" in plan


def test_rank_topk_group_limit_is_two_phase(spark):
    """Every scan-rank retrieval gate (rank window + rnk <= K filter)
    must keep Spark's InferWindowGroupLimit rewrite eligible: a
    PARTIAL WindowGroupLimit below the rank exchange bounds each
    map task's output to K rows per group BEFORE the shuffle (the
    two-phase top-K), and the Final pass above it re-bounds the ~K x
    partitions survivors. Eligibility is fragile — casting the rank
    before the filter, or interposing another operator, silently
    reverts to shuffling every scored row (|V| x |probes| for the
    retrieval family) through the rank exchange."""
    for name in (
        "knn_bruteforce_cosine",
        "ann_bq_hamming_topk",
        "doc_tfidf_top_terms",
    ):
        df = all_queries()[name].fn(spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "WindowGroupLimit" in plan, name
        assert ", Partial" in plan, name
        assert ", Final" in plan, name
        # the Partial pass sits BELOW the exchange (deeper in the
        # tree string), the Final above it
        partial = plan.index(", Partial")
        final = plan.index(", Final")
        assert final < partial, name


def test_tfidf_tf_relation_computed_once(spark):
    """The tf relation is a diamond (feeds the df aggregation AND the
    scored join); the persist must keep the explode + (doc_id, term)
    exchange from being planned twice — exactly one InMemoryRelation
    caches it, and the raw (doc_id, term) aggregation appears in only
    one subtree."""
    df = all_queries()["doc_tfidf_top_terms"].fn(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan
    # both consumers read the cache: two scans of ONE cached relation
    assert plan.count("InMemoryTableScan") == 2


def test_tfidf_vocab_join_not_hint_forced(spark):
    """The tf-x-df join must NOT carry a broadcast hint: df's size is
    |vocabulary| (unbounded at crawl scale — 1e8-1e9 distinct terms),
    and a forced broadcast OOMs there instead of degrading. Un-hinted,
    the planner broadcasts only below autoBroadcastJoinThreshold (AQE
    re-checks with runtime stats) and falls back to a shuffled join
    otherwise. The analyzed plan is where a F.broadcast() call shows
    up as ResolvedHint — assert it is absent."""
    df = all_queries()["doc_tfidf_top_terms"].fn(spark, SF)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed
    # the join itself still exists (not silently dropped)
    a = audit(df)
    assert a.n_broadcast_hash_joins + a.n_sortmerge_joins >= 1


def test_bm25_query_term_broadcast_is_bounded(spark):
    """text_bm25_retrieval keeps its broadcast hint — but only because
    the broadcast relation is structurally bounded: tf is pre-filtered
    to the fixed query-term set, so df has at most len(_BM25_QUERY)
    rows at ANY corpus size. Pin that the hint count matches the one
    bounded relation and no other (an added hint on an unbounded side
    would fail this)."""
    df = all_queries()["text_bm25_retrieval"].fn(spark, SF)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert analyzed.count("ResolvedHint") == 1


# --- repo-wide guard: no unpartitioned window over an unbounded relation ----
# rfm/gini carried a global ntile/row_number for TEN rounds of
# per-query pins before the two-phase rewrite; only a universal audit
# catches the next one at introduction time.


def test_unpartitioned_window_detector_catches_the_bad_shape(spark):
    """Self-check before the sweep: the detector must flag a literal
    global window, pass a partitioned one, and exempt a provably
    bounded (post-limit) input — otherwise a silently-broken detector
    makes the repo-wide guard vacuous."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from divolte_collector_spark.plans import unpartitioned_unbounded_windows

    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") % 5).alias("g")
    )
    bad = df.withColumn("rn", F.row_number().over(Window.orderBy("k")))
    assert unpartitioned_unbounded_windows(bad)
    good = df.withColumn(
        "rn", F.row_number().over(Window.partitionBy("g").orderBy("k"))
    )
    assert not unpartitioned_unbounded_windows(good)
    bounded = df.limit(10).withColumn(
        "rn", F.row_number().over(Window.orderBy("k"))
    )
    assert not unpartitioned_unbounded_windows(bounded)
    # and it sees through a persist: a cached global window still flags
    cached = bad.persist()
    try:
        assert unpartitioned_unbounded_windows(cached.select("k", "rn"))
    finally:
        cached.unpersist()


def test_loop_join_detector_calibration(spark):
    """Self-check for the round-11 guards: the loop-join detector
    must flag a genuine unbounded cross join, accept one whose
    broadcast side is structurally bounded (limit / local relation /
    scalar aggregate), and the row-wise-Python detector must flag a
    pickled UDF while passing an Arrow one."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    from divolte_collector_spark.plans import (
        rowwise_python_nodes,
        unbounded_loop_joins,
    )

    # sides must be real scans: spark.range is a literal RangeExec,
    # which the boundedness check (correctly) accepts
    a = spark.read.parquet(f"{SF}/nation.parquet").select(
        F.col("n_nationkey").alias("x")
    )
    b = spark.read.parquet(f"{SF}/region.parquet").select(
        F.col("r_regionkey").alias("y")
    )
    bad = a.crossJoin(F.broadcast(b))
    assert unbounded_loop_joins(bad)
    bounded = a.crossJoin(F.broadcast(b.limit(5)))
    assert not unbounded_loop_joins(bounded)
    scalar = a.crossJoin(F.broadcast(b.agg(F.max("y").alias("m"))))
    assert not unbounded_loop_joins(scalar)

    pickled = F.udf(lambda v: v + 1, LongType(), useArrow=False)
    assert rowwise_python_nodes(a.select(pickled(F.col("x"))))
    arrow = F.udf(lambda v: v + 1, LongType(), useArrow=True)
    assert not rowwise_python_nodes(a.select(arrow(F.col("x"))))


def test_loop_join_detector_local_relation_boundedness(spark):
    """Round-12 loophole closure (VERDICT r11 item 2): an RDD-backed
    local relation (PySpark createDataFrame) on a loop-join broadcast
    side is bounded ONLY when built through bounded_local_relation(),
    which registers its row count; an unregistered or oversized one
    falls through to unbounded. LocalTableScan rows are capped too."""
    import pytest
    from pyspark.sql import functions as F

    import importlib

    from divolte_collector_spark.plans import (
        bounded_local_relation,
        unbounded_loop_joins,
    )

    # plans/__init__ re-exports the audit() FUNCTION under the module's
    # name, so a plain `import ... as` resolves to the function
    audit_mod = importlib.import_module("divolte_collector_spark.plans.audit")

    a = spark.read.parquet(f"{SF}/nation.parquet").select(
        F.col("n_nationkey").alias("x")
    )
    # unregistered createDataFrame: the round-11 guard accepted this
    # shape unconditionally; now it must flag
    plain = spark.createDataFrame([(i,) for i in range(50)], "y long")
    assert unbounded_loop_joins(a.crossJoin(F.broadcast(plain)))
    # registered, small: accepted on the recorded count
    grid = bounded_local_relation(
        spark, [(i,) for i in range(50)], "y long"
    )
    assert not unbounded_loop_joins(a.crossJoin(F.broadcast(grid)))
    # the registered frame stays accepted in a NON-EQUI (range) join,
    # the sample_pps_systematic shape
    rj = a.join(
        F.broadcast(grid), (F.col("x") >= F.col("y")) & (F.col("x") < F.col("y") + 5)
    )
    assert not unbounded_loop_joins(rj)
    # oversized registration refuses outright
    with pytest.raises(ValueError):
        bounded_local_relation(
            spark,
            [(i,) for i in range(audit_mod._LOCAL_RELATION_CAP + 1)],
            "y long",
        )


def test_loop_join_detector_subquery_and_cartesian(spark):
    """ADVICE r11: (a) a cartesian/loop join hiding inside a SCALAR
    SUBQUERY plan (expression-attached, not a child) is swept; (b)
    CartesianProductExec with BOTH sides structurally bounded is
    accepted like the BNLJ branch, while an unbounded side still
    flags."""
    from pyspark.sql import functions as F

    from divolte_collector_spark.plans import (
        unbounded_loop_joins,
        unpartitioned_unbounded_windows,
    )

    a = spark.read.parquet(f"{SF}/nation.parquet").select(
        F.col("n_nationkey").alias("x")
    )
    b = spark.read.parquet(f"{SF}/region.parquet").select(
        F.col("r_regionkey").alias("y")
    )
    a.createOrReplaceTempView("_cal_a")
    b.createOrReplaceTempView("_cal_b")
    try:
        # scalar subquery whose plan contains an unbounded loop join
        sq = spark.sql(
            "SELECT x, (SELECT max(p.x * q.y) FROM _cal_a p "
            "CROSS JOIN _cal_b q) AS m FROM _cal_a"
        )
        assert unbounded_loop_joins(sq)
        # scalar subquery containing an unpartitioned global window
        wq = spark.sql(
            "SELECT x, (SELECT max(r) FROM (SELECT row_number() "
            "OVER (ORDER BY y) AS r FROM _cal_b)) AS m FROM _cal_a"
        )
        assert unpartitioned_unbounded_windows(wq)
        # bounded x bounded cartesian: forced with the replicate-NL
        # hint so neither side broadcasts; must NOT flag
        both = (
            a.limit(3)
            .hint("shuffle_replicate_nl")
            .crossJoin(b.limit(5).hint("shuffle_replicate_nl"))
        )
        plan = both._jdf.queryExecution().executedPlan().toString()
        if "CartesianProduct" in plan:  # hint honored on this version
            assert not unbounded_loop_joins(both)
        # one unbounded side still flags
        bad = a.hint("shuffle_replicate_nl").crossJoin(
            b.hint("shuffle_replicate_nl")
        )
        assert unbounded_loop_joins(bad)
    finally:
        spark.catalog.dropTempView("_cal_a")
        spark.catalog.dropTempView("_cal_b")


#: BNLJ sides that are SEMANTICALLY bounded but not structurally
#: provable from the plan: a filter on a literal key range over a
#: unique key. Each entry is query -> (allowed loop-join count, why
#: it is safe at any corpus size) — the count is part of the
#: contract, so an allowlisted query growing an ADDITIONAL loop join
#: still fails the sweep. The recall-comparison queries broadcast the
#: same bounded probe relation at MULTIPLE stages (rank_fusion_rrf:
#: dense arm + sparse fusion; ann_bq_rerank_recall: Hamming shortlist
#: + exact rerank + ground truth). vector_near_dup_exact is the one
#: deliberate
#: exception: the quadratic exact-recall baseline, whose documented
#: scale answer is the LSH sibling (ORACLE_INFEASIBLE names it too).
_PROBE_SIDE_WHY = (
    "broadcast side is filter(vec_id < N_QUERY_VECTORS) on the "
    "unique vec_id key - at most N_QUERY probe rows, a literal "
    "in the program text"
)
_LOOP_JOIN_ALLOWLIST: dict = {
    "ann_bq_hamming_topk": (1, _PROBE_SIDE_WHY),
    "ann_bq_rerank_recall": (3, _PROBE_SIDE_WHY),
    "ann_recall_probe_frontier": (1, _PROBE_SIDE_WHY),
    "knn_bruteforce_cosine": (1, _PROBE_SIDE_WHY),
    "rank_fusion_rrf": (2, _PROBE_SIDE_WHY),
    "recall_ann_vs_exact": (1, _PROBE_SIDE_WHY),
    "timeseries_similarity_topk": (1, _PROBE_SIDE_WHY),
    "vector_nn_descent_recall": (1, _PROBE_SIDE_WHY),
    "vector_near_dup_exact": (
        1,
        "the deliberately quadratic exact-recall baseline (per-family "
        "ground truth; the scale path is embedding_near_dup_lsh)",
    ),
}


def test_no_gated_query_has_unpartitioned_unbounded_window(spark):
    """EVERY gated query's physical plan is swept for the three shapes
    that cannot survive a 100 TB relation:

    - WindowExec with an empty partition spec over un-limited input
      (single-task global sort) — queries needing a global order ride
      operators/prefixsum.py's two-phase scan instead; allowlist EMPTY
      as of round 11;
    - CartesianProduct, or BroadcastNestedLoopJoin whose broadcast
      side is not structurally bounded — allowlisted only with a
      written boundedness argument (_LOOP_JOIN_ALLOWLIST);
    - BatchEvalPython (pickled row-at-a-time UDF) — the policy is
      Arrow-only Python crossings, no exceptions.

    One plan build per query; three guards per plan."""
    from divolte_collector_spark.plans import (
        rowwise_python_nodes,
        unbounded_loop_joins,
        unpartitioned_unbounded_windows,
    )

    WINDOW_ALLOWLIST: dict[str, str] = {}
    offenders = {}
    for name, rq in sorted(all_queries().items()):
        df = rq.fn(spark, SF)
        hits = []
        if name not in WINDOW_ALLOWLIST:
            hits += unpartitioned_unbounded_windows(df)
        lj = unbounded_loop_joins(df)
        allowed = _LOOP_JOIN_ALLOWLIST.get(name, (0, ""))[0]
        if len(lj) > allowed:
            # the allowlist covers a FIXED count of documented loop
            # joins per query; any join beyond it is a new defect the
            # entry must not mask
            hits += lj[allowed:]
        hits += rowwise_python_nodes(df)
        if hits:
            offenders[name] = hits
        spark.catalog.clearCache()
    assert not offenders, offenders


def test_rfm_and_gini_rank_scans_are_partitioned(spark):
    """The round-11 rewrite criterion: agg_user_rfm_segments (3x
    ntile) and agg_user_activity_gini (row_number, former names
    aliased) must rank via the bucketed
    two-phase scan — windows PARTITIONED on the scan bucket, offsets
    broadcast, and no unpartitioned WindowExec anywhere (the repo-wide
    guard asserts the same globally; this pins the specific shape so
    a regression names the query, not just the sweep)."""
    from divolte_collector_spark.plans import unpartitioned_unbounded_windows

    for name in ("agg_user_rfm_segments", "agg_user_activity_gini"):
        df = all_queries()[name].fn(spark, SF)
        assert not unpartitioned_unbounded_windows(df), name
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "_psb" in plan, name       # the bucketed scan column
        a = audit(df)
        assert a.n_broadcast_hash_joins >= 1, name  # offset dimension
        assert not a.has_cartesian_product, name
        spark.catalog.clearCache()
