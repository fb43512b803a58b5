"""Training-data-pipeline operators over the ``documents`` table:
deduplication (exact, n-gram Jaccard, MinHash+LSH), text analysis
(language-ID heuristic, quality scoring, token counting, document
fingerprinting).

All of these stay in the DataFrame API (no Python UDFs): shingling is
``transform(sequence(...))``, MinHash is ``min(md5(seed || shingle))``
per seed — deterministic and portable, so every query has an exact
DuckDB oracle.

Scale notes:
- (doc, shingle) exploding is linear in corpus token count and
  partitions on doc_id; the pair-join for verification is bounded by
  LSH candidate generation (band-bucket join), not all-pairs.
- The *_planted variants union in deterministically mutated copies of
  every 10th document so the near-dup path has true positives to find
  (the synthetic corpus contains no natural near-duplicates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from divolte_collector_spark.queries import query
from divolte_collector_spark.queries._persist import detach_result
from divolte_collector_spark.session import load_table, spread_scan, track_persist

PLANT_OFFSET = 1_000_000
MINHASH_K = 16
LSH_BANDS = 8  # 8 bands x 2 rows


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def tokens_col(text: str = "text"):
    return F.split(F.col(text), " ")


def shingles_expr(tok_col: str, k: int = 3) -> str:
    """Distinct k-word shingles of a token-array column (SQL expr).

    Documents shorter than ``k`` tokens yield an EMPTY array (matching
    the oracle's ``range(1, len-1)``) — without the guard, Spark's
    ``sequence(0, size-k)`` produces a DESCENDING sequence for short
    docs and ``slice(..., 0, k)`` fails the whole job at runtime."""
    return (
        f"CASE WHEN size({tok_col}) >= {k} THEN "
        f"array_distinct(transform(sequence(0, size({tok_col}) - {k}),"
        f" i -> concat_ws(' ', slice({tok_col}, i + 1, {k})))) "
        f"ELSE array() END"
    )


def with_planted_dups(docs: DataFrame) -> DataFrame:
    """Union in a mutated copy (first two tokens dropped) of every 10th
    document at doc_id + PLANT_OFFSET — deterministic near-duplicates."""
    toks = F.split(F.col("text"), " ")
    mutated = (
        docs.filter(F.col("doc_id") % 10 == 0)
        .select(
            (F.col("doc_id") + PLANT_OFFSET).alias("doc_id"),
            # greatest(.., 0): a 1-2 token doc mutates to '' instead of
            # failing the job on a negative slice length
            F.concat_ws(
                " ",
                F.slice(toks, 3, F.greatest(F.size(toks) - 2, F.lit(0))),
            ).alias("text"),
        )
    )
    return docs.select("doc_id", "text").unionByName(mutated)


_PLANTED_SQL = f"""
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + {PLANT_OFFSET} AS doc_id,
           array_to_string(string_split(text, ' ')[3:], ' ') AS text
    FROM documents WHERE doc_id % 10 = 0
"""

_SHINGLE_SQL = """
    SELECT doc_id, unnest(list_distinct(list_transform(
               range(1, len(t) - 1),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS shingle
    FROM (SELECT doc_id, string_split(text, ' ') AS t FROM planted) toks
"""


# --- exact dedup ------------------------------------------------------------

_EXACT_DEDUP_ORACLE = f"""
WITH planted AS ({_PLANTED_SQL})
SELECT md5(text) AS content_hash,
       CAST(min(doc_id) AS BIGINT) AS rep_doc_id,
       CAST(count(*) AS BIGINT) AS n_docs
FROM planted
GROUP BY md5(text)
"""


@query("dedup_exact", oracle=_EXACT_DEDUP_ORACLE, cache_plan=True)
def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on content.  At 100 TB this is one
    shuffle on a 128-bit hash — the canonical scalable exact dedup."""
    planted = with_planted_dups(_docs(spark, sf_dir))
    return (
        planted.groupBy(F.md5(F.col("text").cast("binary")).alias("content_hash"))
        .agg(
            F.min("doc_id").alias("rep_doc_id"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )


# --- n-gram Jaccard near-dup ------------------------------------------------

_NGRAM_JACCARD_ORACLE = f"""
WITH planted AS ({_PLANTED_SQL}),
sh AS ({_SHINGLE_SQL}),
counts AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
common AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
    FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b,
       round(CAST(n_common AS DOUBLE) / (ca.n_sh + cb.n_sh - n_common), 6) AS jaccard
FROM common
JOIN counts ca ON ca.doc_id = doc_a
JOIN counts cb ON cb.doc_id = doc_b
WHERE CAST(n_common AS DOUBLE) / (ca.n_sh + cb.n_sh - n_common) >= 0.5
"""


@query(
    "text_dedup_ngram_jaccard",
    oracle=_NGRAM_JACCARD_ORACLE,
    aliases=("dedup_ngram_jaccard",),
)
def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    planted = spread_scan(
        with_planted_dups(_docs(spark, sf_dir)), F.col("doc_id")
    )  # single-file scan: parallelize shingle generation (see minhash);
    # hash on doc_id, not round-robin: keyless repartition pays a local
    # sort of (doc_id, text) before the exchange (sortBeforeRepartition,
    # SPARK-23207) and the deterministic key is retry-safe — measured
    # ~0.1-0.4 s off every planted-corpus query at sf0.1; adaptive (a
    # cluster-scale many-file scan skips the exchange, session.py)
    sh = track_persist(  # three consumers (counts + both self-join
        # sides); the shingle explode would otherwise run three times
        planted.select(
            "doc_id",
            F.explode(F.expr(shingles_expr("split(text, ' ')"))).alias("shingle"),
        )
    )
    counts = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    ca = counts.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    cb = counts.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    jaccard = F.col("n_common").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_common")
    )
    return (
        common.join(ca, "doc_a")
        .join(cb, "doc_b")
        .filter(jaccard >= 0.5)
        .select("doc_a", "doc_b", F.round(jaccard, 6).alias("jaccard"))
    )


# --- MinHash + LSH ----------------------------------------------------------

# Universal-hash permutation family over ONE base hash per shingle:
# h_k(x) = (a_k * (md5_60(x) mod 2^30) + b_k) mod (2^31 - 1).
# One md5 per shingle instead of K (measured ~2x on the signature
# stage); a_k < 2^30 and base < 2^30 keep a_k*x + b_k < 2^61, exact
# in BIGINT on both engines (DuckDB errors on overflow, Java wraps —
# staying under 2^63 sidesteps both).
#
# The MODULUS MUST SIT JUST ABOVE THE RESIDUE UNIVERSE (2^30): with a
# huge prime like 2^61-1, a_k*x + b_k never wraps, every h_k is a
# strictly INCREASING function of x, all K minima collapse to
# monotone images of the single value min(x), and the 8x2 banding
# amplifies nothing (a pair collides in every band or none —
# candidate probability J instead of 1-(1-J^2)^8). With the Mersenne
# prime 2^31-1 the products wrap thoroughly and the K permutations
# order the universe independently, which is what banding requires.
_MH_P = (1 << 31) - 1
_MH_MOD = 1 << 30
_MH_PARAMS = [
    ((1103515245 * k + 12345) % _MH_MOD | 1, (2654435761 * (k + 1)) % _MH_MOD)
    for k in range(MINHASH_K)
]
_SEED_VALUES = ", ".join(f"({k}, {a}, {b})" for k, (a, b) in enumerate(_MH_PARAMS))

#: shared LSH-candidate CTE chain (planted corpus -> shingles -> seeded
#: minhash signatures -> string-agg band keys -> distinct candidate
#: pairs -> per-pair intersection counts). ONE definition for both the
#: jaccard and containment oracles — the Spark side shares
#: _lsh_candidate_pairs the same way, so a banding/seed change cannot
#: drift the two gates apart.
_LSH_CAND_SQL = f"""WITH planted AS ({_PLANTED_SQL}),
sh AS ({_SHINGLE_SQL}),
seeds(h, a, b) AS (VALUES {_SEED_VALUES}),
sh2 AS (
    SELECT doc_id, shingle,
           CAST(('0x' || substr(md5(shingle), 1, 15))::UBIGINT
                % {_MH_MOD} AS BIGINT) AS hsh
    FROM sh
),
sig AS (
    SELECT doc_id, h, min((a * hsh + b) % {_MH_P}) AS mh
    FROM sh2 CROSS JOIN seeds
    GROUP BY doc_id, h
),
band AS (
    SELECT doc_id, h // {MINHASH_K // LSH_BANDS} AS band_id,
           string_agg(mh::VARCHAR, '|' ORDER BY h) AS band_key
    FROM sig GROUP BY doc_id, band_id
),
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM band a JOIN band b
      ON a.band_id = b.band_id AND a.band_key = b.band_key AND a.doc_id < b.doc_id
),
counts AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
common AS (
    SELECT c.doc_a, c.doc_b, count(*) AS n_common
    FROM cand c
    JOIN sh a ON a.doc_id = c.doc_a
    JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
    GROUP BY c.doc_a, c.doc_b
)"""

_MINHASH_ORACLE = f"""
{_LSH_CAND_SQL}
SELECT common.doc_a AS doc_a, common.doc_b AS doc_b,
       round(CAST(n_common AS DOUBLE) / (ca.n_sh + cb.n_sh - n_common), 6) AS jaccard
FROM common
JOIN counts ca ON ca.doc_id = common.doc_a
JOIN counts cb ON cb.doc_id = common.doc_b
"""


#: corpus size past which the near-dup verify joins hint SHUFFLE_HASH.
#: Sized to hand off exactly where broadcast stops: ~50k docs x ~1.6 KB
#: shingle arrays ~ 80 MB — above the session's 64 MB broadcast
#: threshold, so below this the doc-array side broadcasts (today's
#: small-SF plan, unchanged) and above it the alternative is a
#: sort-merge join whose SECOND sort runs over |candidate pairs| rows
#: each carrying a full shingle array (measured at 100x: 46M pairs x
#: ~1.6 KB sorted per join = the G1 humongous-allocation stall,
#: BASELINE.md round-9 controls). SHUFFLE_HASH builds the O(|docs|)
#: array relation per partition and STREAMS the wide pair side —
#: no sort of the pair relation ever happens.
_LSH_SHJ_DOC_THRESHOLD = 50_000


# (app_id, sf_dir) -> (documents path signature, heavy?) — the
# join-shape decision is a pure function of the corpus, so one count
# action per (application, table generation) suffices; without the
# memo EVERY cache_plan build of the three heavy-gated queries re-ran
# the count job (cheap metadata-only, but a scheduler round-trip per
# build). Signature-keyed like the table cache: a regenerated
# documents table changes its signature and forces a recount.
_LSH_HEAVY_CACHE: dict = {}


def _lsh_verify_heavy(spark: SparkSession, sf_dir: str) -> bool:
    """One O(1) parquet-metadata count per (app, table generation)
    deciding the verify-join shape for this corpus size."""
    from divolte_collector_spark import session as sess

    app_id = spark.sparkContext.applicationId
    sig = sess._path_signature(f"{sf_dir}/documents.parquet")
    key = (app_id, sf_dir)
    hit = _LSH_HEAVY_CACHE.get(key)
    if hit is not None and hit[0] == sig:
        return hit[1]
    for k in [k for k in _LSH_HEAVY_CACHE if k[0] != app_id]:
        del _LSH_HEAVY_CACHE[k]
    heavy = _docs(spark, sf_dir).count() > _LSH_SHJ_DOC_THRESHOLD
    _LSH_HEAVY_CACHE[key] = (sig, heavy)
    return heavy


def _lsh_candidate_pairs(
    spark: SparkSession, sf_dir: str
) -> "tuple[DataFrame, DataFrame]":
    """Shared LSH candidate scaffold for both near-dup verifiers
    (jaccard and containment): planted corpus -> signatures+arrays in
    one aggregation -> band-bucket equi-join -> distinct (doc_a <
    doc_b) candidate pairs. Returns (doc_agg [persisted], cand).

    The test parquet is one file => a 2-partition scan; shingle
    generation (concat_ws + array_distinct per doc) is the per-row-
    heavy step and would serialize on 2 cores (measured 3.6 s -> 1.2 s
    at sf0.1). Spread docs across the cluster FIRST — on a real
    many-file table this is a no-op-priced round robin of doc texts.

    All K min-hashes AND the per-doc shingle arrays the verification
    step needs come from ONE aggregation (see _lsh_doc_agg, shared
    with the incremental index builder): one md5 per shingle row, K
    cheap integer permutations of it as columns, a single
    groupBy(doc_id). The exploded |tokens|-row relation is consumed
    exactly once and never persisted — what persists is the compact
    |docs|-row aggregate feeding the three downstream consumers
    (bands + both verification sides). The 60-bit identity hash per
    shingle is reused twice: its mod-2^30 residue feeds the minhash
    permutations, and the full value stands in for the shingle STRING
    in the verification arrays — an 8-byte long instead of a ~25-byte
    string through the shuffle, the persisted arrays, and
    array_intersect (collision p ~ n^2/2^61, negligible).

    Known tradeoff: each cache_plan consumer (jaccard, containment)
    persists its OWN doc_agg, so a sweep that runs both pins two
    byte-identical |docs|-row aggregates (~tens of MB at sf0.1). A
    shared cross-query cache would need to integrate with the plan
    cache's dependency frames (a memo hit must still record the
    load_table deps in every enclosing build, or a table regeneration
    would serve a stale scaffold) — not worth the machinery for the
    footprint; revisit if the doc corpus ever dwarfs executor storage.
    """
    planted = spread_scan(
        with_planted_dups(_docs(spark, sf_dir)), F.col("doc_id")
    )  # adaptive hash spread, not round-robin (see jaccard)
    doc_agg = track_persist(_lsh_doc_agg(planted))
    band = _lsh_bands(doc_agg)
    ba = band.alias("ba")
    bb = band.alias("bb")
    cand = (
        ba.join(
            bb,
            (F.col("ba.band_id") == F.col("bb.band_id"))
            & (F.col("ba.band_key") == F.col("bb.band_key"))
            & (F.col("ba.doc_id") < F.col("bb.doc_id")),
        )
        .select(F.col("ba.doc_id").alias("doc_a"), F.col("bb.doc_id").alias("doc_b"))
        .distinct()
    )
    return doc_agg, cand


def minhash_verified_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures (k=16, md5-based permutations) -> LSH banding
    (8 bands x 2 rows) -> candidate pairs via band-bucket equi-join ->
    exact Jaccard verification on candidates only.
    Returns (doc_a, doc_b, jaccard); shared by the pair query and the
    connected-components clustering step.

    This is the scale path: no all-pairs comparison; candidate
    generation is an equi-join on (band_id, band_key), which shuffles
    on the band key and is O(sum of bucket^2) with tiny buckets.
    """
    doc_agg, cand = _lsh_candidate_pairs(spark, sf_dir)
    # Exact-Jaccard verification restricted to LSH candidates only —
    # the all-pairs shingle self-join would defeat the point of LSH
    # (measured: 200x slower at sf0.1 before this restriction). The
    # verification joins the per-doc shingle ARRAYS already computed in
    # doc_agg (|docs| rows, no extra pass over the exploded relation)
    # and intersects in-memory, bounded by document length.
    #
    # Scale note (measured on the 100x curve, 550k docs): the curve's
    # replicas are text near-dups (J ~ 0.96), so the TRUE pair set —
    # and therefore the candidate set and the output — grows as
    # replicas^2 (46M verified pairs at 100x, from 549k distinct
    # shingle sets). That tail is output-proportional, not a plan
    # defect; an exact-set collapse (group by the canonical shingle
    # array, band only representatives) was tried and REGRESSED here
    # (+ one array-keyed shuffle, ~0 collapse: the corpus has almost
    # no byte-identical sets) — it only pays on corpora with heavy
    # EXACT duplication, where dedup_exact should run first anyway.
    # Also tried and REGRESSED (round 10, same-boot 100x): carrying
    # the arrays INTO the band self-join with first-shared-band
    # exactly-once emission (no distinct, no fetch joins) — 128.8 s
    # vs 56.9 s for this shape. Within a B-doc band bucket the join
    # evaluates ~B^2 row combinations, and with the payload aboard
    # each evaluated combination materializes ~3.4 KB of joined row
    # (~1.5 TB of row-join copying at B~100) — candidates must stay
    # NARROW through the bucket join; payload rides the per-surviving-
    # pair fetch below, streamed via the gated SHUFFLE_HASH hint.
    doc_sh = doc_agg.select("doc_id", "shs", "n_sh")
    if _lsh_verify_heavy(spark, sf_dir):
        doc_sh = doc_sh.hint("shuffle_hash")
    a = doc_sh.select(
        F.col("doc_id").alias("doc_a"),
        F.col("shs").alias("shs_a"),
        F.col("n_sh").alias("n_a"),
    )
    b = doc_sh.select(
        F.col("doc_id").alias("doc_b"),
        F.col("shs").alias("shs_b"),
        F.col("n_sh").alias("n_b"),
    )
    n_common = F.size(F.array_intersect(F.col("shs_a"), F.col("shs_b")))
    jaccard = n_common.cast("double") / (
        F.col("n_a") + F.col("n_b") - n_common
    )
    return (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .select("doc_a", "doc_b", F.round(jaccard, 6).alias("jaccard"))
    )


@query("dedup_minhash_lsh", oracle=_MINHASH_ORACLE, cache_plan=True)
def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_verified_pairs(spark, sf_dir)


# --- containment pairs (asymmetric near-dup) ---------------------------------
# Jaccard misses the quote/subset case a training corpus cares about: a
# short document wholly CONTAINED in a long one has low jaccard (the
# union is large) but containment |A∩B| / min(|A|,|B|) ~ 1. Same LSH
# candidate machinery, different verification measure; the planted
# corpus (each planted doc = an original minus its first two tokens) is
# exactly this shape. Integer-exact gate: containment in ppm by
# integer DIV — no float crosses the engines.

_CONTAINMENT_MIN_PPM = 600_000

_CONTAINMENT_ORACLE = f"""
{_LSH_CAND_SQL}
SELECT common.doc_a AS doc_a, common.doc_b AS doc_b,
       CAST(n_common AS BIGINT) AS n_common,
       CAST(least(ca.n_sh, cb.n_sh) AS BIGINT) AS n_small,
       CAST(n_common * 1000000 // least(ca.n_sh, cb.n_sh) AS BIGINT)
           AS containment_ppm
FROM common
JOIN counts ca ON ca.doc_id = common.doc_a
JOIN counts cb ON cb.doc_id = common.doc_b
WHERE n_common * 1000000 // least(ca.n_sh, cb.n_sh) >= {_CONTAINMENT_MIN_PPM}
"""


@query(
    "containment_pairs_text",
    oracle=_CONTAINMENT_ORACLE,
    cache_plan=True,
    aliases=("text_containment_pairs",),
)
def q_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment near-dup pairs: LSH band candidates
    (_lsh_candidate_pairs, shared with dedup_minhash_lsh), verified by
    the ASYMMETRIC measure |A∩B| / min(|A|,|B|) — the subset/quote
    detector jaccard can't express. Same scale shape as the jaccard
    verify: bucketed candidates only, arrays intersected in-memory,
    threshold pushed into the verify stage so downstream only sees
    real containments."""
    doc_agg, cand = _lsh_candidate_pairs(spark, sf_dir)
    doc_sh = doc_agg.select("doc_id", "shs", "n_sh")
    if _lsh_verify_heavy(spark, sf_dir):
        doc_sh = doc_sh.hint("shuffle_hash")
    a = doc_sh.select(
        F.col("doc_id").alias("doc_a"),
        F.col("shs").alias("shs_a"),
        F.col("n_sh").alias("n_a"),
    )
    b = doc_sh.select(
        F.col("doc_id").alias("doc_b"),
        F.col("shs").alias("shs_b"),
        F.col("n_sh").alias("n_b"),
    )
    n_common = F.size(F.array_intersect(F.col("shs_a"), F.col("shs_b"))).cast(
        "long"
    )
    n_small = F.least(F.col("n_a"), F.col("n_b")).cast("long")
    # the heavy array_intersect is evaluated ONCE; ppm derives from the
    # named columns in a second projection
    return (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            n_common.alias("n_common"),
            n_small.alias("n_small"),
        )
        .withColumn(
            "containment_ppm",
            F.expr("n_common * 1000000L div n_small"),
        )
        .filter(F.col("containment_ppm") >= _CONTAINMENT_MIN_PPM)
    )


# --- near-dup clustering: connected components over LSH pairs ---------------

_CC_ORACLE = f"""
WITH RECURSIVE
pairs AS (
    SELECT doc_a, doc_b FROM ({_MINHASH_ORACLE}) mh WHERE jaccard >= 0.5
),
sym AS (
    SELECT doc_a AS a, doc_b AS b FROM pairs
    UNION ALL
    SELECT doc_b AS a, doc_a AS b FROM pairs
),
reach(node, lab) AS (
    SELECT a, a FROM sym
    UNION
    SELECT s.b, r.lab FROM reach r JOIN sym s ON s.a = r.node
)
SELECT CAST(node AS BIGINT) AS doc_id, CAST(min(lab) AS BIGINT) AS component
FROM reach GROUP BY node
"""


#: verified pairs per document past which the pair-list clustering
#: path warns that it left its intended regime. The pair list is
#: output-proportional — quadratic in duplication depth — so on a
#: deeply-duplicated corpus (the 100x curve measured 46M true pairs
#: from 549k docs ~ 84 pairs/doc) the bounded-state
#: dedup_star_representatives path (<= BANDS edges/doc at ANY
#: duplication depth) is the right tool. 8 = the star path's own
#: per-doc edge bound, the natural crossover.
_PAIR_BLOWUP_FACTOR = 8


def warn_if_pair_blowup(n_pairs: int, n_docs: int) -> bool:
    """Emit the scale self-warning when the verified-pair relation
    exceeds _PAIR_BLOWUP_FACTOR * |docs|; returns whether it fired
    (unit-tested directly; wired into _clustered_components)."""
    if n_pairs <= _PAIR_BLOWUP_FACTOR * max(n_docs, 1):
        return False
    import warnings

    warnings.warn(
        f"pair-list clustering materialized {n_pairs} verified pairs for "
        f"{n_docs} documents (> {_PAIR_BLOWUP_FACTOR}/doc): this path is "
        "output-proportional and quadratic in duplication depth — use "
        "dedup_star_representatives (O(docs) star edges) for corpora "
        "with deep duplication",
        ResourceWarning,
        stacklevel=2,
    )
    return True


def _clustered_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The near-dup clustering both gated consumers share: LSH pairs at
    the 0.5 Jaccard threshold -> connected components -> (doc_id,
    component) longs. One definition so pair_cluster_components (board name until round 9:
    dedup_cluster_components) and
    select_cluster_representatives can never silently cluster over
    different pair sets.

    This is the PAIR PATH — kept for workloads needing the explicit
    verified-pair relation; the documented default for corpus-scale
    clustering is dedup_star_representatives (O(docs) edges at any
    duplication depth). The pair count is checked against the blowup
    bound after the persist (the count is free: CC materializes the
    edge relation anyway) and self-warns past it."""
    from divolte_collector_spark.operators.graph import connected_components

    # persist: CC's per-round actions would otherwise re-run the whole
    # LSH + verify pipeline once per label-propagation round
    edges = track_persist(
        minhash_verified_pairs(spark, sf_dir).filter(F.col("jaccard") >= 0.5)
    )
    warn_if_pair_blowup(edges.count(), _docs(spark, sf_dir).count())
    return connected_components(edges, src="doc_a", dst="doc_b").select(
        F.col("node").cast("long").alias("doc_id"),
        F.col("component").cast("long").alias("component"),
    )


@query(
    "pair_cluster_components",
    oracle=_CC_ORACLE,
    aliases=("dedup_cluster_components",),
)
def q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS from LSH pairs (the step an actual dedup run
    needs: pick one representative per component, drop the rest).
    Iterative min-label propagation, O(component diameter) rounds, one
    shuffle per round — see operators/graph.py.  Component id = min
    doc_id, i.e. the kept representative.  Oracle = DuckDB recursive
    CTE over the identical pair set."""
    return _clustered_components(spark, sf_dir)


# --- text quality scoring ---------------------------------------------------

_QUALITY_ORACLE = """
WITH scored AS (
    SELECT lang, source, doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           length(text) AS n_chars_calc,
           len(list_filter(string_split(text, ' '),
                           x -> x = 'the' OR x = 'a')) AS n_stop
    FROM documents
)
SELECT lang, source,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(avg(n_tokens), 4) AS avg_tokens,
       round(avg(n_chars_calc), 4) AS avg_chars,
       round(list_reduce(list(CAST(n_stop AS DOUBLE) / n_tokens
                              ORDER BY doc_id), (a, b) -> a + b)
             / count(*), 6) AS avg_stopword_ratio,
       round(list_reduce(list(CAST(n_chars_calc - n_tokens + 1 AS DOUBLE)
                              / n_tokens ORDER BY doc_id), (a, b) -> a + b)
             / count(*), 6) AS avg_word_len
FROM scored
GROUP BY lang, source
"""


@query("text_quality_scores", oracle=_QUALITY_ORACLE, cache_plan=True)
def q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = tokens_col()
    n_tokens = F.size(toks)
    n_chars = F.length(F.col("text"))
    n_stop = F.size(F.filter(toks, lambda x: (x == "the") | (x == "a")))
    scored = _docs(spark, sf_dir).select(
        "lang",
        "source",
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_chars.alias("n_chars_calc"),
        n_stop.alias("n_stop"),
    )

    # averages of integer columns are exact under any summation order;
    # averages of per-doc RATIOS are doubles whose sum order differs
    # between engines — fold them in doc_id order on both sides
    def folded_avg(ratio, alias):
        return F.round(
            F.aggregate(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("doc_id", ratio.alias("r")))
                    ),
                    lambda x: x.r,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / F.count(F.lit(1)),
            6,
        ).alias(alias)

    return scored.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_tokens"), 4).alias("avg_tokens"),
        F.round(F.avg("n_chars_calc"), 4).alias("avg_chars"),
        folded_avg(
            F.col("n_stop").cast("double") / F.col("n_tokens"),
            "avg_stopword_ratio",
        ),
        folded_avg(
            (F.col("n_chars_calc") - F.col("n_tokens") + 1).cast("double")
            / F.col("n_tokens"),
            "avg_word_len",
        ),
    )


# --- token counting (whitespace + regex "BPE-ish") --------------------------

_TOKEN_COUNT_ORACLE = """
SELECT source,
       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS ws_tokens,
       CAST(sum(len(regexp_extract_all(text, '[a-z]+|[0-9]+'))) AS BIGINT) AS re_tokens,
       CAST(max(len(string_split(text, ' '))) AS BIGINT) AS max_doc_tokens
FROM documents
GROUP BY source
"""


@query("token_counts", oracle=_TOKEN_COUNT_ORACLE, cache_plan=True)
def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ws = F.size(tokens_col())
    re_t = F.size(F.expr("regexp_extract_all(text, '[a-z]+|[0-9]+', 0)"))
    return (
        _docs(spark, sf_dir)
        .groupBy("source")
        .agg(
            F.sum(ws).cast("long").alias("ws_tokens"),
            F.sum(re_t).cast("long").alias("re_tokens"),
            F.max(ws).cast("long").alias("max_doc_tokens"),
        )
    )


# --- language-ID heuristic --------------------------------------------------

_LANG_ID_ORACLE = """
WITH pred AS (
    SELECT lang,
           CASE
             WHEN len(list_filter(string_split(text, ' '), x -> x = 'the')) >= 2
                  THEN 'en'
             WHEN len(list_filter(string_split(text, ' '), x -> x = 'a')) >= 2
                  THEN 'la'
             ELSE 'unk'
           END AS predicted_lang
    FROM documents
)
SELECT lang, predicted_lang, CAST(count(*) AS BIGINT) AS n
FROM pred GROUP BY lang, predicted_lang
"""


@query("lang_id_heuristic", oracle=_LANG_ID_ORACLE)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = tokens_col()
    n_the = F.size(F.filter(toks, lambda x: x == "the"))
    n_a = F.size(F.filter(toks, lambda x: x == "a"))
    pred = (
        F.when(n_the >= 2, "en").when(n_a >= 2, "la").otherwise("unk")
    )
    return (
        _docs(spark, sf_dir)
        .select("lang", pred.alias("predicted_lang"))
        .groupBy("lang", "predicted_lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --- document fingerprinting ------------------------------------------------

_FINGERPRINT_ORACLE = """
SELECT doc_id,
       md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS fingerprint
FROM documents
"""


@query("doc_fingerprint", oracle=_FINGERPRINT_ORACLE)
def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    norm = F.lower(F.regexp_replace(F.col("text"), r"\s+", " "))
    return _docs(spark, sf_dir).select(
        "doc_id", F.md5(norm.cast("binary")).alias("fingerprint")
    )


# --- SimHash near-dup -------------------------------------------------------
#
# 16-bit SimHash with a portable per-token bit source: bit j of a token
# is the parity of hex digit j of md5(token) — identical arithmetic in
# Spark and DuckDB, so the oracle is exact. Scale shape: one explode of
# distinct tokens (linear in corpus size), one groupBy doc_id computing
# all 16 signed bit-sums map-side, then a groupBy fingerprint — no
# pairwise joins anywhere.

_SIMHASH_BITS = 16

_SIMHASH_ORACLE = f"""
WITH planted AS ({_PLANTED_SQL}),
tok AS (
    SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS t
    FROM planted
),
bits AS (
    SELECT doc_id,
           {", ".join(
               f"sum(CASE WHEN (strpos('0123456789abcdef', substring(md5(t), {j+1}, 1)) - 1) % 2 = 1 "
               f"THEN 1 ELSE -1 END) AS b{j}" for j in range(16)
           )}
    FROM tok GROUP BY doc_id
),
fp AS (
    SELECT doc_id,
           {" + ".join(f"(CASE WHEN b{j} >= 0 THEN {1 << j} ELSE 0 END)" for j in range(16))}
               AS fingerprint
    FROM bits
)
SELECT CAST(fingerprint AS BIGINT) AS fingerprint,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(doc_id) AS BIGINT) AS rep_doc_id
FROM fp
GROUP BY fingerprint
HAVING count(*) > 1
"""


@query("dedup_simhash", oracle=_SIMHASH_ORACLE, cache_plan=True)
def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    planted = spread_scan(
        with_planted_dups(_docs(spark, sf_dir)), F.col("doc_id")
    )  # single-file scan: parallelize the per-token hashing (see
    # minhash); adaptive hash spread, not round-robin (see jaccard)
    tok = planted.select(
        "doc_id",
        F.explode(F.array_distinct(F.split(F.col("text"), " "))).alias("t"),
    )
    tok = tok.withColumn("h", F.md5(F.col("t").cast("binary")))
    bit_sums = [
        F.sum(
            F.when(
                (F.expr(f"instr('0123456789abcdef', substring(h, {j+1}, 1))") - 1) % 2 == 1,
                1,
            ).otherwise(-1)
        ).alias(f"b{j}")
        for j in range(_SIMHASH_BITS)
    ]
    bits = tok.groupBy("doc_id").agg(*bit_sums)
    fp = bits.select(
        "doc_id",
        sum(
            [
                F.when(F.col(f"b{j}") >= 0, F.lit(1 << j)).otherwise(F.lit(0))
                for j in range(_SIMHASH_BITS)
            ],
            F.lit(0),
        ).cast("long").alias("fingerprint"),
    )
    return (
        fp.groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("rep_doc_id"),
        )
        .filter(F.col("n_docs") > 1)
    )


# --- deterministic stratified sampling --------------------------------------
# Training pipelines sample per-stratum quotas (per language, per
# source). A hash-ordered row_number makes the sample deterministic and
# therefore oracle-checkable — and at 100 TB it is exactly the
# shuffle-once plan you want (one window per stratum, no global sort,
# no driver-side randomness).

_STRATIFIED_ORACLE = """
SELECT doc_id, lang
FROM (
    SELECT doc_id, lang,
           row_number() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
           ) AS rn
    FROM documents
)
WHERE rn <= 20
"""


@query("stratified_sample_docs", oracle=_STRATIFIED_ORACLE)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    from pyspark.sql import Window

    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.select("doc_id", "lang", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 20)
        .select("doc_id", "lang")
    )


# --- document chunking ------------------------------------------------------
# Fixed-size token windows with overlap (stride < size), the standard
# pre-tokenization step for LLM training corpora. Pure array
# expressions: tokens once per doc, chunk index sequence exploded
# map-side — no UDF, no shuffle (narrow transform of the scan).

_CHUNK_SIZE = 50
_CHUNK_STRIDE = 40

_CHUNK_ORACLE = f"""
SELECT doc_id, chunk_id,
       array_to_string(toks[(chunk_id * {_CHUNK_STRIDE} + 1)
                           :(chunk_id * {_CHUNK_STRIDE} + {_CHUNK_SIZE})],
                       ' ') AS chunk_text
FROM (
    SELECT doc_id, string_split(text, ' ') AS toks,
           unnest(range(0, greatest(1, CAST(ceil(
               (len(string_split(text, ' ')) - {_CHUNK_SIZE})
               / {_CHUNK_STRIDE}.0) AS BIGINT) + 1))) AS chunk_id
    FROM documents
)
"""


@query("document_chunks", oracle=_CHUNK_ORACLE)
def q_document_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil((F.size(toks) - _CHUNK_SIZE) / float(_CHUNK_STRIDE)).cast("long")
        + 1,
    )
    return (
        docs.select(
            "doc_id",
            toks.alias("toks"),
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
        )
        .select(
            "doc_id",
            "chunk_id",
            F.concat_ws(
                " ",
                F.slice(
                    F.col("toks"),
                    F.col("chunk_id") * _CHUNK_STRIDE + 1,
                    _CHUNK_SIZE,
                ),
            ).alias("chunk_text"),
        )
    )


# --- end-to-end corpus cleaning pipeline ------------------------------------
# The composition an actual pretraining-data run executes: exact dedup
# (keep the lowest doc_id per content hash) -> quality gate (length +
# stopword-ratio bands) -> language gate (n-gram heuristic). One
# narrow scan computes every per-doc signal; the only shuffle is the
# dedup groupBy on the content hash. Output: the kept corpus manifest.

_CLEAN_ORACLE = """
WITH planted AS ({planted}),
scored AS (
    SELECT doc_id, text,
           md5(text) AS content_hash,
           len(string_split(text, ' ')) AS n_tokens,
           len(list_filter(string_split(text, ' '),
                           x -> x = 'the' OR x = 'a')) AS n_stop
    FROM planted
),
dedup AS (
    SELECT *, row_number() OVER (PARTITION BY content_hash
                                 ORDER BY doc_id) AS rn
    FROM scored
)
SELECT doc_id, content_hash, CAST(n_tokens AS BIGINT) AS n_tokens
FROM dedup
WHERE rn = 1
  AND n_tokens BETWEEN 10 AND 5000
  AND CAST(n_stop AS DOUBLE) / n_tokens BETWEEN 0.02 AND 0.6
  AND len(list_filter(string_split(text, ' '), x -> x = 'the')) >= 2
"""


@query(
    "corpus_clean_pipeline",
    oracle=_CLEAN_ORACLE.format(planted=_PLANTED_SQL),
)
def q_corpus_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread: the token filters + md5 ran in the single scan task
    planted = spread_scan(
        with_planted_dups(_docs(spark, sf_dir)), F.col("doc_id")
    )
    toks = tokens_col()
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda x: (x == "the") | (x == "a")))
    n_the = F.size(F.filter(toks, lambda x: x == "the"))
    scored = planted.select(
        "doc_id",
        F.md5(F.col("text").cast("binary")).alias("content_hash"),
        n_tokens.alias("n_tokens"),
        n_stop.alias("n_stop"),
        n_the.alias("n_the"),
    )
    from pyspark.sql import Window

    rn = F.row_number().over(
        Window.partitionBy("content_hash").orderBy("doc_id")
    )
    return (
        scored.withColumn("rn", rn)
        .filter(
            (F.col("rn") == 1)
            & F.col("n_tokens").between(10, 5000)
            & (F.col("n_stop").cast("double") / F.col("n_tokens")).between(0.02, 0.6)
            & (F.col("n_the") >= 2)
        )
        .select("doc_id", "content_hash", F.col("n_tokens").cast("long").alias("n_tokens"))
    )


# --- UDTF surface: the same chunker as a table function ---------------------
# §2.15 declares the UDTF surface (Python UDTFs, Spark 3.5+). The
# DataFrame chunker above (sequence+explode+slice, pure JVM) is the
# production path; this variant demonstrates the table-function API —
# an Arrow-optimized UDTF applied per input row via a SQL LATERAL
# join — against the SAME oracle, so the two formulations are proven
# equivalent. Use the UDTF form when chunking logic outgrows what
# array expressions express (tokenizer-aware splits, sentence
# boundaries); it stays a narrow map over the scan — no shuffle.


@query(
    "udtf_document_chunks",
    oracle=_CHUNK_ORACLE,
    aliases=("document_chunks_udtf",),
)
def q_document_chunks_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    from pyspark.sql.functions import udtf

    size, stride = _CHUNK_SIZE, _CHUNK_STRIDE

    @udtf(
        returnType="doc_id: bigint, chunk_id: bigint, chunk_text: string",
        useArrow=True,
    )
    class ChunkDocument:
        def eval(self, doc_id: int, text: str):
            if text is None:
                # the DataFrame variant's explode(null) and the oracle
                # both drop null-text docs: zero rows, not one '' chunk
                return
            toks = text.split(" ")
            n = max(1, math.ceil((len(toks) - size) / stride) + 1)
            for i in range(n):
                yield doc_id, i, " ".join(toks[i * stride : i * stride + size])

    spark.udtf.register("chunk_document", ChunkDocument)
    # spread: the per-row UDTF eval otherwise runs through ONE python
    # worker on the single scan task (session.spread_scan)
    spread_scan(_docs(spark, sf_dir), F.col("doc_id")).createOrReplaceTempView(
        "_chunk_docs_in"
    )
    return spark.sql(
        "SELECT c.doc_id, c.chunk_id, c.chunk_text "
        "FROM _chunk_docs_in, LATERAL chunk_document(doc_id, text) c"
    )


# --- benchmark decontamination ----------------------------------------------
# The training-data op near-dup does NOT cover: a train document is
# contaminated if it shares ANY k-gram with the held-out eval set —
# threshold-free overlap, not similarity. Scale shape: the eval side
# is tiny by construction (benchmarks are thousands of docs, the
# corpus is billions) — its distinct shingle set BROADCASTS, and the
# train side streams through a broadcast semi-join-style equi-join +
# per-doc count. The corpus never shuffles on the shingle key.

_EVAL_DOCS = 20

_DECONTAM_ORACLE = f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
sh AS (
    SELECT doc_id, unnest(list_distinct(list_transform(
               range(1, len(t) - 1),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS shingle
    FROM toks
),
ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id < {_EVAL_DOCS})
SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_overlap
FROM sh s JOIN ev USING (shingle)
WHERE s.doc_id >= {_EVAL_DOCS}
GROUP BY s.doc_id
"""


@query("decontaminate_against_eval", oracle=_DECONTAM_ORACLE)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread: the shingle explode feeds both branches from the single
    # scan task otherwise (session.spread_scan)
    docs = spread_scan(_docs(spark, sf_dir), F.col("doc_id"))
    sh = docs.select(
        "doc_id",
        F.explode(F.expr(shingles_expr("split(text, ' ')"))).alias("shingle"),
    )
    ev = (
        sh.filter(F.col("doc_id") < _EVAL_DOCS)
        .select("shingle")
        .distinct()
    )
    return (
        sh.filter(F.col("doc_id") >= _EVAL_DOCS)
        .join(F.broadcast(ev), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )


# --- PII redaction ----------------------------------------------------------
# Regex scrubbing of email/phone patterns before training. The corpus
# is synthetic, so PII is PLANTED deterministically (every 7th doc
# gains an email + phone token) and the oracle plants identically.
# Patterns avoid engine-specific syntax (no lookarounds) so Java regex
# and RE2 agree. Pure regexp expressions — narrow map, no shuffle; the
# md5 of the redacted text proves byte-identical redaction output
# without hauling full text through the compare.

_EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
_PHONE_RE = "[0-9]{3}-[0-9]{4}"

_PII_ORACLE = f"""
WITH planted AS (
    SELECT doc_id,
           CASE WHEN doc_id % 7 = 0
                THEN text || ' contact-' || CAST(doc_id % 10 AS VARCHAR)
                     || '@mail.example call 555-0199'
                ELSE text END AS text
    FROM documents
),
red AS (
    SELECT doc_id,
           len(regexp_extract_all(text, '{_EMAIL_RE}')) AS n_emails,
           len(regexp_extract_all(text, '{_PHONE_RE}')) AS n_phones,
           regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                          '{_PHONE_RE}', '<PHONE>', 'g') AS redacted
    FROM planted
)
SELECT doc_id, CAST(n_emails AS BIGINT) AS n_emails,
       CAST(n_phones AS BIGINT) AS n_phones,
       md5(redacted) AS redacted_hash
FROM red
"""


@query("pii_redact", oracle=_PII_ORACLE)
def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    planted = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact-"),
                (F.col("doc_id") % 10),
                F.lit("@mail.example call 555-0199"),
            ),
        ).otherwise(F.col("text")).alias("text"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(F.col("text"), _EMAIL_RE, "<EMAIL>"),
        _PHONE_RE,
        "<PHONE>",
    )
    return planted.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(_EMAIL_RE), F.lit(0)))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all("text", F.lit(_PHONE_RE), F.lit(0)))
        .cast("long")
        .alias("n_phones"),
        F.md5(redacted.cast("binary")).alias("redacted_hash"),
    )


# --- intra-document repetition filter ---------------------------------------
# Gopher-style repetition signals: the fraction of duplicate tokens
# and duplicate bigrams INSIDE each document (boilerplate and
# degenerate generations repeat heavily). Pure array expressions over
# the token array — narrow map, no shuffle, no Python.

_REPETITION_ORACLE = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
sig AS (
    SELECT doc_id,
           1.0 - CAST(len(list_distinct(t)) AS DOUBLE) / len(t) AS dup_tok,
           1.0 - CAST(len(list_distinct(list_transform(
                     range(1, len(t)), i -> t[i] || ' ' || t[i+1])))
                 AS DOUBLE) / (len(t) - 1) AS dup_bigram
    FROM toks
)
SELECT doc_id, round(dup_tok, 6) AS dup_token_ratio,
       round(dup_bigram, 6) AS dup_bigram_ratio,
       (dup_tok >= 0.3) AS flagged
FROM sig
"""


@query("repetition_filter", oracle=_REPETITION_ORACLE)
def q_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the per-doc bigram build + two array_distinct passes are
    # per-row-heavy; spread the single-file scan (session.spread_scan)
    toks = tokens_col()
    bigrams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - 2),
        lambda i: F.concat_ws(
            " ", F.element_at(toks, i + 1), F.element_at(toks, i + 2)
        ),
    )
    dup_tok = F.lit(1.0) - F.size(F.array_distinct(toks)).cast("double") / F.size(
        toks
    )
    dup_bigram = F.lit(1.0) - F.size(F.array_distinct(bigrams)).cast(
        "double"
    ) / (F.size(toks) - 1)
    return spread_scan(_docs(spark, sf_dir), F.col("doc_id")).select(
        "doc_id",
        F.round(dup_tok, 6).alias("dup_token_ratio"),
        F.round(dup_bigram, 6).alias("dup_bigram_ratio"),
        (dup_tok >= 0.3).alias("flagged"),
    )


# --- training shard packing (distributed prefix sum) ------------------------
# The last step of a pretraining-data run: pack documents, in a
# deterministic order, into fixed-token-budget shards. The shard id is
# a function of the GLOBAL cumulative token count — the naive
# sum() OVER (ORDER BY ...) with no partition collapses 100 TB into a
# single window task, so this runs on operators/prefixsum.py's
# two-phase parallel scan (bucketed partial sums + driver prefix over
# |buckets| values + per-bucket windows). The oracle IS the naive
# global window — proving the distributed scan computes the identical
# prefix.

SHARD_TOKENS = 2000

_SHARD_ORACLE = f"""
WITH t AS (
    SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents
),
c AS (
    SELECT doc_id, n_tokens,
           sum(n_tokens) OVER (ORDER BY doc_id
                               ROWS UNBOUNDED PRECEDING) AS cum
    FROM t
)
SELECT CAST((cum - n_tokens) // {SHARD_TOKENS} AS BIGINT) AS shard_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       CAST(min(doc_id) AS BIGINT) AS first_doc,
       CAST(max(doc_id) AS BIGINT) AS last_doc
FROM c GROUP BY 1
"""


@query("training_shard_manifest", oracle=_SHARD_ORACLE)
def q_training_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    from divolte_collector_spark.operators.prefixsum import global_cumsum

    t = _docs(spark, sf_dir).select(
        "doc_id", F.size(tokens_col()).cast("long").alias("n_tokens")
    )
    c = global_cumsum(t, "doc_id", "n_tokens", bucket_width=100)
    shard = F.floor((F.col("cumsum") - F.col("n_tokens")) / SHARD_TOKENS).cast(
        "long"
    )
    return (
        c.groupBy(shard.alias("shard_id"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


# --- incremental dedup (new batch vs historical corpus) ---------------------
# The daily-ingest shape: yesterday's corpus is immutable history; the
# incoming batch must drop exact duplicates of anything already kept
# AND its own internal duplicates (keeping each batch's lowest doc_id).
# One shuffle on the content hash for the anti-join against history +
# one for the intra-batch groupBy — at 100 TB the history side is a
# bucketed-by-hash table so the anti-join co-locates without reshuffle.

_INCR_SPLIT = 400  # doc_id < 400 -> history, rest -> incoming batch

_INCR_DEDUP_ORACLE = f"""
WITH planted AS ({_PLANTED_SQL}),
history AS (SELECT md5(text) AS h FROM planted WHERE doc_id < {_INCR_SPLIT}),
batch AS (SELECT doc_id, text, md5(text) AS h FROM planted
          WHERE doc_id >= {_INCR_SPLIT}),
fresh AS (
    SELECT b.doc_id, b.h FROM batch b
    WHERE NOT EXISTS (SELECT 1 FROM history x WHERE x.h = b.h)
)
SELECT h AS content_hash, CAST(min(doc_id) AS BIGINT) AS kept_doc_id,
       CAST(count(*) AS BIGINT) AS n_batch_copies
FROM fresh GROUP BY h
"""


@query("dedup_incremental", oracle=_INCR_DEDUP_ORACLE)
def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    planted = with_planted_dups(_docs(spark, sf_dir))
    hashed = planted.select(
        "doc_id", F.md5(F.col("text").cast("binary")).alias("content_hash")
    )
    history = hashed.filter(F.col("doc_id") < _INCR_SPLIT).select("content_hash")
    batch = hashed.filter(F.col("doc_id") >= _INCR_SPLIT)
    fresh = batch.join(history, "content_hash", "left_anti")
    return fresh.groupBy("content_hash").agg(
        F.min("doc_id").alias("kept_doc_id"),
        F.count(F.lit(1)).alias("n_batch_copies"),
    )


# --- duplicated-span fraction (C4/RefinedWeb-style corpus signal) -----------

_DUP_FRACTION_ORACLE = f"""
WITH planted AS ({_PLANTED_SQL}),
sh AS ({_SHINGLE_SQL}),
owners AS (
    SELECT shingle, count(*) AS n_docs FROM sh GROUP BY shingle
)
SELECT s.doc_id,
       CAST(count(*) AS BIGINT) AS n_shingles,
       round(CAST(sum(CASE WHEN o.n_docs > 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS dup_fraction,
       (CAST(sum(CASE WHEN o.n_docs > 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*)) >= 0.5 AS flagged
FROM sh s JOIN owners o ON o.shingle = s.shingle
GROUP BY s.doc_id
"""


@query("text_duplicate_fraction", oracle=_DUP_FRACTION_ORACLE)
def q_duplicate_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-span fraction: the share of a document's
    distinct 3-word shingles that also occur in at least one OTHER
    document — the corpus-level repetition signal C4-style pipelines
    threshold on before training (complement to ``repetition_filter``,
    which is intra-document). Docs at >= 0.5 are flagged.

    Scale shape: the exploded (doc, shingle) relation is shuffled
    twice — once aggregating shingle -> doc count, once aggregating
    back to docs — and the shingle-count join re-uses the first
    shuffle's partitioning (equi-key). No pairwise join of documents
    anywhere: cost is linear in total shingles, which is what lets the
    same plan run at 100 TB where any doc x doc formulation cannot. At
    that scale the shingle strings would ride as xxhash64 ids through
    the shuffles (as dedup_minhash_lsh does); kept as strings here for
    engine-exact oracle comparison.
    """
    planted = spread_scan(
        with_planted_dups(_docs(spark, sf_dir)), F.col("doc_id")
    )  # adaptive hash spread, not round-robin (see jaccard)
    sh = track_persist(  # both sides of the count-join read it
        planted.select(
            "doc_id",
            F.explode(F.expr(shingles_expr("split(text, ' ')"))).alias("shingle"),
        )
    )
    owners = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("n_docs"))
    dup = F.sum((F.col("n_docs") > 1).cast("long"))
    n = F.count(F.lit(1))
    frac = dup.cast("double") / n
    return (
        sh.join(owners, "shingle")
        .groupBy("doc_id")
        .agg(
            n.alias("n_shingles"),
            F.round(frac, 6).alias("dup_fraction"),
            (frac >= 0.5).alias("flagged"),
        )
    )


# --- per-source quota (skew-safe two-phase top-K) ---------------------------
# Web-corpus pipelines cap how many documents any one domain may
# contribute (C4 / RefinedWeb per-domain quotas). The direct
# formulation — row_number() PARTITION BY source — sends EVERY row of a
# hot domain to one reducer; a crawl where one domain is 10% of 100 TB
# puts 10 TB in a single window task. The skew-safe shape prunes
# first: phase 1 ranks within (source, salt) so a hot source spreads
# over N_SALT reducers and survivors are capped at N_SALT * QUOTA per
# source; phase 2 ranks the tiny survivor set within source. Any
# global top-QUOTA doc has < QUOTA docs ahead of it overall, hence
# < QUOTA ahead within its own salt bucket — so phase 1 never drops a
# final keeper and the result equals the one-window oracle exactly.

SOURCE_QUOTA = 10
_QUOTA_SALTS = 8

_SOURCE_QUOTA_ORACLE = f"""
SELECT doc_id, source, quota_rank
FROM (
    SELECT doc_id, source,
           row_number() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
           ) AS quota_rank
    FROM documents
)
WHERE quota_rank <= {SOURCE_QUOTA}
"""


@query("source_quota_sample", oracle=_SOURCE_QUOTA_ORACLE)
def q_source_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir).select(
        "doc_id",
        "source",
        F.md5(F.col("doc_id").cast("string")).alias("_rk"),
        (F.col("doc_id") % _QUOTA_SALTS).alias("_salt"),
    )
    w1 = Window.partitionBy("source", "_salt").orderBy("_rk", "doc_id")
    survivors = (
        docs.withColumn("_rn1", F.row_number().over(w1))
        .filter(F.col("_rn1") <= SOURCE_QUOTA)  # <= SALTS*QUOTA rows/source
    )
    w2 = Window.partitionBy("source").orderBy("_rk", "doc_id")
    return (
        survivors.withColumn("quota_rank", F.row_number().over(w2))
        .filter(F.col("quota_rank") <= SOURCE_QUOTA)
        .select("doc_id", "source", "quota_rank")
    )


# --- epoch-seeded global permutation ----------------------------------------
# Training loaders need each epoch's corpus order to be (a) a
# different pseudo-random permutation per seed, (b) deterministic and
# resumable, (c) computed WITHOUT a global single-task sort. Hashing
# (seed, doc_id) gives the order; the global position comes from the
# two-phase prefix sum (operators/prefixsum.py) over count-1 rows,
# bucketed by the hash's leading byte — monotone in the hash, so the
# distributed scan reproduces the naive ROW_NUMBER() OVER (ORDER BY
# hash) exactly. Emitting position % n_readers also pins the
# per-reader interleave a multi-worker loader would consume.

PERM_SEED = 7
_PERM_READERS = 4

_PERM_ORACLE = f"""
SELECT doc_id, position, CAST(position % {_PERM_READERS} AS BIGINT) AS reader
FROM (
    SELECT doc_id,
           row_number() OVER (
               ORDER BY md5({PERM_SEED} || ':' || CAST(doc_id AS VARCHAR))
           ) - 1 AS position
    FROM documents
)
"""


@query("seeded_corpus_permutation", oracle=_PERM_ORACLE)
def q_seeded_permutation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from divolte_collector_spark.operators.prefixsum import global_cumsum

    keyed = _docs(spark, sf_dir).select(
        "doc_id",
        F.md5(
            F.concat(
                F.lit(str(PERM_SEED)), F.lit(":"), F.col("doc_id").cast("string")
            )
        ).alias("_pk"),
        F.lit(1).cast("long").alias("_one"),
    )
    # md5 hex is fixed-width lowercase, so lexicographic order == value
    # order and the leading byte is a monotone bucket for the scan
    bucket = F.conv(F.substring("_pk", 1, 2), 16, 10).cast("long")
    pos = global_cumsum(keyed, "_pk", "_one", bucket=bucket)
    return pos.select(
        "doc_id",
        (F.col("cumsum") - 1).alias("position"),
        ((F.col("cumsum") - 1) % _PERM_READERS).alias("reader"),
    )


# --- heavy hitters (count-min sketch candidates, exact verify) --------------
# "Which tokens dominate the corpus" (stopword discovery, boilerplate
# detection) at 100 TB cannot start with groupBy(token): that shuffles
# the full token multiset. The mergeable count-min sketch is the scale
# primitive: ONE partial-agg shuffle of d x w counters (d*w = 192
# values regardless of input size), candidates read the driver-held
# sketch map-side, and only candidate occurrences reach the exact
# verification aggregation. CMS only over-counts (min over d rows >=
# true count), so candidate generation has no false negatives and the
# verified output equals the exact-SQL oracle.

_CMS_SEEDS = (101, 211, 307)
_CMS_W = 64
_HH_SHARE = 0.02  # heavy hitter = >= 2% of all corpus tokens


_HEAVY_HITTER_ORACLE = f"""
WITH toks AS (
    SELECT unnest(string_split(text, ' ')) AS tok FROM documents
),
tot AS (SELECT count(*) AS n FROM toks)
SELECT tok, CAST(count(*) AS BIGINT) AS n_occurrences,
       round(count(*) / (SELECT n FROM tot), 6) AS share
FROM toks GROUP BY tok
HAVING count(*) >= {_HH_SHARE} * (SELECT n FROM tot)
"""


@query("token_heavy_hitters", oracle=_HEAVY_HITTER_ORACLE)
def q_token_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _docs(spark, sf_dir).select(
        F.explode(tokens_col()).alias("tok")
    )
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("i"),
                F.pmod(F.xxhash64(F.col("tok"), F.lit(s)), F.lit(_CMS_W)).alias(
                    "slot"
                ),
            )
            for i, s in enumerate(_CMS_SEEDS)
        ]
    )
    sketch_rows = (
        toks.select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.i").alias("i"), F.col("c.slot").alias("slot"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()  # <= d*w = 192 rows: bounded driver state, like centroids
    )
    # every row of the sketch sums to the total token count
    total = sum(int(r["cnt"]) for r in sketch_rows if r["i"] == 0)
    threshold = _HH_SHARE * total
    sketch_df = spark.createDataFrame(
        [(int(r["i"]), int(r["slot"]), int(r["cnt"])) for r in sketch_rows],
        "i int, slot long, cnt long",
    )
    # candidates: distinct tokens (map-side partial distinct keeps this
    # vocab-sized) probed against the broadcast sketch; min over the d
    # rows upper-bounds the true count -> no false negatives
    cand = (
        toks.distinct()
        .select(
            "tok",
            F.explode(cells).alias("c"),
        )
        .select("tok", F.col("c.i").alias("i"), F.col("c.slot").alias("slot"))
        .join(F.broadcast(sketch_df), ["i", "slot"])
        .groupBy("tok")
        .agg(F.min("cnt").alias("ub"))
        .filter(F.col("ub") >= threshold)
        .select("tok")
    )
    # exact verify: only candidate occurrences reach the aggregation
    return (
        toks.join(F.broadcast(cand), "tok")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .filter(F.col("n_occurrences") >= threshold)
        .select(
            "tok",
            "n_occurrences",
            F.round(F.col("n_occurrences") / F.lit(float(total)), 6).alias(
                "share"
            ),
        )
    )


# --- Bloom-prefiltered incremental dedup ------------------------------------
# Same contract as dedup_incremental (drop batch rows whose content
# hash exists in the immutable history, then intra-batch dedup) with
# the membership test restructured for a history far larger than the
# batch: instead of anti-joining EVERY batch row against history, the
# history is folded once into per-bucket Bloom bitmaps (a bounded
# groupBy of bucket x word -> bit_or, buckets*m/64 longs total) that
# broadcast to the batch scan. Bloom has no false negatives, so rows
# with any unset bit are PROVABLY new and skip the join entirely; only
# the Bloom-positive sliver (true dups + the ~(1-e^-kn/m)^k false
# positive rate) pays the exact anti-join. At 100 TB-history scale the
# bitmaps are the only state that moves, and they are data-size
# independent. The oracle is the plain anti-join SQL — the Bloom layer
# must be output-invisible. Build/probe live in operators/bloom.py
# (property-tested for the no-false-negative guarantee).


@query("prefilter_bloom_incremental_dedup", oracle=_INCR_DEDUP_ORACLE)
def q_bloom_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from divolte_collector_spark.operators.bloom import build_bloom, probe_bloom

    planted = with_planted_dups(_docs(spark, sf_dir))
    hashed = planted.select(
        "doc_id", F.md5(F.col("text").cast("binary")).alias("content_hash")
    )
    history = hashed.filter(F.col("doc_id") < _INCR_SPLIT).select("content_hash")
    batch = hashed.filter(F.col("doc_id") >= _INCR_SPLIT)

    blooms = build_bloom(history, "content_hash")
    flags = probe_bloom(batch, "content_hash", blooms)
    surely_new = flags.filter(~F.col("maybe_member"))
    maybe_dup = flags.filter(F.col("maybe_member"))
    verified_new = maybe_dup.join(history, "content_hash", "left_anti")
    fresh = surely_new.unionByName(verified_new).select("doc_id", "content_hash")
    return fresh.groupBy("content_hash").agg(
        F.min("doc_id").alias("kept_doc_id"),
        F.count(F.lit(1)).alias("n_batch_copies"),
    )


# --- TF-IDF top terms -------------------------------------------------------
# Classic sparse lexical weighting (the retrieval-side complement to
# the dense-embedding family): tf(doc, term) from one exploded
# aggregation, document frequency from the tf relation itself (one
# term-keyed aggregation over |vocab|-bounded partials), smoothed
# idf = ln((N+1)/(df+1)) + 1 joined back by broadcast (vocab-sized),
# and a per-doc top-k window for the final ranking. Three partitioned
# shuffles, all partial-aggregated; nothing is quadratic and no state
# exceeds vocab size except the (doc, term) relation, which is the
# output's own cardinality.

_TFIDF_TOP_K = 3

_TFIDF_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (
    SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term
),
df AS (
    SELECT term, count(*) AS df FROM tf GROUP BY term
),
n AS (SELECT count(*) AS n FROM documents),
scored AS (
    SELECT t.doc_id, t.term,
           round(t.tf * (ln(((SELECT n FROM n) + 1.0) / (d.df + 1.0)) + 1.0),
                 6) AS score
    FROM tf t JOIN df d USING (term)
),
ranked AS (
    SELECT doc_id, term, score,
           row_number() OVER (
               PARTITION BY doc_id ORDER BY score DESC, term
           ) AS rnk
    FROM scored
)
SELECT doc_id, term, score, CAST(rnk AS BIGINT) AS rnk
FROM ranked WHERE rnk <= {_TFIDF_TOP_K}
"""


@query(
    "doc_tfidf_top_terms",
    oracle=_TFIDF_ORACLE,
    aliases=("tfidf_top_terms",),
)
def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    from pyspark.storagelevel import StorageLevel

    docs = _docs(spark, sf_dir)
    n_docs = docs.count()  # one scalar action, the corpus row count
    # tf is a DIAMOND: it feeds both the df aggregation and the scored
    # join, and Catalyst plans the two subtrees independently — without
    # the persist, the explode plus the (doc_id, term) exchange run
    # TWICE (the dominant cost of this query's 100x curve point; the
    # top-k rank shuffle itself is already bounded by Spark's partial
    # WindowGroupLimit, see tests/test_plan_shapes.py). MEMORY_AND_DISK
    # so the (doc, term) relation spills instead of evicting at scale.
    # spread before the explode: the token explode AND its (doc, term)
    # partial aggregation otherwise run inside the single-task scan
    # (one-row-group input); hash on doc_id, adaptive no-op on a
    # many-partition production scan (session.spread_scan). Interleaved
    # A/B at sf0.1: 6.0/1.6/1.6 s -> 1.7/0.9/0.8 s.
    from divolte_collector_spark.session import spread_scan

    tf = (
        spread_scan(docs, F.col("doc_id"))
        .select("doc_id", F.explode(tokens_col()).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log((F.lit(n_docs) + 1.0) / (F.col("df") + 1.0)) + 1.0
    # NO broadcast hint on the document-frequency relation: its size is
    # |vocabulary| — corpus-dependent and unbounded (a crawl-scale corpus
    # has 1e8-1e9 distinct terms), and a FORCED broadcast OOMs the
    # driver/executors at that point instead of degrading. Un-hinted, the
    # planner broadcasts only below spark.sql.autoBroadcastJoinThreshold
    # (AQE re-checks with observed stats) and falls back to a shuffled
    # join otherwise — the right behavior at every corpus size. Pinned by
    # tests/test_plan_shapes.py::test_tfidf_vocab_join_not_hint_forced.
    scored = tf.join(df, "term").select(
        "doc_id", "term",
        F.round(F.col("tf") * idf, 6).alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), "term")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= _TFIDF_TOP_K)
        .select("doc_id", "term", "score", "rnk")
    )


# --- group-aware train/validation/test split --------------------------------
# Deterministic corpus splitting with the leakage rule evaluation
# pipelines need: the split is a hash of the GROUP (source domain),
# not the document, so near-duplicates within one domain can never
# straddle train and test. Pure map-side expression over the scan —
# no shuffle at all for assignment; the tiny per-split summary is one
# partial-agg. The hash is md5-derived so both engines compute the
# identical assignment (seeded: bump the seed to re-deal the split).

_SPLIT_SEED = 13
_SPLIT_TRAIN, _SPLIT_VAL = 80, 90  # train <80, val 80-89, test 90-99

_SPLIT_BUCKET_SQL = (
    f"CAST(('0x' || substr(md5({_SPLIT_SEED} || '|' || source), 1, 8))"
    " AS BIGINT) % 100"
)

_SPLIT_ORACLE = f"""
SELECT doc_id, source,
       CASE WHEN {_SPLIT_BUCKET_SQL} < {_SPLIT_TRAIN} THEN 'train'
            WHEN {_SPLIT_BUCKET_SQL} < {_SPLIT_VAL} THEN 'val'
            ELSE 'test' END AS split
FROM documents
"""


@query("train_test_split_groups", oracle=_SPLIT_ORACLE)
def q_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    bucket = F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{_SPLIT_SEED}|"), F.col("source"))), 1, 8
            ),
            16, 10,
        ).cast("long"),
        F.lit(100),
    )
    split = (
        F.when(bucket < _SPLIT_TRAIN, "train")
        .when(bucket < _SPLIT_VAL, "val")
        .otherwise("test")
    )
    return _docs(spark, sf_dir).select("doc_id", "source", split.alias("split"))


# --- snapshot drift (population stability index) ----------------------------
# Corpus monitoring between two snapshots (yesterday's crawl vs
# today's): bin a feature, compare the two distributions with PSI =
# sum((p - q) * ln(p / q)). Here the snapshots are the even/odd halves
# of the corpus and the feature is document length. Two partial-agg
# shuffles over bin ids (output is |bins| rows); the PSI sum itself is
# a scalar fold over the bin relation. Laplace-smoothed so empty bins
# don't produce infinities; all arithmetic is the same explicit
# expression on both engines.

_PSI_BIN_W = 40  # chars per bin
_PSI_EPS = 0.5  # Laplace smoothing count


_DRIFT_ORACLE = f"""
WITH snap AS (
    SELECT doc_id % 2 AS snap_id, n_chars // {_PSI_BIN_W} AS bin
    FROM documents
),
counts AS (
    SELECT bin,
           sum(CASE WHEN snap_id = 0 THEN 1 ELSE 0 END) AS n0,
           sum(CASE WHEN snap_id = 1 THEN 1 ELSE 0 END) AS n1
    FROM snap GROUP BY bin
),
tot AS (SELECT sum(n0) AS t0, sum(n1) AS t1, count(*) AS nb FROM counts),
probs AS (
    SELECT bin,
           (n0 + {_PSI_EPS}) / (t0 + {_PSI_EPS} * nb) AS p,
           (n1 + {_PSI_EPS}) / (t1 + {_PSI_EPS} * nb) AS q
    FROM counts, tot
)
SELECT CAST(bin AS BIGINT) AS bin, round(p, 9) AS p, round(q, 9) AS q,
       round((p - q) * ln(p / q), 9) AS psi_term
FROM probs
"""


@query("snapshot_drift_psi", oracle=_DRIFT_ORACLE)
def q_snapshot_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir).select(
        (F.col("doc_id") % 2).alias("snap_id"),
        F.floor(F.col("n_chars") / _PSI_BIN_W).alias("bin"),
    )
    counts = docs.groupBy("bin").agg(
        F.sum(F.when(F.col("snap_id") == 0, 1).otherwise(0)).alias("n0"),
        F.sum(F.when(F.col("snap_id") == 1, 1).otherwise(0)).alias("n1"),
    )
    tot = counts.agg(
        F.sum("n0").alias("t0"), F.sum("n1").alias("t1"),
        F.count(F.lit(1)).alias("nb"),
    )
    p = (F.col("n0") + _PSI_EPS) / (F.col("t0") + _PSI_EPS * F.col("nb"))
    q = (F.col("n1") + _PSI_EPS) / (F.col("t1") + _PSI_EPS * F.col("nb"))
    return counts.crossJoin(F.broadcast(tot)).select(
        F.col("bin").cast("long").alias("bin"),
        F.round(p, 9).alias("p"),
        F.round(q, 9).alias("q"),
        F.round((p - q) * F.log(p / q), 9).alias("psi_term"),
    )


# --- contrastive negative sampling ------------------------------------------
# Contrastive/embedding training needs (anchor, negative) pairs with
# negatives drawn uniformly-at-random but REPRODUCIBLY (resumable jobs
# re-derive the same pairs). The draw is hash-based: negative i of an
# anchor is md5(anchor:i) mod (N-1), shifted past the anchor itself so
# a doc never pairs with itself. Pair generation is a map-side explode
# (no randomness state, no shuffle); fetching the negatives' text is
# ONE equi-join on doc id — at 100 TB the join is shuffle-on-key
# against the corpus's own layout, and the k-per-anchor fan-out is the
# output size, not an intermediate. Assumes the corpus carries a dense
# 0..N-1 doc index (true of the provided tables; a general corpus
# derives one once via seeded_corpus_permutation's positions).

_NEG_K = 4


_NEG_SAMPLE_ORACLE = f"""
WITH n AS (SELECT count(*) AS n FROM documents),
draws AS (
    SELECT d.doc_id AS anchor_id, i.i AS neg_rank,
           CAST(('0x' || substr(md5(d.doc_id || ':' || i.i), 1, 12))
                AS BIGINT) % ((SELECT n FROM n) - 1) AS off
    FROM documents d CROSS JOIN (SELECT unnest(range({_NEG_K})) AS i) i
),
pairs AS (
    SELECT anchor_id, CAST(neg_rank AS BIGINT) AS neg_rank,
           CASE WHEN off >= anchor_id THEN off + 1 ELSE off END AS neg_id
    FROM draws
)
SELECT p.anchor_id, p.neg_rank, p.neg_id, t.source AS neg_source
FROM pairs p JOIN documents t ON t.doc_id = p.neg_id
"""


@query("sample_negatives_contrastive", oracle=_NEG_SAMPLE_ORACLE)
def q_sample_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    n = docs.count()
    draws = docs.select(
        F.col("doc_id").alias("anchor_id"),
        F.explode(F.sequence(F.lit(0), F.lit(_NEG_K - 1))).alias("neg_rank"),
    ).select(
        "anchor_id",
        F.col("neg_rank").cast("long").alias("neg_rank"),
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("anchor_id").cast("string"),
                            F.lit(":"),
                            F.col("neg_rank").cast("string"),
                        )
                    ),
                    1, 12,
                ),
                16, 10,
            ).cast("long"),
            F.lit(n - 1),
        ).alias("off"),
    )
    pairs = draws.select(
        "anchor_id", "neg_rank",
        F.when(F.col("off") >= F.col("anchor_id"), F.col("off") + 1)
        .otherwise(F.col("off"))
        .alias("neg_id"),
    )
    targets = docs.select(
        F.col("doc_id").alias("neg_id"), F.col("source").alias("neg_source")
    )
    return pairs.join(targets, "neg_id").select(
        "anchor_id", "neg_rank", "neg_id", "neg_source"
    )


# --- length-bucketed batching (padding-efficiency) --------------------------
# Training loaders batch similar-length documents together so padding
# to the batch max wastes little compute. Docs bucket by token-length
# band, order deterministically inside the band, and chop into
# fixed-size batches; the emitted per-batch stats (max length, padded
# vs real tokens, waste fraction) are exactly what a loader needs to
# pick band widths. One shuffle on the band key; the window partitions
# by band (bounded by the band's doc count, never the corpus), and the
# per-batch aggregation reuses the same partitioning.

_LB_BAND = 16  # tokens per length band
_LB_BATCH = 8  # docs per batch


_LENGTH_BATCH_ORACLE = f"""
WITH t AS (
    SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents
),
ranked AS (
    SELECT doc_id, n_tokens, n_tokens // {_LB_BAND} AS band,
           row_number() OVER (
               PARTITION BY n_tokens // {_LB_BAND}
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
           ) - 1 AS rn
    FROM t
)
SELECT CAST(band AS BIGINT) AS band,
       CAST(rn // {_LB_BATCH} AS BIGINT) AS batch_idx,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(max(n_tokens) AS BIGINT) AS max_len,
       CAST(sum(n_tokens) AS BIGINT) AS real_tokens,
       round(1.0 - CAST(sum(n_tokens) AS DOUBLE)
                   / (count(*) * max(n_tokens)), 6) AS pad_waste
FROM ranked GROUP BY band, rn // {_LB_BATCH}
"""


@query("token_length_batches", oracle=_LENGTH_BATCH_ORACLE)
def q_token_length_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    t = _docs(spark, sf_dir).select(
        "doc_id", F.size(tokens_col()).cast("long").alias("n_tokens")
    ).withColumn("band", F.floor(F.col("n_tokens") / _LB_BAND))
    w = Window.partitionBy("band").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    ranked = t.withColumn("rn", F.row_number().over(w) - 1)
    return (
        ranked.groupBy(
            F.col("band").cast("long").alias("band"),
            F.floor(F.col("rn") / _LB_BATCH).cast("long").alias("batch_idx"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.max("n_tokens").alias("max_len"),
            F.sum("n_tokens").alias("real_tokens"),
            F.round(
                1.0
                - F.sum("n_tokens").cast("double")
                / (F.count(F.lit(1)) * F.max("n_tokens")),
                6,
            ).alias("pad_waste"),
        )
    )


# --- sequence packing into fixed-length training contexts -------------------
# Pack tokenized documents into fixed CTX-token training contexts —
# the step after length batching in an LLM data loader. True
# first-fit-decreasing needs sequential bin state (each placement
# depends on every earlier one), which neither distributes nor
# oracle-checks; this is the distributed formulation: quantize each
# document's (truncated) length up to a power-of-two slot size, so
# every document in a (slot size, salt) bucket occupies an identical
# slot and the FFD placement collapses to a CLOSED FORM — sort
# decreasing, rank, context = rank div slots_per_context. Packing
# quality is that of FFD on quantized lengths (fill fractions reported
# per context); assignment is a pure function of (rank, qlen), so both
# engines agree bit-for-bit.
#
# 100 TB shape: the only shuffle is the (qlen, salt) bucket exchange;
# windows partition by bucket, never the corpus, and NSALT scales with
# the cluster so a popular length band spreads over NSALT reducers.
# No sequential state, no driver collect, no global sort.

PACK_CTX = 256  # tokens per training context
PACK_NSALT = 4  # reducers per length band


_PACK_ORACLE = f"""
WITH t AS (
    SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents
),
q AS (
    SELECT doc_id, n_tokens,
           LEAST(n_tokens, {PACK_CTX}) AS eff_len,
           CASE WHEN LEAST(n_tokens, {PACK_CTX}) <= 8 THEN 8
                WHEN LEAST(n_tokens, {PACK_CTX}) <= 16 THEN 16
                WHEN LEAST(n_tokens, {PACK_CTX}) <= 32 THEN 32
                WHEN LEAST(n_tokens, {PACK_CTX}) <= 64 THEN 64
                WHEN LEAST(n_tokens, {PACK_CTX}) <= 128 THEN 128
                ELSE {PACK_CTX} END AS qlen,
           doc_id % {PACK_NSALT} AS salt
    FROM t
),
ranked AS (
    SELECT *, row_number() OVER (
               PARTITION BY qlen, salt
               ORDER BY eff_len DESC, doc_id) - 1 AS rk
    FROM q
),
assigned AS (
    SELECT doc_id, n_tokens, eff_len, qlen, salt,
           rk // ({PACK_CTX} // qlen) AS ctx_idx,
           rk % ({PACK_CTX} // qlen) AS slot
    FROM ranked
)
SELECT CAST(qlen AS BIGINT) || '-' || CAST(salt AS BIGINT) || '-'
           || CAST(ctx_idx AS BIGINT) AS context_id,
       CAST(doc_id AS BIGINT) AS doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(slot * qlen AS BIGINT) AS seq_begin,
       CAST(slot * qlen + eff_len AS BIGINT) AS seq_end,
       round(CAST(sum(eff_len) OVER (
                 PARTITION BY qlen, salt, ctx_idx) AS DOUBLE)
             / {PACK_CTX}, 6) AS ctx_fill
FROM assigned
"""


@query("pack_sequences_ffd", oracle=_PACK_ORACLE)
def q_pack_sequences_ffd(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    eff = F.least(F.size(tokens_col()).cast("long"), F.lit(PACK_CTX))
    t = _docs(spark, sf_dir).select(
        "doc_id",
        F.size(tokens_col()).cast("long").alias("n_tokens"),
        eff.alias("eff_len"),
        F.when(eff <= 8, 8)
        .when(eff <= 16, 16)
        .when(eff <= 32, 32)
        .when(eff <= 64, 64)
        .when(eff <= 128, 128)
        .otherwise(PACK_CTX)
        .cast("long")
        .alias("qlen"),
        (F.col("doc_id") % PACK_NSALT).cast("long").alias("salt"),
    )
    w = Window.partitionBy("qlen", "salt").orderBy(
        F.desc("eff_len"), "doc_id"
    )
    ranked = t.withColumn("rk", F.row_number().over(w) - 1)
    # exact integer arithmetic throughout (div, not floating floor):
    # qlen is a power of two dividing PACK_CTX, so slots per context
    # and the rank split are all exact
    assigned = ranked.select(
        "doc_id", "n_tokens", "eff_len", "qlen", "salt",
        F.expr(f"rk div ({PACK_CTX} div qlen)").alias("ctx_idx"),
        (F.col("rk") % F.expr(f"{PACK_CTX} div qlen")).alias("slot"),
    )
    wc = Window.partitionBy("qlen", "salt", "ctx_idx")
    return assigned.select(
        F.concat_ws(
            "-",
            F.col("qlen").cast("string"),
            F.col("salt").cast("string"),
            F.col("ctx_idx").cast("string"),
        ).alias("context_id"),
        F.col("doc_id").cast("long").alias("doc_id"),
        "n_tokens",
        (F.col("slot") * F.col("qlen")).cast("long").alias("seq_begin"),
        (F.col("slot") * F.col("qlen") + F.col("eff_len"))
        .cast("long")
        .alias("seq_end"),
        F.round(
            F.sum("eff_len").over(wc).cast("double") / PACK_CTX, 6
        ).alias("ctx_fill"),
    )


# --- corpus overlap via bottom-k sketch -------------------------------------
# "How much does corpus B overlap corpus A" without joining them: the
# bottom-k sketch. Hash every distinct shingle, keep the k smallest
# hash values of the UNION, and count how many of those appear in both
# corpora — that fraction estimates the Jaccard similarity with
# standard error ~1/sqrt(k), using k values of state per corpus
# regardless of corpus size. The gated query computes the estimate AND
# the exact Jaccard (affordable at test SF) side by side, so the
# oracle pins both and the estimate's machinery is verified against
# its own ground truth. Work: one distinct-aggregation per corpus and
# a k-limit over the union — no shingle-to-shingle join anywhere.

_BK_K = 64


_OVERLAP_ORACLE = f"""
WITH sh AS (
    SELECT DISTINCT doc_id % 2 AS corpus,
           unnest(list_distinct(list_transform(
               range(1, len(t) - 1),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS shingle
    FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents) x
),
hashes AS (SELECT DISTINCT corpus, md5(shingle) AS h FROM sh),
presence AS (
    SELECT h, max(CASE WHEN corpus = 0 THEN 1 ELSE 0 END) AS in_a,
           max(CASE WHEN corpus = 1 THEN 1 ELSE 0 END) AS in_b
    FROM hashes GROUP BY h
),
bottomk AS (SELECT * FROM presence ORDER BY h LIMIT {_BK_K}),
est AS (
    SELECT CAST(sum(in_a * in_b) AS BIGINT) AS shared_in_k,
           CAST(count(*) AS BIGINT) AS k
    FROM bottomk
),
exact AS (
    SELECT CAST(sum(in_a * in_b) AS BIGINT) AS n_inter,
           CAST(count(*) AS BIGINT) AS n_union
    FROM presence
)
SELECT e.k, e.shared_in_k,
       round(CAST(e.shared_in_k AS DOUBLE) / e.k, 6) AS jaccard_est,
       x.n_inter, x.n_union,
       round(CAST(x.n_inter AS DOUBLE) / x.n_union, 6) AS jaccard_exact
FROM est e CROSS JOIN exact x
"""


@query("sketch_corpus_overlap", oracle=_OVERLAP_ORACLE)
def q_sketch_corpus_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread: shingle explode + md5 otherwise serial in the scan task
    sh = (
        spread_scan(_docs(spark, sf_dir), F.col("doc_id"))
        .select(
            (F.col("doc_id") % 2).alias("corpus"),
            F.explode(F.expr(shingles_expr("split(text, ' ')"))).alias(
                "shingle"
            ),
        )
        .select("corpus", F.md5("shingle").alias("h"))
        .distinct()
    )
    presence = sh.groupBy("h").agg(
        F.max(F.when(F.col("corpus") == 0, 1).otherwise(0)).alias("in_a"),
        F.max(F.when(F.col("corpus") == 1, 1).otherwise(0)).alias("in_b"),
    )
    bottomk = presence.orderBy("h").limit(_BK_K)
    est = bottomk.agg(
        F.sum(F.col("in_a") * F.col("in_b")).alias("shared_in_k"),
        F.count(F.lit(1)).alias("k"),
    )
    exact = presence.agg(
        F.sum(F.col("in_a") * F.col("in_b")).alias("n_inter"),
        F.count(F.lit(1)).alias("n_union"),
    )
    return est.crossJoin(exact).select(
        "k", "shared_in_k",
        F.round(F.col("shared_in_k").cast("double") / F.col("k"), 6).alias(
            "jaccard_est"
        ),
        "n_inter", "n_union",
        F.round(F.col("n_inter").cast("double") / F.col("n_union"), 6).alias(
            "jaccard_exact"
        ),
    )


# --- BM25 retrieval ----------------------------------------------------------
# The sparse ranker proper (the production counterpart rank_fusion_rrf
# fuses with a dense ANN list): Okapi BM25 over the corpus for a fixed
# query term set. tf comes from the one exploded aggregation filtered
# to query terms (predicate pushdown keeps the explode-join output
# query-term-sized, not vocab-sized), df and the average document
# length are broadcast scalars/vocab-rows, and the per-doc score sum
# is a |query|-bounded aggregation. All floating math is spelled as
# the same expression on both engines.

_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_QUERY = ("spark", "table", "join")
_BM25_TOP = 20


_BM25_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
dl AS (SELECT doc_id, count(*) AS dlen FROM toks GROUP BY doc_id),
stats AS (
    SELECT count(*) AS n_docs, avg(dlen) AS avg_len FROM dl
),
tf AS (
    SELECT doc_id, term, count(*) AS tf FROM toks
    WHERE term IN {_BM25_QUERY!r}
    GROUP BY doc_id, term
),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scored AS (
    SELECT t.doc_id,
           list_reduce(list(
               ln(1 + ((SELECT n_docs FROM stats) - d.df + 0.5)
                      / (d.df + 0.5))
               * t.tf * ({_BM25_K1} + 1)
               / (t.tf + {_BM25_K1} * (1 - {_BM25_B}
                   + {_BM25_B} * l.dlen / (SELECT avg_len FROM stats)))
               ORDER BY term), (a, b) -> a + b) AS score
    FROM tf t JOIN df d USING (term) JOIN dl l USING (doc_id)
    GROUP BY t.doc_id
)
SELECT doc_id, round(score, 9) AS bm25,
       CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
           AS rnk
FROM scored
QUALIFY rnk <= {_BM25_TOP}
"""


@query("text_bm25_retrieval", oracle=_BM25_ORACLE)
def q_text_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    toks = _docs(spark, sf_dir).select(
        "doc_id", F.explode(tokens_col()).alias("term")
    )
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dlen"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dlen").alias("avg_len")
    ).collect()[0]
    n_docs, avg_len = int(stats["n_docs"]), float(stats["avg_len"])
    tf = (
        toks.filter(F.col("term").isin(list(_BM25_QUERY)))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        1 + (F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    denom = F.col("tf") + _BM25_K1 * (
        1 - _BM25_B + _BM25_B * F.col("dlen") / F.lit(avg_len)
    )
    # per-doc score as an ordered left-fold over the (few) query
    # terms: an unordered double SUM's addition order can differ
    # between engines and flip the exact hash at a rounding or rank
    # boundary (the repo's standing float discipline)
    contrib = (idf * F.col("tf") * (_BM25_K1 + 1) / denom).alias("c")
    # This broadcast IS bounded, unlike the tfidf vocab join: tf is
    # pre-filtered to the fixed query-term set, so df here has at most
    # len(_BM25_QUERY) rows at ANY corpus size — a structural bound,
    # not a measured one. The hint stays.
    scored = (
        tf.join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("term", contrib))),
                    lambda x: x.c,
                ),
                F.lit(0.0),
                lambda a, x: a + x,
            ).alias("score")
        )
    )
    # top-k via orderBy+limit (TakeOrdered: per-partition heads merged)
    # — a no-partition row_number window would be one task over every
    # matching doc; the rank window below runs on only k survivors
    top = scored.orderBy(F.desc("score"), "doc_id").limit(_BM25_TOP)
    w = Window.orderBy(F.desc("score"), "doc_id")
    return (
        top.withColumn("rnk", F.row_number().over(w).cast("long"))
        .select("doc_id", F.round("score", 9).alias("bm25"), "rnk")
    )


# --- temperature-resampled source mixture -----------------------------------
# The multilingual/multi-domain rebalancing step every pretraining mix
# does (alpha-temperature sampling, e.g. XLM-R's alpha=0.3..0.7): big
# sources are downweighted to w_s = n_s^alpha so the mixture is less
# dominated by the largest domain, then documents are drawn
# DETERMINISTICALLY (md5-uniform per doc) with per-source acceptance
# probability p_s = min(1, B * w_s / sum(w) / n_s) for a total budget
# B = N/2. Everything is one tiny per-source aggregate broadcast back
# over the scan — the corpus never shuffles; at 100 TB the source
# stats are the only state that moves.
#
# Cross-engine discipline: sum(w) is an ORDERED left-fold over sources
# (float addition is not associative; an unordered SUM could differ in
# the last ulp and flip an accept at the boundary), and the per-doc
# uniform is integer md5 arithmetic — bit-identical everywhere.

_TEMP_ALPHA_NOTE = "alpha = 0.5 (sqrt damping), exact in binary floating point"

_TEMP_MIX_ORACLE = """
WITH s AS (
    SELECT source, CAST(count(*) AS BIGINT) AS n
    FROM documents GROUP BY source
),
t AS (
    SELECT sum(n) AS total,
           list_reduce(list(sqrt(n) ORDER BY source),
                       (a, b) -> a + b) AS sumw
    FROM s
),
p AS (
    SELECT s.source, s.n,
           least(1.0, CAST(t.total // 2 AS DOUBLE) * sqrt(s.n)
                      / t.sumw / s.n) AS p_accept
    FROM s, t
)
SELECT d.doc_id, d.source
FROM documents d JOIN p ON p.source = d.source
WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15))::UBIGINT
           AS DOUBLE) / 1152921504606846976.0 < p.p_accept
"""


@query("temperature_source_mix", oracle=_TEMP_MIX_ORACLE)
def q_temperature_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    s = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    t = s.agg(
        F.sum("n").alias("total"),
        F.aggregate(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("source", F.sqrt("n").alias("w")))
                ),
                lambda x: x.w,
            ),
            F.lit(0.0),
            lambda acc, w: acc + w,
        ).alias("sumw"),
    )
    p = s.crossJoin(F.broadcast(t)).select(
        "source",
        F.least(
            F.lit(1.0),
            F.expr("total div 2").cast("double")
            * F.sqrt("n") / F.col("sumw") / F.col("n"),
        ).alias("p_accept"),
    )
    u = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
        ).cast("double")
        / F.lit(float(1 << 60))
    )
    return (
        docs.join(F.broadcast(p), "source")
        .filter(u < F.col("p_accept"))
        .select("doc_id", "source")
    )


# --- self-trained unigram LM quality score ----------------------------------
# The KenLM-style perplexity gate of CCNet/RefinedWeb, reduced to the
# LM that needs no external model: the corpus's own unigram
# distribution. Two aggregation shuffles bound the whole thing — the
# vocabulary count (token -> c) and the per-doc regroup — plus one
# equi-join of the exploded tokens against the vocabulary (at 100 TB
# that join shuffles on the token key; a head-vocabulary broadcast is
# the standard hybrid). Documents with very low average token
# log-probability are the gibberish/rare-junk tail a corpus gate cuts.
#
# Cross-engine discipline: ln() is rounded to 8 decimals BEFORE the
# per-doc sum (libm vs JVM log can differ in the last ulp), and the
# sum is an ordered left-fold over token positions, so both engines
# add the same doubles in the same order.

_UNIGRAM_LM_ORACLE = """
WITH toks AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS t,
           generate_subscripts(string_split(text, ' '), 1) AS pos
    FROM documents
),
vocab AS (SELECT t, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY t),
tot AS (SELECT CAST(count(*) AS BIGINT) AS total FROM toks),
scored AS (
    SELECT toks.doc_id, toks.pos,
           round(ln(CAST(vocab.c AS DOUBLE) / tot.total), 8) AS lp
    FROM toks JOIN vocab USING (t), tot
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       round(list_reduce(list(lp ORDER BY pos), (a, b) -> a + b)
             / count(*), 6) AS avg_logprob
FROM scored
GROUP BY doc_id
"""


@query("token_unigram_logprob", oracle=_UNIGRAM_LM_ORACLE)
def q_token_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "t")
    )
    vocab = toks.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    # corpus total = sum over the vocabulary counts (exact integers):
    # deriving it from the tiny vocab relation instead of a third
    # count over toks removes one full pass over the exploded stream
    # — the diamond had toks planned THRICE (vocab agg, total agg,
    # scored join); measured 29.0 s -> 23.7 s at 100x volume on the
    # idle-box curve protocol (BASELINE.md round 9)
    tot = vocab.agg(F.sum("c").alias("total"))
    lp = F.round(F.log(F.col("c") / F.col("total")), 8)
    scored = (
        toks.join(vocab, "t")
        .crossJoin(F.broadcast(tot))
        .select("doc_id", "pos", lp.alias("lp"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "lp"))),
                    lambda x: x.lp,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("lp_sum"),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.round(F.col("lp_sum") / F.col("n_tokens"), 6).alias(
                "avg_logprob"
            ),
        )
    )


# --- distributed BPE: pair counting + the first merge, proven twice ---------
# The inner loop of byte-pair-encoding tokenizer training is "count
# all adjacent symbol pairs, merge the most frequent, repeat". At
# corpus scale each iteration is ONE aggregation shuffle over the
# exploded pairs (pair strings are tiny), the winning pair is K=1
# driver-held state (the Lloyd/centroid discipline — the corpus never
# moves for the argmax), and the merge itself is a narrow map
# (left-to-right non-overlapping replace, exactly BPE's scan order —
# which is what replace() implements in both engines). Two iterations
# are unrolled here so the loop is demonstrated, not just the first
# count; per-iteration top-20 pairs gate the result.

_BPE_TOP = 20
_BPE_MARK = "✏"  # placeholder symbol for the merged pair

_BPE_ORACLE = f"""
WITH words AS (
    SELECT unnest(string_split(text, ' ')) AS w FROM documents
),
p1 AS (
    SELECT unnest(list_transform(range(1, length(w)),
                  i -> substring(w, CAST(i AS INT), 2))) AS pair
    FROM words WHERE length(w) >= 2
),
c1 AS (SELECT pair, CAST(count(*) AS BIGINT) AS n FROM p1 GROUP BY pair),
top1 AS (SELECT pair FROM c1 ORDER BY n DESC, pair LIMIT 1),
merged AS (
    SELECT replace(w, top1.pair, chr(9999)) AS w FROM words, top1
),
p2 AS (
    SELECT unnest(list_transform(range(1, length(w)),
                  i -> substring(w, CAST(i AS INT), 2))) AS pair
    FROM merged WHERE length(w) >= 2
),
c2 AS (SELECT pair, CAST(count(*) AS BIGINT) AS n FROM p2 GROUP BY pair),
ranked AS (
    SELECT 1 AS iteration, pair, n,
           row_number() OVER (ORDER BY n DESC, pair) AS rnk FROM c1
    UNION ALL
    SELECT 2 AS iteration, pair, n,
           row_number() OVER (ORDER BY n DESC, pair) AS rnk FROM c2
)
SELECT iteration, pair, n, CAST(rnk AS INT) AS rnk
FROM ranked WHERE rnk <= {_BPE_TOP}
"""


def _bpe_pairs(words: DataFrame) -> DataFrame:
    """Adjacent symbol pairs of every word occurrence (length >= 2)."""
    return (
        words.filter(F.length("w") >= 2)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.length("w") - 1),
                    lambda i: F.col("w").substr(i, F.lit(2)),
                )
            ).alias("pair")
        )
    )


@query("tokenizer_bpe_merge", oracle=_BPE_ORACLE)
def q_tokenizer_bpe_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(F.explode(F.split("text", " ")).alias("w"))
    c1 = _bpe_pairs(words).groupBy("pair").agg(
        F.count(F.lit(1)).alias("n")
    )
    # the argmax pair is K=1 driver-held state, like k-means centroids
    top = c1.orderBy(F.desc("n"), "pair").limit(1).collect()[0]["pair"]
    merged = words.select(
        F.replace(F.col("w"), F.lit(top), F.lit(_BPE_MARK)).alias("w")
    )
    c2 = _bpe_pairs(merged).groupBy("pair").agg(
        F.count(F.lit(1)).alias("n")
    )
    out = []
    for it, c in ((1, c1), (2, c2)):
        w = Window.orderBy(F.desc("n"), "pair")
        out.append(
            c.withColumn("rnk", F.row_number().over(w).cast("int"))
            .filter(F.col("rnk") <= _BPE_TOP)
            .select(F.lit(it).alias("iteration"), "pair", "n", "rnk")
        )
    return out[0].unionByName(out[1])


# --- incremental MinHash-LSH against a persisted signature index ------------
# The daily-crawl ingest shape for NEAR-duplicate dedup (the exact-
# hash version is dedup_incremental): the immutable history's LSH
# band index and verification payloads are PERSISTED ON DISK once;
# each incoming batch computes signatures for ITS OWN documents only,
# equi-joins its bands against the stored index, and exact-verifies
# the candidate sliver. Per-ingest cost is O(batch) signature work +
# an index join — the history is never re-shingled, which is the
# entire point at 100 TB (re-signing a petabyte corpus per daily
# batch is the naive formulation this replaces). Index layout: one
# bands relation keyed (band_id, band_key) and one doc-payload
# relation (shingle-hash arrays + counts) for verification.

_INCR_LSH_ORACLE = f"""
WITH planted AS ({_PLANTED_SQL}),
sh AS ({_SHINGLE_SQL}),
seeds(h, a, b) AS (VALUES {_SEED_VALUES}),
sh2 AS (
    SELECT doc_id, shingle,
           CAST(('0x' || substr(md5(shingle), 1, 15))::UBIGINT
                % {_MH_MOD} AS BIGINT) AS hsh
    FROM sh
),
sig AS (
    SELECT doc_id, h, min((a * hsh + b) % {_MH_P}) AS mh
    FROM sh2 CROSS JOIN seeds
    GROUP BY doc_id, h
),
band AS (
    SELECT doc_id, h // {MINHASH_K // LSH_BANDS} AS band_id,
           string_agg(mh::VARCHAR, '|' ORDER BY h) AS band_key
    FROM sig GROUP BY doc_id, band_id
),
cand AS (
    SELECT DISTINCT h.doc_id AS hist_doc, b.doc_id AS batch_doc
    FROM band h JOIN band b
      ON h.band_id = b.band_id AND h.band_key = b.band_key
    WHERE h.doc_id < {_INCR_SPLIT} AND b.doc_id >= {_INCR_SPLIT}
),
counts AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
common AS (
    SELECT c.hist_doc, c.batch_doc, count(*) AS n_common
    FROM cand c
    JOIN sh a ON a.doc_id = c.hist_doc
    JOIN sh b ON b.doc_id = c.batch_doc AND b.shingle = a.shingle
    GROUP BY c.hist_doc, c.batch_doc
)
SELECT common.hist_doc AS hist_doc, common.batch_doc AS batch_doc,
       round(CAST(n_common AS DOUBLE) / (ca.n_sh + cb.n_sh - n_common), 6)
           AS jaccard
FROM common
JOIN counts ca ON ca.doc_id = common.hist_doc
JOIN counts cb ON cb.doc_id = common.batch_doc
"""


def _lsh_doc_agg(docs: DataFrame) -> DataFrame:
    """Signatures + verification payload in ONE aggregation (the
    dedup_minhash_lsh formulation): (doc_id, shs, n_sh, mh0..mhK)."""
    sh = docs.select(
        "doc_id",
        F.explode(F.expr(shingles_expr("split(text, ' ')"))).alias("shingle"),
    )
    hid = F.conv(F.substring(F.md5("shingle"), 1, 15), 16, 10).cast("long")
    return (
        sh.withColumn("_hid", hid)
        .withColumn("_hsh", F.col("_hid") % F.lit(_MH_MOD))
        .groupBy("doc_id")
        .agg(
            F.collect_list("_hid").alias("shs"),
            F.count(F.lit(1)).alias("n_sh"),
            *[
                F.min(
                    (F.lit(a) * F.col("_hsh") + F.lit(b)) % F.lit(_MH_P)
                ).alias(f"mh{k}")
                for k, (a, b) in enumerate(_MH_PARAMS)
            ],
        )
    )


def _lsh_bands(doc_agg: DataFrame) -> DataFrame:
    """(doc_id, band_id, band_key) — 8 bands x 2 rows per document.

    band_key is the two 31-bit min-hashes PACKED into one long
    (hi << 31 | lo < 2^62): equality of the packed long is exactly
    equality of the (mh_hi, mh_lo) pair, so the candidate join is
    unchanged, but the band shuffle ships 8 bytes per row instead of a
    ~20-byte "123456789|987654321" string and hashes a long instead of
    a string (the band join is the big shuffle of the 100x curve).
    """
    rows_per_band = MINHASH_K // LSH_BANDS
    assert rows_per_band == 2, "packed band_key assumes 2 rows/band"
    return doc_agg.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).cast("int").alias("band_id"),
                        (
                            F.shiftleft(F.col(f"mh{2 * b}"), 31)
                            + F.col(f"mh{2 * b + 1}")
                        ).alias("band_key"),
                    )
                    for b in range(LSH_BANDS)
                ]
            )
        ).alias("_b"),
    ).select("doc_id", "_b.band_id", "_b.band_key")


@query("sig_index_incremental_lsh", oracle=_INCR_LSH_ORACLE)
def q_sig_index_incremental_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    # by doc_id (not round-robin): the partitioning survives both the
    # split filters and the shingle explode, so the _lsh_doc_agg
    # groupBys can aggregate without an exchange — but ONLY while the
    # repartition count matches spark.sql.shuffle.partitions (both 32
    # in this harness); Catalyst reinstates the exchange when they
    # differ, so treat the no-exchange claim as conditional
    planted = with_planted_dups(_docs(spark, sf_dir)).repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    hist = planted.filter(F.col("doc_id") < _INCR_SPLIT)
    batch = planted.filter(F.col("doc_id") >= _INCR_SPLIT)
    base = tempfile.mkdtemp(prefix="dvs_lshidx_")
    try:
        # ---- index build (once, amortized over every future batch) ----
        hist_agg = _lsh_doc_agg(hist)
        _lsh_bands(hist_agg).write.mode("overwrite").parquet(f"{base}/bands")
        hist_agg.select("doc_id", "shs", "n_sh").write.mode(
            "overwrite"
        ).parquet(f"{base}/docs")

        # ---- ingest: ONLY the batch pays signature cost ----
        batch_agg = track_persist(_lsh_doc_agg(batch))
        idx_bands = spark.read.parquet(f"{base}/bands")
        cand = (
            _lsh_bands(batch_agg)
            .join(
                idx_bands.select(
                    F.col("doc_id").alias("hist_doc"), "band_id", "band_key"
                ),
                ["band_id", "band_key"],
            )
            .select(F.col("doc_id").alias("batch_doc"), "hist_doc")
            .distinct()
        )
        idx_docs = spark.read.parquet(f"{base}/docs").select(
            F.col("doc_id").alias("hist_doc"),
            F.col("shs").alias("shs_h"),
            F.col("n_sh").alias("n_h"),
        )
        bpay = batch_agg.select(
            F.col("doc_id").alias("batch_doc"),
            F.col("shs").alias("shs_b"),
            F.col("n_sh").alias("n_b"),
        )
        n_common = F.size(F.array_intersect(F.col("shs_h"), F.col("shs_b")))
        jaccard = n_common.cast("double") / (
            F.col("n_h") + F.col("n_b") - n_common
        )
        out = (
            cand.join(idx_docs, "hist_doc")
            .join(bpay, "batch_doc")
            .select(
                "hist_doc", "batch_doc", F.round(jaccard, 6).alias("jaccard")
            )
        )
        # detach from the on-disk index without a driver roundtrip
        return detach_result(spark, out)
    finally:
        shutil.rmtree(base, ignore_errors=True)


# --- cross-document exact span dedup ----------------------------------------
# The Lee-et-al-style "Deduplicating Training Data" window pass: every
# K-token window appearing in MORE THAN ONE document is a duplicated
# span; a document's duplication score is the fraction of its tokens
# covered by at least one such window (merged-interval coverage, not
# window count — overlapping windows must not double-count).

_SPAN_K = 8

_SPAN_DEDUP_ORACLE = f"""
WITH planted AS ({_PLANTED_SQL}),
toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM planted),
wins AS (
    SELECT doc_id, i, array_to_string(t[i:i+{_SPAN_K}-1], ' ') AS w
    FROM toks, LATERAL unnest(range(1, len(t) - {_SPAN_K} + 2)) AS r(i)
),
dup_wins AS (
    SELECT w FROM wins GROUP BY w HAVING count(DISTINCT doc_id) > 1
),
marked AS (SELECT doc_id, i FROM wins JOIN dup_wins USING (w)),
cov AS (
    SELECT doc_id, i,
           lag(i) OVER (PARTITION BY doc_id ORDER BY i) AS prev
    FROM marked
),
covered AS (
    SELECT doc_id,
           sum(CASE WHEN prev IS NULL THEN {_SPAN_K}
                    ELSE least({_SPAN_K}, i - prev) END) AS dup_tokens
    FROM cov GROUP BY doc_id
)
SELECT t.doc_id AS doc_id,
       CAST(len(t.t) AS BIGINT) AS n_tokens,
       CAST(coalesce(c.dup_tokens, 0) AS BIGINT) AS dup_tokens,
       round(CAST(coalesce(c.dup_tokens, 0) AS DOUBLE) / len(t.t), 6)
           AS dup_fraction
FROM toks t LEFT JOIN covered c ON t.doc_id = c.doc_id
"""


@query("span_dedup_crossdoc", oracle=_SPAN_DEDUP_ORACLE)
def q_span_dedup_crossdoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document exact K-token span dedup with merged-interval
    token coverage per document.

    Scale shape (the exact-substring analogue of the CMS heavy-hitter
    discipline): duplicated windows are found in TWO phases — an
    8-byte ``xxhash64`` aggregation first (the only corpus-wide
    shuffle moves hashes, not window text), then the window STRINGS of
    the hash-candidate sliver alone are exact-verified, so a hash
    collision can only ADD a candidate that the string phase then
    rejects; the result provably equals direct string grouping. The
    interval merge runs in a window partitioned per document (bounded
    by one doc's windows), never corpus-wide. Windows are
    ``transform(sequence(...))`` + ``slice`` — no Python boundary.
    """
    planted = with_planted_dups(_docs(spark, sf_dir)).repartition(
        "doc_id"
    )
    toks = planted.select("doc_id", F.split("text", " ").alias("t"))
    base = toks.select("doc_id", F.size("t").cast("long").alias("n_tokens"), "t")
    k = _SPAN_K
    # sequence(1, 0) would generate DESCENDING; guard short docs to an
    # empty window list instead
    idx = F.when(
        F.size("t") >= k, F.sequence(F.lit(1), F.size("t") - k + 1)
    ).otherwise(F.array().cast("array<int>"))
    # Phase 1 hashes the token-slice ARRAYS directly (xxhash64 over
    # array<string> hashes the elements) — the window STRINGS are never
    # materialized for the full corpus, only rebuilt for the candidate
    # sliver below. Equivalence: tokens are split on ' ' so they are
    # space-free, making concat_ws(' ', slice) invertible — two windows
    # share a string iff they share the token array — so the array-hash
    # candidate set equals the string-hash candidate set, and phase 2's
    # string verify is unchanged either way. Interleaved A/B at sf0.1:
    # 9.2/5.9/4.7 s -> 4.0/3.2/3.1 s (the corpus-wide shuffle now
    # moves 8-byte hashes instead of K-token strings, and the K-token
    # string build runs only over the sliver).
    winh = base.select(
        "doc_id",
        F.posexplode(
            F.transform(idx, lambda i: F.xxhash64(F.slice("t", i, k)))
        ).alias("pos", "h"),
    ).select("doc_id", (F.col("pos") + 1).alias("i"), "h")
    cand_hashes = (
        winh.groupBy("h")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") > 1)
        .select("h")
    )
    # candidate (doc, position) rows re-join their doc's token array to
    # rebuild the window text: both sides descend from the SAME
    # doc_id-repartitioned scan, so the join is co-partitioned — no new
    # exchange, and the rebuild is sliver-sized, not corpus-sized.
    # F.broadcast pins the semi-probe as a broadcast join: the measured
    # no-new-exchange shape RELIES on it (a shuffled semi-join on h
    # would destroy the doc_id clustering and re-exchange the base
    # join). cand_hashes is the duplicated-window hash sliver — small
    # under the same heavy-hitter assumption the two-phase design
    # already makes; if it ever outgrew the broadcast cap the job fails
    # loudly at the exchange rather than silently re-shuffling.
    # NOTE the deliberate double execution of the base subtree (winh
    # branch + this rebuild join): persisting the (doc_id, t) token
    # arrays would pin the corpus's heaviest column in executor memory
    # to save one re-split of text.
    sliver_idx = winh.join(F.broadcast(cand_hashes), "h", "left_semi")
    sliver = sliver_idx.join(base.select("doc_id", "t"), "doc_id").select(
        "doc_id",
        "i",
        F.concat_ws(" ", F.slice("t", F.col("i"), k)).alias("w"),
    )
    dup_wins = (
        sliver.groupBy("w")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") > 1)
        .select("w")
    )
    marked = sliver.join(dup_wins, "w", "left_semi").select("doc_id", "i")
    from pyspark.sql import Window

    wspec = Window.partitionBy("doc_id").orderBy("i")
    cov = marked.select(
        "doc_id", "i", F.lag("i").over(wspec).alias("prev")
    )
    covered = cov.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("prev").isNull(), F.lit(k)).otherwise(
                F.least(F.lit(k), F.col("i") - F.col("prev"))
            )
        ).alias("dup_tokens")
    )
    return base.join(covered, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.coalesce(F.col("dup_tokens"), F.lit(0)).cast("long").alias(
            "dup_tokens"
        ),
        F.round(
            F.coalesce(F.col("dup_tokens"), F.lit(0)).cast("double")
            / F.col("n_tokens"),
            6,
        ).alias("dup_fraction"),
    )


# --- DSIR-style importance resampling ---------------------------------------
# Data Selection via Importance Resampling (Xie et al.): score every
# raw document by the log-likelihood ratio of a TARGET-domain hashed
# n-gram LM to the RAW-corpus LM, then keep the top of the ranking.
# Features are md5-hashed BIGRAM buckets (B=256) — the hashed-feature
# trick is what makes the estimator corpus-size-independent: both LMs
# are B-bounded count tables no matter how big the corpus is. The
# target domain here is the deterministic lang='en' slice.

_DSIR_B = 256
_DSIR_TOP = 150

_DSIR_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, lang, i AS pos, t[i] || ' ' || t[i+1] AS bg
    FROM (SELECT doc_id, lang, string_split(text, ' ') AS t
          FROM documents),
         LATERAL unnest(range(1, len(t))) AS r(i)
),
feats AS (
    SELECT doc_id, lang, pos,
           ('0x' || substr(md5(bg), 1, 15))::UBIGINT % {_DSIR_B} AS b
    FROM toks
),
tc AS (SELECT b, count(*) AS ct FROM feats WHERE lang = 'en' GROUP BY b),
tt AS (SELECT count(*) AS nt FROM feats WHERE lang = 'en'),
rc AS (SELECT b, count(*) AS cr FROM feats GROUP BY b),
rt AS (SELECT count(*) AS nr FROM feats),
lw AS (
    SELECT rc.b,
           round(ln((coalesce(tc.ct, 0) + 1)::DOUBLE
                    / (tt.nt + {_DSIR_B})), 8)
         - round(ln((rc.cr + 1)::DOUBLE / (rt.nr + {_DSIR_B})), 8) AS w
    FROM rc LEFT JOIN tc USING (b), tt, rt
),
scored AS (
    SELECT f.doc_id,
           CAST(count(*) AS BIGINT) AS n_feats,
           list_reduce(list(lw.w ORDER BY f.pos), (a, b) -> a + b) AS imp
    FROM feats f JOIN lw USING (b)
    GROUP BY f.doc_id
)
SELECT doc_id, n_feats, round(imp, 6) + 0.0 AS importance, CAST(rnk AS INT) AS rnk
FROM (SELECT doc_id, n_feats, imp,
             row_number() OVER (ORDER BY round(imp, 6) DESC, doc_id) AS rnk
      FROM scored) z
WHERE rnk <= {_DSIR_TOP}
"""


@query("sample_dsir_importance", oracle=_DSIR_ORACLE)
def q_sample_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance ranking of raw documents toward a target
    domain.

    Scale shape: both LMs are B-bounded (256-row) count tables — the
    ONLY per-bucket state regardless of corpus size — broadcast back
    over the feature stream; the per-doc score folds in feature-
    position order (cross-engine float discipline), ln is rounded to
    8 digits per side before subtraction (libm vs JVM ulp drift), the
    md5 bucket hash is integer arithmetic identical in both engines,
    and the top-K is TakeOrdered (orderBy+limit), never a global
    single-task window."""
    from pyspark.sql import Window

    # spread: the bigram posexplode + per-bigram md5/conv runs twice
    # (LM build and scoring join) and was serial in the single scan
    # task both times (measured 6.4 s at sf0.1; session.spread_scan)
    docs = spread_scan(_docs(spark, sf_dir), F.col("doc_id"))
    arr = F.split("text", " ")
    bgs = F.when(
        F.size(arr) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(arr) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(arr, i), F.element_at(arr, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    feats = docs.select(
        "doc_id", "lang", F.posexplode(bgs).alias("pos0", "bg")
    ).select(
        "doc_id",
        "lang",
        (F.col("pos0") + 1).alias("pos"),
        (
            F.conv(F.substring(F.md5("bg"), 1, 15), 16, 10).cast("long")
            % _DSIR_B
        ).alias("b"),
    )
    # ONE corpus pass builds BOTH LMs (raw count + conditional target
    # count per bucket); the totals are integer sums of the 256-row
    # table, so they derive from it, not from another corpus scan —
    # 5 passes over the exploded bigram stream reduced to 2 (this one
    # and the scoring join), bit-identical output
    lm = feats.groupBy("b").agg(
        F.count(F.lit(1)).alias("cr"),
        F.count(F.when(F.col("lang") == "en", 1)).alias("ct"),
    )
    totals = lm.agg(
        F.sum("cr").alias("nr"), F.sum("ct").alias("nt")
    )
    lw = (
        lm.crossJoin(F.broadcast(totals))
        .select(
            "b",
            (
                F.round(
                    F.log(
                        (F.col("ct") + 1).cast("double")
                        / (F.col("nt") + _DSIR_B)
                    ),
                    8,
                )
                - F.round(
                    F.log(
                        (F.col("cr") + 1).cast("double")
                        / (F.col("nr") + _DSIR_B)
                    ),
                    8,
                )
            ).alias("w"),
        )
    )
    scored = (
        feats.join(F.broadcast(lw), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "w"))),
                    lambda s: s["w"],
                ),
                F.lit(0.0),
                lambda a, x: a + x,
            ).alias("imp"),
        )
    )
    top = scored.orderBy(
        F.round("imp", 6).desc(), "doc_id"
    ).limit(_DSIR_TOP)
    w = Window.orderBy(F.round("imp", 6).desc(), "doc_id")
    return (
        top.withColumn("rnk", F.row_number().over(w).cast("int"))
        .select(
            "doc_id",
            "n_feats",
            F.round("imp", 6).alias("importance"),
            "rnk",
        )
    )


# --- cluster representative selection ---------------------------------------
# The decision step after clustering: per near-dup component, KEEP the
# best document (longest; ties to the smallest id) and count the
# drops. This is the output an actual dedup run feeds downstream —
# components alone don't say which row survives.

_CLUSTER_REP_ORACLE = f"""
WITH cc AS ({_CC_ORACLE}),
planted AS ({_PLANTED_SQL}),
sized AS (
    SELECT c.component, c.doc_id,
           len(string_split(p.text, ' ')) AS n_tokens
    FROM cc c JOIN planted p ON p.doc_id = c.doc_id
),
ranked AS (
    SELECT component, doc_id, n_tokens,
           row_number() OVER (PARTITION BY component
                              ORDER BY n_tokens DESC, doc_id) AS rn,
           count(*) OVER (PARTITION BY component) AS csize
    FROM sized
)
SELECT component, doc_id AS kept_doc,
       CAST(n_tokens AS BIGINT) AS kept_tokens,
       CAST(csize - 1 AS BIGINT) AS n_dropped
FROM ranked WHERE rn = 1
"""


@query("select_cluster_representatives", oracle=_CLUSTER_REP_ORACLE)
def q_select_cluster_representatives(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per near-dup component: keep the longest document (ties to the
    smallest id), report its size and the drop count. One component-
    partitioned window over the (small) clustered relation — the
    corpus itself never re-shuffles for the selection."""
    from pyspark.sql import Window

    cc = _clustered_components(spark, sf_dir)
    sized = cc.join(
        with_planted_dups(_docs(spark, sf_dir)).select(
            "doc_id", F.size(tokens_col()).alias("n_tokens")
        ),
        "doc_id",
    )
    w = Window.partitionBy("component").orderBy(
        F.col("n_tokens").desc(), "doc_id"
    )
    wc = Window.partitionBy("component")
    return (
        sized.withColumn("rn", F.row_number().over(w))
        .withColumn("csize", F.count(F.lit(1)).over(wc))
        .filter(F.col("rn") == 1)
        .select(
            "component",
            F.col("doc_id").alias("kept_doc"),
            F.col("n_tokens").cast("long").alias("kept_tokens"),
            (F.col("csize") - 1).cast("long").alias("n_dropped"),
        )
    )


# --- star-edge LSH clustering: the O(docs) dedup deliverable -----------------
# The pair-list pipeline above (dedup_minhash_lsh ->
# pair_cluster_components -> select_cluster_representatives) is exact
# but its intermediate edge set is O(dups^2): the measured 100x curve
# corpus produces 46M verified pairs from ~5k replica cliques — the
# pair list explodes even though the OUTPUT (one representative per
# cluster) is O(docs). At 100 TB the dedup deliverable must never
# materialize a clique's quadratic edge set.
#
# Star edges fix the growth: within each LSH band bucket, connect each
# document only to the bucket's MINIMUM doc_id (the hub) — s-1 edges
# per bucket instead of s(s-1)/2 — then verify exactly those edges
# (jaccard >= 0.5, integer-exact: 2*|A∩B| >= |A∪B|) and run connected
# components over the verified stars. Total edges <= |docs| x BANDS
# regardless of duplication depth; verification cost, CC input, and
# output are all O(docs). Semantics note vs the all-pairs clustering:
# connectivity is through band hubs only, so a pair that verifies
# while BOTH its hub edges fail is not joined — for near-dup cliques
# (the case that explodes) hub and member share every band, and the
# components coincide; the gated oracle encodes exactly the star
# semantics so the check is exact, not approximate.

_STAR_REP_ORACLE = f"""
WITH RECURSIVE
planted AS ({_PLANTED_SQL}),
sh AS ({_SHINGLE_SQL}),
seeds(h, a, b) AS (VALUES {_SEED_VALUES}),
sh2 AS (
    SELECT doc_id, shingle,
           CAST(('0x' || substr(md5(shingle), 1, 15))::UBIGINT
                % {_MH_MOD} AS BIGINT) AS hsh
    FROM sh
),
sig AS (
    SELECT doc_id, h, min((a * hsh + b) % {_MH_P}) AS mh
    FROM sh2 CROSS JOIN seeds
    GROUP BY doc_id, h
),
band AS (
    SELECT doc_id, h // {MINHASH_K // LSH_BANDS} AS band_id,
           string_agg(mh::VARCHAR, '|' ORDER BY h) AS band_key
    FROM sig GROUP BY doc_id, band_id
),
hub AS (
    SELECT band_id, band_key, min(doc_id) AS hub
    FROM band GROUP BY band_id, band_key
),
edges AS (
    SELECT DISTINCT h.hub AS doc_a, b.doc_id AS doc_b
    FROM band b JOIN hub h
      ON h.band_id = b.band_id AND h.band_key = b.band_key
    WHERE b.doc_id > h.hub
),
counts AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
common AS (
    SELECT e.doc_a, e.doc_b, count(*) AS n_common
    FROM edges e
    JOIN sh a ON a.doc_id = e.doc_a
    JOIN sh b ON b.doc_id = e.doc_b AND b.shingle = a.shingle
    GROUP BY e.doc_a, e.doc_b
),
pairs AS (
    SELECT c.doc_a, c.doc_b
    FROM common c
    JOIN counts ca ON ca.doc_id = c.doc_a
    JOIN counts cb ON cb.doc_id = c.doc_b
    WHERE 2 * n_common >= ca.n_sh + cb.n_sh - n_common
),
sym AS (
    SELECT doc_a AS a, doc_b AS b FROM pairs
    UNION ALL
    SELECT doc_b AS a, doc_a AS b FROM pairs
),
reach(node, lab) AS (
    SELECT a, a FROM sym
    UNION
    SELECT s.b, r.lab FROM reach r JOIN sym s ON s.a = r.node
),
cc AS (SELECT node AS doc_id, min(lab) AS component FROM reach GROUP BY node),
sized AS (
    SELECT c.component, c.doc_id,
           len(string_split(p.text, ' ')) AS n_tokens
    FROM cc c JOIN planted p ON p.doc_id = c.doc_id
),
ranked AS (
    SELECT component, doc_id, n_tokens,
           row_number() OVER (PARTITION BY component
                              ORDER BY n_tokens DESC, doc_id) AS rn,
           count(*) OVER (PARTITION BY component) AS csize
    FROM sized
)
SELECT CAST(component AS BIGINT) AS component, doc_id AS kept_doc,
       CAST(n_tokens AS BIGINT) AS kept_tokens,
       CAST(csize - 1 AS BIGINT) AS n_dropped
FROM ranked WHERE rn = 1
"""


@query(
    "dedup_star_representatives",
    oracle=_STAR_REP_ORACLE,
    aliases=("star_lsh_representatives",),
)
def q_dedup_star_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH -> star edges -> verified CC -> representatives, end to end
    with every intermediate O(docs): THE DOCUMENTED DEFAULT CLUSTERING
    PATH for corpus near-dup dedup at scale. The pair path
    (pair_cluster_components / select_cluster_representatives) stays
    available for workloads that need the explicit verified-pair
    relation, but its pair list is output-proportional (quadratic in
    duplication depth) and it self-warns past ~8 pairs/doc — this
    query is the bounded-state answer, the corpus-dedup application of
    the reference's bounded-memory dedup philosophy
    (ShortTermDuplicateMemory.java:108-178: fixed slot array, never a
    growing pair set). Measured 100x point: 30.6 s where the pair path
    needs ~93 s (BASELINE.md).

    Star edges: per (band_id, band_key) bucket, (hub=min doc_id) ->
    member. The hub aggregation is map-side-combined (one row per
    bucket), the edge join is the same band-key equi-join the pair
    path uses, and the verify stage intersects shingle-hash arrays on
    <= |docs| x BANDS distinct edges. The jaccard >= 0.5 gate is the
    integer form 2*|A∩B| >= |A|+|B|-|A∩B| — no float crosses the
    engines."""
    from pyspark.sql import Window

    from divolte_collector_spark.operators.graph import connected_components

    planted = spread_scan(
        with_planted_dups(_docs(spark, sf_dir)), F.col("doc_id")
    )  # adaptive hash spread, not round-robin (see jaccard)
    doc_agg = track_persist(_lsh_doc_agg(planted))
    band = _lsh_bands(doc_agg)
    hub = band.groupBy("band_id", "band_key").agg(
        F.min("doc_id").alias("hub")
    )
    edges = (
        band.join(hub, ["band_id", "band_key"])
        .filter(F.col("doc_id") > F.col("hub"))
        .select(F.col("hub").alias("doc_a"), F.col("doc_id").alias("doc_b"))
        .distinct()
    )
    doc_side = doc_agg
    if _lsh_verify_heavy(spark, sf_dir):
        # same handoff as the pair verifiers: stream the edge relation
        # through a hash build of the O(docs) array side instead of
        # sort-merging wide rows (see _LSH_SHJ_DOC_THRESHOLD)
        doc_side = doc_side.hint("shuffle_hash")
    a = doc_side.select(
        F.col("doc_id").alias("doc_a"),
        F.col("shs").alias("shs_a"),
        F.col("n_sh").alias("n_a"),
    )
    b = doc_side.select(
        F.col("doc_id").alias("doc_b"),
        F.col("shs").alias("shs_b"),
        F.col("n_sh").alias("n_b"),
    )
    n_common = F.size(
        F.array_intersect(F.col("shs_a"), F.col("shs_b"))
    ).cast("long")
    verified = (
        edges.join(a, "doc_a")
        .join(b, "doc_b")
        .select("doc_a", "doc_b", n_common.alias("n_common"), "n_a", "n_b")
        .filter(
            2 * F.col("n_common")
            >= F.col("n_a") + F.col("n_b") - F.col("n_common")
        )
        .select("doc_a", "doc_b")
    )
    # CC runs one action per label-propagation round; without this
    # persist every round re-executes the band join + verify stage
    # off the doc_agg cache (measured: the 100x point ran >9 min;
    # with the edge list pinned it is the CC rounds alone)
    verified = track_persist(verified)
    cc = connected_components(verified, src="doc_a", dst="doc_b").select(
        F.col("node").cast("long").alias("doc_id"),
        F.col("component").cast("long").alias("component"),
    )
    sized = cc.join(
        planted.select("doc_id", F.size(tokens_col()).alias("n_tokens")),
        "doc_id",
    )
    w = Window.partitionBy("component").orderBy(
        F.col("n_tokens").desc(), "doc_id"
    )
    wc = Window.partitionBy("component")
    return (
        sized.withColumn("rn", F.row_number().over(w))
        .withColumn("csize", F.count(F.lit(1)).over(wc))
        .filter(F.col("rn") == 1)
        .select(
            "component",
            F.col("doc_id").alias("kept_doc"),
            F.col("n_tokens").cast("long").alias("kept_tokens"),
            (F.col("csize") - 1).cast("long").alias("n_dropped"),
        )
    )


# --- corpus-wide exact line dedup (C4 / RefinedWeb style) --------------------
# The other exact-dedup granularity production corpora need: not whole
# documents (dedup_exact) and not K-token windows (span_dedup_crossdoc)
# but *lines* — boilerplate sentences repeated across pages are removed
# corpus-wide, keeping only the FIRST occurrence (by doc_id, then
# position), and every document is reassembled from its surviving
# lines. C4 dropped any line seen more than once across the crawl;
# this is that operator with keep-first semantics.
#
# The synthetic corpus has no newline structure, so the segmentation
# is pluggable and here fixed at 10-word windows; with real text you
# substitute split-on-newline for the segmenter and the rest of the
# plan is unchanged.
#
# 100 TB shape — the trick is that NO join-back is needed: after
# grouping lines by text, min(struct(doc_id, line_no)) per line IS the
# surviving occurrence, so the keeper relation alone reconstructs the
# deduped corpus. Two aggregation shuffles total (line -> keeper,
# doc_id -> reassembly), both with map-side partial aggregation, so a
# line duplicated a billion times collapses to one row per map
# partition before the exchange — no skewed window, no all-pairs, and
# the corpus text crosses the wire once per distinct line.

_LINE_W = 10

#: shared segmentation CTEs (words -> fixed 10-word lines), used by
#: the full-corpus and the incremental line-dedup oracles
_LINE_SEG_SQL = f"""words AS (
    SELECT doc_id, string_split(text, ' ') AS ws FROM documents
),
lines AS (
    SELECT doc_id, CAST(u.line_no AS INT) AS line_no, u.line
    FROM (
        SELECT doc_id,
               unnest(list_transform(
                   range(0, CAST(ceil(len(ws) / {_LINE_W}.0) AS BIGINT)),
                   i -> {{'line_no': i,
                          'line': array_to_string(
                              ws[i * {_LINE_W} + 1 : i * {_LINE_W} + {_LINE_W}],
                              ' ')}})) AS u
        FROM words)
)"""

_LINE_DEDUP_ORACLE = f"""
WITH {_LINE_SEG_SQL},
kept AS (
    SELECT doc_id, line_no, line
    FROM lines
    QUALIFY row_number() OVER (
        PARTITION BY line ORDER BY doc_id, line_no) = 1
),
reassembled AS (
    SELECT doc_id,
           string_agg(line, ' ' ORDER BY line_no) AS text_deduped,
           CAST(count(*) AS BIGINT) AS n_kept
    FROM kept GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(r.text_deduped, '') AS text_deduped,
       coalesce(r.n_kept, CAST(0 AS BIGINT)) AS n_kept
FROM documents d LEFT JOIN reassembled r USING (doc_id)
"""


def segment_lines(docs: DataFrame, line_words: int = _LINE_W) -> DataFrame:
    """(doc_id, line_no, line): fixed ``line_words``-word segmentation
    of each document — the pluggable segmenter for line-level dedup
    (swap for split-on-newline with real text). Narrow map + explode;
    partitions follow the scan."""
    ws = F.split(F.col("text"), " ")
    n_lines = F.ceil(F.size("ws") / F.lit(float(line_words))).cast("int")
    return (
        docs.select("doc_id", ws.alias("ws"))
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), n_lines - 1),
                    lambda i: F.struct(
                        i.cast("int").alias("line_no"),
                        F.array_join(
                            F.slice(
                                F.col("ws"),
                                i * line_words + 1,
                                F.lit(line_words),
                            ),
                            " ",
                        ).alias("line"),
                    ),
                )
            ).alias("l"),
        )
        .select("doc_id", "l.line_no", "l.line")
    )


@query("text_line_dedup", oracle=_LINE_DEDUP_ORACLE)
def q_text_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    lines = segment_lines(docs)
    # min(struct) per distinct line == the keep-first occurrence; the
    # keeper relation alone IS the deduped corpus (no join-back).
    kept = (
        lines.groupBy("line")
        .agg(F.min(F.struct("doc_id", "line_no")).alias("k"))
        .select(F.col("k.doc_id").alias("doc_id"), F.col("k.line_no").alias("line_no"), "line")
    )
    reassembled = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("line_no", "line"))),
                lambda s: s.getField("line"),
            ),
            " ",
        ).alias("text_deduped"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    return docs.select("doc_id").join(reassembled, "doc_id", "left").select(
        "doc_id",
        F.coalesce("text_deduped", F.lit("")).alias("text_deduped"),
        F.coalesce("n_kept", F.lit(0).cast("long")).alias("n_kept"),
    )


# --- BPE apply / encode (the inference half of tokenizer_bpe_merge) ---------
# tokenizer_bpe_merge demonstrates LEARNING merges (pair count -> argmax
# -> merge, iterated); this is the other half a pipeline tokenizing
# 100 TB actually runs: ENCODE every document with a fixed, rank-
# ordered merge list (the merges.txt artifact of BPE training).
#
# Applying one merge (x, y) -> xy is a global left-to-right
# non-overlapping replace over the symbol sequence — exactly what
# replace() implements in both engines — with each symbol wrapped in a
# marker pair so a merge can never match across symbol boundaries
# (pattern "␟x␟␟y␟" only matches symbol x followed by symbol y; the
# tail of a longer symbol like "bx" is "x␟" with no opening marker).
# "a a a a" under merge (a,a) becomes "(aa) (aa)" — BPE's scan order.
#
# 100 TB shape: encoding is per word TYPE, not per occurrence — one
# vocabulary aggregation shuffle (map-side combined), then the merge
# chain is a narrow map over the tiny distinct-word relation. The
# corpus itself is never rewritten until a final broadcast-join of the
# (word -> encoding) table back onto tokens, which this query leaves
# to the consumer. The merge list is driver-held config, like k-means
# centroids.

_BPE_MARK2 = "␟"  # SYMBOL FOR UNIT SEPARATOR; never in corpus text
_BPE_MERGES = [
    ("t", "h"), ("th", "e"), ("a", "t"), ("e", "r"),
    ("i", "n"), ("o", "r"), ("d", "a"), ("da", "ta"),
]


def _bpe_apply_sql_chain() -> str:
    """Nested DuckDB replace() calls applying _BPE_MERGES in rank order."""
    m = _BPE_MARK2
    expr = f"regexp_replace(word, '(.)', '{m}\\1{m}', 'g')"
    for x, y in _BPE_MERGES:
        expr = f"replace({expr}, '{m}{x}{m}{m}{y}{m}', '{m}{x}{y}{m}')"
    return expr


_BPE_APPLY_ORACLE = f"""
WITH vocab AS (
    SELECT w AS word, CAST(count(*) AS BIGINT) AS n_occurrences
    FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
    GROUP BY w
),
enc AS (
    SELECT word, n_occurrences, {_bpe_apply_sql_chain()} AS s FROM vocab
)
SELECT word, n_occurrences,
       trim(replace(s, '{_BPE_MARK2}{_BPE_MARK2}', ' '), '{_BPE_MARK2}')
           AS encoded,
       CAST((length(s) - length(replace(s, '{_BPE_MARK2}', ''))) / 2 AS INT)
           AS n_symbols
FROM enc
"""


def bpe_encode_expr(word, merges=None):
    """Column: ``word`` encoded by the rank-ordered ``merges`` list,
    as a marker-wrapped symbol string (see module comment). Pure JVM
    string expressions — codegen'd, no Python in the hot path."""
    m = _BPE_MARK2
    merges = _BPE_MERGES if merges is None else merges
    enc = F.regexp_replace(word, "(.)", f"{m}$1{m}")
    for x, y in merges:
        enc = F.replace(enc, F.lit(f"{m}{x}{m}{m}{y}{m}"), F.lit(f"{m}{x}{y}{m}"))
    return enc


@query("tokenizer_bpe_apply", oracle=_BPE_APPLY_ORACLE)
def q_tokenizer_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = _BPE_MARK2
    vocab = (
        _docs(spark, sf_dir)
        .select(F.explode(F.split(F.col("text"), " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    enc = bpe_encode_expr(F.col("word"))
    return vocab.select(
        "word",
        "n_occurrences",
        F.btrim(F.replace(enc, F.lit(m + m), F.lit(" ")), F.lit(m)).alias(
            "encoded"
        ),
        (
            (F.length(enc) - F.length(F.replace(enc, F.lit(m), F.lit(""))))
            / 2
        ).cast("int").alias("n_symbols"),
    )


# --- hashed-linear quality classifier (fastText-style gate) ------------------
# CCNet/fastText-style quality gating scores a document with a linear
# model over hashed bag-of-token features. The model here is a fixed
# 16-bucket weight table (the trained artifact is driver-held config,
# like the BPE merge list); the feature hash is deliberately trivial
# ((31 * len + first-codepoint) mod 16) so both engines compute it as
# plain column arithmetic.
#
# The score stays in EXACT integer space end to end: weights are
# integer milli-units, the per-document sum is integer, and the
# threshold gate total/(1000*n) > 0.02 is compared as total > 20*n —
# both sides BIGINT, so there is no float rounding ANYWHERE (a rounded
# double score can land on an exact half at the last kept digit, where
# engines' round() legitimately disagree — observed at sf0.1:
# -5035/80000 = -0.0629375). Fully narrow (F.aggregate over the token
# array: no explode, no shuffle, no Python); at 100 TB this is a pure
# map over the scan, the cheapest possible corpus gate.

_QL_WEIGHTS = [
    320, -145, 210, 55, -400, 130, -75, 260,
    -190, 85, 305, -220, 160, -35, 115, -280,
]
#: keep iff mean milli-weight per token > _QL_THRESHOLD_MILLI / 1000
#: (i.e. weight_sum_milli > 20 * n_tokens, exact integer compare)
_QL_THRESHOLD_MILLI = 20

_QUALITY_LINEAR_ORACLE = f"""
WITH scored AS (
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           list_reduce(
               list_transform(string_split(text, ' '),
                   t -> CAST(([{', '.join(str(w) for w in _QL_WEIGHTS)}])[
                       (length(t) * 31 + ascii(t)) % 16 + 1] AS BIGINT)),
               (a, b) -> a + b) AS weight_sum_milli
    FROM documents
)
SELECT doc_id, n_tokens, weight_sum_milli,
       weight_sum_milli > {_QL_THRESHOLD_MILLI} * n_tokens AS keep
FROM scored
"""


@query("text_quality_linear", oracle=_QUALITY_LINEAR_ORACLE)
def q_text_quality_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    weights = F.array(*[F.lit(w) for w in _QL_WEIGHTS])
    toks = F.split(F.col("text"), " ")
    total = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: acc
        + F.element_at(weights, (F.length(t) * 31 + F.ascii(t)) % 16 + 1)
        .cast("long"),
    )
    scored = _docs(spark, sf_dir).select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        total.alias("weight_sum_milli"),
    )
    return scored.select(
        "*",
        (
            F.col("weight_sum_milli")
            > _QL_THRESHOLD_MILLI * F.col("n_tokens")
        ).alias("keep"),
    )


# --- snapshot diff (corpus curation: what changed between crawls) ------------
# Dataset curation compares two corpus snapshots and reports what was
# ADDED, REMOVED, or CHANGED — the audit artifact behind every
# training-set version bump (and the input to incremental dedup /
# re-embedding, which only need the delta). The "new" snapshot is
# synthesized deterministically from the base so the oracle predicts
# the diff from raw columns: every 7th doc removed, every 5th
# (surviving) doc's text mutated, every 10th≡3 doc re-added under a
# shifted id.
#
# 100 TB shape: one full outer join on doc_id (both sides partition on
# the key; with snapshots stored bucketed-by-doc_id it is shuffle-free
# sort-merge). Equality is compared on md5(text) — 16 bytes per row
# through the join instead of the document body — and both engines
# compute identical md5 hex, so the gate stays exact. Unchanged docs
# (the overwhelming bulk) are filtered before the projection.

_SNAPSHOT_OFFSET = 2_000_000

_SNAPSHOT_DIFF_ORACLE = f"""
WITH new AS (
    SELECT doc_id,
           CASE WHEN doc_id % 5 = 0 THEN text || ' rev2' ELSE text END
               AS text
    FROM documents WHERE doc_id % 7 <> 0
    UNION ALL
    SELECT doc_id + {_SNAPSHOT_OFFSET} AS doc_id, text
    FROM documents WHERE doc_id % 10 = 3
),
old AS (SELECT doc_id, text FROM documents),
j AS (
    SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
           o.text AS old_text, n.text AS new_text
    FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
)
SELECT doc_id,
       CASE WHEN old_text IS NULL THEN 'added'
            WHEN new_text IS NULL THEN 'removed'
            ELSE 'changed' END AS status,
       CAST(length(old_text) AS BIGINT) AS old_n_chars,
       CAST(length(new_text) AS BIGINT) AS new_n_chars
FROM j
WHERE old_text IS NULL OR new_text IS NULL
   OR md5(old_text) <> md5(new_text)
"""


@query("snapshot_diff_docs", oracle=_SNAPSHOT_DIFF_ORACLE)
def q_snapshot_diff_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    old = docs.select("doc_id", "text")
    surviving = docs.filter(F.col("doc_id") % 7 != 0).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit(" rev2"))
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    readded = docs.filter(F.col("doc_id") % 10 == 3).select(
        (F.col("doc_id") + _SNAPSHOT_OFFSET).alias("doc_id"), "text"
    )
    new = surviving.unionByName(readded)
    o = old.select(
        F.col("doc_id"),
        F.md5("text").alias("old_md5"),
        F.length("text").cast("long").alias("old_n_chars"),
    )
    n = new.select(
        F.col("doc_id").alias("n_doc_id"),
        F.md5("text").alias("new_md5"),
        F.length("text").cast("long").alias("new_n_chars"),
    )
    j = o.join(n, o["doc_id"] == n["n_doc_id"], "full_outer")
    return (
        j.filter(
            F.col("old_md5").isNull()
            | F.col("new_md5").isNull()
            | (F.col("old_md5") != F.col("new_md5"))
        )
        .select(
            F.coalesce("doc_id", "n_doc_id").alias("doc_id"),
            F.when(F.col("old_md5").isNull(), "added")
            .when(F.col("new_md5").isNull(), "removed")
            .otherwise("changed")
            .alias("status"),
            "old_n_chars",
            "new_n_chars",
        )
    )


# --- incremental line dedup (daily batch vs persisted line index) ------------
# The ingest-shaped variant of text_line_dedup, mirroring
# dedup_incremental: the historical corpus's distinct-line registry is
# an immutable persisted index; each incoming batch drops (a) lines
# already registered by history and (b) later copies within the batch
# itself, then reassembles its cleaned documents. Per-ingest cost is
# O(batch lines) — the history is never re-segmented, which is the
# point at 100 TB (the index is a bucketed-by-line-hash table, so the
# anti-join co-locates without reshuffling history).
#
# Plan note: the anti-join leaves the batch partitioned BY LINE, so
# the intra-batch keeper aggregation that follows is shuffle-free —
# three exchanges total (history distinct, batch anti-join side, doc
# reassembly).

_LINE_INCR_SPLIT = 400  # doc_id < 400 -> history, rest -> batch

_LINE_INCR_ORACLE = f"""
WITH {_LINE_SEG_SQL},
hist AS (
    SELECT DISTINCT line FROM lines WHERE doc_id < {_LINE_INCR_SPLIT}
),
fresh AS (
    SELECT b.doc_id, b.line_no, b.line
    FROM lines b
    WHERE b.doc_id >= {_LINE_INCR_SPLIT}
      AND NOT EXISTS (SELECT 1 FROM hist x WHERE x.line = b.line)
),
kept AS (
    SELECT doc_id, line_no, line FROM fresh
    QUALIFY row_number() OVER (
        PARTITION BY line ORDER BY doc_id, line_no) = 1
),
reassembled AS (
    SELECT doc_id,
           string_agg(line, ' ' ORDER BY line_no) AS text_deduped,
           CAST(count(*) AS BIGINT) AS n_kept
    FROM kept GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(r.text_deduped, '') AS text_deduped,
       coalesce(r.n_kept, CAST(0 AS BIGINT)) AS n_kept
FROM (SELECT doc_id FROM documents WHERE doc_id >= {_LINE_INCR_SPLIT}) d
LEFT JOIN reassembled r USING (doc_id)
"""


@query("text_line_dedup_incremental", oracle=_LINE_INCR_ORACLE)
def q_text_line_dedup_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = _docs(spark, sf_dir)
    lines = segment_lines(docs)
    hist = (
        lines.filter(F.col("doc_id") < _LINE_INCR_SPLIT)
        .select("line")
        .distinct()
    )
    batch = lines.filter(F.col("doc_id") >= _LINE_INCR_SPLIT)
    fresh = batch.join(hist, "line", "left_anti")
    kept = (
        fresh.groupBy("line")
        .agg(F.min(F.struct("doc_id", "line_no")).alias("k"))
        .select(
            F.col("k.doc_id").alias("doc_id"),
            F.col("k.line_no").alias("line_no"),
            "line",
        )
    )
    reassembled = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("line_no", "line"))),
                lambda s: s.getField("line"),
            ),
            " ",
        ).alias("text_deduped"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    return (
        docs.filter(F.col("doc_id") >= _LINE_INCR_SPLIT)
        .select("doc_id")
        .join(reassembled, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("text_deduped", F.lit("")).alias("text_deduped"),
            F.coalesce("n_kept", F.lit(0).cast("long")).alias("n_kept"),
        )
    )


# --- two-stage retrieval: sparse recall -> candidate-bounded rerank ----------
# The retrieval shape RAG/training-data pipelines deploy at scale:
# stage 1 is a cheap sparse scorer over the WHOLE corpus (here: summed
# query-term frequency — exact integers), keeping only the top-N
# candidates per query; stage 2 re-scores ONLY those Q*N candidate
# pairs with the expensive pair-wise model and keeps the top-k. The
# 100 TB property this gates is the cost cliff between the stages: the
# corpus-wide pass is one explode+filter+agg with the term filter
# pushed into the explode output, while the expensive stage touches a
# constant Q*N rows — the candidate join back to the document payload
# broadcasts the candidate list into the scan, so the corpus is read,
# not shuffled, for stage 2.
#
# The cross-encoder forward pass is a STUB (same policy as
# operators/multimodal.py: no model runtime ships in this container):
# the pair score is the md5 of the (query text, document text) pair —
# deterministic, computed JVM-side, byte-identical in DuckDB — so the
# ranking is arbitrary-but-exact and the gate pins the PLUMBING (pair
# construction, candidate bounding, per-query top-k) rather than model
# quality. Swapping the md5 column for a Pandas-UDF model call is the
# production change and touches nothing else.

_RERANK_QUERIES = (
    (1, "spark join table"),
    (2, "hash group window"),
    (3, "stream batch data"),
    (4, "sort merge query"),
)
_RERANK_N1 = 25  # stage-1 candidates per query
_RERANK_K2 = 10  # reranked results per query

_RERANK_ALL_TERMS = tuple(
    sorted({t for _, q in _RERANK_QUERIES for t in q.split()})
)


def _sql_str(s: str) -> str:
    """A safe SQL string literal (apostrophes doubled) — tuple-repr /
    f-string interpolation breaks on one-element tuples and quoted
    query text."""
    return "'" + s.replace("'", "''") + "'"


_RERANK_TERMS_IN = "(" + ", ".join(_sql_str(t) for t in _RERANK_ALL_TERMS) + ")"

_RERANK_ORACLE = f"""
WITH qt AS (
    SELECT * FROM (VALUES {", ".join(f"({i}, {_sql_str(q)})" for i, q in _RERANK_QUERIES)})
        AS v(query_id, qtext)
),
terms AS (
    SELECT query_id, unnest(string_split(qtext, ' ')) AS term FROM qt
),
toks AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (
    SELECT doc_id, term, count(*) AS c FROM toks
    WHERE term IN {_RERANK_TERMS_IN}
    GROUP BY doc_id, term
),
s1 AS (
    SELECT t.query_id, f.doc_id, sum(f.c) AS stage1_score
    FROM tf f JOIN terms t USING (term)
    GROUP BY t.query_id, f.doc_id
),
cand AS (
    SELECT query_id, doc_id, stage1_score FROM (
        SELECT s1.*, row_number() OVER (
            PARTITION BY query_id
            ORDER BY stage1_score DESC, doc_id) AS rn
        FROM s1) x
    WHERE rn <= {_RERANK_N1}
),
rr AS (
    SELECT c.query_id, c.doc_id, c.stage1_score,
           substr(md5(q.qtext || '|' || d.text), 1, 16) AS rerank_score
    FROM cand c JOIN documents d USING (doc_id) JOIN qt q USING (query_id)
)
SELECT query_id, doc_id, CAST(stage1_score AS BIGINT) AS stage1_score,
       rerank_score,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY rerank_score DESC, doc_id) AS INT)
           AS rrnk
FROM rr
QUALIFY rrnk <= {_RERANK_K2}
"""


@query("text_rerank_stage", oracle=_RERANK_ORACLE)
def q_text_rerank_stage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    qt = spark.createDataFrame(
        list(_RERANK_QUERIES), "query_id int, qtext string"
    )
    terms = spark.createDataFrame(
        [(i, t) for i, q in _RERANK_QUERIES for t in q.split()],
        "query_id int, term string",
    )
    # spread: the token explode + term filter are map-side and
    # otherwise run in the single scan task (session.spread_scan)
    docs = spread_scan(_docs(spark, sf_dir), F.col("doc_id"))
    tf = (
        docs.select("doc_id", F.explode(tokens_col()).alias("term"))
        .filter(F.col("term").isin(list(_RERANK_ALL_TERMS)))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    s1 = (
        tf.join(F.broadcast(terms), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.sum("c").alias("stage1_score"))
    )
    w1 = Window.partitionBy("query_id").orderBy(
        F.col("stage1_score").desc(), "doc_id"
    )
    cand = (
        s1.withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") <= _RERANK_N1)
        .select("query_id", "doc_id", "stage1_score")
    )
    # stage 2: candidates broadcast INTO the payload scan (the corpus
    # is read with the doc_id filter semi-joined, never shuffled), the
    # 4-row query table broadcast on top, pair scored JVM-side
    rr = (
        docs.select("doc_id", "text")
        .join(F.broadcast(cand), "doc_id")
        .join(F.broadcast(qt), "query_id")
        .withColumn(
            "rerank_score",
            F.substring(
                F.md5(F.concat_ws("|", F.col("qtext"), F.col("text"))), 1, 16
            ),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("rerank_score").desc(), "doc_id"
    )
    return (
        rr.withColumn("rrnk", F.row_number().over(w2).cast("int"))
        .filter(F.col("rrnk") <= _RERANK_K2)
        .select(
            "query_id", "doc_id", "stage1_score", "rerank_score", "rrnk"
        )
    )


# --- probability-proportional-to-size systematic sampling --------------------
# The weighted sampling member the sampling family lacks: classic PPS
# systematic sampling (survey-sampling textbook method; the
# deterministic counterpart of weighted reservoir sampling). Documents
# are laid out on the cumulative-weight axis [0, total) in doc_id
# order; the K sample positions are the systematic grid
# p_j = floor(j * total / K), and each position selects the document
# whose weight interval contains it — inclusion probability
# proportional to weight, EXACT in integer space end to end (weights
# are n_chars, positions are integer division), so the gate needs no
# float discipline at all.
#
# Scale shape: the cumulative axis comes from the two-phase
# global_cumsum scan (one partitioned agg + one partitioned window —
# never a single-task global ORDER BY), the one-row corpus total and
# the K=20 grid positions broadcast, and the interval-containment join
# is a 20-row broadcast nested loop (the documented tiny-broadcast
# shape). Zero-weight documents own an empty interval and are
# correctly never sampled.

_PPS_K = 20


_PPS_ORACLE = f"""
WITH d AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS w FROM documents),
c AS (SELECT doc_id, w, sum(w) OVER (ORDER BY doc_id) AS cum_hi FROM d),
t AS (SELECT sum(w) AS total FROM d),
j AS (SELECT unnest(range(0, {_PPS_K})) AS j),
p AS (
    SELECT CAST(j.j AS INT) AS sample_idx,
           CAST(j.j * t.total // {_PPS_K} AS BIGINT) AS pos
    FROM j CROSS JOIN t
)
SELECT p.sample_idx, p.pos, c.doc_id, c.w AS weight
FROM p JOIN c ON p.pos >= c.cum_hi - c.w AND p.pos < c.cum_hi
"""


@query("sample_pps_systematic", oracle=_PPS_ORACLE)
def q_sample_pps_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from divolte_collector_spark.operators.prefixsum import (
        global_cumsum_with_total,
    )

    d = _docs(spark, sf_dir).select(
        "doc_id", F.col("n_chars").cast("long").alias("w")
    )
    from divolte_collector_spark.plans import bounded_local_relation

    # the prefix scan's driver-side bucket loop already computes the
    # grand total — building the grid from it as literals deletes the
    # second corpus scan + one-partition agg an F.sum formulation pays.
    # The grid feeds a range (non-equi) broadcast join, so it is built
    # through bounded_local_relation: the loop-join guard accepts the
    # BNLJ side on the REGISTERED row count, not on trusting RDD scans.
    cum, total = global_cumsum_with_total(d, "doc_id", "w")
    grid = bounded_local_relation(
        spark,
        [(j, j * int(total) // _PPS_K) for j in range(_PPS_K)],
        "sample_idx int, pos long",
    )
    return (
        cum.join(
            F.broadcast(grid),
            (F.col("pos") >= F.col("cumsum") - F.col("w"))
            & (F.col("pos") < F.col("cumsum")),
        )
        .select("sample_idx", "pos", "doc_id", F.col("w").alias("weight"))
    )
