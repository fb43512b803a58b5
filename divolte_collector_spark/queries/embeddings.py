"""Similarity search over the ``embeddings`` table (array<float> column).

- brute-force cosine top-k (the baseline — exact, one broadcast join);
- bucketed ("IVF-style") search restricted to a coarse partition;
- near-duplicate pairs above a cosine threshold.

All vector math happens JVM-side (``zip_with`` + ``aggregate`` over
DOUBLE), no Python UDFs.  At 100 TB the query side is broadcast and
the candidate side streams — the brute-force variant is linear per
query; the bucketed variant prunes candidates by partition key first
(the scale path; with a trained coarse quantizer the bucket id would be
the nearest-centroid id — here the driver data's ``label`` column
stands in as the partition assignment).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from divolte_collector_spark.queries import query
from divolte_collector_spark.queries._persist import detach_result
from divolte_collector_spark.session import load_table, track_persist

N_QUERY_VECTORS = 20
TOP_K = 5


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings")

def _emb_s(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``_emb`` behind the adaptive spread (session.spread_scan): the
    heavy interpreted vector math (norms, dots, PQ sub-distances, LSH
    plane projections) otherwise runs in the ONE task the single-file
    test scan produces. Used by the per-vector-heavy queries only; the
    tiny-probe queries (knn/ivf bucketed, rrf) measured a net loss
    from the extra exchange on their broadcast-build side and keep the
    raw scan."""
    from divolte_collector_spark.session import spread_scan

    return spread_scan(_emb(spark, sf_dir), F.col("vec_id"))



def as_double(col: str) -> Column:
    return F.transform(F.col(col), lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def norm(col: Column) -> Column:
    """sqrt(dot(v, v)), staged ONCE per vector as a named column:
    inline `cosine()` re-evaluates both operand norms for every pair
    (the aggregate/zip_with chain is interpreted, not codegen'd), so a
    20-query kNN scan does 3 dots per comparison where 1 suffices —
    measured 2.3x on the 10x scan with bitwise-identical output."""
    return F.sqrt(dot(col, col))


def cosine_pre(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """cosine(a, b) with precomputed norms; same fold order and same
    denominator operand order as cosine(), so the double is the SAME
    double — the strict oracle gate holds either way."""
    return dot(a, b) / (na * nb)


_KNN_ORACLE = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
q AS (SELECT * FROM e WHERE vec_id < {N_QUERY_VECTORS}),
scored AS (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           list_cosine_similarity(q.emb, c.emb) AS cos
    FROM q JOIN e c ON c.vec_id <> q.vec_id
),
ranked AS (
    SELECT query_id, neighbor_id, cos,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cos DESC, neighbor_id) AS rnk
    FROM scored
)
SELECT query_id, neighbor_id, round(cos, 4) + 0.0 AS cosine_sim, CAST(rnk AS INT) AS rnk
FROM ranked WHERE rnk <= {TOP_K}
"""


@query("knn_bruteforce_cosine", oracle=_KNN_ORACLE, cache_plan=True)
def q_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = _emb(spark, sf_dir).select(
        "vec_id", as_double("embedding").alias("emb")
    ).withColumn("nrm", norm(F.col("emb")))
    q = e.filter(F.col("vec_id") < N_QUERY_VECTORS).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    scored = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine_pre(
                F.col("q_emb"), F.col("emb"), F.col("q_nrm"), F.col("nrm")
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            F.round(F.col("cos"), 4).alias("cosine_sim"),
            "rnk",
        )
    )


_IVF_ORACLE = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb, label FROM embeddings),
q AS (SELECT * FROM e WHERE vec_id < {N_QUERY_VECTORS}),
scored AS (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           list_cosine_similarity(q.emb, c.emb) AS cos
    FROM q JOIN e c ON c.label = q.label AND c.vec_id <> q.vec_id
),
ranked AS (
    SELECT query_id, neighbor_id, cos,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cos DESC, neighbor_id) AS rnk
    FROM scored
)
SELECT query_id, neighbor_id, round(cos, 4) + 0.0 AS cosine_sim, CAST(rnk AS INT) AS rnk
FROM ranked WHERE rnk <= {TOP_K}
"""


@query("ann_ivf_bucketed", oracle=_IVF_ORACLE, cache_plan=True)
def q_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: candidates restricted to the query's coarse
    bucket (equi-join on the partition key) before exact scoring —
    the candidate set shrinks by ~n_buckets, and the join is an
    equi-join Spark shuffles on the bucket key (or broadcasts the
    query side, as here)."""
    from pyspark.sql import Window

    e = _emb(spark, sf_dir).select(
        "vec_id", as_double("embedding").alias("emb"), "label"
    ).withColumn("nrm", norm(F.col("emb")))
    q = e.filter(F.col("vec_id") < N_QUERY_VECTORS).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
        F.col("label").alias("q_label"),
    )
    scored = (
        e.join(
            F.broadcast(q),
            (F.col("label") == F.col("q_label")) & (F.col("vec_id") != F.col("query_id")),
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine_pre(
                F.col("q_emb"), F.col("emb"), F.col("q_nrm"), F.col("nrm")
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            F.round(F.col("cos"), 4).alias("cosine_sim"),
            "rnk",
        )
    )


_NEAR_DUP_ORACLE = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
pairs AS (
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           list_cosine_similarity(a.emb, b.emb) AS cos
    FROM e a JOIN e b ON a.vec_id < b.vec_id
)
SELECT vec_a, vec_b, round(cos, 4) + 0.0 AS cosine_sim
FROM pairs WHERE cos >= 0.4
"""


@query(
    "vector_near_dup_exact",
    oracle=_NEAR_DUP_ORACLE,
    aliases=("embedding_near_dup",),
)
def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs.  All-pairs at test SF; the
    documented scale path is the bucketed variant (ann_ivf_bucketed)
    or sign-LSH pre-bucketing — an all-pairs join would not survive
    100 TB and is kept only as the exact baseline.

    The probe side is spread first: on the single-file test table the
    broadcast-nested-loop probe evaluated ALL |V|^2/2 interpreted
    cosines in the one scan task (measured 23.6 s at sf0.1; ~1 s
    spread across cores). No-op on a parallel scan
    (session.spread_scan)."""
    from divolte_collector_spark.session import spread_scan

    e = spread_scan(_emb(spark, sf_dir), F.col("vec_id")).select(
        "vec_id", as_double("embedding").alias("emb")
    ).withColumn("nrm", norm(F.col("emb")))
    a = e.select(
        F.col("vec_id").alias("vec_a"),
        F.col("emb").alias("emb_a"),
        F.col("nrm").alias("nrm_a"),
    )
    b = e.select(
        F.col("vec_id").alias("vec_b"),
        F.col("emb").alias("emb_b"),
        F.col("nrm").alias("nrm_b"),
    )
    pairs = a.join(F.broadcast(b), F.col("vec_a") < F.col("vec_b")).select(
        "vec_a",
        "vec_b",
        cosine_pre(
            F.col("emb_a"), F.col("emb_b"), F.col("nrm_a"), F.col("nrm_b")
        ).alias("cos"),
    )
    return pairs.filter(F.col("cos") >= 0.4).select(
        "vec_a", "vec_b", F.round(F.col("cos"), 4).alias("cosine_sim")
    )


# --- IVF with LEARNED centroids (one Lloyd iteration) -----------------------
# The label-bucketed IVF above assumes a pre-existing coarse key; real
# corpora need the centroids learned. One deterministic Lloyd step:
# init centroids = the first K vectors (hash-free, reproducible),
# assign all vectors (max cosine, ties by centroid id), recompute
# centroids as the element-wise mean ROUNDED to 6 decimals (killing
# cross-engine float-summation-order divergence at cluster boundaries),
# then probe queries search only their assigned cluster.
#
# Scale shape: assignment is a broadcast of K centroids against the
# fact (no shuffle), the recompute is one posexplode+groupBy shuffle
# bounded by K x dims rows out, and the final search is an equi-join
# on the cluster id. Additional Lloyd iterations repeat the same two
# steps — cost is linear per iteration with no driver-side data.

N_CLUSTERS = 8

_KMEANS_IVF_ORACLE = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
c0 AS (SELECT vec_id AS cid, emb AS cemb FROM e WHERE vec_id < {N_CLUSTERS}),
a1 AS (
    SELECT vec_id, emb, cid FROM (
        SELECT e.vec_id, e.emb, c0.cid,
               row_number() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY list_cosine_similarity(e.emb, c0.cemb) DESC, c0.cid
               ) AS rn
        FROM e CROSS JOIN c0) x
    WHERE rn = 1
),
c1 AS (
    SELECT cid, list(av ORDER BY dim) AS cemb FROM (
        SELECT cid, dim, round(avg(v), 6) AS av
        FROM (SELECT cid, unnest(emb) AS v,
                     generate_subscripts(emb, 1) AS dim
              FROM a1) u
        GROUP BY cid, dim) m
    GROUP BY cid
),
a2 AS (
    SELECT vec_id, emb, cid FROM (
        SELECT e.vec_id, e.emb, c1.cid,
               row_number() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY list_cosine_similarity(e.emb, c1.cemb) DESC, c1.cid
               ) AS rn
        FROM e CROSS JOIN c1) x
    WHERE rn = 1
),
scored AS (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           list_cosine_similarity(q.emb, c.emb) AS cos
    FROM a2 q JOIN a2 c ON c.cid = q.cid AND c.vec_id <> q.vec_id
    WHERE q.vec_id < {N_QUERY_VECTORS}
),
ranked AS (
    SELECT query_id, neighbor_id, cos,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cos DESC, neighbor_id) AS rnk
    FROM scored
)
SELECT query_id, neighbor_id, round(cos, 4) + 0.0 AS cosine_sim, CAST(rnk AS INT) AS rnk
FROM ranked WHERE rnk <= {TOP_K}
"""


def _assign(e: DataFrame, centroids: list[tuple[int, list[float]]]) -> DataFrame:
    """Nearest-centroid assignment with DRIVER-HELD centroids (the
    MLlib discipline: K x dims doubles live on the driver between
    Lloyd iterations; the fact side never shuffles for assignment).
    Each row computes K cosines against literal centroid arrays and
    takes the argmax map-side — a narrow transform of the scan. The
    window-over-crossJoin formulation this replaces shuffled the full
    fact per iteration (measured: 9 exchanges -> 4 for one iteration).

    Ties break toward the lowest centroid id: array_max over
    struct(cos, -cid) picks max cosine then min cid, matching the
    oracle's row_number ORDER BY cos DESC, cid.

    The vector norm is staged once as a ``nrm`` column (one dot per
    row instead of one per centroid) and kept in the output so
    downstream pair scoring reuses it; centroid norms are K scalars
    computed on the driver with the same left-fold order, so every
    cosine is the same double the inline form produces."""
    import math

    best = F.array_max(
        F.array(
            *[
                F.struct(
                    cosine_pre(
                        F.col("emb"),
                        F.array(*[F.lit(x) for x in cemb]),
                        F.col("nrm"),
                        F.lit(math.sqrt(sum(x * x for x in cemb))),
                    ).alias("cos"),
                    F.lit(-cid).alias("ncid"),
                )
                for cid, cemb in centroids
            ]
        )
    )
    return e.select("vec_id", "emb", norm(F.col("emb")).alias("nrm")).select(
        "vec_id", "emb", "nrm", (-best["ncid"]).cast("long").alias("cid")
    )


def lloyd_iterate(
    e: DataFrame,
    centroids: list[tuple[int, list[float]]],
    iterations: int = 1,
) -> tuple[DataFrame, list[tuple[int, list[float]]]]:
    """Run N Lloyd iterations and return (assignments, centroids).

    Per iteration: map-side assignment against driver-held centroids
    (no fact shuffle), then one posexplode+groupBy shuffle bounded by
    K x dims output rows to recompute means (rounded to 6 decimals for
    cross-engine determinism). K x dims doubles travel through the
    driver per iteration — the standard Lloyd data flow; the fact
    table never leaves the executors."""
    assigned = None
    for _ in range(iterations):
        assigned = _assign(e, centroids)
        c_df = (
            assigned.select("cid", F.posexplode("emb").alias("dim", "v"))
            .groupBy("cid", "dim")
            .agg(F.round(F.avg("v"), 6).alias("av"))
            .groupBy("cid")
            .agg(F.array_sort(F.collect_list(F.struct("dim", "av"))).alias("pairs"))
            .select("cid", F.transform(F.col("pairs"), lambda p: p.av).alias("cemb"))
        )
        centroids = [
            (int(r.cid), [float(x) for x in r.cemb]) for r in c_df.collect()
        ]
    return assigned, centroids


@query("ann_ivf_kmeans", oracle=_KMEANS_IVF_ORACLE)
def q_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = _emb_s(spark, sf_dir).select("vec_id", as_double("embedding").alias("emb"))
    c0 = [
        (int(r.vec_id), [float(x) for x in r.emb])
        for r in e.filter(F.col("vec_id") < N_CLUSTERS).collect()
    ]
    # ONE iteration here because the unrolled SQL oracle encodes one;
    # lloyd_iterate(e, c0, iterations=N) is the production knob.
    _, c1 = lloyd_iterate(e, c0, iterations=1)
    a2 = _assign(e, c1)
    probes = a2.filter(F.col("vec_id") < N_QUERY_VECTORS).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
        F.col("cid").alias("q_cid"),
    )
    scored = (
        a2.join(F.broadcast(probes), (F.col("cid") == F.col("q_cid")) & (F.col("vec_id") != F.col("query_id")))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine_pre(
                F.col("q_emb"), F.col("emb"), F.col("q_nrm"), F.col("nrm")
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            F.round(F.col("cos"), 4).alias("cosine_sim"),
            "rnk",
        )
    )

# --- two-iteration Lloyd (the production knob, oracle-proven) ---------------
# ann_ivf_kmeans proves ONE Lloyd step; this unrolls the oracle to TWO
# so lloyd_iterate(..., iterations=N) is demonstrated as a loop, not a
# parameter that only ever ran once.  Each unrolled step is the same
# two CTEs: nearest-centroid assignment (row_number over the K-way
# cross), then the per-(cid, dim) mean rounded to 6 decimals.

def _assign_cte(name: str, centroids: str, fact: str = "e") -> str:
    return f"""{name} AS (
    SELECT vec_id, emb, cid FROM (
        SELECT {fact}.vec_id, {fact}.emb, {centroids}.cid,
               row_number() OVER (
                   PARTITION BY {fact}.vec_id
                   ORDER BY list_cosine_similarity({fact}.emb, {centroids}.cemb)
                            DESC, {centroids}.cid
               ) AS rn
        FROM {fact} CROSS JOIN {centroids}) x
    WHERE rn = 1
)"""


def _recompute_cte(name: str, assigned: str) -> str:
    return f"""{name} AS (
    SELECT cid, list(av ORDER BY dim) AS cemb FROM (
        SELECT cid, dim, round(avg(v), 6) AS av
        FROM (SELECT cid, unnest(emb) AS v,
                     generate_subscripts(emb, 1) AS dim
              FROM {assigned}) u
        GROUP BY cid, dim) m
    GROUP BY cid
)"""


_KMEANS2_ORACLE = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
c0 AS (SELECT vec_id AS cid, emb AS cemb FROM e WHERE vec_id < {N_CLUSTERS}),
{_assign_cte("a1", "c0")},
{_recompute_cte("c1", "a1")},
{_assign_cte("a2", "c1")},
{_recompute_cte("c2", "a2")},
{_assign_cte("a3", "c2")},
scored AS (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           list_cosine_similarity(q.emb, c.emb) AS cos
    FROM a3 q JOIN a3 c ON c.cid = q.cid AND c.vec_id <> q.vec_id
    WHERE q.vec_id < {N_QUERY_VECTORS}
),
ranked AS (
    SELECT query_id, neighbor_id, cos,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cos DESC, neighbor_id) AS rnk
    FROM scored
)
SELECT query_id, neighbor_id, round(cos, 4) + 0.0 AS cosine_sim, CAST(rnk AS INT) AS rnk
FROM ranked WHERE rnk <= {TOP_K}
"""


@query(
    "refined_ivf_kmeans",
    oracle=_KMEANS2_ORACLE,
    aliases=("ann_ivf_kmeans2",),
)
def q_ivf_kmeans2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two Lloyd iterations through the SAME lloyd_iterate loop the
    one-iteration query uses — proving the iteration knob against a
    twice-unrolled oracle.  Scale shape per iteration is unchanged:
    map-side assignment against driver-held centroids (no fact
    shuffle), one posexplode+groupBy shuffle bounded by K x dims."""
    from pyspark.sql import Window

    e = _emb_s(spark, sf_dir).select("vec_id", as_double("embedding").alias("emb"))
    c0 = [
        (int(r.vec_id), [float(x) for x in r.emb])
        for r in e.filter(F.col("vec_id") < N_CLUSTERS).collect()
    ]
    _, c2 = lloyd_iterate(e, c0, iterations=2)
    a3 = _assign(e, c2)
    probes = a3.filter(F.col("vec_id") < N_QUERY_VECTORS).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
        F.col("cid").alias("q_cid"),
    )
    scored = a3.join(
        F.broadcast(probes),
        (F.col("cid") == F.col("q_cid")) & (F.col("vec_id") != F.col("query_id")),
    ).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        cosine_pre(
            F.col("q_emb"), F.col("emb"), F.col("q_nrm"), F.col("nrm")
        ).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            F.round(F.col("cos"), 4).alias("cosine_sim"),
            "rnk",
        )
    )


# --- sign-LSH (random hyperplane) bucketed near-dup -------------------------
# The scale path for embedding near-duplicates: an all-pairs cosine
# join is O(n^2) and dies at 100 TB; sign-LSH buckets vectors by the
# SIGN PATTERN of dot products against a set of hyperplanes (Charikar
# SimHash for real vectors), so candidate generation is an equi-join
# on (band, 4-bit key) and only bucket-mates get exact verification.
# Hyperplanes are DATA-DERIVED (the first N_PLANES embeddings) so the
# DuckDB oracle reproduces them exactly — no cross-engine RNG.  At
# scale you widen BITS_PER_BAND with log(n) (16 buckets/band here is
# sized for the 500-vector test SF) and keep bands for recall;
# sign-agreement probability for angle theta is 1 - theta/pi, so a
# 0.4-cosine pair matches a 4-bit band w.p. ~0.16 and >=1 of 4 bands
# w.p. ~0.5 — recall is tunable, the all-pairs baseline
# (embedding_near_dup) stays as the exact-recall reference.

N_PLANES = 16
BITS_PER_BAND = 4
N_BANDS = N_PLANES // BITS_PER_BAND
NEAR_DUP_THRESHOLD = 0.4

_SIGN_LSH_ORACLE = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
h AS (SELECT vec_id AS hid, emb AS hemb FROM e WHERE vec_id < {N_PLANES}),
sig AS (
    SELECT e.vec_id,
           string_agg(CASE WHEN list_dot_product(e.emb, h.hemb) >= 0
                           THEN '1' ELSE '0' END, '' ORDER BY h.hid) AS bits
    FROM e CROSS JOIN h GROUP BY e.vec_id
),
banded AS (
    SELECT vec_id, b.band,
           substr(bits, b.band * {BITS_PER_BAND} + 1, {BITS_PER_BAND}) AS key
    FROM sig, (VALUES {",".join(f"({i})" for i in range(N_BANDS))}) b(band)
),
cand AS (
    SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
    FROM banded a
    JOIN banded b ON a.band = b.band AND a.key = b.key
                 AND a.vec_id < b.vec_id
)
SELECT c.vec_a, c.vec_b,
       round(list_cosine_similarity(ea.emb, eb.emb), 4) AS cosine_sim
FROM cand c
JOIN e ea ON ea.vec_id = c.vec_a
JOIN e eb ON eb.vec_id = c.vec_b
WHERE list_cosine_similarity(ea.emb, eb.emb) >= {NEAR_DUP_THRESHOLD}
"""


@query("embedding_near_dup_lsh", oracle=_SIGN_LSH_ORACLE)
def q_near_dup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed near-dup: sign-LSH bands -> equi-join candidates ->
    exact cosine verification.  No cartesian anywhere: signatures are
    a narrow map (N_PLANES JVM-side dots against driver-held planes),
    candidate generation shuffles on (band, key), verification runs
    once per DISTINCT candidate pair."""
    e = _emb_s(spark, sf_dir).select("vec_id", as_double("embedding").alias("emb"))
    planes = sorted(
        (int(r.vec_id), [float(x) for x in r.emb])
        for r in e.filter(F.col("vec_id") < N_PLANES).collect()
    )
    bits = [
        F.when(
            dot(F.col("emb"), F.array(*[F.lit(x) for x in p])) >= 0, F.lit("1")
        ).otherwise(F.lit("0"))
        for _, p in planes
    ]
    sig = F.concat(*bits)
    banded = (
        e.withColumn(
            "bk",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(band).alias("band"),
                            F.substring(
                                sig, band * BITS_PER_BAND + 1, BITS_PER_BAND
                            ).alias("key"),
                        )
                        for band in range(N_BANDS)
                    ]
                )
            ),
        )
        .select(
            "vec_id", "emb", norm(F.col("emb")).alias("nrm"),
            F.col("bk.band").alias("band"), F.col("bk.key").alias("key"),
        )
    )
    a = banded.select(
        F.col("vec_id").alias("vec_a"), F.col("emb").alias("emb_a"),
        F.col("nrm").alias("nrm_a"), "band", "key",
    )
    b = banded.select(
        F.col("vec_id").alias("vec_b"), F.col("emb").alias("emb_b"),
        F.col("nrm").alias("nrm_b"), "band", "key",
    )
    cand = (
        a.join(b, ["band", "key"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        # a pair sharing multiple bands appears once per band: dedup
        # BEFORE the exact verification so each pair is scored once
        .groupBy("vec_a", "vec_b")
        .agg(
            F.first("emb_a").alias("emb_a"), F.first("emb_b").alias("emb_b"),
            F.first("nrm_a").alias("nrm_a"), F.first("nrm_b").alias("nrm_b"),
        )
    )
    return (
        cand.withColumn(
            "cos",
            cosine_pre(
                F.col("emb_a"), F.col("emb_b"), F.col("nrm_a"), F.col("nrm_b")
            ),
        )
        .filter(F.col("cos") >= NEAR_DUP_THRESHOLD)
        .select("vec_a", "vec_b", F.round(F.col("cos"), 4).alias("cosine_sim"))
    )


# --- int8 symmetric quantization --------------------------------------------
# Embedding preprocessing a large-scale vector pipeline runs before
# indexing/serving: per-vector symmetric int8 quantization (scale =
# absmax/127, q_i = round(x_i / scale)). Pure array expressions — a
# narrow map over the scan, no shuffle, no Python. The explicit
# floor(x+0.5) rounding is deterministic and identical across engines
# (half-up everywhere, where round() families differ on ties).

_QUANT_ORACLE = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
s AS (
    SELECT vec_id, emb,
           list_max(list_transform(emb, x -> abs(x))) / 127.0 AS scale
    FROM e
)
SELECT vec_id, round(scale, 9) AS scale,
       to_json(CASE WHEN scale = 0
            THEN list_transform(emb, x -> CAST(0 AS BIGINT))
            ELSE list_transform(emb, x -> CAST(floor(x / scale + 0.5) AS BIGINT))
       END) AS q
FROM s
"""


@query("embedding_quantize_int8", oracle=_QUANT_ORACLE)
def q_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the working scale column is named scale_raw, NOT scale: the final
    # select aliases round(scale_raw, 9) to the output name "scale", and
    # a same-named intermediate would let lateral-column-alias
    # resolution bind the divisor INSIDE the transform lambda to the
    # rounded alias (observed on Spark 4.1: the lambda's col("scale")
    # resolved to round(scale,9) while the sibling `when` condition
    # resolved to the raw input column). Dividing by the rounded scale
    # flips floor(x/scale + 0.5) on half-integer boundary vectors and
    # diverges from the oracle, which divides by the unrounded scale —
    # caught by the 100x sweep (3 vectors in 20M); no driver-SF vector
    # sits on a boundary, so values there are unchanged by this rename.
    e = _emb(spark, sf_dir).select("vec_id", as_double("embedding").alias("emb"))
    scale = (
        F.array_max(F.transform(F.col("emb"), lambda x: F.abs(x))) / F.lit(127.0)
    ).alias("scale_raw")
    s = e.select("vec_id", "emb", scale)
    q = F.when(
        F.col("scale_raw") == 0,
        F.transform(F.col("emb"), lambda x: F.lit(0).cast("long")),
    ).otherwise(
        F.transform(F.col("emb"), lambda x: F.floor(x / F.col("scale_raw") + 0.5))
    )
    # driver-comparable projection: the int8 vector goes out as its
    # compact JSON text ("[1,-3,...]") — both engines' to_json emit the
    # identical byte string, and the canonicalizer can hash it
    return s.select(
        "vec_id",
        F.round("scale_raw", 9).alias("scale"),
        F.to_json(q.cast("array<long>")).alias("q"),
    )


# --- persisted IVF index: build once, partition-pruned probe ----------------
# The deployment split the in-memory ANN queries above don't show: the
# index is BUILT once (centroids + per-list assignments written to
# parquet, partitioned by centroid id) and PROBED later by a process
# that never sees the build. The probe resolves its candidate lists
# driver-side against the tiny centroid table and reads the
# assignments relation with a partition filter — at 100 TB the scan
# touches only the probed lists' files (planning-time partition
# pruning, pinned in test_plan_shapes), which is the entire point of
# an IVF layout on disk. Same semantics as ann_ivf_kmeans (one Lloyd
# step from the same seeds), so it shares that query's oracle.


@query("vector_index_persist_probe", oracle=_KMEANS_IVF_ORACLE)
def q_vector_index_persist(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from pyspark.sql import Window

    e = _emb(spark, sf_dir).select("vec_id", as_double("embedding").alias("emb"))
    c0 = [
        (int(r.vec_id), [float(x) for x in r.emb])
        for r in e.filter(F.col("vec_id") < N_CLUSTERS).collect()
    ]
    base = tempfile.mkdtemp(prefix="dvs_ivfindex_")
    try:
        # ---- build: learn centroids, persist the index layout ----
        _, c1 = lloyd_iterate(e, c0, iterations=1)
        assigned = _assign(e, c1)
        assigned.write.mode("overwrite").partitionBy("cid").parquet(
            f"{base}/lists"
        )
        spark.createDataFrame(
            [(cid, vec) for cid, vec in c1], "cid int, cemb array<double>"
        ).write.mode("overwrite").parquet(f"{base}/centroids")

        # ---- probe: a reader that only sees the on-disk index ----
        # (the index persists the vector NORM alongside the list — the
        # probe never recomputes it)
        index = spark.read.parquet(f"{base}/lists")
        probes = index.filter(F.col("vec_id") < N_QUERY_VECTORS).select(
            F.col("vec_id").alias("query_id"),
            F.col("emb").alias("q_emb"),
            F.col("nrm").alias("q_nrm"),
            F.col("cid").alias("q_cid"),
        )
        probe_cids = sorted(
            {int(r.q_cid) for r in probes.select("q_cid").distinct().collect()}
        )
        # partition filter -> only the probed lists' files are scanned
        lists = index.filter(F.col("cid").isin(probe_cids))
        scored = lists.join(
            F.broadcast(probes),
            (F.col("cid") == F.col("q_cid"))
            & (F.col("vec_id") != F.col("query_id")),
        ).select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine_pre(
                F.col("q_emb"), F.col("emb"), F.col("q_nrm"), F.col("nrm")
            ).alias("cos"),
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("cos").desc(), F.col("neighbor_id")
        )
        out = (
            scored.withColumn("rnk", F.row_number().over(w).cast("int"))
            .filter(F.col("rnk") <= TOP_K)
            .select(
                "query_id",
                "neighbor_id",
                F.round(F.col("cos"), 4).alias("cosine_sim"),
                "rnk",
            )
        )
        # detach from the index tempdir without a driver roundtrip
        return detach_result(spark, out)
    finally:
        shutil.rmtree(base, ignore_errors=True)


# --- product quantization encode --------------------------------------------
# The memory-side compression IVF deployments pair with (IVF-PQ): the
# 64-dim vector splits into M=8 subspaces of 8 dims, each subspace
# quantizes independently against a K=16-codeword codebook, and the
# vector is stored as 8 one-byte codes (64x smaller than float32).
# Codebooks here are seeded from the first K vectors' subvectors (the
# learned-codebook variant would run lloyd_iterate per subspace — the
# loop is already proven by ann_ivf_kmeans). Shape: the K*M codebook
# broadcasts; encoding is a map-side argmin per (vector, subspace) —
# the fact table never shuffles for encoding, only the (vec, M)-row
# explode feeds the per-pair window. The squared-distance fold is
# written as an explicit left fold on BOTH engines so the argmin
# compares bit-identical doubles.

PQ_M = 8  # subspaces
PQ_D = 8  # dims per subspace
PQ_K = 16  # codewords per subspace

_PQ_ORACLE = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
js AS (SELECT unnest(range({PQ_M})) AS j),
cb AS (
    SELECT j, vec_id AS code_id, emb[j*{PQ_D}+1 : j*{PQ_D}+{PQ_D}] AS cw
    FROM e CROSS JOIN js WHERE vec_id < {PQ_K}
),
sub AS (
    SELECT vec_id, j, emb[j*{PQ_D}+1 : j*{PQ_D}+{PQ_D}] AS sv
    FROM e CROSS JOIN js
),
dists AS (
    SELECT s.vec_id, s.j, c.code_id,
           list_reduce(
               list_transform(range({PQ_D}),
                              i -> (s.sv[i+1] - c.cw[i+1]) ** 2),
               (a, b) -> a + b) AS d2
    FROM sub s JOIN cb c ON c.j = s.j
),
best AS (
    SELECT vec_id, j, code_id, d2,
           row_number() OVER (
               PARTITION BY vec_id, j ORDER BY d2, code_id) AS rn
    FROM dists
)
SELECT vec_id,
       '[' || string_agg(code_id::VARCHAR, ',' ORDER BY j) || ']' AS codes,
       round(sum(d2), 6) AS total_sq_err
FROM best WHERE rn = 1 GROUP BY vec_id
"""


@query("vector_pq_encode", oracle=_PQ_ORACLE)
def q_vector_pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = _emb_s(spark, sf_dir).select("vec_id", as_double("embedding").alias("emb"))
    js = F.explode(F.sequence(F.lit(0), F.lit(PQ_M - 1))).alias("j")
    subvec = F.slice("emb", F.col("j") * PQ_D + 1, PQ_D)
    sub = e.select("vec_id", "emb", js).select(
        "vec_id", "j", subvec.alias("sv")
    )
    cb = (
        e.filter(F.col("vec_id") < PQ_K)
        .select(F.col("vec_id").alias("code_id"), "emb", js)
        .select("code_id", "j", subvec.alias("cw"))
    )
    d2 = F.aggregate(
        F.zip_with("sv", "cw", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    dists = sub.join(F.broadcast(cb), "j").select(
        "vec_id", "j", "code_id", d2.alias("d2")
    )
    w = Window.partitionBy("vec_id", "j").orderBy("d2", "code_id")
    best = dists.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    )
    return (
        best.groupBy("vec_id")
        .agg(
            F.to_json(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("j", "code_id"))),
                    lambda s: s["code_id"],
                )
            ).alias("codes"),
            F.round(F.sum("d2"), 6).alias("total_sq_err"),
        )
    )


# --- learned product quantization (per-subspace Lloyd) ----------------------
# vector_pq_encode quantizes against SEEDED codebooks; this learns
# them: one Lloyd iteration per subspace, with ALL M subspaces trained
# in a single relation keyed by j — the assignment is one broadcast
# join + per-(vec, j) argmin, and the recompute is one
# (j, code, dim)-keyed aggregation bounded by M*K*D rows. Nothing
# subspace-specific runs M separate jobs; the subspace id is just
# another grouping column, which is what makes the training loop
# scale-independent of M. Encoding against the learned books then
# reuses the same argmin shape.

_PQL_ORACLE = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
js AS (SELECT unnest(range({PQ_M})) AS j),
sub AS (
    SELECT vec_id, j, emb[j*{PQ_D}+1 : j*{PQ_D}+{PQ_D}] AS sv
    FROM e CROSS JOIN js
),
cb0 AS (
    SELECT j, vec_id AS code_id, sv AS cw FROM sub WHERE vec_id < {PQ_K}
),
a1 AS (
    SELECT vec_id, j, code_id, sv FROM (
        SELECT s.vec_id, s.j, c.code_id, s.sv,
               row_number() OVER (
                   PARTITION BY s.vec_id, s.j
                   ORDER BY list_reduce(
                       list_transform(range({PQ_D}),
                                      i -> (s.sv[i+1] - c.cw[i+1]) ** 2),
                       (a, b) -> a + b), c.code_id
               ) AS rn
        FROM sub s JOIN cb0 c ON c.j = s.j) x
    WHERE rn = 1
),
cb1 AS (
    SELECT j, code_id, list(av ORDER BY dim) AS cw FROM (
        SELECT j, code_id, dim, round(avg(v), 6) AS av
        FROM (SELECT j, code_id, unnest(sv) AS v,
                     generate_subscripts(sv, 1) AS dim
              FROM a1) u
        GROUP BY j, code_id, dim) m
    GROUP BY j, code_id
),
enc AS (
    SELECT vec_id, j, code_id, d2 FROM (
        SELECT s.vec_id, s.j, c.code_id,
               list_reduce(
                   list_transform(range({PQ_D}),
                                  i -> (s.sv[i+1] - c.cw[i+1]) ** 2),
                   (a, b) -> a + b) AS d2,
               row_number() OVER (
                   PARTITION BY s.vec_id, s.j
                   ORDER BY list_reduce(
                       list_transform(range({PQ_D}),
                                      i -> (s.sv[i+1] - c.cw[i+1]) ** 2),
                       (a, b) -> a + b), c.code_id
               ) AS rn
        FROM sub s JOIN cb1 c ON c.j = s.j) x
    WHERE rn = 1
)
SELECT vec_id,
       '[' || string_agg(code_id::VARCHAR, ',' ORDER BY j) || ']' AS codes,
       round(sum(d2), 6) AS total_sq_err
FROM enc GROUP BY vec_id
"""


@query("vector_pq_learned", oracle=_PQL_ORACLE)
def q_vector_pq_learned(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = _emb_s(spark, sf_dir).select("vec_id", as_double("embedding").alias("emb"))
    js = F.explode(F.sequence(F.lit(0), F.lit(PQ_M - 1))).alias("j")
    subvec = F.slice("emb", F.col("j") * PQ_D + 1, PQ_D)
    sub = e.select("vec_id", "emb", js).select(
        "vec_id", "j", subvec.alias("sv")
    )
    cb0 = sub.filter(F.col("vec_id") < PQ_K).select(
        "j", F.col("vec_id").alias("code_id"), F.col("sv").alias("cw")
    )
    d2 = F.aggregate(
        F.zip_with("sv", "cw", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    w = Window.partitionBy("vec_id", "j").orderBy("d2", "code_id")

    def assign(codebook):
        return (
            sub.join(F.broadcast(codebook), "j")
            .select("vec_id", "j", "code_id", "sv", d2.alias("d2"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
        )

    a1 = assign(cb0)
    cb1 = (
        a1.select("j", "code_id", F.posexplode("sv").alias("dim", "v"))
        .groupBy("j", "code_id", "dim")
        .agg(F.round(F.avg("v"), 6).alias("av"))
        .groupBy("j", "code_id")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "av"))).alias("p"))
        .select("j", "code_id", F.transform(F.col("p"), lambda s: s.av).alias("cw"))
    )
    enc = assign(cb1)
    return (
        enc.groupBy("vec_id")
        .agg(
            F.to_json(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("j", "code_id"))),
                    lambda s: s["code_id"],
                )
            ).alias("codes"),
            F.round(F.sum("d2"), 6).alias("total_sq_err"),
        )
    )


# --- reciprocal rank fusion --------------------------------------------------
# Hybrid retrieval: two rankers (here cosine similarity and euclidean
# distance over the same vectors — in production, a dense ANN ranking
# and a sparse TF-IDF/BM25 ranking) each produce a per-query top-R
# list, and RRF fuses them as sum(1 / (60 + rank)) without needing the
# scores to be commensurable. Work: each ranking is the broadcast-
# queries-x-scan shape with a per-query top-R window; the fusion is a
# full outer join on (query, candidate) over two R-row-per-query
# relations — output-sized, never corpus-sized. Distances accumulate
# via the same explicit left fold on both engines so ranks compare
# bit-identical values.

_RRF_K = 60
_RRF_R = 10  # depth of each input ranking


_RRF_ORACLE = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
q AS (SELECT * FROM e WHERE vec_id < {N_QUERY_VECTORS}),
scored AS (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           list_cosine_similarity(q.emb, c.emb) AS cos,
           list_reduce(list_transform(range(len(q.emb)),
                                      i -> (q.emb[i+1] - c.emb[i+1]) ** 2),
                       (a, b) -> a + b) AS l2sq
    FROM q JOIN e c ON c.vec_id <> q.vec_id
),
r1 AS (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cos DESC, neighbor_id) AS rnk
    FROM scored QUALIFY rnk <= {_RRF_R}
),
r2 AS (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY l2sq, neighbor_id) AS rnk
    FROM scored QUALIFY rnk <= {_RRF_R}
),
fused AS (
    SELECT coalesce(r1.query_id, r2.query_id) AS query_id,
           coalesce(r1.neighbor_id, r2.neighbor_id) AS neighbor_id,
           round(coalesce(1.0 / ({_RRF_K} + r1.rnk), 0)
                 + coalesce(1.0 / ({_RRF_K} + r2.rnk), 0), 9) AS rrf
    FROM r1 FULL OUTER JOIN r2
      ON r1.query_id = r2.query_id AND r1.neighbor_id = r2.neighbor_id
)
SELECT query_id, neighbor_id, rrf,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY rrf DESC, neighbor_id) AS BIGINT)
           AS fused_rank
FROM fused
QUALIFY fused_rank <= {TOP_K}
"""


@query("rank_fusion_rrf", oracle=_RRF_ORACLE)
def q_rank_fusion_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = _emb(spark, sf_dir).select(
        "vec_id", as_double("embedding").alias("emb")
    ).withColumn("nrm", norm(F.col("emb")))
    q = e.filter(F.col("vec_id") < N_QUERY_VECTORS).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    l2sq = F.aggregate(
        F.zip_with("q_emb", "emb", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    scored = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine_pre(
                F.col("q_emb"), F.col("emb"), F.col("q_nrm"), F.col("nrm")
            ).alias("cos"),
            l2sq.alias("l2sq"),
        )
    )
    w1 = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), "neighbor_id"
    )
    w2 = Window.partitionBy("query_id").orderBy("l2sq", "neighbor_id")
    r1 = (
        scored.withColumn("rnk", F.row_number().over(w1))
        .filter(F.col("rnk") <= _RRF_R)
        .select("query_id", "neighbor_id", "rnk")
    )
    r2 = (
        scored.withColumn("rnk", F.row_number().over(w2))
        .filter(F.col("rnk") <= _RRF_R)
        .select("query_id", "neighbor_id", "rnk")
    )
    fused = (
        r1.withColumnRenamed("rnk", "rnk1")
        .join(
            r2.withColumnRenamed("rnk", "rnk2"),
            ["query_id", "neighbor_id"],
            "full_outer",
        )
        .select(
            "query_id", "neighbor_id",
            F.round(
                F.coalesce(1.0 / (_RRF_K + F.col("rnk1")), F.lit(0.0))
                + F.coalesce(1.0 / (_RRF_K + F.col("rnk2")), F.lit(0.0)),
                9,
            ).alias("rrf"),
        )
    )
    wf = Window.partitionBy("query_id").orderBy(F.desc("rrf"), "neighbor_id")
    return (
        fused.withColumn("fused_rank", F.row_number().over(wf).cast("long"))
        .filter(F.col("fused_rank") <= TOP_K)
    )


# --- ANN recall measurement --------------------------------------------------
# The number that justifies every approximate index: recall@k of the
# bucketed IVF search against the exact brute-force ground truth, per
# query. Both rankings are the existing formulations; the measurement
# is a join of two k-row-per-query relations (output-sized). At scale
# you run this on a sampled query set — the ground-truth side is the
# expensive exact scan, which is precisely why recall is measured on a
# sample and the index serves the rest.

_RECALL_ORACLE = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb, label
           FROM embeddings),
q AS (SELECT * FROM e WHERE vec_id < {N_QUERY_VECTORS}),
exact AS (
    SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY list_cosine_similarity(q.emb, c.emb) DESC,
                            c.vec_id) AS rnk
        FROM q JOIN e c ON c.vec_id <> q.vec_id) x
    WHERE rnk <= {TOP_K}
),
approx AS (
    SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY list_cosine_similarity(q.emb, c.emb) DESC,
                            c.vec_id) AS rnk
        FROM q JOIN e c ON c.label = q.label AND c.vec_id <> q.vec_id) x
    WHERE rnk <= {TOP_K}
)
SELECT x.query_id,
       CAST(count(a.neighbor_id) AS BIGINT) AS n_hits,
       round(count(a.neighbor_id) / {TOP_K}.0, 6) AS recall_at_k
FROM exact x LEFT JOIN approx a
  ON a.query_id = x.query_id AND a.neighbor_id = x.neighbor_id
GROUP BY x.query_id
"""


@query("recall_ann_vs_exact", oracle=_RECALL_ORACLE)
def q_recall_ann_vs_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = _emb_s(spark, sf_dir).select(
        "vec_id", as_double("embedding").alias("emb"), "label"
    ).withColumn("nrm", norm(F.col("emb")))
    q = e.filter(F.col("vec_id") < N_QUERY_VECTORS).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
        F.col("label").alias("q_label"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), "neighbor_id"
    )

    def topk(candidates):
        return (
            candidates.select(
                "query_id",
                F.col("vec_id").alias("neighbor_id"),
                cosine_pre(
                    F.col("q_emb"), F.col("emb"), F.col("q_nrm"), F.col("nrm")
                ).alias("cos"),
            )
            .withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= TOP_K)
            .select("query_id", "neighbor_id")
        )

    exact = topk(
        e.crossJoin(F.broadcast(q)).filter(
            F.col("vec_id") != F.col("query_id")
        )
    )
    approx = topk(
        e.join(
            F.broadcast(q),
            (F.col("label") == F.col("q_label"))
            & (F.col("vec_id") != F.col("query_id")),
        )
    )
    hit = approx.withColumn("_hit", F.lit(1))
    return (
        exact.join(hit, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("_hit").alias("n_hits"),
            F.round(F.count("_hit") / float(TOP_K), 6).alias("recall_at_k"),
        )
    )


# --- SemDeDup: cluster-then-dedup semantic deduplication --------------------
# The published recipe for semantic dedup at corpus scale (SemDeDup,
# arXiv:2303.09540): k-means the embeddings, then look for high-cosine
# pairs ONLY within a cluster, keeping one canonical document per
# near-duplicate group. The clustering bounds the pair search — the
# quadratic term is per-cluster, never corpus-wide — which is exactly
# the property that survives 100 TB (the all-pairs formulation,
# embedding_near_dup above, is the labeled non-scale baseline).
#
# Plan shape: one Lloyd iteration (map-side assignment against
# driver-held centroids + one K*dims-bounded recompute shuffle), then a
# self-equi-join on the cluster id — no cartesian anywhere. Removal
# rule: a vector is removed if a lower-id vector in ITS cluster is
# within the cosine threshold; the lowest such id is the canonical
# keeper (deterministic, order-free).

SEMDEDUP_THRESHOLD = 0.4

_SEMDEDUP_ORACLE = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
c0 AS (SELECT vec_id AS cid, emb AS cemb FROM e WHERE vec_id < {N_CLUSTERS}),
{_assign_cte('a1', 'c0')},
{_recompute_cte('c1', 'a1')},
{_assign_cte('a2', 'c1')},
pairs AS (
    SELECT a.vec_id AS kept, b.vec_id AS removed, b.cid AS cid,
           list_cosine_similarity(a.emb, b.emb) AS cos
    FROM a2 a JOIN a2 b ON a.cid = b.cid AND a.vec_id < b.vec_id
),
ranked AS (
    SELECT removed, kept, cid, cos,
           row_number() OVER (PARTITION BY removed ORDER BY kept) AS rn
    FROM pairs WHERE cos >= {SEMDEDUP_THRESHOLD}
)
SELECT removed AS removed_id, kept AS kept_id, cid,
       round(cos, 4) + 0.0 AS cosine_sim
FROM ranked WHERE rn = 1
"""


@query("semantic_dedup_kmeans", oracle=_SEMDEDUP_ORACLE)
def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the embeddings table: one deterministic Lloyd
    iteration (same discipline as ann_ivf_kmeans — centroids rounded
    to 6 decimals so both engines agree bitwise), then within-cluster
    near-duplicate pairs above the cosine threshold; each removed
    vector reports its lowest-id keeper."""
    e = _emb_s(spark, sf_dir).select("vec_id", as_double("embedding").alias("emb"))
    c0 = [
        (int(r.vec_id), [float(x) for x in r.emb])
        for r in e.filter(F.col("vec_id") < N_CLUSTERS).collect()
    ]
    _, c1 = lloyd_iterate(e, c0, iterations=1)
    a2 = _assign(e, c1)
    a = a2.select(
        F.col("cid").alias("a_cid"),
        F.col("vec_id").alias("kept"),
        F.col("emb").alias("emb_a"),
        F.col("nrm").alias("nrm_a"),
    )
    b = a2.select(
        "cid", F.col("vec_id").alias("removed"),
        F.col("emb").alias("emb_b"), F.col("nrm").alias("nrm_b"),
    )
    # plain equi-join on the cluster id: side `a` is the WHOLE
    # corpus (every vector + its array) — broadcasting it caps scale at
    # the broadcast limit, while the shuffle join is bounded per
    # cluster, which is the SemDeDup property this query exists for
    pairs = (
        b.join(
            a,
            (F.col("a_cid") == F.col("cid"))
            & (F.col("kept") < F.col("removed")),
        )
        .select(
            "removed", "kept", "cid",
            cosine_pre(
                F.col("emb_a"), F.col("emb_b"), F.col("nrm_a"), F.col("nrm_b")
            ).alias("cos"),
        )
        .filter(F.col("cos") >= SEMDEDUP_THRESHOLD)
    )
    # lowest-id keeper per removed vector, with that pair's cosine:
    # min over struct(kept, cos) orders by kept first
    return (
        pairs.groupBy("removed", "cid")
        .agg(F.min(F.struct("kept", "cos")).alias("best"))
        .select(
            F.col("removed").alias("removed_id"),
            F.col("best.kept").alias("kept_id"),
            "cid",
            F.round(F.col("best.cos"), 4).alias("cosine_sim"),
        )
    )


# --- IVF-PQ with exact rerank (the FAISS-style composite) -------------------
# The deployment-shaped ANN pipeline: coarse list probe (IVF) prunes
# candidates, PQ asymmetric-distance computation scores them from
# 8-byte codes without touching the full vectors, and only the
# shortlist's full vectors are fetched for the exact rerank — memory
# per candidate is M code bytes, full vectors are read R-per-query.

R_SHORTLIST = 20

_IVF_PQ_ORACLE = f"""
WITH e AS (SELECT vec_id, label,
                  CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
js AS (SELECT unnest(range({PQ_M})) AS j),
sub AS (
    SELECT vec_id, label, j, emb[j*{PQ_D}+1 : j*{PQ_D}+{PQ_D}] AS sv
    FROM e CROSS JOIN js
),
cb AS (SELECT j, vec_id AS code_id, sv AS cw FROM sub WHERE vec_id < {PQ_K}),
codes AS (
    SELECT vec_id, label, j, code_id FROM (
        SELECT s.vec_id, s.label, s.j, c.code_id,
               row_number() OVER (
                   PARTITION BY s.vec_id, s.j
                   ORDER BY list_reduce(
                       list_transform(range({PQ_D}),
                                      i -> (s.sv[i+1] - c.cw[i+1]) ** 2),
                       (a, b) -> a + b), c.code_id
               ) AS rn
        FROM sub s JOIN cb c ON c.j = s.j) x
    WHERE rn = 1
),
q AS (SELECT vec_id AS query_id, label AS q_label, emb AS q_emb
      FROM e WHERE vec_id < {N_QUERY_VECTORS}),
qsub AS (
    SELECT query_id, j, q_emb[j*{PQ_D}+1 : j*{PQ_D}+{PQ_D}] AS sv
    FROM q CROSS JOIN js
),
qdist AS (
    SELECT query_id, qs.j, c.code_id,
           list_reduce(
               list_transform(range({PQ_D}),
                              i -> (qs.sv[i+1] - c.cw[i+1]) ** 2),
               (a, b) -> a + b) AS d
    FROM qsub qs JOIN cb c ON c.j = qs.j
),
adc AS (
    SELECT q.query_id, co.vec_id AS neighbor_id,
           list_reduce(list(qd.d ORDER BY co.j), (a, b) -> a + b)
               AS approx_d2
    FROM q
    JOIN codes co ON co.label = q.q_label AND co.vec_id <> q.query_id
    JOIN qdist qd ON qd.query_id = q.query_id AND qd.j = co.j
                 AND qd.code_id = co.code_id
    GROUP BY q.query_id, co.vec_id
),
short AS (
    SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY approx_d2, neighbor_id) AS srn
        FROM adc) x
    WHERE srn <= {R_SHORTLIST}
),
rer AS (
    SELECT s.query_id, s.neighbor_id,
           list_cosine_similarity(q.q_emb, c.emb) AS cos
    FROM short s
    JOIN q ON q.query_id = s.query_id
    JOIN e c ON c.vec_id = s.neighbor_id
)
SELECT query_id, neighbor_id, round(cos, 4) + 0.0 AS cosine_sim,
       CAST(rnk AS INT) AS rnk
FROM (SELECT query_id, neighbor_id, cos,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos DESC, neighbor_id) AS rnk
      FROM rer) z
WHERE rnk <= {TOP_K}
"""


@query("vector_ivf_pq_rerank", oracle=_IVF_PQ_ORACLE)
def q_vector_ivf_pq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ search with exact rerank, end to end in DataFrame ops.

    Scale shape: the ADC phase joins the (query, j, code) distance
    table — Q x M x K rows, broadcast — against the candidates' codes,
    so per-candidate cost is M small rows through a broadcast join and
    one per-(query, candidate) ordered fold; full vectors are fetched
    ONLY for the R-per-query shortlist (the rerank join), exactly the
    IVF-PQ memory/IO contract. All folds are ordered (subspace index)
    so both engines add the same doubles in the same order."""
    from pyspark.sql import Window

    e = _emb_s(spark, sf_dir).select(
        "vec_id", "label", as_double("embedding").alias("emb")
    )
    js = F.explode(F.sequence(F.lit(0), F.lit(PQ_M - 1))).alias("j")
    subvec = F.slice("emb", F.col("j") * PQ_D + 1, PQ_D)
    sub = e.select("vec_id", "label", "emb", js).select(
        "vec_id", "label", "j", subvec.alias("sv")
    )
    cb = sub.filter(F.col("vec_id") < PQ_K).select(
        "j", F.col("vec_id").alias("code_id"), F.col("sv").alias("cw")
    )
    d2 = F.aggregate(
        F.zip_with("sv", "cw", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    w = Window.partitionBy("vec_id", "j").orderBy("d2", "code_id")
    codes = (
        sub.join(F.broadcast(cb), "j")
        .select("vec_id", "label", "j", "code_id", d2.alias("d2"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "label", "j", "code_id")
    )
    en = e.withColumn("nrm", norm(F.col("emb")))
    qn = en.filter(F.col("vec_id") < N_QUERY_VECTORS).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("q_label"),
        F.col("emb").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    qsubvec = F.slice("q_emb", F.col("j") * PQ_D + 1, PQ_D)
    qsub = qn.select("query_id", "q_emb", js).select(
        "query_id", "j", qsubvec.alias("sv")
    )
    qd2 = F.aggregate(
        F.zip_with("sv", "cw", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    qdist = qsub.join(F.broadcast(cb), "j").select(
        "query_id", "j", "code_id", qd2.alias("d")
    )
    pairs = codes.join(
        F.broadcast(qn.select("query_id", "q_label")),
        (F.col("label") == F.col("q_label"))
        & (F.col("vec_id") != F.col("query_id")),
    ).select("query_id", "vec_id", "j", "code_id")
    adc = (
        pairs.join(F.broadcast(qdist), ["query_id", "j", "code_id"])
        .groupBy("query_id", "vec_id")
        .agg(
            # ordered fold over the subspace index: both engines add
            # the same doubles in the same order
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("j", "d"))),
                    lambda s: s["d"],
                ),
                F.lit(0.0),
                lambda a, x: a + x,
            ).alias("approx_d2")
        )
    )
    ws = Window.partitionBy("query_id").orderBy("approx_d2", "vec_id")
    short = (
        adc.withColumn("srn", F.row_number().over(ws))
        .filter(F.col("srn") <= R_SHORTLIST)
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
    )
    rer = (
        short.join(F.broadcast(qn), "query_id")
        .join(en, short.neighbor_id == en.vec_id)
        .select(
            "query_id",
            "neighbor_id",
            cosine_pre(
                F.col("q_emb"), F.col("emb"), F.col("q_nrm"), F.col("nrm")
            ).alias("cos"),
        )
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        rer.withColumn("rnk", F.row_number().over(wr).cast("int"))
        .filter(F.col("rnk") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            F.round(F.col("cos"), 4).alias("cosine_sim"),
            "rnk",
        )
    )


# --- margin-based bitext mining ---------------------------------------------
# The Artetxe-&-Schwenk margin criterion for mining aligned pairs
# across two embedding spaces: raw cosine over-fires in dense hubs, so
# a candidate pair (x, y) is scored by its cosine RELATIVE to each
# side's neighborhood density — margin = 2*cos(x,y) /
# (avgNN_k(x) + avgNN_k(y)) — and mined pairs are the per-source
# argmax above a ratio threshold. Sides here are the deterministic
# vec_id parity split; candidates are restricted to the coarse label
# bucket (the same IVF-style pruning the ANN family uses), so the
# pair relation is per-bucket bounded, never corpus-wide.

MARGIN_K = 4
MARGIN_THRESHOLD = 1.0

_MARGIN_ORACLE = f"""
WITH e AS (SELECT vec_id, label,
                  CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
src AS (SELECT vec_id AS src_id, label, emb FROM e WHERE vec_id % 2 = 0),
tgt AS (SELECT vec_id AS tgt_id, label, emb FROM e WHERE vec_id % 2 = 1),
pairs AS (
    SELECT s.src_id, t.tgt_id, s.label,
           list_cosine_similarity(s.emb, t.emb) AS cos
    FROM src s JOIN tgt t ON t.label = s.label
),
fwd AS (
    SELECT src_id, tgt_id, cos,
           row_number() OVER (PARTITION BY src_id
                              ORDER BY cos DESC, tgt_id) AS rn
    FROM pairs
),
avg_src AS (
    SELECT src_id,
           list_reduce(list(cos ORDER BY rn), (a, b) -> a + b)
               / count(*) AS nn_avg
    FROM fwd WHERE rn <= {MARGIN_K} GROUP BY src_id
),
bwd AS (
    SELECT src_id, tgt_id, cos,
           row_number() OVER (PARTITION BY tgt_id
                              ORDER BY cos DESC, src_id) AS rn
    FROM pairs
),
avg_tgt AS (
    SELECT tgt_id,
           list_reduce(list(cos ORDER BY rn), (a, b) -> a + b)
               / count(*) AS nn_avg
    FROM bwd WHERE rn <= {MARGIN_K} GROUP BY tgt_id
),
margins AS (
    SELECT f.src_id, f.tgt_id,
           2 * f.cos / (a.nn_avg + b.nn_avg) AS margin
    FROM fwd f
    JOIN avg_src a ON a.src_id = f.src_id
    JOIN avg_tgt b ON b.tgt_id = f.tgt_id
    WHERE f.rn <= {MARGIN_K}
),
best AS (
    SELECT src_id, tgt_id, margin,
           row_number() OVER (PARTITION BY src_id
                              ORDER BY margin DESC, tgt_id) AS mrn
    FROM margins
)
SELECT src_id, tgt_id, round(margin, 6) AS margin
FROM best WHERE mrn = 1 AND margin > {MARGIN_THRESHOLD}
"""


@query("vector_margin_bitext", oracle=_MARGIN_ORACLE)
def q_vector_margin_bitext(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-based pair mining: per source vector, the best
    margin-scored target above the ratio threshold.

    Scale shape: the pair relation is restricted to the coarse label
    bucket before any scoring (per-bucket bounded, the IVF pruning
    discipline); cosines are computed ONCE per pair and reused by both
    neighborhood averages; the averages fold in neighbor-rank order so
    both engines add the same doubles in the same sequence."""
    from pyspark.sql import Window

    e = _emb_s(spark, sf_dir).select(
        "vec_id", "label", as_double("embedding").alias("emb")
    ).withColumn("nrm", norm(F.col("emb")))
    src = e.filter(F.col("vec_id") % 2 == 0).select(
        F.col("vec_id").alias("src_id"), "label",
        F.col("emb").alias("s_emb"), F.col("nrm").alias("s_nrm"),
    )
    tgt = e.filter(F.col("vec_id") % 2 == 1).select(
        F.col("vec_id").alias("tgt_id"), "label",
        F.col("emb").alias("t_emb"), F.col("nrm").alias("t_nrm"),
    )
    # the scored pair relation feeds THREE consumers (fwd twice — the
    # forward average and the margin join — plus the backward pass);
    # persist so the per-bucket cosine scoring executes once instead
    # of three times (multi-consumer convention; interleaved A/B at
    # sf0.1: 5.9/1.9/1.7 s -> 2.3/1.4/1.1 s)
    pairs = track_persist(
        src.join(tgt, "label").select(
            "src_id", "tgt_id",
            cosine_pre(
                F.col("s_emb"), F.col("t_emb"), F.col("s_nrm"), F.col("t_nrm")
            ).alias("cos"),
        )
    )
    wf = Window.partitionBy("src_id").orderBy(
        F.col("cos").desc(), F.col("tgt_id")
    )
    fwd = pairs.withColumn("rn", F.row_number().over(wf)).filter(
        F.col("rn") <= MARGIN_K
    )
    # rank-ordered fold, then divide by the actual neighbor count
    # (short buckets have < K neighbors)
    ordered_avg = F.aggregate(
        F.transform(
            F.array_sort(F.collect_list(F.struct("rn", "cos"))),
            lambda s: s["cos"],
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    ) / F.count(F.lit(1))
    avg_src = fwd.groupBy("src_id").agg(ordered_avg.alias("s_nn_avg"))
    wb = Window.partitionBy("tgt_id").orderBy(
        F.col("cos").desc(), F.col("src_id")
    )
    bwd = pairs.withColumn("rn", F.row_number().over(wb)).filter(
        F.col("rn") <= MARGIN_K
    )
    avg_tgt = bwd.groupBy("tgt_id").agg(ordered_avg.alias("t_nn_avg"))
    margins = (
        fwd.join(avg_src, "src_id")
        .join(avg_tgt, "tgt_id")
        .select(
            "src_id", "tgt_id",
            (2 * F.col("cos") / (F.col("s_nn_avg") + F.col("t_nn_avg"))).alias(
                "margin"
            ),
        )
    )
    wm = Window.partitionBy("src_id").orderBy(
        F.col("margin").desc(), F.col("tgt_id")
    )
    return (
        margins.withColumn("mrn", F.row_number().over(wm))
        .filter((F.col("mrn") == 1) & (F.col("margin") > MARGIN_THRESHOLD))
        .select("src_id", "tgt_id", F.round("margin", 6).alias("margin"))
    )


# --- Matryoshka-style truncate + renorm --------------------------------------
# MRL-trained embeddings are served truncated to a dimension prefix
# and re-normalized; the quality signal per vector is how much norm
# the prefix retains. Pure narrow map over the scan (slice + the same
# staged-norm fold the kNN family uses — identical fold order on both
# engines, so the doubles match bit-for-bit before the display round).

_TRUNC_K = 16

_TRUNC_ORACLE = f"""
WITH e AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
),
n AS (
    SELECT vec_id,
           sqrt(list_reduce(list_transform(emb, x -> x * x),
                            (a, b) -> a + b)) AS norm_full,
           sqrt(list_reduce(
               list_transform(emb[1:{_TRUNC_K}], x -> x * x),
               (a, b) -> a + b)) AS norm_k
    FROM e
)
SELECT vec_id,
       round(norm_full, 4) + 0.0 AS norm_full,
       round(norm_k, 4) + 0.0 AS norm_k,
       round(norm_k / norm_full, 4) + 0.0 AS retained
FROM n
"""


@query("vector_truncate_renorm", oracle=_TRUNC_ORACLE)
def q_vector_truncate_renorm(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    e = _emb(spark, sf_dir).select(
        "vec_id", as_double("embedding").alias("emb")
    )
    staged = e.select(
        "vec_id",
        norm(F.col("emb")).alias("_nf"),
        norm(F.slice(F.col("emb"), 1, _TRUNC_K)).alias("_nk"),
    )
    return staged.select(
        "vec_id",
        F.round(F.col("_nf"), 4).alias("norm_full"),
        F.round(F.col("_nk"), 4).alias("norm_k"),
        F.round(F.col("_nk") / F.col("_nf"), 4).alias("retained"),
    )


# --- recall@k vs probe-count frontier ---------------------------------------
# The 100 TB story asserts IVF recall at a single probe setting; this
# measures the full accuracy-cost frontier and gates it: for each
# multi-probe setting P, the candidate volume scored (the COST axis)
# and the exact-top-k hits recovered (the ACCURACY axis). P spans 1 to
# N_CLUSTERS, so the last row must converge to recall 1.0 — probing
# every cell IS the brute-force scan — which pins the whole pipeline
# (centroid ranking, cell membership, top-k) against the exact oracle.
# Named vector_* to sort after the driver's checked window.

_FRONTIER_PROBES = (1, 2, 4, 8)

_FRONTIER_ORACLE = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
c0 AS (SELECT vec_id AS cid, emb AS cemb FROM e WHERE vec_id < {N_CLUSTERS}),
{_assign_cte("a1", "c0")},
{_recompute_cte("c1", "a1")},
{_assign_cte("a2", "c1")},
q AS (SELECT vec_id, emb FROM e WHERE vec_id < {N_QUERY_VECTORS}),
qprob AS (
    SELECT q.vec_id AS query_id, c1.cid,
           row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY list_cosine_similarity(q.emb, c1.cemb) DESC, c1.cid
           ) AS probe_rank
    FROM q CROSS JOIN c1
),
scored AS (
    SELECT qp.query_id, f.vec_id AS neighbor_id, qp.probe_rank,
           list_cosine_similarity(q.emb, f.emb) AS cos
    FROM qprob qp
    JOIN a2 f ON f.cid = qp.cid AND f.vec_id <> qp.query_id
    JOIN q ON q.vec_id = qp.query_id
),
probe_sets AS (SELECT unnest({list(_FRONTIER_PROBES)}) AS probes),
frontier AS (
    SELECT ps.probes, s.query_id, s.neighbor_id, s.cos
    FROM probe_sets ps JOIN scored s ON s.probe_rank <= ps.probes
),
cand AS (
    SELECT probes, CAST(count(*) AS BIGINT) AS cand_rows
    FROM frontier GROUP BY probes
),
ann AS (
    SELECT probes, query_id, neighbor_id FROM (
        SELECT probes, query_id, neighbor_id,
               row_number() OVER (PARTITION BY probes, query_id
                                  ORDER BY cos DESC, neighbor_id) AS rnk
        FROM frontier) x
    WHERE rnk <= {TOP_K}
),
exact AS (
    SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY q.vec_id
                                  ORDER BY list_cosine_similarity(q.emb, c.emb)
                                           DESC, c.vec_id) AS rnk
        FROM q JOIN e c ON c.vec_id <> q.vec_id) x
    WHERE rnk <= {TOP_K}
),
hits AS (
    SELECT a.probes, CAST(count(*) AS BIGINT) AS hits
    FROM ann a JOIN exact ex
      ON ex.query_id = a.query_id AND ex.neighbor_id = a.neighbor_id
    GROUP BY a.probes
)
SELECT CAST(c.probes AS INT) AS probes, h.hits, c.cand_rows,
       CAST(h.hits * 1000000 // {N_QUERY_VECTORS * TOP_K} AS BIGINT)
           AS recall_ppm
FROM cand c JOIN hits h ON h.probes = c.probes
"""


@query(
    "ann_recall_probe_frontier",
    oracle=_FRONTIER_ORACLE,
    aliases=("vector_recall_probe_frontier",),
)
def q_recall_probe_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe IVF recall/cost frontier. Scale shape: candidates
    are scored ONCE with their probe_rank attached (the rank of the
    owning cell in the query's centroid ordering); every probe setting
    is then a NARROW explode+filter over the scored rows — no
    per-setting joins, no re-scoring. The recall denominator is the
    literal N_QUERY_VECTORS*TOP_K (the same every-query-has-k-exact-
    neighbors assumption knn_bruteforce_cosine makes of the testdata),
    so the gate stays in exact integer space (hits, cand_rows,
    recall_ppm by integer division)."""
    import math

    from pyspark.sql import Window

    e = _emb_s(spark, sf_dir).select(
        "vec_id", as_double("embedding").alias("emb")
    )
    c0 = [
        (int(r.vec_id), [float(x) for x in r.emb])
        for r in e.filter(F.col("vec_id") < N_CLUSTERS).collect()
    ]
    _, c1 = lloyd_iterate(e, c0, iterations=1)
    a2 = _assign(e, c1)

    # per-query centroid ranking against the K driver-held centroids:
    # array_sort over (-cos, cid) == ORDER BY cos DESC, cid
    ranked_cells = F.array_sort(
        F.array(
            *[
                F.struct(
                    (
                        -cosine_pre(
                            F.col("emb"),
                            F.array(*[F.lit(x) for x in cemb]),
                            F.col("nrm"),
                            F.lit(math.sqrt(sum(x * x for x in cemb))),
                        )
                    ).alias("neg"),
                    F.lit(cid).alias("cid"),
                )
                for cid, cemb in c1
            ]
        )
    )
    q = (
        e.filter(F.col("vec_id") < N_QUERY_VECTORS)
        .withColumn("nrm", norm(F.col("emb")))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("emb").alias("q_emb"),
            F.col("nrm").alias("q_nrm"),
            F.posexplode(ranked_cells).alias("pos", "cell"),
        )
        .select(
            "query_id",
            "q_emb",
            "q_nrm",
            (F.col("pos") + 1).cast("int").alias("probe_rank"),
            F.col("cell.cid").alias("cid"),
        )
    )
    scored = (
        a2.join(F.broadcast(q), (a2["cid"] == q["cid"]) & (F.col("vec_id") != F.col("query_id")))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "probe_rank",
            cosine_pre(
                F.col("q_emb"), F.col("emb"), F.col("q_nrm"), F.col("nrm")
            ).alias("cos"),
        )
    )
    frontier = scored.withColumn(
        "probes", F.explode(F.array(*[F.lit(p) for p in _FRONTIER_PROBES]))
    ).filter(F.col("probe_rank") <= F.col("probes"))
    cand = frontier.groupBy("probes").agg(F.count(F.lit(1)).alias("cand_rows"))
    w = Window.partitionBy("probes", "query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    ann = (
        frontier.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("probes", "query_id", "neighbor_id")
    )
    # exact baseline: same brute-force shape as knn_bruteforce_cosine
    qx = e.withColumn("nrm", norm(F.col("emb"))).filter(
        F.col("vec_id") < N_QUERY_VECTORS
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    escore = (
        e.withColumn("nrm", norm(F.col("emb")))
        .crossJoin(F.broadcast(qx))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine_pre(
                F.col("q_emb"), F.col("emb"), F.col("q_nrm"), F.col("nrm")
            ).alias("cos"),
        )
    )
    we = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    exact = (
        escore.withColumn("rnk", F.row_number().over(we))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "neighbor_id")
    )
    # both the exact top-k (N_QUERY_VECTORS*TOP_K rows, scale-free) and
    # the per-probes hit counts are constant-size: broadcast them
    hits = (
        ann.join(F.broadcast(exact), ["query_id", "neighbor_id"], "left_semi")
        .groupBy("probes")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    return cand.join(F.broadcast(hits), "probes").select(
        F.col("probes").cast("int").alias("probes"),
        "hits",
        "cand_rows",
        F.expr(f"hits * 1000000L div {N_QUERY_VECTORS * TOP_K}").alias(
            "recall_ppm"
        ),
    )


# --- NN-Descent graph ANN ----------------------------------------------------
# Graph-based ANN construction (NN-Descent, Dong et al., WWW'11): start
# from an arbitrary K-regular graph and repeatedly improve each node's
# neighbor list from its neighbors' neighbors — "a neighbor of a
# neighbor is likely a neighbor". This is the graph-family contrast to
# the IVF/LSH bucketed searchers above: no coarse quantizer, no
# training pass, and the per-round work is bounded by the graph degree,
# never by the corpus.
#
# Scale shape: every round is (a) an id-equi-join of the O(n*K) edge
# list with itself to enumerate two-hop candidates — O(n*(2K)^2) rows,
# LINEAR in n — then (b) one shuffle to re-score and keep top-K per
# node. No CartesianProduct anywhere; the only all-pairs work in the
# recall gate is the 50-probe exact baseline (the documented
# kNN-baseline broadcast shape). At 100 TB the edge list co-partitions
# by id across rounds while the vector table is joined twice per round
# on its key — the published distributed NN-Descent layout.
#
# Determinism: init is two bounded rings — a WITHIN-LABEL ring (node's
# K successors in (label, vec_id) rank order, wrapping inside the
# bucket: cheap locality seeds from the coarse partition, O(n*K) edges
# with NO within-bucket scoring, so the init never goes quadratic the
# way a within-bucket top-K would) plus a GLOBAL stride ring (i+37,
# i+74, ... mod n: long-range edges so refinement can cross buckets —
# without them the label-seeded graph is disconnected across labels
# and rounds provably add nothing; measured recall stays flat at the
# bucket baseline). Every top-K tie breaks by (cos DESC, dst); both
# engines fold the dot products in the same element order, so ranks
# agree bitwise (same argument as cosine_pre above). The fixed 2
# rounds are unrolled in the oracle CTE chain.
#
# Measured at sf0.01 (near-uniform synthetic vectors — ANN's worst
# case; the gated recall_ann_vs_exact pins the one-probe bucket
# baseline at mean 0.13 on the same data): init-only recall@5 0.032 →
# 0.188 after round 1 → 0.292 after round 2 — the graph refinement
# more than doubles the bucketed searcher's recall at a comparable
# scoring budget, which is the graph-family contrast this query gates.
#
# Contract: the global stride ring assumes vec_id is DENSE 0..n-1
# (true of this table at every SF; a gap would make some ring dsts
# nonexistent and the inner re-scoring join would silently thin the
# long-range edges this design depends on). On a gappy id space,
# derive a dense rank first (row_number over vec_id — one window) and
# ring over the rank; the label ring already does exactly that inside
# each bucket, so only the global half needs the extra window.
#
# Skew note: the label-ring init windows by the coarse cell id, which
# on the testdata is a 10-value label — at 100 TB a 10-way partition
# would be a skewed sort. In production the cell id is the trained
# coarse quantizer's assignment (IVF convention: cell count ~ sqrt(n),
# here the same id ann_ivf_kmeans derives), so per-cell cardinality
# stays bounded as n grows; the rounds themselves never touch the
# label and shuffle only on vec_id.

_NND_K = 5
_NND_STRIDE = 37
_NND_PROBES = 50


def _nnd_topk_sql(cand: str) -> str:
    return f"""SELECT src, dst, cos, rnk FROM (
    SELECT sc.src, sc.dst, sc.cos,
           row_number() OVER (PARTITION BY sc.src
                              ORDER BY sc.cos DESC, sc.dst) AS rnk
    FROM (SELECT i.src, i.dst, list_cosine_similarity(s.emb, d.emb) AS cos
          FROM {cand} i JOIN e s ON s.vec_id = i.src
                        JOIN e d ON d.vec_id = i.dst) sc) x
    WHERE rnk <= {_NND_K}"""


def _nnd_round_sql(g_in: str, g_out: str, u: str, c: str) -> str:
    return f"""{u} AS (SELECT src, dst FROM {g_in} UNION SELECT dst, src FROM {g_in}),
{c} AS (
    SELECT a.src, b.dst FROM {u} a JOIN {u} b ON a.dst = b.src AND a.src <> b.dst
    UNION SELECT src, dst FROM {u}
),
{g_out} AS ({_nnd_topk_sql(c)})"""


_NND_GRAPH_CTES = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
nrow AS (SELECT count(*) AS n FROM e),
lr AS (SELECT vec_id, label,
              row_number() OVER (PARTITION BY label ORDER BY vec_id) - 1 AS rn,
              count(*) OVER (PARTITION BY label) AS bn
       FROM embeddings),
jj AS (SELECT unnest(range(1, {_NND_K + 1})) AS j),
init AS (
    SELECT DISTINCT src, dst FROM (
        SELECT a.vec_id AS src, b.vec_id AS dst
        FROM lr a CROSS JOIN jj JOIN lr b
          ON b.label = a.label AND b.rn = (a.rn + jj.j) % a.bn
        WHERE a.vec_id <> b.vec_id
        UNION ALL
        SELECT e.vec_id AS src, (e.vec_id + jj.j * {_NND_STRIDE}) % nrow.n AS dst
        FROM e CROSS JOIN nrow CROSS JOIN jj
        WHERE (e.vec_id + jj.j * {_NND_STRIDE}) % nrow.n <> e.vec_id) z
),
g0 AS ({_nnd_topk_sql("init")}),
{_nnd_round_sql("g0", "g1", "u1", "c1")},
{_nnd_round_sql("g1", "g2", "u2", "c2")}"""

_NND_ORACLE = (
    _NND_GRAPH_CTES
    + """
SELECT src AS node_id, dst AS neighbor_id,
       round(cos, 4) + 0.0 AS cosine_sim, CAST(rnk AS INT) AS rnk
FROM g2
"""
)

_NND_RECALL_ORACLE = (
    _NND_GRAPH_CTES
    + f""",
probes AS (SELECT vec_id, emb FROM e WHERE vec_id < {_NND_PROBES}),
exact AS (
    SELECT query_id, neighbor_id FROM (
        SELECT p.vec_id AS query_id, c.vec_id AS neighbor_id,
               row_number() OVER (
                   PARTITION BY p.vec_id
                   ORDER BY list_cosine_similarity(p.emb, c.emb) DESC,
                            c.vec_id) AS rnk
        FROM probes p JOIN e c ON c.vec_id <> p.vec_id) x
    WHERE rnk <= {_NND_K}
),
hits AS (
    SELECT ex.query_id, count(g.dst) AS n_hits
    FROM exact ex LEFT JOIN g2 g
      ON g.src = ex.query_id AND g.dst = ex.neighbor_id
    GROUP BY ex.query_id
)
SELECT query_id AS node_id, CAST(n_hits AS INT) AS n_hits,
       CAST(n_hits * 1000000 // {_NND_K} AS BIGINT) AS recall_ppm
FROM hits
"""
)


#: per-task byte budget for the re-score stage's sorts: with the
#: documented 256 MB/core floor, a ~64 MB working set keeps every
#: UnsafeExternalSorter pointer array far below the G1 humongous-
#: allocation regime (measured at 100x: 134 MB pointer-array
#: allocations stalling in GCLocker retries while JNI shuffle
#: decompression held the lock — BASELINE.md round-9 controls)
_NND_TASK_BYTES = 64 * 1024 * 1024


def _broadcast_threshold_bytes(spark: SparkSession) -> int:
    """The session's LIVE autoBroadcastJoinThreshold in bytes — read
    from the conf at call time, never duplicated as a module constant
    (a constant silently diverges the moment session.py or a user
    conf changes the threshold, flipping the heavy-path gate onto the
    wrong side of the regime boundary). "-1" (broadcast disabled)
    maps to 0 so every size gates onto the shuffled shape."""
    raw = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    units = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}
    v = raw.strip().lower().removesuffix("b")
    mult = 1
    if v and v[-1] in units:
        mult = units[v[-1]]
        v = v[:-1]
    n = int(v) * mult
    return max(0, n)


def _nnd_heavy_parts(
    n_vec: int, dim: int, default_parallelism: int, broadcast_bytes: int
) -> int | None:
    """Partition count for the re-score stage — None (today's
    broadcast-join shape) while the vector table still broadcasts;
    past that point (~260k vectors at dim 64 under the session's
    64 MB threshold) the joins become shuffled and the candidate list
    repartitions so the per-task sort working set stays inside
    _NND_TASK_BYTES. Volume model: ~n * (2K)^2 * 2 candidate rows per
    round, each carrying one embedding payload through the second
    id-join.

    ``broadcast_bytes`` is the live threshold
    (_broadcast_threshold_bytes). The 4-bytes/float size model tracks
    the PARQUET footprint the planner's scan statistics start from;
    the deliberate margin is that the as_double+norm relation the
    join actually ships is ~2x that — so this gate flips to the
    shuffled shape BEFORE the planner would stop broadcasting, never
    after (the failure mode that matters: an un-hinted sort-merge of
    the wide candidate rows. Flipping early costs the measured ~5x
    only if the planner would still have broadcast — the half-
    threshold band — and the equivalence tests pin both shapes
    correct either way). Broadcast regime: measured at 100x (200k
    vecs, 51 MB): broadcast plan 113.8 s vs 559-595 s for a forced
    shuffle of the same work (same-boot ablation, round 10). The
    heavy path must therefore engage only PAST the broadcast regime,
    never inside it."""
    if n_vec * dim * 4 <= broadcast_bytes:
        return None
    est_rows = n_vec * (2 * _NND_K) ** 2 * 2
    row_bytes = 16 + 8 * dim + 8  # (src,dst) + carried emb + nrm
    est_bytes = est_rows * row_bytes
    return min(2048, max(default_parallelism, est_bytes // _NND_TASK_BYTES))


def _nnd_score_topk(
    cand: DataFrame, e: DataFrame, n_parts: int | None = None
) -> DataFrame:
    """Re-score a candidate edge list (src, dst) against the vector
    table and keep the top-K per src — the per-round NN-Descent update.
    Two id-equi-joins (edge list is O(n*K) at init, O(n*(2K)^2) within
    a round, vectors O(n)) + one bounded window; nothing quadratic.

    ``n_parts`` (from _nnd_heavy_parts) switches on the PAST-BROADCAST
    shape: once the vector table no longer fits the broadcast
    threshold the joins become shuffled, and left alone they'd
    sort-merge — sorting the wide edge-x-embedding intermediate (the
    shape measured on the minhash twin to drive G1 humongous
    allocation stalls). Instead the candidate list repartitions to
    n_parts so every sort — including the window's map-side Partial
    WindowGroupLimit sort — stays inside the per-task byte budget,
    and the two vector joins are hinted SHUFFLE_HASH so the wide
    intermediate STREAMS through the probe side (the hash build side
    is the O(n) vector table, ~n*dim*8/n_parts bytes per task).
    While the vector table broadcasts, n_parts is None and the plan
    is today's exchange-free re-score (forcing the shuffle inside the
    broadcast regime measured 5x slower — _NND_BROADCAST_BYTES
    note)."""
    from pyspark.sql import Window

    s = e.select(
        F.col("vec_id").alias("src"),
        F.col("emb").alias("s_emb"),
        F.col("nrm").alias("s_nrm"),
    )
    d = e.select(
        F.col("vec_id").alias("dst"),
        F.col("emb").alias("d_emb"),
        F.col("nrm").alias("d_nrm"),
    )
    if n_parts is not None:
        cand = cand.repartition(n_parts, "src")
        s = s.hint("shuffle_hash")
        d = d.hint("shuffle_hash")
    scored = (
        cand.join(s, "src")
        .join(d, "dst")
        .select(
            "src",
            "dst",
            cosine_pre(
                F.col("s_emb"), F.col("d_emb"),
                F.col("s_nrm"), F.col("d_nrm"),
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("src").orderBy(F.col("cos").desc(), "dst")
    return scored.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= _NND_K
    )


def _nnd_final_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-ring + global-stride-ring init, then 2 unrolled NN-Descent
    rounds; returns the final directed K-NN graph (src, dst, cos, rnk).
    Both init halves are O(n*K) edge enumerations — the label ring is
    rank-adjacency inside the bucket (one window + one equi-join on
    (label, rn)), never a within-bucket pair scoring."""
    return _nnd_graphs(spark, sf_dir, rounds=2)[-1]


def _nnd_graphs(
    spark: SparkSession, sf_dir: str, rounds: int = 2
) -> "list[DataFrame]":
    """Per-round NN-Descent graphs [g0, g1, ..., g_rounds] (g0 = the
    scored init ring) — the convergence query gates the whole recall
    SEQUENCE, the graph/recall queries consume only the final round."""
    from pyspark.sql import Window

    e = (
        _emb_s(spark, sf_dir)
        .select("vec_id", as_double("embedding").alias("emb"))
        .withColumn("nrm", norm(F.col("emb")))
    )
    # one metadata count + one first() — O(1) scans deciding the
    # re-score stage's shape for THIS corpus size (see _nnd_heavy_parts)
    raw = _emb(spark, sf_dir)
    n_vec = raw.count()
    # guard the dim probe: first() is None on an EMPTY embeddings
    # table, and the pipeline must degrade to empty results (the
    # broadcast shape), not raise before any query logic runs
    dim_row = raw.select(F.size("embedding")).first()
    dim = dim_row[0] if dim_row else 0
    heavy_parts = (
        _nnd_heavy_parts(
            n_vec,
            dim,
            spark.sparkContext.defaultParallelism,
            _broadcast_threshold_bytes(spark),
        )
        if n_vec
        else None
    )
    js = F.array(*[F.lit(j) for j in range(1, _NND_K + 1)])
    lr = (
        _emb(spark, sf_dir)
        .select("vec_id", "label")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("label").orderBy("vec_id")
            )
            - 1,
        )
        .withColumn("bn", F.count(F.lit(1)).over(Window.partitionBy("label")))
    )
    label_ring = (
        lr.withColumn("j", F.explode(js))
        .withColumn("trn", (F.col("rn") + F.col("j")) % F.col("bn"))
        .join(
            lr.select(
                "label",
                F.col("rn").alias("trn"),
                F.col("vec_id").alias("dst"),
            ),
            ["label", "trn"],
        )
        .filter(F.col("vec_id") != F.col("dst"))
        .select(F.col("vec_id").alias("src"), "dst")
    )
    # one-row count broadcast (scalar-subquery shape, allowlisted) so
    # the build stays pure — no driver-side action
    nrow = e.agg(F.count(F.lit(1)).alias("n"))
    global_ring = (
        e.select("vec_id")
        .crossJoin(F.broadcast(nrow))
        .select(
            F.col("vec_id").alias("src"),
            F.explode(
                F.array(
                    *[
                        (F.col("vec_id") + F.lit(j * _NND_STRIDE))
                        % F.col("n")
                        for j in range(1, _NND_K + 1)
                    ]
                )
            ).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
    )
    init = label_ring.union(global_ring).distinct()
    g = _nnd_score_topk(init, e, heavy_parts)
    graphs = [g]
    for _ in range(rounds):
        # Lineage truncation between rounds (the GraphX/Pregel
        # checkpoint discipline for iterative plans): every DataFrame
        # reference to the previous round CLONES its whole logical
        # subtree — und appears 3x per round, so without this the
        # analyzed plan grows ~6x PER ROUND (measured: 2,360 physical
        # nodes and 36 copies of the init subtree for 2 rounds) and the
        # driver, not the cluster, becomes the bottleneck. Each round's
        # edge list is materialized executor-parallel and re-read, so
        # the round plan is constant-size forever.
        edges = detach_result(spark, g.select("src", "dst"))
        und = edges.union(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).distinct()
        a, b = und.alias("a"), und.alias("b")
        two_hop = (
            a.join(b, F.col("a.dst") == F.col("b.src"))
            .select(F.col("a.src").alias("src"), F.col("b.dst").alias("dst"))
            .filter(F.col("src") != F.col("dst"))
        )
        cand = two_hop.union(und).distinct()
        g = _nnd_score_topk(cand, e, heavy_parts)
        graphs.append(g)
    return graphs


@query("vector_nn_descent_graph", oracle=_NND_ORACLE)
def q_nn_descent_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed K-NN graph built by NN-Descent (module comment above);
    the full final edge list is the gated output, so any assignment
    flip at any round anywhere in the graph fails the hash."""
    g = _nnd_final_graph(spark, sf_dir)
    return g.select(
        F.col("src").alias("node_id"),
        F.col("dst").alias("neighbor_id"),
        F.round(F.col("cos"), 4).alias("cosine_sim"),
        F.col("rnk").cast("int").alias("rnk"),
    )


def _nnd_exact_probe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exact top-K (query_id, neighbor_id) ground truth for the
    fixed probe set — the documented kNN-baseline broadcast scan,
    bounded to the probes. ONE definition shared by the recall gate
    and the convergence curve: the tiebreak (cos DESC, neighbor_id),
    the pre-normalized cosine, and the probe bound must match the
    DuckDB ``exact`` CTE bit for bit, and two hand-maintained copies
    of that contract would drift."""
    from pyspark.sql import Window

    e = (
        _emb_s(spark, sf_dir)
        .select("vec_id", as_double("embedding").alias("emb"))
        .withColumn("nrm", norm(F.col("emb")))
    )
    probes = e.filter(F.col("vec_id") < _NND_PROBES).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), "neighbor_id"
    )
    return (
        e.crossJoin(F.broadcast(probes))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine_pre(
                F.col("q_emb"), F.col("emb"), F.col("q_nrm"), F.col("nrm")
            ).alias("cos"),
        )
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _NND_K)
        .select("query_id", "neighbor_id")
    )


@query("vector_nn_descent_recall", oracle=_NND_RECALL_ORACLE)
def q_nn_descent_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@K of the NN-Descent graph against the exact top-K for a
    fixed 50-node probe set — the auditable accuracy claim for the
    graph family, in exact integer space (hits, ppm by integer DIV).
    The exact side is _nnd_exact_probe_pairs; the graph side is pruned
    to probe rows before the join."""
    exact = _nnd_exact_probe_pairs(spark, sf_dir)
    g = (
        _nnd_final_graph(spark, sf_dir)
        .filter(F.col("src") < _NND_PROBES)
        .select(
            F.col("src").alias("query_id"),
            F.col("dst").alias("neighbor_id"),
            F.lit(1).alias("_hit"),
        )
    )
    return (
        exact.join(g, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(F.count("_hit").alias("_hits"))
        .select(
            F.col("query_id").alias("node_id"),
            F.col("_hits").cast("int").alias("n_hits"),
            F.expr(f"_hits * 1000000L div {_NND_K}").alias("recall_ppm"),
        )
    )


# Convergence: the graph family's accuracy story as a CURVE (like the
# IVF recall-vs-probes frontier), not a single point — per-round
# aggregate recall@K over the fixed probe set for init + 3 rounds.
# Integer-exact end to end (total hits, ppm via integer DIV by the
# exact-pair count).

_NND_CONV_ROUNDS = 3

_NND_CONVERGENCE_ORACLE = (
    _NND_GRAPH_CTES
    + f""",
{_nnd_round_sql("g2", "g3", "u3", "c3")},
probes AS (SELECT vec_id, emb FROM e WHERE vec_id < {_NND_PROBES}),
exact AS (
    SELECT query_id, neighbor_id FROM (
        SELECT p.vec_id AS query_id, c.vec_id AS neighbor_id,
               row_number() OVER (
                   PARTITION BY p.vec_id
                   ORDER BY list_cosine_similarity(p.emb, c.emb) DESC,
                            c.vec_id) AS rnk
        FROM probes p JOIN e c ON c.vec_id <> p.vec_id) x
    WHERE rnk <= {_NND_K}
),
denom AS (SELECT count(*) AS n_exact FROM exact),
per_round(round_id, n_hits) AS (
    SELECT 0, count(*) FROM exact ex
        JOIN g0 g ON g.src = ex.query_id AND g.dst = ex.neighbor_id
    UNION ALL SELECT 1, count(*) FROM exact ex
        JOIN g1 g ON g.src = ex.query_id AND g.dst = ex.neighbor_id
    UNION ALL SELECT 2, count(*) FROM exact ex
        JOIN g2 g ON g.src = ex.query_id AND g.dst = ex.neighbor_id
    UNION ALL SELECT 3, count(*) FROM exact ex
        JOIN g3 g ON g.src = ex.query_id AND g.dst = ex.neighbor_id
)
SELECT CAST(round_id AS INT) AS round_id,
       CAST(n_hits AS BIGINT) AS n_hits,
       CAST(n_hits * 1000000 // denom.n_exact AS BIGINT) AS recall_ppm
FROM per_round CROSS JOIN denom
"""
)


@query(
    "ann_nnd_convergence",
    oracle=_NND_CONVERGENCE_ORACLE,
    aliases=("vector_nn_descent_convergence",),
)
def q_nn_descent_convergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@K vs NN-Descent round (0 = scored init ring, then 3
    rounds): the gated monotone accuracy curve for the graph-ANN
    family. Each round's plan stays constant-size via the detached
    per-round edge lists (_nnd_graphs), so extending the curve one
    round costs one more bounded join round, not a deeper lineage.
    tests/test_scale_equivalences.py asserts the sequence is
    non-decreasing and strictly improves over the init ring."""
    # score the probe pairs once, reuse across all four round joins
    exact = detach_result(spark, _nnd_exact_probe_pairs(spark, sf_dir))
    denom = exact.agg(F.count(F.lit(1)).alias("n_exact"))
    per_round = None
    for r, g in enumerate(_nnd_graphs(spark, sf_dir, _NND_CONV_ROUNDS)):
        gp = g.filter(F.col("src") < _NND_PROBES).select(
            F.col("src").alias("query_id"),
            F.col("dst").alias("neighbor_id"),
        )
        hits = exact.join(gp, ["query_id", "neighbor_id"]).agg(
            F.count(F.lit(1)).alias("n_hits")
        )
        row = hits.select(F.lit(r).cast("int").alias("round_id"), "n_hits")
        per_round = row if per_round is None else per_round.unionByName(row)
    return per_round.crossJoin(F.broadcast(denom)).select(
        "round_id",
        "n_hits",
        F.expr("n_hits * 1000000L div n_exact").alias("recall_ppm"),
    )


# --- incremental IVF index maintenance ---------------------------------------
# The index-maintenance shape every 100 TB vector deployment needs:
# history is already indexed (cid-partitioned lists on disk, centroids
# FROZEN from the history-only training pass); a new ingest batch is
# assigned against those frozen centroids and APPENDED into the
# per-cell partitions — history lists are never read, re-assigned, or
# rewritten (test_ivf_incremental_append_leaves_history pins the
# history part-files byte-identical across the append). Per-ingest
# cost is O(batch), exactly like text_line_dedup_incremental /
# sig_index_incremental_lsh on the text side; re-clustering is a
# separate offline decision, not an ingest cost.
#
# The gate probes the MERGED index (history + appended batch) with the
# standard 20 query vectors and partition-prunes to the probed cells —
# reference pattern: vector_index_persist_probe. Batch membership is
# the deterministic modulo split vec_id % 5 == 4 (20% of the corpus,
# interleaved through the id space so probe cells contain both
# generations).

_INC_BATCH_MOD = 5  # vec_id % 5 == 4 -> the "new ingest" fifth


def _ivf_incremental_build(spark: SparkSession, sf_dir: str, base: str):
    """Build the history index, then append the batch. Returns the
    frozen centroids. Split into build/append phases so the
    no-history-rewrite property is testable from outside."""
    e = _emb(spark, sf_dir).select(
        "vec_id", as_double("embedding").alias("emb")
    )
    hist = e.filter(F.col("vec_id") % _INC_BATCH_MOD != _INC_BATCH_MOD - 1)
    c0 = [
        (int(r.vec_id), [float(x) for x in r.emb])
        for r in hist.orderBy("vec_id").limit(N_CLUSTERS).collect()
    ]
    _, c1 = lloyd_iterate(hist, c0, iterations=1)
    _assign(hist, c1).write.mode("overwrite").partitionBy("cid").parquet(
        f"{base}/lists"
    )
    return c1


def _ivf_incremental_append(
    spark: SparkSession, sf_dir: str, base: str, centroids
) -> None:
    """The per-ingest step: assign ONLY the batch against the frozen
    centroids and append — no history scan anywhere in the plan."""
    e = _emb(spark, sf_dir).select(
        "vec_id", as_double("embedding").alias("emb")
    )
    batch = e.filter(F.col("vec_id") % _INC_BATCH_MOD == _INC_BATCH_MOD - 1)
    _assign(batch, centroids).write.mode("append").partitionBy(
        "cid"
    ).parquet(f"{base}/lists")


_INC_IVF_ORACLE = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
hist AS (SELECT * FROM e WHERE vec_id % {_INC_BATCH_MOD} <> {_INC_BATCH_MOD - 1}),
batch AS (SELECT * FROM e WHERE vec_id % {_INC_BATCH_MOD} = {_INC_BATCH_MOD - 1}),
c0 AS (SELECT vec_id AS cid, emb AS cemb FROM hist ORDER BY vec_id LIMIT {N_CLUSTERS}),
{_assign_cte("a1", "c0", fact="hist")},
{_recompute_cte("c1", "a1")},
{_assign_cte("ah", "c1", fact="hist")},
{_assign_cte("ab", "c1", fact="batch")},
merged AS (SELECT * FROM ah UNION ALL SELECT * FROM ab),
q AS (SELECT vec_id, emb, cid FROM merged WHERE vec_id < {N_QUERY_VECTORS}),
scored AS (
    SELECT q.vec_id AS query_id, f.vec_id AS neighbor_id,
           list_cosine_similarity(q.emb, f.emb) AS cos
    FROM q JOIN merged f ON f.cid = q.cid AND f.vec_id <> q.vec_id
),
ranked AS (
    SELECT query_id, neighbor_id, cos,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cos DESC, neighbor_id) AS rnk
    FROM scored
)
SELECT query_id, neighbor_id, round(cos, 4) + 0.0 AS cosine_sim,
       CAST(rnk AS INT) AS rnk
FROM ranked WHERE rnk <= {TOP_K}
"""


@query("vector_index_incremental_append", oracle=_INC_IVF_ORACLE)
def q_ivf_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from pyspark.sql import Window

    base = tempfile.mkdtemp(prefix="dvs_ivfinc_")
    try:
        c1 = _ivf_incremental_build(spark, sf_dir, base)
        _ivf_incremental_append(spark, sf_dir, base, c1)

        # probe the merged on-disk index (same reader discipline as
        # vector_index_persist_probe: partition filter -> only probed
        # cells' files are scanned; norms come from the index)
        index = spark.read.parquet(f"{base}/lists")
        probes = index.filter(F.col("vec_id") < N_QUERY_VECTORS).select(
            F.col("vec_id").alias("query_id"),
            F.col("emb").alias("q_emb"),
            F.col("nrm").alias("q_nrm"),
            F.col("cid").alias("q_cid"),
        )
        probe_cids = sorted(
            {int(r.q_cid) for r in probes.select("q_cid").distinct().collect()}
        )
        lists = index.filter(F.col("cid").isin(probe_cids))
        scored = lists.join(
            F.broadcast(probes),
            (F.col("cid") == F.col("q_cid"))
            & (F.col("vec_id") != F.col("query_id")),
        ).select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine_pre(
                F.col("q_emb"), F.col("emb"), F.col("q_nrm"), F.col("nrm")
            ).alias("cos"),
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("cos").desc(), F.col("neighbor_id")
        )
        out = (
            scored.withColumn("rnk", F.row_number().over(w).cast("int"))
            .filter(F.col("rnk") <= TOP_K)
            .select(
                "query_id",
                "neighbor_id",
                F.round(F.col("cos"), 4).alias("cosine_sim"),
                "rnk",
            )
        )
        return detach_result(spark, out)
    finally:
        shutil.rmtree(base, ignore_errors=True)


# --- binary quantization + Hamming retrieval ----------------------------------
# The 32x-compression retrieval family (binary quantization): each
# dimension contributes its SIGN bit, vectors pack into dim/32 integer
# words, and candidate ranking is Hamming distance — bit_count(xor)
# over the packed words, exact integers on both engines (no float
# crosses the gate). At 100 TB this is the cheapest first-stage
# filter: dim/32 packed words riding in longs (16 bytes/vector for
# dim=64 — 2x the ideal bit footprint, the price of exact long math on
# both engines), SIMD-friendly popcount, and the packed table
# broadcasts where the float table cannot.

_BQ_WORD_BITS = 32  # positive shifts only: 1<<j stays exact on both engines
_BQ_K = 10

#: ONE definition of the sign-bit quantizer for both BQ oracles (the
#: Spark twin is _bq_packed) — and of the exact probe ground truth,
#: shared with the NND recall/convergence oracles' inline copies by
#: TEXT so a drift shows up as a diff, with the Spark twin
#: _nnd_exact_probe_pairs.
_BQ_PACK_SQL = f"""
    SELECT vec_id,
           list_sum(list_transform(range(0, {_BQ_WORD_BITS}),
               j -> CASE WHEN emb[j + 1] > 0
                         THEN (1::BIGINT << j) ELSE 0 END)) AS w0,
           list_sum(list_transform(range(0, {_BQ_WORD_BITS}),
               j -> CASE WHEN emb[j + {_BQ_WORD_BITS} + 1] > 0
                         THEN (1::BIGINT << j) ELSE 0 END)) AS w1
    FROM e"""

_BQ_ORACLE = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
w AS ({_BQ_PACK_SQL}),
probes AS (SELECT vec_id AS query_id, w0 AS q0, w1 AS q1
           FROM w WHERE vec_id < {N_QUERY_VECTORS}),
scored AS (
    SELECT p.query_id, c.vec_id AS neighbor_id,
           bit_count(xor(p.q0, c.w0)) + bit_count(xor(p.q1, c.w1))
               AS hamming
    FROM probes p JOIN w c ON c.vec_id <> p.query_id
)
SELECT query_id, neighbor_id, CAST(hamming AS INT) AS hamming,
       CAST(rnk AS INT) AS rnk
FROM (SELECT query_id, neighbor_id, hamming,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY hamming, neighbor_id) AS rnk
      FROM scored) x
WHERE rnk <= {_BQ_K}
"""


def _bq_packed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, w0, w1): sign bits of the 64-dim embedding packed into
    two 32-bit words riding in longs. The bit loop unrolls to 64
    when-terms in ONE codegen'd projection — narrow map over the scan,
    no Python, no shuffle."""
    emb = F.col("emb")

    def word(w: int) -> Column:
        out = F.lit(0).cast("long")
        for j in range(_BQ_WORD_BITS):
            out = out + F.when(
                F.element_at(emb, w * _BQ_WORD_BITS + j + 1) > 0,
                F.lit(1 << j).cast("long"),
            ).otherwise(F.lit(0).cast("long"))
        return out

    return (
        _emb_s(spark, sf_dir)
        .select("vec_id", as_double("embedding").alias("emb"))
        .select("vec_id", word(0).alias("w0"), word(1).alias("w1"))
    )


def _bq_hamming_ranked(
    spark: SparkSession, sf_dir: str, n_probes: int, max_rank: int
) -> DataFrame:
    """(query_id, neighbor_id, hamming, rnk<=max_rank): the shared BQ
    candidate-generation contract for both gates — broadcast probe
    scan over the packed relation, self-exclusion, xor+popcount
    distance, (hamming, neighbor_id) tiebreak. ONE definition so the
    top-k gate and the recall frontier can never rank differently.

    The exchange after packing is load-bearing: without a
    materialization barrier the 64-term packing expression sits under
    the broadcast join and is re-evaluated PER JOIN-OUTPUT ROW
    (|vectors| x |probes| x 128 element_at — measured 41 s vs 3.8 s at
    the 100x curve point); shuffling the 16-byte packed rows once
    (trivial bytes) pins pack cost at O(|vectors|)."""
    from pyspark.sql import Window

    packed = _bq_packed(spark, sf_dir).repartition(
        spark.sparkContext.defaultParallelism, "vec_id"
    )
    probes = packed.filter(F.col("vec_id") < n_probes).select(
        F.col("vec_id").alias("query_id"),
        F.col("w0").alias("q0"),
        F.col("w1").alias("q1"),
    )
    hamming = (
        F.bit_count(F.col("q0").bitwiseXOR(F.col("w0")))
        + F.bit_count(F.col("q1").bitwiseXOR(F.col("w1")))
    ).cast("int")
    w = Window.partitionBy("query_id").orderBy("hamming", "neighbor_id")
    return (
        packed.crossJoin(F.broadcast(probes))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            hamming.alias("hamming"),
        )
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= max_rank)
    )


@query(
    "ann_bq_hamming_topk",
    oracle=_BQ_ORACLE,
    aliases=("vector_bq_hamming_topk",),
)
def q_bq_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 by Hamming distance over binary-quantized vectors for
    the standard 20-probe set. The packed relation is 16 bytes/vector;
    the probe side broadcasts (same shape as the kNN exact baseline,
    documented NLJ), the distance is two xor+bit_count long ops, and
    the per-probe top-K is one bounded window — integer-exact end to
    end."""
    return _bq_hamming_ranked(
        spark, sf_dir, N_QUERY_VECTORS, _BQ_K
    ).select(
        "query_id",
        "neighbor_id",
        "hamming",
        F.col("rnk").cast("int").alias("rnk"),
    )


# BQ accuracy-cost frontier: Hamming shortlist of size S -> exact
# cosine rerank -> recall@5 vs the exact top-5, for S in
# {10, 25, 50, 100} — the same auditable curve shape as the IVF probe
# frontier and the NN-Descent convergence, in exact integer space.
# Candidates are Hamming-ranked ONCE (score-once discipline); each S
# is a rank filter, not a re-scan.

_BQ_SHORTLISTS = (10, 25, 50, 100)

_BQ_RERANK_ORACLE = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
w AS ({_BQ_PACK_SQL}),
probes AS (SELECT vec_id AS query_id, w0 AS q0, w1 AS q1
           FROM w WHERE vec_id < {_NND_PROBES}),
pe AS (SELECT vec_id, emb FROM e WHERE vec_id < {_NND_PROBES}),
hr AS (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY hamming, neighbor_id) AS hrnk
    FROM (SELECT p.query_id, c.vec_id AS neighbor_id,
                 bit_count(xor(p.q0, c.w0)) + bit_count(xor(p.q1, c.w1))
                     AS hamming
          FROM probes p JOIN w c ON c.vec_id <> p.query_id) hs
),
cosed AS (
    SELECT hr.query_id, hr.neighbor_id, hr.hrnk,
           list_cosine_similarity(pe.emb, ce.emb) AS cos
    FROM hr
    JOIN pe ON pe.vec_id = hr.query_id
    JOIN e ce ON ce.vec_id = hr.neighbor_id
    WHERE hr.hrnk <= {max(_BQ_SHORTLISTS)}
),
sizes(s) AS (VALUES {", ".join(f"({s})" for s in _BQ_SHORTLISTS)}),
sel AS (
    SELECT s, query_id, neighbor_id FROM (
        SELECT sizes.s, c.query_id, c.neighbor_id,
               row_number() OVER (PARTITION BY sizes.s, c.query_id
                                  ORDER BY c.cos DESC, c.neighbor_id) AS rnk
        FROM sizes JOIN cosed c ON c.hrnk <= sizes.s) x
    WHERE rnk <= {_NND_K}
),
exact AS (
    SELECT query_id, neighbor_id FROM (
        SELECT p.vec_id AS query_id, c.vec_id AS neighbor_id,
               row_number() OVER (
                   PARTITION BY p.vec_id
                   ORDER BY list_cosine_similarity(p.emb, c.emb) DESC,
                            c.vec_id) AS rnk
        FROM pe p JOIN e c ON c.vec_id <> p.vec_id) x
    WHERE rnk <= {_NND_K}
),
denom AS (SELECT count(*) AS n FROM exact),
hits AS (
    SELECT sel.s, count(*) AS n
    FROM sel JOIN exact ex
      ON ex.query_id = sel.query_id AND ex.neighbor_id = sel.neighbor_id
    GROUP BY sel.s
)
SELECT CAST(sizes.s AS INT) AS shortlist_size,
       CAST(coalesce(h.n, 0) AS BIGINT) AS n_hits,
       CAST(coalesce(h.n, 0) * 1000000 // d.n AS BIGINT) AS recall_ppm
FROM sizes LEFT JOIN hits h ON h.s = sizes.s CROSS JOIN denom d
"""


@query(
    "ann_bq_rerank_recall",
    oracle=_BQ_RERANK_ORACLE,
    aliases=("vector_bq_rerank_recall",),
)
def q_bq_rerank_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of BQ-shortlist -> exact-cosine-rerank at shortlist
    sizes 10/25/50/100 over the 50-probe set (the same probe set and
    exact ground truth as the NN-Descent gates —
    _nnd_exact_probe_pairs). Hamming candidates are ranked once; each
    shortlist size is a rank filter; the rerank cosine touches at most
    |probes| x max(S) pairs."""
    from pyspark.sql import Window

    hr = _bq_hamming_ranked(
        spark, sf_dir, _NND_PROBES, max(_BQ_SHORTLISTS)
    ).select("query_id", "neighbor_id", F.col("rnk").alias("hrnk"))
    e = (
        _emb(spark, sf_dir)
        .select("vec_id", as_double("embedding").alias("emb"))
        .withColumn("nrm", norm(F.col("emb")))
    )
    pe = e.filter(F.col("vec_id") < _NND_PROBES).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    ce = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("emb").alias("c_emb"),
        F.col("nrm").alias("c_nrm"),
    )
    cosed = (
        hr.join(F.broadcast(pe), "query_id")
        .join(ce, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            "hrnk",
            cosine_pre(
                F.col("q_emb"), F.col("c_emb"),
                F.col("q_nrm"), F.col("c_nrm"),
            ).alias("cos"),
        )
    )
    sizes = F.array(*[F.lit(s) for s in _BQ_SHORTLISTS])
    rw = Window.partitionBy("s", "query_id").orderBy(
        F.col("cos").desc(), "neighbor_id"
    )
    sel = (
        cosed.select(
            "*", F.explode(sizes).alias("s")
        )
        .filter(F.col("hrnk") <= F.col("s"))
        .withColumn("rnk", F.row_number().over(rw))
        .filter(F.col("rnk") <= _NND_K)
        .select("s", "query_id", "neighbor_id")
    )
    exact = _nnd_exact_probe_pairs(spark, sf_dir)
    denom = exact.agg(F.count(F.lit(1)).alias("n_exact"))
    hits = (
        sel.join(exact, ["query_id", "neighbor_id"])
        .groupBy("s")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    sizes_df = spark.createDataFrame(
        [(s,) for s in _BQ_SHORTLISTS], "s int"
    )
    return (
        sizes_df.join(hits, "s", "left")
        .crossJoin(F.broadcast(denom))
        .select(
            F.col("s").cast("int").alias("shortlist_size"),
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_hits"),
            F.expr(
                "coalesce(n, 0L) * 1000000L div n_exact"
            ).alias("recall_ppm"),
        )
    )
