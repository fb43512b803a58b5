"""Relational-surface extensions (SURVEY §2.15): cube / grouping-set
aggregations, lag/lead window functions, approximate distinct."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from divolte_collector_spark.queries import query
from divolte_collector_spark.queries.tpch import cents, sum_money
from divolte_collector_spark.session import load_table, track_persist


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


# --- cube -------------------------------------------------------------------

_CUBE_ORACLE = """
SELECT event_type, CAST(ts AS DATE) AS day,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100 AS sum_value
FROM events
GROUP BY CUBE (event_type, CAST(ts AS DATE))
"""


@query("cube_event_day", oracle=_CUBE_ORACLE)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _events(spark, sf_dir)
        .cube(F.col("event_type"), F.to_date(F.col("ts")).alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            sum_money(cents("value"), 100.0).alias("sum_value"),
        )
    )


# --- lag/lead: dwell time between consecutive events -------------------------

_DWELL_ORACLE = """
WITH seq AS (
    SELECT user_id, event_id, ts,
           lag(ts)  OVER w AS prev_ts,
           lead(event_type) OVER w AS next_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id,
       CAST(count(prev_ts) AS BIGINT) AS n_gaps,
       CAST(coalesce(sum(epoch_ms(ts) - epoch_ms(prev_ts)), 0) AS BIGINT) AS total_dwell_ms,
       CAST(coalesce(sum(CASE WHEN next_type = 'purchase' THEN 1 END), 0) AS BIGINT)
           AS n_before_purchase
FROM seq
GROUP BY user_id
"""


@query("lag_lead_dwell", oracle=_DWELL_ORACLE)
def q_dwell(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = _events(spark, sf_dir).select(
        "user_id",
        "ts",
        F.lag("ts").over(w).alias("prev_ts"),
        F.lead("event_type").over(w).alias("next_type"),
    )
    return seq.groupBy("user_id").agg(
        F.count("prev_ts").alias("n_gaps"),
        F.coalesce(
            F.sum(F.unix_millis(F.col("ts")) - F.unix_millis(F.col("prev_ts"))),
            F.lit(0),
        ).cast("long").alias("total_dwell_ms"),
        F.coalesce(
            F.sum(F.when(F.col("next_type") == "purchase", 1)), F.lit(0)
        ).cast("long").alias("n_before_purchase"),
    )


# --- approximate distinct (HLL) ----------------------------------------------

_APPROX_ORACLE = "SELECT CAST(1 AS BOOLEAN) AS within_tolerance"


@query("approx_distinct_bounds", oracle=_APPROX_ORACLE)
def q_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct sanity: the HLL estimate of distinct users
    must land within 3x Spark's default relative standard deviation
    (rsd 0.05 -> 15%) of the exact count — the 3-sigma bound. A bare
    1-sigma tolerance is NOT a correct assertion: at sf0.1 the
    (deterministic) estimate runs 6.7% off, well inside HLL's design
    accuracy. The sketch itself isn't portable across engines, so the
    oracle checks the bound, honestly labeled."""
    ev = _events(spark, sf_dir)
    agg = ev.agg(
        F.approx_count_distinct("user_id").alias("approx"),
        F.count_distinct("user_id").alias("exact"),
    )
    return agg.select(
        (
            F.abs(F.col("approx") - F.col("exact"))
            <= F.col("exact") * (3 * 0.05)
        ).alias("within_tolerance")
    )


# --- generic range join operator, oracle-gated ------------------------------

_RANGE_JOIN_ORACLE = """
WITH bands AS (
    SELECT b.b AS band_id, b.b * 2000.0 AS lo, (b.b + 1) * 2000.0 AS hi
    FROM (SELECT unnest(range(0, 300)) AS b) b
)
SELECT bd.band_id AS band_id,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100 AS total
FROM orders o
JOIN bands bd ON o.o_totalprice >= bd.lo AND o.o_totalprice < bd.hi
GROUP BY bd.band_id
"""


@query("range_join_price_bands", oracle=_RANGE_JOIN_ORACLE)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/rangejoin.py over generated price bands: each 2000-wide
    band spans 4 buckets of width 500 (exercising multi-bucket
    explosion); the oracle is the plain non-equi BETWEEN join the
    bucket strategy replaces."""
    from divolte_collector_spark.operators.rangejoin import range_join

    o = load_table(spark, sf_dir, "orders").select("o_totalprice")
    bands = spark.range(300).select(
        F.col("id").cast("int").alias("band_id"),
        (F.col("id") * 2000.0).alias("lo"),
        ((F.col("id") + 1) * 2000.0).alias("hi"),
    )
    joined = range_join(
        o, bands, point="o_totalprice", bucket_width=500.0, how="inner"
    )
    return joined.groupBy("band_id").agg(
        F.count(F.lit(1)).alias("n_orders"),
        sum_money(cents("o_totalprice"), 100.0).alias("total"),
    )


# --- skew mitigation: salted two-phase aggregation --------------------------
# A groupBy on a LOW-cardinality key (event_type: a handful of values
# over the whole corpus) concentrates each key's entire volume into
# one reducer task — at 100 TB, four tasks do all the work while the
# other 31,996 idle. Salting splits each hot key across N_SALT
# reducers, then a second, tiny aggregation merges the partials. The
# salt here is the high-cardinality user_id itself — phase 1 groups by
# (key, user): map-side partial agg absorbs the per-user repetition,
# the shuffle spreads each hot key over as many reducers as it has
# users, and the phase-1 output doubles as the DISTINCT step (one row
# per (key, user) makes n_users a plain COUNT in phase 2 — Spark's own
# count-distinct rewrite would add a third exchange). Deterministic,
# so the single-phase oracle predicts it exactly. AQE's skew handling
# covers skewed JOINS; skewed aggregations need this formulation.

_SALTED_ORACLE = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100 AS sum_value
FROM events
GROUP BY event_type
"""


@query(
    "hot_key_salted_agg",
    oracle=_SALTED_ORACLE,
    aliases=("salted_hot_key_agg",),
)
def q_salted_hot_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).select("event_type", "user_id", "value")
    per_user = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum(cents("value")).alias("pv"),
    )
    return per_user.groupBy("event_type").agg(
        F.sum("pn").alias("n_events"),
        F.count(F.lit(1)).alias("n_users"),
        sum_money(F.col("pv"), 100.0).alias("sum_value"),
    )


# --- pivot (conditional aggregation) ----------------------------------------
# groupBy().pivot() with an EXPLICIT value list — at scale the value
# list must always be declared (implicit pivot runs a distinct job
# over the fact table first); with it, the pivot compiles to one
# pass of conditional aggregates, a single shuffle on the grouping
# key, exactly like the hand-written FILTER formulation the oracle
# uses.

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]

_PIVOT_ORACLE = f"""
SELECT CAST(ts AS DATE) AS day,
       {", ".join(
           f"CAST(count(*) FILTER (event_type = '{t}') AS BIGINT) AS {t}"
           for t in _EVENT_TYPES
       )}
FROM events
GROUP BY CAST(ts AS DATE)
"""


@query("pivot_event_type_daily", oracle=_PIVOT_ORACLE)
def q_pivot_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _events(spark, sf_dir)
        .groupBy(F.to_date("ts").alias("day"))
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, _EVENT_TYPES)
    )


# --- the spark.sql() surface ------------------------------------------------
# §2.15 declares the SQL API alongside the DataFrame API — this query
# runs PURE SQL over a registered view (window function + aggregate in
# one statement) so the engine's SQL front door is exercised by the
# gate, not just the DataFrame builder. The statement is portable:
# DuckDB runs the identical text as the oracle.

_SQL_SURFACE = """
SELECT day, event_type, n, CAST(rnk AS INT) AS rnk
FROM (
    SELECT CAST(ts AS DATE) AS day, event_type,
           CAST(count(*) AS BIGINT) AS n,
           rank() OVER (PARTITION BY CAST(ts AS DATE)
                        ORDER BY count(*) DESC, event_type) AS rnk
    FROM {table}
    GROUP BY CAST(ts AS DATE), event_type
) ranked
WHERE rnk <= 2
"""


@query("sql_top_event_types_daily", oracle=_SQL_SURFACE.format(table="events"))
def q_sql_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    _events(spark, sf_dir).createOrReplaceTempView("_sql_events")
    return spark.sql(_SQL_SURFACE.format(table="_sql_events"))


# --- data profiling ---------------------------------------------------------
# The pre-flight a pipeline runs before touching 100 TB: per-column
# null counts, distincts, and ranges in ONE pass (a single partial-agg
# shuffle producing one row — never one job per column).

_PROFILE_ORACLE = """
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(count(DISTINCT event_type) AS BIGINT) AS n_event_types,
       CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS null_event_types,
       CAST(epoch_us(min(ts)) AS BIGINT) AS min_ts_us,
       CAST(epoch_us(max(ts)) AS BIGINT) AS max_ts_us,
       round(min(value), 4) AS min_value,
       round(max(value), 4) AS max_value,
       round(avg(value), 4) AS avg_value
FROM events
"""


@query("profile_events", oracle=_PROFILE_ORACLE)
def q_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return ev.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct("event_type").alias("n_event_types"),
        F.sum(F.when(F.col("event_type").isNull(), 1).otherwise(0)).alias(
            "null_event_types"
        ),
        F.unix_micros(F.min("ts")).alias("min_ts_us"),
        F.unix_micros(F.max("ts")).alias("max_ts_us"),
        F.round(F.min("value"), 4).alias("min_value"),
        F.round(F.max("value"), 4).alias("max_value"),
        F.round(F.avg("value"), 4).alias("avg_value"),
    )


# --- Z-order clustering stats ----------------------------------------------
# Storage-layout primitive for two-dimensional data skipping: linear
# clustering (partition by day, sort by user) gives tight min/max file
# ranges on ONE dimension only; interleaving the bits of (user, day)
# into a Z-value and packing files by Z ranges keeps BOTH dimensions'
# per-file ranges narrow, so predicates on either column prune files.
# The Z-value is a pure map-side expression (16 shift-and-mask terms
# per dimension, no shuffle to compute); the per-file min/max stats
# emitted here are exactly the footer statistics a writer would store
# for skipping. One partial-agg shuffle on the file id. Both engines
# evaluate the same generated bit arithmetic, so the oracle is exact.

_Z_BITS = 5  # per dimension -> 10-bit z-values (32x32 grid)
_Z_FILES = 64

_Z_EPOCH = "DATE '2024-01-01'"


def _z_sql(x: str, y: str) -> str:
    """DuckDB bit-interleave: sum of disjoint shifted bits (== OR)."""
    terms = [f"((({x} >> {i}) & 1) << {2 * i})" for i in range(_Z_BITS)]
    terms += [f"((({y} >> {i}) & 1) << {2 * i + 1})" for i in range(_Z_BITS)]
    return " + ".join(terms)


_Z_WIDTH = (1 << (2 * _Z_BITS)) // _Z_FILES

_ZORDER_ORACLE = f"""
WITH pts AS (
    SELECT user_id % {1 << _Z_BITS} AS x,
           datediff('day', {_Z_EPOCH}, CAST(ts AS DATE)) % {1 << _Z_BITS} AS y
    FROM events
),
z AS (SELECT x, y, ({_z_sql('x', 'y')}) // {_Z_WIDTH} AS file_id FROM pts)
SELECT CAST(file_id AS BIGINT) AS file_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(min(x) AS BIGINT) AS min_user, CAST(max(x) AS BIGINT) AS max_user,
       CAST(min(y) AS BIGINT) AS min_day, CAST(max(y) AS BIGINT) AS max_day
FROM z GROUP BY file_id
"""


@query("zorder_file_stats", oracle=_ZORDER_ORACLE)
def q_zorder_file_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    x = F.pmod(F.col("user_id"), F.lit(1 << _Z_BITS)).cast("long")
    y = F.pmod(
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")),
        F.lit(1 << _Z_BITS),
    ).cast("long")
    pts = ev.select(x.alias("x"), y.alias("y"))
    bit = lambda c, i, j: F.shiftleft(  # noqa: E731
        F.shiftright(F.col(c), i).bitwiseAND(F.lit(1)), j
    )
    zval = None
    for i in range(_Z_BITS):
        for term in (bit("x", i, 2 * i), bit("y", i, 2 * i + 1)):
            zval = term if zval is None else (zval + term)
    return (
        pts.withColumn("file_id", F.floor(zval / _Z_WIDTH).cast("long"))
        .groupBy("file_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("x").alias("min_user"), F.max("x").alias("max_user"),
            F.min("y").alias("min_day"), F.max("y").alias("max_day"),
        )
    )


# --- exact equi-depth histogram over the distributed prefix scan ------------
# Equi-depth (equal-count) histograms are what optimizers and data
# profilers actually want, but the exact formulation is ntile() over a
# GLOBAL order — a single window task at scale. This rides
# operators/prefixsum.py instead: cumulative row counts come from the
# two-phase scan (bucketed by a monotone value band), and the depth
# bucket is ceil(cum * B / N). The default RANGE window frame makes
# value-ties peers that share one cumulative count on BOTH engines,
# so tie handling is deterministic and identical. One aggregation
# shuffle + one banded window; the only driver state is the band
# totals.

_ED_BUCKETS = 8
_ED_BAND = 25.0  # value units per scan band


_EQUIDEPTH_ORACLE = f"""
WITH c AS (
    SELECT value,
           sum(1) OVER (ORDER BY value) AS cum,
           (SELECT count(*) FROM events) AS n
    FROM events
),
b AS (
    SELECT value, CAST(ceil(cum * {_ED_BUCKETS} / n) AS BIGINT) AS bucket
    FROM c
)
SELECT bucket, CAST(count(*) AS BIGINT) AS n_events,
       round(min(value), 4) AS lo, round(max(value), 4) AS hi
FROM b GROUP BY bucket
"""


@query("value_equidepth_histogram", oracle=_EQUIDEPTH_ORACLE)
def q_value_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from divolte_collector_spark.operators.prefixsum import global_cumsum

    ev = _events(spark, sf_dir).select(
        "value", F.lit(1).cast("long").alias("_one")
    )
    n = ev.count()
    band = F.floor(F.col("value") / _ED_BAND).cast("long")
    c = global_cumsum(ev, "value", "_one", bucket=band)
    bucket = F.ceil(F.col("cumsum") * _ED_BUCKETS / F.lit(n)).cast("long")
    return (
        c.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.min("value"), 4).alias("lo"),
            F.round(F.max("value"), 4).alias("hi"),
        )
    )


# --- RFM user segmentation --------------------------------------------------
# The classic recency/frequency/monetary marketing segmentation over
# the event stream: one aggregation shuffle compresses events to a
# per-user row, then each quintile comes from the TWO-PHASE global
# scan (operators/prefixsum.py) — exact global rank via a bucketed,
# PARTITIONED window plus driver-prefixed offsets, ntile(5) derived
# closed-form from (rank, n_users). A literal `ntile OVER (ORDER BY
# …)` would collapse the user dimension into one window task; at 1B
# users that single sort is the scale-killer, and "users ≪ events"
# only shrinks it, never bounds it. The coarse keys (recency_days has
# ~hundreds of distinct values) are tie-subdivided by a monotone
# user_id byte-prefix so no window partition inherits a whole tie
# group. Monetary rides integer cents (sum of exact longs), the
# cross-engine-exact trick the bot-score query established: a double
# SUM's addition order can drift in the last ulp between engines, an
# integer sum cannot.

_RFM_ORACLE = """
WITH u AS (
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS frequency,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS monetary_cents,
           max(ts) AS last_ts
    FROM events GROUP BY user_id
),
g AS (SELECT max(ts) AS gmax FROM events),
r AS (
    SELECT user_id, frequency, monetary_cents,
           CAST(date_diff('day', CAST(last_ts AS DATE), CAST(g.gmax AS DATE))
                AS INT) AS recency_days
    FROM u, g
),
s AS (
    SELECT *,
           CAST(ntile(5) OVER (ORDER BY recency_days DESC, user_id) AS INT)
               AS r_score,
           CAST(ntile(5) OVER (ORDER BY frequency ASC, user_id) AS INT)
               AS f_score,
           CAST(ntile(5) OVER (ORDER BY monetary_cents ASC, user_id) AS INT)
               AS m_score
    FROM r
)
SELECT user_id, recency_days, frequency, monetary_cents,
       r_score, f_score, m_score,
       CASE WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4
                THEN 'champion'
            WHEN r_score >= 4 AND f_score >= 3 THEN 'loyal'
            WHEN r_score <= 2 AND m_score >= 4 THEN 'at_risk_spender'
            WHEN r_score <= 2 THEN 'lapsed'
            ELSE 'regular' END AS segment
FROM s
"""


# Rotated into the driver-checked 50-name window in round 12 (the
# round-11 rewrite had only ever been verified by the in-repo sweep):
# renamed from `user_rfm_segments`, which stays resolvable as an alias.
@query(
    "agg_user_rfm_segments",
    oracle=_RFM_ORACLE,
    cache_plan=True,
    aliases=("user_rfm_segments",),
)
def q_user_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from divolte_collector_spark.operators.prefixsum import (
        global_row_number,
        ntile_from_rank,
    )

    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("frequency"),
        F.sum(cents("value")).alias("monetary_cents"),
        F.max("ts").alias("last_ts"),
    )
    g = ev.agg(F.max("ts").alias("gmax"))
    r = track_persist(  # three rank scans + the assembly spine read it
        u.crossJoin(F.broadcast(g)).select(
            "user_id", "frequency", "monetary_cents",
            F.datediff(F.to_date("gmax"), F.to_date("last_ts"))
            .cast("int")
            .alias("recency_days"),
        )
    )
    # the tie key is the numeric user id itself — already monotone;
    # a string id would ride str_prefix_long instead
    uid_slice = F.col("user_id")
    s = r
    for key, descending, score in (
        ("recency_days", True, "r_score"),
        ("frequency", False, "f_score"),
        ("monetary_cents", False, "m_score"),
    ):
        kcol = F.col(key)
        # memo: the rank-scan input is a pure function of the events
        # table, so the span+totals jobs run once per (app, table
        # generation) — a repeated build (plan cache off, bench
        # --cold) skips all three pairs of eager collects
        ranked, n = global_row_number(
            r.select("user_id", key),
            [kcol.desc() if descending else kcol.asc(), F.col("user_id")],
            (-kcol) if descending else kcol,
            tie_bucket_by=uid_slice,
            out_col="_rank",
            memo=(f"{sf_dir}/events.parquet", f"rfm:{key}"),
        )
        # join back on the unique user key: the rank scans run on slim
        # 2-column projections of the persisted aggregate, and the
        # score joins all share one user_id partitioning
        s = s.join(
            ranked.select(
                "user_id",
                ntile_from_rank(F.col("_rank"), n, 5).alias(score),
            ),
            "user_id",
        )
    seg = (
        F.when(
            (F.col("r_score") >= 4)
            & (F.col("f_score") >= 4)
            & (F.col("m_score") >= 4),
            "champion",
        )
        .when((F.col("r_score") >= 4) & (F.col("f_score") >= 3), "loyal")
        .when(
            (F.col("r_score") <= 2) & (F.col("m_score") >= 4),
            "at_risk_spender",
        )
        .when(F.col("r_score") <= 2, "lapsed")
        .otherwise("regular")
    )
    return s.select(
        "user_id", "recency_days", "frequency", "monetary_cents",
        "r_score", "f_score", "m_score", seg.alias("segment"),
    )


# --- quantile sketch with deterministic error bounds ------------------------
# percentile_approx is Spark's Greenwald-Khanna-style mergeable
# quantile sketch — the only way to get percentiles at 100 TB without
# a global sort. GK's guarantee is DETERMINISTIC rank error <=
# n/accuracy, so the honest cross-engine assertion (the sketch bytes
# aren't portable) is: the approximate value must lie between the
# EXACT percentiles at q +/- eps (eps = 2/accuracy for boundary
# slack). The exact interpolated percentiles themselves ARE portable
# and are hash-checked; the bound booleans gate the sketch. Same
# honest-labeling pattern as approx_distinct_bounds.

_QSK_QS = (0.25, 0.5, 0.75, 0.9, 0.99)
_QSK_ACC = 1000
_QSK_EPS = 2.0 / _QSK_ACC

_QSK_ORACLE = " UNION ALL ".join(
    f"""SELECT CAST({q} AS DOUBLE) AS q,
       round(quantile_cont(value, {q}), 6) AS exact_value,
       CAST(1 AS BOOLEAN) AS within_bounds
FROM events"""
    for q in _QSK_QS
)


@query("value_quantile_sketch", oracle=_QSK_ORACLE)
def q_value_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    qs = list(_QSK_QS)
    lo = [max(0.0, q - _QSK_EPS) for q in qs]
    hi = [min(1.0, q + _QSK_EPS) for q in qs]
    agg = ev.agg(
        F.percentile("value", F.array(*[F.lit(q) for q in qs])).alias("ex"),
        F.percentile_approx(
            "value", F.array(*[F.lit(q) for q in qs]), F.lit(_QSK_ACC)
        ).alias("ap"),
        F.percentile("value", F.array(*[F.lit(q) for q in lo])).alias("exlo"),
        F.percentile("value", F.array(*[F.lit(q) for q in hi])).alias("exhi"),
    )
    rows = agg.select(
        F.posexplode(F.array(*[F.lit(q) for q in qs])).alias("i", "q"),
        "ex", "ap", "exlo", "exhi",
    )
    pick = lambda c: F.element_at(F.col(c), F.col("i") + 1)  # noqa: E731
    return rows.select(
        "q",
        F.round(pick("ex"), 6).alias("exact_value"),
        (
            (pick("ap") >= pick("exlo")) & (pick("ap") <= pick("exhi"))
        ).alias("within_bounds"),
    )


# --- co-visitation matrix (recommender candidate generation) ----------------
# The classic recsys candidate generator: parts that appear in the
# same order co-occur; the top co-visited parts per anchor are the
# retrieval candidates. Shape: a SELF-EQUI-JOIN on the order key (per-
# order pair fan-out is bounded by basket size, ~7 lineitems in this
# schema, so the join output is O(orders * basket^2), never O(n^2)),
# then one aggregation shuffle on the pair and a per-anchor top-k
# window over the aggregated counts. This is exactly the plan that
# holds at 100 TB — the quadratic term is per-basket, and the pair
# aggregation is the only wide state.

_COVIS_TOP = 5

_COVIS_ORACLE = f"""
WITH pairs AS (
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
    FROM lineitem a JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
counts AS (
    SELECT part_a, part_b, CAST(count(*) AS BIGINT) AS n_co
    FROM pairs GROUP BY part_a, part_b
)
SELECT part_a, part_b, n_co, CAST(rnk AS INT) AS rnk
FROM (
    SELECT *, row_number() OVER (
        PARTITION BY part_a ORDER BY n_co DESC, part_b
    ) AS rnk FROM counts
)
WHERE rnk <= {_COVIS_TOP}
"""


@query("recsys_covisitation", oracle=_COVIS_ORACLE)
def q_recsys_covisitation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    a = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_a")
    )
    # merge hint: the self-join sides grow with the table, so any
    # broadcast threshold is eventually wrong on BOTH ends — under it
    # the build side is a whole table copy per task (measured 17.2 s at
    # 10x volume where the 6M-row side still slid under the 64 MB
    # threshold vs 3.4 s co-partitioned), over it the planner falls
    # back anyway. Pinning sort-merge gives the one plan that holds at
    # every volume: one exchange per side on the order key and
    # spill-safe sorts (measured >= broadcast even at 1x: 1.5 s vs 2.1).
    b = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_b")
    ).hint("merge")
    counts = (
        a.join(b, "ok")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_co"))
    )
    w = Window.partitionBy("part_a").orderBy(F.desc("n_co"), "part_b")
    return (
        counts.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= _COVIS_TOP)
        .select("part_a", "part_b", "n_co", "rnk")
    )


# --- volume anomaly detection (3-sigma on daily counts) ---------------------
# Ops monitoring over the event stream: per event type, flag days
# whose volume departs the type's daily mean by more than 3 population
# standard deviations. Two bounded aggregations (events -> daily
# counts -> per-type moments); the sigma test is pure INTEGER
# arithmetic — |c - s/n| > 3*sigma is algebraically
# (n*c - s)^2 > 9*(n*ssq - s^2), every term an exact BIGINT — so both
# engines decide identically with no float in sight.

_ANOMALY_ORACLE = """
WITH daily AS (
    SELECT event_type, CAST(ts AS DATE) AS day,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events GROUP BY 1, 2
),
m AS (
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           sum(n_events) AS s,
           sum(n_events * n_events) AS ssq
    FROM daily GROUP BY event_type
)
SELECT d.event_type, d.day, d.n_events,
       ((CAST(m.n AS HUGEINT) * d.n_events - m.s)
        * (CAST(m.n AS HUGEINT) * d.n_events - m.s)
        > 9 * (CAST(m.n AS HUGEINT) * m.ssq
               - CAST(m.s AS HUGEINT) * m.s)) AS is_anomaly
FROM daily d JOIN m ON m.event_type = d.event_type
"""


@query("volume_anomaly_days", oracle=_ANOMALY_ORACLE)
def q_volume_anomaly_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    m = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_events").alias("s"),
        F.sum(F.col("n_events") * F.col("n_events")).alias("ssq"),
    )
    j = daily.join(F.broadcast(m), "event_type")
    # decimal(38,0) intermediates: n*ssq and dev^2 wrap a 64-bit long at
    # realistic daily volumes (the oracle side computes in HUGEINT)
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    dev = dec(F.col("n")) * F.col("n_events") - F.col("s")
    return j.select(
        "event_type", "day", "n_events",
        (
            dev * dev
            > 9 * (dec(F.col("n")) * F.col("ssq") - dec(F.col("s")) * F.col("s"))
        ).alias("is_anomaly"),
    )


# --- winsorized statistics --------------------------------------------------
# Robust summary stats with tail clipping at the exact 1st/99th
# percentiles: the standard pre-normalization step before feeding a
# numeric feature to training. Values ride as integer cents and the
# clip bounds are snapped to integers (ceil/floor of the interpolated
# percentile), so every sum is exact integer arithmetic — no
# summation-order drift between engines. One global aggregate for the
# bounds (driver-scalar-free: a one-row broadcast), one pass to clip
# and summarize.

_WINSOR_ORACLE = """
WITH c AS (
    SELECT CAST(round(value * 100) AS BIGINT) AS cents FROM events
),
b AS (
    SELECT CAST(ceil(quantile_cont(cents, 0.01)) AS BIGINT) AS lo,
           CAST(floor(quantile_cont(cents, 0.99)) AS BIGINT) AS hi
    FROM c
)
SELECT CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN cents < lo THEN 1 ELSE 0 END) AS BIGINT)
           AS n_clipped_lo,
       CAST(sum(CASE WHEN cents > hi THEN 1 ELSE 0 END) AS BIGINT)
           AS n_clipped_hi,
       min(b.lo) AS lo_cents, min(b.hi) AS hi_cents,
       round(CAST(sum(least(greatest(cents, lo), hi)) AS DOUBLE)
             / count(*) / 100.0, 6) AS winsorized_mean
FROM c, b
"""


@query("value_winsorized_stats", oracle=_WINSOR_ORACLE)
def q_value_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    c = ev.select(cents("value").alias("cents"))
    b = c.agg(
        F.ceil(F.percentile("cents", F.lit(0.01))).cast("long").alias("lo"),
        F.floor(F.percentile("cents", F.lit(0.99))).cast("long").alias("hi"),
    )
    j = c.crossJoin(F.broadcast(b))
    clipped = F.least(F.greatest(F.col("cents"), F.col("lo")), F.col("hi"))
    return j.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("cents") < F.col("lo")).cast("long")).alias(
            "n_clipped_lo"
        ),
        F.sum((F.col("cents") > F.col("hi")).cast("long")).alias(
            "n_clipped_hi"
        ),
        F.min("lo").alias("lo_cents"),
        F.min("hi").alias("hi_cents"),
        F.round(
            F.sum(clipped.cast("decimal(38,0)")).cast("double")
            / F.count(F.lit(1)) / 100.0, 6
        ).alias("winsorized_mean"),
    )


# --- weekly cohort retention matrix -----------------------------------------
# The product-analytics staple: bucket users by first-seen week (the
# cohort), then count how many are still active N weeks later. Two
# aggregations bound the whole thing — first-seen per user (one
# shuffle on user_id), then the (cohort, offset) matrix over the
# user-week relation joined to its own cohort assignment (broadcast:
# the per-user cohort relation is user-dimension-sized). Weeks are
# integer day-arithmetic (epoch days // 7), so no engine's week-of-
# year convention is involved.

_COHORT_ORACLE = """
WITH uw AS (
    SELECT DISTINCT user_id,
           CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7
                AS BIGINT) AS week
    FROM events
),
first_seen AS (
    SELECT user_id, min(week) AS cohort_week FROM uw GROUP BY user_id
)
SELECT f.cohort_week,
       CAST(uw.week - f.cohort_week AS BIGINT) AS offset_weeks,
       CAST(count(*) AS BIGINT) AS n_active
FROM uw JOIN first_seen f ON f.user_id = uw.user_id
GROUP BY 1, 2
"""


@query("weekly_cohort_retention", oracle=_COHORT_ORACLE)
def q_weekly_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    uw = ev.select(
        "user_id",
        F.floor(F.unix_date(F.to_date("ts")) / 7).cast("long").alias("week"),
    ).distinct()
    first_seen = uw.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    # plain shuffle join on user_id: first_seen is user-dimension-
    # sized, which GROWS with the table — broadcasting it caps scale
    return (
        uw.join(first_seen, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).cast("long").alias(
                "offset_weeks"
            ),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


# --- activity-concentration diagnostics (Gini over per-user volume) ---------
# The skew DIAGNOSTIC that motivates the salted formulations: how
# concentrated is event volume across users? Gini over per-user event
# counts via the sorted-rank formula G = (2*sum(i*c_i)/(n*sum(c)) -
# (n+1)/n), computed with INTEGER sums over the user aggregate. The
# exact global rank i comes from the two-phase scan
# (operators/prefixsum.py global_row_number) — a literal row_number
# OVER (ORDER BY c, user_id) is one window task over ALL users, the
# exact single-sort trap this query exists to diagnose. Per-user
# counts are Zipf-coarse (millions of users share c=1), so the rank
# scan tie-subdivides each count bucket by a monotone user_id
# byte-prefix; the rank-sum formula is invariant to the (count,
# user_id) tie order either way.

_GINI_ORACLE = """
WITH per_user AS (
    SELECT user_id, CAST(count(*) AS BIGINT) AS c
    FROM events GROUP BY user_id
),
ranked AS (
    SELECT c, CAST(row_number() OVER (ORDER BY c, user_id) AS BIGINT) AS i
    FROM per_user
),
agg AS (
    SELECT CAST(count(*) AS HUGEINT) AS n,
           CAST(sum(c) AS HUGEINT) AS t,
           CAST(sum(CAST(i AS HUGEINT) * c) AS HUGEINT) AS s,
           max(c) AS mx
    FROM ranked
)
SELECT CAST(n AS BIGINT) AS n_users,
       CAST(t AS BIGINT) AS n_events,
       mx AS max_user_events,
       CAST((2 * (2 * s - t * (n + 1)) * 1000000 + n * t)
            // (2 * n * t) AS DOUBLE) / 1000000.0 AS gini
FROM agg
"""


# Rotated into the driver-checked window in round 12 alongside
# agg_user_rfm_segments (same rationale; former name aliased).
@query(
    "agg_user_activity_gini",
    oracle=_GINI_ORACLE,
    cache_plan=True,
    aliases=("user_activity_gini",),
)
def q_user_activity_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    from divolte_collector_spark.operators.prefixsum import global_row_number

    ev = load_table(spark, sf_dir, "events")
    per_user = track_persist(  # span/totals probes + the ranked scan
        ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("c"))
    )
    ranked, _ = global_row_number(
        per_user,
        [F.col("c").asc(), F.col("user_id")],
        F.col("c"),
        tie_bucket_by=F.col("user_id"),  # numeric id: monotone as-is
        out_col="i",
        memo=(f"{sf_dir}/events.parquet", "gini:c"),
    )
    ranked = ranked.select("c", "i")
    # gini = (2S - T(n+1)) / (nT) with S, T, n exact integers, and the
    # 6-decimal rounding ALSO in integer space (the sum_money
    # discipline, tpch.py:50-72): scaled = (2*A*10^6 + B) div (2*B)
    # with A = 2S - T(n+1) >= 0 and B = nT > 0 is exact HALF_UP —
    # `div` is exact integral division, whereas a decimal `/` would
    # pre-round the quotient to scale 6 and can flip the floor at a
    # representation boundary. The final int/10^6 double division is
    # bit-identical in any IEEE engine; nothing float-space remains
    # for a DuckDB/Spark round() implementation to disagree on.
    agg = ranked.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("c").alias("n_events"),
        F.max("c").alias("max_user_events"),
        F.sum(F.col("i").cast("decimal(38,0)") * F.col("c")).alias("_s"),
    )
    dec_n = "CAST(n_users AS DECIMAL(38,0))"
    dec_t = "CAST(n_events AS DECIMAL(38,0))"
    return agg.select(
        "n_users",
        "n_events",
        "max_user_events",
        (
            F.expr(
                f"(2 * (2 * _s - {dec_t} * (n_users + 1)) * 1000000"
                f" + {dec_n} * {dec_t}) div (2 * {dec_n} * {dec_t})"
            ).cast("double")
            / F.lit(1000000.0)
        ).alias("gini"),
    )


# --- per-user journey Markov transition matrix ------------------------------

_TRANSITION_ORACLE = """
WITH ordered AS (
    SELECT user_id, event_type,
           lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) AS next_type
    FROM events WHERE event_type IS NOT NULL
),
edges AS (
    SELECT event_type AS from_type, next_type AS to_type,
           CAST(count(*) AS BIGINT) AS n
    FROM ordered WHERE next_type IS NOT NULL
    GROUP BY event_type, next_type
),
totals AS (
    SELECT from_type, sum(n) AS total FROM edges GROUP BY from_type
)
SELECT e.from_type, e.to_type, e.n,
       round(CAST(e.n AS DOUBLE) / t.total, 6) AS p
FROM edges e JOIN totals t USING (from_type)
"""


@query("session_transition_matrix", oracle=_TRANSITION_ORACLE)
def q_session_transition_matrix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    journeys: P(next event type | event type) from lead() pairs.

    Scale shape: ONE shuffle on user_id for the per-user lead window
    (the same partitioning sessionization uses — on a party-clustered
    layout it is exchange-free), then an edge aggregation whose output
    is bounded by |event types|^2; probabilities are exact integer
    ratios divided once, so no summation-order drift exists."""
    # event_type is nullable by schema; the null-vs-concat semantics of
    # the two engines differ (|| propagates NULL, concat_ws skips it),
    # so both sides drop null-typed events identically
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        ev.select(
            "user_id",
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wt = Window.partitionBy("from_type")
    return edges.select(
        "from_type",
        "to_type",
        "n",
        F.round(
            F.col("n").cast("double") / F.sum("n").over(wt), 6
        ).alias("p"),
    )


# --- PageRank over the co-purchase item graph (2 unrolled iterations) -------
# The iterative-algorithm family member next to connected components
# and the BPE/Lloyd loops: each PageRank iteration is ONE edge join +
# ONE grouped fold; two iterations are unrolled so the loop shape is
# proven under the oracle, not just the first step. The graph is the
# per-basket co-purchase relation — the self-join is per-order
# bounded (the recsys_covisitation discipline), never corpus-wide.

_PAGERANK_ORACLE = """
WITH pairs AS (
    SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
    FROM lineitem a JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
),
nn AS (SELECT count(DISTINCT src) AS n FROM pairs),
deg AS (
    SELECT src, CAST(count(*) AS BIGINT) AS outdeg
    FROM pairs GROUP BY src
),
c0 AS (SELECT d.src, (1.0 / nn.n) / d.outdeg AS c FROM deg d, nn),
pr1 AS (
    SELECT p.dst AS id,
           0.15 / nn.n
           + 0.85 * list_reduce(list(c0.c ORDER BY p.src),
                                (a, b) -> a + b) AS pr
    FROM pairs p JOIN c0 ON c0.src = p.src, nn
    GROUP BY p.dst, nn.n
),
c1 AS (
    SELECT pr1.id AS src, pr1.pr / d.outdeg AS c
    FROM pr1 JOIN deg d ON d.src = pr1.id
),
pr2 AS (
    SELECT p.dst AS id,
           0.15 / nn.n
           + 0.85 * list_reduce(list(c1.c ORDER BY p.src),
                                (a, b) -> a + b) AS pr
    FROM pairs p JOIN c1 ON c1.src = p.src, nn
    GROUP BY p.dst, nn.n
)
SELECT pr2.id AS part_id, d.outdeg, round(pr2.pr, 8) AS pagerank
FROM pr2 JOIN deg d ON d.src = pr2.id
"""


@query("recsys_item_pagerank", oracle=_PAGERANK_ORACLE)
def q_recsys_item_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two unrolled PageRank iterations (d=0.85) over the undirected
    co-purchase item graph.

    Scale shape: edges come from the per-order self-join (bounded per
    basket); every iteration is one equi-join of the edge relation
    with the current rank vector plus one grouped fold; in-neighbor
    contributions fold in source-id order so both engines add the
    same doubles in the same sequence; the node count is a one-row
    broadcast (scalar-subquery shape). The symmetric edge set has no
    dangling nodes, so no teleport-mass correction term is needed."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    a = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("src")
    )
    b = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("dst")
    )
    # the distinct self-join is the dominant cost and feeds SIX
    # consumers (nn, deg, both fold steps' joins, and deg's reuse in
    # c1 + the final join) — persist so it executes once (the repo's
    # multi-consumer convention; without it the whole subtree re-ran
    # per consumer: 22 s -> ~5 s at sf0.1). SHUFFLE_HASH on the
    # per-order self-join: sort-merge sorts BOTH 600k-row sides by
    # order key before joining (measured 2.68 s; hash build 0.69 s) —
    # the build side is one AQE-sized partition of (order, part)
    # pairs, bounded at any scale (guide §3.1).
    #
    # repartition("src") BEFORE the distinct: HashPartitioning(src)
    # satisfies the (src, dst) distinct's clustering (subset of keys),
    # deg's groupBy(src), nn's count_distinct(src) partial dedup, AND
    # both fold joins on src — so the persisted relation is exchanged
    # ONCE and every downstream consumer reads it in place (guide §2.4
    # "share one exchange"). Without it the distinct partitions on
    # (src, dst), which satisfies nothing downstream, and each fold
    # re-exchanged + sorted the 2.39M-row edge relation (interleaved
    # A/B at sf0.1: 10.5/5.4/4.3 s -> 5.2/3.7/2.8 s).
    pairs = track_persist(
        a.join(b.hint("shuffle_hash"), "ok")
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .repartition("src")
        .distinct()
    )
    nn = pairs.agg(F.count_distinct("src").alias("n"))
    deg = track_persist(
        pairs.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    )

    def fold_contribs(df):
        """one PageRank step: join contributions, ordered-fold per dst.

        SHUFFLE_HASH build of the rank vector (|nodes| rows, bounded
        by the part dimension): the persisted edge relation streams
        through in place — no broadcast (the node dimension grows with
        the data, so a broadcast hint would stop fitting at scale) and
        no sort/exchange of the wide side."""
        return (
            pairs.join(df.hint("shuffle_hash"), "src")
            .groupBy("dst")
            .agg(
                F.aggregate(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("src", "c"))),
                        lambda s: s["c"],
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ).alias("fold")
            )
            .crossJoin(F.broadcast(nn))
            .select(
                F.col("dst").alias("id"),
                (0.15 / F.col("n") + 0.85 * F.col("fold")).alias("pr"),
            )
        )

    c0 = deg.crossJoin(F.broadcast(nn)).select(
        "src", ((F.lit(1.0) / F.col("n")) / F.col("outdeg")).alias("c")
    )
    pr1 = fold_contribs(c0)
    c1 = pr1.join(deg, pr1.id == deg.src).select(
        "src", (F.col("pr") / F.col("outdeg")).alias("c")
    )
    pr2 = fold_contribs(c1)
    return pr2.join(deg, pr2.id == deg.src).select(
        F.col("id").alias("part_id"),
        "outdeg",
        F.round("pr", 8).alias("pagerank"),
    )


# --- top journey paths (order-3 n-grams over per-user event streams) --------

_TOP_PATHS_ORACLE = """
WITH ordered AS (
    SELECT user_id, event_type,
           lead(event_type, 1) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS t2,
           lead(event_type, 2) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS t3
    FROM events WHERE event_type IS NOT NULL
),
paths AS (
    SELECT event_type || '>' || t2 || '>' || t3 AS path,
           CAST(count(*) AS BIGINT) AS n
    FROM ordered WHERE t3 IS NOT NULL
    GROUP BY 1
)
SELECT path, n, CAST(rnk AS INT) AS rnk
FROM (SELECT path, n,
             row_number() OVER (ORDER BY n DESC, path) AS rnk
      FROM paths) z
WHERE rnk <= 20
"""


@query("session_top_paths", oracle=_TOP_PATHS_ORACLE)
def q_session_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 20 most common 3-step journey patterns. One user-partitioned
    window (two leads share it), a path aggregate bounded by
    |event types|^3, and TakeOrdered for the top-k — the global rank
    window runs over only the 20 survivors."""
    # null event types dropped on both sides (see transition matrix)
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    paths = (
        ev.select(
            F.col("event_type").alias("t1"),
            F.lead("event_type", 1).over(w).alias("t2"),
            F.lead("event_type", 2).over(w).alias("t3"),
        )
        .filter(F.col("t3").isNotNull())
        .select(
            F.concat_ws(">", "t1", "t2", "t3").alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    top = paths.orderBy(F.desc("n"), "path").limit(20)
    wr = Window.orderBy(F.desc("n"), "path")
    return top.withColumn("rnk", F.row_number().over(wr).cast("int"))
