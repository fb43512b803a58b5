"""Relational analytics over the TPC-H-ish star schema (SURVEY.md §2.15).

These are pass-throughs to Spark built-ins by design — the engine's
declared relational surface (projections, filters, joins of all
strategies, aggregation incl. rollup, windows, top-k).  The value here
is the *plans*: dimensions broadcast, facts shuffle on join keys only
when required, filters reach the parquet scan.

Float discipline: every floating aggregate is rounded in BOTH engines
(round(x, 2|3)) so summation-order differences between Spark's partial
aggregation and DuckDB's single-node sum cannot flip the value hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from divolte_collector_spark.queries import query
from divolte_collector_spark.session import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --- exact money arithmetic --------------------------------------------------
# Every money column in the schema is 2-decimal (verified: the max
# deviation of value*100 from an integer is ~1e-9 across all tables).
# A double SUM adds in engine-specific order, and at sf0.1 one revenue
# group landed on a half-cent boundary where Spark's and DuckDB's
# round(,2) disagreed (q9, round 4). All revenue/price sums therefore
# run in exact integers — cents, cents x discount-percent (e4), or
# cents x discount x tax (e6) — and divide back down once, after the
# aggregation. The SUM itself accumulates as decimal(38,0), not long:
# a long sum of e6 units (~1e11/row) wraps silently past 2^63 at a few
# hundred million rows per group, exactly the volumes the exactness
# claim is for, while DuckDB's sum(BIGINT) auto-promotes to HUGEINT —
# decimal(38,0) keeps both engines exact to 1e38.

def cents(col: str):
    return F.round(F.col(col) * 100).cast("long")


def rev_e4():
    """l_extendedprice * (1 - l_discount) in exact ten-thousandths."""
    return cents("l_extendedprice") * (100 - cents("l_discount"))


def sum_money(int_expr, scale: float, nd: int = 2):
    """Exact money aggregation: the sum runs in integer sub-cent units
    (decimal(38,0) accumulator — a long wraps past 2^63 at scale while
    DuckDB promotes to HUGEINT), and the ROUNDING to nd decimals also
    happens in INTEGER space (half-up via +factor/2 then floor-div)
    BEFORE the single double division. Rounding a double quotient
    instead (the pre-round-10 form) trips on representation: at the
    10x volume one q9 group landed where the exact value x.xx5's
    nearest double fell on different sides of the round boundary in
    the two engines. An integer never does that; the final
    int/10^nd double division is bit-identical in any IEEE engine.
    floor((s + half)/f) is round-half-toward-+inf — for the
    non-negative money relations here that IS HALF_UP, and for a
    signed aggregate it still matches the DuckDB twin exactly (both
    engines floor: `//` there, F.floor here, and the q1 SQL text uses
    the same floor form rather than Spark's truncating `div` — no
    formulation in this family is sign-sensitive)."""
    factor = int(scale) // (10 ** nd)
    assert factor * (10 ** nd) == int(scale) and factor >= 1
    s = F.sum(int_expr.cast("decimal(38,0)"))
    if factor > 1:
        s = F.floor((s + F.lit(factor // 2)) / F.lit(factor))
    return s.cast("double") / (10 ** nd)


def rev_e4_sql(p: str = "") -> str:
    return (
        f"CAST(round({p}l_extendedprice * 100) AS BIGINT)"
        f" * (100 - CAST(round({p}l_discount * 100) AS BIGINT))"
    )


def sum_money_sql(int_sql: str, scale: str, nd: int = 2) -> str:
    """DuckDB twin of sum_money: same integer half-up-then-floor-div
    rounding, same final int/10^nd double division (sum(BIGINT)
    promotes to HUGEINT, so the integer path is exact at any scale)."""
    factor = int(float(scale)) // (10 ** nd)
    assert factor * (10 ** nd) == int(float(scale)) and factor >= 1
    if factor > 1:
        return (
            f"CAST((sum({int_sql}) + {factor // 2}) // {factor} AS DOUBLE)"
            f" / {10 ** nd}"
        )
    return f"CAST(sum({int_sql}) AS DOUBLE) / {10 ** nd}"


def sum_rev_sql(p: str = "", nd: int = 2) -> str:
    return sum_money_sql(rev_e4_sql(p), "10000.0", nd)


# --- Q1-style pricing summary ----------------------------------------------

_Q1_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       {sum_money_sql("CAST(round(l_extendedprice * 100) AS BIGINT)", "100.0")}
           AS sum_base_price,
       {sum_rev_sql()} AS sum_disc_price,
       {sum_money_sql(rev_e4_sql() + " * (100 + CAST(round(l_tax * 100) AS BIGINT))", "1000000.0")}
           AS sum_charge,
       round(avg(l_quantity), 3) AS avg_qty,
       round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
             / 100.0 / count(*), 3) AS avg_price,
       round(CAST(sum(CAST(round(l_discount * 100) AS BIGINT)) AS DOUBLE)
             / 100.0 / count(*), 4) AS avg_disc,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


# The Spark-side q1 text IS the DataFrame program, kept as one SQL
# statement deliberately: each chained DataFrame transformation re-runs
# the analyzer over the growing plan (Dataset.ofRows per step), which
# for q1's ~40 aggregate expressions cost a measured ~0.35-0.4 s of
# driver time per build on local[32] — one spark.sql() parse+analyze of
# the identical plan costs ~0.08 s. Semantics are unchanged from the
# DataFrame formulation (round-5 tpch.py): per-row accumulation in LONG
# inside whole-stage codegen, decimal(38,0) only at the merge of
# per-(partition, group) partials.
_DEC_SUM = "CAST(sum(CAST({c} AS DECIMAL(38,0))) AS DOUBLE)"
_Q1_SPARK_SQL = f"""
WITH part AS (
  SELECT spark_partition_id() AS _pid, l_returnflag, l_linestatus,
         sum(l_quantity) AS _sq,
         sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS _s_base,
         sum({rev_e4_sql()}) AS _s_disc,
         sum({rev_e4_sql()} * (100 + CAST(round(l_tax * 100) AS BIGINT))) AS _s_charge,
         sum(CAST(round(l_discount * 100) AS BIGINT)) AS _s_discount,
         count(*) AS _n
  FROM {{lineitem}}
  WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
  GROUP BY spark_partition_id(), l_returnflag, l_linestatus
)
SELECT l_returnflag, l_linestatus,
       round(sum(_sq), 2) AS sum_qty,
       {_DEC_SUM.format(c="_s_base")} / 100 AS sum_base_price,
       CAST(floor((sum(CAST(_s_disc AS DECIMAL(38,0))) + 50) / 100) AS DOUBLE) / 100 AS sum_disc_price,
       CAST(floor((sum(CAST(_s_charge AS DECIMAL(38,0))) + 5000) / 10000) AS DOUBLE) / 100 AS sum_charge,
       round(sum(_sq) / sum(_n), 3) AS avg_qty,
       round({_DEC_SUM.format(c="_s_base")} / 100.0 / sum(_n), 3) AS avg_price,
       round({_DEC_SUM.format(c="_s_discount")} / 100.0 / sum(_n), 4) AS avg_disc,
       sum(_n) + coalesce(CAST(assert_true(max(_n) < {1 << 26},
           'q1 partial-sum bound exceeded; lower maxPartitionBytes') AS BIGINT), 0)
           AS count_order
FROM part
GROUP BY l_returnflag, l_linestatus
"""


@query("q1_pricing_summary", oracle=_Q1_ORACLE, cache_plan=True)
def q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level exact aggregation: the hot per-row accumulation runs
    in LONG (whole-stage-codegen fast path), decimal(38,0) enters only
    at the merge of per-(partition, group) partials — measured ~1.4x
    on the whole query vs per-row decimal accumulation, same exact
    results. Exactness bound: a partial long sum of e6 units
    (< 2^37/row) wraps only past 2^26 rows per partition-group; the
    assert_true guard (folded into count_order so the optimizer cannot
    prune it) FAILS the query rather than silently wrapping if a
    pathologically compressed input partition ever exceeds it (default
    maxPartitionBytes keeps partitions well under 10M rows). Quantity
    is integer-valued, so its double SUM/AVG is exact as-is.
    """
    return spark.sql(_Q1_SPARK_SQL, lineitem=_t(spark, sf_dir, "lineitem"))


# --- Q3-style shipping priority (3-way join + top-k) ------------------------

_Q3_ORACLE = """
SELECT l.l_orderkey AS l_orderkey,
       CAST((sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                      * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) + 50) // 100 AS DOUBLE) / 100 AS revenue,
       o.o_orderdate AS o_orderdate
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@query("q3_shipping_priority", oracle=_Q3_ORACLE, cache_plan=True)
def q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    # customer is the small side at every SF ratio -> broadcast; the
    # orders<->lineitem join shuffles on the order key only.
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            sum_money(rev_e4(), 10000.0).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


# --- Q5-style regional revenue (5-way join) ---------------------------------

_Q5_ORACLE = """
SELECT n.n_name AS n_name,
       CAST((sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                      * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) + 50) // 100 AS DOUBLE) / 100 AS revenue
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND s.s_nationkey = c.c_nationkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n.n_name
"""


@query("q5_regional_revenue", oracle=_Q5_ORACLE, cache_plan=True)
def q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    # All dims broadcast; the only shuffle is lineitem<->orders on the
    # order key — exactly the plan a 100 TB run wants.
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (s.s_nationkey == c.c_nationkey),
        )
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            sum_money(rev_e4(), 10000.0).alias("revenue")
        )
    )


# --- Q4-style order priority via EXISTS semi-join ---------------------------

_Q4_ORACLE = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
"""


@query("q4_order_priority", oracle=_Q4_ORACLE)
def q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    joined = o.join(
        li,
        (li.l_orderkey == o.o_orderkey) & (li.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return joined.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


# --- Q14-style promo revenue share ------------------------------------------

_Q14_ORACLE = """
SELECT round(100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                              THEN CAST(round(l.l_extendedprice * 100) AS BIGINT)
                                   * (100 - CAST(round(l.l_discount * 100) AS BIGINT))
                              ELSE 0 END)
             / sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                   * (100 - CAST(round(l.l_discount * 100) AS BIGINT))), 4)
           AS promo_revenue_pct
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1996-02-01 00:00:00'
"""


@query("q14_promo_share", oracle=_Q14_ORACLE)
def q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-02-01 00:00:00").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part")
    rev = rev_e4()
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            # sums accumulate as decimal(38,0), not long: a long sum of
            # e4 units wraps silently past 2^63 at the row volumes the
            # exactness discipline targets, while DuckDB auto-promotes
            # to HUGEINT (see sum_money above)
            F.round(
                100.0
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", rev)
                    .otherwise(F.lit(0))
                    .cast("decimal(38,0)")
                )
                / F.sum(rev.cast("decimal(38,0)")),
                4,
            ).alias("promo_revenue_pct")
        )
    )


# --- rollup aggregation -----------------------------------------------------

_ROLLUP_ORACLE = """
SELECT l_returnflag, l_linestatus,
       round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
             / 100.0, 2) AS sum_price,
       CAST(count(*) AS BIGINT) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


@query("rollup_revenue", oracle=_ROLLUP_ORACLE)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP as a two-level reaggregation instead of the native
    rollup operator: ``.rollup()`` plans an Expand that TRIPLES every
    fact row through the aggregation (one copy per grouping set),
    while the finest-level aggregate is tiny (|returnflag x
    linestatus|) and the coarser levels are exact re-sums of it — the
    integer cent/count accumulators are associative, so regrouping is
    value-identical (same discipline as sum_money). Measured 1.59 ->
    1.28 s steady at sf0.1; at scale the win is the 3x row expansion
    the fact stream no longer pays (guide §2.3: shuffle/aggregate
    fewer rows)."""
    base = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(cents("l_extendedprice").cast("decimal(38,0)")).alias("c"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    lvl1 = (
        base.groupBy("l_returnflag")
        .agg(F.sum("c").alias("c"), F.sum("n").alias("n"))
        .select(
            "l_returnflag",
            F.lit(None).cast("string").alias("l_linestatus"),
            "c",
            "n",
        )
    )
    lvl2 = base.agg(F.sum("c").alias("c"), F.sum("n").alias("n")).select(
        F.lit(None).cast("string").alias("l_returnflag"),
        F.lit(None).cast("string").alias("l_linestatus"),
        "c",
        "n",
    )
    u = base.unionByName(lvl1).unionByName(lvl2)
    # same final form as sum_money(cents, 100.0): factor == 1, so the
    # exact integer cent sum divides once into a double
    return u.select(
        "l_returnflag",
        "l_linestatus",
        (F.col("c").cast("double") / 100).alias("sum_price"),
        "n",
    )


# --- window functions: top parts per brand ----------------------------------

_TOP_PARTS_ORACLE = """
WITH pr AS (
    SELECT p.p_brand AS p_brand, p.p_partkey AS p_partkey,
           CAST((sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                          * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) + 50) // 100 AS DOUBLE) / 100 AS revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand, p.p_partkey
)
SELECT p_brand, p_partkey, revenue, CAST(rnk AS INT) AS rnk
FROM (SELECT *, row_number() OVER (PARTITION BY p_brand
                                   ORDER BY revenue DESC, p_partkey) AS rnk
      FROM pr)
WHERE rnk <= 3
"""


@query("window_top_parts_per_brand", oracle=_TOP_PARTS_ORACLE)
def q_top_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from divolte_collector_spark.session import spread_scan

    # spread the 3-column fact projection before the broadcast probe:
    # the join probe + the 20k-group (brand, part) partial aggregation
    # otherwise run inside the single-task scan (unlike q1, whose
    # 4-group partial agg made the same spread a net loss — negative
    # result recorded in OPTIMIZATION_r12.md). Interleaved A/B at
    # sf0.1: 4.3/2.6/1.5 s -> 2.5/0.9/0.9 s; adaptive no-op on a
    # many-partition production scan.
    li = spread_scan(
        _t(spark, sf_dir, "lineitem").select(
            "l_partkey", "l_extendedprice", "l_discount"
        ),
        F.col("l_partkey"),
    )
    p = _t(spark, sf_dir, "part")
    pr = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_partkey")
        .agg(
            sum_money(rev_e4(), 10000.0).alias("revenue")
        )
    )
    w = Window.partitionBy("p_brand").orderBy(F.col("revenue").desc(), F.col("p_partkey"))
    return (
        pr.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= 3)
    )


# --- top customers (join + agg + top-k) -------------------------------------

_TOP_CUSTOMERS_ORACLE = """
SELECT c.c_custkey AS c_custkey, c.c_name AS c_name,
       round(sum(o.o_totalprice), 2) AS total_spent,
       CAST(count(*) AS BIGINT) AS n_orders
FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey, c.c_name
ORDER BY total_spent DESC, c_custkey
LIMIT 25
"""


@query("top_customers", oracle=_TOP_CUSTOMERS_ORACLE)
def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("total_spent"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy(F.col("total_spent").desc(), F.col("c_custkey"))
        .limit(25)
    )


# --- set operations ---------------------------------------------------------

_SETOPS_ORACLE = """
SELECT c_custkey FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
  AND c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
"""


@query("setops_f_not_o_customers", oracle=_SETOPS_ORACLE)
def q_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders")
    f_cust = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("c_custkey")
    )
    o_cust = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return c.intersect(f_cust).exceptAll(o_cust.distinct())
