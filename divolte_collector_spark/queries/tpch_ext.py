"""Extended relational surface: the rest of the TPC-H-shaped query family
(SURVEY.md §2.15), adapted to the driver's synthetic star schema.

The synthetic tables lack ``partsupp``, ``l_commitdate``/``l_receiptdate``/
``l_shipmode`` and the comment columns, so the classic queries that need
them (Q11/Q12/Q16/Q20/Q21) are re-shaped onto available columns while
keeping the *operator* under test identical (correlated scalar subquery,
anti join, OR-of-conjuncts pushdown, group-by-derived-column, ...).

Plan discipline (the point of this module at 100 TB):
- every dimension (nation/region/part/supplier/customer) is broadcast —
  the only shuffles are fact-fact joins on their natural keys;
- scalar subqueries (global averages, global max) are computed as
  1-row aggregates and broadcast-cross-joined, never window-over-()
  which would single-partition the fact table;
- all float aggregates rounded identically in Spark and the DuckDB
  oracle so partial-aggregation summation order can't flip the hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from divolte_collector_spark.queries import query
from divolte_collector_spark.queries.tpch import (
    cents,
    rev_e4,
    sum_money,
)
from divolte_collector_spark.session import load_table, track_persist


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _ts(lit: str):
    return F.lit(lit).cast("timestamp")


# --- Q6: forecast revenue change (pure scan + filter + scalar agg) ----------

_Q6_ORACLE = """
SELECT CAST((sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                      * CAST(round(l_discount * 100) AS BIGINT)) + 50) // 100 AS DOUBLE) / 100 AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.04 AND 0.06
  AND l_quantity < 24
"""


@query("q6_forecast_revenue", oracle=_Q6_ORACLE)
def q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Everything pushes to the parquet scan: 4 pushed filters, 3-column
    # ReadSchema. The agg is a single partial+final sum — no join, no wide
    # shuffle; this is the "is pushdown working at all" canary query.
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= _ts("1997-01-01 00:00:00"))
            & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
            & (F.col("l_discount") >= 0.04)
            & (F.col("l_discount") <= 0.06)
            & (F.col("l_quantity") < 24)
        ).agg(
            sum_money(
                cents("l_extendedprice") * cents("l_discount"), 10000.0
            ).alias("revenue")
        )
    )


# --- Q7: volume shipping between two nations --------------------------------

_Q7_ORACLE = """
SELECT supp_nation, cust_nation, l_year,
       CAST((sum(volume) + 50) // 100 AS DOUBLE) / 100 AS revenue
FROM (
    SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INT) AS l_year,
           CAST(round(l.l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l.l_discount * 100) AS BIGINT)) AS volume
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation ns  ON s.s_nationkey = ns.n_nationkey
    JOIN nation nc  ON c.c_nationkey = nc.n_nationkey
    WHERE ((ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
        OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
) shipping
GROUP BY supp_nation, cust_nation, l_year
"""


@query("q7_nation_volume", oracle=_Q7_ORACLE)
def q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
    )
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    ns = F.broadcast(n.select(F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")))
    nc = F.broadcast(n.select(F.col("n_nationkey").alias("nc_key"), F.col("n_name").alias("cust_nation")))
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    # One fact-fact shuffle (lineitem<->orders on the order key); supplier,
    # customer and both nation role-copies are broadcast.
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(ns, F.col("s_nationkey") == F.col("ns_key"))
        .join(nc, F.col("c_nationkey") == F.col("nc_key"))
        .filter(pair)
        .withColumn("l_year", F.year("l_shipdate").cast("int"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(
            sum_money(rev_e4(), 10000.0).alias("revenue")
        )
    )


# --- Q8: national market share ----------------------------------------------

_Q8_ORACLE = """
SELECT o_year,
       round(CAST(sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
             AS DOUBLE) / sum(volume), 4) AS mkt_share
FROM (
    SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
           CAST(round(l.l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l.l_discount * 100) AS BIGINT)) AS volume,
           ns.n_name AS nation
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation nc  ON c.c_nationkey = nc.n_nationkey
    JOIN region r   ON nc.n_regionkey = r.r_regionkey
    JOIN nation ns  ON s.s_nationkey = ns.n_nationkey
    WHERE r.r_name = 'AMERICA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND p.p_type = 'ECONOMY'
) all_nations
GROUP BY o_year
"""


@query("q8_market_share", oracle=_Q8_ORACLE)
def q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1998-01-01 00:00:00"))
    )
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    nc = n.select(F.col("n_nationkey").alias("nc_key"), F.col("n_regionkey").alias("nc_region"))
    ns = n.select(F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("nation"))
    vol = rev_e4()
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc_key"))
        .join(F.broadcast(r), F.col("nc_region") == F.col("r_regionkey"))
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
        .withColumn("o_year", F.year("o_orderdate").cast("int"))
        .groupBy("o_year")
        .agg(
            # decimal(38,0) accumulators: a long sum of e4 units wraps
            # past 2^63 at scale while DuckDB promotes to HUGEINT
            # (mirrors sum_money in tpch.py)
            F.round(
                F.sum(
                    F.when(F.col("nation") == "NATION_3", vol)
                    .otherwise(F.lit(0))
                    .cast("decimal(38,0)")
                ).cast("double")
                / F.sum(vol.cast("decimal(38,0)")),
                4,
            ).alias("mkt_share")
        )
    )


# --- Q9-shaped: profit by supplier nation and year --------------------------
# (no partsupp table -> profit = revenue; the operator under test is the
#  group-by over two derived columns after a 4-way join)

_Q9_ORACLE = """
SELECT nation, o_year,
       CAST((sum(amount_e4) + 50) // 100 AS DOUBLE) / 100 AS sum_profit
FROM (
    SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS INT) AS o_year,
           CAST(round(l.l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l.l_discount * 100) AS BIGINT))
               AS amount_e4
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%green%' OR p.p_type = 'PROMO'
) profit
GROUP BY nation, o_year
"""


@query("q9_profit_by_nation_year", oracle=_Q9_ORACLE)
def q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prices and discounts are 2-decimal money, so the profit sum runs
    in EXACT integer ten-thousandths (cents x discount-percent): a
    double SUM's addition order differs between engines, and at sf0.1
    one (nation, year) group landed on a half-cent boundary
    (...728.125) where round(,2) flipped — the integer sum cannot
    drift at any scale."""
    p = _t(spark, sf_dir, "part").filter(
        F.col("p_name").contains("green") | (F.col("p_type") == "PROMO")
    )
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    # narrow orders projection + SHUFFLE_HASH build. Two regimes, both
    # deliberate (guide §3.1): at 100 TB orders cannot broadcast, and
    # the hint picks a hash build of one AQE-sized two-column orders
    # partition over sort-merge — no sort of either side, skew-safe
    # (per-order fact rows are basket-bounded). At test SF the static
    # planner would instead broadcast orders and chain the whole query
    # onto the single-row-group serial scan task; the hint's exchange
    # is what parallelizes the probe. The trade: a mid-size deployment
    # where orders still fits the broadcast cap pays one fact-stream
    # exchange a broadcast plan would skip. Interleaved sf0.1 A/B 5x:
    # med 0.68 -> 0.62 s (hint <= base in every pair; the spread_scan
    # alternative measured WORSE than base, med 1.03 s — the fact
    # exchange is only worth paying when the join consumes it).
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    n = _t(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o.hint("shuffle_hash"), li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
            rev_e4().alias("amount_e4"),
        )
        .groupBy("nation", "o_year")
        .agg(sum_money(F.col("amount_e4"), 10000.0).alias("sum_profit"))
    )


# --- Q10: returned-item reporting (top 20 customers by lost revenue) --------

_Q10_ORACLE = """
SELECT c.c_custkey AS c_custkey, c.c_name AS c_name,
       CAST((sum(CAST(round(l.l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) + 50) // 100 AS DOUBLE) / 100 AS revenue,
       round(c.c_acctbal, 2) AS c_acctbal, n.n_name AS n_name
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, round(c.c_acctbal, 2), n.n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@query("q10_returned_items", oracle=_Q10_ORACLE)
def q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-10-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1997-01-01 00:00:00"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(
            "c_custkey", "c_name", F.round("c_acctbal", 2).alias("c_acctbal"), "n_name"
        )
        .agg(
            sum_money(rev_e4(), 10000.0).alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


# --- Q13: customer order-count distribution (left outer + double agg) -------

_Q13_ORACLE = """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
    SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
    FROM customer c
    LEFT OUTER JOIN orders o
      ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
    GROUP BY c.c_custkey
) c_orders
GROUP BY c_count
"""


@query("q13_order_count_distribution", oracle=_Q13_ORACLE)
def q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    # Aggregate orders per custkey BEFORE the outer join: the join input
    # shrinks from |orders| rows to |customers-with-orders| rows and the
    # left join becomes customer<->(small agg) — broadcastable at any SF
    # where customers-with-orders fits, and never a skew hazard.
    per_cust = o.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.count(F.lit(1)).alias("n")
    )
    return (
        c.join(per_cust, "c_custkey", "left")
        .select(F.coalesce(F.col("n"), F.lit(0)).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


# --- Q15: top supplier by quarterly revenue (scalar-subquery max) -----------

_Q15_ORACLE = """
WITH revenue0 AS (
    SELECT l_suppkey AS supplier_no,
           CAST((sum(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))) + 50) // 100 AS DOUBLE) / 100
               AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    GROUP BY l_suppkey
)
SELECT s.s_suppkey AS s_suppkey, s.s_name AS s_name, r.total_revenue AS total_revenue
FROM supplier s
JOIN revenue0 r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue0)
ORDER BY s_suppkey
"""


@query("q15_top_supplier", oracle=_Q15_ORACLE)
def q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1996-04-01 00:00:00"))
    )
    s = _t(spark, sf_dir, "supplier")
    rev = track_persist(  # feeds both the MAX and the filter; AQE does
        # not reuse the duplicated agg subtree (0 ReusedExchange measured)
        li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
            sum_money(rev_e4(), 10000.0).alias("total_revenue")
        )
    )
    # Scalar subquery as a broadcast 1-row cross join — NOT a global
    # window, which would funnel `rev` through a single partition.
    mx = rev.agg(F.max("total_revenue").alias("_mx"))
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("_mx"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# --- Q17-shaped: small-quantity revenue (correlated avg per part) -----------

_Q17_ORACLE = """
SELECT round(CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
             AS DOUBLE) / 100.0 / 7.0, 2) AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#1'
  AND l.l_quantity < (SELECT 0.5 * avg(l2.l_quantity)
                      FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
"""


@query("q17_small_qty_revenue", oracle=_Q17_ORACLE)
def q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    # Decorrelated by hand: per-part average as an aggregate joined back.
    # The avg MUST be over ALL lineitems of the part (not just Brand#1
    # rows post-join), matching the correlated subquery's scope.
    per_part_avg = li.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        (F.avg("l_quantity") * 0.5).alias("half_avg_qty")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(per_part_avg, li.l_partkey == F.col("ap_partkey"))
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(
            F.round(
                F.sum(cents("l_extendedprice").cast("decimal(38,0)"))
                .cast("double") / 100.0 / 7.0, 2
            ).alias("avg_yearly")
        )
    )


# --- Q18: large-volume customers (HAVING over fact self-agg) ----------------

_Q18_ORACLE = """
SELECT c.c_name AS c_name, c.c_custkey AS c_custkey,
       o.o_orderkey AS o_orderkey, o.o_orderdate AS o_orderdate,
       round(o.o_totalprice, 2) AS o_totalprice,
       round(sum(l.l_quantity), 2) AS sum_qty
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (
    SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
    HAVING sum(l_quantity) > 150)
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, round(o.o_totalprice, 2)
ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
LIMIT 100
"""


@query("q18_large_volume_customers", oracle=_Q18_ORACLE)
def q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_sq"))
        .filter(F.col("_sq") > 150)
        .select("l_orderkey")
    )
    # SHUFFLE_HASH builds for the semi probe (the >150-qty order-key
    # sliver) and orders (guide §3.1). The hinted plan exchanges the
    # fact ONCE on l_orderkey and reuses it three ways: big's groupBy
    # reads it co-partitioned, and both joins consume it in place with
    # hash builds of the bounded sliver/orders partitions — at 100 TB
    # the alternative is sort-merge with a sort of the fact per join
    # (neither build side broadcasts there). At test SF the static
    # planner would broadcast both and chain everything onto the
    # serial single-row-group scan task; the hint's exchange is also
    # what parallelizes it. Mid-size trade as in q9. Interleaved
    # sf0.1 A/B 5x: med 0.91 -> 0.49 s (spread_scan alternative only
    # reached 0.82 — the join-consumed exchange beats a bare spread).
    return (
        li.join(
            big.withColumnRenamed("l_orderkey", "bk").hint("shuffle_hash"),
            li.l_orderkey == F.col("bk"), "left_semi",
        )
        .join(o.hint("shuffle_hash"), li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate",
            F.round("o_totalprice", 2).alias("o_totalprice"),
        )
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderdate"), F.col("o_orderkey"))
        .limit(100)
    )


# --- Q19-shaped: OR-of-conjuncts bracket revenue ----------------------------

_Q19_ORACLE = """
SELECT CAST((sum(CAST(round(l.l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) + 50) // 100 AS DOUBLE) / 100 AS revenue
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity >= 1 AND l.l_quantity <= 11)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 20
       AND l.l_quantity >= 10 AND l.l_quantity <= 20)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 30
       AND l.l_quantity >= 20 AND l.l_quantity <= 30)
"""


@query("q19_bracket_revenue", oracle=_Q19_ORACLE)
def q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    brackets = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 20)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 30)
            & F.col("l_quantity").between(20, 30)
        )
    )
    # The disjunction's common part-side residual (brand IN (...), size<=30)
    # is derivable by Catalyst; the broadcast keeps the OR evaluation
    # map-side so no shuffle carries the unfiltered fact rows.
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(brackets)
        .agg(
            sum_money(rev_e4(), 10000.0).alias("revenue")
        )
    )


# --- Q22-shaped: idle wealthy customers (anti join + scalar subquery) -------

_Q22_ORACLE = """
SELECT CAST(substr(c.c_name, length(c.c_name), 1) AS VARCHAR) AS name_digit,
       CAST(count(*) AS BIGINT) AS numcust,
       round(CAST(sum(CAST(round(c.c_acctbal * 100) AS BIGINT)) AS DOUBLE)
             / 100.0, 2) AS totacctbal
FROM customer c
WHERE c.c_acctbal > (SELECT CAST(sum(CAST(round(c2.c_acctbal * 100) AS BIGINT))
                            AS DOUBLE) / 100.0 / count(*)
                     FROM customer c2 WHERE c2.c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
GROUP BY substr(c.c_name, length(c.c_name), 1)
"""


@query("q22_idle_customers", oracle=_Q22_ORACLE)
def q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    # Every synthetic customer has SOME order, so "idle" here means no
    # urgent order — keeps the anti join non-degenerate at every SF.
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(cents("c_acctbal").cast("decimal(38,0)")).cast("double")
            / 100.0 / F.count(F.lit(1))
        ).alias("_avg_bal")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg_bal"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_name").substr(F.length("c_name"), F.lit(1)).alias("name_digit"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            sum_money(cents("c_acctbal"), 100.0).alias("totacctbal"),
        )
    )


# --- GROUPING SETS (completes rollup/cube family) ---------------------------

_GSETS_ORACLE = """
SELECT l_returnflag, l_linestatus,
       round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
             / 100.0, 2) AS sum_price,
       CAST(count(*) AS BIGINT) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
"""


@query("grouping_sets_revenue", oracle=_GSETS_ORACLE)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("gs_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100 AS sum_price,
               count(*) AS n
        FROM gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


# --- exact percentiles (sort-based aggregate) -------------------------------

_PCTL_ORACLE = """
SELECT o_orderpriority,
       round(quantile_cont(o_totalprice, 0.25), 2) AS p25,
       round(quantile_cont(o_totalprice, 0.50), 2) AS p50,
       round(quantile_cont(o_totalprice, 0.75), 2) AS p75,
       round(max(o_totalprice), 2) AS mx
FROM orders
GROUP BY o_orderpriority
"""


@query("price_percentiles", oracle=_PCTL_ORACLE)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Exact interpolated percentiles: Spark `percentile` and DuckDB
    # `quantile_cont` share the linear-interpolation definition. At
    # 100 TB the exact variant costs a per-group sort of values held in
    # memory; switch to approx_percentile when groups exceed executor
    # memory (see approx_distinct_bounds for the sketch-side analogue).
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.25)"), 2).alias("p25"),
        F.round(F.expr("percentile(o_totalprice, 0.50)"), 2).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.75)"), 2).alias("p75"),
        F.round(F.max("o_totalprice"), 2).alias("mx"),
    )


# --- skew-salted replicate join ---------------------------------------------
# The fact-to-dimension join answer when the dimension is too big to
# broadcast AND the fact side is skewed: a hot part key sends its
# entire fact slice to one reducer in a plain shuffle join. Salting
# splits each fact row into one of N_JOIN_SALTS sub-keys (derived from
# the row's own unique id — uniform by construction) and replicates
# each dimension row across ALL salts, so a hot key's rows spread over
# N_JOIN_SALTS reducers at the price of an N_SALTS-times-larger (still
# dimension-sized) build side. The SHUFFLE_HASH hint pins the
# shuffled-hash strategy the pattern exists for — at this SF Catalyst
# would otherwise broadcast the dim and hide the shape. AQE's
# skewedJoin does this adaptively for sort-merge; the explicit salt is
# the deterministic-plan formulation. Result is join-identical to the
# unsalted query (the oracle).

N_JOIN_SALTS = 8

_SALTED_JOIN_ORACLE = """
SELECT p.p_brand,
       CAST(count(*) AS BIGINT) AS n_lineitems,
       CAST((sum(CAST(round(l.l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) + 50) // 100 AS DOUBLE) / 100 AS revenue
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
GROUP BY p.p_brand
"""


@query("skew_salted_replicate_join", oracle=_SALTED_JOIN_ORACLE)
def q_skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_orderkey", "l_linenumber", "l_extendedprice",
        "l_discount",
    )
    fact = li.withColumn(
        "_salt",
        F.pmod(
            F.xxhash64("l_orderkey", "l_linenumber"), F.lit(N_JOIN_SALTS)
        ).cast("int"),
    )
    dim = (
        _t(spark, sf_dir, "part")
        .select("p_partkey", "p_brand")
        .withColumn(
            "_salt",
            F.explode(F.array(*[F.lit(i) for i in range(N_JOIN_SALTS)])),
        )
    )
    joined = fact.join(
        dim.hint("SHUFFLE_HASH"),
        (fact.l_partkey == dim.p_partkey) & (fact._salt == dim._salt),
    )
    return joined.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_lineitems"),
        sum_money(rev_e4(), 10000.0).alias("revenue"),
    )


# --- referential-integrity audit --------------------------------------------
# The data-quality gate a warehouse runs after every load: count
# foreign-key orphans along the star schema's edges. Each edge is one
# LEFT ANTI join — dimension sides broadcast, the single big fact edge
# (lineitem -> orders) shuffles on the key like any fact join — and the
# result is one row per edge, so the audit output is constant-size no
# matter the table volume. A synthetic orphan batch is unioned onto the
# fact side (both engines alike) so the audit provably COUNTS, rather
# than reporting zeros against clean synthetic data.

_FK_AUDIT_ORACLE = """
WITH li AS (
    SELECT l_orderkey FROM lineitem
    UNION ALL
    SELECT -(b.b + 1) AS l_orderkey
    FROM (SELECT unnest(range(0, 7)) AS b) b
),
edges AS (
    SELECT 'lineitem->orders' AS edge,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_orphans
    FROM li LEFT JOIN orders o ON o.o_orderkey = li.l_orderkey
    UNION ALL
    SELECT 'orders->customer',
           CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT)
    FROM orders o LEFT JOIN customer c ON c.c_custkey = o.o_custkey
    UNION ALL
    SELECT 'customer->nation',
           CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT)
    FROM customer c LEFT JOIN nation n ON n.n_nationkey = c.c_nationkey
    UNION ALL
    SELECT 'nation->region',
           CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN r.r_regionkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT)
    FROM nation n LEFT JOIN region r ON r.r_regionkey = n.n_regionkey
)
SELECT edge, n_rows, n_orphans FROM edges
"""


@query("referential_fk_audit", oracle=_FK_AUDIT_ORACLE)
def q_referential_fk_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    planted = spark.range(7).select((-(F.col("id") + 1)).alias("l_orderkey"))
    li = li.unionByName(planted)

    def edge(name, left, lk, right, rk, bcast):
        r = right.select(F.col(rk).alias("_rk"))
        if bcast:
            r = F.broadcast(r)
        j = left.join(r, left[lk] == F.col("_rk"), "left")
        return j.agg(
            F.lit(name).alias("edge"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("_rk").isNull().cast("long")).alias("n_orphans"),
        )

    parts = [
        edge("lineitem->orders", li, "l_orderkey",
             orders.select("o_orderkey"), "o_orderkey", False),
        # customer is fact-scaled (grows with sf), NOT a bounded
        # dimension: this edge shuffles like lineitem->orders
        edge("orders->customer", orders.select("o_custkey"), "o_custkey",
             customer.select("c_custkey"), "c_custkey", False),
        edge("customer->nation", customer.select("c_nationkey"),
             "c_nationkey", nation.select("n_nationkey"), "n_nationkey",
             True),
        edge("nation->region", nation.select("n_regionkey"), "n_regionkey",
             region.select("r_regionkey"), "r_regionkey", True),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
