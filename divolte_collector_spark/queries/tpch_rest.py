"""The remaining TPC-H query shapes (Q2, Q11, Q12, Q16, Q20, Q21),
completing all 22 families in SURVEY.md §2.15.

The synthetic star schema has no ``partsupp`` and no
``l_shipmode``/``l_commitdate``/``l_receiptdate``, so these are
re-shaped onto the available columns while keeping the *operator*
under test identical:

- Q2  : correlated MIN subquery over a derived supply relation
- Q11 : scalar-subquery fraction-of-total HAVING filter
- Q12 : two-branch conditional aggregation over a fact-fact join
- Q16 : COUNT(DISTINCT) grouping with a NOT-IN (anti join) exclusion
- Q20 : nested semi-join chain driven by a correlated quantity ratio
- Q21 : EXISTS + NOT-EXISTS on a self-joined fact (implemented
        Spark-side as per-key counts — one aggregation instead of two
        self-joins, the formulation that survives 100 TB)

Plan discipline matches tpch_ext.py: dimensions broadcast, scalar
subqueries as broadcast 1-row cross joins, aggregates rounded
identically on both sides of the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from divolte_collector_spark.queries import query
from divolte_collector_spark.session import load_table, track_persist


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _ts(lit: str):
    return F.lit(lit).cast("timestamp")


# --- Q2-shaped: minimum-cost supplier (correlated MIN subquery) -------------
# partsupp is derived from lineitem: unit cost of (part, supplier) is the
# average realized unit price across all their lineitems.

_Q2_ORACLE = """
WITH supply AS (
    SELECT l_partkey, l_suppkey,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
                 / CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE),
                 4) AS unit_cost
    FROM lineitem
    GROUP BY l_partkey, l_suppkey
)
SELECT round(s.s_acctbal, 2) AS s_acctbal, s.s_name AS s_name,
       n.n_name AS n_name, p.p_partkey AS p_partkey,
       sp.unit_cost AS unit_cost
FROM part p
JOIN supply sp  ON p.p_partkey = sp.l_partkey
JOIN supplier s ON s.s_suppkey = sp.l_suppkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE p.p_size = 15 AND p.p_type = 'STANDARD' AND r.r_name = 'EUROPE'
  AND sp.unit_cost = (
      SELECT min(sp2.unit_cost)
      FROM supply sp2
      JOIN supplier s2 ON s2.s_suppkey = sp2.l_suppkey
      JOIN nation n2   ON s2.s_nationkey = n2.n_nationkey
      JOIN region r2   ON n2.n_regionkey = r2.r_regionkey
      WHERE sp2.l_partkey = p.p_partkey AND r2.r_name = 'EUROPE')
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


@query("q2_min_cost_supplier", oracle=_Q2_ORACLE)
def q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")

    # Region-restricted supplier dimension, built once and broadcast to
    # BOTH consumers (the outer join and the decorrelated MIN) — the
    # reference pattern for correlated subqueries sharing a dimension.
    eu_supp = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    # Derived supply relation, with the PART FILTER PUSHED BELOW THE
    # AGGREGATION: both consumers of supply — the outer join AND the
    # decorrelated per-part MIN (sp2.l_partkey = p.p_partkey) — are
    # keyed to the filtered parts, and unit_cost is computed per
    # (part, supplier) group independently, so a broadcast semi-join
    # on the selective part predicate before the groupBy is exactly
    # result-preserving while shrinking the aggregation, the persist,
    # and every downstream join from |part x supp| (591k rows at
    # sf0.1, ~1:1 with lineitem) to the selected sliver (guide §2.3
    # project/filter early). Interleaved A/B: 5.1/2.2/1.7 s ->
    # 1.9/1.3/1.3 s; the old repartition("l_partkey") spine is
    # unnecessary once the fact rows are pre-filtered (the grouping
    # exchange moves only the sliver).
    supply = (
        li.join(
            F.broadcast(p.select("p_partkey")),
            li.l_partkey == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            # Unit cost = total price / total quantity, summed in exact
            # decimal (associative — identical on any cluster size /
            # engine), then ONE double division + round. avg(double)
            # would depend on partial-agg order and could flip a .xxxx5
            # rounding boundary between Spark and DuckDB (q11 decimal
            # discipline).
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).cast("double")
                / F.sum(F.col("l_quantity").cast("decimal(18,6)")).cast("double"),
                4,
            ).alias("unit_cost")
        )
    )
    eu_supply = track_persist(  # consumed by the per-part MIN and the
        # outer join; without this the lineitem aggregation executes
        # twice (AQE showed no ReusedExchange for the duplicated subtree)
        supply.join(
            F.broadcast(eu_supp), F.col("l_suppkey") == F.col("s_suppkey")
        )
    )
    # Decorrelated MIN: per-part minimum over the already-region-filtered
    # supply, joined back on the part key (map-side: same partitioning).
    min_cost = eu_supply.groupBy(F.col("l_partkey").alias("mc_partkey")).agg(
        F.min("unit_cost").alias("min_cost")
    )
    return (
        eu_supply.join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        # broadcast the per-part MIN (|parts| x 16B): joining on the
        # part key with the min as a residual filter. Without the hint
        # Catalyst promotes unit_cost==min_cost into an SMJ key over a
        # normalized float and re-shuffles BOTH sides on (float, key).
        .join(F.broadcast(min_cost), F.col("l_partkey") == F.col("mc_partkey"))
        .filter(F.col("unit_cost") == F.col("min_cost"))
        .select(
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "unit_cost",
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


# --- Q11-shaped: important parts (fraction-of-total HAVING) -----------------

_Q11_ORACLE = """
WITH value_by_part AS (
    SELECT l.l_partkey AS p_partkey,
           CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                               AS DECIMAL(18, 6))), 2) AS DOUBLE) AS part_value
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
    GROUP BY l.l_partkey
)
SELECT p_partkey, part_value
FROM value_by_part
WHERE part_value > (SELECT 0.001 * sum(part_value) FROM value_by_part)
ORDER BY part_value DESC, p_partkey
"""


@query("q11_important_parts", oracle=_Q11_ORACLE)
def q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3")
    )
    nat_supp = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select("s_suppkey")
    )
    value_by_part = (
        li.join(F.broadcast(nat_supp), li.l_suppkey == F.col("s_suppkey"), "left_semi")
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(
            # Sum in exact decimal: double partial-agg order differs
            # between engines (and between runs at different
            # parallelism), and round() amplifies a 1-ulp difference
            # into a visible cent on .xx5 boundaries. Decimal sums are
            # associative — identical on any cluster size.
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,6)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("part_value")
        )
    )
    # The per-part aggregate feeds BOTH the total and the filter; it is
    # far smaller than lineitem (|parts| rows) and AQE does NOT reuse
    # the duplicated subtree (verified: 0 ReusedExchange, the fact agg
    # ran twice) — the tracked persist makes the reuse explicit. Scalar
    # total as a broadcast 1-row cross join, never a global window.
    value_by_part = track_persist(value_by_part)
    total = value_by_part.agg((F.sum("part_value") * 0.001).alias("_threshold"))
    return (
        value_by_part.join(F.broadcast(total))
        .filter(F.col("part_value") > F.col("_threshold"))
        .select("p_partkey", "part_value")
        .orderBy(F.col("part_value").desc(), "p_partkey")
    )


# --- Q12-shaped: shipping-priority counts (two-branch conditional agg) ------
# No l_shipmode/l_commitdate/l_receiptdate: linestatus stands in for the
# mode, and "shipped no earlier than ordered" stands in for the
# commit/receipt lag predicate. The operator under test — a fact-fact
# join feeding CASE-WHEN conditional sums — is unchanged.

_Q12_ORACLE = """
SELECT l.l_linestatus AS shipmode,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= o.o_orderdate
  AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l.l_linestatus
ORDER BY shipmode
"""


@query("q12_priority_shipping", oracle=_Q12_ORACLE)
def q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
    )
    o = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    # One shuffle (the orderkey join); the date filter is pushed to the
    # lineitem scan so only the 1997 slice is shuffled. The non-equi
    # l_shipdate >= o_orderdate predicate rides the equi-join as a
    # post-join filter, not a join explosion.
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") >= F.col("o_orderdate"))
        .groupBy(F.col("l_linestatus").alias("shipmode"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("shipmode")
    )


# --- Q16-shaped: supplier count by part attributes (COUNT DISTINCT + NOT IN)

_Q16_ORACLE = """
SELECT p.p_brand AS p_brand, p.p_type AS p_type, p.p_size AS p_size,
       CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#5'
  AND p.p_type NOT IN ('PROMO', 'ECONOMY')
  AND p.p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
  AND l.l_suppkey NOT IN
      (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
GROUP BY p.p_brand, p.p_type, p.p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


@query("q16_supplier_part_types", oracle=_Q16_ORACLE)
def q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (~F.col("p_type").isin("PROMO", "ECONOMY"))
        & (F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22))
    )
    excluded = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0.0)
        .select("s_suppkey")
    )
    # NOT IN over a non-nullable key == broadcast anti join (the
    # null-aware special case doesn't apply; don't pay for it).
    return (
        li.join(F.broadcast(excluded), li.l_suppkey == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


# --- Q20-shaped: part-promotion suppliers (nested semi-join chain) ----------
# availqty > 0.5 * shipped-qty becomes: of this (supplier, part)'s total
# shipped quantity, more than half shipped inside 1997.

_Q20_ORACLE = """
WITH shipped AS (
    SELECT l_suppkey, l_partkey,
           sum(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
                     AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
                    THEN l_quantity ELSE 0 END) AS qty_97,
           sum(l_quantity) AS qty_all
    FROM lineitem
    GROUP BY l_suppkey, l_partkey
)
SELECT s.s_name AS s_name, s.s_suppkey AS s_suppkey
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE n.n_name IN ('NATION_1', 'NATION_2', 'NATION_3', 'NATION_4', 'NATION_5')
  AND s.s_suppkey IN (
      SELECT sh.l_suppkey
      FROM shipped sh
      JOIN part p ON p.p_partkey = sh.l_partkey
      WHERE p.p_name LIKE '%a%' AND sh.qty_97 > 0.5 * sh.qty_all)
ORDER BY s_suppkey
"""


@query("q20_part_promotion", oracle=_Q20_ORACLE)
def q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    from divolte_collector_spark.session import spread_scan

    # single-file scan: the (supp, part) partial aggregation over the
    # full fact table ran in ONE scan task. Unlike q1 (4 groups, where
    # the same spread was measured a loss and rejected), this partial
    # agg keeps ~|supp x part| groups, so map-side collapse saves
    # nothing and the serial scan task was doing all the work. Spread
    # on l_suppkey (a prefix of the aggregation keys). Interleaved
    # sf0.1 A/B 5x: med 0.80 -> 0.52 s. Adaptive: a cluster-scale
    # many-partition scan skips the exchange (session.spread_scan).
    li = spread_scan(_t(spark, sf_dir, "lineitem"), F.col("l_suppkey"))
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").contains("a"))
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin(
            "NATION_1", "NATION_2", "NATION_3", "NATION_4", "NATION_5"
        )
    )
    in97 = (F.col("l_shipdate") >= _ts("1997-01-01 00:00:00")) & (
        F.col("l_shipdate") < _ts("1998-01-01 00:00:00")
    )
    shipped = li.groupBy("l_suppkey", "l_partkey").agg(
        F.sum(F.when(in97, F.col("l_quantity")).otherwise(F.lit(0.0))).alias("qty_97"),
        F.sum("l_quantity").alias("qty_all"),
    )
    promo_supp = (
        shipped.filter(F.col("qty_97") > 0.5 * F.col("qty_all"))
        .join(F.broadcast(p.select("p_partkey")), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .select("l_suppkey")
        .distinct()
    )
    # supplier is tiny → the semi-join chain collapses to broadcast
    # lookups; the only wide shuffle is the (supp, part) aggregation.
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey, "left_semi")
        .join(promo_supp, s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_suppkey")
        .orderBy("s_suppkey")
    )


# --- Q21-shaped: sole-blame suppliers (EXISTS + NOT EXISTS on self-join) ----
# Suppliers with a returned ('R') lineitem in a multi-supplier order
# where NO other supplier of that order also has a return. The oracle
# keeps the textbook EXISTS/NOT-EXISTS form; the Spark plan computes
# per-order supplier counts instead — one aggregation replaces two
# fact self-joins, the shape that survives 100 TB.

_Q21_ORACLE = """
WITH pairs AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
     flagged AS (SELECT DISTINCT l_orderkey, l_suppkey
                 FROM lineitem WHERE l_returnflag = 'R')
SELECT s.s_name AS s_name, CAST(count(*) AS BIGINT) AS numwait
FROM flagged f
JOIN supplier s ON s.s_suppkey = f.l_suppkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
WHERE n.n_name IN ('NATION_1', 'NATION_2', 'NATION_3', 'NATION_4', 'NATION_5')
  AND EXISTS (SELECT 1 FROM pairs a
              WHERE a.l_orderkey = f.l_orderkey
                AND a.l_suppkey <> f.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM flagged f2
                  WHERE f2.l_orderkey = f.l_orderkey
                    AND f2.l_suppkey <> f.l_suppkey)
GROUP BY s.s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


@query("q21_sole_blame_suppliers", oracle=_Q21_ORACLE)
def q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin(
            "NATION_1", "NATION_2", "NATION_3", "NATION_4", "NATION_5"
        )
    )
    # EXISTS(other supplier)      <=> n_suppliers >= 2
    # NOT EXISTS(other flagged)   <=> n_flagged == 1  (the row itself)
    # Two-level form: collapse to distinct (order, supplier) pairs
    # first, then count/collect per order — same values, but the old
    # single groupBy with TWO countDistincts + a collect_list planned
    # as a 3x Expand of the fact rows through the shuffle plus
    # object-hash distinct aggregation (measured 3.98 s for that
    # aggregate alone at sf0.1; this shape is 0.90 s). Still no
    # lineitem self-join anywhere.
    pairs = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
        ).alias("fl")
    )
    per_order = pairs.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.sum("fl").alias("n_flagged"),
        F.collect_list(
            F.when(F.col("fl") == 1, F.col("l_suppkey"))
        ).alias("flagged_supps"),
    )
    sole = (
        per_order.filter((F.col("n_suppliers") >= 2) & (F.col("n_flagged") == 1))
        .select(F.explode("flagged_supps").alias("l_suppkey"))
    )
    nat_supp = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey, "left_semi")
    return (
        sole.join(F.broadcast(nat_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )
