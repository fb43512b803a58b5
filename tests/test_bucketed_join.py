"""Bucketed tables: the co-located join discipline for 100 TB.

A fact-to-fact join (lineitem x orders) at scale shuffles BOTH sides
on the key every time it runs. Writing both tables bucketed (and
sorted) by the join key moves that shuffle to write time, once: every
subsequent join reads bucket i against bucket i with NO exchange and
NO sort. This test pins exactly that plan property via the plan audit.
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from divolte_collector_spark.plans import audit
from divolte_collector_spark.session import load_table

SF = "/root/testdata/sf0.001"
N_BUCKETS = 8


@pytest.fixture()
def bucketed_tables(spark):
    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    for name in ("bt_lineitem", "bt_orders"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
    (
        load_table(spark, SF, "lineitem")
        .select("l_orderkey", "l_extendedprice", "l_discount")
        .write.bucketBy(N_BUCKETS, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable("bt_lineitem")
    )
    (
        load_table(spark, SF, "orders")
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
        .write.bucketBy(N_BUCKETS, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable("bt_orders")
    )
    yield
    for name in ("bt_lineitem", "bt_orders"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
    if warehouse.startswith("file:"):
        shutil.rmtree(warehouse[len("file:"):], ignore_errors=True)


def test_bucketed_join_no_shuffle_no_sort(spark, bucketed_tables):
    li = spark.table("bt_lineitem")
    o = spark.table("bt_orders")
    # disable broadcast so the join strategy is the bucket-aware SMJ
    # (at real scale neither side broadcasts anyway)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li.join(o, li.l_orderkey == o.o_orderkey).groupBy(
            "o_orderpriority"
        ).agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        a = audit(joined)
        # the join itself adds NO exchange: the only shuffle is the
        # final small groupBy. Bucket-pruned scan feeds SMJ directly.
        assert a.n_sortmerge_joins == 1
        assert a.n_exchanges == 1  # just the aggregation
        # correctness against the plain (shuffling) formulation
        plain = (
            load_table(spark, SF, "lineitem")
            .join(
                load_table(spark, SF, "orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderpriority")
            .agg(
                F.round(
                    F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
                ).alias("revenue")
            )
        )
        assert sorted(map(tuple, joined.collect())) == sorted(
            map(tuple, plain.collect())
        )
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
