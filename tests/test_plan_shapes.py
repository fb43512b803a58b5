"""Physical-plan assertions: the plans we ship are the plans we
designed (SURVEY §4 / the 100 TB notes in each query's docstring).
Regression-guards pushdown, broadcast strategy, and partial
aggregation — the properties that decide whether a query survives a
1000x scale-up, which row-count tests can't see."""

from __future__ import annotations

import pytest

from divolte_collector_spark.queries import all_queries

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = all_queries()[name].fn(spark, SF)
    jvm = spark._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_q6_filters_pushed_to_scan(spark):
    plan = _plan(spark, "q6_forecast_revenue")
    assert "PushedFilters: [" in plan
    # all four predicates reach the parquet scan
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert f"IsNotNull({col})" in plan or col in plan.split("PushedFilters")[1].split("]")[0]
    # column pruning: the scan must not read the full 11-column row
    read_schema = plan.split("ReadSchema: ")[1].splitlines()[0]
    assert "l_returnflag" not in read_schema
    assert "l_extendedprice" in read_schema


def test_q5_dimensions_broadcast(spark):
    plan = _plan(spark, "q5_regional_revenue")
    assert "BroadcastHashJoin" in plan
    # the fact side must never be nested-loop joined
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q1_partial_aggregation(spark):
    plan = _plan(spark, "q1_pricing_summary")
    # partial (map-side) agg before the exchange, final after: two
    # HashAggregate nodes around one Exchange
    assert plan.count("HashAggregate") >= 2
    assert plan.count("Exchange") >= 1


def _n_exchanges(plan: str) -> int:
    # formatted mode lists each node once in the detail section as
    # "(<id>) Exchange"
    import re

    return len(re.findall(r"^\(\d+\) Exchange", plan, flags=re.M))


def test_exact_dedup_single_shuffle(spark):
    plan = _plan(spark, "dedup_exact")
    # one hash-partitioned exchange on the content hash; partial+final agg
    assert _n_exchanges(plan) == 1
    assert plan.count("HashAggregate") >= 2


def test_geoip_broadcast_not_nested_loop(spark):
    plan = _plan(spark, "geoip_enrich_events")
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ann_ivf_no_cartesian(spark):
    plan = _plan(spark, "ann_ivf_bucketed")
    assert "CartesianProduct" not in plan


def test_sessionize_single_shuffle_on_user(spark):
    plan = _plan(spark, "sessionize_30min")
    # the windows and the session agg share the user_id partitioning:
    # exactly one hash exchange of the fact
    assert _n_exchanges(plan) == 1
