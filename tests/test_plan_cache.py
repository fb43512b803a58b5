"""Prepared-plan cache (queries/__init__.py): cache_plan queries
return the identical built DataFrame while their input tables are
unchanged, rebuild as soon as any dependency's signature changes, and
never cache when opted out."""

from __future__ import annotations

import os
import uuid

import pytest

from divolte_collector_spark import session as sess
from divolte_collector_spark.queries import (
    _REGISTRY,
    all_queries,
    invalidate_plan_cache,
    query,
)


@pytest.fixture()
def registered(tmp_path):
    """Register a throwaway cache_plan query over a tmp table; clean
    the global registry back up afterwards."""
    name = f"_test_plan_cache_{uuid.uuid4().hex[:8]}"
    builds = []

    @query(name, cache_plan=True)
    def _q(spark, sf_dir):
        builds.append(1)
        return sess.load_table(spark, sf_dir, "t").groupBy().count()

    yield name, builds
    _REGISTRY.pop(name, None)
    invalidate_plan_cache()


def _write(spark, path, values):
    spark.createDataFrame(
        [(int(v),) for v in values], "doc_id long"
    ).coalesce(1).write.mode("overwrite").parquet(path)


def test_hit_is_same_object_and_single_build(spark, tmp_path, registered):
    name, builds = registered
    _write(spark, f"{tmp_path}/t.parquet", [1, 2, 3])
    fn = all_queries()[name].fn
    a = fn(spark, str(tmp_path))
    b = fn(spark, str(tmp_path))
    assert a is b
    assert builds == [1], "second call must not rebuild"
    assert a.collect()[0][0] == 3


def test_changed_dependency_rebuilds(spark, tmp_path, registered):
    name, builds = registered
    _write(spark, f"{tmp_path}/t.parquet", [1, 2, 3])
    fn = all_queries()[name].fn
    assert fn(spark, str(tmp_path)).collect()[0][0] == 3
    _write(spark, f"{tmp_path}/t.parquet", [1, 2, 3, 4])
    assert fn(spark, str(tmp_path)).collect()[0][0] == 4
    assert len(builds) == 2


def test_distinct_sf_dirs_cached_separately(spark, tmp_path, registered):
    name, builds = registered
    _write(spark, f"{tmp_path}/a/t.parquet", [1])
    _write(spark, f"{tmp_path}/b/t.parquet", [1, 2])
    fn = all_queries()[name].fn
    assert fn(spark, f"{tmp_path}/a").collect()[0][0] == 1
    assert fn(spark, f"{tmp_path}/b").collect()[0][0] == 2
    assert fn(spark, f"{tmp_path}/a").collect()[0][0] == 1
    assert len(builds) == 2


def test_env_opt_out_disables_cache(spark, tmp_path, registered, monkeypatch):
    name, builds = registered
    _write(spark, f"{tmp_path}/t.parquet", [1])
    monkeypatch.setenv("SPARK_GRAFT_NO_PLAN_CACHE", "1")
    fn = all_queries()[name].fn
    a = fn(spark, str(tmp_path))
    b = fn(spark, str(tmp_path))
    assert a is not b
    assert len(builds) == 2


def test_uncached_query_builds_every_call(spark, tmp_path):
    name = f"_test_nocache_{uuid.uuid4().hex[:8]}"
    builds = []

    @query(name)
    def _q(spark_, sf_dir):
        builds.append(1)
        return sess.load_table(spark_, sf_dir, "t")

    try:
        _write(spark, f"{tmp_path}/t.parquet", [1])
        fn = all_queries()[name].fn
        fn(spark, str(tmp_path))
        fn(spark, str(tmp_path))
        assert len(builds) == 2
    finally:
        _REGISTRY.pop(name, None)


def test_nested_hit_propagates_deps_to_outer_build(spark, tmp_path):
    """A cache HIT inside an enclosing build must still record its
    dependencies in the outer frame — otherwise the outer plan's dep
    set is incomplete and survives a table regeneration."""
    inner_name = f"_test_inner_{uuid.uuid4().hex[:8]}"
    outer_name = f"_test_outer_{uuid.uuid4().hex[:8]}"

    @query(inner_name, cache_plan=True)
    def _inner(spark_, sf_dir):
        return sess.load_table(spark_, sf_dir, "t")

    @query(outer_name, cache_plan=True)
    def _outer(spark_, sf_dir):
        return all_queries()[inner_name].fn(spark_, sf_dir).groupBy().count()

    try:
        _write(spark, f"{tmp_path}/t.parquet", [1, 2])
        fn_in = all_queries()[inner_name].fn
        fn_out = all_queries()[outer_name].fn
        fn_in(spark, str(tmp_path))  # prime the inner cache
        assert fn_out(spark, str(tmp_path)).collect()[0][0] == 2
        _write(spark, f"{tmp_path}/t.parquet", [1, 2, 3])
        assert fn_out(spark, str(tmp_path)).collect()[0][0] == 3
    finally:
        _REGISTRY.pop(inner_name, None)
        _REGISTRY.pop(outer_name, None)
        invalidate_plan_cache()


def test_invalidate_table_cache_drops_prepared_plans(spark, tmp_path, registered):
    name, builds = registered
    _write(spark, f"{tmp_path}/t.parquet", [1])
    fn = all_queries()[name].fn
    fn(spark, str(tmp_path))
    sess.invalidate_table_cache()
    fn(spark, str(tmp_path))
    assert len(builds) == 2, "invalidate_table_cache must drop prepared plans"
