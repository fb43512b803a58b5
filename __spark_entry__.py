"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()``   — every implemented operator from SURVEY.md §2
                  (registered in divolte_collector_spark.queries).
``oracle_sql()``— matching DuckDB SQL for the correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from divolte_collector_spark.queries import alias_map, all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: 30-minute sessionization of the event stream
    (reference C3 — the one piece of query semantics divolte itself
    defines) at sf0.001."""
    from divolte_collector_spark.operators.sessionize import session_stats
    from divolte_collector_spark.session import load_table

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    return session_stats(events)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: rq.fn for name, rq in sorted(all_queries().items())}


def oracle_sql() -> dict[str, str]:
    return {
        name: rq.oracle
        for name, rq in sorted(all_queries().items())
        if rq.oracle is not None
    }


def aliases() -> dict[str, str]:
    """Former board name -> canonical name for every rename a window
    rotation ever performed. Not part of the driver contract; kept so
    external consumers pinned to an old name can resolve it
    (``queries()[aliases().get(name, name)]``). Alias keys are
    deliberately absent from ``queries()`` — including them would
    reshuffle the driver's sorted 50-name checked window and spend
    window slots re-checking the same query twice."""
    return alias_map()
