"""Query registry: every driver-gated query registers here.

Each query is a ``(spark, sf_dir) -> DataFrame`` callable plus an
optional DuckDB-runnable oracle SQL string.  ``__spark_entry__``
re-exports the registry as ``queries()`` / ``oracle_sql()``.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class RegisteredQuery:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB ANSI SQL; None => rows-only driver check


_REGISTRY: dict[str, RegisteredQuery] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = RegisteredQuery(name, fn, oracle)
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
