"""Per-event session labeling on Spark 4's transformWithStateInPandas.

Same reference semantics as streaming/stateful.py (the divolte.js
``_dvs`` cookie: 30-minute sliding expiry, fresh ``'0:' + base36(ms)
+ suffix`` id on gap, first-in-session flag — divolte.js:639-644,
1305-1313) re-expressed on the NEW arbitrary-stateful API so both
generations of the Structured Streaming state surface are covered:

- ``applyInPandasWithState`` (legacy, GroupState): streaming/stateful.py
- ``transformWithStateInPandas`` (Spark 4 StatefulProcessor, typed
  composite state, RocksDB state store): this module

The processor keeps ONE ValueState per party — (last_ms, session_id),
exactly the cookie — so state is ~50 bytes per active party,
partitioned by party key across executors. Production deployments
would add an event-time timer (``handle.registerTimer``) to drop
parties quiet past the watermark horizon; expiry is memory hygiene
only and never affects labels, because a returning party's gap test
(``ms - last_ms > gap``) mints the new session either way.

transformWithStateInPandas requires the RocksDB state store provider
(``ROCKSDB_PROVIDER_CONF``) and, in PySpark, the ``protobuf`` package
for its Python<->JVM state-server protocol. This container ships
neither protobuf nor a way to install it, so the end-to-end stream is
environment-gated behind :func:`tws_available` (exactly like the
Kafka connector probe); the processor's labeling logic is still fully
unit-tested against an in-memory ValueState double, and the legacy-API
twin carries the oracle-gated end-to-end coverage.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from divolte_collector_spark.streaming.stateful import (
    DEFAULT_GAP_SECONDS,
    _mint_session_id,
    _OUTPUT_SCHEMA,
)

ROCKSDB_PROVIDER_CONF = (
    "spark.sql.streaming.stateStore.providerClass",
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
)


def tws_available() -> bool:
    """True when transformWithStateInPandas can actually run: the
    Python state-server protocol imports google.protobuf at stream
    start, so its absence crashes the runner (
    STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE), not the plan."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


class CookieSessionProcessor(StatefulProcessor):
    """The _dvs cookie as a StatefulProcessor."""

    def __init__(self, gap_ms: int) -> None:
        self._gap_ms = gap_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._cookie = handle.getValueState(
            "cookie", "last_ms long, session_id string"
        )

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: Any
    ) -> Iterator[pd.DataFrame]:
        party = key[0]
        if self._cookie.exists():
            last_ms, session_id = self._cookie.get()
        else:
            last_ms, session_id = -1, None
        # one party's events may span several Arrow chunks in arbitrary
        # relative order — materialize, then sort once (see the
        # identical note in streaming/stateful.py)
        pdf = pd.concat(list(rows), ignore_index=True)
        out: list[dict[str, Any]] = []
        if len(pdf):
            pdf = pdf.sort_values(["client_time", "event_id"])
            for ev_id, ts in zip(pdf["event_id"], pdf["client_time"]):
                ms = int(ts.value // 1_000_000)
                first = last_ms < 0 or (ms - last_ms) > self._gap_ms
                if first:
                    session_id = _mint_session_id(party, ms)
                # sliding refresh — never backward (late arrivals must
                # not rewind the inactivity clock; see stateful.py)
                last_ms = max(last_ms, ms)
                out.append(
                    {
                        "party_id": party,
                        "event_id": ev_id,
                        "client_time": ts,
                        "session_id": session_id,
                        "first_in_session": bool(first),
                    }
                )
        self._cookie.update((last_ms, session_id))
        yield pd.DataFrame(out, columns=[f.name for f in _OUTPUT_SCHEMA.fields])

    def close(self) -> None:
        pass


def sessionize_tws(
    events: DataFrame,
    party_col: str = "party_id",
    event_col: str = "event_id",
    ts_col: str = "client_time",
    gap_seconds: int = DEFAULT_GAP_SECONDS,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Label every event of a STREAM with (session_id,
    first_in_session) via transformWithStateInPandas. One shuffle on
    the party key; identical output contract to
    :func:`streaming.stateful.sessionize_stateful`."""
    normalized = events.select(
        F.col(party_col).alias("party_id"),
        F.col(event_col).alias("event_id"),
        F.col(ts_col).alias("client_time"),
    ).withWatermark("client_time", watermark)
    return normalized.groupBy("party_id").transformWithStateInPandas(
        statefulProcessor=CookieSessionProcessor(gap_seconds * 1000),
        outputStructType=_OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="none",
    )
