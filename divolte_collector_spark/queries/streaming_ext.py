"""Driver-gated queries that execute a real Structured Streaming job
(availableNow trigger) and return its materialized result.

The stateful session labeler (streaming/stateful.py) is the one
reference semantic (divolte.js cookie sessionization, C3) that needs
arbitrary state; its session-BOUNDARY decisions are nevertheless
SQL-expressible (a lag window), so the driver's DuckDB oracle can
hash-gate it end to end.
"""

from __future__ import annotations

import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from divolte_collector_spark.queries import query
from divolte_collector_spark.session import load_table
from divolte_collector_spark.streaming.stateful import sessionize_stateful

_ORACLE = """
SELECT CAST(event_id AS VARCHAR) AS event_id,
       (prev_ts IS NULL OR epoch_ms(ts) - epoch_ms(prev_ts) > 1800000)
           AS first_in_session
FROM (
    SELECT event_id, ts,
           lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
    FROM events
)
"""


@query("stateful_session_labels", oracle=_ORACLE)
def stateful_session_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the applyInPandasWithState labeler over the events table as
    a stream (availableNow) and emit (event_id, first_in_session).

    The streaming job IS the system under test: state creation,
    sliding-timeout refresh, and cross-batch carry all execute on the
    real state store, then the finished result is handed to the
    driver as a batch DataFrame.
    """
    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("party_id"),
        "event_id",
        F.col("ts").alias("client_time"),
    )
    tmp = tempfile.mkdtemp(prefix="dvs_statefulq_")
    name = "stateful_labels_" + uuid.uuid4().hex[:8]
    try:
        ev.write.mode("overwrite").json(tmp)
        stream = spark.readStream.schema(
            "party_id string, event_id string, client_time timestamp"
        ).json(tmp)
        q = (
            sessionize_stateful(stream, watermark="0 seconds")
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)
        # the memory sink holds the rows after termination; safe to
        # return directly (independent of the json tempdir)
        return spark.table(name).select("event_id", "first_in_session")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
