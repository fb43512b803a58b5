"""Driver-gated queries that execute a real Structured Streaming job
(availableNow trigger) and return its materialized result.

The stateful session labeler (streaming/stateful.py) is the one
reference semantic (divolte.js cookie sessionization, C3) that needs
arbitrary state; its session-BOUNDARY decisions are nevertheless
SQL-expressible (a lag window), so the driver's DuckDB oracle can
hash-gate it end to end.
"""

from __future__ import annotations

import contextlib
import shutil
import tempfile
import uuid

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from divolte_collector_spark.queries import query
from divolte_collector_spark.queries._persist import detach_result
from divolte_collector_spark.session import load_table
from divolte_collector_spark.streaming.stateful import sessionize_stateful

def _await_or_die(q, seconds: int = 600) -> None:
    """awaitTermination returns False on timeout — proceeding then would
    read a partially merged/filled sink; fail loudly instead."""
    if not q.awaitTermination(seconds):
        q.stop()
        raise TimeoutError(
            f"streaming query {q.name or q.id} did not finish within "
            f"{seconds}s; refusing to read a partial result"
        )


# MICROSECONDS: the default JSON timestamp format truncates to ms, and
# the oracles order/bound by the full-precision ts — one shared literal
# so the replay path can't silently diverge between queries.
_REPLAY_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"


@contextlib.contextmanager
def _replayed_json(spark: SparkSession, df: DataFrame):
    """Replay a batch DataFrame as a file stream: write it to a JSON
    tempdir (microsecond timestamps) and yield a reader factory —
    ``read(schema) -> streaming DataFrame`` — so a query can open one
    or several readStream readers over the same replayed log. The
    tempdir is removed on exit (memory-sink results survive it)."""
    tmp = tempfile.mkdtemp(prefix="dvs_replay_")
    try:
        df.write.mode("overwrite").option(
            "timestampFormat", _REPLAY_TS_FMT
        ).json(tmp)

        def read(schema: str) -> DataFrame:
            return (
                spark.readStream.schema(schema)
                .option("timestampFormat", _REPLAY_TS_FMT)
                .json(tmp)
            )

        yield read
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@contextlib.contextmanager
def _replayed_json_time_ordered(
    spark: SparkSession, df: DataFrame, ts_col: str, n_files: int = 16
):
    """Replay a batch DataFrame as a TIME-ORDERED file stream: range-
    partition on the event-time column (file k's max ts <= file k+1's
    min ts), write once, then pin the discovery order (sortable names
    AND strictly increasing mtimes — FileStreamSource orders new files
    by modification time with path as tiebreak). Reading the yielded
    factory with ``maxFilesPerTrigger=1`` gives one micro-batch per
    time band, so event time advances monotonically across batches and
    REALISTIC watermarks operate: state eviction actually runs while a
    batch oracle still predicts the full output (nothing arrives later
    than the watermark, because the replay is ordered).

    ``_replayed_json`` (unordered, single batch) remains for queries
    where cross-batch time order is irrelevant.
    """
    import os

    tmp = tempfile.mkdtemp(prefix="dvs_replay_ord_")
    try:
        (
            df.repartitionByRange(n_files, F.col(ts_col))
            .sortWithinPartitions(ts_col)
            .write.mode("overwrite")
            .option("timestampFormat", _REPLAY_TS_FMT)
            .json(tmp)
        )
        parts = sorted(
            f for f in os.listdir(tmp) if f.startswith("part-")
        )
        base = None
        for i, name in enumerate(parts):
            path = os.path.join(tmp, name)
            if base is None:
                base = os.stat(path).st_mtime
            os.utime(path, (base + i, base + i))

        def read(schema: str) -> DataFrame:
            return (
                spark.readStream.schema(schema)
                .option("timestampFormat", _REPLAY_TS_FMT)
                .option("maxFilesPerTrigger", 1)
                .json(tmp)
            )

        yield read
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _run_to_memory(
    spark: SparkSession,
    out: DataFrame,
    prefix: str,
    state_partitions: int | None = None,
) -> DataFrame:
    """availableNow append run into a uniquely-named memory sink; the
    sink holds the rows after termination, independent of any replay
    tempdir.

    ``state_partitions`` pins spark.sql.shuffle.partitions for THIS
    stream only (captured at .start(), restored after termination):
    a many-micro-batch replay pays the per-batch state-store task
    overhead times the partition count, so a 16-batch harness run at
    32 partitions spends ~all its time on empty state tasks. Purely a
    harness knob — on a real cluster the state partition count is a
    deployment setting sized to the key cardinality.

    CONCURRENCY CONTRACT: the conf mutation is session-global, so any
    query planned in this session while the stream drains would
    silently inherit the reduced partition count. A ``newSession()``
    clone can't isolate it (the stream plan is bound to the parent
    session and a fresh SQLConf would drop the pinned tz/ANSI confs),
    so instead we ASSERT the single-stream assumption the gate
    harness guarantees: no other stream may be active when the conf
    is taken."""
    name = prefix + uuid.uuid4().hex[:8]
    conf_key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(conf_key)
    try:
        if state_partitions is not None:
            active = spark.streams.active
            if active:
                raise RuntimeError(
                    "_run_to_memory(state_partitions=...) requires "
                    "exclusive session use, but streams are active: "
                    f"{[q.name for q in active]}"
                )
            spark.conf.set(conf_key, str(state_partitions))
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        _await_or_die(q, 600)
    finally:
        spark.conf.set(conf_key, prev)
    return spark.table(name)


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


@query(
    "c3s_stateful_session_labels",
    oracle=_ORACLE,
    aliases=("stateful_session_labels",),
)
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
    with _replayed_json(spark, ev) as read:
        stream = read(
            "party_id string, event_id string, client_time timestamp"
        )
        labeled = sessionize_stateful(stream, watermark="0 seconds")
        return _run_to_memory(spark, labeled, "stateful_labels_").select(
            "event_id", "first_in_session"
        )


_SESSION_WINDOW_STREAM_ORACLE = """
WITH flagged AS (
    SELECT user_id, ts,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) >= 1800000
                THEN 1 ELSE 0 END AS new_s
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), sess AS (
    SELECT user_id, ts,
           sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS seq
    FROM flagged
), agg AS (
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           min(ts) AS session_start, max(ts) AS session_end
    FROM sess GROUP BY user_id, seq
)
SELECT user_id, n_events, session_start, session_end
FROM agg
-- append-mode emission: a session window [start, last+gap) is emitted
-- once the watermark (here: max event time, delay 0) passes its END
WHERE epoch_ms(session_end) + 1800000 <= (SELECT max(epoch_ms(ts)) FROM events)
"""


@query("streaming_session_windows", oracle=_SESSION_WINDOW_STREAM_ORACLE)
def streaming_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native F.session_window over a REAL stream (availableNow):
    30-minute inactivity windows per user, append-mode emission gated
    by the watermark. The oracle reproduces both the window merge
    (gap >= 30 min splits — session_window closes when the gap reaches
    the timeout) and the emission rule (window end = last event + gap
    must be <= the final watermark).
    """
    from divolte_collector_spark.streaming.ingest import sessionize_stream

    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("user_id"),
        F.col("ts").alias("client_time"),
    )
    with _replayed_json(spark, ev) as read:
        stream = read("user_id string, client_time timestamp")
        sessions = sessionize_stream(
            stream, party_col="user_id", watermark="0 seconds"
        )
        result = _run_to_memory(
            spark,
            sessions.select(
                "user_id", "n_events", "session_start", "session_end"
            ),
            "sess_windows_",
        )
        return result.select(
            F.col("user_id").cast("long").alias("user_id"),
            "n_events",
            "session_start",
            "session_end",
        )


_UPSERT_ORACLE = """
SELECT user_id, CAST(event_id AS BIGINT) AS event_id, event_type
FROM (
    SELECT user_id, event_id, event_type,
           row_number() OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id DESC
           ) AS rn
    FROM events
)
WHERE rn = 1
"""


@query("streaming_upsert_latest", oracle=_UPSERT_ORACLE)
def streaming_upsert_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintain a latest-event-per-user TABLE with the foreachBatch
    upsert sink (streaming/upsert.py): the events table replays as a
    multi-batch stream (maxFilesPerTrigger=1 over several json parts
    forces real incremental merges), each micro-batch merges into the
    keyed parquet table with an atomic version-pointer flip, and the
    published table is returned. The oracle is the batch argmax — the
    streamed merge sequence must converge to exactly it."""
    from divolte_collector_spark.streaming.upsert import (
        read_upsert_table,
        upsert_sink,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts"
    )
    base = tempfile.mkdtemp(prefix="dvs_upsertq_")
    src, table, ckpt = (f"{base}/{d}" for d in ("src", "table", "ckpt"))
    try:
        # several source files -> several micro-batches -> several merges
        # (microsecond-preserving format: ts is the merge order key)
        fmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
        ev.repartition(2).write.mode("overwrite").option(
            "timestampFormat", fmt
        ).json(src)
        stream = (
            spark.readStream.schema(
                "user_id long, event_id long, event_type string, ts timestamp"
            )
            .option("timestampFormat", fmt)
            .option("maxFilesPerTrigger", "1")
            .json(src)
        )
        q = (
            upsert_sink(
                stream, table, ckpt,
                key_cols=["user_id"], order_col="ts", tiebreak="event_id",
            )
            .trigger(availableNow=True)
            .start()
        )
        _await_or_die(q, 600)
        out = read_upsert_table(spark, table).select(
            "user_id", "event_id", "event_type"
        )
        # detach from the tempdir without a driver roundtrip
        return detach_result(spark, out)
    finally:
        shutil.rmtree(base, ignore_errors=True)


_ERASURE_ORACLE = """
SELECT user_id, CAST(event_id AS BIGINT) AS event_id
FROM (
    SELECT user_id, event_id,
           row_number() OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id DESC
           ) AS rn
    FROM events
)
WHERE rn = 1 AND user_id % 5 <> 0
"""


@query("user_erasure_rewrite", oracle=_ERASURE_ORACLE)
def user_erasure_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten end to end: materialize the latest-per-user
    versioned table (streaming/upsert.py), erase every user whose id is
    divisible by 5 with the atomic rewrite-and-retire primitive, and
    return the published table — which must equal the oracle's
    filtered argmax exactly."""
    from divolte_collector_spark.streaming.upsert import (
        erase_keys,
        merge_batch,
        read_upsert_table,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts"
    )
    # the erasure subject set stays a DataFrame end to end: at 100 TB
    # "every distinct user through the driver" is the anti-pattern —
    # erase_keys anti-joins the subject relation executor-side
    subjects = (
        ev.filter(F.col("user_id") % 5 == 0).select("user_id").distinct()
    )
    base = tempfile.mkdtemp(prefix="dvs_eraseq_")
    try:
        merge_batch(
            spark, ev, 0, f"{base}/table",
            key_cols=["user_id"], order_col="ts", tiebreak="event_id",
        )
        erase_keys(spark, f"{base}/table", "user_id", subjects)
        out = read_upsert_table(spark, f"{base}/table").select(
            "user_id", "event_id"
        )
        # detach from the tempdir without a driver roundtrip
        return detach_result(spark, out)
    finally:
        shutil.rmtree(base, ignore_errors=True)


_UPSERT_MOVED_ORACLE = """
SELECT user_id, CAST(event_id AS BIGINT) AS event_id,
       CAST(ts AS DATE) AS day
FROM (
    SELECT user_id, event_id, ts,
           row_number() OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id DESC
           ) AS rn
    FROM events
)
WHERE rn = 1
"""


@query("streaming_upsert_moved_keys", oracle=_UPSERT_MOVED_ORACLE)
def streaming_upsert_moved_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The partition-touch merge under its hardest case, end to end:
    the table partitions by LAST-ACTIVITY DATE — a partition value
    that MOVES whenever a user's newer event lands on a different day.
    The events stream replays in event-time order (sorted source
    files, maxFilesPerTrigger=1), so nearly every user's row migrates
    across day-partitions batch by batch; a merge that only rewrote
    batch-named partitions would leave the stale row alive in the old
    day and break latest-per-key (the round-4 moved-key fix, here
    under the oracle gate rather than a unit test). The batch argmax
    with its day is the whole truth the merged table must converge to."""
    from divolte_collector_spark.streaming.upsert import (
        read_upsert_table,
        upsert_sink,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", F.to_date("ts").alias("day")
    )
    base = tempfile.mkdtemp(prefix="dvs_upsertmv_")
    src, table, ckpt = (f"{base}/{d}" for d in ("src", "table", "ckpt"))
    try:
        # event-time-ordered source files: early days arrive first, so
        # users' latest rows migrate to later day-partitions over the
        # run (sortWithinPartitions on a single output partition gives
        # a deterministic file order the file source replays in order)
        fmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
        (
            ev.repartition(1)
            .sortWithinPartitions("ts")
            .write.mode("overwrite")
            .option("maxRecordsPerFile", 2500)
            .option("timestampFormat", fmt)
            .json(src)
        )
        stream = (
            spark.readStream.schema(
                "user_id long, event_id long, ts timestamp, day date"
            )
            .option("timestampFormat", fmt)
            .option("maxFilesPerTrigger", "1")
            .json(src)
        )
        q = (
            upsert_sink(
                stream, table, ckpt,
                key_cols=["user_id"], order_col="ts", tiebreak="event_id",
                partition_col="day",
            )
            .trigger(availableNow=True)
            .start()
        )
        _await_or_die(q, 600)
        out = read_upsert_table(spark, table).select(
            "user_id", "event_id", "day"
        )
        # detach from the tempdir without a driver roundtrip
        return detach_result(spark, out)
    finally:
        shutil.rmtree(base, ignore_errors=True)


# --- K3 via the topic emulator, under the exact-hash gate -------------------

_KAFKA_RT_ORACLE = """
SELECT event_id, CAST(user_id AS VARCHAR) AS party_id,
       event_type AS et, epoch_ms(ts) AS client_ms,
       CAST(42 AS BIGINT) AS schema_id
FROM events
"""


@query(
    "e2e_kafka_roundtrip",
    oracle=_KAFKA_RT_ORACLE,
    aliases=("streaming_kafka_emulated_roundtrip",),
)
def streaming_kafka_emulated_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The full K3 transport under the oracle gate: mapped events →
    Confluent-framed (key, value) bytes → murmur2-partitioned produce
    into the file-backed topic log → kafka-scan-schema read →
    ``decode_kafka_events`` — every field must survive byte-exactly
    and carry the registry id. The emulator is a drop-in for the
    broker (sources/kafka_emulator.py); the framing/decode under test
    is the production path (KafkaFlusher.java:53-101,
    Confluent wire format)."""
    from divolte_collector_spark.sources.kafka_emulator import (
        produce_batch,
        read_topic,
    )
    from divolte_collector_spark.sources.kafka_source import (
        decode_kafka_events,
    )
    from divolte_collector_spark.streaming.sinks import kafka_frame

    schema = {
        "type": "record",
        "name": "DivolteEvent",
        "fields": [
            {"name": "party_id", "type": "string"},
            {"name": "event_id", "type": "long"},
            {"name": "et", "type": ["null", "string"], "default": None},
            {"name": "client_ms", "type": "long"},
        ],
    }
    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("party_id"),
        "event_id",
        F.col("event_type").alias("et"),
        F.unix_millis(F.col("ts")).alias("client_ms"),
    )
    base = tempfile.mkdtemp(prefix="dvs_kafkart_")
    try:
        framed = kafka_frame(ev, schema, mode="confluent", confluent_id=42)
        produce_batch(spark, framed, base, "events", batch_id=0)
        decoded = decode_kafka_events(
            read_topic(spark, base, "events"), schema, mode="confluent"
        )
        out = decoded.select(
            "event_id",
            "party_id",
            "et",
            "client_ms",
            F.col("_schema_id").alias("schema_id"),
        )
        # detach from the tempdir without a driver roundtrip
        return detach_result(spark, out)
    finally:
        shutil.rmtree(base, ignore_errors=True)


# --- K2 via the compose-append store, under the exact-hash gate -------------

_GCS_RT_ORACLE = """
SELECT event_id, event_type AS et, epoch_ms(ts) AS client_ms,
       CAST(user_id AS VARCHAR) AS party
FROM events
"""


@query(
    "e2e_gcs_compose_roundtrip",
    oracle=_GCS_RT_ORACLE,
    aliases=("streaming_gcs_compose_roundtrip",),
)
def streaming_gcs_compose_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The full K2 lifecycle under the oracle gate: mapped events →
    per-(roll, partition) compose-append chains into the filesystem
    object store (header upload, part + compose per sync interval,
    compose-to-publish) → the published objects parsed back through
    the container reader, DISTRIBUTED over the manifest (the driver
    holds object names only). Any defect in the compose framing, sync
    blocks, or record codec breaks the hash
    (GoogleCloudStorageFileManager.java:161-290)."""
    import pandas as pd

    from pyspark.sql import types as T

    from divolte_collector_spark.functions.avro_codec import read_container
    from divolte_collector_spark.streaming.gcs import (
        FilesystemObjectStore,
        gcs_write_avro_files,
    )

    schema = {
        "type": "record",
        "name": "DivolteEvent",
        "fields": [
            {"name": "event_id", "type": "long"},
            {"name": "et", "type": ["null", "string"], "default": None},
            {"name": "client_ms", "type": "long"},
            {"name": "party", "type": "string"},
        ],
    }
    cols = [f["name"] for f in schema["fields"]]
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.col("event_type").alias("et"),
        F.unix_millis(F.col("ts")).alias("client_ms"),
        F.col("user_id").cast("string").alias("party"),
        # day-truncated roll keeps the object count bounded by the
        # date span, not the event count
        F.date_trunc("day", F.col("ts")).alias("client_time"),
    )
    base = tempfile.mkdtemp(prefix="dvs_gcsrt_")
    try:
        manifest = gcs_write_avro_files(
            ev, schema,
            store_factory=lambda root=base: FilesystemObjectStore(root),
            batch_tag="0",
        )
        names = spark.createDataFrame(
            [(n,) for n, _ in manifest], "obj string"
        ).repartition(8)

        out_schema = T.StructType(
            [
                T.StructField("event_id", T.LongType()),
                T.StructField("et", T.StringType()),
                T.StructField("client_ms", T.LongType()),
                T.StructField("party", T.StringType()),
            ]
        )

        def parse(it):
            store = FilesystemObjectStore(base)
            for pdf in it:
                rows = []
                for obj in pdf["obj"]:
                    _, recs = read_container(store.get(obj))
                    rows.extend(recs)
                yield pd.DataFrame(rows, columns=cols)

        out = names.mapInPandas(parse, out_schema)
        # detach from the tempdir without a driver roundtrip
        return detach_result(spark, out)
    finally:
        shutil.rmtree(base, ignore_errors=True)


# --- K4 publisher loop under the exact-hash gate ----------------------------


class _JsonlStoreClient:
    """Sandbox Pub/Sub stand-in: publishes land as JSON lines in a
    shared directory (one file per client instance = per partition) —
    the same injectable surface a real Publisher wrapper implements.
    Product-side because the gated roundtrip needs a concrete client;
    tests use their own recording stubs.

    Commit protocol: messages append to an underscore-prefixed
    staging file (Spark's readers ignore ``_``-prefixed paths), and
    ``commit()`` — called by ``publish_messages`` after the partition
    flush succeeds — renames it visible. A task retry or speculative
    attempt that dies mid-partition therefore leaves no readable
    partial output (the same attempt-safety discipline as the kafka
    emulator's dir-rename commit and the GCS attempt-unique chains)."""

    def __init__(self, out_dir: str):
        import os
        import uuid as _uuid

        os.makedirs(out_dir, exist_ok=True)
        self._final = f"{out_dir}/c{_uuid.uuid4().hex}.jsonl"
        self._staging = f"{out_dir}/_c{_uuid.uuid4().hex}.jsonl.partial"

    def publish(self, data: bytes, attributes: dict) -> str:
        import json as _json

        with open(self._staging, "a") as fh:
            fh.write(
                _json.dumps(
                    {"data": data.hex(), "attributes": attributes}
                )
                + "\n"
            )
        return "ok"

    def commit(self) -> None:
        import os

        if os.path.exists(self._staging):
            os.replace(self._staging, self._final)


def _pubsub_fingerprint(schema: dict) -> str:
    import base64

    from divolte_collector_spark.functions.avro_codec import (
        schema_fingerprint_sha256,
    )

    return base64.urlsafe_b64encode(
        schema_fingerprint_sha256(schema)
    ).decode("ascii")


_PUBSUB_SCHEMA = {
    "type": "record",
    "name": "DivolteEvent",
    "fields": [
        {"name": "party_id", "type": "string"},
        {"name": "event_id", "type": "string"},
        {"name": "et", "type": ["null", "string"], "default": None},
    ],
}

_PUBSUB_RT_ORACLE = f"""
SELECT CAST(event_id AS VARCHAR) AS event_id,
       CAST(user_id AS VARCHAR) AS party_id,
       event_type AS et,
       strftime(ts, '%Y-%m-%dT%H:%M:%S.%f') || 'Z' AS msg_ts,
       '{{fp}}' AS fingerprint,
       '0x2a' AS confluent_id
FROM events
""".replace("{fp}", _pubsub_fingerprint(_PUBSUB_SCHEMA))


@query(
    "e2e_pubsub_roundtrip",
    oracle=_PUBSUB_RT_ORACLE,
    aliases=("streaming_pubsub_emulated_roundtrip",),
)
def streaming_pubsub_emulated_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The full K4 path under the oracle gate: mapped events → message
    construction (binary-Avro data + the flusher's exact attribute
    map) → the executor-distributed publisher loop against the
    injectable client → published messages read back, Avro-decoded,
    and verified field-exact INCLUDING the ISO timestamp, base64url
    SHA-256 schema fingerprint, and 0x-hex registry id
    (GoogleCloudPubSubFlusher.java:45-91)."""
    import pandas as pd

    from pyspark.sql import types as T

    from divolte_collector_spark.functions.avro_codec import decode_record
    from divolte_collector_spark.streaming.pubsub import publish_messages
    from divolte_collector_spark.streaming.sinks import pubsub_messages

    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("party_id"),
        F.col("event_id").cast("string").alias("event_id"),
        F.col("event_type").alias("et"),
        F.col("ts").alias("client_time"),
    )
    base = tempfile.mkdtemp(prefix="dvs_pubsubrt_")
    try:
        msgs = pubsub_messages(ev, _PUBSUB_SCHEMA, confluent_id=0x2A)
        publish_messages(
            msgs, client_factory=lambda out=base: _JsonlStoreClient(out)
        )

        out_schema = T.StructType(
            [
                T.StructField("event_id", T.StringType()),
                T.StructField("party_id", T.StringType()),
                T.StructField("et", T.StringType()),
                T.StructField("msg_ts", T.StringType()),
                T.StructField("fingerprint", T.StringType()),
                T.StructField("confluent_id", T.StringType()),
            ]
        )

        published = spark.read.json(base)

        def decode(it):
            for pdf in it:
                rows = []
                for _, r in pdf.iterrows():
                    rec = decode_record(
                        _PUBSUB_SCHEMA, bytes.fromhex(r["data"])
                    )
                    att = r["attributes"]
                    rows.append(
                        {
                            "event_id": rec["event_id"],
                            "party_id": rec["party_id"],
                            "et": rec["et"],
                            "msg_ts": att["timestamp"],
                            "fingerprint": att["schemaFingerprint"],
                            "confluent_id": att["schemaConfluentId"],
                        }
                    )
                yield pd.DataFrame(
                    rows, columns=[f.name for f in out_schema.fields]
                )

        out = published.mapInPandas(decode, out_schema)
        # detach from the tempdir without a driver roundtrip
        return detach_result(spark, out)
    finally:
        shutil.rmtree(base, ignore_errors=True)


# --- CDC log apply (lakehouse change-log compaction) -------------------------
# The batch half of CDC ingestion: an ordered insert/update/delete log
# per key collapses to the final table state — the compaction every
# lakehouse table format runs. Only the LAST operation per key decides
# the outcome (I/U set the payload, D removes the key), so the whole
# apply is ONE aggregation: max(struct(seq, op, payload)) per key —
# map-side combined, skew-safe (a key updated a billion times
# collapses per map partition), no window, no self-join. The log is
# synthesized from events (op from event_type, seq from (ts,
# event_id)) so the oracle predicts the final state from raw columns.

_CDC_ORACLE = """
WITH log AS (
    SELECT user_id % 500 AS key,
           CASE WHEN event_type = 'signup' THEN 'I'
                WHEN event_type = 'error' THEN 'D'
                ELSE 'U' END AS op,
           value AS payload, ts, event_id
    FROM events
),
last AS (
    SELECT key, op, payload,
           row_number() OVER (PARTITION BY key
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM log
)
SELECT key, op AS last_op, payload AS value
FROM last WHERE rn = 1 AND op <> 'D'
"""


@query("table_cdc_apply", oracle=_CDC_ORACLE)
def q_table_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    from divolte_collector_spark.session import load_table

    ev = load_table(spark, sf_dir, "events")
    op = (
        F.when(F.col("event_type") == "signup", "I")
        .when(F.col("event_type") == "error", "D")
        .otherwise("U")
    )
    log = ev.select(
        (F.col("user_id") % 500).alias("key"),
        F.struct(
            F.col("ts"), F.col("event_id"), op.alias("op"),
            F.col("value").alias("payload"),
        ).alias("entry"),
    )
    final = log.groupBy("key").agg(F.max("entry").alias("last"))
    return final.filter(F.col("last.op") != "D").select(
        "key",
        F.col("last.op").alias("last_op"),
        F.col("last.payload").alias("value"),
    )


# --- stream-stream interval join ---------------------------------------------
# The streaming half of the as-of family, run as a REAL stream-stream
# join (two readStream readers over the same event log, watermarks on
# both sides, availableNow): each purchase pairs with the same user's
# views in the preceding 30 minutes. State is bounded by
# key-cardinality x the delay band — the property that survives a
# 100 TB/day stream where an unbounded join would not
# (streaming/ingest.py:interval_join_streams).
#
# Watermark choice: the replay is TIME-ORDERED (one range-partitioned
# file per micro-batch, _replayed_json_time_ordered), so a realistic
# 45-minute watermark runs under the oracle: the watermark advances
# with every file, buffered views are EVICTED once it passes
# view_ts + 30min, and no match is lost because every later file holds
# only later event times (a purchase needing an evicted view would
# itself be behind the watermark). The state bound that makes this
# operator 100 TB-safe is therefore exercised by the gate itself —
# tests/test_streaming.py additionally pins that state row counts
# plateau far below the stream's total row count.

_IJ_ORACLE = """
WITH p AS (
    SELECT user_id, event_id AS purchase_id, ts AS purchase_ts
    FROM events WHERE event_type = 'purchase'
),
v AS (
    SELECT user_id, event_id AS view_id, ts AS view_ts
    FROM events WHERE event_type = 'view'
)
SELECT p.user_id, p.purchase_id, v.view_id,
       CAST(epoch_ms(p.purchase_ts) - epoch_ms(v.view_ts) AS BIGINT)
           AS lead_ms
FROM p JOIN v
  ON v.user_id = p.user_id
 AND v.view_ts <= p.purchase_ts
 AND v.view_ts >= p.purchase_ts - INTERVAL 30 MINUTE
"""


@query(
    "interval_join_views_streaming",
    oracle=_IJ_ORACLE,
    aliases=("streaming_interval_join_views",),
)
# board name until round 10: streaming_interval_join_views (renamed to
# rotate this never-driver-checked gate into the checked prefix)
def streaming_interval_join_views(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from divolte_collector_spark.streaming.ingest import interval_join_streams

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    schema = "event_id long, ts timestamp, user_id long, event_type string"
    with _replayed_json_time_ordered(spark, ev, "ts", n_files=8) as read:

        def read_side(etype: str, id_alias: str, ts_alias: str) -> DataFrame:
            return (
                read(schema)
                .filter(F.col("event_type") == etype)
                .select(
                    "user_id",
                    F.col("event_id").alias(id_alias),
                    F.col("ts").alias(ts_alias),
                )
            )

        joined = interval_join_streams(
            read_side("purchase", "purchase_id", "purchase_ts"),
            read_side("view", "view_id", "view_ts"),
            key="user_id",
            left_ts="purchase_ts",
            right_ts="view_ts",
            max_delay="30 minutes",
            watermark="45 minutes",  # realistic; see comment above
        )
        out = joined.select(
            F.col("l.user_id").alias("user_id"),
            "purchase_id",
            "view_id",
            (
                F.unix_millis(F.col("purchase_ts"))
                - F.unix_millis(F.col("view_ts"))
            ).alias("lead_ms"),
        )
        return _run_to_memory(
            spark, out, "interval_join_", state_partitions=8
        )


# --- late-data drop under a windowed aggregation ------------------------------
# The half of the watermark contract the interval-join gate doesn't
# cover: rows arriving AFTER the watermark passed their window must be
# DROPPED from an event-time aggregation (not merged, not crashing).
# Deterministic construction so a batch oracle predicts the exact
# surviving counts:
#   - arrival order = calendar day of `ts` (one file per day, replayed
#     one micro-batch per file);
#   - event time `et` = ts, except a fixed 1-in-17 subset arrives
#     30 HOURS late (et = ts - 30h). The shift must clear the filter's
#     batch lag: the late filter for day-k rows uses the watermark from
#     day k-2 (~ day_k start - 25h), so a 3-hour shift could NEVER
#     drop anything (review finding: the first cut of this gate gated
#     zero drops); at 30h the subset's first ~5 hours of each day fall
#     behind it and genuinely drop, while the rest merge late into
#     live windows — both paths exercised and both predicted;
#   - watermark delay 1 hour on `et`, tumbling 1-hour windows.
# Spark semantics mirrored in SQL (empirically pinned on this Spark
# via three controlled probes — see tests/test_streaming.py):
#   W_k = max(et over batches < k) - delay (the value each batch's
#   progress reports). State EVICTION+EMISSION during batch k uses
#   W_k (windows with end <= W_k emit, inclusive), but the LATE-ROW
#   FILTER lags one batch: a row in batch k is dropped iff its
#   window end <= W_{k-1} — i.e. only rows whose window was already
#   emitted in an EARLIER batch drop (a late row landing in the very
#   batch that evicts its window still counts; numRowsDroppedByWatermark
#   confirms). availableNow runs a final empty batch, so the last
#   emission uses W_final = global max(et) - delay; windows ending
#   after that stay in state and never emit.

_LATE_DELAY_MS = 3_600_000  # 1 hour watermark delay
_LATE_SHIFT_MS = 108_000_000  # late rows arrive 30 hours late

_LATE_ORACLE = f"""
WITH ev AS (
    SELECT event_type, ts,
           day(ts) AS arrival_day,
           CASE WHEN event_id % 17 = 0
                THEN ts - INTERVAL 30 HOUR ELSE ts END AS et
    FROM events
),
batch_max AS (
    SELECT arrival_day, max(epoch_ms(et)) AS m
    FROM ev GROUP BY arrival_day
),
wm AS (
    -- the late-row filter's watermark lags eviction by one batch:
    -- W_{{k-1}} = max over batches <= k-2
    SELECT arrival_day,
           coalesce(max(m) OVER (ORDER BY arrival_day
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 2 PRECEDING), 0)
               - {_LATE_DELAY_MS} AS filter_wm_ms
    FROM batch_max
),
kept AS (
    SELECT e.event_type,
           epoch_ms(time_bucket(INTERVAL 1 HOUR, e.et)) AS win_ms
    FROM ev e JOIN wm w ON w.arrival_day = e.arrival_day
    WHERE epoch_ms(time_bucket(INTERVAL 1 HOUR, e.et)) + 3600000
          > w.filter_wm_ms
),
final_wm AS (
    SELECT max(epoch_ms(et)) - {_LATE_DELAY_MS} AS wm_ms FROM ev
)
SELECT make_timestamp(win_ms * 1000) AS window_start,
       event_type,
       CAST(count(*) AS BIGINT) AS n
FROM kept CROSS JOIN final_wm
WHERE win_ms + 3600000 <= final_wm.wm_ms
GROUP BY win_ms, event_type
"""


@contextlib.contextmanager
def _replayed_day_files(spark: SparkSession, ev: DataFrame):
    """One file per calendar day of ``ts``, discovery-ordered by day:
    hash the 30 distinct days over 30 tasks => exactly one part file
    per day directory, then flatten to sortable names with increasing
    mtimes (same discipline as ``_replayed_json_time_ordered``, but
    the bucketing must be DETERMINISTIC — range-partition boundaries
    are sampled, so an oracle could not reproduce them). Yields a
    ``read(schema) -> streaming DataFrame`` factory with
    maxFilesPerTrigger=1. Shared by the late-data gates (tumbling and
    sliding)."""
    import os

    tmp = tempfile.mkdtemp(prefix="dvs_dayreplay_")
    try:
        (
            ev.withColumn("_day", F.dayofmonth("ts"))
            .repartition(31, "_day")
            .write.mode("overwrite")
            .option("timestampFormat", _REPLAY_TS_FMT)
            .partitionBy("_day")
            .json(tmp)
        )
        base = None
        for day_dir in sorted(
            d for d in os.listdir(tmp) if d.startswith("_day=")
        ):
            day = int(day_dir.split("=")[1])
            parts = [
                f
                for f in os.listdir(os.path.join(tmp, day_dir))
                if f.startswith("part-")
            ]
            assert len(parts) == 1, (day_dir, parts)
            dst = os.path.join(tmp, f"{day:02d}.json")
            os.rename(os.path.join(tmp, day_dir, parts[0]), dst)
            if base is None:
                base = os.stat(dst).st_mtime
            os.utime(dst, (base + day, base + day))

        def read(schema: str) -> DataFrame:
            return (
                spark.readStream.schema(schema)
                .option("timestampFormat", _REPLAY_TS_FMT)
                .option("maxFilesPerTrigger", 1)
                .json(tmp)
            )

        yield read
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _late_shifted_et() -> Column:
    """Event time with the deterministic 1-in-17 late subset (30 hours
    — must clear the filter's one-day-plus-one-batch lag, see the
    module comment)."""
    return F.when(
        F.col("event_id") % 17 == 0,
        F.timestamp_millis(F.unix_millis("ts") - _LATE_SHIFT_MS),
    ).otherwise(F.col("ts"))


@query(
    "late_data_drop_streaming",
    oracle=_LATE_ORACLE,
    aliases=("streaming_late_data_drop",),
)
def late_data_drop_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type"
    )
    with _replayed_day_files(spark, ev) as read:
        stream = read("event_id long, ts timestamp, event_type string")
        agg = (
            stream.withColumn("et", _late_shifted_et())
            .withWatermark("et", "1 hour")
            .groupBy(F.window("et", "1 hour"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(
                F.col("window.start").alias("window_start"),
                "event_type",
                "n",
            )
        )
        return _run_to_memory(
            spark, agg, "late_drop_", state_partitions=8
        )


# --- streaming dedup (C6) end to end with real state eviction ----------------
# duplicate_flagging gates C6's batch analogue; this gates the actual
# streaming operator (dedup_events_stream ->
# dropDuplicatesWithinWatermark) over a time-ordered replay with a
# realistic 45-minute watermark, so the per-key state is created,
# consulted across micro-batches, and EVICTED as the watermark
# advances — the reference behavior is ShortTermDuplicateMemory
# suppressing the re-delivered event while keeping the first
# (ShortTermDuplicateMemory.java:108-178). Duplicates are injected as
# byte-identical copies of a deterministic 1-in-11 subset (same event
# time => same replay file => inside any watermark), so exactly one
# survivor per event_id exists and its payload is deterministic; the
# oracle is a plain DISTINCT.

_SDW_ORACLE = """
SELECT event_id, epoch_ms(ts) AS ts_ms, user_id, event_type
FROM events
"""


@query(
    "c6s_dedup_watermark",
    oracle=_SDW_ORACLE,
    aliases=("streaming_dedup_watermark",),
)
# board name until round 10: streaming_dedup_watermark (renamed to
# rotate into the checked prefix; c6s = the C6 dup-memory family's
# streaming sibling, matching the c3s_ convention)
def streaming_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    from divolte_collector_spark.streaming.ingest import dedup_events_stream

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    doubled = ev.unionByName(ev.filter(F.col("event_id") % 11 == 0))
    schema = "event_id long, ts timestamp, user_id long, event_type string"
    with _replayed_json_time_ordered(spark, doubled, "ts", n_files=8) as read:
        deduped = dedup_events_stream(
            read(schema), time_col="ts", watermark="45 minutes",
            keys=["event_id"],
        ).select(
            "event_id",
            F.unix_millis("ts").alias("ts_ms"),
            "user_id",
            "event_type",
        )
        return _run_to_memory(
            spark, deduped, "dedup_wm_", state_partitions=8
        )


# --- sliding windows with late data -------------------------------------------
# The third window type under a real stream (tumbling: late-drop gate;
# session: streaming_session_windows). Sliding windows make the late
# semantics PER (row, window) PAIR: one late row can be dropped from
# its older window yet still counted in its newer one — probed on this
# Spark (tests/test_streaming.py pins the tumbling probes; the sliding
# behavior follows from the same filter applying after the window
# expansion) and reproduced exactly by the oracle below: a 2h/1h
# sliding row belongs to windows starting at hour(et) and hour(et)-1h;
# each pair survives iff its window end clears the LAGGED filter
# watermark, and emits iff its end clears the final watermark.

_SLIDE_ORACLE = f"""
WITH ev AS (
    SELECT event_type, ts,
           day(ts) AS arrival_day,
           CASE WHEN event_id % 17 = 0
                THEN ts - INTERVAL 30 HOUR ELSE ts END AS et
    FROM events
),
batch_max AS (
    SELECT arrival_day, max(epoch_ms(et)) AS m
    FROM ev GROUP BY arrival_day
),
wm AS (
    SELECT arrival_day,
           coalesce(max(m) OVER (ORDER BY arrival_day
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 2 PRECEDING), 0)
               - {_LATE_DELAY_MS} AS filter_wm_ms
    FROM batch_max
),
pairs AS (
    SELECT e.event_type, e.arrival_day,
           epoch_ms(time_bucket(INTERVAL 1 HOUR, e.et)) - k.k * 3600000
               AS win_ms
    FROM ev e CROSS JOIN (SELECT unnest([0, 1]) AS k) k
),
kept AS (
    SELECT p.event_type, p.win_ms
    FROM pairs p JOIN wm w ON w.arrival_day = p.arrival_day
    WHERE p.win_ms + 7200000 > w.filter_wm_ms
),
final_wm AS (
    SELECT max(epoch_ms(et)) - {_LATE_DELAY_MS} AS wm_ms FROM ev
)
SELECT make_timestamp(win_ms * 1000) AS window_start,
       event_type,
       CAST(count(*) AS BIGINT) AS n
FROM kept CROSS JOIN final_wm
WHERE win_ms + 7200000 <= final_wm.wm_ms
GROUP BY win_ms, event_type
"""


@query(
    "agg_sliding_late_counts",
    oracle=_SLIDE_ORACLE,
    aliases=("streaming_sliding_late_counts",),
)
# board name until round 10: streaming_sliding_late_counts (renamed to
# rotate into the checked prefix)
def streaming_sliding_late_counts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type"
    )
    with _replayed_day_files(spark, ev) as read:
        stream = read("event_id long, ts timestamp, event_type string")
        agg = (
            stream.withColumn("et", _late_shifted_et())
            .withWatermark("et", "1 hour")
            .groupBy(F.window("et", "2 hours", "1 hour"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(
                F.col("window.start").alias("window_start"),
                "event_type",
                "n",
            )
        )
        return _run_to_memory(
            spark, agg, "slide_late_", state_partitions=8
        )
