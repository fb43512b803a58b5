"""Structured Streaming: ingest, dedup-within-watermark (C6),
session windows (C3), file sink lifecycle (K1), Kafka framing (K3)."""

from __future__ import annotations

import json
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from divolte_collector_spark.functions.avro_codec import decode_record
from divolte_collector_spark.streaming.ingest import (
    dedup_events_stream,
    discard_filtered,
    sessionize_stream,
)
from divolte_collector_spark.streaming.sinks import file_sink, kafka_frame

_EVENTS_SCHEMA = (
    "party_id string, session_id string, event_id string, "
    "client_time timestamp, event_type string, corrupt_event boolean"
)

_BATCH_SCHEMA = _EVENTS_SCHEMA.replace("client_time timestamp", "client_time string")


def _batch(spark):
    return spark.createDataFrame(_mk_rows(), _BATCH_SCHEMA).withColumn(
        "client_time", F.col("client_time").cast("timestamp")
    )


def _mk_rows():
    # party A: two events 5 min apart, one exact duplicate; party B: one
    # event far later (separate session window).
    return [
        ("0:a:1", "0:a:1:s1", "e1", "2024-01-01 10:00:00", "view", False),
        ("0:a:1", "0:a:1:s1", "e1", "2024-01-01 10:00:01", "view", False),  # dup id
        ("0:a:1", "0:a:1:s1", "e2", "2024-01-01 10:05:00", "click", True),
        ("0:b:2", "0:b:2:s1", "e3", "2024-01-01 13:00:00", "view", False),
        # sentinel far in the future: advances the watermark so the
        # earlier sessions finalize and emit in append mode
        ("0:z:9", "0:z:9:s1", "e9", "2024-01-02 09:00:00", "view", False),
    ]


@pytest.fixture()
def stream_dir(spark):
    d = tempfile.mkdtemp(prefix="dvs_stream_")
    rows = [
        {
            "party_id": p, "session_id": s, "event_id": e,
            "client_time": t, "event_type": et, "corrupt_event": c,
        }
        for p, s, e, t, et, c in _mk_rows()
    ]
    with open(f"{d}/events.json", "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _read_stream(spark, d):
    return (
        spark.readStream.schema(_EVENTS_SCHEMA)
        .json(d)
        .withColumn("client_time", F.col("client_time").cast("timestamp"))
    )


def _run_to_memory(df, name):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_streaming_dedup(spark, stream_dir):
    stream = _read_stream(spark, stream_dir)
    deduped = dedup_events_stream(stream)
    _run_to_memory(deduped, "dedup_out")
    rows = spark.sql("SELECT event_id FROM dedup_out").collect()
    ids = sorted(r.event_id for r in rows)
    assert ids == ["e1", "e2", "e3", "e9"]  # exact: duplicate e1 suppressed


def test_streaming_session_window(spark, stream_dir):
    stream = _read_stream(spark, stream_dir)
    sessions = sessionize_stream(dedup_events_stream(stream), watermark=None)
    _run_to_memory(sessions, "sess_out")
    rows = spark.sql(
        "SELECT party_id, n_events FROM sess_out ORDER BY party_id"
    ).collect()
    # watermark: availableNow emits finalized windows only after the
    # watermark advances past them; with one batch the final state is
    # emitted on the terminal commit.
    got = {(r.party_id, r.n_events) for r in rows}
    # the sentinel's own session stays open (watermark never passes it)
    assert got == {("0:a:1", 2), ("0:b:2", 1)}


def test_discard_filters(spark, stream_dir):
    # C7: discard_corrupted drops flagged events before sinking
    batch = _batch(spark)
    kept = discard_filtered(batch, discard_corrupted=True)
    assert kept.count() == 4
    assert kept.filter(F.col("corrupt_event")).count() == 0


def test_file_sink_rolls_and_publishes(spark, stream_dir):
    out = tempfile.mkdtemp(prefix="dvs_sink_")
    ckpt = tempfile.mkdtemp(prefix="dvs_ckpt_")
    try:
        stream = _read_stream(spark, stream_dir)
        q = file_sink(
            stream, f"{out}/publish", f"{ckpt}/cp", available_now=True
        ).start()
        q.awaitTermination(120)
        published = spark.read.parquet(f"{out}/publish")
        assert published.count() == 5
        # hourly roll buckets (partition values read back as ints)
        rolls = {
            r.roll
            for r in published.select(
                F.col("_roll").cast("string").alias("roll")
            ).distinct().collect()
        }
        assert rolls == {"2024010110", "2024010113", "2024010209"}
    finally:
        shutil.rmtree(out, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


_KAFKA_SCHEMA = {
    "type": "record",
    "name": "MappedEvent",
    "fields": [
        {"name": "party_id", "type": "string"},
        {"name": "event_id", "type": "string"},
        {"name": "event_type", "type": ["null", "string"], "default": None},
    ],
}


def test_kafka_frame_naked_and_confluent(spark):
    batch = _batch(spark).select("party_id", "event_id", "event_type")
    naked = kafka_frame(batch, _KAFKA_SCHEMA, mode="naked").collect()
    assert len(naked) == 5
    for r in naked:
        rec = decode_record(_KAFKA_SCHEMA, bytes(r.value))
        assert bytes(r.key).decode() == rec["party_id"]
        assert rec["event_type"] in ("view", "click")

    framed = kafka_frame(
        batch, _KAFKA_SCHEMA, mode="confluent", confluent_id=7
    ).collect()
    for r in framed:
        v = bytes(r.value)
        assert v[0] == 0x00  # magic
        assert int.from_bytes(v[1:5], "big") == 7
        rec = decode_record(_KAFKA_SCHEMA, v[5:])
        assert bytes(r.key).decode() == rec["party_id"]

    with pytest.raises(ValueError):
        kafka_frame(batch, _KAFKA_SCHEMA, mode="confluent")  # id required


def test_avro_file_sink_writes_real_containers(spark, stream_dir):
    # K1 with true Avro container output: FileFlusher lifecycle
    # (.partial inflight -> atomic publish, empties discarded),
    # reference naming, and a downstream Avro reader gets the records
    # back with the canonical schema fingerprint intact.
    import os

    from divolte_collector_spark.functions.avro_codec import (
        read_container,
        schema_fingerprint_sha256,
    )
    from divolte_collector_spark.streaming.sinks import avro_file_sink

    schema = {
        "type": "record",
        "name": "DivolteEvent",
        "fields": [
            {"name": "party_id", "type": "string"},
            {"name": "event_id", "type": "string"},
            {"name": "event_type", "type": ["null", "string"], "default": None},
            {"name": "client_ms", "type": "long"},
        ],
    }
    out = tempfile.mkdtemp(prefix="dvs_avro_sink_")
    ckpt = tempfile.mkdtemp(prefix="dvs_avro_ckpt_")
    try:
        stream = _read_stream(spark, stream_dir).select(
            "party_id", "event_id", "event_type", "client_time",
            F.unix_millis(F.col("client_time")).alias("client_ms"),
        )
        q = avro_file_sink(
            stream, out, f"{ckpt}/cp", schema, available_now=True
        ).start()
        q.awaitTermination(120)

        files = sorted(os.listdir(out))
        assert files, "no avro files published"
        # lifecycle: no inflight files remain; naming matches the
        # reference's <date>-divolte-tracking-<host>-<instance>.avro
        assert not [f for f in files if f.endswith(".partial")]
        assert all("-divolte-tracking-" in f and f.endswith(".avro") for f in files)

        got = []
        expect_fp = schema_fingerprint_sha256(schema)
        for f in files:
            with open(os.path.join(out, f), "rb") as fh:
                got_schema, recs = read_container(fh.read())
            assert schema_fingerprint_sha256(got_schema) == expect_fp
            got.extend(recs)
        assert sorted(r["event_id"] for r in got) == ["e1", "e1", "e2", "e3", "e9"]
        by_id = {r["event_id"]: r for r in got}
        assert by_id["e2"]["event_type"] == "click"
        assert by_id["e2"]["client_ms"] == 1704103500000
    finally:
        shutil.rmtree(out, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_stream_stream_interval_join(spark, stream_dir):
    """Purchases joined to preceding views of the same party within the
    interval — stream-stream join with bounded state via watermarks."""
    import json as _json
    import os
    import tempfile

    from divolte_collector_spark.streaming.ingest import interval_join_streams

    d = tempfile.mkdtemp(prefix="dvs_ssj_")
    try:
        views = [
            ("pA", "v1", "2024-01-01 10:00:00"),
            ("pA", "v2", "2024-01-01 10:20:00"),
            ("pA", "v3", "2024-01-01 09:00:00"),  # > 30 min before: out
            ("pB", "v4", "2024-01-01 10:00:00"),  # other party
        ]
        buys = [("pA", "b1", "2024-01-01 10:30:00")]
        os.makedirs(f"{d}/v"), os.makedirs(f"{d}/b")
        with open(f"{d}/v/part.json", "w") as fh:
            for p, e, t in views:
                fh.write(_json.dumps(dict(party_id=p, event_id=e, client_time=t)) + "\n")
        with open(f"{d}/b/part.json", "w") as fh:
            for p, e, t in buys:
                fh.write(_json.dumps(dict(party_id=p, event_id=e, client_time=t)) + "\n")
        schema = "party_id string, event_id string, client_time timestamp"
        v = spark.readStream.schema(schema).json(f"{d}/v").withColumnRenamed("event_id", "view_id")
        b = spark.readStream.schema(schema).json(f"{d}/b").withColumnRenamed("event_id", "buy_id")
        joined = interval_join_streams(
            b.withColumnRenamed("client_time", "buy_time"),
            v.withColumnRenamed("client_time", "view_time"),
            left_ts="buy_time",
            right_ts="view_time",
        ).select("buy_id", "view_id")
        q = (
            joined.writeStream.format("memory")
            .queryName("ssj_out")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = {
            (r.buy_id, r.view_id)
            for r in spark.sql("SELECT * FROM ssj_out").collect()
        }
        # b1 pairs with v1 (30 min before, inclusive) and v2 (10 min
        # before); v3 is outside the interval, v4 is another party
        assert got == {("b1", "v1"), ("b1", "v2")}
    finally:
        import shutil

        shutil.rmtree(d, ignore_errors=True)


def test_pubsub_messages_attributes(spark):
    """K4 (GoogleCloudPubSubFlusher.java:48-91): data = naked binary
    Avro; attributes carry party/event ids, ISO-instant timestamp,
    base64url schema fingerprint, and the optional schemaConfluentId
    as 0x-prefixed lowercase hex."""
    import base64

    from divolte_collector_spark.functions.avro_codec import (
        schema_fingerprint_sha256,
    )
    from divolte_collector_spark.streaming.sinks import pubsub_messages

    batch = _batch(spark).select(
        "party_id", "event_id", "event_type", "client_time"
    )
    schema = {
        "type": "record",
        "name": "MappedEvent",
        "fields": [
            {"name": "party_id", "type": "string"},
            {"name": "event_id", "type": "string"},
            {"name": "event_type", "type": ["null", "string"], "default": None},
        ],
    }
    rows = pubsub_messages(batch, schema, confluent_id=0x2A).collect()
    assert len(rows) == 5
    expected_fp = base64.urlsafe_b64encode(
        schema_fingerprint_sha256(schema)
    ).decode()
    for r in rows:
        rec = decode_record(schema, bytes(r.data))
        assert rec["party_id"] == r.partyIdentifier
        assert rec["event_id"] == r.eventIdentifier
        assert r.schemaFingerprint == expected_fp
        assert r.schemaConfluentId == "0x2a"  # Integer.toHexString
        assert r.timestamp.endswith("Z") and "T" in r.timestamp

    # without a registry id the attribute is absent (None)
    bare = pubsub_messages(batch, schema).first()
    assert bare.schemaConfluentId is None


def test_kafka_frame_tolerates_null_numeric_fields(spark):
    # REGRESSION: Arrow->pandas turns a null long column into NaN; the
    # encoder then took the non-null union branch and int(nan) raised,
    # killing the whole micro-batch for one null field.
    from divolte_collector_spark.functions.avro_codec import decode_record
    from divolte_collector_spark.streaming.sinks import kafka_frame

    schema = {
        "type": "record",
        "name": "E",
        "fields": [
            {"name": "party_id", "type": "string"},
            {"name": "w", "type": ["null", "long"], "default": None},
        ],
    }
    df = spark.createDataFrame(
        [("0:a:1", 1920), ("0:b:2", None)], "party_id string, w long"
    )
    rows = {
        bytes(r.key).decode(): bytes(r.value)
        for r in kafka_frame(df, schema).collect()
    }
    assert decode_record(schema, rows["0:a:1"])["w"] == 1920
    assert decode_record(schema, rows["0:b:2"])["w"] is None


def test_write_avro_files_null_field_and_incremental_blocks(spark, tmp_path):
    from divolte_collector_spark.functions.avro_codec import read_container
    from divolte_collector_spark.streaming.sinks import write_avro_files

    schema = {
        "type": "record",
        "name": "E",
        "fields": [
            {"name": "party_id", "type": "string"},
            {"name": "w", "type": ["null", "long"], "default": None},
        ],
    }
    df = spark.createDataFrame(
        [("p1", 5, "2024-01-01 10:00:00"), ("p2", None, "2024-01-01 10:30:00")],
        "party_id string, w long, client_time string",
    ).withColumn("client_time", F.to_timestamp("client_time"))
    out = str(tmp_path / "avro")
    manifest = write_avro_files(df, schema, out, batch_tag="t")
    assert sum(n for _, n in manifest) == 2
    import os

    recs = []
    for name, _ in manifest:
        with open(os.path.join(out, name), "rb") as fh:
            _, rs = read_container(fh.read())
        recs.extend(rs)
    by_party = {r["party_id"]: r for r in recs}
    assert by_party["p1"]["w"] == 5 and by_party["p2"]["w"] is None
    assert not [f for f in os.listdir(out) if f.endswith(".partial")]


def test_interval_join_watermark_evicts_state(spark):
    """The time-ordered replay + a realistic 45-minute watermark must
    actually EVICT buffered rows as the watermark advances — the state
    bound that makes the stream-stream interval join 100 TB-safe. The
    gate (interval_join_views_streaming) proves output correctness;
    this pins the mechanism: state row counts plateau far below the
    stream's total row count, and rows are removed along the way."""
    from divolte_collector_spark.queries.streaming_ext import (
        _await_or_die,
        _replayed_json_time_ordered,
    )
    from divolte_collector_spark.session import load_table
    from divolte_collector_spark.streaming.ingest import interval_join_streams

    sf_dir = "/root/testdata/sf0.001"
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    n_views = ev.filter(F.col("event_type") == "view").count()
    n_buys = ev.filter(F.col("event_type") == "purchase").count()
    schema = "event_id long, ts timestamp, user_id long, event_type string"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    with _replayed_json_time_ordered(spark, ev, "ts", n_files=8) as read:

        def side(etype, id_alias, ts_alias):
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
            side("purchase", "purchase_id", "purchase_ts"),
            side("view", "view_id", "view_ts"),
            key="user_id",
            left_ts="purchase_ts",
            right_ts="view_ts",
            max_delay="30 minutes",
            watermark="45 minutes",
        )
        try:
            spark.conf.set("spark.sql.shuffle.partitions", "8")
            q = (
                joined.select("purchase_id", "view_id")
                .writeStream.format("memory")
                .queryName("ssj_evict")
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            _await_or_die(q, 300)
            progress = [p for p in q.recentProgress if p.get("stateOperators")]
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)

    assert progress, "no state-operator progress captured"
    totals = [p["stateOperators"][0]["numRowsTotal"] for p in progress]
    removed = sum(
        p["stateOperators"][0].get("numRowsRemoved", 0) for p in progress
    )
    # eviction actually ran...
    assert removed > 0, totals
    # ...and bounded the state: never close to buffering the whole
    # stream (both sides buffer; without eviction state would reach
    # n_views + n_buys by the last batch)
    assert max(totals) < (n_views + n_buys) / 2, (
        max(totals),
        n_views,
        n_buys,
    )


def test_windowed_agg_late_filter_lags_eviction_by_one_batch(spark, tmp_path):
    """Pins the watermark semantics the late_data_drop_streaming oracle
    encodes (probed on this Spark): with per-batch watermarks W_k =
    max(et over batches < k) - delay, eviction+emission during batch k
    uses W_k (inclusive), but the LATE-ROW FILTER uses W_{k-1} — a
    late row landing in the very batch that evicts its window still
    counts; only rows whose window was emitted in an EARLIER batch are
    dropped (numRowsDroppedByWatermark)."""
    import json
    import os
    import time as _time

    d = str(tmp_path)

    def wr(name, rows, mt):
        p = os.path.join(d, name)
        with open(p, "w") as fh:
            for r in rows:
                fh.write(json.dumps(r) + "\n")
        os.utime(p, (mt, mt))

    base = _time.time() - 1000
    wr("01.json", [{"id": 1, "et": "2024-01-01 09:10:00"}], base + 1)
    # batch 1: W_1 = 08:10 — nothing evictable
    wr("02.json", [{"id": 2, "et": "2024-01-01 12:00:00"}], base + 2)
    # batch 2: W_2 = 11:00 -> [09,10) evicted+emitted THIS batch; a
    # late row here would still merge (filter uses W_1 = 08:10)
    wr("03.json", [
        {"id": 3, "et": "2024-01-01 09:40:00"},  # merges, not dropped
        {"id": 4, "et": "2024-01-01 13:00:00"},
    ], base + 3)
    # batch 3: W_3 = 12:00; [09,10) emitted in batch 2 -> DROPPED
    wr("04.json", [{"id": 5, "et": "2024-01-01 09:50:00"}], base + 4)

    stream = (
        spark.readStream.schema("id long, et timestamp")
        .option("maxFilesPerTrigger", 1)
        .json(d)
    )
    agg = (
        stream.withWatermark("et", "1 hour")
        .groupBy(F.window("et", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window.start").alias("ws"), "n")
    )
    name = "wm_semantics_pin"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    out = {r.ws.hour: r.n for r in spark.table(name).collect()}
    # [09,10) emitted ONCE with the batch-2 late row merged in (n=2);
    # the batch-3 row for the same window was dropped, not re-emitted
    assert out[9] == 2, out
    dropped = sum(
        p["stateOperators"][0].get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        if p.get("stateOperators")
    )
    assert dropped == 1


def test_streaming_dedup_watermark_evicts_state(spark):
    """The gated streaming dedup (c6s_dedup_watermark) must
    actually evict per-key state as the 45-minute watermark advances
    over the time-ordered replay: rows are removed along the way and
    the state total stays far below the stream's key count."""
    from divolte_collector_spark.queries.streaming_ext import (
        _await_or_die,
        _replayed_json_time_ordered,
    )
    from divolte_collector_spark.session import load_table
    from divolte_collector_spark.streaming.ingest import dedup_events_stream

    ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "ts"
    )
    n_ids = ev.count()
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    with _replayed_json_time_ordered(spark, ev, "ts", n_files=8) as read:
        deduped = dedup_events_stream(
            read("event_id long, ts timestamp"),
            time_col="ts",
            watermark="45 minutes",
            keys=["event_id"],
        )
        try:
            spark.conf.set("spark.sql.shuffle.partitions", "8")
            q = (
                deduped.writeStream.format("memory")
                .queryName("sdw_evict")
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            _await_or_die(q, 300)
            progress = [p for p in q.recentProgress if p.get("stateOperators")]
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
    totals = [p["stateOperators"][0]["numRowsTotal"] for p in progress]
    removed = sum(
        p["stateOperators"][0].get("numRowsRemoved", 0) for p in progress
    )
    assert removed > 0, totals
    assert max(totals) < n_ids / 2, (max(totals), n_ids)
