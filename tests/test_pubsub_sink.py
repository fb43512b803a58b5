"""K4 publisher loop (streaming/pubsub.py): TopicFlusher semantics —
batch publish, retry-on-retriable with backoff, abandon-on-fatal —
golden-tested attributes and per-partition ordering against a
recording stub client (GoogleCloudPubSubFlusher.java:45-91,
TopicFlusher.java:44-105)."""

from __future__ import annotations

import base64
import json
import os
import sys
import uuid

import pytest
from pyspark.sql import functions as F

# the recording stub classes below ride into foreachPartition closures;
# tests/ is not importable on the executor side, so ship this module by
# value instead of by reference
from pyspark import cloudpickle

cloudpickle.register_pickle_by_value(sys.modules[__name__])

from divolte_collector_spark.functions.avro_codec import (
    decode_record,
    schema_fingerprint_sha256,
)
from divolte_collector_spark.streaming.pubsub import (
    flush_messages,
    pubsub_sink,
)

# client_time feeds the timestamp ATTRIBUTE only (the record schema
# need not carry it — same shape as the reference's AvroRecordBuffer
# timestamp living outside the Avro body)
_SCHEMA = {
    "type": "record",
    "name": "MappedEvent",
    "fields": [
        {"name": "party_id", "type": "string"},
        {"name": "event_id", "type": "string"},
    ],
}


class _MemStub:
    def __init__(self, fail_plan=None):
        # fail_plan: event_id -> list of exceptions to raise before
        # succeeding (consumed front to back)
        self.published = []
        self.fail_plan = dict(fail_plan or {})

    def publish(self, data, attributes):
        eid = attributes.get("eventIdentifier")
        plan = self.fail_plan.get(eid)
        if plan:
            raise plan.pop(0)
        self.published.append((data, dict(attributes)))
        return f"mid-{len(self.published)}"


def _retryable():
    e = RuntimeError("transient")
    e.retryable = True
    return e


def _msg(i):
    return {
        "data": f"payload-{i}".encode(),
        "attributes": {"eventIdentifier": f"e{i}", "partyIdentifier": f"p{i}"},
    }


def test_flush_all_success():
    stub = _MemStub()
    published, abandoned = flush_messages([_msg(i) for i in range(5)], stub)
    assert (published, abandoned) == (5, 0)
    assert [a["eventIdentifier"] for _, a in stub.published] == [
        f"e{i}" for i in range(5)
    ]


def test_flush_retries_only_pending_with_backoff():
    stub = _MemStub(fail_plan={"e1": [_retryable(), _retryable()]})
    sleeps = []
    published, abandoned = flush_messages(
        [_msg(i) for i in range(3)], stub,
        backoff_s=0.01, sleep=sleeps.append,
    )
    assert (published, abandoned) == (3, 0)
    # e0/e2 published exactly once on attempt 1; e1 arrives after 2 retries
    assert [a["eventIdentifier"] for _, a in stub.published] == ["e0", "e2", "e1"]
    assert sleeps == [0.01, 0.02]  # exponential


def test_flush_abandons_fatal_and_unknown():
    fatal = RuntimeError("permanent")  # no .retryable -> abandon
    stub = _MemStub(fail_plan={"e1": [fatal]})
    published, abandoned = flush_messages([_msg(i) for i in range(3)], stub)
    assert (published, abandoned) == (2, 1)
    assert [a["eventIdentifier"] for _, a in stub.published] == ["e0", "e2"]


def test_flush_raises_after_exhaustion():
    stub = _MemStub(fail_plan={"e0": [_retryable() for _ in range(10)]})
    with pytest.raises(RuntimeError, match="still .*pending"):
        flush_messages([_msg(0)], stub, max_attempts=3, sleep=lambda s: None)


def test_flush_max_attempts_counts_retry_rounds_exactly():
    # max_attempts=N means N full retry rounds AFTER the streaming
    # pass: a message that fails the streaming pass plus the first
    # N-1 retry rounds and succeeds on round N must be published
    stub = _MemStub(fail_plan={"e0": [_retryable() for _ in range(3)]})
    published, abandoned = flush_messages(
        [_msg(0)], stub, max_attempts=3, sleep=lambda s: None
    )
    assert (published, abandoned) == (1, 0)
    # and max_attempts=1 performs one real retry round (not zero)
    stub = _MemStub(fail_plan={"e0": [_retryable()]})
    published, abandoned = flush_messages(
        [_msg(0)], stub, max_attempts=1, sleep=lambda s: None
    )
    assert (published, abandoned) == (1, 0)


def test_flush_abandon_emits_warning(caplog):
    stub = _MemStub(fail_plan={"e1": [RuntimeError("permanent boom")]})
    with caplog.at_level("WARNING", "divolte_collector_spark.streaming.pubsub"):
        published, abandoned = flush_messages(
            [_msg(i) for i in range(3)], stub
        )
    assert (published, abandoned) == (2, 1)
    assert any(
        "abandoning" in rec.message and "e1" in rec.getMessage()
        for rec in caplog.records
    )


class _FileStub:
    """Executor-side recording client: foreachPartition runs in Python
    worker processes, so the record goes through the filesystem — one
    ordered JSON-lines file per client instance (= per partition)."""

    def __init__(self, out_dir):
        self.path = os.path.join(out_dir, f"client-{uuid.uuid4().hex}.jsonl")

    def publish(self, data, attributes):
        with open(self.path, "a") as fh:
            fh.write(
                json.dumps({"data": data.hex(), "attributes": attributes})
                + "\n"
            )
        return "mid"


def _read_published(out_dir):
    per_client = []
    for fname in sorted(os.listdir(out_dir)):
        with open(os.path.join(out_dir, fname)) as fh:
            per_client.append([json.loads(line) for line in fh])
    return per_client


def test_streaming_publish_end_to_end_golden_attributes(spark, tmp_path):
    out_dir = str(tmp_path / "published")
    os.makedirs(out_dir)
    src = str(tmp_path / "src")
    n = 20
    ev = spark.range(n).select(
        F.concat(F.lit("0:p"), (F.col("id") % 4).cast("string")).alias(
            "party_id"
        ),
        F.concat(F.lit("e"), F.col("id").cast("string")).alias("event_id"),
        F.timestamp_millis(F.lit(1500000000000) + F.col("id") * 1000).alias(
            "client_time"
        ),
        F.col("id").alias("seq"),
    )
    ev.coalesce(1).sortWithinPartitions("seq").drop("seq").write.mode(
        "overwrite"
    ).json(src)

    stream = spark.readStream.schema(
        "party_id string, event_id string, client_time timestamp"
    ).json(src)
    q = (
        pubsub_sink(
            stream, _SCHEMA,
            client_factory=lambda out=out_dir: _FileStub(out),
            checkpoint=str(tmp_path / "ckpt"),
            confluent_id=0x2A,
        )
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600), "pubsub sink timed out"

    per_client = _read_published(out_dir)
    flat = [m for msgs in per_client for m in msgs]
    assert len(flat) == n
    fingerprint = base64.urlsafe_b64encode(
        schema_fingerprint_sha256(_SCHEMA)
    ).decode("ascii")
    by_eid = {m["attributes"]["eventIdentifier"]: m for m in flat}
    assert set(by_eid) == {f"e{i}" for i in range(n)}
    # golden attribute check (flusher's exact builder surface):
    m7 = by_eid["e7"]
    assert m7["attributes"] == {
        "partyIdentifier": "0:p3",
        "eventIdentifier": "e7",
        "timestamp": "2017-07-14T02:40:07.000000Z",
        "schemaFingerprint": fingerprint,
        "schemaConfluentId": "0x2a",
    }
    # the data bytes are the binary-Avro record (decodable, field-exact)
    rec = decode_record(_SCHEMA, bytes.fromhex(m7["data"]))
    assert rec["party_id"] == "0:p3" and rec["event_id"] == "e7"
    # per-partition publish order == row order (party-keyed upstream
    # partitioning therefore preserves per-party order)
    for msgs in per_client:
        seqs = [int(m["attributes"]["eventIdentifier"][1:]) for m in msgs]
        assert seqs == sorted(seqs)


def test_streaming_publish_without_confluent_id_omits_attribute(
    spark, tmp_path
):
    out_dir = str(tmp_path / "published")
    os.makedirs(out_dir)
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [("0:a:1", "e1", 1500000000000)],
        "party_id string, event_id string, client_ms long",
    ).select(
        "party_id", "event_id",
        F.timestamp_millis(F.col("client_ms")).alias("client_time"),
    ).write.mode("overwrite").json(src)
    stream = spark.readStream.schema(
        "party_id string, event_id string, client_time timestamp"
    ).json(src)
    q = (
        pubsub_sink(
            stream, _SCHEMA,
            client_factory=lambda out=out_dir: _FileStub(out),
            checkpoint=str(tmp_path / "ckpt"),
        )
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600)
    (msgs,) = [m for m in _read_published(out_dir) if m]
    assert "schemaConfluentId" not in msgs[0]["attributes"]
    assert msgs[0]["attributes"]["partyIdentifier"] == "0:a:1"
