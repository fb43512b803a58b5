"""applyInPandasWithState session labeling (reference C3 cookie
semantics, server-side): per-event session ids + firstInSession,
state carried across micro-batches, sliding-timeout refresh."""

from __future__ import annotations

import json
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from divolte_collector_spark.streaming.stateful import sessionize_stateful

_SCHEMA = "party_id string, event_id string, client_time timestamp"


def _write_batch(d, name, rows):
    with open(f"{d}/{name}.json", "w") as fh:
        for p, e, t in rows:
            fh.write(
                json.dumps({"party_id": p, "event_id": e, "client_time": t}) + "\n"
            )


@pytest.fixture()
def stream_dir():
    d = tempfile.mkdtemp(prefix="dvs_state_")
    # batch 1: party A starts a session; B one event
    _write_batch(
        d,
        "b1",
        [
            ("pA", "e1", "2024-01-01 10:00:00"),
            ("pA", "e2", "2024-01-01 10:10:00"),
            ("pB", "e3", "2024-01-01 10:00:00"),
        ],
    )
    # batch 2 (separate file => separate micro-batch with
    # maxFilesPerTrigger=1): A continues within the gap (same session,
    # state must survive the batch boundary), then returns after the
    # gap (new session); sentinel advances the watermark
    _write_batch(
        d,
        "b2",
        [
            ("pA", "e4", "2024-01-01 10:25:00"),
            ("pA", "e5", "2024-01-01 11:30:00"),
            ("pZ", "e9", "2024-01-02 09:00:00"),
        ],
    )
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_stateful_session_labeling(spark, stream_dir):
    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(stream_dir)
    )
    labeled = sessionize_stateful(stream)
    q = (
        labeled.writeStream.format("memory")
        .queryName("stateful_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = {
        r.event_id: r
        for r in spark.sql("SELECT * FROM stateful_out").collect()
    }
    assert set(rows) == {"e1", "e2", "e3", "e4", "e5", "e9"}

    # e1 opens A's session; e2 (10 min later) and e4 (15 min later,
    # ACROSS the micro-batch boundary) slide the same cookie forward
    assert rows["e1"].first_in_session
    assert not rows["e2"].first_in_session
    assert not rows["e4"].first_in_session
    assert rows["e1"].session_id == rows["e2"].session_id == rows["e4"].session_id

    # e5 arrives 65 min after e4: cookie expired, fresh session
    assert rows["e5"].first_in_session
    assert rows["e5"].session_id != rows["e4"].session_id

    # other parties get their own sessions
    assert rows["e3"].first_in_session
    assert rows["e3"].session_id != rows["e1"].session_id

    # reference id format: '0:<base36 millis>:<suffix>'
    ver, ts36, suffix = rows["e1"].session_id.split(":")
    assert ver == "0" and len(suffix) == 16
    assert int(ts36, 36) == 1704103200000  # 2024-01-01T10:00:00Z in ms


def test_stateful_agrees_with_batch_sessionize(spark, events_sf0001=None):
    """Cross-check: streaming labeler == batch window-function
    sessionizer on the driver's events table (sf0.001)."""
    from divolte_collector_spark.operators.sessionize import sessionize
    from divolte_collector_spark.session import load_table

    ev = (
        load_table(spark, "/root/testdata/sf0.001", "events")
        .select(
            F.col("user_id").alias("party_id"),
            F.col("event_id"),
            F.col("ts").alias("client_time"),
        )
    )
    d = tempfile.mkdtemp(prefix="dvs_xchk_")
    try:
        ev.coalesce(1).write.mode("overwrite").json(d)
        stream = spark.readStream.schema(_SCHEMA).json(d)
        labeled = sessionize_stateful(stream, watermark="0 seconds")
        q = (
            labeled.writeStream.format("memory")
            .queryName("xchk_out")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        got = spark.sql("SELECT * FROM xchk_out")

        want = sessionize(
            ev, user_col="party_id", ts_col="client_time", order_tiebreak="event_id"
        ).select("event_id", "first_in_session")

        # identical first_in_session flag per event => identical session
        # boundaries (ids differ by construction: mint vs seq)
        j = got.select("event_id", F.col("first_in_session").alias("got_first")).join(
            want, "event_id"
        )
        assert j.count() == ev.count()
        assert j.filter(F.col("got_first") != F.col("first_in_session")).count() == 0
    finally:
        shutil.rmtree(d, ignore_errors=True)

def test_late_event_does_not_rewind_session_clock(spark):
    # REGRESSION: a cross-batch LATE event (within the watermark but
    # earlier than the party's last seen time) used to rewind last_ms,
    # so the next on-time event saw an inflated inactivity gap and
    # minted a spurious session.
    import shutil
    import tempfile

    d = tempfile.mkdtemp(prefix="dvs_late_")
    try:
        import os
        import time

        _write_batch(d, "b1", [("pA", "e1", "2024-01-01 10:00:00"),
                               ("pA", "e2", "2024-01-01 10:20:00")])
        # batch 2: e_late is 9 min EARLIER than e2 (late arrival, still
        # within the default 10-min watermark), then e3 22 min after e2
        # — a true gap under 30 min, so SAME session
        _write_batch(d, "b2", [("pA", "elate", "2024-01-01 10:11:00")])
        _write_batch(d, "b3", [("pA", "e3", "2024-01-01 10:42:00"),
                               ("pZ", "e9", "2024-01-02 09:00:00")])
        # the file source orders batches by modification time; force a
        # strictly increasing order so b3's sentinel cannot advance the
        # watermark before the late event is processed
        now = time.time()
        for i, name in enumerate(("b1", "b2", "b3")):
            os.utime(f"{d}/{name}.json", (now + i * 10, now + i * 10))
        stream = (
            spark.readStream.schema(_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .json(d)
        )
        q = (
            sessionize_stateful(stream)
            .writeStream.format("memory")
            .queryName("stateful_late")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        rows = {
            r.event_id: r
            for r in spark.sql("SELECT * FROM stateful_late").collect()
        }
        # the late event joins the open session and does NOT rewind it
        assert not rows["elate"].first_in_session
        # e3's gap from the true last activity (e2, 22 min) is within
        # the 30-min timeout: same session, not a spurious new one
        assert not rows["e3"].first_in_session
        assert rows["e3"].session_id == rows["e1"].session_id
    finally:
        shutil.rmtree(d, ignore_errors=True)
