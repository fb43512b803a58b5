"""Checkpoint/restart semantics: the properties that replace the
reference's pause/heartbeat/retry machinery at scale.

- stateful sessionization state survives a QUERY RESTART (new
  writeStream from the same checkpoint): the state store rehydrates
  the per-party cookie, so a within-gap event after restart continues
  the same session;
- the streaming file sink is exactly-once across restarts: re-running
  from the same checkpoint with no new input appends nothing, and new
  input is appended exactly once.
"""

from __future__ import annotations

import glob
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
def dirs():
    d = {
        "in": tempfile.mkdtemp(prefix="dvs_rst_in_"),
        "out": tempfile.mkdtemp(prefix="dvs_rst_out_"),
        "ckpt": tempfile.mkdtemp(prefix="dvs_rst_ckpt_"),
    }
    yield d
    for p in d.values():
        shutil.rmtree(p, ignore_errors=True)


def _run_once(spark, dirs):
    stream = spark.readStream.schema(_SCHEMA).json(dirs["in"])
    labeled = sessionize_stateful(stream)
    q = (
        labeled.writeStream.format("parquet")
        .option("path", dirs["out"])
        .option("checkpointLocation", dirs["ckpt"])
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_state_survives_query_restart(spark, dirs):
    _write_batch(
        dirs["in"],
        "b1",
        [
            ("pA", "e1", "2024-01-01 10:00:00"),
            ("pA", "e2", "2024-01-01 10:10:00"),
        ],
    )
    _run_once(spark, dirs)

    # RESTART: new input arrives while the query is down; e3 is within
    # the 30-min gap of e2, so the rehydrated cookie must continue the
    # session; e4 is past the gap (new session); eZ moves the watermark
    _write_batch(
        dirs["in"],
        "b2",
        [
            ("pA", "e3", "2024-01-01 10:25:00"),
            ("pA", "e4", "2024-01-01 11:30:00"),
            ("pZ", "eZ", "2024-01-02 09:00:00"),
        ],
    )
    _run_once(spark, dirs)

    rows = {r.event_id: r for r in spark.read.parquet(dirs["out"]).collect()}
    assert set(rows) == {"e1", "e2", "e3", "e4", "eZ"}
    assert rows["e1"].first_in_session
    assert not rows["e2"].first_in_session
    # the restart boundary: same session id only if state recovered
    assert not rows["e3"].first_in_session
    assert rows["e3"].session_id == rows["e1"].session_id
    # past the gap: a NEW session even though state recovered
    assert rows["e4"].first_in_session
    assert rows["e4"].session_id != rows["e1"].session_id


def test_file_sink_exactly_once_across_restarts(spark, dirs):
    _write_batch(
        dirs["in"], "b1", [("pA", "e1", "2024-01-01 10:00:00")]
    )
    _run_once(spark, dirs)
    n1 = spark.read.parquet(dirs["out"]).count()
    files1 = set(glob.glob(f"{dirs['out']}/*.parquet"))

    # re-run with NO new input: the committed offsets mean nothing
    # reprocesses and nothing re-appends
    _run_once(spark, dirs)
    assert spark.read.parquet(dirs["out"]).count() == n1

    # new input appends exactly once
    _write_batch(
        dirs["in"], "b2", [("pA", "e2", "2024-01-01 10:05:00")]
    )
    _run_once(spark, dirs)
    out = spark.read.parquet(dirs["out"])
    assert out.count() == n1 + 1
    assert set(r.event_id for r in out.collect()) == {"e1", "e2"}
    assert files1.issubset(set(glob.glob(f"{dirs['out']}/*.parquet")))
