"""transformWithStateInPandas session labeler (streaming/tws.py).

The labeling logic runs against an in-memory ValueState double —
state carry, gap-splitting, sliding refresh, cross-chunk sorting —
independent of the state server, whose python protocol needs
google.protobuf (absent in this container; the end-to-end stream is
skip-marked behind tws_available(), mirroring the Kafka connector
gating)."""

from __future__ import annotations

import pandas as pd
import pytest

from divolte_collector_spark.streaming.tws import (
    CookieSessionProcessor,
    tws_available,
)

GAP_MS = 30 * 60 * 1000


class _FakeValueState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = v

    def clear(self):
        self._v = None


class _FakeHandle:
    def __init__(self):
        self.states = {}

    def getValueState(self, name, schema):
        return self.states.setdefault(name, _FakeValueState())


def _run(proc, party, batches):
    out = []
    for pdf in batches:
        out.extend(
            pd.concat(list(proc.handleInputRows((party,), iter([pdf]), None)))
            .to_dict("records")
        )
    return out


def _pdf(rows):
    return pd.DataFrame(
        {
            "event_id": [r[0] for r in rows],
            "client_time": pd.to_datetime([r[1] for r in rows], unit="ms"),
        }
    )


def test_gap_splits_and_sliding_refresh():
    proc = CookieSessionProcessor(GAP_MS)
    proc.init(_FakeHandle())
    t0 = 1_700_000_000_000
    # three events 29 min apart: sliding expiry keeps ONE session
    # (total span 58 min > gap, but each inter-event gap is < gap)
    step = 29 * 60 * 1000
    out = _run(proc, "p1", [_pdf([("a", t0), ("b", t0 + step), ("c", t0 + 2 * step)])])
    assert [r["first_in_session"] for r in out] == [True, False, False]
    assert len({r["session_id"] for r in out}) == 1
    # a 31-minute gap then mints a fresh session
    out2 = _run(proc, "p1", [_pdf([("d", t0 + 2 * step + GAP_MS + 1)])])
    assert out2[0]["first_in_session"] is True
    assert out2[0]["session_id"] != out[0]["session_id"]


def test_state_carries_across_batches():
    proc = CookieSessionProcessor(GAP_MS)
    proc.init(_FakeHandle())
    t0 = 1_700_000_000_000
    first = _run(proc, "p9", [_pdf([("a", t0)])])
    # next micro-batch, 5 min later: same session, not first
    second = _run(proc, "p9", [_pdf([("b", t0 + 300_000)])])
    assert second[0]["first_in_session"] is False
    assert second[0]["session_id"] == first[0]["session_id"]


def test_out_of_order_chunks_sorted_before_labeling():
    proc = CookieSessionProcessor(GAP_MS)
    proc.init(_FakeHandle())
    t0 = 1_700_000_000_000
    # rows arrive time-reversed within the batch; labels must follow
    # event time, not arrival order
    out = _run(proc, "p2", [_pdf([("late", t0 + 60_000), ("early", t0)])])
    by_id = {r["event_id"]: r for r in out}
    assert by_id["early"]["first_in_session"] is True
    assert by_id["late"]["first_in_session"] is False


def test_session_id_format_matches_reference():
    proc = CookieSessionProcessor(GAP_MS)
    proc.init(_FakeHandle())
    out = _run(proc, "p3", [_pdf([("a", 1_700_000_000_000)])])
    sid = out[0]["session_id"]
    # '0:<base36 millis>:<16-hex suffix>' (DivolteIdentifier.java:55-61)
    head, b36, suffix = sid.split(":")
    assert head == "0" and len(suffix) == 16
    assert int(b36, 36) == 1_700_000_000_000


@pytest.mark.skipif(not tws_available(), reason="google.protobuf absent: transformWithStateInPandas state server cannot start")
def test_tws_end_to_end_stream(spark, tmp_path):
    import uuid

    from pyspark.sql import functions as F

    from divolte_collector_spark.streaming.tws import (
        ROCKSDB_PROVIDER_CONF,
        sessionize_tws,
    )

    ev = spark.createDataFrame(
        [("p1", "e1", "2024-01-01 00:00:00"), ("p1", "e2", "2024-01-01 00:05:00")],
        "party_id string, event_id string, client_time string",
    ).select("party_id", "event_id", F.col("client_time").cast("timestamp"))
    src = str(tmp_path / "src")
    ev.write.json(src)
    key, provider = ROCKSDB_PROVIDER_CONF
    spark.conf.set(key, provider)
    try:
        stream = spark.readStream.schema(
            "party_id string, event_id string, client_time timestamp"
        ).json(src)
        name = "tws_e2e_" + uuid.uuid4().hex[:8]
        q = (
            sessionize_tws(stream, watermark="0 seconds")
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        rows = {r.event_id: r for r in spark.table(name).collect()}
        assert rows["e1"].first_in_session and not rows["e2"].first_in_session
    finally:
        spark.conf.unset(key)


def test_tws_unavailability_is_exactly_the_protobuf_import():
    """Self-documenting gate for the one environment-bounded skip: the
    ONLY thing between this suite and the end-to-end
    transformWithStateInPandas stream is the google.protobuf runtime
    (PySpark's state-server protocol imports it at stream start). If
    this test ever fails because the import succeeds, tws_available()
    flips true, the e2e test un-skips, and the skip should be retired."""
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as exc:
        assert not tws_available()
        # the precise unblock: a protobuf wheel (pure-python runtime
        # suffices; no compiled extension needed)
        assert exc.name in ("google", "google.protobuf"), exc
    else:
        assert tws_available(), (
            "protobuf importable but tws_available() still false"
        )
