"""Sessionization semantics (reference C3: 30-min sliding inactivity,
divolte.js:1305-1313)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from divolte_collector_spark.operators.sessionize import (
    session_stats,
    session_window_agg,
    sessionize,
)


def _mk_events(spark, rows):
    return spark.createDataFrame(
        [(i, u, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)) for i, (u, s) in enumerate(rows)],
        "event_id long, user_id long, ts timestamp",
    )


def test_gap_splits_session(spark):
    # user 1: events at 0s, 100s, then 100s + 30min + 1s (split),
    # user 2: single event.
    ev = _mk_events(spark, [(1, 0), (1, 100), (1, 100 + 1801), (2, 0)])
    out = sessionize(ev).orderBy("user_id", "ts").collect()
    assert [r.session_seq for r in out] == [1, 1, 2, 1]
    assert [r.first_in_session for r in out] == [True, False, True, True]


def test_exact_30min_gap_is_same_session(spark):
    # strict '>' boundary: exactly 1800s gap does NOT split (the cookie
    # is refreshed within the timeout).
    ev = _mk_events(spark, [(1, 0), (1, 1800)])
    out = sessionize(ev).orderBy("ts").collect()
    assert [r.session_seq for r in out] == [1, 1]


def test_session_stats_counts(spark):
    ev = _mk_events(spark, [(1, 0), (1, 10), (1, 4000), (2, 0)])
    stats = {
        (r.user_id, r.session_seq): r.n_events
        for r in session_stats(ev).collect()
    }
    assert stats == {(1, 1): 2, (1, 2): 1, (2, 1): 1}


def test_session_window_agrees_with_sessionize(spark):
    ev = _mk_events(
        spark,
        [(1, 0), (1, 100), (1, 5000), (1, 5100), (2, 0), (2, 7000), (3, 42)],
    )
    a = {
        (r.user_id, r.session_start, r.n_events)
        for r in session_stats(ev).select("user_id", "session_start", "n_events").collect()
    }
    b = {
        (r.user_id, r.session_start, r.n_events)
        for r in session_window_agg(ev).collect()
    }
    assert a == b
