"""Server-side sessionization (reference C3).

The reference sessionizes client-side: a ``_dvs`` cookie with a
30-minute sliding inactivity timeout, refreshed on every event, new
session id when absent/expired, ``firstInSession`` on the session's
first event (divolte.js:25-27,630-645,1305-1313; default timeout
BrowserSourceConfiguration.java:40-41).

Engine-side we reproduce the same semantics over an event table:

- ``sessionize``        — batch: gap-detection via window functions.
  One shuffle on the party key (high cardinality ⇒ scales linearly;
  the reference's murmur3(partyId) % threads affinity routing,
  Item.java:33-47, is exactly a shuffle-by-key in Spark terms).
- ``session_window_agg`` — native ``F.session_window`` aggregation,
  the Structured-Streaming-compatible formulation.

Scale note: both formulations shuffle once on ``user_col``.  There is
no per-party state larger than a window frame, so a 1000-executor
cluster processes 100 TB of events with no driver involvement; AQE
handles skewed parties (a bot party with millions of events lands in
one partition — skew-join/partition-split covers the agg case, and the
window case is bounded by per-party event count, which the reference
has the same hot-spot behavior for).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_SESSION_GAP_SECONDS = 30 * 60  # divolte.js:1312, BrowserSourceConfiguration.java:40-41


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
    gap_seconds: int = DEFAULT_SESSION_GAP_SECONDS,
) -> DataFrame:
    """Assign ``session_seq`` (1-based per user) and ``first_in_session``.

    Exact-integer arithmetic on microseconds: a gap is "new session"
    iff ``ts - prev_ts > gap`` (strict), matching the reference's
    "within the timeout refreshes it" cookie semantics.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak)
    prev_us = F.lag(F.unix_micros(F.col(ts_col))).over(w)
    new_session = (
        prev_us.isNull()
        | ((F.unix_micros(F.col(ts_col)) - prev_us) > F.lit(gap_seconds * 1_000_000))
    ).cast("int")
    cum = Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return events.withColumn("_new_session", new_session).withColumn(
        "session_seq", F.sum("_new_session").over(cum).cast("long")
    ).withColumn("first_in_session", F.col("_new_session") == 1).drop("_new_session")


def session_stats(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = DEFAULT_SESSION_GAP_SECONDS,
) -> DataFrame:
    """Per-session aggregate: (user, session_seq, n_events, start, end)."""
    s = sessionize(events, user_col=user_col, ts_col=ts_col, gap_seconds=gap_seconds)
    return s.groupBy(user_col, "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
    )


def session_window_agg(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
) -> DataFrame:
    """Native session-window formulation (streaming-compatible).

    ``F.session_window`` merges events whose gap is < the timeout; its
    window end is last-event + gap, so we report ``min(ts)``/``count``
    which agree with :func:`session_stats` (up to the open/closed gap
    boundary: session_window splits on >=, sessionize on >; identical
    for continuous timestamps).
    """
    return (
        events.groupBy(F.col(user_col), F.session_window(F.col(ts_col), gap))
        .agg(F.count(F.lit(1)).alias("n_events"), F.min(ts_col).alias("session_start"))
        .select(user_col, "session_start", "n_events")
    )
