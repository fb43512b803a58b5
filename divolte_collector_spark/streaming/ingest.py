"""Structured Streaming ingest pipeline (SURVEY Phase 4; reference
§3.1's thread/queue topology re-expressed as a streaming plan).

The reference's runtime is: sources enqueue → mapper threads keyed by
murmur3(partyId) % threads → per-mapping transform → sink pools
(IncomingRequestProcessor.java:85-137, ProcessingPool.java:87-92).
The Spark formulation:

- sources: any ``readStream`` of raw requests (file/socket/Kafka); the
  wire decoding (sources/browser.py, sources/json_source.py) is a pure
  DataFrame transform and applies to streams unchanged;
- the party-affinity routing IS shuffle-by-key — nothing to build;
- dedup: ``dropDuplicatesWithinWatermark`` on (party, session, event)
  — *exact* within the watermark horizon, strictly stronger than the
  reference's probabilistic slot array (C6) which admits false
  positives AND negatives (ShortTermDuplicateMemory.java:108-178);
- sessionization: ``session_window`` with watermark (C3's 30-minute
  inactivity gap, server-side);
- checkpointing replaces the pause/heartbeat recovery machinery
  (FileFlusher.java:126-160) with stronger no-data-loss semantics;
  the reference's load-shedding (drop events when queues fill,
  ProcessingPool.java:88-91) is deliberately NOT reproduced — Spark
  backpressures instead (documented divergence).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_DEDUP_KEYS = ["party_id", "session_id", "event_id"]
DEFAULT_WATERMARK = "10 minutes"
DEFAULT_SESSION_GAP = "30 minutes"


def dedup_events_stream(
    events: DataFrame,
    time_col: str = "client_time",
    watermark: str = DEFAULT_WATERMARK,
    keys: list[str] | None = None,
) -> DataFrame:
    """Streaming duplicate suppression (C6/C7).

    Exact event-identity dedup within the watermark horizon. State per
    key is a single timestamp — at 100 TB/day the state store holds
    only the horizon's worth of keys, partitioned by the dedup key
    (same affinity the reference gets from murmur3(partyId) routing).
    """
    return events.withWatermark(time_col, watermark).dropDuplicatesWithinWatermark(
        keys or DEFAULT_DEDUP_KEYS
    )


def sessionize_stream(
    events: DataFrame,
    time_col: str = "client_time",
    party_col: str = "party_id",
    gap: str = DEFAULT_SESSION_GAP,
    watermark: str | None = DEFAULT_WATERMARK,
) -> DataFrame:
    """Server-side streaming sessionization (C3): 30-minute inactivity
    windows per party, emitted when the watermark passes the session
    end. One shuffle on the party key; session state merges are
    handled by Spark's native session-window operator.

    Pass ``watermark=None`` when the input already carries one (e.g.
    downstream of :func:`dedup_events_stream` — Spark disallows
    redefining the watermark between chained stateful operators).
    """
    if watermark is not None:
        events = events.withWatermark(time_col, watermark)
    return (
        events.groupBy(F.col(party_col), F.session_window(F.col(time_col), gap))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(time_col).alias("session_start"),
            F.max(time_col).alias("session_end"),
        )
        .select(
            party_col,
            F.col("session_window.start").alias("window_start"),
            "n_events",
            "session_start",
            "session_end",
        )
    )


def discard_filtered(
    events: DataFrame,
    discard_corrupted: bool = False,
    discard_duplicates: bool = False,
    corrupt_col: str = "corrupt_event",
    duplicate_col: str = "duplicate",
) -> DataFrame:
    """Per-mapping discard filters (C7, Mapping.java:57-58,105-107)."""
    out = events
    if discard_corrupted:
        out = out.filter(~F.coalesce(F.col(corrupt_col), F.lit(False)))
    if discard_duplicates and duplicate_col in events.columns:
        out = out.filter(~F.coalesce(F.col(duplicate_col), F.lit(False)))
    return out


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str = "party_id",
    left_ts: str = "client_time",
    right_ts: str = "client_time",
    max_delay: str = "30 minutes",
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream interval join: pair each left event with right
    events of the same key that happened AT OR BEFORE it, within
    ``max_delay`` (e.g. purchases joined to the views that preceded
    them — the streaming half of the as-of family).

    Both sides carry watermarks so Spark can bound the join state: a
    buffered right row is dropped once the left watermark passes
    ``right_ts + max_delay`` (the standard interval-join state
    eviction). The join itself is an equi-join on the key plus a time
    band — one shuffle per side on the key, state bounded by
    key-cardinality x delay window, which is what survives a 100 TB/day
    stream where an unbounded join would not.
    """
    delay_expr = f"INTERVAL {max_delay}"
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}"))
        & (
            F.col(f"r.{right_ts}")
            >= F.col(f"l.{left_ts}") - F.expr(delay_expr)
        )
    )
    return l.join(r, cond, how)
