"""Custom stateful streaming operator: per-EVENT session labeling.

The reference sessionizes client-side: divolte.js keeps a ``_dvs``
cookie holding the current session id, refreshes its 30-minute
expiry on every event (divolte.js:1305-1313), and mints a fresh id —
``'0:' + base36(now) + suffix`` (divolte.js:639-644,541-592) — when
the cookie is absent or expired, flagging the first event of the new
session (``firstInSession``).

``F.session_window`` gives per-SESSION aggregates, but not the
reference's per-EVENT view (each event labeled with its session id +
first-in-session flag, in arrival order). That requires custom state:
one (last_seen, session_id) pair per party, exactly the cookie. This
module implements it with ``applyInPandasWithState`` —
Structured Streaming's arbitrary-stateful-processing hook — so the
cookie semantics run server-side over a stream.

Scale: state is ~50 bytes per active party and is dropped by an
event-time timeout one gap after the party goes quiet — on a
1000-executor cluster the state store holds only parties active
within the watermark horizon, partitioned by party (the same
murmur3(partyId) affinity the reference uses for its mapper threads,
Item.java:33-47). No driver involvement, no unbounded state.

Ordering: events are labeled in event-time order within each
micro-batch; cross-batch ordering is guaranteed by the watermark
(late events beyond it are dropped upstream). The reference has the
analogous guarantee from per-party thread affinity
(ProcessingPool.java:87-92).
"""

from __future__ import annotations

import hashlib
from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

DEFAULT_GAP_SECONDS = 30 * 60  # divolte.js:1312; BrowserSourceConfiguration.java:40-41

_OUTPUT_SCHEMA = StructType(
    [
        StructField("party_id", StringType()),
        StructField("event_id", StringType()),
        StructField("client_time", TimestampType()),
        StructField("session_id", StringType()),
        StructField("first_in_session", BooleanType()),
    ]
)

# cookie state: last event millis + current session id
_STATE_SCHEMA = StructType(
    [StructField("last_ms", LongType()), StructField("session_id", StringType())]
)

_ALPHABET = "0123456789abcdefghijklmnopqrstuvwxyz"


def _base36(n: int) -> str:
    if n == 0:
        return "0"
    out = []
    while n > 0:
        n, r = divmod(n, 36)
        out.append(_ALPHABET[r])
    return "".join(reversed(out))


def _mint_session_id(party_id: str, start_ms: int) -> str:
    """Reference id format '0:<base36 millis>:<id>' (DivolteIdentifier.
    java:55-61). The suffix is derived deterministically from
    (party, start) instead of the client's CSPRNG so tests and
    re-runs are reproducible; uniqueness properties are identical."""
    suffix = hashlib.sha256(f"{party_id}|{start_ms}".encode()).hexdigest()[:16]
    return f"0:{_base36(start_ms)}:{suffix}"


def _make_labeler(gap_ms: int):
    def label(
        key: Tuple[str],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        party = key[0]
        if state.hasTimedOut:
            # party quiet for > gap beyond the watermark: cookie expired
            state.remove()
            return
        rows: list[dict[str, Any]] = []
        if state.exists:
            last_ms, session_id = state.get
        else:
            last_ms, session_id = -1, None
        # Materialize ALL chunks before sorting: Spark only guarantees the
        # grouping key per chunk, so one party's events can arrive split
        # across multiple Arrow batches (> arrow.maxRecordsPerBatch) in
        # arbitrary relative order. Sorting per-chunk would regress last_ms
        # silently. Memory is bounded by one party's per-batch events,
        # which the state design already assumes is small.
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if len(pdf):
            # event_id tiebreak: same-timestamp events must label in the
            # same order the SQL oracle's (ts, event_id) window uses
            pdf = pdf.sort_values(["client_time", "event_id"])
            for ev_id, ts in zip(pdf["event_id"], pdf["client_time"]):
                ms = int(ts.value // 1_000_000)  # pandas ns -> ms
                first = last_ms < 0 or (ms - last_ms) > gap_ms
                if first:
                    session_id = _mint_session_id(party, ms)
                # sliding refresh (divolte.js:1312) — but never BACKWARD:
                # an event later than the watermark but earlier than
                # last_ms (cross-batch late arrival) must not rewind the
                # inactivity clock, or the next on-time event sees an
                # inflated gap and mints a spurious session
                last_ms = max(last_ms, ms)
                rows.append(
                    {
                        "party_id": party,
                        "event_id": ev_id,
                        "client_time": ts,
                        "session_id": session_id,
                        "first_in_session": bool(first),
                    }
                )
        state.update((last_ms, session_id))
        # expire the cookie one gap after the last event (event time),
        # clamped to the engine watermark: a party whose events all lag
        # the global watermark (skewed or very late but accepted data)
        # would otherwise request a timeout in the past, which Spark
        # rejects and the task dies — clamping makes the cookie expire
        # at the next opportunity instead
        state.setTimeoutTimestamp(
            max(last_ms + gap_ms, state.getCurrentWatermarkMs() + 1)
        )
        yield pd.DataFrame(rows, columns=[f.name for f in _OUTPUT_SCHEMA.fields])

    return label


def sessionize_stateful(
    events: DataFrame,
    party_col: str = "party_id",
    event_col: str = "event_id",
    ts_col: str = "client_time",
    gap_seconds: int = DEFAULT_GAP_SECONDS,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Label every event of a STREAM with (session_id,
    first_in_session) per the reference's cookie semantics.

    One shuffle on the party key; per-party state is a single
    (timestamp, id) pair with an event-time timeout.
    """
    normalized = events.select(
        F.col(party_col).alias("party_id"),
        F.col(event_col).alias("event_id"),
        F.col(ts_col).alias("client_time"),
    ).withWatermark("client_time", watermark)
    return normalized.groupBy("party_id").applyInPandasWithState(
        _make_labeler(gap_seconds * 1000),
        outputStructType=_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
