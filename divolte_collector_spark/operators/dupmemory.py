"""Bit-exact batch emulation of the reference's probabilistic duplicate
memory (ShortTermDuplicateMemory.java:108-178, SURVEY §2.2 C6).

The reference keeps a ``long[slotCount]`` array; per event (in arrival
order on the single mapper thread):

- ``hash = murmur3_128(partyId ++ sessionId ++ eventId)`` where each
  property is fed through Guava ``putUnencodedChars`` (UTF-16LE code
  units, no separators) — IncomingRequestProcessor.java:150;
- ``slot = (int_be(bytes[0..3]) & Integer.MAX_VALUE) % slotCount``
  (Guava returns little-endian state bytes; the reference reads them
  back big-endian via ``Ints.fromBytes``);
- ``signature = long_be(bytes[8..15])``;
- duplicate iff ``memory[slot] == signature``; the slot is ALWAYS
  overwritten (admits both false positives — slot+signature collision —
  and false negatives — slot overwritten between the two occurrences).

Key identity that makes this distributable: the sequential scan is
exactly ``lag(signature) OVER (PARTITION BY slot ORDER BY seq) ==
signature`` — each event only compares against the most recent earlier
event hashing to its slot.  One shuffle on the slot id, no driver-side
state, no ordering requirement beyond a deterministic per-event
sequence (the reference's arrival order; any monotone event id works in
batch).  At 100 TB this is a plain window over a well-distributed
(hash-uniform) key.  The streaming path doesn't need any of this:
``dropDuplicatesWithinWatermark`` is exact (streaming/ingest.py).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from divolte_collector_spark.functions.murmur import murmur3_128

#: reference.conf:76 — global.mapper.duplicate_memory_size
DEFAULT_SLOT_COUNT = 1_000_000

_SLOT_SIG_TYPE = T.StructType(
    [
        T.StructField("slot", T.IntegerType()),
        T.StructField("signature", T.LongType()),
    ]
)


def _slot_and_signature(concatenated: str, slot_count: int) -> tuple[int, int]:
    # Guava putUnencodedChars == UTF-16LE code units of the chars.
    digest = murmur3_128(concatenated.encode("utf-16-le"))
    h1, h2 = digest  # each unsigned 64-bit, little-endian byte order
    raw = h1.to_bytes(8, "little") + h2.to_bytes(8, "little")
    slot_selector = int.from_bytes(raw[0:4], "big", signed=True)
    signature = int.from_bytes(raw[8:16], "big", signed=True)
    return (slot_selector & 0x7FFFFFFF) % slot_count, signature


def slot_signature_udf(slot_count: int = DEFAULT_SLOT_COUNT):
    """Arrow-batched UDF: concatenated identity string -> (slot, signature)."""

    @pandas_udf(_SLOT_SIG_TYPE)
    def _compute(s: pd.Series) -> pd.DataFrame:
        pairs = s.map(
            lambda v: _slot_and_signature(v, slot_count), na_action="ignore"
        )
        return pd.DataFrame(
            {
                "slot": pairs.map(lambda p: p[0], na_action="ignore"),
                "signature": pairs.map(lambda p: p[1], na_action="ignore"),
            }
        )

    return _compute


def flag_probable_duplicates(
    events: DataFrame,
    party_id: str | Column = "party_id",
    session_id: str | Column = "session_id",
    event_id: str | Column = "event_id",
    order_by: str | Column = "event_id",
    slot_count: int = DEFAULT_SLOT_COUNT,
    flag_col: str = "detected_duplicate",
) -> DataFrame:
    """Add the reference's probable-duplicate flag to a batch of events.

    ``order_by`` stands in for arrival order (the reference is a single
    sequential scan); any deterministic monotone column gives a
    reproducible replay of the slot array.
    """
    c = lambda x: F.col(x) if isinstance(x, str) else x  # noqa: E731
    ident = F.concat_ws("", c(party_id), c(session_id), c(event_id))
    with_hash = events.withColumn("_ss", slot_signature_udf(slot_count)(ident))
    w = Window.partitionBy(F.col("_ss.slot")).orderBy(c(order_by))
    prev_sig = F.lag(F.col("_ss.signature")).over(w)
    return (
        with_hash.withColumn(
            flag_col,
            F.coalesce(prev_sig == F.col("_ss.signature"), F.lit(False)),
        ).drop("_ss")
    )


def reference_replica(
    identities: list[tuple[str, str, str]], slot_count: int
) -> list[bool]:
    """Literal sequential replica of ShortTermDuplicateMemory for tests:
    the distributed lag-over-slot result must equal this exactly."""
    memory: dict[int, int] = {}
    out = []
    for party, session, event in identities:
        slot, sig = _slot_and_signature(party + session + event, slot_count)
        out.append(memory.get(slot) == sig)
        memory[slot] = sig
    return out
