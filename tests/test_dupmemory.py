"""The distributed lag-over-slot duplicate flag must replay the
reference's sequential slot array bit-for-bit
(ShortTermDuplicateMemory.java:139-178)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from divolte_collector_spark.operators.dupmemory import (
    _slot_and_signature,
    flag_probable_duplicates,
    reference_replica,
)


def _stream(n=400, dup_every=5, seed=7):
    """Synthetic event stream where every ``dup_every``-th event is
    replayed a few positions later — near enough that its slot usually
    survives (flag=true), far enough that some slots get overwritten
    in between (false negatives) — both behaviors exercised."""
    rng = random.Random(seed)
    events = []
    for i in range(n):
        party = f"0:abc:{rng.randrange(40)}"
        session = f"0:abc:{rng.randrange(80)}"
        event = f"ev{i}"
        events.append((party, session, event))
        if i % dup_every == 0 and i >= dup_every:
            # replay an event from a few positions back
            events.append(events[-rng.randrange(2, 8)])
    return events


def test_slot_signature_matches_guava_layout():
    # murmur3_128 of UTF-16LE "abc", Guava putUnencodedChars semantics:
    # slot from big-endian low int, signature from big-endian high long.
    slot, sig = _slot_and_signature("abc", 1_000_000)
    assert 0 <= slot < 1_000_000
    assert -(1 << 63) <= sig < (1 << 63)
    # deterministic
    assert (slot, sig) == _slot_and_signature("abc", 1_000_000)
    # different identity, different (slot, sig) with overwhelming prob.
    assert (slot, sig) != _slot_and_signature("abd", 1_000_000)


def test_distributed_flags_equal_sequential_replica(spark):
    events = _stream()
    # tiny slot count => heavy slot reuse => false negatives occur, and
    # the distributed window must reproduce every one of them
    slot_count = 32
    expected = reference_replica(events, slot_count)
    assert any(expected), "replica found no duplicates — stream too easy"
    df = spark.createDataFrame(
        [(i, p, s, e) for i, (p, s, e) in enumerate(events)],
        "seq long, party_id string, session_id string, event_id string",
    )
    out = flag_probable_duplicates(
        df, order_by="seq", slot_count=slot_count
    ).orderBy("seq")
    got = [r.detected_duplicate for r in out.collect()]
    assert got == expected


def test_replayed_event_is_duplicate_when_slot_untouched(spark):
    # no collisions possible: distinct identities + huge slot space,
    # immediate replay => exactly the replayed rows flag true
    events = [(f"0:a:{i}", f"0:b:{i}", f"e{i}") for i in range(20)]
    stream = events + [events[3], events[11]]
    expected = [False] * 20 + [True, True]
    assert reference_replica(stream, 1_000_000) == expected
    df = spark.createDataFrame(
        [(i, p, s, e) for i, (p, s, e) in enumerate(stream)],
        "seq long, party_id string, session_id string, event_id string",
    )
    out = flag_probable_duplicates(df, order_by="seq").orderBy("seq")
    assert [r.detected_duplicate for r in out.collect()] == expected
