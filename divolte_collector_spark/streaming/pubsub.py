"""K4: the Pub/Sub publisher loop, executor-distributed, against an
injectable client.

Message construction (data + attributes incl. the SHA-256 parsing
fingerprint) lives in :func:`~divolte_collector_spark.streaming.sinks.
pubsub_messages`; this module adds the reference flusher's *behavior*
(GoogleCloudPubSubFlusher.java:45-91, TopicFlusher.java:44-105):

- **Batch publish**: every message of a micro-batch is sent; outcomes
  are settled per message.
- **Retry on retriable**: a transient failure keeps the message in the
  pending set and the whole pending set is re-flushed (the reference
  returns PAUSE and re-sends ``pendingMessages`` on heartbeat; here
  the in-partition loop with backoff plays the heartbeat role).
- **Abandon on fatal**: a permanent or unknown error drops the message
  with a warning — it never blocks the stream (reference:
  "Permanent error ... abandoning").

Divergences from the reference, by design: the publisher client is a
synchronous ``publish(data, attributes) -> message_id`` callable
(the reference drives ApiFutures; Spark's foreachPartition is already
parallel across partitions, so per-message futures add nothing), and
retries are bounded per task attempt — exhaustion raises, Spark
retries the task, and foreachBatch redelivery gives the same
at-least-once guarantee the reference's indefinite heartbeat retry
provides.

No google-cloud SDK is importable in this sandbox, so the real
``Publisher`` is injected as a zero-arg factory (created once per
partition — clients don't serialize); tests drive a recording stub.
"""

from __future__ import annotations

import logging
import time
from typing import Callable, Iterable, Iterator

from pyspark.sql import DataFrame

from divolte_collector_spark.streaming.sinks import pubsub_messages

_LOG = logging.getLogger(__name__)

ATTRIBUTE_FIELDS = (
    "partyIdentifier",
    "eventIdentifier",
    "timestamp",
    "schemaFingerprint",
    "schemaConfluentId",
)


def flush_messages(
    messages: Iterable[dict],
    client,
    max_attempts: int = 8,
    backoff_s: float = 0.05,
    sleep: Callable[[float], None] = time.sleep,
) -> tuple[int, int]:
    """The TopicFlusher loop over one partition's messages: publish
    everything, re-flush the retriable remainder with exponential
    backoff, abandon fatal failures. Returns ``(published,
    abandoned)``; ``max_attempts`` bounds the number of *retry rounds*
    after the streaming pass — if that many rounds still leave
    messages pending, raises (task failure → Spark retry → batch
    redelivery).

    A message is a ``{"data": bytes, "attributes": {str: str}}`` dict;
    an exception with a truthy ``retryable`` attribute marks a
    transient failure (ApiException.isRetryable()), anything else is
    permanent/unknown → abandoned (TopicFlusher never lets one poison
    message wedge the queue).

    The first pass STREAMS the iterator — publish as rows arrive, hold
    only retryable failures — so executor memory is bounded by the
    pending set, not the partition (the reference flusher likewise
    keeps only ``pendingMessages``).
    """
    published = 0
    abandoned = 0
    pending: list[dict] = []

    def _try(msg: dict) -> str | None:
        """publish one message; returns 'pending' on retryable."""
        nonlocal published, abandoned
        try:
            client.publish(msg["data"], msg["attributes"])
            published += 1
        except Exception as exc:  # noqa: BLE001 — outcome-classified
            if getattr(exc, "retryable", False):
                return "pending"
            abandoned += 1
            # reference: "Permanent error ... abandoning" — data loss
            # must be visible, never silent
            _LOG.warning(
                "pub/sub flush: abandoning message on permanent error "
                "(event=%s): %s",
                msg["attributes"].get("eventIdentifier"), exc,
            )
        return None

    for msg in messages:
        if _try(msg) == "pending":
            pending.append(msg)

    attempt = 0
    while pending:
        attempt += 1
        sleep(backoff_s * (2 ** (attempt - 1)))
        pending = [msg for msg in pending if _try(msg) == "pending"]
        if pending and attempt >= max_attempts:
            raise RuntimeError(
                f"pub/sub flush: {len(pending)} message(s) still "
                f"pending after the streaming pass plus "
                f"{max_attempts} retry round(s)"
            )
    return published, abandoned


def _row_message(row) -> dict:
    attributes = {
        k: getattr(row, k)
        for k in ATTRIBUTE_FIELDS
        if getattr(row, k) is not None  # confluent id attribute is optional
    }
    return {"data": bytes(row.data), "attributes": attributes}


def publish_messages(
    messages_df: DataFrame,
    client_factory: Callable[[], object],
    max_attempts: int = 8,
    backoff_s: float = 0.05,
) -> None:
    """Publish a ``pubsub_messages``-shaped DataFrame: one client per
    partition (clients don't serialize; the factory does), rows
    published in partition order — per-party ordering holds whenever
    the upstream partitioning keys by party, exactly like the
    reference's per-flusher-thread queues."""

    def publish_partition(rows: Iterator) -> None:
        client = client_factory()
        published, abandoned = flush_messages(
            (_row_message(r) for r in rows),
            client,
            max_attempts=max_attempts,
            backoff_s=backoff_s,
        )
        if abandoned:
            _LOG.warning(
                "pub/sub flush: partition abandoned %d of %d message(s) "
                "on permanent errors",
                abandoned, published + abandoned,
            )
        # transactional clients expose a commit: a buffering/staging
        # client publishes durably only here, so a task retry or
        # speculative attempt that died mid-partition leaves no
        # visible partial output (a real Pub/Sub publisher is
        # fire-per-message and needs no commit — the method is
        # optional by design)
        commit = getattr(client, "commit", None)
        if commit is not None:
            commit()

    messages_df.foreachPartition(publish_partition)


def pubsub_sink(
    df: DataFrame,
    schema: dict,
    client_factory: Callable[[], object],
    checkpoint: str,
    confluent_id: int | None = None,
    max_attempts: int = 8,
    backoff_s: float = 0.05,
):
    """The full K4 write side: mapped events → message construction →
    executor-distributed publisher loop, as a streaming writer."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        msgs = pubsub_messages(batch_df, schema, confluent_id=confluent_id)
        publish_messages(
            msgs, client_factory,
            max_attempts=max_attempts, backoff_s=backoff_s,
        )

    return (
        df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
