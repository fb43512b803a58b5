"""File-backed Kafka topic emulator: the integration harness that lets
the full produce → topic → scan → decode path execute without the
``spark-sql-kafka`` connector jar (absent in this sandbox).

The emulator is a directory-per-topic log holding parquet segments in
EXACTLY the shape the real kafka scan yields (``key binary, value
binary, topic string, partition int, offset long, timestamp timestamp,
timestampType int``), so :func:`emulated_kafka_stream` is a drop-in
replacement for ``kafka_stream`` and everything downstream —
``decode_kafka_events``, the mapping topology, the sinks — runs the
identical code it runs against a real broker.

Broker semantics emulated faithfully:

- **Partitioning**: the default Kafka producer partitioner —
  ``toPositive(murmur2(keyBytes)) % numPartitions`` — so all records
  of one party land in one partition, which is the ordering contract
  the reference's flusher relies on (KafkaFlusher.java:53-101 keys
  every record by party id for exactly this affinity).
- **Offsets**: per-partition, dense, monotonic across produce batches.
  Every committed batch dir carries a ``_watermark.json`` sidecar
  (written into the staging dir, so the SAME atomic rename commits
  data and watermark together) holding the post-batch next offsets.
  A producer derives its bases once per process — elementwise max
  over the sidecars, falling back to a column-pruned (partition,
  offset) scan for legacy dirs without one — then tracks the
  watermark in memory, so produce cost is O(batch) regardless of
  topic history (a real broker holds this watermark in memory; the
  sidecar is the crash-safe file-backed equivalent).
- **Single active producer per topic**: offsets are assigned
  producer-side with no inter-process coordination, so two CONCURRENT
  producer processes appending the same topic could mint overlapping
  offsets. ``emulated_kafka_sink`` enforces this with epoch fencing:
  each writer claims the topic (atomic ``_producer.claim`` replace);
  a newer claim fences the older writer, whose next batch fails
  loudly instead of corrupting offsets — the same
  newest-producer-wins semantics as Kafka's idempotent-producer
  epoch bump. Bare ``produce_batch`` callers inherit the constraint
  but not the fence; sequential producers (restart after crash) are
  always safe.
- **Atomic batch commit**: a batch's segment files are staged and then
  committed with ONE directory rename, so a concurrent streaming
  reader and the offset derivation never observe a partial batch.
- **Replay within a producer run**: ``foreachBatch`` may redeliver a
  batch after a failure; the committed directory is named by
  (producer epoch, batch id), so a redelivered batch id that already
  committed is dropped. ACROSS producer restarts the epoch changes
  and an uncommitted-then-redelivered batch appends again — Kafka's
  own at-least-once semantics for a non-idempotent producer; dedup
  belongs downstream (C6), exactly as with a real broker.

This is harness infrastructure — the per-batch offset-base derivation
is driver-side but reads only two int columns of the log.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from typing import Iterator

import pandas as pd
import pyarrow.dataset as pads

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

KAFKA_SCAN_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType()),
        T.StructField("value", T.BinaryType()),
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("timestampType", T.IntegerType()),
    ]
)


def murmur2(data: bytes) -> int:
    """Kafka's murmur2 (the default partitioner's hash; public
    algorithm). 32-bit, seed ``0x9747b28c ^ len``."""
    length = len(data)
    m = 0x5BD1E995
    mask = 0xFFFFFFFF
    h = (0x9747B28C ^ length) & mask
    i = 0
    for i in range(0, length - 3, 4):
        k = int.from_bytes(data[i : i + 4], "little")
        k = (k * m) & mask
        k ^= k >> 24
        k = (k * m) & mask
        h = (h * m) & mask
        h ^= k
    extra = length & 3
    tail = length - extra
    if extra == 3:
        h ^= (data[tail + 2] & 0xFF) << 16
    if extra >= 2:
        h ^= (data[tail + 1] & 0xFF) << 8
    if extra >= 1:
        h ^= data[tail] & 0xFF
        h = (h * m) & mask
    h ^= h >> 13
    h = (h * m) & mask
    h ^= h >> 15
    return h


def partition_for_key(key: bytes, n_partitions: int) -> int:
    """``toPositive(murmur2(key)) % n`` — the default partitioner."""
    return (murmur2(key) & 0x7FFFFFFF) % n_partitions


def _data_dir(log_dir: str, topic: str) -> str:
    return os.path.join(log_dir, topic, "data")


WATERMARK_FILE = "_watermark.json"

# per-process next-offset watermark, keyed by data dir: derived from
# the committed log once, then advanced in memory on every commit —
# the emulator's stand-in for the broker's in-memory log end offset
_WATERMARK_CACHE: dict[str, dict[int, int]] = {}


def _offset_bases_scan(
    spark: SparkSession, data_dir: str, n_partitions: int
) -> dict[int, int]:
    """Legacy full derivation: column-pruned (partition, offset) scan
    of every committed segment. Only reached for logs written before
    watermark sidecars existed."""
    bases = {p: 0 for p in range(n_partitions)}
    if any(
        f.endswith(".parquet")
        for _, _, fs in os.walk(data_dir)
        for f in fs
    ):
        rows = (
            spark.read.schema(KAFKA_SCAN_SCHEMA)
            .option("recursiveFileLookup", "true")
            .parquet(data_dir)
            .groupBy("partition")
            .agg((F.max("offset") + 1).alias("n"))
            .collect()
        )
        for r in rows:
            bases[int(r["partition"])] = int(r["n"])
    return bases


def _offset_bases(
    spark: SparkSession, data_dir: str, n_partitions: int
) -> dict[int, int]:
    """Next offset per partition — crash-consistent by construction:
    an uncommitted batch is invisible to readers, to the sidecars,
    and to this derivation.

    Order of preference: the in-process watermark (O(1)); elementwise
    max over the committed dirs' ``_watermark.json`` sidecars (one
    tiny json read per batch dir, no Spark job — order-free, so it
    needs no cross-epoch commit ordering); full segment scan if any
    committed dir predates sidecars."""
    cached = _WATERMARK_CACHE.get(data_dir)
    if cached is not None and len(cached) >= n_partitions:
        return dict(cached)
    bases = {p: 0 for p in range(n_partitions)}
    need_scan = False
    for entry in sorted(os.listdir(data_dir)):
        path = os.path.join(data_dir, entry)
        if not (entry.startswith("batch=") and os.path.isdir(path)):
            continue
        try:
            with open(os.path.join(path, WATERMARK_FILE)) as fh:
                wm = json.load(fh)
        except OSError:
            need_scan = True
            break
        for p_str, nxt in wm.items():
            p = int(p_str)
            bases[p] = max(bases.get(p, 0), int(nxt))
    if need_scan:
        bases = _offset_bases_scan(spark, data_dir, n_partitions)
    _WATERMARK_CACHE[data_dir] = dict(bases)
    return bases


def produce_batch(
    spark: SparkSession,
    framed: DataFrame,
    log_dir: str,
    topic: str,
    batch_id: int,
    n_partitions: int = 4,
    producer_epoch: str = "p0",
) -> None:
    """Append one batch of (key, value) frames to the topic log.

    Executor-side: partition assignment (murmur2 on the key bytes) and
    the segment write. Driver-side: the offset-base derivation and one
    atomic directory rename. A (producer_epoch, batch_id) that already
    committed is dropped — idempotent replay within a producer run."""
    data_dir = _data_dir(log_dir, topic)
    os.makedirs(data_dir, exist_ok=True)
    commit_dir = os.path.join(data_dir, f"batch={producer_epoch}-{batch_id:010d}")
    if os.path.exists(commit_dir):
        return  # this batch already committed: replay, drop it

    bases = _offset_bases(spark, data_dir, n_partitions)

    part_schema = T.StructType(
        list(framed.select("key", "value").schema.fields)
        + [T.StructField("partition", T.IntegerType())]
    )

    def assign(iterator: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in iterator:
            pdf = pdf[["key", "value"]].copy()
            pdf["partition"] = [
                partition_for_key(bytes(k), n_partitions)
                if k is not None
                else 0
                for k in pdf["key"]
            ]
            yield pdf

    assigned = framed.select("key", "value").mapInPandas(assign, part_schema)
    # deterministic in-batch order (a Spark batch has no producer send
    # order): sort by frame bytes within each partition
    w = Window.partitionBy("partition").orderBy("key", "value")
    base_map = F.create_map(
        *[x for p, n in bases.items() for x in (F.lit(p), F.lit(n))]
    )
    segment = assigned.select(
        "key",
        "value",
        F.lit(topic).alias("topic"),
        "partition",
        (
            F.element_at(base_map, F.col("partition"))
            + F.row_number().over(w)
            - 1
        ).cast("long").alias("offset"),
        F.lit(None).cast("timestamp").alias("timestamp"),
        F.lit(-1).alias("timestampType"),  # NO_TIMESTAMP_TYPE
    )
    staging = os.path.join(log_dir, topic, f"_staging_{uuid.uuid4().hex}")
    segment.write.mode("overwrite").parquet(staging)
    for extra in ("_SUCCESS",):
        try:
            os.unlink(os.path.join(staging, extra))
        except FileNotFoundError:
            pass
    # post-batch watermark, derived from the staged segment itself
    # (driver-side pyarrow read of two int columns of ONE batch — no
    # Spark job, O(batch)); written INTO staging so the rename below
    # commits data + watermark atomically
    staged = pads.dataset(staging, format="parquet").to_table(
        columns=["partition", "offset"]
    )
    new_bases = dict(bases)
    if staged.num_rows:
        per_part = (
            staged.to_pandas().groupby("partition")["offset"].max()
        )
        for p, max_off in per_part.items():
            new_bases[int(p)] = max(
                new_bases.get(int(p), 0), int(max_off) + 1
            )
    with open(os.path.join(staging, WATERMARK_FILE), "w") as fh:
        json.dump({str(p): n for p, n in new_bases.items()}, fh)
    # the ONE commit point: everything before it is invisible
    try:
        os.rename(staging, commit_dir)
        _WATERMARK_CACHE[data_dir] = dict(new_bases)
    except OSError:
        # lost a commit race (another attempt of the same batch);
        # drop the in-process watermark — re-derive from the sidecars
        shutil.rmtree(staging, ignore_errors=True)
        _WATERMARK_CACHE.pop(data_dir, None)


def claim_topic(log_dir: str, topic: str, epoch: str) -> None:
    """Epoch-fence claim: atomically record ``epoch`` as the topic's
    active producer (last claim wins, like Kafka's producer epoch
    bump). Underscore-prefixed, so invisible to readers."""
    topic_dir = os.path.join(log_dir, topic)
    os.makedirs(topic_dir, exist_ok=True)
    tmp = os.path.join(topic_dir, f"_claim_{uuid.uuid4().hex}")
    with open(tmp, "w") as fh:
        fh.write(epoch)
    os.replace(tmp, os.path.join(topic_dir, "_producer.claim"))


def check_claim(log_dir: str, topic: str, epoch: str) -> None:
    """Raise if a newer producer has claimed the topic — a fenced
    writer must fail loudly rather than mint overlapping offsets."""
    try:
        with open(os.path.join(log_dir, topic, "_producer.claim")) as fh:
            current = fh.read()
    except OSError:
        return  # unclaimed (bare produce_batch producers) — allowed
    if current != epoch:
        raise RuntimeError(
            f"kafka emulator: topic '{topic}' was claimed by producer "
            f"epoch {current!r}; this writer (epoch {epoch!r}) is "
            "fenced — only one active producer per topic"
        )


def emulated_kafka_sink(
    df: DataFrame,
    log_dir: str,
    topic: str,
    checkpoint: str,
    schema: dict,
    mode: str = "naked",
    confluent_id: int | None = None,
    n_partitions: int = 4,
):
    """K3 write side against the emulator: the byte-exact framing from
    ``kafka_frame`` (key = party id) produced into the topic log —
    mirrors ``kafka_sink_writer`` with the broker swapped out. One
    producer epoch per writer instance (see module docstring for the
    replay semantics); the writer claims the topic at construction
    and is fenced if a newer writer claims it later."""
    from divolte_collector_spark.streaming.sinks import kafka_frame

    epoch = uuid.uuid4().hex[:8]
    claim_topic(log_dir, topic, epoch)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        check_claim(log_dir, topic, epoch)
        framed = kafka_frame(
            batch_df, schema, mode=mode, confluent_id=confluent_id
        )
        produce_batch(
            batch_df.sparkSession, framed, log_dir, topic, batch_id,
            n_partitions=n_partitions, producer_epoch=epoch,
        )

    return (
        df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )


def emulated_kafka_stream(
    spark: SparkSession,
    log_dir: str,
    topic: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Drop-in for ``kafka_stream``: a streaming scan over the topic
    log yielding the exact kafka source schema."""
    data_dir = _data_dir(log_dir, topic)
    os.makedirs(data_dir, exist_ok=True)
    reader = spark.readStream.schema(KAFKA_SCAN_SCHEMA).option(
        "recursiveFileLookup", "true"
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(data_dir)


def read_topic(spark: SparkSession, log_dir: str, topic: str) -> DataFrame:
    """Batch view of the topic log (assertions, replays)."""
    data_dir = _data_dir(log_dir, topic)
    return (
        spark.read.schema(KAFKA_SCAN_SCHEMA)
        .option("recursiveFileLookup", "true")
        .parquet(data_dir)
    )
