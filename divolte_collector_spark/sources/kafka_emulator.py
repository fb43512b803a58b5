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
  Bases are derived from a column-pruned scan of the committed log's
  (partition, offset) columns — always consistent with what a reader
  can see, even after a crash (a real broker holds this watermark in
  memory; the scan is the crash-safe file-backed equivalent).
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

import os
import shutil
import uuid
from typing import Iterator

import pandas as pd

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


def _offset_bases(
    spark: SparkSession, data_dir: str, n_partitions: int
) -> dict[int, int]:
    """Next offset per partition, from the committed log itself
    (column-pruned (partition, offset) scan) — crash-consistent by
    construction: an uncommitted batch is invisible to both readers
    and this derivation."""
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
    # the ONE commit point: everything before it is invisible
    try:
        os.rename(staging, commit_dir)
    except OSError:
        # lost a commit race (another attempt of the same batch)
        shutil.rmtree(staging, ignore_errors=True)


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
    replay semantics)."""
    from divolte_collector_spark.streaming.sinks import kafka_frame

    epoch = uuid.uuid4().hex[:8]

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
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
