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
- **Offsets**: per-partition, dense, monotonic across produce batches
  (a ``_meta`` file carries the next offset per partition).
- **Idempotent replay**: ``foreachBatch`` may redeliver a batch after
  a failure; a batch id at-or-below the applied watermark is dropped,
  so the log never double-appends (the same discipline as the upsert
  sink's pointer).
- **Atomic segment publish**: segments are written to a staging dir
  and renamed into the data dir file by file, so a concurrent
  streaming reader never sees a partial segment.

This is harness infrastructure — per-batch coordination (the meta
file, the offset bases) is driver-side but bounded by the partition
count, never by the data.
"""

from __future__ import annotations

import json
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


def _paths(log_dir: str, topic: str) -> tuple[str, str]:
    base = os.path.join(log_dir, topic)
    return os.path.join(base, "data"), os.path.join(base, "_meta")


def _read_meta(meta_path: str) -> dict:
    try:
        with open(meta_path) as fh:
            return json.load(fh)
    except (FileNotFoundError, json.JSONDecodeError):
        return {"applied": -1, "next": {}}


def _write_meta(meta_path: str, meta: dict) -> None:
    tmp = meta_path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, meta_path)


def produce_batch(
    spark: SparkSession,
    framed: DataFrame,
    log_dir: str,
    topic: str,
    batch_id: int,
    n_partitions: int = 4,
) -> None:
    """Append one batch of (key, value) frames to the topic log.

    Executor-side: partition assignment (murmur2 on the key bytes) and
    the segment write. Driver-side: only the per-partition offset
    bases and the applied-batch watermark (bounded by the partition
    count). Replays of an applied batch id are dropped."""
    data_dir, meta_path = _paths(log_dir, topic)
    os.makedirs(data_dir, exist_ok=True)
    meta = _read_meta(meta_path)
    if batch_id <= meta["applied"]:
        return  # idempotent replay

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
    bases = F.create_map(
        *[
            x
            for p in range(n_partitions)
            for x in (F.lit(p), F.lit(int(meta["next"].get(str(p), 0))))
        ]
    )
    segment = assigned.select(
        "key",
        "value",
        F.lit(topic).alias("topic"),
        "partition",
        (
            F.element_at(bases, F.col("partition"))
            + F.row_number().over(w)
            - 1
        ).cast("long").alias("offset"),
        F.lit(None).cast("timestamp").alias("timestamp"),
        F.lit(-1).alias("timestampType"),  # NO_TIMESTAMP_TYPE
    )
    staging = os.path.join(log_dir, topic, f"_staging_{uuid.uuid4().hex}")
    segment.write.mode("overwrite").parquet(staging)
    # atomic-enough publish for a local stream reader: rename each part
    # file into the data dir under a batch-unique name
    moved = []
    for fname in sorted(os.listdir(staging)):
        if fname.endswith(".parquet"):
            dest = os.path.join(data_dir, f"b{batch_id:010d}_{fname}")
            os.replace(os.path.join(staging, fname), dest)
            moved.append(dest)
    shutil.rmtree(staging, ignore_errors=True)

    # advance offsets from THIS segment only (cost tracks batch size,
    # not log size)
    if moved:
        produced = (
            spark.read.parquet(*moved)
            .groupBy("partition")
            .agg((F.max("offset") + 1).alias("n"))
            .collect()
        )
        meta["next"].update(
            {str(r["partition"]): int(r["n"]) for r in produced}
        )
    meta["applied"] = batch_id
    _write_meta(meta_path, meta)


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
    mirrors ``kafka_sink_writer`` with the broker swapped out."""
    from divolte_collector_spark.streaming.sinks import kafka_frame

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        framed = kafka_frame(
            batch_df, schema, mode=mode, confluent_id=confluent_id
        )
        produce_batch(
            batch_df.sparkSession, framed, log_dir, topic, batch_id,
            n_partitions=n_partitions,
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
    data_dir, _ = _paths(log_dir, topic)
    os.makedirs(data_dir, exist_ok=True)
    reader = spark.readStream.schema(KAFKA_SCAN_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(data_dir)


def read_topic(spark: SparkSession, log_dir: str, topic: str) -> DataFrame:
    """Batch view of the topic log (assertions, replays)."""
    data_dir, _ = _paths(log_dir, topic)
    return spark.read.schema(KAFKA_SCAN_SCHEMA).parquet(data_dir)
