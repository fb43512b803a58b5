"""Sinks (reference §2.14 K1-K4), Spark-first.

K1/K2 (HDFS/GCS Avro files): the reference appends pre-encoded records
to ``<name>.partial`` working files, syncs every 1000 records / 30 s,
rolls hourly, then atomically renames into the publish dir, discarding
empties (FileFlusher.java:183-208, HdfsFileManager.java:79-127,
FileStrategyConfiguration.java:31-43). Spark's streaming file sink
already implements the same commit protocol (task temp file → atomic
rename + manifest); the roll interval maps to the trigger cadence plus
a time-bucket partition column. Parquet is the storage format here —
the spark-avro connector jar is not present in this environment, and
at 100 TB the columnar format is what a Spark consumer wants anyway;
record-level binary-Avro parity lives in ``kafka_frame`` below.

K3 (Kafka): ``ProducerRecord(topic, key=partyId, value=avro)``, naked
or Confluent-framed (KafkaFlusher.java:53-101, serializers). The
projection below produces exactly those (key, value) byte columns; on
a cluster with the kafka connector the stream writes with
``.writeStream.format("kafka")``, and the projection is testable
without it.

K4 (Pub/Sub): message bytes + attributes incl. the base64url SHA-256
schema fingerprint (GoogleCloudPubSubFlusher.java:45-91);
``pubsub_messages`` builds those columns for a ``foreachBatch``
publisher.
"""

from __future__ import annotations

import base64
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import DataStreamWriter

from divolte_collector_spark.functions.avro_codec import (
    confluent_frame,
    container_block,
    container_header,
    default_sync_marker,
    encode_record,
    schema_fingerprint_sha256,
)


def _clean(v):
    """Arrow->pandas turns a null value in a numeric column into NaN
    (and a null timestamp into NaT), which is NOT None — encode_record
    would then take the non-null union branch and int(nan) raises,
    aborting the whole micro-batch for one null field. Map the pandas
    missing sentinels back to None before encoding."""
    if v is None or v is pd.NaT:
        return None
    if isinstance(v, float) and v != v:  # NaN
        return None
    return v


def _record(row: dict, columns: list[str]) -> dict:
    return {c: _clean(row.get(c)) for c in columns}


def file_sink(
    df: DataFrame,
    path: str,
    checkpoint: str,
    roll_column: str = "client_time",
    trigger_seconds: int | None = 30,
    available_now: bool = False,
) -> DataStreamWriter:
    """K1-style rolling file sink: time-bucketed directories stand in
    for the hourly roll; Spark's manifest commit gives the same
    partial→publish atomicity."""
    out = df.withColumn(
        "_roll", F.date_format(F.col(roll_column), "yyyyMMddHH")
    )
    writer = (
        out.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .partitionBy("_roll")
        .outputMode("append")
    )
    if available_now:
        return writer.trigger(availableNow=True)
    if trigger_seconds is None:  # Spark's default micro-batch trigger
        return writer
    return writer.trigger(processingTime=f"{trigger_seconds} seconds")


def roll_file_name(
    roll: str, host_string: str, batch_tag: str, pid: int
) -> str:
    """The reference's container file naming —
    ``<yyyyLLddHHmmss>-divolte-tracking-<host>-<instance>.avro``
    (FileFlusher.java:54,262) — with the roll bucket as the date part
    and (batch tag, partition id) as the instance. Shared by the K1
    local/HDFS writer and the K2 GCS writer so the contract cannot
    silently diverge."""
    return f"{roll}-divolte-tracking-{host_string}-{batch_tag}-{pid}.avro"


def write_avro_files(
    batch_df: DataFrame,
    schema: dict,
    path: str,
    batch_tag: str,
    roll_column: str = "client_time",
    host_string: str = "spark",
) -> list[tuple[str, int]]:
    """Write one Avro container file per (roll bucket, partition) —
    the distributed core of the K1 sink, callable from ``foreachBatch``
    or on a batch DataFrame directly.

    Lifecycle parity (FileFlusher.java:183-208, HdfsFileManager.java:47,
    79-127): records append to a ``.partial`` inflight file which is
    atomically renamed into the publish directory on roll; empty files
    are discarded (never published). Naming is the reference's
    ``<yyyyLLddHHmmss>-divolte-tracking-<host>-<instance>.avro``
    (FileFlusher.java:54,262) with the roll bucket as the date part and
    the partition id as the instance number.

    Scale: the encode+write runs inside ``mapInPandas`` on the
    executors — each partition streams its own container file to
    (shared) storage, appending one OCF BLOCK per Arrow chunk as it
    arrives (the container format is block-appendable), so worker
    memory is bounded by the Arrow batch size, never by the roll
    bucket; the driver only collects the (filename, count) manifest.
    At 100 TB nothing funnels through the driver and nothing buffers
    a whole bucket.
    """
    import os

    columns = [f["name"] for f in schema["fields"]]
    out_schema = T.StructType(
        [T.StructField("file", T.StringType()), T.StructField("n", T.LongType())]
    )
    bucketed = batch_df.withColumn(
        "_roll", F.date_format(F.col(roll_column), "yyyyMMddHHmmss")
    )
    sync = default_sync_marker(schema)

    def write_partition(iterator: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() if TaskContext.get() else 0
        os.makedirs(path, exist_ok=True)
        # roll -> (open .partial handle, published name, record count);
        # the header goes out when the first record for a roll arrives,
        # then every Arrow chunk appends one block and is dropped
        open_files: dict[str, tuple] = {}
        published: set[str] = set()
        try:
            for pdf in iterator:
                for roll, group in pdf.groupby("_roll", sort=False):
                    records = [
                        _record(row, columns) for row in group.to_dict("records")
                    ]
                    if not records:
                        continue
                    if roll not in open_files:
                        name = roll_file_name(
                            roll, host_string, batch_tag, pid
                        )
                        fh = open(os.path.join(path, name + ".partial"), "wb")
                        fh.write(container_header(schema, sync))
                        open_files[roll] = [fh, name, 0]
                    entry = open_files[roll]
                    entry[0].write(container_block(schema, records, sync))
                    entry[2] += len(records)
            names: list[str] = []
            counts: list[int] = []
            for fh, name, n in open_files.values():
                fh.flush()
                os.fsync(fh.fileno())
                fh.close()
                # empties never open a file, so everything here publishes
                os.replace(
                    os.path.join(path, name + ".partial"), os.path.join(path, name)
                )  # atomic publish
                published.add(name)
                names.append(name)
                counts.append(n)
        finally:
            # an encode/write error mid-iteration must not leak handles
            # or leave orphaned .partial inflight files behind — the
            # reference's flusher discards the inflight file on failure
            # (FileFlusher.java:183-208); Spark then retries the task
            for fh, name, _ in open_files.values():
                if name in published:
                    continue
                try:
                    fh.close()
                except OSError:
                    pass
                try:
                    os.unlink(os.path.join(path, name + ".partial"))
                except OSError:
                    pass
        yield pd.DataFrame({"file": names, "n": counts})

    # repartition on the roll bucket so each bucket lands in few
    # partitions (few output files per roll), matching the one-file-
    # per-roll-per-writer layout of the reference's flusher threads
    manifest = (
        bucketed.repartition("_roll").mapInPandas(write_partition, out_schema).collect()
    )
    return [(r["file"], r["n"]) for r in manifest]


def avro_file_sink(
    df: DataFrame,
    path: str,
    checkpoint: str,
    schema: dict,
    roll_column: str = "client_time",
    trigger_seconds: int | None = 30,
    available_now: bool = False,
) -> DataStreamWriter:
    """K1: rolling TRUE-Avro container file sink for a streaming
    DataFrame, via ``foreachBatch`` + :func:`write_avro_files`.

    Each micro-batch publishes per-roll-bucket ``.avro`` container
    files through the ``.partial`` → rename protocol; a downstream
    Avro consumer of the reference's files can read these unchanged.
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        write_avro_files(
            batch_df, schema, path, batch_tag=str(batch_id), roll_column=roll_column
        )

    writer = (
        df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        return writer.trigger(availableNow=True)
    if trigger_seconds is None:  # Spark's default micro-batch trigger
        return writer
    return writer.trigger(processingTime=f"{trigger_seconds} seconds")


def kafka_frame(
    df: DataFrame,
    schema: dict,
    mode: str = "naked",
    confluent_id: int | None = None,
    key_col: str = "party_id",
) -> DataFrame:
    """Project a mapped-event DataFrame into Kafka (key, value) bytes.

    key = UTF-8 party id (DivolteIdentifierSerializer.java); value =
    binary Avro record, optionally Confluent-framed. Works on batch and
    streaming DataFrames; the record encode happens once per event and
    fans out — the AvroRecordBuffer serialize-once discipline.
    """
    if mode not in ("naked", "confluent"):
        raise ValueError(f"unknown kafka sink mode: {mode}")  # KafkaSinkMode.java:32-34
    if mode == "confluent" and confluent_id is None:
        raise ValueError("confluent mode requires a schema id")
    columns = [f["name"] for f in schema["fields"]]

    out_schema = T.StructType(
        [T.StructField("key", T.StringType()), T.StructField("value", T.BinaryType())]
    )

    def encode(iterator: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in iterator:
            vals = []
            for row in pdf.to_dict("records"):
                body = encode_record(schema, _record(row, columns))
                if mode == "confluent":
                    body = confluent_frame(confluent_id, body)
                vals.append(body)
            yield pd.DataFrame({"key": pdf[key_col].astype(str), "value": vals})

    return df.mapInPandas(encode, out_schema).select(
        F.col("key").cast("binary").alias("key"), "value"
    )


def pubsub_messages(
    df: DataFrame, schema: dict, confluent_id: int | None = None
) -> DataFrame:
    """K4: message data + attribute columns
    (GoogleCloudPubSubFlusher.java:48-91): partyIdentifier,
    eventIdentifier, ISO-instant timestamp, base64url schema
    fingerprint, and — when the schema is registry-backed — the
    optional ``schemaConfluentId`` attribute as ``0x`` + lowercase hex
    (:62: ``"0x" + Integer.toHexString(i)``)."""
    fingerprint = base64.urlsafe_b64encode(
        schema_fingerprint_sha256(schema)
    ).decode("ascii")
    confluent_hex = None if confluent_id is None else f"0x{confluent_id:x}"
    columns = [f["name"] for f in schema["fields"]]
    out_schema = T.StructType(
        [
            T.StructField("data", T.BinaryType()),
            T.StructField("partyIdentifier", T.StringType()),
            T.StructField("eventIdentifier", T.StringType()),
            T.StructField("timestamp", T.StringType()),
            T.StructField("schemaFingerprint", T.StringType()),
            T.StructField("schemaConfluentId", T.StringType()),
        ]
    )

    def encode(iterator: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in iterator:
            data = [
                encode_record(schema, _record(row, columns))
                for row in pdf.to_dict("records")
            ]
            yield pd.DataFrame(
                {
                    "data": data,
                    "partyIdentifier": pdf["party_id"].astype(str),
                    "eventIdentifier": pdf["event_id"].astype(str),
                    "timestamp": pd.to_datetime(pdf["client_time"]).dt.strftime(
                        "%Y-%m-%dT%H:%M:%S.%fZ"
                    ),
                    "schemaFingerprint": fingerprint,
                    "schemaConfluentId": confluent_hex,
                }
            )

    return df.mapInPandas(encode, out_schema)
