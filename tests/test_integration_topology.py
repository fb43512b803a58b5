"""End-to-end integration: raw wire traffic (streaming file source)
-> browser decode -> mapping DSL -> topology fan-out -> rolling file
sink + Kafka-framed output. The engine analogue of the reference's
many-to-many server topology tests
(ServerSinkSourceConfigurationTest.java:427, DslRecordMapperTest's
embedded server)."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from divolte_collector_spark.functions.avro_codec import decode_record
from divolte_collector_spark.mapping.dsl import MappingBuilder
from divolte_collector_spark.sources.browser import parse_browser_events
from divolte_collector_spark.streaming.sinks import file_sink, kafka_frame
from divolte_collector_spark.streaming.topology import Topology

_QS = (
    "p=0%3Ai1t84hgy%3Aparty{i}&s=0%3Ai1t84hgy%3Asess{i}&v=pv{i}&e=ev{i}&"
    "c=i0rjfnxd&n=f&f=t&l=http%3A%2F%2Fshop.example%2Fp%2F{i}&t=pageView"
)


@pytest.fixture()
def wire_dir():
    d = tempfile.mkdtemp(prefix="dvs_wire_")
    with open(f"{d}/requests.txt", "w") as fh:
        for i in range(8):
            fh.write(_QS.format(i=i) + "\n")
    yield d
    shutil.rmtree(d, ignore_errors=True)


_MAPPED_SCHEMA = {
    "type": "record",
    "name": "MappedEvent",
    "fields": [
        {"name": "party", "type": "string"},
        {"name": "event", "type": "string"},
        {"name": "kind", "type": ["null", "string"], "default": None},
        {"name": "page", "type": ["null", "string"], "default": None},
        {"name": "client_time", "type": ["null", "long"], "default": None},
    ],
}


def _mapping(df):
    m = MappingBuilder(_MAPPED_SCHEMA)
    m.map_value(F.col("party_id"), "party")
    m.map_value(F.col("event_id"), "event")
    with m.when(F.col("event_type") == "pageView"):
        m.map_literal("pv", "kind")
    m.map_value(F.col("browser.location"), "page")
    m.map_value(F.unix_millis(F.col("client_time")), "client_time")
    return m.apply(df)


def test_wire_to_sinks_end_to_end(spark, wire_dir):
    out = tempfile.mkdtemp(prefix="dvs_out_")
    try:
        raw = (
            spark.readStream.schema("query_string string")
            .format("text")
            .option("path", wire_dir)
            .load()
            .withColumnRenamed("value", "query_string")
        )
        decoded = parse_browser_events(raw)

        t = (
            Topology()
            .add_source("browser", decoded)
            .add_mapping("mapped", ["browser"], _mapping)
            .add_sink(
                "files",
                ["mapped"],
                writer=lambda df, name: file_sink(
                    df,
                    f"{out}/publish",
                    f"{out}/ckpt",
                    roll_column="_ct",
                    available_now=True,
                ).start(),
            )
        )
        # file sink rolls on a timestamp column; reconstruct one
        def _mapping_with_ts(df):
            return _mapping(df).withColumn(
                "_ct", F.timestamp_millis(F.col("client_time"))
            )

        t._mappings["mapped"].transform = _mapping_with_ts
        queries = t.start()
        queries["files"].awaitTermination(180)

        published = spark.read.parquet(f"{out}/publish")
        rows = published.orderBy("event").collect()
        assert len(rows) == 8
        assert rows[0].party == "0:i1t84hgy:party0"
        assert rows[0].kind == "pv"
        assert rows[0].page == "http://shop.example/p/0"
        assert rows[0].client_time == 1412220184033

        # Kafka framing of the same mapped batch: naked Avro roundtrip,
        # keyed by party id (K3)
        batch = published.drop("_roll", "_ct")
        framed = kafka_frame(batch, _MAPPED_SCHEMA, mode="naked", key_col="party")
        f0 = framed.orderBy("key").first()
        assert bytes(f0.key).decode() == "0:i1t84hgy:party0"
        rec = decode_record(_MAPPED_SCHEMA, bytes(f0.value))
        assert rec["party"] == "0:i1t84hgy:party0"
        assert rec["kind"] == "pv"
    finally:
        shutil.rmtree(out, ignore_errors=True)
