"""The switch-over path, end to end: access logs on disk -> custom
wirelog data source -> config-driven topology (reference.conf shape)
-> wire decode -> mapping -> TRUE Avro container files a downstream
divolte consumer reads unchanged."""

from __future__ import annotations

import glob
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from divolte_collector_spark.functions.avro_codec import (
    read_container,
    schema_fingerprint_sha256,
)
from divolte_collector_spark.sources.wirelog import WireLogDataSource
from divolte_collector_spark.streaming.config import build_topology

_QS = (
    "p=0%3Ai1t84hgy%3Aparty&s=0%3Ai1t84hgy%3Asession&v=pv{n}&e=ev{n}&"
    "c=i0rjfnxd&n=t&f=t&l=http%3A%2F%2Fexample.com%2Fhome&t=pageView"
)

_SCHEMA = {
    "type": "record",
    "name": "DivolteEvent",
    "fields": [
        {"name": "party_id", "type": ["null", "string"], "default": None},
        {"name": "session_id", "type": ["null", "string"], "default": None},
        {"name": "event_id", "type": ["null", "string"], "default": None},
        {"name": "event_type", "type": ["null", "string"], "default": None},
        {"name": "client_ms", "type": ["null", "long"], "default": None},
    ],
}


def test_wirelog_to_avro_containers(spark):
    logs = tempfile.mkdtemp(prefix="dvs_e2e_logs_")
    out = tempfile.mkdtemp(prefix="dvs_e2e_out_")
    try:
        with open(f"{logs}/access.log", "w") as fh:
            for i in range(5):
                fh.write(
                    f'2024-01-02T03:04:0{i} 10.0.0.{i} '
                    f'"GET /csc-event?{_QS.format(n=i)} HTTP/1.1" "Agent/1.0"\n'
                )
            fh.write("garbage line\n")

        spark.dataSource.register(WireLogDataSource)
        raw = (
            spark.read.format("divolte-wirelog")
            .load(logs)
            .filter(F.col("path") == "/csc-event")
        )

        def project(df):
            # keep client_time: the sink's roll bucketing keys on it
            return df.select(
                "party_id",
                "session_id",
                "event_id",
                "event_type",
                "client_time",
                F.unix_millis(F.col("client_time")).alias("client_ms"),
            )

        config = {
            "sources": {"browser": {"type": "browser"}},
            "mappings": {
                "default": {
                    "sources": ["browser"],
                    "sinks": ["hdfs"],
                    "mapping_script": "project",
                    "discard_corrupted": False,
                }
            },
            "sinks": {
                "hdfs": {"type": "hdfs", "path": out, "avro_schema": _SCHEMA}
            },
        }
        topo = build_topology(
            config, raw_sources={"browser": raw}, mapping_registry={"project": project}
        )
        results = topo.start()
        manifest = results["hdfs"]
        assert manifest and sum(n for _, n in manifest) == 5

        files = glob.glob(f"{out}/*.avro")
        assert files and not glob.glob(f"{out}/*.partial")
        fingerprint = schema_fingerprint_sha256(_SCHEMA)
        got = []
        for f in files:
            schema, records = read_container(open(f, "rb").read())
            assert schema_fingerprint_sha256(schema) == fingerprint
            got.extend(records)
        assert sorted(r["event_id"] for r in got) == [f"ev{i}" for i in range(5)]
        assert all(r["party_id"] == "0:i1t84hgy:party" for r in got)
        assert all(r["client_ms"] == 1412220184033 for r in got)
    finally:
        shutil.rmtree(logs, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)
