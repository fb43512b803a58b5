"""Sources x mappings x sinks topology (reference
IncomingRequestProcessor.java:51-53,85-137; OneSchemaPerSink.java) and
the mapping test harness (S6, MappingTestServer.java:60-140)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from divolte_collector_spark.mapping.dsl import MappingBuilder
from divolte_collector_spark.mapping.test_server import run_mapping_test
from divolte_collector_spark.streaming.topology import Topology, TopologyError


def _events(spark, source_tag, n):
    return spark.range(n).select(
        F.concat(F.lit("p"), F.col("id")).alias("party_id"),
        F.lit(source_tag).alias("event_source"),
        (F.col("id") % 2 == 0).alias("corrupt_event"),
    )


def test_many_to_many_fanout(spark):
    """2 sources -> 2 mappings -> 2 sinks; one mapping feeds both
    sinks (fan-out), one sink unions both mappings."""
    t = (
        Topology()
        .add_source("browser", _events(spark, "browser", 10))
        .add_source("json", _events(spark, "json", 5))
        .add_mapping(
            "clean",
            ["browser", "json"],
            lambda df: df.filter(~F.col("corrupt_event")).select(
                "party_id", "event_source"
            ),
        )
        .add_mapping(
            "all",
            ["browser"],
            lambda df: df.select("party_id", "event_source"),
        )
        .add_sink("hdfs", ["clean"])
        .add_sink("kafka", ["clean", "all"])
    )
    inputs = t.sink_inputs()
    # clean = 5 non-corrupt browser + 2 non-corrupt json (ids 1,3)
    assert inputs["hdfs"].count() == 5 + 2
    # kafka = clean(7) + all browser(10)
    assert inputs["kafka"].count() == 7 + 10


def test_unknown_source_refuses_at_build(spark):
    with pytest.raises(TopologyError, match="unknown sources"):
        Topology().add_mapping("m", ["nope"], lambda df: df)


def test_one_schema_per_sink(spark):
    t = (
        Topology()
        .add_source("s", _events(spark, "browser", 3))
        .add_mapping("m1", ["s"], lambda df: df.select("party_id"))
        .add_mapping("m2", ["s"], lambda df: df.select("party_id", "event_source"))
        .add_sink("k", ["m1", "m2"])
    )
    with pytest.raises(TopologyError, match="OneSchemaPerSink"):
        t.sink_inputs()


def test_writers_run_per_sink(spark):
    got = {}
    t = (
        Topology()
        .add_source("s", _events(spark, "browser", 4))
        .add_mapping("m", ["s"], lambda df: df.select("party_id"))
        .add_sink("out", ["m"], writer=lambda df, name: got.setdefault(name, df.count()))
    )
    t.start()
    assert got == {"out": 4}


def test_mapping_test_server_roundtrip(spark):
    """S6: synthetic event dict -> production mapping path -> record."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("party", T.StringType()),
            T.StructField("kind", T.StringType()),
            T.StructField("is_new", T.BooleanType()),
        ]
    )
    m = MappingBuilder(schema)
    m.map_value(F.col("party_id"), "party")
    with m.when(F.col("event_type") == "pageView"):
        m.map_literal("pv", "kind")
    m.map_value(F.col("new_party_id"), "is_new")

    rec = run_mapping_test(
        spark,
        m,
        {"party_id": "0:abc:1", "event_type": "pageView", "new_party_id": True},
    )
    assert rec == {"party": "0:abc:1", "kind": "pv", "is_new": True}

    rec2 = run_mapping_test(
        spark, m, {"party_id": "0:abc:2", "event_type": "click", "new_party_id": False}
    )
    assert rec2["kind"] is None  # when-guard false => field stays absent

    with pytest.raises(ValueError, match="unknown event fields"):
        run_mapping_test(spark, m, {"not_a_field": 1})
