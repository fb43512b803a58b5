"""Scalar function parity: identifiers (C1), query-string multimap
(§2.6)."""

from __future__ import annotations

from pyspark.sql import functions as F

from divolte_collector_spark.functions.identifiers import (
    generate_identifier,
    identifier_id,
    identifier_timestamp,
    identifier_version,
    make_identifier,
)
from divolte_collector_spark.functions.querystring import (
    qs_multimap,
    qs_value,
    qs_value_list,
)


def test_identifier_roundtrip(spark):
    df = spark.createDataFrame([(1704067200123, "abc")], "ms long, id string")
    out = df.select(
        make_identifier(F.col("ms"), F.col("id")).alias("pid")
    ).select(
        "pid",
        identifier_timestamp(F.col("pid")).alias("ts"),
        identifier_version(F.col("pid")).alias("v"),
        identifier_id(F.col("pid")).alias("i"),
    ).first()
    # Java: Long.toString(1704067200123, 36) == 'lqu5m2rf'  (lowercase)
    assert out.pid == "0:lqu5m2rf:abc"
    assert out.ts == 1704067200123
    assert out.v == "0"
    assert out.i == "abc"


def test_generate_identifier_format():
    pid = generate_identifier(1704067200123)
    parts = pid.split(":")
    assert parts[0] == "0"
    assert int(parts[1], 36) == 1704067200123


def test_qs_multimap_multivalue_and_decode(spark):
    # QueryStringParser.java:37-79: URL-decoded keys/values, multi-value
    # preserved in order, valueless param => "".
    df = spark.createDataFrame(
        [("a=1&b=x%20y&a=2&c&a=3",)], "qs string"
    )
    m = qs_multimap(F.col("qs"))
    out = df.select(
        qs_value_list(m, "a").alias("a_list"),
        qs_value(m, "b").alias("b_first"),
        qs_value_list(m, "c").alias("c_list"),
        qs_value(m, "missing").alias("missing"),
    ).first()
    assert out.a_list == ["1", "2", "3"]
    assert out.b_first == "x y"
    assert out.c_list == [""]
    assert out.missing is None
