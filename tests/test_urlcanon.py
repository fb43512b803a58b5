"""functions/urlcanon.py: canonical-URL normalization edge cases the
gated query's synthesized matrix doesn't reach."""

from __future__ import annotations

from pyspark.sql import functions as F

from divolte_collector_spark.functions.urlcanon import canonical_url


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [
        r.c for r in df.select(canonical_url(F.col("url")).alias("c")).collect()
    ]


def test_case_port_and_fragment_normalization(spark):
    assert _canon(
        spark,
        [
            "HTTPS://WWW.Example.COM:443/a#frag",
            "https://www.example.com/a",
            "http://Example.com:80/b",
            "http://example.com:8080/b",
        ],
    ) == [
        "https://www.example.com/a",
        "https://www.example.com/a",
        "http://example.com/b",
        "http://example.com:8080/b",  # non-default port survives
    ]


def test_tracking_params_dropped_and_rest_sorted(spark):
    assert _canon(
        spark,
        [
            "https://e.com/p?utm_source=x&b=2&a=1",
            "https://e.com/p?a=1&b=2&utm_campaign=y&utm_medium=z",
            "https://e.com/p?b=2&a=1",
        ],
    ) == ["https://e.com/p?a=1&b=2"] * 3


def test_only_tracking_params_loses_question_mark(spark):
    # a query that empties out must NOT leave a dangling '?': the
    # canonical identity equals the no-query form
    assert _canon(
        spark,
        ["https://e.com/p?utm_source=x&utm_medium=y", "https://e.com/p"],
    ) == ["https://e.com/p"] * 2


def test_valueless_and_duplicate_params(spark):
    # valueless params canonicalize as key= (the §2.6 grammar maps them
    # to ""); duplicate keys keep both values, ordered
    assert _canon(spark, ["https://e.com/p?flag&a=2&a=1"]) == [
        "https://e.com/p?a=1&a=2&flag="
    ]


def test_custom_tracking_prefix(spark):
    df = spark.createDataFrame(
        [("https://e.com/p?ref_src=tw&a=1",)], "url string"
    )
    out = df.select(
        canonical_url(F.col("url"), tracking_prefix="ref_").alias("c")
    ).collect()
    assert out[0].c == "https://e.com/p?a=1"
