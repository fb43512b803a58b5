"""functions/urlcanon.py: canonical-URL normalization edge cases the
gated query's synthesized matrix doesn't reach."""

from __future__ import annotations

from pyspark.sql import functions as F

from divolte_collector_spark.functions.urlcanon import canonical_url


def _canon(spark, urls, fast=False):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [
        r.c
        for r in df.select(
            canonical_url(F.col("url"), fast=fast).alias("c")
        ).collect()
    ]


STANDARD_MATRIX = [
    "HTTPS://WWW.Example.COM:443/a#frag",
    "https://www.example.com/a",
    "http://Example.com:80/b",
    "http://example.com:8080/b",
    "https://e.com/p?utm_source=x&b=2&a=1",
    "https://e.com/p?a=1&b=2&utm_campaign=y&utm_medium=z",
    "https://e.com/p?b=2&a=1",
    "https://e.com/p?utm_source=x&utm_medium=y",
    "https://e.com/p",
    "https://e.com/p?flag&a=2&a=1",
    "https://shop3.example.com:8443/p/49?a=1&b=2#x",
    # path-less URLs (query directly after the authority): the '?'
    # comes BEFORE any '/', which the fast split must handle
    "https://Example.com?b=2&utm_source=x&a=1",
    "https://example.com:8443?a=1",
    "https://example.com",
]


def test_pathless_url_with_query(spark):
    # REGRESSION: the fast decomposition split on '/' first, folding
    # the query string into the host for path-less URLs — tracking
    # params survived and the host was corrupted
    assert _canon(spark, ["https://Example.com?b=2&utm_source=x&a=1"],
                  fast=True) == ["https://example.com?a=1&b=2"]


def test_fast_mode_matches_parity_on_standard_shapes(spark):
    # the regex-free decomposition must be byte-identical to the
    # parse_url path for every standard scheme://host[:port]/path[?q][#f]
    assert _canon(spark, STANDARD_MATRIX, fast=True) == _canon(
        spark, STANDARD_MATRIX, fast=False
    )


def test_staged_operator_matches_column_form(spark):
    # with_canonical_url (the staged fast path the gated query uses)
    # must equal the single-Column form in BOTH modes, keep the input
    # columns, and leave no _uc_* staging columns behind
    from divolte_collector_spark.functions.urlcanon import (
        with_canonical_url,
    )

    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(STANDARD_MATRIX)], "id long, url string"
    )
    for fast in (True, False):
        out = with_canonical_url(df, F.col("url"), fast=fast)
        assert out.columns == ["id", "url", "canonical_url"]
        got = [r.canonical_url for r in out.orderBy("id").collect()]
        assert got == _canon(spark, STANDARD_MATRIX, fast=fast)


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


def test_encoded_separators_do_not_collide(spark):
    # REGRESSION: rebuilding from URL-DECODED values turned
    # ?a=%26b%3D2 (ONE param, value '&b=2') into the same bytes as
    # ?a=&b=2 (TWO params) — two distinct pages merged by the dedup.
    # Raw-byte canonicalization keeps them distinct.
    one_param, two_params = _canon(
        spark,
        ["https://e.com/p?a=%26b%3D2", "https://e.com/p?a=&b=2"],
    )
    assert one_param == "https://e.com/p?a=%26b%3D2"
    assert two_params == "https://e.com/p?a=&b=2"
    assert one_param != two_params


def test_value_keeps_everything_after_first_equals(spark):
    # ?a=b=c and ?a=b=d are different values, not both 'a=b'
    x, y = _canon(
        spark, ["https://e.com/p?a=b=c", "https://e.com/p?a=b=d"]
    )
    assert x == "https://e.com/p?a=b=c" and y == "https://e.com/p?a=b=d"


def test_custom_tracking_prefix(spark):
    df = spark.createDataFrame(
        [("https://e.com/p?ref_src=tw&a=1",)], "url string"
    )
    out = df.select(
        canonical_url(F.col("url"), tracking_prefix="ref_").alias("c")
    ).collect()
    assert out[0].c == "https://e.com/p?a=1"
