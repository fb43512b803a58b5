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


class TestXffRemoteHost:
    """ProxyAdjacentPeerAddressHandler semantics (reference :40-58)."""

    def _run(self, spark, cases):
        from divolte_collector_spark.functions.headers import xff_remote_host

        df = spark.createDataFrame(
            [(x, p) for x, p, _ in cases], "xff string, peer string"
        )
        got = [
            r.out
            for r in df.select(
                xff_remote_host(F.col("xff"), F.col("peer")).alias("out")
            ).collect()
        ]
        assert got == [want for _, _, want in cases]

    def test_branches(self, spark):
        self._run(
            spark,
            [
                (None, "9.9.9.9", "9.9.9.9"),  # no header -> peer
                ("1.2.3.4", "9.9.9.9", "1.2.3.4"),  # single entry
                # multi-hop: LAST entry wins, trimmed
                ("1.2.3.4, 5.6.7.8 ,  10.0.0.1  ", "9.9.9.9", "10.0.0.1"),
                # unparseable last entry -> peer stands
                ("1.2.3.4, evil.example.com", "9.9.9.9", "9.9.9.9"),
                ("1.2.3.4, 10.0.0.1:8080", "9.9.9.9", "9.9.9.9"),  # port
                ("300.1.2.3", "9.9.9.9", "9.9.9.9"),  # octet > 255
                ("", "9.9.9.9", "9.9.9.9"),  # empty header
                # IPv6 literals
                ("2001:db8::1", "9.9.9.9", "2001:db8::1"),
                ("1.2.3.4, ::ffff:10.1.2.3", "9.9.9.9", "::ffff:10.1.2.3"),
                ("::1", "9.9.9.9", "::1"),
                ("fe80:", "9.9.9.9", "9.9.9.9"),  # malformed v6
            ],
        )

    def test_browser_decode_rewrites_remote_host(self, spark):
        from divolte_collector_spark.sources.browser import parse_browser_events

        qs = (
            "p=0%3Ai1t84hgy%3Aparty&s=0%3Ai1t84hgy%3Asession&v=pv0&e=ev0&"
            "c=i0rjfnxd&n=t&f=t&l=http%3A%2F%2Fx.com&t=pageView"
        )
        raw = spark.createDataFrame(
            [(qs, "10.9.9.9", "1.2.3.4, 8.8.4.4"), (qs, "10.9.9.8", None)],
            "query_string string, remote_host string, x_forwarded_for string",
        )
        on = parse_browser_events(raw, use_x_forwarded_for=True)
        assert sorted(r.remote_host for r in on.collect()) == [
            "10.9.9.8",
            "8.8.4.4",
        ]
        off = parse_browser_events(raw)  # reference default: disabled
        assert sorted(r.remote_host for r in off.collect()) == [
            "10.9.9.8",
            "10.9.9.9",
        ]


def test_xff_scheme(spark):
    from divolte_collector_spark.functions.headers import xff_scheme

    df = spark.createDataFrame(
        [
            ("https", "http", "https"),  # replaced
            ("https, http", "http", "https"),  # first value wins
            (None, "http", "http"),  # absent -> keep
            ("", "http", "http"),  # empty -> keep
        ],
        "proto string, scheme string, want string",
    )
    rows = df.select(
        xff_scheme(F.col("proto"), F.col("scheme")).alias("got"), "want"
    ).collect()
    assert all(r.got == r.want for r in rows)
