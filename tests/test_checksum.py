"""Corruption checksum (S4) against the reference's recorded request
corpus (RequestChecksumTest.java:41-77) — end-to-end through the
engine's query-string parsing, canonicalization, murmur3_32 and base36
comparison."""

from __future__ import annotations

from pyspark.sql import functions as F

from divolte_collector_spark.functions.checksum import (
    canonical_checksum_string,
    is_checksum_correct,
)
from divolte_collector_spark.functions.murmur import murmur3_32, murmur3_32_signed
from divolte_collector_spark.functions.querystring import qs_entries

# RequestChecksumTest.java:23-37 — recorded wire request (no '?').
_BASE = (
    "p=0%3Ai1t84hgy%3A5AF359Zjq5kUy98u4wQjlIZzWGhN~GlG&"
    "s=0%3Ai1t84hgy%3A95CbiPCYln_1e0a6rFvuRkDkeNnc6KC8&"
    "v=0%3A1fF6GFGjDOQiEx_OxnTm_tl4BH91eGLF&"
    "e=0%3A1fF6GFGjDOQiEx_OxnTm_tl4BH91eGLF0&"
    "c=i1t8q2b6&n=f&f=f&"
    "l=http%3A%2F%2Flocalhost%3A8290%2F&"
    "i=1ak&j=sj&k=2&w=uq&h=qd&t=pageView"
)
# RequestChecksumTest.java:44-58 — non-ASCII event type, negative checksum.
_UNICODE = (
    "p=0%3Ai1t84hgy%3Aparty&s=0%3Ai1t84hgy%3Asession&v=0%3ApageView&"
    "e=0%3AeventId&c=i1t8q2b6&n=f&f=f&l=http%3A%2F%2Flocalhost%3A8290%2F&"
    "i=1ak&j=sj&k=2&w=uq&h=qd&"
    "t=%E1%BB%A5%C3%B1%E2%9A%95%C2%A9%C2%BA%E1%B8%8C%E2%84%A8&"
    "x=-ql2p2c"
)


def _verdicts(spark, cases):
    df = spark.createDataFrame([(c,) for c in cases], "qs string")
    return [
        r.ok
        for r in df.select(is_checksum_correct(F.col("qs")).alias("ok")).collect()
    ]


def test_reference_corpus(spark):
    cases = [
        _BASE + "&x=si9804",   # good (RequestChecksumTest URL_QUERY_CHECKSUM_GOOD)
        _BASE + "&x=si9805",   # bad
        _BASE,                 # missing checksum => incorrect
        _BASE + "&x",          # partial
        _BASE + "&x=",         # partial
        _UNICODE,              # good, negative base36 checksum, UTF-8 content
    ]
    assert _verdicts(spark, cases) == [True, False, False, False, False, True]


def test_canonical_string_shape(spark):
    # buildNormalizedChecksumString: sorted keys, values ','-terminated,
    # params ';'-terminated, 'x' excluded, multi-values kept in order.
    df = spark.createDataFrame([("b=2&a=1&b=3&x=zz&c",)], "qs string")
    out = df.select(
        canonical_checksum_string(qs_entries(F.col("qs"))).alias("cs")
    ).first()
    assert out.cs == "a=1,;b=2,3,;c=,;"


def test_jvm_and_python_canonicalization_agree(spark):
    # The JVM expression path and the UDF's Python path must build the
    # same canonical string => same checksum verdict.
    from divolte_collector_spark.functions.checksum import (
        checksum_verdict_py,
        murmur3_32_signed,
    )
    from divolte_collector_spark.functions.base36 import base36_encode

    qs = "b=2&a=x%20y&b=3&c&t=caf%C3%A9"
    cs = (
        spark.createDataFrame([(qs,)], "qs string")
        .select(canonical_checksum_string(qs_entries(F.col("qs"))).alias("cs"))
        .first()
        .cs
    )
    h = murmur3_32_signed(cs.encode("utf-8"))
    xval = spark.range(1).select(base36_encode(F.lit(h)).alias("x")).first().x
    assert checksum_verdict_py(f"{qs}&x={xval}") is True
    assert checksum_verdict_py(f"{qs}&x=1{xval}") is False


def test_murmur3_32_vectors():
    assert murmur3_32(b"", 0) == 0
    assert murmur3_32(b"", 1) == 0x514E28B7
    # signed interpretation matches Java HashCode.asInt()
    assert murmur3_32_signed(b"", 1) == 0x514E28B7
    h = murmur3_32_signed("a=1,;".encode("utf-8"))
    assert -(2**31) <= h < 2**31
