"""Property-based codec tests (hypothesis): Avro record/container
roundtrips over arbitrary values, base36 against Python's int parse,
and varint/zigzag inverses — the encode paths every sink depends on."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from divolte_collector_spark.functions.avro_codec import (
    container_bytes,
    decode_long,
    decode_record,
    encode_long,
    encode_record,
    read_container,
)

_SCHEMA = {
    "type": "record",
    "name": "PropRecord",
    "fields": [
        {"name": "s", "type": ["null", "string"], "default": None},
        {"name": "n", "type": "long"},
        {"name": "d", "type": "double"},
        {"name": "b", "type": "boolean"},
        {"name": "raw", "type": "bytes"},
        {"name": "xs", "type": {"type": "array", "items": "long"}},
        {"name": "kv", "type": {"type": "map", "values": "string"}},
    ],
}

_records = st.fixed_dictionaries(
    {
        "s": st.none() | st.text(max_size=80),
        "n": st.integers(min_value=-(2**63), max_value=2**63 - 1),
        "d": st.floats(allow_nan=False, allow_infinity=False, width=64),
        "b": st.booleans(),
        "raw": st.binary(max_size=64),
        "xs": st.lists(
            st.integers(min_value=-(2**62), max_value=2**62), max_size=8
        ),
        "kv": st.dictionaries(st.text(max_size=10), st.text(max_size=20), max_size=5),
    }
)


@settings(max_examples=200, deadline=None)
@given(_records)
def test_record_roundtrip_property(rec):
    assert decode_record(_SCHEMA, encode_record(_SCHEMA, rec)) == rec


@settings(max_examples=50, deadline=None)
@given(st.lists(_records, min_size=0, max_size=10))
def test_container_roundtrip_property(recs):
    schema, out = read_container(container_bytes(_SCHEMA, recs))
    assert out == recs
    assert schema["name"] == "PropRecord"


@settings(max_examples=500, deadline=None)
@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
def test_varint_zigzag_inverse(n):
    buf = encode_long(n)
    val, pos = decode_long(buf, 0)
    assert val == n and pos == len(buf)


def test_base36_engine_matches_python(spark):
    """The engine's JVM base36 encode/parse (functions/base36.py over
    F.conv) must agree with Python's int(x, 36) across a seeded corpus
    incl. the edges (0, 1, 35, 36, max epoch-ms range) — one Spark job
    for the whole corpus, not a job per example."""
    import random

    from pyspark.sql import functions as F

    from divolte_collector_spark.functions.base36 import (
        base36_encode,
        try_parse_base36_long,
    )

    rng = random.Random(42)
    values = [0, 1, 35, 36, 1295, 1296, 2**31, 2**53 - 1] + [
        rng.randrange(0, 2**53) for _ in range(500)
    ]
    df = spark.createDataFrame([(v,) for v in values], "v long")
    rows = df.select(
        "v",
        base36_encode(F.col("v")).alias("enc"),
        try_parse_base36_long(base36_encode(F.col("v"))).alias("back"),
    ).collect()
    digits = "0123456789abcdefghijklmnopqrstuvwxyz"

    def py36(n):
        if n == 0:
            return "0"
        acc, s = n, ""
        while acc:
            acc, r = divmod(acc, 36)
            s = digits[r] + s
        return s

    for r in rows:
        assert r.enc == py36(r.v), (r.v, r.enc)
        assert r.back == r.v
