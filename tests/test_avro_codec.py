"""Avro wire-format codec: varint/zigzag goldens from the Avro spec,
record roundtrips, parsing-canonical-form + fingerprint, Confluent
framing bytes (ConfluentAvroRecordBufferSerializerTest's territory)."""

from __future__ import annotations

import struct

from divolte_collector_spark.functions.avro_codec import (
    confluent_frame,
    decode_record,
    encode_long,
    encode_record,
    encode_string,
    parsing_canonical_form,
    schema_fingerprint_sha256,
)

SCHEMA = {
    "type": "record",
    "name": "TestRecord",
    "namespace": "io.example",
    "fields": [
        {"name": "b", "type": "boolean"},
        {"name": "i", "type": "int"},
        {"name": "l", "type": "long"},
        {"name": "s", "type": "string"},
        {"name": "d", "type": "double"},
        {"name": "opt", "type": ["null", "string"], "default": None},
        {"name": "arr", "type": {"type": "array", "items": "long"}},
        {"name": "m", "type": {"type": "map", "values": "string"}},
    ],
}


def test_varint_zigzag_goldens():
    # Avro spec examples: 0->00, -1->01, 1->02, -2->03, 2->04, -64->7f, 64->80 01
    assert encode_long(0) == b"\x00"
    assert encode_long(-1) == b"\x01"
    assert encode_long(1) == b"\x02"
    assert encode_long(-2) == b"\x03"
    assert encode_long(2) == b"\x04"
    assert encode_long(-64) == b"\x7f"
    assert encode_long(64) == b"\x80\x01"


def test_string_encoding():
    assert encode_string("foo") == b"\x06foo"
    assert encode_string("") == b"\x00"


def test_record_roundtrip():
    rec = {
        "b": True, "i": -7, "l": 1412220184033, "s": "héllo",
        "d": -78.3e-10, "opt": None, "arr": [1, -2, 3],
        "m": {"k1": "v1", "k2": "v2"},
    }
    buf = encode_record(SCHEMA, rec)
    assert decode_record(SCHEMA, buf) == rec
    rec2 = dict(rec, opt="present")
    assert decode_record(SCHEMA, encode_record(SCHEMA, rec2)) == rec2


def test_union_encoding_bytes():
    # null branch = union index 0 only; string branch = index 1 + payload
    s = {"type": "record", "name": "U",
         "fields": [{"name": "o", "type": ["null", "string"]}]}
    assert encode_record(s, {"o": None}) == b"\x00"
    assert encode_record(s, {"o": "x"}) == b"\x02\x02x"


def test_parsing_canonical_form():
    # docs/attributes stripped, fullname resolved, key order fixed
    cf = parsing_canonical_form(
        {
            "type": "record", "name": "R", "namespace": "com.ex",
            "doc": "ignore me",
            "fields": [
                {"name": "f", "type": "int", "doc": "x", "default": 3},
                {"name": "g", "type": ["null", "string"], "default": None},
            ],
        }
    )
    assert cf == (
        '{"name":"com.ex.R","type":"record","fields":'
        '[{"name":"f","type":"int"},{"name":"g","type":["null","string"]}]}'
    )


def test_fingerprint_stable_and_doc_insensitive():
    a = {"type": "record", "name": "R",
         "fields": [{"name": "f", "type": "int"}]}
    b = {"type": "record", "name": "R", "doc": "different docs",
         "fields": [{"name": "f", "type": "int", "doc": "note"}]}
    assert schema_fingerprint_sha256(a) == schema_fingerprint_sha256(b)
    assert len(schema_fingerprint_sha256(a)) == 32


def test_confluent_frame():
    # 0x00 magic + int32-BE schema id + body
    framed = confluent_frame(0x0102, b"avro")
    assert framed == b"\x00" + struct.pack(">i", 0x0102) + b"avro"
    assert framed[0] == 0
    assert struct.unpack(">i", framed[1:5])[0] == 258


def test_container_roundtrip():
    # Object Container File: magic + meta map + sync, blocks of
    # (count, size, records, sync); read_container validates all three
    from divolte_collector_spark.functions.avro_codec import (
        container_bytes,
        read_container,
    )

    schema = {
        "type": "record", "name": "E",
        "fields": [
            {"name": "id", "type": "string"},
            {"name": "n", "type": "long"},
            {"name": "note", "type": ["null", "string"], "default": None},
        ],
    }
    records = [{"id": f"e{i}", "n": i, "note": None if i % 2 else "x"}
               for i in range(2500)]
    buf = container_bytes(schema, records, block_records=1000)
    assert buf[:4] == b"Obj\x01"
    got_schema, got = read_container(buf)
    assert got_schema["name"] == "E"
    assert got == records
    # deterministic: same input -> byte-identical container
    assert buf == container_bytes(schema, records, block_records=1000)
    # corrupted sync marker is detected
    import pytest as _pytest

    bad = bytearray(buf)
    bad[-1] ^= 0xFF
    with _pytest.raises(ValueError):
        read_container(bytes(bad))


# --- property fuzz: record + container roundtrips ----------------------------
# The golden tests pin spec examples; these generate thousands of
# records across the full type surface (extreme longs, unicode and
# NUL-bearing strings, empty arrays/maps, null unions) and assert
# decode(encode(r)) == r and read(container(rs)) == rs — the K1 sink's
# byte path under adversarial values.

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HAVE_HYP = True
except ImportError:  # pragma: no cover
    _HAVE_HYP = False

if _HAVE_HYP:
    _long = st.one_of(
        st.integers(-(2**63), 2**63 - 1),
        st.sampled_from([0, -1, 1, 2**62, -(2**63), 2**63 - 1]),
    )
    _string = st.text(max_size=20)  # any unicode, incl. '\x00' and surrogates-free astral
    _record = st.fixed_dictionaries(
        {
            "b": st.booleans(),
            "i": st.integers(-(2**31), 2**31 - 1),
            "l": _long,
            "s": _string,
            "d": st.floats(allow_nan=False),  # NaN breaks == comparison, not the codec
            "opt": st.one_of(st.none(), _string),
            "arr": st.lists(_long, max_size=5),
            "m": st.dictionaries(_string, _string, max_size=4),
        }
    )

    @settings(max_examples=300, deadline=None)
    @given(_record)
    def test_property_record_roundtrip(rec):
        assert decode_record(SCHEMA, encode_record(SCHEMA, rec)) == rec

    @settings(max_examples=60, deadline=None)
    @given(st.lists(_record, max_size=8))
    def test_property_container_roundtrip(recs):
        from divolte_collector_spark.functions.avro_codec import (
            container_bytes,
            read_container,
        )

        schema, out = read_container(container_bytes(SCHEMA, recs))
        assert out == recs
        assert schema["name"] == "TestRecord"
