"""Binary Avro record codec + schema fingerprints (reference §2.14).

The reference encodes each mapped record ONCE as binary Avro and fans
the buffer out to every sink (AvroRecordBuffer.java:93-112). Sinks
frame it:

- Kafka "naked" mode: the raw binary-Avro record
  (AvroRecordBufferSerializer.java:27-45);
- Kafka "confluent" mode: ``0x00`` magic + int32-BE schema id + record
  (ConfluentAvroRecordBufferSerializer.java:28-45);
- Pub/Sub: record bytes + attributes incl. base64url SHA-256
  ``SchemaNormalization.parsingFingerprint`` of the schema
  (GoogleCloudPubSubFlusher.java:45-91).

No spark-avro or python-avro package is available in this environment,
so the (small, fully-specified) wire format is implemented here from
the public Avro 1.x specification: zigzag-varint ints/longs, UTF-8
length-prefixed strings/bytes, little-endian IEEE floats, union index
prefix, block-encoded arrays/maps. Schemas are the same dicts
mapping/avro_schema.py validates (trivial [null,T] unions only).

Used from ``mapInPandas``/``foreachBatch`` — one Python crossing per
batch, amortized like every other UDF here.
"""

from __future__ import annotations

import hashlib
import json
import struct
from typing import Any

# --- primitives -------------------------------------------------------------


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def encode_long(n: int) -> bytes:
    """Avro long: zigzag then varint."""
    z = _zigzag(n) & 0xFFFFFFFFFFFFFFFF
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def decode_long(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos


def encode_bytes(b: bytes) -> bytes:
    return encode_long(len(b)) + b


def encode_string(s: str) -> bytes:
    return encode_bytes(s.encode("utf-8"))


# --- record encoding --------------------------------------------------------


def _encode_value(avro_type: Any, value: Any) -> bytes:
    if isinstance(avro_type, list):  # trivial [null, T] union
        non_null = [t for t in avro_type if t != "null"]
        if value is None:
            return encode_long(avro_type.index("null"))
        return encode_long(avro_type.index(non_null[0])) + _encode_value(
            non_null[0], value
        )
    if isinstance(avro_type, dict):
        kind = avro_type["type"]
        if kind == "record":
            return encode_record(avro_type, value)
        if kind == "array":
            if not value:
                return encode_long(0)
            body = b"".join(_encode_value(avro_type["items"], v) for v in value)
            return encode_long(len(value)) + body + encode_long(0)
        if kind == "map":
            if not value:
                return encode_long(0)
            body = b"".join(
                encode_string(k) + _encode_value(avro_type["values"], v)
                for k, v in value.items()
            )
            return encode_long(len(value)) + body + encode_long(0)
        if kind == "enum":
            return encode_long(avro_type["symbols"].index(value))
        if kind == "fixed":
            if len(value) != avro_type["size"]:
                raise ValueError("fixed size mismatch")
            return bytes(value)
        avro_type = kind  # named primitive, fall through
    if avro_type == "null":
        return b""
    if avro_type == "boolean":
        return b"\x01" if value else b"\x00"
    if avro_type in ("int", "long"):
        return encode_long(int(value))
    if avro_type == "float":
        return struct.pack("<f", float(value))
    if avro_type == "double":
        return struct.pack("<d", float(value))
    if avro_type == "string":
        return encode_string(value)
    if avro_type == "bytes":
        return encode_bytes(bytes(value))
    raise ValueError(f"unsupported Avro type: {avro_type!r}")


def encode_record(schema: dict, record: dict) -> bytes:
    """Binary-Avro encode ``record`` (a plain dict) against ``schema``."""
    out = []
    for f in schema["fields"]:
        value = record.get(f["name"], f.get("default"))
        out.append(_encode_value(f["type"], value))
    return b"".join(out)


def _decode_value(avro_type: Any, buf: bytes, pos: int) -> tuple[Any, int]:
    if isinstance(avro_type, list):
        idx, pos = decode_long(buf, pos)
        branch = avro_type[idx]
        if branch == "null":
            return None, pos
        return _decode_value(branch, buf, pos)
    if isinstance(avro_type, dict):
        kind = avro_type["type"]
        if kind == "record":
            rec = {}
            for f in avro_type["fields"]:
                rec[f["name"]], pos = _decode_value(f["type"], buf, pos)
            return rec, pos
        if kind == "array":
            items = []
            while True:
                n, pos = decode_long(buf, pos)
                if n == 0:
                    return items, pos
                if n < 0:
                    _, pos = decode_long(buf, pos)  # block byte size
                    n = -n
                for _ in range(n):
                    v, pos = _decode_value(avro_type["items"], buf, pos)
                    items.append(v)
        if kind == "map":
            m = {}
            while True:
                n, pos = decode_long(buf, pos)
                if n == 0:
                    return m, pos
                if n < 0:
                    _, pos = decode_long(buf, pos)
                    n = -n
                for _ in range(n):
                    klen, pos2 = decode_long(buf, pos)
                    k = buf[pos2 : pos2 + klen].decode("utf-8")
                    pos = pos2 + klen
                    m[k], pos = _decode_value(avro_type["values"], buf, pos)
        if kind == "enum":
            idx, pos = decode_long(buf, pos)
            return avro_type["symbols"][idx], pos
        if kind == "fixed":
            size = avro_type["size"]
            return buf[pos : pos + size], pos + size
        avro_type = kind
    if avro_type == "null":
        return None, pos
    if avro_type == "boolean":
        return buf[pos] == 1, pos + 1
    if avro_type in ("int", "long"):
        return decode_long(buf, pos)
    if avro_type == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if avro_type == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if avro_type == "string":
        n, pos = decode_long(buf, pos)
        return buf[pos : pos + n].decode("utf-8"), pos + n
    if avro_type == "bytes":
        n, pos = decode_long(buf, pos)
        return bytes(buf[pos : pos + n]), pos + n
    raise ValueError(f"unsupported Avro type: {avro_type!r}")


def decode_record(schema: dict, buf: bytes) -> dict:
    rec, _ = _decode_value(schema, buf, 0)
    return rec


# --- schema normalization / fingerprints ------------------------------------

_CANONICAL_KEEP = ("name", "type", "fields", "symbols", "items", "values", "size")


def _canonical(schema: Any, namespace: str | None = None) -> Any:
    """Avro Parsing Canonical Form (Avro spec §"Transforming into
    Parsing Canonical Form"): keep only structural attributes, resolve
    fullnames, order attributes canonically."""
    if isinstance(schema, str):
        if schema in ("null", "boolean", "int", "long", "float", "double",
                      "bytes", "string"):
            return schema
        # named-type reference: qualify with enclosing namespace
        return schema if "." in schema or not namespace else f"{namespace}.{schema}"
    if isinstance(schema, list):
        return [_canonical(s, namespace) for s in schema]
    kind = schema["type"]
    if kind in ("record", "enum", "fixed"):
        name = schema["name"]
        ns = schema.get("namespace", namespace)
        fullname = name if "." in name or not ns else f"{ns}.{name}"
        out: dict[str, Any] = {"name": fullname, "type": kind}
        if kind == "record":
            out["fields"] = [
                {"name": f["name"], "type": _canonical(f["type"], ns)}
                for f in schema["fields"]
            ]
        elif kind == "enum":
            out["symbols"] = schema["symbols"]
        else:
            out["size"] = schema["size"]
        return out
    if kind == "array":
        return {"type": "array", "items": _canonical(schema["items"], namespace)}
    if kind == "map":
        return {"type": "map", "values": _canonical(schema["values"], namespace)}
    return _canonical(kind, namespace)


def parsing_canonical_form(schema: dict) -> str:
    """JSON text of the canonical form, minimal whitespace, field order
    name,type,fields/symbols/items/values/size (per the Avro spec)."""

    def order(obj: Any) -> Any:
        if isinstance(obj, dict):
            return {k: order(obj[k]) for k in _CANONICAL_KEEP if k in obj}
        if isinstance(obj, list):
            return [order(x) for x in obj]
        return obj

    return json.dumps(order(_canonical(schema)), separators=(",", ":"))


def schema_fingerprint_sha256(schema: dict) -> bytes:
    """``SchemaNormalization.parsingFingerprint("SHA-256", schema)`` —
    SHA-256 over the UTF-8 parsing canonical form
    (GoogleCloudPubSubFlusher.java:74-79)."""
    return hashlib.sha256(parsing_canonical_form(schema).encode("utf-8")).digest()


# --- object container files (Avro spec §"Object Container Files") -----------

OCF_MAGIC = b"Obj\x01"
_META_SCHEMA = {"type": "map", "values": "bytes"}


def default_sync_marker(schema: dict) -> bytes:
    """Deterministic 16-byte sync marker derived from the schema
    fingerprint (byte-identical output for identical input; pass 16
    random bytes for the reference's exact DataFileWriter behavior)."""
    return schema_fingerprint_sha256(schema)[:16]


def container_header(schema: dict, sync_marker: bytes) -> bytes:
    """OCF header: magic, file-metadata map (``avro.schema`` JSON +
    ``avro.codec`` null), 16-byte sync marker. An OCF is this header
    followed by any number of independent blocks — which is what makes
    the container format APPEND-ABLE: a writer can emit blocks as data
    arrives without buffering the file."""
    if len(sync_marker) != 16:
        raise ValueError("sync marker must be 16 bytes")
    meta = {
        "avro.schema": json.dumps(schema, separators=(",", ":")).encode("utf-8"),
        "avro.codec": b"null",
    }
    return b"".join([OCF_MAGIC, _encode_value(_META_SCHEMA, meta), sync_marker])


def container_block(schema: dict, records: list[dict], sync_marker: bytes) -> bytes:
    """One OCF block: (count, byte-size, records, sync). A reader can
    recover at every block boundary — the reference's
    sync-every-N-records durability granularity
    (FileStrategyConfiguration ``syncFileAfterRecords``)."""
    body = b"".join(encode_record(schema, r) for r in records)
    return b"".join(
        [encode_long(len(records)), encode_long(len(body)), body, sync_marker]
    )


def container_bytes(
    schema: dict,
    records: list[dict],
    sync_marker: bytes | None = None,
    block_records: int = 1000,
) -> bytes:
    """Serialize records as a complete Avro Object Container File
    (header + blocks of ``block_records``); see container_header /
    container_block for the streaming-append decomposition."""
    if sync_marker is None:
        sync_marker = default_sync_marker(schema)
    out = [container_header(schema, sync_marker)]
    for i in range(0, len(records), block_records):
        out.append(
            container_block(schema, records[i : i + block_records], sync_marker)
        )
    return b"".join(out)


def read_container(buf: bytes) -> tuple[dict, list[dict]]:
    """Parse an Avro Object Container File -> (schema, records).

    Validates magic, codec, and every block's sync marker — the
    read-back half of the K1 integration test."""
    if buf[:4] != OCF_MAGIC:
        raise ValueError("not an Avro object container file (bad magic)")
    meta, pos = _decode_value(_META_SCHEMA, buf, 4)
    codec = meta.get("avro.codec", b"null")
    if codec != b"null":
        raise ValueError(f"unsupported container codec: {codec!r}")
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    sync = buf[pos : pos + 16]
    pos += 16
    records: list[dict] = []
    while pos < len(buf):
        n, pos = decode_long(buf, pos)
        size, pos = decode_long(buf, pos)
        block_end = pos + size
        for _ in range(n):
            rec, pos = _decode_value(schema, buf, pos)
            records.append(rec)
        if pos != block_end:
            raise ValueError("container block size mismatch")
        if buf[pos : pos + 16] != sync:
            raise ValueError("container sync marker mismatch")
        pos += 16
    return schema, records


# --- sink framings ----------------------------------------------------------

CONFLUENT_MAGIC = b"\x00"


def confluent_frame(schema_id: int, avro_bytes: bytes) -> bytes:
    """``0x00 + int32-BE schema id + naked avro``
    (ConfluentAvroRecordBufferSerializer.java:28-45)."""
    return CONFLUENT_MAGIC + struct.pack(">i", schema_id) + avro_bytes
