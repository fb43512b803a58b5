"""Avro ``.avsc`` schema -> Spark StructType (reference §1.2/1.3).

Supported types and restrictions mirror the reference's validator
(DslRecordMapping.java:67-75 COMPATIBLE_PRIMITIVES; unions must be
trivial ``[null, T]`` — DslRecordMapping.java:975-985,1186-1196;
nesting via AvroGenericRecordMapper.checkValid,
AvroGenericRecordMapper.java:77-115). Field defaults come along for
unmapped-field semantics (docs/mapping_reference.rst:21-40: unmapped
fields take their schema default).

Schemas are validated *here, at load time* — a bad schema or mapping
refuses to start, the reference's startup-failure contract
(SchemaRegistry.java:95-111).
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import types as T


class SchemaMappingException(Exception):
    """Mapping/schema validation failure (startup-time, never runtime)."""


_PRIMITIVES: dict[str, T.DataType] = {
    "boolean": T.BooleanType(),
    "string": T.StringType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "bytes": T.BinaryType(),
}


def _convert(avro_type: Any) -> tuple[T.DataType, bool]:
    """Avro type decl -> (spark type, nullable)."""
    if isinstance(avro_type, str):
        if avro_type == "null":
            raise SchemaMappingException("bare 'null' type is not a field type")
        if avro_type in _PRIMITIVES:
            return _PRIMITIVES[avro_type], False
        raise SchemaMappingException(f"unsupported Avro type: {avro_type}")
    if isinstance(avro_type, list):
        # union: only trivial [null, T] (in either order) is accepted
        non_null = [t for t in avro_type if t != "null"]
        if len(avro_type) > 2 or len(non_null) != 1:
            raise SchemaMappingException(
                f"non-trivial unions are not supported: {avro_type}"
            )
        inner, _ = _convert(non_null[0])
        return inner, True
    if isinstance(avro_type, dict):
        kind = avro_type.get("type")
        if kind == "array":
            item, item_nullable = _convert(avro_type["items"])
            return T.ArrayType(item, containsNull=item_nullable), False
        if kind == "map":
            value, value_nullable = _convert(avro_type["values"])
            return T.MapType(T.StringType(), value, valueContainsNull=value_nullable), False
        if kind == "record":
            return _record_to_struct(avro_type), False
        if kind == "enum":
            # enum symbols -> string; literal membership is validated
            # at build time by enum_symbols()/validate_enum_literal
            return T.StringType(), False
        if kind == "fixed":
            return T.BinaryType(), False
        if kind in _PRIMITIVES:
            return _PRIMITIVES[kind], False
        raise SchemaMappingException(f"unsupported Avro type: {avro_type}")
    raise SchemaMappingException(f"unsupported Avro type: {avro_type!r}")


def _record_to_struct(record: dict) -> T.StructType:
    fields = []
    for f in record.get("fields", []):
        dtype, nullable = _convert(f["type"])
        # propagate REAL nullability (this was a constant-True typo):
        # a required Avro field maps to a non-nullable StructField so
        # validation layers can distinguish required from optional
        fields.append(T.StructField(f["name"], dtype, nullable=bool(nullable)))
    return T.StructType(fields)


def avro_to_spark_schema(schema: dict) -> tuple[T.StructType, dict[str, Any]]:
    """Parse an Avro record schema dict.

    Returns (StructType, defaults) where defaults maps field name to
    its Avro default value (missing => no default => null).
    """
    if schema.get("type") != "record":
        raise SchemaMappingException("top-level schema must be a record")
    struct = _record_to_struct(schema)
    defaults: dict[str, Any] = {}
    for f in schema.get("fields", []):
        if "default" in f:
            defaults[f["name"]] = f["default"]
    return struct, defaults


def enum_fields(schema: dict) -> dict[str, list[str]]:
    """Field name -> enum symbol list for every (possibly
    null-unioned) enum-typed field of a record schema — the build-time
    validation surface for literal mappings (an invalid symbol must be
    a STARTUP failure, not a per-record ValueError deep in the Avro
    encoder)."""
    out: dict[str, list[str]] = {}
    for f in schema.get("fields", []):
        t = f["type"]
        if isinstance(t, list):  # ["null", {...enum...}]
            non_null = [x for x in t if x != "null"]
            t = non_null[0] if len(non_null) == 1 else None
        if isinstance(t, dict) and t.get("type") == "enum":
            out[f["name"]] = list(t.get("symbols", []))
    return out


def load_avsc(path: str) -> tuple[T.StructType, dict[str, Any]]:
    with open(path) as fh:
        return avro_to_spark_schema(json.load(fh))
