"""Event-parameter JSON-path operators (reference §2.9,
DslRecordMapping.java:575-645; JsonPath configured with
suppress-exceptions + ALWAYS_RETURN_LIST off, :77-81).

``get_json_object`` covers the dotted/indexed subset of JsonPath the
fixtures exercise. The reference's value semantics on top of it:

- scalar results map as their text (numbers stringified,
  ``Digester.java:92-103``: scalar JSON nodes digest as text);
- non-scalar results (objects, arrays, multi-match wildcards) are NOT
  scalars — as mapping/digest inputs they are absent
  (``Digester.java:104-110``: non-scalar JSON => absent piece).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def json_path(col: Column, path: str) -> Column:
    """Raw JsonPath extraction: scalar => text, object/array => their
    JSON serialization, missing => null."""
    return F.get_json_object(col, path)


def json_path_scalar(col: Column, path: str) -> Column:
    """JsonPath extraction with the reference's scalar-only semantics:
    a result node that is an object or array is absent.

    Node-type detection goes through VARIANT (``schema_of_variant`` of
    the extracted node) rather than sniffing the first character of the
    serialization: ``get_json_object`` returns scalar strings unquoted,
    so a string value like ``"[a]"`` would otherwise be misclassified
    as an array (Digester.java:92-110 classifies by node type, not by
    text)."""
    raw = F.get_json_object(col, path)
    if "*" in path or ".." in path:
        # Indefinite path: jayway always wraps matches in a list, so the
        # result node is non-scalar by construction — get_json_object's
        # array serialization (leading '[') detects exactly that; variant
        # extraction doesn't support wildcards anyway.
        non_scalar = raw.startswith("[")
    else:
        node_schema = F.schema_of_variant(
            F.try_variant_get(F.try_parse_json(col), path, "variant")
        )
        non_scalar = (
            node_schema.startswith("ARRAY")
            | node_schema.startswith("OBJECT")
            | node_schema.startswith("STRUCT")
        )
    return F.when(raw.isNotNull() & ~non_scalar, raw)


def json_path_exists(col: Column, path: str) -> Column:
    """Presence test (suppress-exceptions: missing/bad path => false,
    never error)."""
    return F.get_json_object(col, path).isNotNull()
