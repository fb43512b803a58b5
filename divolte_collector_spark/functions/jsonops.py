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
    a result whose serialization is an object or array is absent."""
    raw = F.get_json_object(col, path)
    non_scalar = raw.startswith("[") | raw.startswith("{")
    return F.when(raw.isNotNull() & ~non_scalar, raw)


def json_path_exists(col: Column, path: str) -> Column:
    """Presence test (suppress-exceptions: missing/bad path => false,
    never error)."""
    return F.get_json_object(col, path).isNotNull()
