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

import re as _re

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


#: definite-path operators get_json_object can express; anything else
#: (wildcards, recursive descent, [?(...)] filters, slices, unions)
#: needs the jayway-equivalent evaluator below
_GJO_SUBSET = _re.compile(r"^\$(\.[A-Za-z_][A-Za-z0-9_]*|\[\d+\])*$")


def is_gjo_expressible(path: str) -> bool:
    """True when ``get_json_object`` covers the path (dotted/indexed
    definite subset) — the JVM fast path; everything else falls back to
    :func:`json_path_full`."""
    return bool(_GJO_SUBSET.match(path))


def _jayway_numeric_filters(node, _seen=None):
    """Rewrite int filter literals to float in a compiled jsonpath-ng
    tree. jsonpath-ng's ``Expression.find`` coerces the *matched value*
    to ``int`` when the literal is an int (``ext/filter.py``:
    ``int(value)``), so ``[?(@.price > 1)]`` silently truncates 1.23 to
    1 and misses — jayway compares numerically. Floating the literal
    disables that cast path while preserving the comparison result for
    integer-valued data."""
    if _seen is None:
        _seen = set()
    if id(node) in _seen or not hasattr(node, "__dict__"):
        return node
    _seen.add(id(node))
    from jsonpath_ng.ext.filter import Expression as _FilterExpr

    if isinstance(node, _FilterExpr) and type(node.value) is int:
        node.value = float(node.value)
    for v in vars(node).values():
        if isinstance(v, (list, tuple)):
            for item in v:
                _jayway_numeric_filters(item, _seen)
        else:
            _jayway_numeric_filters(v, _seen)
    return node


def json_path_full(col: Column, path: str) -> Column:
    """Full JsonPath (jayway semantics, DslRecordMapping.java:587-593):
    supports ``[?(@.x > n)]`` filters, wildcards, recursive descent —
    the constructs ``get_json_object`` cannot express. Evaluated by an
    Arrow-batched pandas UDF over ``jsonpath-ng``; the path compiles
    ONCE at plan-build time (mirroring ``JsonPath.compile`` at mapping
    build, :588) and ships to the workers in the closure.

    Result semantics match the raw ``json_path``: the matched node's
    JSON serialization (indefinite paths — filters/wildcards/descent —
    always serialize as a list, as jayway does with
    suppress-exceptions), null when nothing matches or the document is
    malformed."""
    import json as _json

    from jsonpath_ng.ext import parse as _jp_parse

    expr = _jayway_numeric_filters(_jp_parse(path))  # compile once
    indefinite = not is_gjo_expressible(path)

    def _eval_batch(s):
        import pandas as pd

        def one(doc):
            try:
                matches = [m.value for m in expr.find(_json.loads(doc))]
            except Exception:
                return None  # suppress-exceptions configuration (:77-81)
            if indefinite:
                return _json.dumps(matches, separators=(",", ":"))
            if not matches:
                return None
            v = matches[0]
            return v if isinstance(v, str) else _json.dumps(
                v, separators=(",", ":")
            )

        return s.map(one, na_action="ignore")

    from pyspark.sql.functions import pandas_udf
    from pyspark.sql import types as T

    return pandas_udf(_eval_batch, T.StringType())(col)


def json_path_auto(col: Column, path: str) -> Column:
    """Route a JsonPath to the cheapest evaluator: the JVM
    ``get_json_object`` for the definite dotted/indexed subset, the
    jsonpath-ng Arrow UDF for everything else. This is the
    ``eventParameters().path(...)`` entry point."""
    if is_gjo_expressible(path):
        return json_path(col, path)
    return json_path_full(col, path)
