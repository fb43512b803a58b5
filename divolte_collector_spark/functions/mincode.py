"""Mincode decoder (reference S5).

Mincode is divolte's URL-friendly JSON-equivalent encoding for the
``u=`` event-parameters wire param. Grammar (from the encoder spec in
divolte.js:884-940 and the golden corpus mincode-samples.json; parser
counterpart MincodeParser.java — reimplemented here from the spec, not
translated):

- A *record* is: type char, then (inside an object) the field name
  escaped and ``!``-terminated, then the payload.
- ``s`` string: escaped payload, ``!``-terminated. Escaping: ``~``
  prefixes a literal ``~`` or ``!``.
- ``t`` / ``f`` true/false; ``n`` null (no payload).
- ``d`` number: base36 (lowercase, optional ``-``), ``!``-terminated.
- ``j`` number: JSON number literal, ``!``-terminated.
- ``(`` … ``)`` object; ``a`` … ``.`` array.

The decoder is a ~70-line recursive-descent pure function executed in
an Arrow-batched pandas UDF; there is no Spark built-in for this
format. Output is a JSON string so downstream extraction composes with
``get_json_object`` / ``from_json`` (same layering as the reference:
mincode -> JsonNode -> AvroGenericRecordMapper).
"""

from __future__ import annotations

import json
from typing import Any


class MincodeError(ValueError):
    pass


def mincode_to_json_udf():
    """Arrow-batched UDF: mincode string -> compact JSON string (null on
    decode error). Lazily constructed so importing this module never
    requires an active SparkSession."""
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    def _decode(s: pd.Series) -> pd.Series:
        return s.map(mincode_to_json, na_action="ignore")

    _decode.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(_decode, T.StringType())


def _read_escaped(s: str, i: int) -> tuple[str, int]:
    """Read an escaped ``!``-terminated string starting at i.

    Returns (value, index after the terminator).
    """
    out: list[str] = []
    n = len(s)
    while i < n:
        c = s[i]
        if c == "~":
            if i + 1 >= n:
                raise MincodeError("dangling escape at end of input")
            out.append(s[i + 1])
            i += 2
        elif c == "!":
            return "".join(out), i + 1
        else:
            out.append(c)
            i += 1
    raise MincodeError("unterminated string")


_B36_DIGITS = "0123456789abcdefghijklmnopqrstuvwxyz"


def _parse_base36(text: str) -> int:
    neg = text.startswith("-")
    body = text[1:] if neg else text
    if not body:
        raise MincodeError(f"empty base36 number: {text!r}")
    v = 0
    for ch in body.lower():
        d = _B36_DIGITS.find(ch)
        if d < 0:
            raise MincodeError(f"bad base36 digit in {text!r}")
        v = v * 36 + d
    return -v if neg else v


def _parse_json_number(text: str) -> Any:
    v = json.loads(text)
    if not isinstance(v, (int, float)):
        raise MincodeError(f"'j' record payload is not a number: {text!r}")
    return v


def _decode_value(s: str, i: int, in_object: bool) -> tuple[str | None, Any, int]:
    """Decode one record at i. Returns (field_name, value, next_index)."""
    if i >= len(s):
        raise MincodeError("unexpected end of input")
    t = s[i]
    i += 1
    if in_object:
        if t == ")":
            return None, _END, i
        name, i = _read_escaped(s, i)
    else:
        name = None
        if t in ").":
            return None, _END, i
    if t == "s":
        v, i = _read_escaped(s, i)
        return name, v, i
    if t == "t":
        return name, True, i
    if t == "f":
        return name, False, i
    if t == "n":
        return name, None, i
    if t == "d":
        raw, i = _read_escaped(s, i)
        return name, _parse_base36(raw), i
    if t == "j":
        raw, i = _read_escaped(s, i)
        return name, _parse_json_number(raw), i
    if t == "(":
        obj: dict[str, Any] = {}
        while True:
            k, v, i = _decode_value(s, i, in_object=True)
            if v is _END:
                return name, obj, i
            obj[k] = v
    if t == "a":
        arr: list[Any] = []
        while True:
            _, v, i = _decode_value(s, i, in_object=False)
            if v is _END:
                return name, arr, i
            arr.append(v)
    raise MincodeError(f"unknown record type {t!r} at {i - 1}")


_END = object()


def mincode_decode(code: str) -> Any:
    """Decode a mincode string to the Python JSON value it encodes."""
    _, value, i = _decode_value(code, 0, in_object=False)
    if value is _END:
        raise MincodeError("input starts with a close record")
    if i != len(code):
        raise MincodeError(f"trailing data at {i}")
    return value


def mincode_to_json(code: str | None) -> str | None:
    """Decode mincode to a compact JSON string; None on bad input
    (matching the reference's drop-parameters-on-parse-error,
    ClientSideCookieEventHandler.java:185-192)."""
    if code is None:
        return None
    try:
        return json.dumps(mincode_decode(code), separators=(",", ":"))
    except (MincodeError, ValueError):
        return None


def mincode_encode(value: Any) -> str:
    """Encoder counterpart (client side in the reference, divolte.js).

    Used by tests and by wire-roundtrip queries to synthesize traffic.
    Numbers: ints use 'd' base36 (as the JS encoder does for integers),
    floats use 'j'.
    """

    def esc(sv: str) -> str:
        return sv.replace("~", "~~").replace("!", "~!")

    def b36(n: int) -> str:
        if n == 0:
            return "0"
        neg = n < 0
        n = abs(n)
        out = []
        while n:
            n, r = divmod(n, 36)
            out.append(_B36_DIGITS[r])
        return ("-" if neg else "") + "".join(reversed(out))

    def enc(v: Any, name: str | None) -> str:
        prefix_name = esc(name) + "!" if name is not None else ""
        if v is None:
            return "n" + prefix_name
        if v is True:
            return "t" + prefix_name
        if v is False:
            return "f" + prefix_name
        if isinstance(v, int):
            return "d" + prefix_name + b36(v) + "!"
        if isinstance(v, float):
            return "j" + prefix_name + json.dumps(v) + "!"
        if isinstance(v, str):
            return "s" + prefix_name + esc(v) + "!"
        if isinstance(v, dict):
            return "(" + prefix_name + "".join(enc(x, k) for k, x in v.items()) + ")"
        if isinstance(v, (list, tuple)):
            return "a" + prefix_name + "".join(enc(x, None) for x in v) + "."
        raise MincodeError(f"cannot encode {type(v).__name__}")

    return enc(value, None)
