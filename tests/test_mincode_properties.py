"""Property-based mincode codec tests (hypothesis): encode/decode
roundtrip over the full value grammar, biased toward the escape
characters ('~', '!', '(', ')', '.') the reference's sample corpus
stresses (MincodeParserSamplesTest.java)."""

from __future__ import annotations

import json
import math

from hypothesis import given, settings
from hypothesis import strategies as st

from divolte_collector_spark.functions.mincode import (
    mincode_decode,
    mincode_encode,
)

_text = st.text(
    alphabet=st.one_of(
        st.characters(min_codepoint=32, max_codepoint=126),
        st.sampled_from("~!()."),
        st.characters(min_codepoint=0x80, max_codepoint=0x2FF),
    ),
    max_size=40,
)

_scalar = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**40), max_value=2**40),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    _text,
)

_value = st.recursive(
    _scalar,
    lambda children: st.one_of(
        st.lists(children, max_size=5),
        st.dictionaries(_text.filter(lambda s: s != ""), children, max_size=5),
    ),
    max_leaves=12,
)


@settings(max_examples=300, deadline=None)
@given(_value)
def test_roundtrip(value):
    encoded = mincode_encode(value)
    decoded = mincode_decode(encoded)
    # ints encoded base36 come back as ints; floats via the JSON-number
    # path compare exactly (repr roundtrip)
    assert _norm(decoded) == _norm(value)


def _norm(v):
    if isinstance(v, float) and v.is_integer() and abs(v) < 2**53:
        return int(v)
    if isinstance(v, list):
        return [_norm(x) for x in v]
    if isinstance(v, dict):
        return {k: _norm(x) for k, x in v.items()}
    return v


def test_reference_sample_shapes():
    # shapes from the reference's sample corpus (MincodeParserSamplesTest)
    assert mincode_decode("(dk!16!)") == {"k": 42}  # 'd' payload is base36
    assert mincode_decode("(sname!divolte~!x!)") == {"name": "divolte!x"}
    assert mincode_decode("(dk!16!set!x!)") == {"k": 42, "et": "x"}
    assert json.loads(json.dumps(mincode_decode("j-78.3e-10!"))) == -78.3e-10
