"""Mincode decoder against the reference's golden corpus
(mincode-samples.json, MincodeParserSamplesTest.java) plus edge cases
(escape/EOF, MincodeParserTest.java's territory)."""

from __future__ import annotations

import json

import pytest

from divolte_collector_spark.functions.mincode import (
    MincodeError,
    mincode_decode,
    mincode_encode,
    mincode_to_json,
)

# (json_value, mincode) pairs from the reference corpus.
SAMPLES = [
    ("a string", "sa string!"),
    ("Hello~World!", "sHello~~World~!!"),
    (
        "It's cold outside\nThere's no kind of atmosphere\nIt's freezing cold, "
        "more or less\nLet me fly far away from here\nFun Fun Fun, in the Sun Sun Sun.",
        "sIt's cold outside\nThere's no kind of atmosphere\nIt's freezing cold, "
        "more or less\nLet me fly far away from here\nFun Fun Fun, in the Sun Sun Sun.!",
    ),
    (True, "t"),
    (False, "f"),
    (None, "n"),
    (42, "d16!"),
    (10.3, "j10.3!"),
    ({}, "()"),
    ([], "a."),
    ({"foo": "bar", "baz": "daz"}, "(sfoo!bar!sbaz!daz!)"),
    (["foo", "bar", "baz", "daz"], "asfoo!sbar!sbaz!sdaz!."),
    (
        [
            {"foo": "bar", "baz": "daz"},
            {"daz": "huh", "doo": "wha"},
            {"daz": 2, "doo": 3},
        ],
        "a(sfoo!bar!sbaz!daz!)(sdaz!huh!sdoo!wha!)(ddaz!2!ddoo!3!).",
    ),
    (
        {"name": "John Doe", "age": 42, "children": ["Mary", "Bill"]},
        "(sname!John Doe!dage!16!achildren!sMary!sBill!.)",
    ),
    (
        {
            "a": {}, "b": "c", "d": {"a": [], "b": "g"}, "e": ["1", "2"],
            "f": 42, "g": 53.2, "h": -37, "i": -78.3e-10, "j": True,
            "k": False, "l": None, "m": {},
            "n": [{}, {"a": "b"}, {"c": "d"}], "o": {},
        },
        "((a!)sb!c!(d!aa!.sb!g!)ae!s1!s2!.df!16!jg!53.2!dh!-11!ji!-78.3e-10!"
        "tj!fk!nl!(m!)an!()(sa!b!)(sc!d!).(o!))",
    ),
]


@pytest.mark.parametrize("expected,code", SAMPLES)
def test_golden_corpus_decode(expected, code):
    assert mincode_decode(code) == expected


@pytest.mark.parametrize("value,code", SAMPLES)
def test_encode_roundtrip(value, code):
    # The encoder need not reproduce the exact sample bytes (dict order,
    # d-vs-j choice), but decode(encode(v)) must be identity.
    assert mincode_decode(mincode_encode(value)) == value


@pytest.mark.parametrize(
    "bad",
    [
        "s",            # unterminated string
        "sabc",         # missing terminator
        "sab~",         # dangling escape
        "d!",           # empty number
        "dzz",          # unterminated number
        "(sfoo!bar!",   # unterminated object
        "asfoo!",       # unterminated array
        "q",            # unknown record type
        ")",            # starts with close
        "tx",           # trailing data
    ],
)
def test_malformed_inputs_are_absent(bad):
    with pytest.raises((MincodeError, ValueError)):
        mincode_decode(bad)
    assert mincode_to_json(bad) is None


def test_to_json_compact():
    assert mincode_to_json("(dk!16!set!x!)") == '{"k":42,"et":"x"}'
    assert json.loads(mincode_to_json("j-78.3e-10!")) == -78.3e-10
