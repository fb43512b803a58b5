"""Property fuzz for the two remaining hand-written grammars: the
query-string multimap (QueryStringParser.java:37-79 semantics) and the
RFC comma-split header value parser (HeaderValueParser.java:20-193).
Same discipline as the mincode/wire/JSON corpora: generate structured
inputs, encode them, and assert the decoder recovers the structure —
plus decoder survival on corrupt input."""

from __future__ import annotations

from urllib.parse import quote

import pytest
from pyspark.sql import functions as F

from divolte_collector_spark.functions.headers import split_header_value
from divolte_collector_spark.functions.querystring import qs_multimap

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    _HAVE_HYP = True
except ImportError:  # pragma: no cover
    _HAVE_HYP = False

pytestmark = pytest.mark.skipif(not _HAVE_HYP, reason="hypothesis absent")


# --- query-string multimap roundtrip -----------------------------------------

# keys/values over a hostile alphabet: separators, '=', '+', unicode,
# percent signs are all forced through percent-encoding by the builder
_QS_TEXT = st.text(
    alphabet="abz09&=+%?# /\\\"'é中",
    min_size=0,
    max_size=8,
)


@st.composite
def _qs_params(draw):
    """list of (key, value, valueless) with at least one param; keys
    non-empty after trim so the expected map has no degenerate ''."""
    params = draw(
        st.lists(
            st.tuples(
                _QS_TEXT.filter(lambda s: s != ""), _QS_TEXT, st.booleans()
            ),
            min_size=1,
            max_size=6,
        )
    )
    # valueless only representable when the value is ''
    return [(k, "" if vl else v, vl and v == "") for k, v, vl in params]


def _encode_qs(params) -> str:
    # quote(safe="") percent-encodes EVERYTHING reserved, including
    # '+' (0x2B -> %2B) — so URLDecoder's '+' -> ' ' rule never fires
    # on literal plus signs and the roundtrip is exact
    parts = []
    for k, v, valueless in params:
        ek = quote(k, safe="")
        parts.append(ek if valueless else f"{ek}={quote(v, safe='')}")
    return "&".join(parts)


def _expected_multimap(params):
    out: dict[str, list[str]] = {}
    for k, v, _ in params:
        out.setdefault(k, []).append(v)
    return out


if _HAVE_HYP:

    @settings(
        max_examples=25, deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(st.lists(_qs_params(), min_size=1, max_size=30))
    def test_qs_multimap_roundtrip(spark, param_lists):
        df = spark.createDataFrame(
            [(i, _encode_qs(p)) for i, p in enumerate(param_lists)],
            "i long, qs string",
        )
        got = {
            r["i"]: {k: list(v) for k, v in r["m"].items()}
            for r in df.select(
                "i", qs_multimap(F.col("qs")).alias("m")
            ).collect()
        }
        for i, params in enumerate(param_lists):
            assert got[i] == _expected_multimap(params), _encode_qs(params)


def test_qs_multimap_corrupt_key_dropped_not_fatal(spark):
    # a key with an invalid percent-escape is ABSENT from the map (the
    # uri.py undecodable=>absent contract); the row and batch survive
    df = spark.createDataFrame(
        [("a%zz=1&ok=2",), ("%=x",), ("ok=only",)], "qs string"
    )
    rows = df.select(qs_multimap(F.col("qs")).alias("m")).collect()
    assert rows[0]["m"] == {"ok": ["2"]}
    assert rows[1]["m"] == {}
    assert rows[2]["m"] == {"ok": ["only"]}


# --- header comma-split roundtrip --------------------------------------------

_HDR_VALUE = st.text(
    alphabet="abz09,\"\\ \t;=()<>", min_size=1, max_size=10
)


def _needs_quoting(v: str) -> bool:
    return (
        v != v.strip(" \t")
        or any(c in v for c in ",\"\\")
        or "  " in v
        or "\t" in v
    )


def _encode_header(values) -> str:
    parts = []
    for v in values:
        if _needs_quoting(v):
            parts.append(
                '"' + v.replace("\\", "\\\\").replace('"', '\\"') + '"'
            )
        else:
            parts.append(v)
    return ", ".join(parts)


if _HAVE_HYP:

    @settings(max_examples=300, deadline=None)
    @given(
        st.lists(
            _HDR_VALUE.filter(lambda v: v.strip(" \t") != ""),
            min_size=0,
            max_size=6,
        )
    )
    def test_header_split_roundtrip(values):
        line = _encode_header(values)
        assert split_header_value(line) == values, line


@pytest.mark.parametrize(
    "line",
    [
        ",,,",                     # only empties
        '  "unterminated',         # EOF inside quotes
        'a\\',                     # dangling escape outside quotes
        '"\\',                     # dangling escape inside quotes
        "\t , \t,",                # whitespace soup
        '""',                      # quoted empty (skipped as empty)
    ],
)
def test_header_split_survives_garbage(line):
    # must not raise on any malformed line; empties never surface
    out = split_header_value(line)
    assert all(v != "" for v in out)
