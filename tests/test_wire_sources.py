"""Browser (S1) and JSON (S2) source decoding, mirroring the reference
test strategy: fixed synthetic requests, golden field assertions
(DslRecordMapperTest.java:62-84 uses the same hard-coded id / base36
style)."""

from __future__ import annotations

import datetime as dt
import json

from pyspark.sql import functions as F

from divolte_collector_spark.sources.browser import parse_browser_events
from divolte_collector_spark.sources.json_source import parse_json_events

_GOOD_QS = (
    "p=0%3Ai1t84hgy%3Aparty&s=0%3Ai1t84hgy%3Asession&v=pv0&e=ev0&"
    "c=i0rjfnxd&n=t&f=t&l=http%3A%2F%2Fexample.com%2Fhome&r=http%3A%2F%2Fref.example%2F&"
    "w=uq&h=qd&i=1ak&j=sj&k=2&t=pageView&u=(dk!16!set!x~!y!)"
)


def _browser(spark, qs_list, **kw):
    df = spark.createDataFrame([(q,) for q in qs_list], "query_string string")
    return parse_browser_events(df, **kw)


def test_browser_decode_golden(spark):
    row = _browser(spark, [_GOOD_QS]).first()
    assert row.party_id == "0:i1t84hgy:party"
    assert row.session_id == "0:i1t84hgy:session"
    assert row.event_id == "ev0"
    assert row.event_source == "browser"
    assert row.event_type == "pageView"
    assert row.new_party_id is True
    assert row.first_in_session is True
    # base36 'i0rjfnxd' == 1412220184033 (the reference's own test value)
    assert row.client_time == dt.datetime(2014, 10, 2, 3, 23, 4, 33000)
    assert row.browser.page_view_id == "pv0"
    assert row.browser.location == "http://example.com/home"
    assert row.browser.referer == "http://ref.example/"
    assert row.browser.viewport_pixel_width == int("uq", 36)
    assert row.browser.viewport_pixel_height == int("qd", 36)
    assert row.browser.screen_pixel_width == int("1ak", 36)
    assert row.browser.screen_pixel_height == int("sj", 36)
    assert row.browser.device_pixel_ratio == 2
    assert json.loads(row.event_parameters) == {"k": 42, "et": "x!y"}
    # no 'x' param => checksum incorrect => flagged corrupt, NOT dropped
    assert row.corrupt_event is True


def test_browser_incomplete_dropped(spark):
    missing_session = _GOOD_QS.replace("s=0%3Ai1t84hgy%3Asession&", "")
    bad_party = _GOOD_QS.replace("p=0%3Ai1t84hgy%3Aparty", "p=not-an-identifier")
    bad_ts = _GOOD_QS.replace("c=i0rjfnxd", "c=%2F%2F")
    out = _browser(spark, [_GOOD_QS, missing_session, bad_party, bad_ts])
    assert out.count() == 1  # only the complete request survives

    kept = _browser(
        spark, [_GOOD_QS, missing_session], keep_incomplete=True
    ).select("incomplete_request").collect()
    assert sorted(r.incomplete_request for r in kept) == [False, True]


def test_browser_bad_mincode_keeps_event(spark):
    bad_u = _GOOD_QS.replace("u=(dk!16!set!x~!y!)", "u=(((")
    row = _browser(spark, [bad_u]).first()
    assert row is not None
    assert row.event_parameters is None


_GOOD_BODY = json.dumps(
    {
        "event_type": "signup",
        "session_id": "0:i1t84hgy:sess",
        "event_id": "e-1",
        "is_new_party": False,
        "is_new_session": True,
        "client_timestamp_iso": "2024-01-02T03:04:05.678+02:00",
        "parameters": {"plan": "pro", "seats": 3},
    }
)


def _json(spark, rows, **kw):
    df = spark.createDataFrame(rows, "party_id_param string, body string")
    return parse_json_events(df, **kw)


def test_json_decode_golden(spark):
    row = _json(spark, [("0:i1t84hgy:party", _GOOD_BODY)]).first()
    assert row.party_id == "0:i1t84hgy:party"
    assert row.session_id == "0:i1t84hgy:sess"
    assert row.event_id == "e-1"
    assert row.event_source == "json"
    assert row.event_type == "signup"
    assert row.new_party_id is False
    assert row.first_in_session is True
    # +02:00 offset applied (stored UTC)
    assert row.client_time == dt.datetime(2024, 1, 2, 1, 4, 5, 678000)
    assert json.loads(row.event_parameters) == {"plan": "pro", "seats": 3}
    assert row.corrupt_event is False  # hardcoded, DivolteEvent.java:183


def test_json_required_fields_drop(spark):
    no_session = json.dumps({"event_id": "e", "is_new_party": True,
                             "is_new_session": True,
                             "client_timestamp_iso": "2024-01-01T00:00:00Z"})
    bad_ts = _GOOD_BODY.replace("2024-01-02T03:04:05.678+02:00", "not-a-time")
    not_json = "{{{"
    oversized = json.dumps(
        {
            "session_id": "0:i1t84hgy:s", "event_id": "e",
            "is_new_party": True, "is_new_session": True,
            "client_timestamp_iso": "2024-01-01T00:00:00Z",
            "parameters": {"pad": "x" * 5000},
        }
    )
    rows = [("0:i1t84hgy:party", b) for b in
            [_GOOD_BODY, no_session, bad_ts, not_json, oversized]]
    assert _json(spark, rows).count() == 1
    # raising the size limit admits the oversized body (config knob,
    # JsonSourceConfiguration.java:34-52)
    assert _json(spark, rows, max_body_bytes=100_000).count() == 2


def test_etag_replay_dropped_before_parse(spark):
    """S3: the sentinel If-None-Match marks a browser-cache replay —
    dropped before parsing; other ETags (or none) pass through."""
    from divolte_collector_spark.sources.browser import SENTINEL_ETAG

    df = spark.createDataFrame(
        [
            (_GOOD_QS, SENTINEL_ETAG),
            (_GOOD_QS, None),
            (_GOOD_QS, '"some-other-etag"'),
        ],
        "query_string string, if_none_match string",
    )
    out = parse_browser_events(df)
    assert out.count() == 2
    assert out.filter(F.col("if_none_match") == SENTINEL_ETAG).count() == 0


def test_duplicate_wire_param_survives_any_dedup_policy(spark):
    # REGRESSION: the decoder relied on the session conf
    # spark.sql.mapKeyDedupPolicy=LAST_WIN; under Spark's default
    # EXCEPTION policy one duplicated wire param killed the whole
    # batch. The dedup is now in-expression (first occurrence wins,
    # the reference's Undertow parameter-map behavior).
    from divolte_collector_spark.sources.browser import parse_browser_events

    qs = (
        "p=0:1heitfsl:aaaaaaaaaaaaaaaa&s=0:1heitfsl:bbbbbbbbbbbbbbbb"
        "&v=pv1&e=ev1&c=1heitfsl&n=t&f=t&l=http%3A%2F%2Fx%2F&t=first"
        "&t=second"
    )
    df = spark.createDataFrame([(qs,)], "query_string string")
    prev = spark.conf.get("spark.sql.mapKeyDedupPolicy", "EXCEPTION")
    try:
        spark.conf.set("spark.sql.mapKeyDedupPolicy", "EXCEPTION")
        out = parse_browser_events(df).collect()
    finally:
        spark.conf.set("spark.sql.mapKeyDedupPolicy", prev)
    assert len(out) == 1
    assert out[0].event_type == "first"  # first occurrence wins


# --- adversarial wire fuzz (S1) ---------------------------------------------
# The reference pins its checksum/decoder against a corpus of real
# requests (RequestChecksumTest.java); this is the generative version:
# random param orderings, duplicate keys, truncated base36, invalid
# percent-escapes, and post-checksum tampering, asserting that
# decode(encode(x)) == x for every identity field, that the corruption
# verdict is exactly "checksum covers what was sent", and that NO
# generated input crashes the decoder (a single garbage request must
# never fail the batch — this suite found the NULL_MAP_KEY crash on
# undecodable param keys).

from urllib.parse import quote, unquote_plus

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as hst

from divolte_collector_spark.functions.murmur import murmur3_32_signed

_B36_DIGITS = "0123456789abcdefghijklmnopqrstuvwxyz"


def _b36(n: int) -> str:
    if n < 0:
        return "-" + _b36(-n)
    if n == 0:
        return "0"
    out = []
    while n:
        out.append(_B36_DIGITS[n % 36])
        n //= 36
    return "".join(reversed(out))


def _canonical(pairs):
    """buildNormalizedChecksumString over DECODED params: sort by key
    (stable for multi-values), drop 'x', values ','-terminated, groups
    ';'-closed (ClientSideCookieEventHandler.java:206-261)."""
    kept = sorted(
        [(k, v) for k, v in pairs if k != "x"], key=lambda kv: kv[0]
    )
    out, last = [], None
    for k, v in kept:
        if k != last:
            if last is not None:
                out.append(";")
            out.append(k)
            out.append("=")
            last = k
        out.append(v)
        out.append(",")
    if last is not None:
        out.append(";")
    return "".join(out)


def _sign(pairs) -> str:
    return _b36(murmur3_32_signed(_canonical(pairs).encode("utf-8")))


def _render(pairs) -> str:
    return "&".join(f"{quote(k, safe='')}={quote(v, safe='')}" for k, v in pairs)


_VAL = hst.text(
    alphabet="abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
    " :/.~!()*-_@,;=?+%",
    min_size=1,
    max_size=20,
)
_ID_SUFFIX = hst.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789-_", min_size=1, max_size=10
)

_CASE_KINDS = (
    "ok", "dup", "rawescape", "tamper_t", "bad_x", "no_x",
    "incomplete", "garbage",
)


@hst.composite
def _wire_case(draw):
    kind = draw(hst.sampled_from(_CASE_KINDS))
    if kind == "garbage":
        qs = draw(
            hst.sampled_from(
                ["", "&", "&&&", "=v", "%", "a%zz=1", "p", "x=", "%=%", "=&=="]
            )
        )
        return {"kind": kind, "qs": qs}
    ms = draw(hst.integers(min_value=0, max_value=2**41))
    party = f"0:{_b36(ms)}:{draw(_ID_SUFFIX)}"
    session = f"0:{_b36(ms)}:{draw(_ID_SUFFIX)}"
    pv, ev = draw(_ID_SUFFIX), draw(_ID_SUFFIX)
    et = draw(_VAL)
    w = draw(hst.integers(min_value=0, max_value=8192))
    pairs = [
        ("p", party), ("s", session), ("v", pv), ("e", ev),
        ("c", _b36(ms)), ("n", draw(hst.sampled_from("tf"))),
        ("f", draw(hst.sampled_from("tf"))), ("t", et),
        ("l", draw(_VAL)), ("w", _b36(w)),
    ]
    if kind == "incomplete":
        breakage = draw(
            hst.sampled_from(["drop_p", "drop_c", "bad_p", "bad_c", "drop_n"])
        )
        if breakage == "drop_p":
            pairs = [kv for kv in pairs if kv[0] != "p"]
        elif breakage == "drop_c":
            pairs = [kv for kv in pairs if kv[0] != "c"]
        elif breakage == "drop_n":
            pairs = [kv for kv in pairs if kv[0] != "n"]
        elif breakage == "bad_p":
            pairs = [
                ("p", "not-an-identifier") if kv[0] == "p" else kv
                for kv in pairs
            ]
        else:
            pairs = [("c", "!!") if kv[0] == "c" else kv for kv in pairs]
    pairs = draw(hst.permutations(pairs))
    if kind == "dup":
        # duplicates BEFORE checksumming (the client sent them), and
        # AFTER the originals in wire order: the verdict stays correct
        # and the decoder must read the FIRST occurrence of each key
        for key in draw(
            hst.lists(hst.sampled_from("psvetlw"), min_size=1, max_size=3)
        ):
            pairs.append((key, draw(_VAL)))
    wire = [(quote(k, safe=""), quote(v, safe="")) for k, v in pairs]
    raw_l = None
    if kind == "rawescape":
        # an invalid percent-escape in the RAW location value: the
        # strict decoder nulls the field; the checksum client hashed
        # the lenient form (unquote_plus leaves bad escapes alone)
        raw_l = draw(hst.sampled_from(["ab%zz", "trail%", "%a", "x%gg%1"]))
        wire = [(k, raw_l if k == "l" else v) for k, v in wire]
        decoded_for_sum = [
            (unquote_plus(k), unquote_plus(v)) for k, v in wire
        ]
        x = _sign(decoded_for_sum)
    else:
        x = _sign(pairs)
    if kind != "no_x":
        wire.append(("x", "!!" if kind == "bad_x" else x))
    qs = "&".join(f"{k}={v}" for k, v in wire)
    if kind == "tamper_t":
        qs = qs.replace("t=" + quote(dict(pairs)["t"], safe=""),
                        "t=" + quote(dict(pairs)["t"], safe="") + "z", 1)
    first = {}
    for k, v in pairs:
        first.setdefault(k, v)
    return {
        "kind": kind, "qs": qs, "first": first, "ms": ms,
        "w": w, "raw_l": raw_l,
    }


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(hst.lists(_wire_case(), min_size=20, max_size=40))
def test_wire_decoder_fuzz(spark, cases):
    df = spark.createDataFrame(
        [(i, c["qs"]) for i, c in enumerate(cases)],
        "row_id long, query_string string",
    )
    out = {
        r.row_id: r
        for r in parse_browser_events(df, keep_incomplete=True).collect()
    }
    assert len(out) == len(cases)  # nothing crashed, nothing vanished
    for i, c in enumerate(cases):
        r = out[i]
        kind = c["kind"]
        if kind in ("garbage", "incomplete"):
            assert r.incomplete_request is True, (kind, c["qs"])
            continue
        assert r.incomplete_request is False, (kind, c["qs"])
        first = c["first"]
        assert r.party_id == first["p"]
        assert r.session_id == first["s"]
        assert r.event_id == first["e"]
        got_ms = int(
            r.client_time.replace(tzinfo=dt.timezone.utc).timestamp() * 1000
            + 0.5
        )
        assert got_ms == c["ms"], (kind, c["qs"])
        assert r.browser.page_view_id == first["v"]
        if kind == "tamper_t":
            assert r.event_type == first["t"] + "z"
            assert r.corrupt_event is True, c["qs"]
        elif kind in ("bad_x", "no_x"):
            assert r.corrupt_event is True, c["qs"]
        else:
            assert r.event_type == first["t"]
            assert r.corrupt_event is False, (kind, c["qs"])
        if kind == "rawescape":
            assert r.browser.location is None  # strict decode nulls it
        elif "l" in first and kind != "tamper_t":
            assert r.browser.location == first["l"]
        if kind != "tamper_t":
            assert r.browser.viewport_pixel_width == c["w"]


# --- adversarial JSON source fuzz (S2) --------------------------------------
# Same generative treatment for the POST body path: malformed JSON,
# wrong field types, missing requireds, bad identifiers, oversized
# bodies, and exotic-but-valid payloads must decode exactly or drop
# cleanly — never crash the batch.


@hst.composite
def _json_case(draw):
    kind = draw(
        hst.sampled_from(
            [
                "ok", "ok", "ok",  # weight toward valid payloads
                "malformed", "missing_required", "bad_session",
                "bad_party", "wrong_type", "bad_ts", "oversized",
            ]
        )
    )
    import json as _json

    ms = draw(hst.integers(min_value=0, max_value=2**41)) // 1000 * 1000
    offset_min = draw(hst.sampled_from([0, 60, -120, 330, 765]))
    base = dt.datetime.fromtimestamp(ms / 1000, dt.timezone.utc)
    local = base.astimezone(dt.timezone(dt.timedelta(minutes=offset_min)))
    iso = local.isoformat(timespec="milliseconds")
    party = f"0:{_b36(ms)}:{draw(_ID_SUFFIX)}"
    body = {
        "event_type": draw(_VAL),
        "session_id": f"0:{_b36(ms)}:{draw(_ID_SUFFIX)}",
        "event_id": draw(_ID_SUFFIX),
        "is_new_party": draw(hst.booleans()),
        "is_new_session": draw(hst.booleans()),
        "client_timestamp_iso": iso,
        "parameters": draw(
            hst.sampled_from(
                [
                    {"k": 1}, {"nested": {"a": [1, 2, {"b": "x"}]}},
                    [1, "two"], "scalar", 42, None,
                ]
            )
        ),
    }
    if kind == "missing_required":
        del body[
            draw(
                hst.sampled_from(
                    [
                        "session_id", "event_id", "is_new_party",
                        "is_new_session", "client_timestamp_iso",
                    ]
                )
            )
        ]
    elif kind == "bad_session":
        body["session_id"] = draw(hst.sampled_from(["nope", "1:a:b", "0::", ""]))
    elif kind == "wrong_type":
        body[draw(hst.sampled_from(["is_new_party", "is_new_session"]))] = (
            draw(hst.sampled_from(["yes", 1, [True]]))
        )
    elif kind == "bad_ts":
        body["client_timestamp_iso"] = draw(
            hst.sampled_from(["not-a-time", "2024-13-45T99:99:99Z", "12345", ""])
        )
    raw = _json.dumps(body)
    if kind == "malformed":
        raw = draw(
            hst.sampled_from(
                ['{"a":', "not json", "", "[1,2", '{"session_id" 4}', "\x00"]
            )
        )
    elif kind == "oversized":
        body["parameters"] = {"pad": "x" * 5000}
        raw = _json.dumps(body)
    if kind == "bad_party":
        party = draw(hst.sampled_from(["", "zzz", "0:!:x", "1:abc:d"]))
    return {"kind": kind, "body": raw, "party": party, "ms": ms,
            "payload": body}


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(hst.lists(_json_case(), min_size=20, max_size=40))
def test_json_decoder_fuzz(spark, cases):
    import json as _json

    df = spark.createDataFrame(
        [(i, c["body"], c["party"]) for i, c in enumerate(cases)],
        "row_id long, body string, party_id_param string",
    )
    out = {
        r.row_id: r
        for r in parse_json_events(df, keep_incomplete=True).collect()
    }
    assert len(out) == len(cases)  # no crash, no vanished rows
    for i, c in enumerate(cases):
        r = out[i]
        if c["kind"] == "ok":
            assert r.incomplete_request is False, c["body"]
            p = c["payload"]
            assert r.party_id == c["party"]
            assert r.session_id == p["session_id"]
            assert r.event_id == p["event_id"]
            assert r.event_type == p["event_type"]
            assert r.new_party_id is p["is_new_party"]
            assert r.first_in_session is p["is_new_session"]
            assert r.corrupt_event is False  # hardcoded (DivolteEvent.java:183)
            got_ms = int(
                r.client_time.replace(tzinfo=dt.timezone.utc).timestamp()
                * 1000 + 0.5
            )
            assert got_ms == c["ms"], c["body"]
            if p["parameters"] is not None:
                assert _json.loads(r.event_parameters) == p["parameters"]
        else:
            assert r.incomplete_request is True, (c["kind"], c["body"])


def test_json_iso_offset_java_parity_matrix(spark):
    """client_timestamp_iso acceptance pinned against java 17's
    DateTimeFormatter.ISO_OFFSET_DATE_TIME (JsonEventHandler.java:148),
    probed empirically: minute-precision times, hour-only and
    seconds-bearing offsets, and lowercase 't'/'z' are all VALID; the
    colon-less +HHMM offset and missing offsets are NOT. Expanded
    years (+12024-...) are a deliberate divergence (rejected here —
    they overflow client datetimes downstream; README table).
    REGRESSION: an earlier guard required exactly HH:MM:SS and
    Z|+-HH:MM, silently dropping events the reference accepts."""
    import json as _json

    cases = [
        ("2024-01-02T03:04:05.678+02:00", True),
        ("2024-01-02T03:04Z", True),            # minute precision
        ("2024-01-02T03:04:05+02:00:30", True),  # offset with seconds
        ("2024-01-02T03:04:05z", True),          # lowercase z
        ("2024-01-02t03:04:05Z", True),          # lowercase t
        ("2024-01-02T03:04:05+02", True),        # hour-only offset
        ("2024-01-02T03:04:05.123456789Z", True),
        ("2024-01-02T03:04:05+0200", False),     # colon-less: java rejects
        ("2024-01-02T03:04:05", False),          # offset mandatory
        ("2024-01-02T03:04:05.1234567890Z", False),  # >9 fraction digits
        ("12345", False),
        ("+12024-01-02T03:04:05Z", False),       # documented divergence
    ]
    rows = []
    for i, (iso, _) in enumerate(cases):
        rows.append(
            (
                i,
                _json.dumps(
                    {
                        "event_type": "e",
                        "session_id": "0:abc:s1",
                        "event_id": f"ev{i}",
                        "is_new_party": True,
                        "is_new_session": True,
                        "client_timestamp_iso": iso,
                    }
                ),
                "0:abc:p1",
            )
        )
    df = spark.createDataFrame(
        rows, "row_id long, body string, party_id_param string"
    )
    got = {
        r.row_id: r
        for r in parse_json_events(df, keep_incomplete=True).collect()
    }
    for i, (iso, ok) in enumerate(cases):
        assert got[i].incomplete_request is (not ok), iso
        if ok:
            assert got[i].client_time is not None, iso
    # the minute-precision normalization must not shift the instant
    full = got[1].client_time
    assert (full.minute, full.second, full.microsecond) == (4, 0, 0)


# --- differential: Arrow decoder vs expression decoder -----------------------
# parse_browser_events (one mapInPandas crossing) and
# parse_browser_events_expr (pure expressions) must agree row for row
# on EVERY field for any input — the expression path is the executable
# spec; the Arrow path is the production decode.

_ADVERSARIAL_QS = [
    _GOOD_QS,
    "", "&", "&&&", "=v", "%", "a%zz=1", "p", "x=", "%=%", "=&==",
    "p=0:1heitfsl:a&s=0:1heitfsl:b&v=pv&e=ev&c=1heitfsl&n=t&f=f&t=first&t=second",
    "p=0:1:a&s=0:1:b&v=1&e=1&c=zzzzzzzzzzzzzz&n=t&f=t",   # c overflows long
    "p=0:1:a&s=0:1:b&v=1&e=1&c=-1&n=t&f=t&w=-zz&h=zzzzzz&k=10",
    "l=ab%zz&p=0:1:a&s=0:1:b&v=1&e=1&c=1&n=t&f=t",         # bad escape in l
    "a%zz=1&p=0:1:a&s=0:1:b&v=1&e=1&c=1&n=t&f=t",          # bad escape in key
    "p=0%3A1%3Aa&s=0:1:b&v=pv%2B1&e=e%20v&c=1&n=t&f=t&u=(dk!16!a!b!)",
    "p=0:1:a&s=0:1:b&v=1&e=1&c=1&n=t&f=t&u=(!broken",      # bad mincode
    "p=0:1:a&s=0:1:b&v=1&e=1&c=1&n=x&f=t",                 # n not 't'
    "x=abc&x=def&p=0:1:a&s=0:1:b&v=1&e=1&c=1&n=t&f=t",     # dup x
    "t=a+b&p=0:1:a&s=0:1:b&v=1&e=1&c=1&n=t&f=t",           # + is space
    None,
]


def test_arrow_decoder_matches_expression_decoder(spark):
    from divolte_collector_spark.sources.browser import (
        parse_browser_events_expr,
    )

    df = spark.createDataFrame(
        [(i, q) for i, q in enumerate(_ADVERSARIAL_QS)],
        "row_id long, query_string string",
    )
    fast = {
        r.row_id: r
        for r in parse_browser_events(df, keep_incomplete=True).collect()
    }
    slow = {
        r.row_id: r
        for r in parse_browser_events_expr(df, keep_incomplete=True).collect()
    }
    assert set(fast) == set(slow) == set(range(len(_ADVERSARIAL_QS)))
    for i in fast:
        assert fast[i].asDict(recursive=True) == slow[i].asDict(
            recursive=True
        ), (i, _ADVERSARIAL_QS[i])


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(hst.lists(_wire_case(), min_size=10, max_size=20))
def test_arrow_decoder_matches_expression_decoder_fuzz(spark, cases):
    from divolte_collector_spark.sources.browser import (
        parse_browser_events_expr,
    )

    df = spark.createDataFrame(
        [(i, c["qs"]) for i, c in enumerate(cases)],
        "row_id long, query_string string",
    )
    fast = {
        r.row_id: r.asDict(recursive=True)
        for r in parse_browser_events(df, keep_incomplete=True).collect()
    }
    slow = {
        r.row_id: r.asDict(recursive=True)
        for r in parse_browser_events_expr(df, keep_incomplete=True).collect()
    }
    assert fast == slow


def test_try_url_decode_py_matches_jvm(spark):
    from divolte_collector_spark.functions.querystring import (
        try_url_decode_py,
    )

    cases = [
        "a+b", "a%20b", "ab%zz", "trail%", "%a", "x%gg%1", "%C3%A9",
        "%FF", "%ff", "", "a%2Bb", "%00", "plain", "%E2%82", "%c3%a9",
        "+", "%2b%2B", "a%1", "%%20", "a b", "%41%zz", "%41%42",
        "caf%C3%A9+%26+th%C3%A9", "100%", "a=b", "semi;colon",
    ]
    df = spark.createDataFrame([(c,) for c in cases], "s string")
    jvm = {
        r.s: r.d
        for r in df.select("s", F.try_url_decode("s").alias("d")).collect()
    }
    for c in cases:
        assert try_url_decode_py(c) == jvm[c], c
    assert try_url_decode_py(None) is None


def test_base36_py_twins_match_jvm(spark):
    from divolte_collector_spark.functions.base36 import (
        try_parse_base36_int,
        try_parse_base36_int_py,
        try_parse_base36_long,
        try_parse_base36_long_py,
    )

    cases = [
        "0", "z", "ZZ", "-1", "1y2p0ij32e8e7", "1y2p0ij32e8e8",  # ±2^63 edge
        "zzzzzzzzzzzzzz", "-zzzzzzzzzzzzzz", "3w5e11264sgsf",
        "", "!", "1.5", " 5", "+5", "1_0", "--1", "-", "abc", "ABC",
        "zik0zj", "zik0zk", "-zik0zj", "-zik0zk",  # ±2^31 edge (int)
    ]
    df = spark.createDataFrame([(c,) for c in cases], "s string")
    jvm = {
        r.s: (r.l, r.i)
        for r in df.select(
            "s",
            try_parse_base36_long(F.col("s")).alias("l"),
            try_parse_base36_int(F.col("s")).alias("i"),
        ).collect()
    }
    for c in cases:
        assert try_parse_base36_long_py(c) == jvm[c][0], c
        assert try_parse_base36_int_py(c) == jvm[c][1], c
    assert try_parse_base36_long_py(None) is None


def test_base36_encode_py_twin_matches_jvm(spark):
    """base36_encode_py must be byte-identical to the JVM base36_encode
    (Long.toString(v, 36)) — the fused wire-roundtrip decode renders
    the x= checksum param with the python twin (wire_parity.py)."""
    from divolte_collector_spark.functions.base36 import (
        base36_encode,
        base36_encode_py,
    )

    # -2^63 excluded: the JVM side's F.abs overflows at exactly that
    # value (and the fused path only ever encodes murmur int32 output)
    cases = [
        0, 1, -1, 35, 36, -36, 1295, 1412220184033,
        (1 << 63) - 1, -((1 << 63) - 1), (1 << 31) - 1, -(1 << 31), 42,
    ]
    df = spark.createDataFrame([(c,) for c in cases], "v long")
    jvm = {
        r.v: r.e
        for r in df.select("v", base36_encode(F.col("v")).alias("e")).collect()
    }
    for c in cases:
        assert base36_encode_py(c) == jvm[c], c
    assert base36_encode_py(None) is None
