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
