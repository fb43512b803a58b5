"""Mapping DSL compiler tests — ports of the reference's Groovy fixture
corpus (src/test/resources/*.groovy, driven by DslRecordMapperTest.java):
flat-mapping, minimal-mapping, when-mapping, boolean-logic,
basic-stop, basic-toplevel-exit, nested-conditional-exit/-stop,
shorthand-conditional-stop (closure forms collapse to the same Python
surface), regex-mapping, uri-mapping(-raw/-fragment), chained-na,
client-timestamp, funky-querystring, header-normalization,
custom-cookie, event-param-mapping, event-param-jsonpath-
presence/-mismatch/-missing, digest-string-literal/-provider/
-chaining/-missing-value/-with-string-conversion,
correct-types-literal, wrong-types/missing-field validation.
geo-mapping's accessor surface is exercised by
test_scalar_functions.test_geoip2_city_dim_full_surface; the digest
-with-seed/-json/-bytebuffer/-documented-algorithms ports live in
test_scalar_functions as well."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from divolte_collector_spark.functions.booleans import (
    equal_to_literal,
    is_absent,
    is_present,
    opt_and,
    opt_not,
    opt_or,
)
from divolte_collector_spark.functions.regexops import match_group, matches
from divolte_collector_spark.functions.uri import (
    uri_host,
    uri_path,
    uri_port,
    uri_scheme,
)
from divolte_collector_spark.mapping import MappingBuilder, SchemaMappingException

# a TestRecord.avsc-flavoured target schema (subset, our own definition)
SCHEMA = {
    "type": "record",
    "name": "TestRecord",
    "fields": [
        {"name": "sessionStart", "type": "boolean"},
        {"name": "ts", "type": "long"},
        {"name": "remoteHost", "type": "string"},
        {"name": "client", "type": ["null", "string"], "default": None},
        {"name": "session", "type": ["null", "string"], "default": None},
        {"name": "pageview", "type": ["null", "string"], "default": None},
        {"name": "event", "type": ["null", "string"], "default": None},
        {"name": "eventType", "type": ["null", "string"], "default": None},
        {"name": "location", "type": ["null", "string"], "default": None},
        {"name": "referer", "type": ["null", "string"], "default": None},
        {"name": "queryparam", "type": ["null", "string"], "default": None},
        {"name": "unreliable", "type": "boolean", "default": False},
        {"name": "dupe", "type": "boolean", "default": False},
        {"name": "queryparamBoolean", "type": ["null", "boolean"], "default": None},
        {"name": "pathBoolean", "type": ["null", "boolean"], "default": None},
        {"name": "viewportWidth", "type": ["null", "int"], "default": None},
        {"name": "uriScheme", "type": ["null", "string"], "default": None},
        {"name": "uriHost", "type": ["null", "string"], "default": None},
        {"name": "uriPort", "type": ["null", "int"], "default": None},
        {"name": "uriPath", "type": ["null", "string"], "default": None},
        {"name": "customCookie", "type": ["null", "string"], "default": None},
    ],
}

_EVENT_SCHEMA = (
    "corrupt_event boolean, first_in_session boolean, ts long, "
    "remote_host string, referer string, location string, "
    "viewport_pixel_width int, party_id string, session_id string, "
    "page_view_id string, event_id string, event_type string"
)

_ROW = (
    False, True, 1412220184033, "127.0.0.1",
    "http://www.example.com/somepage.html", "http://www.example.com/",
    1106, "pty", "ses", "pv0", "ev0", "pageView",
)


def _events(spark, rows=None):
    return spark.createDataFrame(rows or [_ROW], _EVENT_SCHEMA)


def _std(m: MappingBuilder) -> MappingBuilder:
    # the fixtures' common preamble
    m.map_value(F.col("first_in_session"), "sessionStart")
    m.map_value(F.col("ts"), "ts")
    m.map_value(F.col("remote_host"), "remoteHost")
    return m


def test_flat_mapping(spark):
    m = _std(MappingBuilder(SCHEMA))
    m.map_value(F.col("corrupt_event"), "unreliable")
    m.map_value(F.col("referer"), "referer")
    m.map_value(F.col("location"), "location")
    m.map_value(F.col("viewport_pixel_width"), "viewportWidth")
    m.map_value(F.col("party_id"), "client")
    m.map_value(F.col("session_id"), "session")
    m.map_value(F.col("page_view_id"), "pageview")
    m.map_value(F.col("event_id"), "event")
    m.map_value(F.col("event_type"), "eventType")
    row = m.apply(_events(spark)).first()
    assert row.sessionStart is True and row.ts == 1412220184033
    assert row.remoteHost == "127.0.0.1"
    assert row.unreliable is False
    assert row.referer == "http://www.example.com/somepage.html"
    assert row.location == "http://www.example.com/"
    assert row.viewportWidth == 1106
    assert (row.client, row.session, row.pageview, row.event, row.eventType) == (
        "pty", "ses", "pv0", "ev0", "pageView")


def test_when_mapping(spark):
    # when-mapping.groovy: equalTo guards, nesting, presence guards
    m = _std(MappingBuilder(SCHEMA))
    with m.when(equal_to_literal(F.col("location"), "http://www.example.com/")):
        m.map_literal("locationmatch", "eventType")
        with m.when(
            equal_to_literal(F.col("referer"), "http://www.example.com/somepage.html")
        ):
            m.map_literal("referermatch", "client")
    with m.when(equal_to_literal(F.col("referer"), "not the referer")):
        m.map_literal("is set", "queryparam")
    header = F.lit(None).cast("string")  # X-Non-Existing-Header-Name
    with m.when(is_absent(header)):
        m.map_literal("absent", "event")
    with m.when(is_absent(F.col("location"))):
        m.map_literal("should not apply", "event")
    with m.when(is_present(F.col("location"))):
        m.map_literal("present", "pageview")
    with m.when(is_present(header)):
        m.map_literal("should not apply", "pageview")
    row = m.apply(_events(spark)).first()
    assert row.eventType == "locationmatch"
    assert row.client == "referermatch"
    assert row.queryparam is None
    assert row.event == "absent"
    assert row.pageview == "present"


def test_boolean_logic(spark):
    # boolean-logic.groovy over an event with location but no referer
    rows = [_ROW[:4] + (None,) + _ROW[5:]]
    m = _std(MappingBuilder(SCHEMA))
    ref_p, loc_p = is_present(F.col("referer")), is_present(F.col("location"))
    m.map_value(opt_or(ref_p, loc_p), "unreliable")          # false || true
    m.map_value(opt_and(loc_p, ref_p), "dupe")               # true && false
    m.map_value(opt_not(is_absent(F.col("location"))), "queryparamBoolean")
    m.map_value(opt_and(loc_p, opt_or(ref_p, loc_p)), "pathBoolean")
    row = m.apply(_events(spark, rows)).first()
    assert row.unreliable is True
    assert row.dupe is False
    assert row.queryparamBoolean is True
    assert row.pathBoolean is True


def test_basic_stop(spark):
    m = _std(MappingBuilder(SCHEMA))
    m.map_literal("happened", "client")
    m.stop_()
    m.map_literal("should not happen", "session")
    row = m.apply(_events(spark)).first()
    assert row.client == "happened" and row.session is None
    # preamble before the stop still applied
    assert row.remoteHost == "127.0.0.1"


def test_basic_toplevel_exit(spark):
    m = _std(MappingBuilder(SCHEMA))
    m.map_literal("happened", "client")
    m.exit_()
    m.map_literal("should not happen", "session")
    row = m.apply(_events(spark)).first()
    assert row.client == "happened" and row.session is None


def test_nested_conditional_exit(spark):
    # nested-conditional-exit.groovy: exit() breaks the enclosing
    # SECTION, not just the when block; mapping continues after it.
    m = _std(MappingBuilder(SCHEMA))
    loc_p = is_present(F.col("location"))
    with m.section():
        with m.when(loc_p):
            m.map_literal("happened", "client")
            m.exit_()
            m.map_literal("should not happen", "session")
    with m.section():
        with m.when(loc_p):
            m.map_literal("happened", "pageview")
            with m.when(is_absent(F.col("location"))):
                m.exit_()
            m.map_literal("happened", "event")
            with m.when(loc_p):
                m.exit_()
            m.map_literal("should not happen", "session")
    m.map_literal("happened", "customCookie")
    row = m.apply(_events(spark)).first()
    assert row.client == "happened"
    assert row.session is None
    assert row.pageview == "happened"
    assert row.event == "happened"
    assert row.customCookie == "happened"


def test_nested_conditional_stop(spark):
    m = _std(MappingBuilder(SCHEMA))
    m.map_literal("happened", "client")
    with m.when(is_present(F.col("location"))):
        with m.when(is_present(F.col("ts"))):
            m.stop_()
    m.map_literal("should not happen", "session")
    row = m.apply(_events(spark)).first()
    assert row.client == "happened" and row.session is None


def test_shorthand_conditional_stop(spark):
    # when(cond) stop(): fires per-row — rows WITHOUT location continue
    rows = [_ROW, _ROW[:5] + (None,) + _ROW[6:]]
    m = _std(MappingBuilder(SCHEMA))
    m.map_literal("happened", "client")
    with m.when(is_present(F.col("location"))):
        m.stop_()
    m.map_literal("did happen", "session")
    vals = {(r.client, r.session) for r in m.apply(_events(spark, rows)).collect()}
    assert vals == {("happened", None), ("happened", "did happen")}


def test_regex_mapping(spark):
    # regex-mapping.groovy
    rows = [_ROW[:5] + ("http://www.example.com/path/with/1234/abcd.html",) + _ROW[6:]]
    regex = r"http://[^/]+/path/with/([0-9]+)/(?<page>[^\.]+)\.html"
    m = _std(MappingBuilder(SCHEMA))
    m.map_value(matches(F.col("location"), regex), "pathBoolean")
    m.map_value(match_group(F.col("location"), regex, 1), "client")
    m.map_value(match_group(F.col("location"), regex, "page"), "pageview")
    row = m.apply(_events(spark, rows)).first()
    assert row.pathBoolean is True
    assert row.client == "1234"
    assert row.pageview == "abcd"


def test_uri_mapping(spark):
    rows = [_ROW[:5] + ("https://ex.com:8443/a%20b/c?q=1",) + _ROW[6:]]
    m = _std(MappingBuilder(SCHEMA))
    loc = F.col("location")
    m.map_value(uri_scheme(loc), "uriScheme")
    m.map_value(uri_host(loc), "uriHost")
    m.map_value(uri_port(loc), "uriPort")
    m.map_value(uri_path(loc), "uriPath")
    row = m.apply(_events(spark, rows)).first()
    assert (row.uriScheme, row.uriHost, row.uriPort, row.uriPath) == (
        "https", "ex.com", 8443, "/a b/c")


def test_absent_producer_leaves_field(spark):
    # 'if present, set' — an absent producer must NOT clobber an
    # earlier assignment (ordered overwrite semantics).
    m = MappingBuilder(SCHEMA)
    m.map_literal("first", "client")
    m.map_value(F.lit(None).cast("string"), "client")
    row = m.apply(_events(spark)).first()
    assert row.client == "first"


def test_schema_default_for_unmapped(spark):
    m = MappingBuilder(SCHEMA)
    row = m.apply(_events(spark)).first()
    assert row.unreliable is False  # default from schema
    assert row.client is None       # null default


def test_validation_missing_field():
    m = MappingBuilder(SCHEMA)
    with pytest.raises(SchemaMappingException):
        m.map_literal("x", "no_such_field")


def test_validation_wrong_literal_type():
    m = MappingBuilder(SCHEMA)
    with pytest.raises(SchemaMappingException):
        m.map_literal("not a boolean", "unreliable")  # wrong-types-literal
    with pytest.raises(SchemaMappingException):
        m.map_literal(3.5, "ts")


def test_validation_wrong_producer_type(spark):
    m = MappingBuilder(SCHEMA)
    m.map_value(F.col("ts"), "remoteHost")  # long -> string field
    with pytest.raises(SchemaMappingException):
        m.apply(_events(spark))


def test_avsc_rejects_nontrivial_union():
    bad = {
        "type": "record",
        "name": "R",
        "fields": [{"name": "u", "type": ["null", "string", "long"]}],
    }
    with pytest.raises(SchemaMappingException):
        MappingBuilder(bad)


# --- ports of the remaining Groovy fixture corpus ---------------------------


def test_chained_na_mapping(spark):
    """chained-na-mapping.groovy: absent referer -> uri -> path -> regex
    group chain stays absent end-to-end; the field keeps its non-null
    schema default ('not set' analogue: here the declared default)."""
    from divolte_collector_spark.functions.uri import uri_path

    schema = dict(SCHEMA)
    schema = {
        **SCHEMA,
        "fields": [
            {**f, "default": "not set"} if f["name"] == "queryparam" else f
            for f in SCHEMA["fields"]
        ],
    }
    m = _std(MappingBuilder(schema))
    ref_path = uri_path(F.col("referer"))
    m.map_value(match_group(ref_path, "some regex with a (group)", 1), "queryparam")
    rows = [_ROW[:4] + (None,) + _ROW[5:]]  # referer = None
    row = m.apply(_events(spark, rows)).first()
    assert row.queryparam == "not set"


def test_client_timestamp_mapping(spark):
    """client-timestamp.groovy: clientTimestamp() onto ts."""
    m = MappingBuilder(SCHEMA)
    m.map_value(F.col("first_in_session"), "sessionStart")
    m.map_value(F.col("remote_host"), "remoteHost")
    m.map_value(F.col("ts"), "ts")  # client ts carried as epoch-ms long
    row = m.apply(_events(spark)).first()
    assert row.ts == 1412220184033


def test_funky_querystring(spark):
    """funky-querystring-mapping.groovy semantics:
    ?q=        => q == ""
    ?q&a=bar   => q == "" and a == "bar"
    ?=42&q=foo => q == "foo" (empty key kept separately)
    """
    from divolte_collector_spark.functions.querystring import qs_multimap

    df = spark.createDataFrame([("a=value&=42&b=&d=word&c&=bla",)], "qs string")
    got = df.select(
        *[
            F.element_at(F.element_at(qs_multimap(F.col("qs")), F.lit(k)), 1).alias(k)
            for k in ("a", "b", "c", "d")
        ]
    ).first()
    assert got.a == "value"
    assert got.b == ""
    assert got.c == ""
    assert got.d == "word"


def test_uri_mapping_raw(spark):
    """uri-mapping-raw.groovy golden values."""
    from divolte_collector_spark.functions.uri import (
        uri_raw_fragment,
        uri_raw_path,
        uri_raw_query,
    )

    loc = (
        "http://example.com/path/to/resource%20and%20such/page.html"
        "?q=multiple+words+%24%23%25%26&p=42"
        "#/client/side/path?x=value&y=42&q=multiple+words+%24%23%25%26"
    )
    df = spark.createDataFrame([(loc,)], "location string")
    row = df.select(
        uri_raw_path(F.col("location")).alias("p"),
        uri_raw_query(F.col("location")).alias("q"),
        uri_raw_fragment(F.col("location")).alias("f"),
    ).first()
    assert row.p == "/path/to/resource%20and%20such/page.html"
    assert row.q == "q=multiple+words+%24%23%25%26&p=42"
    assert row.f == "/client/side/path?x=value&y=42&q=multiple+words+%24%23%25%26"


def test_uri_mapping_fragment_reparse(spark):
    """uri-mapping-fragment.groovy: parse the raw fragment AS a URI
    again (Angular-style client-side routes)."""
    from divolte_collector_spark.functions.querystring import qs_multimap
    from divolte_collector_spark.functions.uri import (
        uri_path,
        uri_raw_fragment,
        uri_raw_query,
    )

    loc = (
        "http://example.com/path/?q=divolte"
        "#/client/side/path?x=value&y=42&q=multiple+words+%24%23%25%26"
    )
    df = spark.createDataFrame([(loc,)], "location string")
    frag = uri_raw_fragment(F.col("location"))
    row = df.select(
        uri_path(frag).alias("p"),
        uri_raw_query(frag).alias("q"),
        F.element_at(
            F.element_at(qs_multimap(uri_raw_query(frag)), F.lit("q")), 1
        ).alias("qv"),
    ).first()
    assert row.p == "/client/side/path"
    assert row.q == "x=value&y=42&q=multiple+words+%24%23%25%26"
    assert row.qv == "multiple words $#%&"


def test_header_normalization(spark):
    """header-normalization-mapping.groovy: RFC comma-splitting with
    quoted strings, multi-line headers flattened in order
    (DslRecordMapperTest.java:298-312 golden list)."""
    from divolte_collector_spark.functions.headers import split_header_lines_udf

    lines = [
        "first",
        "second, third ,fourth,fifth",
        '"sixth,still_sixth", seventh,',
        '" eighth,\\"still eighth "',
        "ninth  still ninth",
        "last",
    ]
    df = spark.createDataFrame([(lines,)], "h array<string>")
    got = df.select(split_header_lines_udf(F.col("h")).alias("v")).first().v
    assert got == [
        "first",
        "second",
        "third",
        "fourth",
        "fifth",
        "sixth,still_sixth",
        "seventh",
        ' eighth,"still eighth ',
        "ninth still ninth",
        "last",
    ]


def test_event_param_jsonpath_presence(spark):
    """event-param-jsonpath-presence.groovy: path('$.foo').isPresent()
    guards; missing path => false branch (absent, not error)."""
    schema = {
        "type": "record",
        "name": "R",
        "fields": [
            {"name": "flag1", "type": "boolean", "default": False},
            {"name": "flag2", "type": "boolean", "default": False},
        ],
    }
    m = MappingBuilder(schema)
    params = F.col("event_parameters")
    m.map_literal(False, "flag1")
    with m.when(F.get_json_object(params, "$.foo").isNotNull()):
        m.map_literal(True, "flag1")
    m.map_literal(False, "flag2")
    with m.when(F.get_json_object(params, "$.missing").isNotNull()):
        m.map_literal(True, "flag2")
    df = spark.createDataFrame(
        [('{"foo": "string", "bar": 42}',)], "event_parameters string"
    )
    row = m.apply(df).first()
    assert row.flag1 is True
    assert row.flag2 is False


def test_event_param_jsonpath_values(spark):
    """event-param-jsonpath-mapping.groovy: scalar, int and wildcard
    array extraction (itemPrices = $.items[*].price)."""
    payload = (
        '{"foo": "string", "bar": 42, "items": ['
        '{"name": "apple", "count": 3, "price": 1.23},'
        '{"name": "pear", "count": 1, "price": 0.89}]}'
    )
    df = spark.createDataFrame([(payload,)], "event_parameters string")
    p = F.col("event_parameters")
    row = df.select(
        F.get_json_object(p, "$.foo").alias("paramValue"),
        F.get_json_object(p, "$.bar").cast("int").alias("paramIntValue"),
        F.from_json(
            F.get_json_object(p, "$.items[*].price"), "array<double>"
        ).alias("itemPrices"),
    ).first()
    assert row.paramValue == "string"
    assert row.paramIntValue == 42
    assert row.itemPrices == [1.23, 0.89]


def test_custom_cookie_mapping(spark):
    """custom-cookie-mapping.groovy: cookie(name) from the request's
    cookie map."""
    m = MappingBuilder(SCHEMA)
    m.map_value(F.col("first_in_session"), "sessionStart")
    m.map_value(F.col("ts"), "ts")
    m.map_value(F.col("remote_host"), "remoteHost")
    m.map_value(F.element_at(F.col("cookies"), F.lit("custom_cookie")), "customCookie")
    df = _events(spark).withColumn(
        "cookies",
        F.create_map(F.lit("custom_cookie"), F.lit("custom_cookie_value")),
    )
    row = m.apply(df).first()
    assert row.customCookie == "custom_cookie_value"


def test_event_param_runtime_mismatch_keeps_going(spark):
    """event-param-jsonpath-mismatch.groovy: a runtime type mismatch
    maps nothing (absent), and LATER mappings still complete
    (DslRecordMapperTest.java:353-358)."""
    schema = {
        "type": "record",
        "name": "R",
        "fields": [
            {"name": "paramIntValue", "type": ["null", "int"], "default": None},
            {"name": "after", "type": ["null", "string"], "default": None},
        ],
    }
    m = MappingBuilder(schema)
    # $.foo is the STRING "string" — int target mismatches at runtime
    m.map_value(
        F.get_json_object(F.col("event_parameters"), "$.foo").try_cast("int"),
        "paramIntValue",
    )
    m.map_value(F.lit("done"), "after")
    df = spark.createDataFrame(
        [('{"foo": "string", "bar": 42}',)], "event_parameters string"
    )
    row = m.apply(df).first()
    assert row.paramIntValue is None
    assert row.after == "done"


def test_simple_value_accessors(spark):
    """§2.4: every named accessor resolves over a decoded browser event
    (browser-only values under the struct, transport values from the
    kept raw columns, absent values null — never errors)."""
    from divolte_collector_spark.mapping import values as v
    from divolte_collector_spark.sources.browser import parse_browser_events

    qs = (
        "p=0%3Ai1t84hgy%3Aparty&s=0%3Ai1t84hgy%3Asession&v=pv0&e=ev0&"
        "c=i0rjfnxd&n=t&f=t&l=http%3A%2F%2Fx%2Fhome&w=uq&t=pageView"
    )
    raw = spark.createDataFrame(
        [
            (
                qs,
                __import__("datetime").datetime(2024, 1, 2, 3, 4, 5),
                "10.1.2.3",
                "TestAgent/1.0",
                {"_dvp": "0:aaa:p", "theme": "dark"},
            )
        ],
        "query_string string, request_time timestamp, remote_host string,"
        " user_agent string, cookies map<string,string>",
    )
    row = parse_browser_events(raw).select(
        v.location().alias("loc"),
        v.referer().alias("ref"),
        v.event_type().alias("et"),
        v.first_in_session().alias("fis"),
        v.corrupt().alias("corrupt"),
        v.timestamp().alias("server_ms"),
        v.client_timestamp().alias("client_ms"),
        v.remote_host().alias("host"),
        v.viewport_pixel_width().alias("vw"),
        v.party_id().alias("pid"),
        v.session_id().alias("sid"),
        v.page_view_id().alias("pv"),
        v.event_id().alias("eid"),
        v.user_agent_string().alias("ua"),
        v.cookie("theme").alias("theme"),
        v.cookie("absent").alias("no_cookie"),
    ).first()
    assert row.loc == "http://x/home"
    assert row.ref is None  # absent on this request: null, not error
    assert row.et == "pageView"
    assert row.fis is True
    assert row.corrupt is True  # no x param
    assert row.client_ms == 1412220184033  # base36 i0rjfnxd
    assert row.server_ms is not None
    assert row.host == "10.1.2.3"
    assert row.vw == int("uq", 36)
    assert row.pid == "0:i1t84hgy:party"
    assert row.sid == "0:i1t84hgy:session"
    assert row.pv == "pv0" and row.eid == "ev0"
    assert row.ua == "TestAgent/1.0"
    assert row.theme == "dark"
    assert row.no_cookie is None


# --- remaining fixture ports ------------------------------------------------

_DIGEST_SCHEMA = {
    "type": "record",
    "name": "DigestRecord",
    "fields": [
        {"name": "digestBinary", "type": ["null", "bytes"], "default": None},
        {"name": "digestString", "type": ["null", "string"], "default": None},
        {"name": "paramMap", "type": ["null", {"type": "map", "values": "string"}], "default": None},
        {"name": "paramValue", "type": ["null", "string"], "default": None},
        {"name": "pathInteger", "type": ["null", "int"], "default": None},
        {"name": "queryparam", "type": ["null", "string"], "default": None},
        {"name": "queryparamBoolean", "type": ["null", "boolean"], "default": None},
        {"name": "queryparamLong", "type": ["null", "long"], "default": None},
        {"name": "queryparamDouble", "type": ["null", "double"], "default": None},
    ],
}


def test_digest_fixture_family(spark):
    """Ports of digest-string-literal, digest-string-provider,
    digest-chaining, digest-missing-value, digest-with-string-conversion
    (Digester.java:69-143; BytesValueProducer.java:52-62)."""
    import base64
    import hashlib

    from divolte_collector_spark.functions.digests import digest, to_base64

    m = MappingBuilder(_DIGEST_SCHEMA)
    # digest-chaining: producer + literal through one digester
    m.map_value(
        digest("SHA-256", F.col("event_id"), F.lit("aLiteralString")),
        "digestBinary",
    )
    # digest-with-string-conversion: .result().toBase64()
    m.map_value(
        to_base64(digest("SHA-256", F.col("event_id"))), "digestString"
    )
    # digest-missing-value: absent piece skipped, digest still produced
    m.map_value(
        to_base64(digest("SHA-256", F.lit(None).cast("string"))), "queryparam"
    )
    row = m.apply(_events(spark)).first()

    assert bytes(row.digestBinary) == hashlib.sha256(b"ev0aLiteralString").digest()
    assert row.digestString == base64.b64encode(
        hashlib.sha256(b"ev0").digest()
    ).decode()
    # all pieces absent => digest of empty input (Digester still runs)
    assert row.queryparam == base64.b64encode(hashlib.sha256(b"").digest()).decode()


def test_event_param_mapping_and_jsonpath_missing(spark):
    """Ports of event-param-mapping (whole params onto a map field +
    .value()) and event-param-jsonpath-missing (an absent path is a
    NO-OP: it must not overwrite a previously mapped value —
    DslRecordMapping.java:102-118's present-only set)."""
    from divolte_collector_spark.functions.jsonops import json_path_auto

    params = '{"foo": "bar", "n": 3}'
    ev = _events(spark).withColumn("event_parameters", F.lit(params))

    m = MappingBuilder(_DIGEST_SCHEMA)
    m.map_value(
        F.from_json(F.col("event_parameters"), "map<string,string>"), "paramMap"
    )
    m.map_value(
        F.get_json_object(F.col("event_parameters"), "$.foo"), "paramValue"
    )
    row = m.apply(ev).first()
    assert row.paramMap == {"foo": "bar", "n": "3"}
    assert row.paramValue == "bar"

    m2 = MappingBuilder(_DIGEST_SCHEMA)
    m2.map_literal("value that should not be overwritten", "paramValue")
    m2.map_value(
        json_path_auto(F.col("event_parameters"), "$.missing"), "paramValue"
    )
    row2 = m2.apply(ev).first()
    assert row2.paramValue == "value that should not be overwritten"


def test_correct_types_literal(spark):
    """Port of correct-types-literal: every literal family lands in its
    matching Avro field type (DslRecordMapping.java:120-139)."""
    m = MappingBuilder(_DIGEST_SCHEMA)
    m.map_literal("string value", "queryparam")
    m.map_literal(True, "queryparamBoolean")
    m.map_literal(42, "queryparamLong")
    m.map_literal(42, "pathInteger")
    m.map_literal(42.0, "queryparamDouble")
    row = m.apply(_events(spark)).first()
    assert row.queryparam == "string value"
    assert row.queryparamBoolean is True
    assert row.queryparamLong == 42 and row.pathInteger == 42
    assert row.queryparamDouble == 42.0


def test_minimal_mapping(spark):
    """Port of minimal-mapping: just the common preamble."""
    row = _std(MappingBuilder(SCHEMA)).apply(_events(spark)).first()
    assert row.sessionStart is True
    assert row.ts == 1412220184033
    assert row.remoteHost == "127.0.0.1"
    assert row.client is None  # unmapped nullable stays absent


# --- final fixture ports: the corpus is now 41/41 ---------------------------


def test_shorthand_conditional_stop_closure(spark):
    """shorthand-conditional-stop-closure.groovy: `when { cond } stop()`
    — the closure syntax compiles to the SAME semantics as the
    shorthand form (DslRecordMapperTest.java:469-474); our DSL has one
    spelling, so the port asserts the shared outcome."""
    m = _std(MappingBuilder(SCHEMA))
    m.map_literal("happened", "client")
    with m.when(is_present(F.col("location"))):
        m.stop_()
    m.map_literal("should not happen", "session")
    row = m.apply(_events(spark)).first()
    assert row.client == "happened" and row.session is None


def test_nested_conditional_exit_closure(spark):
    """nested-conditional-exit-closure.groovy: `when { cond } apply {}`
    / `when { cond } exit()` — closure spellings of
    nested-conditional-exit (DslRecordMapperTest.java:496-505); same
    golden outcome: client/pageview/event/customCookie set, session
    absent."""
    m = _std(MappingBuilder(SCHEMA))
    loc_p = is_present(F.col("location"))
    with m.section():
        with m.when(loc_p):
            m.map_literal("happened", "client")
            m.exit_()
            m.map_literal("should not happen", "session")
    with m.section():
        with m.when(loc_p):
            m.map_literal("happened", "pageview")
            with m.when(is_absent(F.col("location"))):
                m.exit_()
            m.map_literal("happened", "event")
            with m.when(loc_p):
                m.exit_()
            m.map_literal("should not happen", "session")
    m.map_literal("happened", "customCookie")
    row = m.apply(_events(spark)).first()
    assert (row.client, row.pageview, row.event, row.customCookie) == (
        "happened", "happened", "happened", "happened"
    )
    assert row.session is None


_HEADER_FIXTURE_SCHEMA = {
    "type": "record",
    "name": "HeaderRecord",
    "fields": [
        {"name": "headerList", "type": ["null", {"type": "array", "items": "string"}], "default": None},
        {"name": "headerFirst", "type": ["null", "string"], "default": None},
        {"name": "headerGet0", "type": ["null", "string"], "default": None},
        {"name": "headerGet1", "type": ["null", "string"], "default": None},
        {"name": "headerGet2", "type": ["null", "string"], "default": None},
        {"name": "headerGet3", "type": ["null", "string"], "default": None},
        {"name": "headerGet_4", "type": ["null", "string"], "default": None},
        {"name": "headerGet_3", "type": ["null", "string"], "default": None},
        {"name": "headerGet_2", "type": ["null", "string"], "default": None},
        {"name": "headerGet_1", "type": ["null", "string"], "default": None},
        {"name": "headerLast", "type": ["null", "string"], "default": None},
        {"name": "headers", "type": ["null", "string"], "default": None},
    ],
}


def test_header_mapping_fixture(spark):
    """header-mapping.groovy over three X-Divolte-Test occurrences
    (DslRecordMapperTest.java:279-296, request at :651-653): list,
    first/last, every documented get() index incl. out-of-range nulls,
    commaSeparated."""
    from divolte_collector_spark.functions.headers import (
        header_comma_separated,
        header_first,
        header_get,
        header_last,
        header_values,
    )

    ev = _events(spark).withColumn(
        "headers",
        F.create_map(
            F.lit("x-divolte-test"),
            F.array(F.lit("first"), F.lit("second"), F.lit("last")),
        ),
    )
    hdr = header_values(F.col("headers"), "X-Divolte-Test")
    m = MappingBuilder(_HEADER_FIXTURE_SCHEMA)
    m.map_value(hdr, "headerList")
    m.map_value(header_first(hdr), "headerFirst")
    for i in (0, 1, 2, 3, -4, -3, -2, -1):
        m.map_value(header_get(hdr, i), f"headerGet{i}".replace("-", "_"))
    m.map_value(header_last(hdr), "headerLast")
    m.map_value(header_comma_separated(hdr), "headers")
    row = m.apply(ev).first()
    assert list(row.headerList) == ["first", "second", "last"]
    assert row.headerFirst == "first" and row.headerLast == "last"
    assert (row.headerGet0, row.headerGet1, row.headerGet2) == (
        "first", "second", "last"
    )
    assert row.headerGet3 is None and row.headerGet_4 is None
    assert (row.headerGet_3, row.headerGet_2, row.headerGet_1) == (
        "first", "second", "last"
    )
    assert row.headers == "first,second,last"


def test_event_param_all_fixture(spark):
    """event-param-all.groovy with HETEROGENOUS_EVENT_PARAMS
    (DslRecordMapperTest.java:80-84,346-352): the whole mincode 'u='
    document onto a typed record — unknown leaves (name, extra*)
    ignored, d-tokens as longs, j-tokens as doubles; golden record
    {"foo": "string", "bar": "42"(long 42), items: [{3, 1.23}, {1, 0.89}]}."""
    import json

    from divolte_collector_spark.functions.mincode import mincode_to_json

    mincode = (
        "(sfoo!string!dbar!16!aitems!"
        "(sname!apple!dcount!3!jprice!1.23!sextra1!ignored!)"
        "(sname!pear!dcount!1!jprice!0.89!sextra2!ignored!)"
        ".)"
    )
    doc = mincode_to_json(mincode)
    parsed = json.loads(doc)
    assert parsed["foo"] == "string" and parsed["bar"] == 42  # base36 '16'
    ev = _events(spark).withColumn("event_parameters", F.lit(doc))
    rec = F.from_json(
        F.col("event_parameters"),
        "foo string, bar long, items array<struct<count: long, price: double>>",
    )
    row = ev.select(rec.alias("r")).first().r
    assert row.foo == "string" and row.bar == 42
    assert [(i["count"], i["price"]) for i in row["items"]] == [
        (3, 1.23), (1, 0.89)
    ]


def test_wrong_types_producer(spark):
    """wrong-types-producer.groovy: a boolean value producer onto an
    int field fails at STARTUP (SchemaMappingException,
    DslRecordMapperTest.java:427-431). Our startup moment is compile/
    apply, where the input schema is first known."""
    schema = {
        "type": "record",
        "name": "R",
        "fields": [{"name": "pathInteger", "type": ["null", "int"], "default": None}],
    }
    m = MappingBuilder(schema)
    m.map_value(
        equal_to_literal(F.col("location"), "not the location"), "pathInteger"
    )
    with pytest.raises(Exception, match="(?i)type|compatib"):
        m.apply(_events(spark))


def test_digest_with_seed_fixture(spark):
    """digest-with-seed.groovy: the same value through unseeded and two
    differently-seeded sha-256 digesters yields three DISTINCT base64
    strings (DslRecordMapperTest.java:600-614)."""
    from divolte_collector_spark.functions.digests import (
        digest,
        seeded_digest,
        to_base64,
    )

    schema = {
        "type": "record",
        "name": "D",
        "fields": [
            {"name": "digestString", "type": ["null", "string"], "default": None},
            {"name": "digestString2", "type": ["null", "string"], "default": None},
            {"name": "digestString3", "type": ["null", "string"], "default": None},
        ],
    }
    m = MappingBuilder(schema)
    common = F.col("event_id")
    m.map_value(to_base64(digest("SHA-256", common)), "digestString")
    m.map_value(to_base64(seeded_digest("SHA-256", "foo", common)), "digestString2")
    m.map_value(to_base64(seeded_digest("SHA-256", "bar", common)), "digestString3")
    row = m.apply(_events(spark)).first()
    vals = [row.digestString, row.digestString2, row.digestString3]
    assert all(vals) and len(set(vals)) == 3


def test_enum_literal_validated_at_build_time():
    # REGRESSION: an invalid enum symbol passed all startup validation
    # and only crashed per-record deep in the Avro encoder; it must be
    # a build-time SchemaMappingException
    import pytest

    from divolte_collector_spark.mapping.avro_schema import (
        SchemaMappingException,
    )
    from divolte_collector_spark.mapping.dsl import MappingBuilder

    schema = {
        "type": "record",
        "name": "E",
        "fields": [
            {
                "name": "tier",
                "type": ["null", {"type": "enum", "name": "Tier",
                                  "symbols": ["A", "B"]}],
                "default": None,
            }
        ],
    }
    b = MappingBuilder(schema)
    b.map_literal("A", "tier")  # valid symbol: accepted
    with pytest.raises(SchemaMappingException, match="not a symbol"):
        MappingBuilder(schema).map_literal("C", "tier")
