"""Scalar DSL function families: casts (§2.5), regex (§2.7), headers
(§2.8), boolean algebra (§2.12), digests (§2.13), base36, URI (§2.6),
user-agent (§2.10)."""

from __future__ import annotations

import base64
import hashlib
import hmac

from pyspark.sql import functions as F

from divolte_collector_spark.functions import booleans as B
from divolte_collector_spark.functions import casts as C
from divolte_collector_spark.functions.base36 import (
    base36_encode,
    try_parse_base36_int,
    try_parse_base36_long,
)
from divolte_collector_spark.functions.digests import (
    STATIC_SALT,
    digest,
    seeded_digest,
    to_base64,
    to_hex_lower,
    to_hex_upper,
)
from divolte_collector_spark.functions.headers import (
    header_comma_separated,
    header_first,
    header_get,
    header_last,
    header_values,
    split_header_value,
)
from divolte_collector_spark.functions.regexops import match_group, matches
from divolte_collector_spark.functions.uri import (
    uri_decoded_fragment,
    uri_decoded_query,
    uri_host,
    uri_path,
    uri_port,
    uri_raw_path,
    uri_scheme,
)
from divolte_collector_spark.functions.useragent import user_agent_struct


def _one(spark, cols: dict):
    df = spark.range(1)
    return df.select(*[c.alias(k) for k, c in cols.items()]).first()


# --- casts ------------------------------------------------------------------

def test_tryparse_casts(spark):
    df = spark.createDataFrame(
        [("42", "3.5", "TRUE"), ("nope", "junk", "yes"), (None, None, None)],
        "i string, f string, b string",
    )
    rows = df.select(
        C.try_parse_int32(F.col("i")).alias("i32"),
        C.try_parse_int64(F.col("i")).alias("i64"),
        C.try_parse_fp64(F.col("f")).alias("f64"),
        C.try_parse_bool(F.col("b")).alias("b"),
    ).collect()
    assert (rows[0].i32, rows[0].i64, rows[0].f64, rows[0].b) == (42, 42, 3.5, True)
    # unparseable => absent (null), never error; 'yes' is NOT true
    assert (rows[1].i32, rows[1].i64, rows[1].f64, rows[1].b) == (None, None, None, False)
    assert (rows[2].i32, rows[2].b) == (None, None)


def test_tryparse_int_rejects_decimal_and_overflow(spark):
    r = _one(
        spark,
        {
            "dec": C.try_parse_int32(F.lit("3.7")),
            "ovf": C.try_parse_int32(F.lit("4294967296")),
            "ok64": C.try_parse_int64(F.lit("4294967296")),
        },
    )
    assert r.dec is None and r.ovf is None and r.ok64 == 4294967296


# --- base36 -----------------------------------------------------------------

def test_base36_roundtrip(spark):
    r = _one(
        spark,
        {
            "enc": base36_encode(F.lit(1412220184033)),
            "dec": try_parse_base36_long(F.lit("i0rjfnxd")),
            "neg": try_parse_base36_long(F.lit("-ql2p2c")),
            "bad": try_parse_base36_long(F.lit("a_b")),
            "i": try_parse_base36_int(F.lit("1ak")),
        },
    )
    assert r.enc == "i0rjfnxd"
    assert r.dec == 1412220184033
    assert r.neg == -int("ql2p2c", 36)
    assert r.bad is None
    assert r.i == int("1ak", 36)


# --- regex ------------------------------------------------------------------

def test_regex_full_match_and_groups(spark):
    r = _one(
        spark,
        {
            "m1": matches(F.lit("abc123"), r"[a-z]+\d+"),
            "m2": matches(F.lit("abc123x"), r"[a-z]+\d+"),  # full-string: no
            "g1": match_group(F.lit("abc123"), r"([a-z]+)(\d+)", 2),
            "gn": match_group(F.lit("abc123"), r"(?<word>[a-z]+)\d+", "word"),
            "gm": match_group(F.lit("zzz"), r"([a-z]+)(\d+)", 1),  # no match
            "ge": match_group(F.lit("abc"), r"([a-z]+)(\d*)", 2),  # empty group
            "mn": matches(F.lit(None).cast("string"), "x"),
        },
    )
    assert r.m1 is True and r.m2 is False
    assert r.g1 == "123" and r.gn == "abc"
    assert r.gm is None and r.ge is None and r.mn is None


# --- headers ----------------------------------------------------------------

def test_split_header_value_pure():
    # RFC comma splitting with quoted strings and escapes
    assert split_header_value("a, b ,c") == ["a", "b", "c"]
    assert split_header_value('x="a,b", y') == ["x=a,b", "y"]
    assert split_header_value('"quoted \\" comma, here", tail') == [
        'quoted " comma, here', "tail"]
    # empty values are skipped (HeaderValueParser.java:180-190 loops
    # until a NON-empty value accumulates; DslRecordMapperTest's golden
    # list has no empty for the trailing comma in '"...", seventh,')
    assert split_header_value("one,,three") == ["one", "three"]
    # internal whitespace runs collapse to a single space
    assert split_header_value("ninth  still ninth") == ["ninth still ninth"]
    assert split_header_value('"unterminated') == ["unterminated"]


def test_header_operators(spark):
    df = spark.createDataFrame(
        [({"accept": ["text/html, application/json", "image/png"]},)],
        "headers map<string,array<string>>",
    )
    vals = header_values(F.col("headers"), "Accept")
    r = df.select(
        vals.alias("all"),
        header_first(vals).alias("first"),
        header_last(vals).alias("last"),
        header_get(vals, 1).alias("g1"),
        header_get(vals, -2).alias("gm2"),
        header_comma_separated(vals).alias("joined"),
    ).first()
    assert r.all == ["text/html", "application/json", "image/png"]
    assert r.first == "text/html" and r.last == "image/png"
    assert r.g1 == "application/json" and r.gm2 == "application/json"
    assert r.joined == "text/html,application/json,image/png"


# --- boolean algebra --------------------------------------------------------

def test_optional_boolean_algebra(spark):
    t, f, n = F.lit(True), F.lit(False), F.lit(None).cast("boolean")
    r = _one(
        spark,
        {
            "and_tn": B.opt_and(t, n),      # absent (NOT SQL: true AND null)
            "or_tn": B.opt_or(t, n),        # absent (SQL would say true!)
            "or_tf": B.opt_or(t, f),
            "not_n": B.opt_not(n),
            "eq_nn": B.equal_to(n, n),      # two absents are EQUAL
            "eq_lit_n": B.equal_to_literal(n.cast("string"), "x"),  # absent vs literal: false
            "present": B.is_present(n),
            "holds_n": B.cond_holds(n),
        },
    )
    assert r.and_tn is None and r.or_tn is None and r.or_tf is True
    assert r.not_n is None
    assert r.eq_nn is True and r.eq_lit_n is False
    assert r.present is False and r.holds_n is False


# --- digests ----------------------------------------------------------------

def test_digest_unseeded_matches_hashlib(spark):
    expected = hashlib.sha256(b"aLiteralString").digest()
    r = _one(
        spark,
        {
            "d": digest("SHA-256", F.lit("aLiteralString")),
            "hexl": to_hex_lower(digest("SHA-256", F.lit("aLiteralString"))),
            "hexu": to_hex_upper(digest("SHA-256", F.lit("aLiteralString"))),
            "b64": to_base64(digest("SHA-256", F.lit("aLiteralString"))),
            "md5": digest("MD5", F.lit("x")),
        },
    )
    assert bytes(r.d) == expected
    assert r.hexl == expected.hex()
    assert r.hexu == expected.hex().upper()
    assert r.b64 == base64.b64encode(expected).decode()
    assert bytes(r.md5) == hashlib.md5(b"x").digest()


def test_digest_absent_pieces_skipped(spark):
    # digestingMissingValueShouldBeNoop (DslRecordMapperTest.java:583-588):
    # absent piece => digest of the empty string, not absent.
    r = _one(
        spark,
        {
            "empty": digest("SHA-256", F.lit(None).cast("string")),
            "mixed": digest(
                "SHA-256", F.lit("a"), F.lit(None).cast("string"), F.lit("b")
            ),
        },
    )
    assert bytes(r.empty) == hashlib.sha256(b"").digest()
    assert bytes(r.mixed) == hashlib.sha256(b"ab").digest()


def test_seeded_digest_pbkdf2_hmac(spark):
    # Exact JCE parity: key = PBKDF2WithHmacSHA256(seed, STATIC_SALT,
    # 100000, 32); result = HMAC-SHA256(key, data).
    key = hashlib.pbkdf2_hmac("sha256", b"foo", STATIC_SALT, 100_000, dklen=32)
    expected = hmac.new(key, b"payload", "sha256").digest()
    r = _one(
        spark,
        {
            "s1": seeded_digest("SHA-256", "foo", F.lit("payload")),
            "s2": seeded_digest("SHA-256", "bar", F.lit("payload")),
            "u": digest("SHA-256", F.lit("payload")),
        },
    )
    assert bytes(r.s1) == expected
    # different seeds produce different hashes (shouldSupportSeededDigesting)
    assert bytes(r.s2) != bytes(r.s1) != bytes(r.u)


# --- URI --------------------------------------------------------------------

def test_uri_operators(spark):
    url = "https://ex.com:8443/a%20b/c?q=1%202&r=x#frag%21"
    r = _one(
        spark,
        {
            "scheme": uri_scheme(F.lit(url)),
            "host": uri_host(F.lit(url)),
            "port": uri_port(F.lit(url)),
            "raw_path": uri_raw_path(F.lit(url)),
            "path": uri_path(F.lit(url)),
            "q": uri_decoded_query(F.lit(url)),
            "frag": uri_decoded_fragment(F.lit(url)),
            "noport": uri_port(F.lit("http://ex.com/")),
        },
    )
    assert r.scheme == "https" and r.host == "ex.com" and r.port == 8443
    assert r.raw_path == "/a%20b/c" and r.path == "/a b/c"
    assert r.q == "q=1 2&r=x" and r.frag == "frag!"
    assert r.noport is None  # absent when -1 (DslRecordMapping.java:492)


# --- user agent -------------------------------------------------------------

def test_user_agent_struct(spark):
    chrome = ("Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 "
              "(KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36")
    bot = "Googlebot/2.1 (+http://www.google.com/bot.html)"
    df = spark.createDataFrame([(chrome,), (bot,), (None,)], "ua string")
    rows = df.select(user_agent_struct(F.col("ua")).alias("u")).collect()
    c, b, n = rows[0].u, rows[1].u, rows[2].u
    assert c.name == "Chrome" and c.vendor == "Google" and c.type == "BROWSER"
    assert c.os_family == "Windows" and c.device_category == "PERSONAL_COMPUTER"
    assert c.version.startswith("120.")
    assert b.type == "ROBOT"
    assert n.name is None


def test_geoip_hot_reload(spark, tmp_path):
    """ExternalDatabaseLookupService parity: a changed geo file is
    picked up on next access; unchanged files are not reloaded."""
    import time

    from divolte_collector_spark.operators.geoip import (
        HotReloadingGeoTable,
        geoip_enrich,
    )

    p = tmp_path / "geo.csv"
    p.write_text("range_start,range_end,city_name\n0,4294967295,Everywhere\n")
    hot = HotReloadingGeoTable(spark, str(p))
    ev = spark.createDataFrame([("1.2.3.4",)], "remote_host string")
    assert (
        geoip_enrich(ev, hot.current()).first().city_name == "Everywhere"
    )
    t1 = hot._table
    assert hot.current() is t1  # unchanged file => same broadcasted dim

    time.sleep(0.01)
    p.write_text("range_start,range_end,city_name\n0,4294967295,Elsewhere\n")
    import os
    os.utime(p)  # ensure mtime moves even on coarse filesystems
    assert geoip_enrich(ev, hot.current()).first().city_name == "Elsewhere"


def test_digest_json_fixture(spark):
    """digest-json.groovy golden (DslRecordMapperTest.java:568-572):
    scalar JSON nodes digest as text ('string', '42', 'apple');
    non-scalar results ($.items, $.items[*].name) are absent pieces.
    Expected digest input: 'string42apple'."""
    from divolte_collector_spark.functions.jsonops import (
        json_path_exists,
        json_path_scalar,
    )

    payload = (
        '{"foo": "string", "bar": 42, "items": ['
        '{"name": "apple", "count": 3, "price": 1.23},'
        '{"name": "pear", "count": 1, "price": 0.89}]}'
    )
    p = F.lit(payload)
    r = _one(
        spark,
        {
            "d": digest(
                "SHA-256",
                json_path_scalar(p, "$.foo"),
                json_path_scalar(p, "$.bar"),
                json_path_scalar(p, "$.items"),
                json_path_scalar(p, "$.items[*].name"),
                json_path_scalar(p, "$.items[0].name"),
            ),
            "present": json_path_exists(p, "$.foo"),
            "missing": json_path_exists(p, "$.nope"),
        },
    )
    assert bytes(r.d) == hashlib.sha256(b"string42apple").digest()
    assert r.present is True and r.missing is False


def test_digest_documented_algorithms(spark):
    """digest-with-documented-algorithms.groovy: every algorithm named
    in the mapping docs constructs and digests (MD5, SHA-1, SHA-256,
    SHA-512 — the JCE MessageDigest guaranteed set)."""
    algs = {"MD5": "md5", "SHA-1": "sha1", "SHA-256": "sha256", "SHA-512": "sha512"}
    cols = {a: digest(a, F.lit("x")) for a in algs}
    r = _one(spark, cols)
    for jce, pyname in algs.items():
        assert bytes(r[jce]) == hashlib.new(pyname, b"x").digest()


def test_digest_bytes_pieces(spark):
    """digest-bytebuffer.groovy: a binary piece digests as its raw
    bytes (no UTF-8 re-encoding); mixed with string pieces in order."""
    raw = bytes([0, 255, 128, 7])
    df = spark.createDataFrame([(raw,)], "b binary")
    r = df.select(
        digest("SHA-256", F.col("b")).alias("only_bytes"),
        digest("SHA-256", F.lit("pre"), F.col("b")).alias("mixed"),
    ).first()
    assert bytes(r.only_bytes) == hashlib.sha256(raw).digest()
    assert bytes(r.mixed) == hashlib.sha256(b"pre" + raw).digest()


def test_geoip2_city_dim_full_surface(spark):
    """geoip2_city_dim assembles the full GeoIpValueProducer field
    surface (DslRecordMapping.java:753-965) from GeoIP2-City-style
    blocks+locations(+ASN) tables: subdivision arrays least->most
    specific, most_specific_* as their last element, registered /
    represented countries resolved through the locations table."""
    from divolte_collector_spark.operators.geoip import (
        GEO_FIELDS,
        geoip2_city_dim,
        geoip_enrich,
    )

    blocks = spark.createDataFrame(
        [
            # 10.0.0.0/24 -> city 100, registered 200, represented 300
            (167772160, 167772415, 100, 200, 300, "1234AB", 52.1, 4.3, 0, 1),
        ],
        "range_start long, range_end long, geoname_id int,"
        " registered_country_geoname_id int,"
        " represented_country_geoname_id int, postal_code string,"
        " latitude double, longitude double, is_anonymous_proxy int,"
        " is_satellite_provider int",
    )
    locations = spark.createDataFrame(
        [
            (100, "Delft", "EU", 6255148, "Europe", "NL", 2750405,
             "Netherlands", 11, "Europe/Amsterdam",
             "ZH", "South Holland", 2743698, "DF", "Delft District", 999),
            (200, None, "EU", 6255148, "Europe", "BE", 2802361,
             "Belgium", None, None, None, None, None, None, None, None),
            (300, None, "EU", 6255148, "Europe", "LU", 2960313,
             "Luxembourg", None, None, None, None, None, None, None, None),
        ],
        "geoname_id int, city_name string, continent_code string,"
        " continent_geoname_id int, continent_name string,"
        " country_iso_code string, country_geoname_id int,"
        " country_name string, metro_code int, time_zone string,"
        " subdivision_1_iso_code string, subdivision_1_name string,"
        " subdivision_1_geoname_id int, subdivision_2_iso_code string,"
        " subdivision_2_name string, subdivision_2_geoname_id int",
    )
    asn = spark.createDataFrame(
        [(167772160, 167772671, 64512, "ExampleNet", "Example ISP",
          "Example Org", "example.net")],
        "range_start long, range_end long, autonomous_system_number int,"
        " autonomous_system_organization string, isp string,"
        " organization string, domain string",
    )
    dim = geoip2_city_dim(blocks, locations, asn=asn)
    assert set(GEO_FIELDS) <= set(dim.columns)

    ev = spark.createDataFrame([("e1", "10.0.0.7"), ("e2", "11.9.9.9")],
                               "event_id string, remote_host string")
    rows = {r.event_id: r for r in geoip_enrich(ev, dim).collect()}
    hit = rows["e1"]
    assert hit.city_name == "Delft" and hit.city_id == 100
    assert hit.country_code == "NL" and hit.country_id == 2750405
    assert hit.continent_name == "Europe" and hit.continent_id == 6255148
    assert hit.registered_country_code == "BE"
    assert hit.registered_country_name == "Belgium"
    assert hit.represented_country_code == "LU"
    assert hit.subdivision_codes == ["ZH", "DF"]
    assert hit.subdivision_ids == [2743698, 999]
    assert hit.most_specific_subdivision_name == "Delft District"
    assert hit.autonomous_system_number == 64512
    assert hit.isp == "Example ISP" and hit.organisation == "Example Org"
    assert hit.domain == "example.net"
    assert hit.anonymous_proxy is False and hit.satellite_provider is True
    # no-match keeps the event with null geo fields (never dropped)
    miss = rows["e2"]
    assert miss.city_name is None and miss.country_code is None


def test_jsonpath_filter_and_routing(spark):
    """event-param-jsonpath fixtures: definite paths route to
    get_json_object, indefinite (filter/wildcard/descent) paths to the
    jsonpath-ng Arrow UDF with jayway list semantics; malformed docs
    and missing paths are absent, never errors."""
    from divolte_collector_spark.functions.jsonops import (
        is_gjo_expressible,
        json_path_auto,
    )

    assert is_gjo_expressible("$.foo")
    assert is_gjo_expressible("$.items[0].price")
    assert not is_gjo_expressible("$.items[*].price")
    assert not is_gjo_expressible("$.items[?(@.price > 3)].name")
    assert not is_gjo_expressible("$..price")

    doc = ('{"foo":"string","bar":42,"items":['
           '{"name":"apple","count":3,"price":1.23},'
           '{"name":"pear","count":1,"price":0.89}]}')
    df = spark.createDataFrame([(doc,), ("not json",)], ["j"])
    row, bad = df.select(
        json_path_auto(F.col("j"), "$.items[?(@.price > 1)].name").alias("f"),
        json_path_auto(F.col("j"), "$.items[*].count").alias("w"),
        json_path_auto(F.col("j"), "$..price").alias("d"),
        json_path_auto(F.col("j"), "$.foo").alias("s"),
        json_path_auto(F.col("j"), "$.missing[?(@.x > 1)]").alias("m"),
    ).collect()
    assert row.f == '["apple"]'
    assert row.w == "[3,1]"
    assert row.d == "[1.23,0.89]"
    assert row.s == "string"
    assert row.m == "[]"  # present doc, no matches: empty list (jayway)
    assert bad.f is None and bad.w is None and bad.s is None


def test_qs_value_keeps_tail_after_first_equals(spark):
    # REGRESSION: split_part index 2 truncated 'a=b=c' to 'b' and
    # base64 padding 't=dGVzdA==' to 'dGVzdA'
    from divolte_collector_spark.functions.querystring import (
        qs_multimap,
        qs_value,
    )

    df = spark.createDataFrame(
        [("t=dGVzdA%3D%3D&a=b=c",)], "qs string"
    ).select(qs_multimap(F.col("qs")).alias("m"))
    row = df.select(
        qs_value(F.col("m"), "t").alias("t"),
        qs_value(F.col("m"), "a").alias("a"),
    ).collect()[0]
    assert row.t == "dGVzdA=="
    assert row.a == "b=c"


def test_qs_multimap_undecodable_key_is_absent_not_fatal(spark):
    # REGRESSION: a key failing URL-decode ('a%zz') became a NULL map
    # key and map_from_arrays raised NULL_MAP_KEY, killing the job;
    # the contract is undecodable => absent
    from divolte_collector_spark.functions.querystring import qs_multimap

    df = spark.createDataFrame([("a%zz=1&b=2",)], "qs string")
    out = df.select(qs_multimap(F.col("qs")).alias("m")).collect()[0].m
    assert out == {"b": ["2"]}
