"""functions/urlcanon.py: canonical-URL normalization edge cases the
gated query's synthesized matrix doesn't reach."""

from __future__ import annotations

from pyspark.sql import functions as F

from divolte_collector_spark.functions.urlcanon import canonical_url


def _canon(spark, urls, fast=False):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [
        r.c
        for r in df.select(
            canonical_url(F.col("url"), fast=fast).alias("c")
        ).collect()
    ]


STANDARD_MATRIX = [
    "HTTPS://WWW.Example.COM:443/a#frag",
    "https://www.example.com/a",
    "http://Example.com:80/b",
    "http://example.com:8080/b",
    "https://e.com/p?utm_source=x&b=2&a=1",
    "https://e.com/p?a=1&b=2&utm_campaign=y&utm_medium=z",
    "https://e.com/p?b=2&a=1",
    "https://e.com/p?utm_source=x&utm_medium=y",
    "https://e.com/p",
    "https://e.com/p?flag&a=2&a=1",
    "https://shop3.example.com:8443/p/49?a=1&b=2#x",
    # path-less URLs (query directly after the authority): the '?'
    # comes BEFORE any '/', which the fast split must handle
    "https://Example.com?b=2&utm_source=x&a=1",
    "https://example.com:8443?a=1",
    "https://example.com",
]


def test_pathless_url_with_query(spark):
    # REGRESSION: the fast decomposition split on '/' first, folding
    # the query string into the host for path-less URLs — tracking
    # params survived and the host was corrupted
    assert _canon(spark, ["https://Example.com?b=2&utm_source=x&a=1"],
                  fast=True) == ["https://example.com?a=1&b=2"]


def test_fast_mode_matches_parity_on_standard_shapes(spark):
    # the regex-free decomposition must be byte-identical to the
    # parse_url path for every standard scheme://host[:port]/path[?q][#f]
    assert _canon(spark, STANDARD_MATRIX, fast=True) == _canon(
        spark, STANDARD_MATRIX, fast=False
    )


def test_staged_operator_matches_column_form(spark):
    # with_canonical_url (the staged fast path the gated query uses)
    # must equal the single-Column form in BOTH modes, keep the input
    # columns, and leave no _uc_* staging columns behind
    from divolte_collector_spark.functions.urlcanon import (
        with_canonical_url,
    )

    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(STANDARD_MATRIX)], "id long, url string"
    )
    for fast in (True, False):
        out = with_canonical_url(df, F.col("url"), fast=fast)
        assert out.columns == ["id", "url", "canonical_url"]
        got = [r.canonical_url for r in out.orderBy("id").collect()]
        assert got == _canon(spark, STANDARD_MATRIX, fast=fast)


def test_case_port_and_fragment_normalization(spark):
    assert _canon(
        spark,
        [
            "HTTPS://WWW.Example.COM:443/a#frag",
            "https://www.example.com/a",
            "http://Example.com:80/b",
            "http://example.com:8080/b",
        ],
    ) == [
        "https://www.example.com/a",
        "https://www.example.com/a",
        "http://example.com/b",
        "http://example.com:8080/b",  # non-default port survives
    ]


def test_tracking_params_dropped_and_rest_sorted(spark):
    assert _canon(
        spark,
        [
            "https://e.com/p?utm_source=x&b=2&a=1",
            "https://e.com/p?a=1&b=2&utm_campaign=y&utm_medium=z",
            "https://e.com/p?b=2&a=1",
        ],
    ) == ["https://e.com/p?a=1&b=2"] * 3


def test_only_tracking_params_loses_question_mark(spark):
    # a query that empties out must NOT leave a dangling '?': the
    # canonical identity equals the no-query form
    assert _canon(
        spark,
        ["https://e.com/p?utm_source=x&utm_medium=y", "https://e.com/p"],
    ) == ["https://e.com/p"] * 2


def test_valueless_and_duplicate_params(spark):
    # valueless params canonicalize as key= (the §2.6 grammar maps them
    # to ""); duplicate keys keep both values, ordered
    assert _canon(spark, ["https://e.com/p?flag&a=2&a=1"]) == [
        "https://e.com/p?a=1&a=2&flag="
    ]


def test_encoded_separators_do_not_collide(spark):
    # REGRESSION: rebuilding from URL-DECODED values turned
    # ?a=%26b%3D2 (ONE param, value '&b=2') into the same bytes as
    # ?a=&b=2 (TWO params) — two distinct pages merged by the dedup.
    # Raw-byte canonicalization keeps them distinct.
    one_param, two_params = _canon(
        spark,
        ["https://e.com/p?a=%26b%3D2", "https://e.com/p?a=&b=2"],
    )
    assert one_param == "https://e.com/p?a=%26b%3D2"
    assert two_params == "https://e.com/p?a=&b=2"
    assert one_param != two_params


def test_value_keeps_everything_after_first_equals(spark):
    # ?a=b=c and ?a=b=d are different values, not both 'a=b'
    x, y = _canon(
        spark, ["https://e.com/p?a=b=c", "https://e.com/p?a=b=d"]
    )
    assert x == "https://e.com/p?a=b=c" and y == "https://e.com/p?a=b=d"


def test_custom_tracking_prefix(spark):
    df = spark.createDataFrame(
        [("https://e.com/p?ref_src=tw&a=1",)], "url string"
    )
    out = df.select(
        canonical_url(F.col("url"), tracking_prefix="ref_").alias("c")
    ).collect()
    assert out[0].c == "https://e.com/p?a=1"


# --- property: fast path == parity path on generated standard URLs ----------
# The fixture matrix pins known shapes; this generates thousands more.
# Constraint: the fast decomposition is only CLAIMED for the standard
# scheme://host[:port]/path[?query][#fragment] shape (no userinfo, no
# IPv6 literal) — the strategy stays inside that contract and the
# property is byte-identical output across both decompositions, all
# checked in ONE Spark action per example batch (hypothesis drives the
# URL list, Spark evaluates the pair of expressions columnarly).

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    _HAVE_HYP = True
except ImportError:  # pragma: no cover
    _HAVE_HYP = False

if _HAVE_HYP:
    _label = st.text(
        alphabet="abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789-",
        min_size=1, max_size=8,
    ).filter(lambda s: not s.startswith("-") and not s.endswith("-"))
    # java.net.URI only exposes HOST for server-based authorities: the
    # TOP label must start with a LETTER (RFC 2396 toplabel), else the
    # authority is registry-based, getHost() is null, and the parity
    # path goes absent (correctly) where the fast path still splits —
    # so generated hosts stay inside the server-based contract.
    _toplabel = st.text(
        alphabet="abcdefghijklmnopqrstuvwxyz", min_size=1, max_size=4
    )
    # no bare '%': an invalid percent-escape makes java.net.URI reject
    # the whole URI, where the parity path correctly goes absent while
    # the fast path (whose contract is standard-SHAPED input) still
    # decomposes — tested separately below. Valid escapes are included
    # via an explicit '%2F' token.
    _key = st.text(
        alphabet="abcdefghijklmnopqrstuvwxyz0123456789_.-", min_size=1,
        max_size=6,
    ).flatmap(lambda s: st.sampled_from([s, s + "%2F"]))
    _val = st.text(
        alphabet="abcdefghijklmnopqrstuvwxyz0123456789_.-=", min_size=0,
        max_size=8,
    ).flatmap(lambda s: st.sampled_from([s, "%41" + s]))

    @st.composite
    def _standard_url(draw):
        scheme = draw(st.sampled_from(["http", "https", "HTTP", "HtTpS"]))
        host = ".".join(
            draw(st.lists(_label, min_size=0, max_size=3))
            + [draw(_toplabel)]
        )
        port = draw(st.sampled_from(["", ":80", ":443", ":8080", ":65535"]))
        n_seg = draw(st.integers(0, 3))
        path = "".join(
            "/" + draw(_label) for _ in range(n_seg)
        ) or draw(st.sampled_from(["", "/"]))
        params = draw(st.lists(st.tuples(_key, _val), max_size=4))
        q = "&".join(
            k if draw(st.booleans()) and v == "" else f"{k}={v}"
            for k, v in params
        )
        frag = draw(st.sampled_from(["", "#", "#x", "#a/b?c=1"]))
        url = f"{scheme}://{host}{port}{path}"
        if q:
            url += "?" + q
        return url + frag

    @settings(
        max_examples=30, deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(st.lists(_standard_url(), min_size=1, max_size=40))
    def test_property_fast_equals_parity(spark, urls):
        from divolte_collector_spark.functions.urlcanon import canonical_url

        df = spark.createDataFrame([(u,) for u in urls], "url string")
        rows = df.select(
            canonical_url(F.col("url"), fast=True).alias("fast"),
            canonical_url(F.col("url"), fast=False).alias("parity"),
            "url",
        ).collect()
        for r in rows:
            assert r["fast"] == r["parity"], r["url"]


def test_malformed_uri_is_absent_not_an_error(spark):
    # REGRESSION (found by the property test): parse_url under ANSI
    # mode THROWS on an invalid percent-escape, killing the whole
    # batch on one bad URL. The reference's UriValueProducer swallows
    # the parse failure into absent (DslRecordMapping.java:449-466) —
    # try_parse_url restores that: every accessor and the parity-path
    # canonical form are NULL, and the job survives.
    from divolte_collector_spark.functions.uri import (
        uri_host,
        uri_port,
        uri_raw_query,
        uri_scheme,
    )

    df = spark.createDataFrame(
        [("http://0?0=%",), ("https://ok.example.com/p?a=1",)],
        "url string",
    )
    rows = (
        df.select(
            "url",
            uri_scheme(F.col("url")).alias("scheme"),
            uri_host(F.col("url")).alias("host"),
            uri_port(F.col("url")).alias("port"),
            uri_raw_query(F.col("url")).alias("q"),
            canonical_url(F.col("url"), fast=False).alias("canon"),
        )
        .orderBy("url")
        .collect()
    )
    bad, good = rows[0], rows[1]
    assert (bad["scheme"], bad["host"], bad["port"], bad["q"]) == (
        None, None, None, None,
    )
    assert bad["canon"] is None
    assert good["canon"] == "https://ok.example.com/p?a=1"
