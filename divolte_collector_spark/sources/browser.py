"""Browser event source (reference S1): the ``GET /csc-event`` wire
protocol decoded from raw request query strings into the normalized
DivolteEvent shape.

Wire params (ClientSideCookieEventHandler.java:65-84):
``p`` partyId, ``s`` sessionId, ``v`` pageViewId, ``e`` eventId,
``c`` client timestamp (base36 epoch-millis), ``n``/``f``
new-party/first-in-session flags (the literal ``"t"``), ``l`` location,
``r`` referer, ``w``/``h`` viewport px, ``i``/``j`` screen px, ``k``
device pixel ratio (all base36 ints), ``t`` event type, ``u`` mincode
event parameters, ``x`` checksum.

Semantics preserved (ClientSideCookieEventHandler.java:148-204):
- missing/u nparseable REQUIRED params (p, s, v, e, n, f, c with valid
  identifiers) => IncompleteRequestException => the event is dropped;
- a checksum mismatch does NOT drop: the event is kept with
  ``corrupt_event = true`` (S4);
- ``u`` decode failure leaves parameters absent, event kept
  (:181-192).

Input contract: a DataFrame with a raw query-string column (plus
optional server-side columns: request timestamp, remote host, user
agent, cookies/headers). Batch and Structured Streaming share this
function — it is a pure DataFrame->DataFrame transform.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from divolte_collector_spark.functions.base36 import (
    try_parse_base36_int,
    try_parse_base36_long,
)
from divolte_collector_spark.functions.checksum import is_checksum_correct
from divolte_collector_spark.functions.mincode import mincode_to_json_udf
from divolte_collector_spark.functions.querystring import qs_entries

_TRUE_STRING = "t"  # ClientSideCookieEventHandler.java:65

#: requests replaying this If-None-Match value are browser-cache
#: replays: answered 304 and dropped BEFORE parsing (S3,
#: ClientSideCookieEventHandler.java:58-59,119-137)
SENTINEL_ETAG = '"6b3edc43-20ec-4078-bc47-e965dd76b88a"'


def drop_etag_replays(requests: DataFrame, etag_col: str = "if_none_match") -> DataFrame:
    """Request-level duplicate suppression (S3): drop rows whose
    If-None-Match carries the sentinel ETag. A no-op when the ingest
    doesn't capture the header. Runs before any wire parsing — same
    ordering as the reference (304 short-circuit before logEvent)."""
    if etag_col not in requests.columns:
        return requests
    return requests.filter(
        F.col(etag_col).isNull() | (F.col(etag_col) != SENTINEL_ETAG)
    )

#: divolte identifier: version ':' base36-timestamp ':' id
#: (DivolteIdentifier.java:55-61 — tryParse rejects anything else)
_IDENTIFIER_RE = r"^0:[0-9a-z]+:.+$"


def _first_value(qs_map: Column, key: str) -> Column:
    """First occurrence of a wire param (Undertow exposes a Deque; the
    reference reads the first element). The map is built once per row
    from the reversed entry array under LAST_WIN dedup, so the FIRST
    wire occurrence wins — and each param read is an O(1) map lookup
    instead of an array filter over the whole entry list (the
    filter-per-param formulation made the 17-param Project ~20x
    slower)."""
    return F.element_at(qs_map, F.lit(key))


def _valid_identifier(col: Column) -> Column:
    return F.when(col.rlike(_IDENTIFIER_RE), col)


def parse_browser_events_expr(
    requests: DataFrame,
    qs_col: str = "query_string",
    request_time_col: str | None = "request_time",
    keep_incomplete: bool = False,
    use_x_forwarded_for: bool = False,
    xff_col: str = "x_forwarded_for",
) -> DataFrame:
    """Pure-expression decode of the browser wire protocol (the
    original implementation, kept as the differential twin of
    :func:`parse_browser_events` — tests pin both paths equal row for
    row over the adversarial wire corpus).

    It is correct but interpreted: the non-deterministic ``_once``
    guard that forces the query-string parse to run exactly once per
    row also pins every downstream Project/Filter OUT of whole-stage
    codegen, so the 17-field projection evaluates tree-walking
    expressions per row (~0.8 s at sf0.1 with zero Python in the
    plan). The Arrow decoder in :func:`parse_browser_events` replaces
    all of it with one Python crossing.

    Incomplete requests (missing required params) are dropped unless
    ``keep_incomplete`` (then flagged ``incomplete_request``).

    With ``use_x_forwarded_for`` (ServerConfiguration.java
    ``use_x_forwarded_for``, default false like the reference) and an
    ``xff_col`` present on the raw frame, ``remote_host`` is replaced
    by the last entry of the last X-Forwarded-For line before decode
    (ProxyAdjacentPeerAddressHandler.java:40-58) — so geo-IP and every
    downstream consumer see the client address, not the proxy's.
    """
    if (
        use_x_forwarded_for
        and xff_col in requests.columns
        and "remote_host" in requests.columns
    ):
        from divolte_collector_spark.functions.headers import xff_remote_host

        requests = requests.withColumn(
            "remote_host",
            xff_remote_host(F.col(xff_col), F.col("remote_host")),
        )
    # shuffle() of a 1-element array is the identity, but shuffle is
    # non-deterministic, which makes the whole guarded expression
    # non-deterministic. That (a) stops CollapseProject from inlining
    # the (interpreted, higher-order-function) parse into every
    # downstream column reference and (b) stops PushDownPredicate from
    # substituting it into the completeness filter's conjuncts — Spark
    # splits AND-ed predicates and pushes the deterministic conjuncts,
    # so guarding only the filter is not enough (measured: the pushed
    # filter re-ran the parse ~8x per row and the duplicated trees blew
    # up codegen compile time). A `rand() >= -1` guard does NOT work:
    # Spark 4 constant-folds comparisons against rand()'s value range,
    # erasing the marker. With this, the wire format is parsed exactly
    # once per row and every later access is an O(1) map lookup.
    def _once(col: Column) -> Column:
        return F.element_at(F.shuffle(F.array(col)), F.lit(1))

    requests = drop_etag_replays(requests)
    entries = qs_entries(F.col(qs_col))
    ev = requests.withColumn("_entries", _once(entries))
    # first wire occurrence wins, deduplicated IN-EXPRESSION: relying on
    # spark.sql.mapKeyDedupPolicy=LAST_WIN (a session conf) made a
    # single duplicated wire param kill the whole batch under the
    # default EXCEPTION policy on any externally-built session. Keeping
    # entry i only when no earlier entry shares its key makes
    # map_from_entries duplicate-free under ANY policy.
    # a key that fails URL decoding ('a%zz=1') is null after
    # try_url_decode: drop the entry — the param is simply absent, as
    # in qs_multimap — or map_from_entries raises NULL_MAP_KEY and ONE
    # garbage request kills the whole batch (found by the adversarial
    # wire fuzz; the reference's parser likewise never fails the
    # request stream on an undecodable param).
    dedup = F.filter(
        F.col("_entries"),
        lambda e, i: e.key.isNotNull()
        & ~F.exists(
            F.slice(F.col("_entries"), F.lit(1), i),
            lambda prev: prev.key.eqNullSafe(e.key),
        ),
    )
    ev = ev.withColumn("_qs_map", _once(F.map_from_entries(dedup)))
    e = F.col("_qs_map")

    party_id = _valid_identifier(_first_value(e, "p"))
    session_id = _valid_identifier(_first_value(e, "s"))
    client_ts = try_parse_base36_long(_first_value(e, "c"))

    required_ok = (
        party_id.isNotNull()
        & session_id.isNotNull()
        & _first_value(e, "v").isNotNull()
        & _first_value(e, "e").isNotNull()
        & _first_value(e, "n").isNotNull()
        & _first_value(e, "f").isNotNull()
        & client_ts.isNotNull()
    )

    # verdict: signed murmur3_32(canonical) == base36('x'), absent or
    # unparseable 'x' => incorrect (.orElse(false),
    # ClientSideCookieEventHandler.java:233); kept + flagged, not dropped.
    # The whole verdict (param decode, canonical sort/render, murmur3,
    # base36 compare) runs in ONE single-argument Arrow UDF over the raw
    # query string, fused by ExtractPythonUDFs into the same
    # ArrowEvalPython stage as the mincode decode — one Python crossing
    # for the row. The earlier JVM-side canonical fold
    # (canonical_checksum_string over the entries array) produced a
    # ~16 s codegen/analysis fixed cost on first execution of the plan
    # and an interpreted O(n) fold per row; the verdict itself is the
    # only consumer, so it moved into Python wholesale.
    checksum_ok = is_checksum_correct(F.col(qs_col))
    out = ev.select(
        "*",
        (~checksum_ok).alias("corrupt_event"),
        party_id.alias("party_id"),
        session_id.alias("session_id"),
        _first_value(e, "e").alias("event_id"),
        F.lit("browser").alias("event_source"),
        _first_value(e, "t").alias("event_type"),
        (_first_value(e, "n") == _TRUE_STRING).alias("new_party_id"),
        (_first_value(e, "f") == _TRUE_STRING).alias("first_in_session"),
        F.timestamp_millis(client_ts).alias("client_time"),
        mincode_to_json_udf()(_first_value(e, "u")).alias("event_parameters"),
        F.struct(
            _first_value(e, "v").alias("page_view_id"),
            _first_value(e, "l").alias("location"),
            _first_value(e, "r").alias("referer"),
            try_parse_base36_int(_first_value(e, "w")).alias("viewport_pixel_width"),
            try_parse_base36_int(_first_value(e, "h")).alias("viewport_pixel_height"),
            try_parse_base36_int(_first_value(e, "i")).alias("screen_pixel_width"),
            try_parse_base36_int(_first_value(e, "j")).alias("screen_pixel_height"),
            try_parse_base36_int(_first_value(e, "k")).alias("device_pixel_ratio"),
        ).alias("browser"),
        required_ok.alias("_complete"),
    ).drop("_qs_map", "_entries")

    if request_time_col and request_time_col in requests.columns:
        out = out.withColumn("request_start_time", F.col(request_time_col))

    if keep_incomplete:
        return out.withColumn("incomplete_request", ~F.col("_complete")).drop("_complete")
    # Safe to let Catalyst push this: the conjuncts land just above the
    # (non-deterministic) map-building Project and evaluate as O(1)
    # lookups on the materialized map.
    return out.filter(F.col("_complete")).drop("_complete")


# --- Arrow-batched decode (the production path) -------------------------------

#: decoded columns appended by the wire decoder, in output order.
#: ``_client_ms``/``_b_*`` are internal: the JVM projection turns them
#: into ``client_time`` (timestamp_millis) and the ``browser`` struct.
_DECODED_FIELDS: "list[tuple[str, str]]" = [
    ("corrupt_event", "boolean"),
    ("party_id", "string"),
    ("session_id", "string"),
    ("event_id", "string"),
    ("event_type", "string"),
    ("new_party_id", "boolean"),
    ("first_in_session", "boolean"),
    ("_client_ms", "long"),
    ("event_parameters", "string"),
    ("_b_page_view_id", "string"),
    ("_b_location", "string"),
    ("_b_referer", "string"),
    ("_b_viewport_w", "int"),
    ("_b_viewport_h", "int"),
    ("_b_screen_w", "int"),
    ("_b_screen_h", "int"),
    ("_b_dpr", "int"),
    ("_complete", "boolean"),
]

import re as _re
from functools import lru_cache as _lru_cache

_ID_RE_PY = _re.compile(_IDENTIFIER_RE)


# Only payloads below this length are memoized: the cache exists for
# repeated page-template params (short), and an unbounded per-entry
# size would let adversarial large ``u=`` payloads pin up to
# 65536 × payload bytes in every long-lived Python worker.
_MINCODE_CACHE_MAX_LEN = 4096


@_lru_cache(maxsize=1 << 16)
def _mincode_to_json_cached(code: "str | None") -> "str | None":
    """Memoized mincode decode: event-parameter payloads repeat heavily
    on a real wire (same page templates emit the same ``u=``), and the
    decode is a pure function of the string. Same precedent as the
    user-agent parser's lru cache (functions/useragent.py)."""
    from divolte_collector_spark.functions.mincode import mincode_to_json

    return mincode_to_json(code)


def _mincode_to_json(code: "str | None") -> "str | None":
    if code is not None and len(code) >= _MINCODE_CACHE_MAX_LEN:
        from divolte_collector_spark.functions.mincode import mincode_to_json

        return mincode_to_json(code)
    return _mincode_to_json_cached(code)


def decode_wire_batch(qs_values: "list[str | None]") -> "dict[str, list]":
    """Decode one Arrow batch of raw ``/csc-event`` query strings into
    every DivolteEvent field at once — a single Python crossing for
    the whole wire protocol (strict param decode, first-occurrence
    dedup, identifier/base36 validation, mincode parameters, and the
    lenient-decode checksum verdict with the murmur3 run numpy-batched
    across the batch).

    Semantics are the exact twin of :func:`parse_browser_events_expr`
    (ClientSideCookieEventHandler.java:65-84,148-204):

    - param key = text before the FIRST ``=``; value = everything
      after it ('' when absent); both strictly URL-decoded
      (``try_url_decode_py`` == ``F.try_url_decode``);
    - a key that fails decoding never yields an entry; the FIRST
      occurrence of each decoded key wins (Undertow Deque head);
    - required params (p, s with identifier grammar; v, e, n, f
      present; c base36-parseable) gate ``_complete``;
    - the corruption verdict hashes the LENIENT decode
      (``unquote_plus``) of what was sent — divolte.js checksums the
      raw values it rendered, bad escapes and all (S4);
    - ``u`` mincode decode failure leaves parameters null, event kept.
    """
    from urllib.parse import unquote_plus

    from divolte_collector_spark.functions.base36 import (
        try_parse_base36_int_py,
        try_parse_base36_long_py,
    )
    from divolte_collector_spark.functions.checksum import (
        CHECKSUM_PARAM,
        _try_parse_base36_py,
        render_canonical,
    )
    from divolte_collector_spark.functions.murmur import murmur3_32_signed_batch
    from divolte_collector_spark.functions.querystring import try_url_decode_py

    n = len(qs_values)
    out: "dict[str, list]" = {name: [None] * n for name, _ in _DECODED_FIELDS}
    canons: "list[str | None]" = [None] * n
    expecteds: "list[int | None]" = [None] * n
    # local refs: ~18 dict lookups/row add up at 10^5-row batches
    party_c, session_c = out["party_id"], out["session_id"]
    cms_c, eid_c, et_c = out["_client_ms"], out["event_id"], out["event_type"]
    np_c, fis_c = out["new_party_id"], out["first_in_session"]
    params_c, complete_c = out["event_parameters"], out["_complete"]
    pv_c, loc_c, ref_c = out["_b_page_view_id"], out["_b_location"], out["_b_referer"]
    vw_c, vh_c = out["_b_viewport_w"], out["_b_viewport_h"]
    sw_c, sh_c, dpr_c = out["_b_screen_w"], out["_b_screen_h"], out["_b_dpr"]

    for i, qs in enumerate(qs_values):
        first: "dict[str, str | None]" = {}
        if qs is not None:
            # ONE split pass feeds both decodes. Clean tokens (no '%',
            # no '+') are identical under the strict (try_url_decode)
            # and lenient (unquote_plus) decoders — the overwhelming
            # wire case — so each is decoded at most once.
            lenient_pairs: "list[tuple[str, str]]" = []
            x_val: "str | None" = None
            for part in qs.split("&"):
                k_raw, _, v_raw = part.partition("=")
                k_clean = "%" not in k_raw and "+" not in k_raw
                v_clean = "%" not in v_raw and "+" not in v_raw
                lk = k_raw if k_clean else unquote_plus(k_raw)
                lv = v_raw if v_clean else unquote_plus(v_raw)
                if lk == CHECKSUM_PARAM:
                    if x_val is None:
                        x_val = lv
                else:
                    lenient_pairs.append((lk, lv))
                sk = k_raw if k_clean else try_url_decode_py(k_raw)
                if sk is None or sk in first:
                    continue
                first[sk] = v_raw if v_clean else try_url_decode_py(v_raw)
            # canonical string render is the SHARED helper
            # (checksum.render_canonical) — only the single-split
            # lenient decode above stays inlined here
            expected = _try_parse_base36_py(x_val)
            if expected is not None:
                expecteds[i] = expected
                canons[i] = render_canonical(lenient_pairs)
        p = first.get("p")
        s = first.get("s")
        if p is not None and _ID_RE_PY.match(p):
            party_c[i] = p
        if s is not None and _ID_RE_PY.match(s):
            session_c[i] = s
        cms = try_parse_base36_long_py(first.get("c"))
        cms_c[i] = cms
        eid_c[i] = first.get("e")
        et_c[i] = first.get("t")
        nv = first.get("n")
        fv = first.get("f")
        np_c[i] = None if nv is None else nv == _TRUE_STRING
        fis_c[i] = None if fv is None else fv == _TRUE_STRING
        params_c[i] = _mincode_to_json(first.get("u"))
        pv_c[i] = first.get("v")
        loc_c[i] = first.get("l")
        ref_c[i] = first.get("r")
        vw_c[i] = try_parse_base36_int_py(first.get("w"))
        vh_c[i] = try_parse_base36_int_py(first.get("h"))
        sw_c[i] = try_parse_base36_int_py(first.get("i"))
        sh_c[i] = try_parse_base36_int_py(first.get("j"))
        dpr_c[i] = try_parse_base36_int_py(first.get("k"))
        complete_c[i] = (
            party_c[i] is not None
            and session_c[i] is not None
            and first.get("v") is not None
            and first.get("e") is not None
            and nv is not None
            and fv is not None
            and cms is not None
        )

    hashes = murmur3_32_signed_batch(canons)
    out["corrupt_event"] = [
        c is None or h != e for c, e, h in zip(canons, expecteds, hashes)
    ]
    return out


def parse_browser_events(
    requests: DataFrame,
    qs_col: str = "query_string",
    request_time_col: str | None = "request_time",
    keep_incomplete: bool = False,
    use_x_forwarded_for: bool = False,
    xff_col: str = "x_forwarded_for",
) -> DataFrame:
    """Decode the browser wire protocol into DivolteEvent columns.

    Same contract as :func:`parse_browser_events_expr` (which tests
    pin as its row-for-row differential twin); the implementation is
    ONE Arrow-batched ``mapInPandas`` crossing that computes every
    decoded field at once (:func:`decode_wire_batch`), followed by a
    codegen-friendly JVM projection for ``client_time`` and the
    ``browser`` struct. Rationale: the expression decode is correct
    but uncompiled — its non-determinism guard (required to stop
    CollapseProject re-running the parse per field) also excludes the
    whole pipeline from whole-stage codegen, so the interpreted
    17-field projection cost ~0.8 s at sf0.1; this path decodes the
    same batch in ~0.25 s and scales with partitions, not plan shape.

    Works identically over batch and Structured Streaming frames
    (mapInPandas is supported in both); all input columns pass
    through untouched.
    """
    if (
        use_x_forwarded_for
        and xff_col in requests.columns
        and "remote_host" in requests.columns
    ):
        from divolte_collector_spark.functions.headers import xff_remote_host

        requests = requests.withColumn(
            "remote_host",
            xff_remote_host(F.col(xff_col), F.col("remote_host")),
        )
    requests = drop_etag_replays(requests)

    from pyspark.sql import types as T

    in_fields = list(requests.schema.fields)
    in_names = [f.name for f in in_fields]
    _SPARK_T = {
        "boolean": T.BooleanType(),
        "string": T.StringType(),
        "long": T.LongType(),
        "int": T.IntegerType(),
    }
    out_schema = T.StructType(
        in_fields
        + [T.StructField(nm, _SPARK_T[tp]) for nm, tp in _DECODED_FIELDS]
    )

    def _decode(batches):
        import pandas as pd

        for pdf in batches:
            decoded = decode_wire_batch(
                [None if v is None else str(v) for v in pdf[qs_col]]
            )
            for nm, _ in _DECODED_FIELDS:
                pdf[nm] = pd.Series(decoded[nm], index=pdf.index, dtype=object)
            yield pdf

    decoded = requests.mapInPandas(_decode, schema=out_schema)
    browser_struct = F.struct(
        F.col("_b_page_view_id").alias("page_view_id"),
        F.col("_b_location").alias("location"),
        F.col("_b_referer").alias("referer"),
        F.col("_b_viewport_w").alias("viewport_pixel_width"),
        F.col("_b_viewport_h").alias("viewport_pixel_height"),
        F.col("_b_screen_w").alias("screen_pixel_width"),
        F.col("_b_screen_h").alias("screen_pixel_height"),
        F.col("_b_dpr").alias("device_pixel_ratio"),
    )
    out = decoded.select(
        *in_names,
        "corrupt_event",
        "party_id",
        "session_id",
        "event_id",
        F.lit("browser").alias("event_source"),
        "event_type",
        "new_party_id",
        "first_in_session",
        F.timestamp_millis(F.col("_client_ms")).alias("client_time"),
        "event_parameters",
        browser_struct.alias("browser"),
        "_complete",
    )
    if request_time_col and request_time_col in requests.columns:
        out = out.withColumn("request_start_time", F.col(request_time_col))
    if keep_incomplete:
        return out.withColumn(
            "incomplete_request", ~F.col("_complete")
        ).drop("_complete")
    return out.filter(F.col("_complete")).drop("_complete")
