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


def parse_browser_events(
    requests: DataFrame,
    qs_col: str = "query_string",
    request_time_col: str | None = "request_time",
    keep_incomplete: bool = False,
    use_x_forwarded_for: bool = False,
    xff_col: str = "x_forwarded_for",
) -> DataFrame:
    """Decode the browser wire protocol into DivolteEvent columns.

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
