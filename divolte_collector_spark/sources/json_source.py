"""JSON event source (reference S2): ``POST {eventPath}?p=<partyId>``
with a snake_case JSON body (JsonEventHandler.java:97-183,
EventContainer at :162-183).

Body fields: ``event_type?``, ``session_id!``, ``event_id!``,
``is_new_party!``, ``is_new_session!``, ``client_timestamp_iso!``
(ISO-8601 offset datetime), ``parameters?`` (arbitrary JSON).

Semantics preserved:
- missing required fields / unparseable body / bad party id => event
  dropped (the handler answers 400, JsonEventHandler.java:128-159);
- no corruption checksum: hardcoded ``false``
  (DivolteEvent.java:183);
- oversized bodies (default max 4096 bytes,
  JsonSourceConfiguration.java:34-52) => dropped, surfaced via the
  ``max_body_bytes`` argument.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_MAXIMUM_BODY_SIZE = 4096  # JsonSourceConfiguration.java:34

_BODY_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("session_id", T.StringType()),
        T.StructField("event_id", T.StringType()),
        T.StructField("is_new_party", T.BooleanType()),
        T.StructField("is_new_session", T.BooleanType()),
        T.StructField("client_timestamp_iso", T.StringType()),
    ]
)

_IDENTIFIER_RE = r"^0:[0-9a-z]+:.+$"

# ISO_OFFSET_DATE_TIME shape (JsonEventHandler.java:148 parses the
# field with java.time's ISO offset format). Grammar pinned against
# java 17 empirically: case-INsensitive 'T'/'Z', seconds (and their
# <=9-digit fraction) OPTIONAL, offset one of Z / +-HH / +-HH:MM /
# +-HH:MM:SS — but NOT colon-less +-HHMM (java rejects it even though
# Spark's lenient parser would accept it). Without this guard Spark's
# try_to_timestamp also accepts bare digits like "12345" as YEAR
# 12345 — a timestamp that overflows client datetimes downstream.
# Deliberate divergence: java's expanded years (+12024-...) are
# excluded too, same overflow rationale (README divergence table).
_ISO_OFFSET_RE = (
    r"^\d{4}-\d{2}-\d{2}[Tt]\d{2}:\d{2}(:\d{2}(\.\d{1,9})?)?"
    r"([Zz]|[+-]\d{2}(:\d{2}(:\d{2})?)?)$"
)


def parse_json_events(
    requests: DataFrame,
    body_col: str = "body",
    party_id_col: str = "party_id_param",
    request_time_col: str | None = "request_time",
    max_body_bytes: int = DEFAULT_MAXIMUM_BODY_SIZE,
    keep_incomplete: bool = False,
) -> DataFrame:
    """Decode JSON-source requests into DivolteEvent columns."""
    body = F.col(body_col)
    # Stage the body parse ONCE as a struct column. Referencing
    # ``from_json(body).field`` per output column looks the same but
    # is 9 independent parses per row: OptimizeJsonExprs prunes each
    # reference to its own single-field schema, making the subtrees
    # unequal so codegen subexpression elimination cannot merge them.
    # The staged column is non-cheap and multiply-referenced, so
    # CollapseProject keeps the two projections separate (one parse),
    # and the parse cost drops ~7x on the sf0.1 roundtrip gate.
    # collision-safe staged name: an input that already carries `_r`
    # would otherwise make every `F.col(staged)` reference ambiguous
    staged_name = "_r"
    while staged_name in requests.columns:
        staged_name += "_"
    staged = requests.select(
        "*", F.from_json(body, _BODY_SCHEMA).alias(staged_name)
    )
    parsed = F.col(staged_name)
    # ISO-8601 offset datetime, e.g. 2024-01-02T03:04:05.678+02:00;
    # bad input => null => request dropped (400). Two java-isms Spark's
    # parser lacks are normalized first: lowercase 't'/'z' (those
    # letters cannot occur elsewhere in the accepted grammar, so a
    # blanket translate is safe) and minute-precision times, which get
    # an explicit ':00' seconds leg spliced in before the offset.
    iso_norm = F.regexp_replace(
        F.translate(parsed.client_timestamp_iso, "tz", "TZ"),
        r"^(\d{4}-\d{2}-\d{2}T\d{2}:\d{2})(?=Z|[+-])",
        "$1:00",
    )
    client_time = F.when(
        parsed.client_timestamp_iso.rlike(_ISO_OFFSET_RE),
        F.try_to_timestamp(iso_norm),
    )
    party_ok = F.col(party_id_col).rlike(_IDENTIFIER_RE)
    session_ok = parsed.session_id.rlike(_IDENTIFIER_RE)

    required_ok = (
        (F.octet_length(body) <= max_body_bytes)
        & party_ok
        & session_ok
        & parsed.event_id.isNotNull()
        & parsed.is_new_party.isNotNull()
        & parsed.is_new_session.isNotNull()
        & client_time.isNotNull()
    )

    out = staged.select(
        *requests.columns,
        F.lit(False).alias("corrupt_event"),  # DivolteEvent.java:183
        F.col(party_id_col).alias("party_id"),
        parsed.session_id.alias("session_id"),
        parsed.event_id.alias("event_id"),
        F.lit("json").alias("event_source"),
        parsed.event_type.alias("event_type"),
        parsed.is_new_party.alias("new_party_id"),
        parsed.is_new_session.alias("first_in_session"),
        client_time.alias("client_time"),
        # NOT get_json_object: that unquotes string leaves ("x" -> x),
        # yielding non-JSON text for scalar parameters. The reference
        # keeps parameters as an arbitrary JsonNode re-serialized as
        # valid JSON (EventContainer, JsonEventHandler.java:162-183);
        # variant_get -> to_json preserves that for every JSON type.
        F.to_json(
            F.variant_get(F.try_parse_json(body), "$.parameters", "variant")
        ).alias("event_parameters"),
        # null-safe: octet_length(NULL)/rlike(NULL) propagate NULL, and
        # a NULL _complete row would vanish from BOTH filter(col) and
        # filter(~col) — an unparseable request is simply incomplete.
        # The spark_partition_id() CASE wrapper (always >= 0, so the
        # value is unchanged) marks the column non-deterministic: left
        # deterministic, PushDownPredicates clones the ENTIRE
        # completeness check — six from_json parses, the ISO regex,
        # try_to_timestamp — below every upstream operator when the
        # caller filters on _complete (measured 6.5 s vs 0.6 s on the
        # sf0.1 roundtrip gate, where the clone landed below the
        # exchange on the serial scan task and re-derived the body per
        # conjunct). Nothing real is lost: the predicate depends on
        # the parsed body, so it could never prune a scan anyway.
        F.when(
            F.spark_partition_id() >= 0,
            F.coalesce(required_ok, F.lit(False)),
        ).otherwise(F.lit(False)).alias("_complete"),
    )
    if request_time_col and request_time_col in requests.columns:
        out = out.withColumn("request_start_time", F.col(request_time_col))
    if keep_incomplete:
        return out.withColumn("incomplete_request", ~F.col("_complete")).drop("_complete")
    return out.filter(F.col("_complete")).drop("_complete")
