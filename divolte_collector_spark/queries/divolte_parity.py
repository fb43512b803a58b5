"""Driver-gated parity queries for reference-mandated operators that
are expressible over the driver's tables (identifiers, query-string
multimap, duplicate flagging, base36 wire codec).

The deeper wire-protocol operators (mincode, checksum, digests,
mapping DSL) are exercised by the pytest fixture corpus in tests/ —
they need synthetic wire events, not the analytic tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from divolte_collector_spark.functions.identifiers import (
    identifier_timestamp,
    make_identifier,
)
from divolte_collector_spark.functions.querystring import (
    qs_multimap,
    qs_value,
    qs_value_list,
)
from divolte_collector_spark.queries import query
from divolte_collector_spark.session import load_table


# --- C1: identifier build + parse roundtrip ---------------------------------

_ID_ORACLE = """
SELECT event_id,
       '0:' || lower(to_base(epoch_ms(ts), 36)) || ':' || CAST(event_id AS VARCHAR)
           AS party_id,
       epoch_ms(ts) AS recovered_ms
FROM events
"""


@query("divolte_identifier_roundtrip", oracle=_ID_ORACLE)
def q_identifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a DivolteIdentifier from (ts, event_id) and parse its
    timestamp back out.  The oracle computes recovered_ms directly
    from ts — so a Spark-side parse bug breaks the hash match."""
    ev = load_table(spark, sf_dir, "events")
    pid = make_identifier(F.unix_millis(F.col("ts")), F.col("event_id"))
    return ev.select(
        "event_id",
        pid.alias("party_id"),
    ).select(
        "event_id",
        "party_id",
        identifier_timestamp(F.col("party_id")).alias("recovered_ms"),
    )


# --- §2.6: query-string multimap parsing ------------------------------------

_QS_ORACLE = """
SELECT event_id,
       '/p/' || event_type AS path,
       CAST(user_id AS VARCHAR) AS uid_first,
       CAST(2 AS INT) AS v_count,
       CAST(event_id AS VARCHAR) AS v_first,
       json_extract_string(props, '$.k') AS v_last
FROM events
"""


@query("querystring_multimap", oracle=_QS_ORACLE)
def q_querystring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Construct a synthetic URL per event, then recover every field
    exclusively by *parsing* it with the engine's URI + multimap
    operators.  The oracle emits the ground-truth values directly, so
    any parser defect (ordering, multi-value handling, decoding)
    breaks the match."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k")
    url = F.concat(
        F.lit("https://shop.example.com/p/"),
        F.col("event_type"),
        F.lit("?uid="),
        F.col("user_id").cast("string"),
        F.lit("&et="),
        F.col("event_type"),
        F.lit("&v="),
        F.col("event_id").cast("string"),
        F.lit("&v="),
        k,
    )
    with_url = ev.select("event_id", url.alias("url"))
    qs = F.parse_url(F.col("url"), F.lit("QUERY"))
    m = qs_multimap(qs)
    return with_url.select(
        "event_id",
        F.parse_url(F.col("url"), F.lit("PATH")).alias("path"),
        qs_value(m, "uid").alias("uid_first"),
        F.size(qs_value_list(m, "v")).cast("int").alias("v_count"),
        F.element_at(qs_value_list(m, "v"), 1).alias("v_first"),
        F.element_at(qs_value_list(m, "v"), -1).alias("v_last"),
    )


# --- C6/C7: duplicate flagging (exact batch semantics) ----------------------

_DUP_ORACLE = """
WITH flagged AS (
    SELECT event_id,
           count(*) OVER (PARTITION BY user_id, json_extract_string(props, '$.k'))
               AS n_key
    FROM events
)
SELECT CAST(coalesce(sum(CASE WHEN n_key > 1 THEN 1 END), 0) AS BIGINT) AS n_duplicates,
       CAST(count(*) AS BIGINT) AS n_events
FROM flagged
"""


@query("duplicate_flagging", oracle=_DUP_ORACLE)
def q_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch analogue of ShortTermDuplicateMemory (reference C6): flag
    events whose identity key occurs more than once.  The streaming
    path uses dropDuplicatesWithinWatermark (exact, stronger than the
    reference's probabilistic slot array) — see streaming/ingest.py."""
    ev = load_table(spark, sf_dir, "events")
    key = F.get_json_object(F.col("props"), "$.k")
    w = Window.partitionBy(F.col("user_id"), key)
    flagged = ev.select(
        "event_id", F.count(F.lit(1)).over(w).alias("n_key")
    )
    return flagged.agg(
        F.coalesce(F.sum(F.when(F.col("n_key") > 1, 1)), F.lit(0))
        .cast("long")
        .alias("n_duplicates"),
        F.count(F.lit(1)).alias("n_events"),
    )
