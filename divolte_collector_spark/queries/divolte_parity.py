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


@query(
    "event_querystring_multimap",
    oracle=_QS_ORACLE,
    aliases=("querystring_multimap",),
)
def q_querystring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Construct a synthetic URL per event, then recover every field
    exclusively by *parsing* it with the engine's URI + multimap
    operators.  The oracle emits the ground-truth values directly, so
    any parser defect (ordering, multi-value handling, decoding)
    breaks the match.

    Two measured fixes at sf0.1 (3.1 s -> sub-second): spread the
    single-file scan (the interpreted higher-order multimap otherwise
    evaluates serially in one task), and stage the multimap ONCE in
    its own projection — the three accessor expressions each inlined
    the whole parse, and CollapseProject keeps the barrier because the
    staged column is non-cheap and multiply-referenced."""
    from divolte_collector_spark.session import spread_scan

    ev = spread_scan(load_table(spark, sf_dir, "events"), F.col("event_id"))
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
    qs = F.try_parse_url(F.col("url"), F.lit("QUERY"))
    # stage the multimap once; downstream accessors read the staged
    # column, so the interpreted parse runs once per row, not 3x
    staged = with_url.select(
        "event_id",
        F.try_parse_url(F.col("url"), F.lit("PATH")).alias("path"),
        qs_multimap(qs).alias("_m"),
    )
    m = F.col("_m")
    return staged.select(
        "event_id",
        "path",
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


# --- C6: slot-array duplicate memory, exact sequential semantics ------------

_SLOTMEM_ORACLE = """
WITH base AS (
    SELECT event_id AS seq,
           'p' || CAST(user_id AS VARCHAR) || 's' || CAST(user_id AS VARCHAR)
               || 'e' || CAST(event_id AS VARCHAR) AS ident
    FROM events
),
replayed AS (
    SELECT * FROM base
    UNION ALL
    SELECT seq + 10000000 AS seq, ident FROM base WHERE seq % 7 = 0
),
hashed AS (
    SELECT seq,
           substr(md5(ident), 1, 2)  AS slot,
           substr(md5(ident), 17, 16) AS signature
    FROM replayed
),
flagged AS (
    SELECT seq,
           COALESCE(lag(signature) OVER (PARTITION BY slot ORDER BY seq)
                    = signature, FALSE) AS dup
    FROM hashed
)
SELECT CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
FROM flagged
"""


@query("dup_memory_slot_emulation", oracle=_SLOTMEM_ORACLE)
def q_slot_memory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ShortTermDuplicateMemory's exact sequential data-structure
    semantics (reference C6, ShortTermDuplicateMemory.java:139-178),
    distributed: duplicate(e) == (the most recent earlier event hashing
    to e's slot carried e's signature), i.e. a lag window partitioned
    by slot — one shuffle on a hash-uniform key, no sequential state.

    Every 7th event is replayed after the base stream; with 256 slots
    and ~10k+ events most slots get overwritten between occurrence and
    replay, exercising the structure's false-negative behavior (kept,
    like the reference: the array ALWAYS overwrites).  This portable
    variant derives slot/signature from md5 so DuckDB replays the
    identical process; the murmur3_128-faithful variant (Guava
    UTF-16LE ``putUnencodedChars``, low-int slot, high-long signature)
    is operators/dupmemory.py, pinned bit-exact by
    tests/test_dupmemory.py against a sequential replica."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        F.col("event_id").alias("seq"),
        F.concat(
            F.lit("p"), F.col("user_id"), F.lit("s"), F.col("user_id"),
            F.lit("e"), F.col("event_id"),
        ).alias("ident"),
    )
    replayed = base.unionByName(
        base.filter(F.col("seq") % 7 == 0).select(
            (F.col("seq") + 10_000_000).alias("seq"), "ident"
        )
    )
    hashed = replayed.select(
        "seq",
        F.substring(F.md5("ident"), 1, 2).alias("slot"),
        F.substring(F.md5("ident"), 17, 16).alias("signature"),
    )
    w = Window.partitionBy("slot").orderBy("seq")
    flagged = hashed.select(
        F.coalesce(
            F.lag("signature").over(w) == F.col("signature"), F.lit(False)
        ).alias("dup")
    )
    return flagged.agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(F.col("dup"), 1).otherwise(0)).cast("long").alias("n_flagged"),
    )
