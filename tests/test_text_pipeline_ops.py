"""Adversarial edges of the round-6 text-pipeline operators:
corpus-wide line dedup, BPE apply/encode, the integer-exact linear
quality gate, and domain-suffix blocklist matching."""

from __future__ import annotations

from pyspark.sql import functions as F

from divolte_collector_spark.queries.clickstream import domain_suffix_chain
from divolte_collector_spark.queries.documents import (
    _QL_THRESHOLD_MILLI,
    _QL_WEIGHTS,
    bpe_encode_expr,
    segment_lines,
)


def _rows(df):
    return [tuple(r) for r in df.collect()]


# --- line dedup --------------------------------------------------------------


def test_segment_lines_fixed_windows(spark):
    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(23)))], "doc_id long, text string"
    )
    lines = _rows(segment_lines(docs).orderBy("line_no"))
    assert len(lines) == 3  # 10 + 10 + 3
    assert lines[0] == (1, 0, " ".join(f"w{i}" for i in range(10)))
    assert lines[2] == (1, 2, "w20 w21 w22")


def test_line_dedup_duplicate_doc_empties(spark):
    """An exact duplicate of an earlier doc loses ALL its lines but
    still appears in the output (empty text, n_kept 0) — keep-first
    semantics, no dropped rows."""
    text = " ".join(["tok"] * 5 + ["uniq"] * 5)  # one 10-word line
    docs = spark.createDataFrame(
        [(1, text), (2, text), (3, "fresh " * 9 + "fresh")],
        "doc_id long, text string",
    )
    lines = segment_lines(docs)
    kept = (
        lines.groupBy("line")
        .agg(F.min(F.struct("doc_id", "line_no")).alias("k"))
        .select(F.col("k.doc_id").alias("doc_id"))
    )
    by_doc = {r["doc_id"]: 1 for r in kept.collect()}
    assert 1 in by_doc and 3 in by_doc and 2 not in by_doc


def test_line_dedup_preserves_intra_doc_order(spark):
    """Surviving lines reassemble in original position order even when
    a MIDDLE line is deduplicated away."""
    l0, l1, l2 = ("a " * 9 + "a"), ("b " * 9 + "b"), ("c " * 9 + "c")
    docs = spark.createDataFrame(
        [(1, l1), (2, f"{l0} {l1} {l2}")], "doc_id long, text string"
    )
    lines = segment_lines(docs)
    kept = (
        lines.groupBy("line")
        .agg(F.min(F.struct("doc_id", "line_no")).alias("k"))
        .select(
            F.col("k.doc_id").alias("doc_id"),
            F.col("k.line_no").alias("line_no"),
            "line",
        )
    )
    re2 = (
        kept.filter(F.col("doc_id") == 2)
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("line_no", "line"))),
                    lambda s: s.getField("line"),
                ),
                " ",
            ).alias("text_deduped")
        )
        .collect()[0]["text_deduped"]
    )
    assert re2 == f"{l0} {l2}"  # middle line owned by doc 1


# --- BPE apply ---------------------------------------------------------------


def _encode(spark, word, merges):
    df = spark.createDataFrame([(word,)], "w string")
    m = "␟"
    enc = bpe_encode_expr(F.col("w"), merges)
    readable = F.btrim(F.replace(enc, F.lit(m + m), F.lit(" ")), F.lit(m))
    return df.select(readable.alias("e")).collect()[0]["e"]


def test_bpe_apply_left_to_right_non_overlapping(spark):
    # BPE merges scan left-to-right without overlap: aaaa -> (aa)(aa),
    # aaa -> (aa)a
    assert _encode(spark, "aaaa", [("a", "a")]) == "aa aa"
    assert _encode(spark, "aaa", [("a", "a")]) == "aa a"


def test_bpe_apply_never_matches_across_symbol_boundary(spark):
    # after (b,a) -> "ba", the pair (a,t) must NOT merge the 'a' inside
    # symbol "ba" with the following 't'
    assert _encode(spark, "bat", [("b", "a"), ("a", "t")]) == "ba t"
    # without the earlier merge, (a,t) does apply
    assert _encode(spark, "bat", [("a", "t")]) == "b at"


def test_bpe_apply_rank_order_composes(spark):
    assert _encode(
        spark, "data", [("d", "a"), ("t", "a"), ("da", "ta")]
    ) == "data"
    # reversed rank: (t,a) first eats the 'a' that (da,ta) needed
    assert _encode(
        spark, "data", [("t", "a"), ("d", "a"), ("da", "ta")]
    ) == "data"


# --- integer-exact quality gate -----------------------------------------------


def test_quality_gate_exact_boundary(spark):
    """A document whose milli-weight sum equals exactly 20 * n_tokens
    must be keep=False (strict >) — the integer compare has no float
    rounding to blur the boundary."""
    # bucket of token t: (31 * len(t) + ascii(t)) % 16; find a token
    # with weight 20 is impossible (weights are fixed), so build a
    # 2-token doc whose weights sum to exactly 40: 55 + (-15)? not in
    # table — instead solve for pairs summing to 40: 320 + (-280) = 40.
    w = {v: i for i, v in enumerate(_QL_WEIGHTS)}
    assert 320 in w and -280 in w
    # token with bucket(320-index) and bucket(-280-index):
    # bucket = (31 * len + ascii(first)) % 16
    def tok_for_bucket(b):
        for length in range(1, 8):
            for c in range(97, 123):
                if (31 * length + c) % 16 == b:
                    return chr(c) * length
        raise AssertionError

    t1, t2 = tok_for_bucket(w[320]), tok_for_bucket(w[-280])
    docs = spark.createDataFrame(
        [(1, f"{t1} {t2}")], "doc_id long, text string"
    )
    # route through the same expression the query uses
    weights = F.array(*[F.lit(x) for x in _QL_WEIGHTS])
    toks = F.split(F.col("text"), " ")
    total = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: acc
        + F.element_at(weights, (F.length(t) * 31 + F.ascii(t)) % 16 + 1)
        .cast("long"),
    )
    row = docs.select(
        total.alias("s"),
        (total > _QL_THRESHOLD_MILLI * F.size(toks)).alias("keep"),
    ).collect()[0]
    assert row["s"] == 40 and row["keep"] is False


# --- domain blocklist ----------------------------------------------------------


def test_suffix_chain_and_blocklist_semantics(spark):
    df = spark.createDataFrame(
        [
            ("www.shop1.example.com", True),   # subdomain of blocked
            ("shop1.example.com", True),       # the blocked suffix itself
            ("notshop1.example.com", False),   # substring but NOT suffix
            ("shop1.example.com.evil.io", False),  # blocked name not at tail
            ("www.shop0.example.com", False),
        ],
        "host string, expect_blocked boolean",
    )
    blocked = F.array(F.lit("shop1.example.com"))
    out = df.select(
        "host",
        "expect_blocked",
        F.arrays_overlap(domain_suffix_chain(F.col("host")), blocked).alias(
            "blocked"
        ),
    ).collect()
    for r in out:
        assert r["blocked"] == r["expect_blocked"], r["host"]


def test_suffix_chain_contents(spark):
    df = spark.createDataFrame([("a.b.example.com",)], "host string")
    chain = df.select(
        domain_suffix_chain(F.col("host")).alias("c")
    ).collect()[0]["c"]
    assert chain == ["a.b.example.com", "b.example.com", "example.com", "com"]


# --- gap fill ------------------------------------------------------------------


def test_gap_fill_shapes(spark, tmp_path):
    """A user active on days 1 and 4 gets a 4-row dense spine with
    zeros on days 2-3 and a monotone days_since_active recency."""
    import datetime as dt

    rows = [
        (1, dt.datetime(2024, 1, 1, 10), 7, "view", 1.0, None),
        (2, dt.datetime(2024, 1, 4, 11), 7, "click", 2.0, None),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    from divolte_collector_spark.queries.clickstream import (
        q_timeseries_gap_fill,
    )

    out = {
        (r["day"].isoformat()): (r["n_events"], r["days_since_active"])
        for r in q_timeseries_gap_fill(spark, str(tmp_path)).collect()
    }
    assert out == {
        "2024-01-01": (1, 0),
        "2024-01-02": (0, 1),
        "2024-01-03": (0, 2),
        "2024-01-04": (1, 0),
    }
