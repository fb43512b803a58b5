"""Multimodal binary-column operators: mapInPandas plumbing, frame
sampling math, stubbed codec behavior."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from divolte_collector_spark.operators.multimodal import (
    decode_image,
    deterministic_features,
    documents_as_media,
    extract_features,
    frame_sample,
)


def _media(spark):
    docs = spark.createDataFrame(
        [(1, "a" * 40, "en", "web", 40), (2, "short", "la", "book", 5)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    return documents_as_media(docs)


def test_media_schema_and_metadata(spark):
    rows = {r.media_id: r for r in _media(spark).collect()}
    assert bytes(rows[1].payload) == b"a" * 40
    assert rows[1].meta.mime == "text/en"
    assert rows[1].meta.n_frames == 2  # 40 // 16
    assert rows[2].meta.mime == "text/la"


def test_extract_features_deterministic(spark):
    feats = {r.media_id: r for r in extract_features(_media(spark)).collect()}
    payload = b"a" * 40
    assert feats[1].byte_len == 40
    assert feats[1].sha == hashlib.sha256(payload).hexdigest()
    assert feats[1].mean_byte == pytest.approx(ord("a"))
    assert feats[1].feature == pytest.approx(deterministic_features(payload))
    assert len(feats[1].feature) == 8


def test_frame_sample_every_nth(spark):
    frames = frame_sample(_media(spark), every_nth=2, frame_bytes=16).collect()
    by_media = {}
    for r in frames:
        by_media.setdefault(r.media_id, []).append(r)
    # 40 bytes -> 2 full frames -> keep frame 0 only; 5 bytes -> none
    assert [r.frame_no for r in by_media[1]] == [0]
    assert bytes(by_media[1][0].frame) == b"a" * 16
    assert 2 not in by_media


def test_decode_image_is_stubbed():
    # PIL is absent in this environment: the codec step must raise the
    # documented NotImplementedError, not fail obscurely.
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL available here; stub not applicable")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG fake")
