"""Multimodal columns for training-data pipelines.

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct alongside; decode / feature-extract / resize /
frame-sample run as Arrow-batched ``mapInPandas`` stages so each
executor touches its partition's payloads without any driver
involvement — the only layout that survives 100 TB of media.

The actual codec step is STUBBED in this environment (PIL / torchaudio
/ ffmpeg are not installed): ``decode_image`` raises
``NotImplementedError`` unless a decoder is importable, and the
pipelines below use ``deterministic_features`` — a fake feature
extractor computed from the raw bytes — so the Spark-side plumbing
(schema, batching, partitioning, UDF signatures) is real and tested
while the codec remains a drop-in.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("sha", T.StringType()),
        T.StructField("mean_byte", T.DoubleType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def decode_image(payload: bytes):
    """Real decode path — requires an image codec.

    STUB: PIL is not available in this container; a deployment installs
    it and this function becomes ``Image.open(io.BytesIO(payload))``.
    """
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - environment-dependent
        raise NotImplementedError(
            "image decoding requires PIL; this environment stubs the codec "
            "step (deterministic_features is the tested path)"
        ) from exc
    import io

    from PIL import Image

    return Image.open(io.BytesIO(payload))


def deterministic_features(payload: bytes, dims: int = 8) -> list[float]:
    """Deterministic fake embedding from raw bytes: dims floats derived
    from the sha256 digest — stands in for a real encoder's output with
    the same shape/typing."""
    digest = hashlib.sha256(payload).digest()
    return [
        int.from_bytes(digest[4 * i : 4 * i + 4], "big") / 2**32
        for i in range(dims)
    ]


def extract_features(media: DataFrame, dims: int = 8) -> DataFrame:
    """payloads -> feature rows, one Arrow crossing per batch."""

    def go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [bytes(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "byte_len": [len(p) for p in payloads],
                    "sha": [hashlib.sha256(p).hexdigest() for p in payloads],
                    "mean_byte": [
                        (sum(p) / len(p)) if p else 0.0 for p in payloads
                    ],
                    "feature": [deterministic_features(p, dims) for p in payloads],
                }
            )

    return media.mapInPandas(go, FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_nth: int = 2, frame_bytes: int = 16) -> DataFrame:
    """"Video" frame sampling: treat the payload as fixed-size frames,
    keep every n-th — the partition-local slicing pattern a real
    ffmpeg-backed sampler would use (one output row per kept frame)."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_no", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                p = bytes(payload)
                n = len(p) // frame_bytes
                for i in range(0, n, every_nth):
                    ids.append(mid)
                    nos.append(i)
                    frames.append(p[i * frame_bytes : (i + 1) * frame_bytes])
            yield pd.DataFrame({"media_id": ids, "frame_no": nos, "frame": frames})

    return media.mapInPandas(go, out_schema)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Deterministic media synthesis over the driver's ``documents``
    table: payload = UTF-8 text bytes, metadata derived from columns.
    Keeps every multimodal query oracle-checkable (the oracle knows
    octet_length/sha256 of the same text)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.col("text").cast("binary").alias("payload"),
        F.struct(
            F.concat(F.lit("text/"), F.col("lang")).alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            # BYTE length, matching the payload the frames are cut
            # from: char length disagrees for any non-ASCII document
            (F.octet_length(F.col("text")) / 16).cast("int").alias(
                "n_frames"
            ),
        ).alias("meta"),
    )


def resize_nearest(
    media: DataFrame, target: int = 4, row_bytes: int = 16
) -> DataFrame:
    """Nearest-neighbor resize over the payload-as-byte-grid: the
    payload is a (H x row_bytes) grid (H = len // row_bytes) and the
    output thumbnail is target x target bytes picked at the standard
    NN index map (row floor(r*H/target), col floor(c*row_bytes/target)).
    Nearest-neighbor IS the real resize kernel; operating on the raw
    byte grid instead of decoded pixels is this environment's codec
    stub (decode_image above) — a deployment decodes first and feeds
    the pixel array through the same index map. One Arrow crossing per
    batch; payloads shorter than target rows are skipped (a real
    resizer errors on sub-target images; skipping keeps the stage
    total)."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("src_h", T.IntegerType()),
            T.StructField("thumb", T.StringType()),
        ]
    )

    def go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hs, thumbs = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                p = bytes(payload)
                h = len(p) // row_bytes
                if h < target:
                    continue
                vals = [
                    p[(r * h // target) * row_bytes
                      + (c * row_bytes // target)]
                    for r in range(target)
                    for c in range(target)
                ]
                ids.append(mid)
                hs.append(h)
                thumbs.append("[" + ",".join(str(v) for v in vals) + "]")
            yield pd.DataFrame(
                {"media_id": ids, "src_h": hs, "thumb": thumbs}
            )

    return media.mapInPandas(go, out_schema)
