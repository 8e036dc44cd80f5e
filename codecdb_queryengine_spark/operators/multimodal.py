"""Multimodal column handling: opaque binary payloads + typed metadata.

Driver-mandated extension.  Media (image/audio/video) rides as a `binary`
column with a metadata struct; decode/feature-extract runs as Arrow-batched
pandas functions over mapInPandas — the only sanctioned Python hot path.
The decode libs (PIL/ffmpeg/etc.) are not in this container, so decoding is
STUBBED behind `decode_stub` (deterministic md5-derived fake features); the
Spark-side plumbing — schema, batching, partition flow — is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),     # opaque encoded bytes
        StructField("meta_width", LongType()),
        StructField("meta_height", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("digest", StringType()),
        StructField("feature", ArrayType(DoubleType())),
    ]
)

FEATURE_DIM = 8


def decode_stub(payload: bytes) -> list[float]:
    """Deterministic fake 'decoded feature' — md5 bytes scaled to [0,1).

    Real deployments replace this with the actual decoder (PIL / torchaudio
    / pyav); the function signature (bytes -> fixed-dim list) is the
    contract the pipeline depends on.
    """
    if payload is None:
        raise NotImplementedError("decode of NULL payload")
    h = hashlib.md5(payload).digest()
    return [h[i] / 256.0 for i in range(FEATURE_DIM)]


def extract_features(media: DataFrame) -> DataFrame:
    """binary payload -> (n_bytes, digest, feature vector) via mapInPandas.

    Arrow-batched: each pandas batch is one partition slice; no per-row
    Python round trips.  Partitioning is preserved — at 100 TB this runs
    embarrassingly parallel on the scan, no shuffle.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "digest": payloads.map(lambda b: hashlib.md5(b).hexdigest()),
                    "feature": payloads.map(decode_stub),
                }
            )

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("meta_width", LongType()),
        StructField("meta_height", LongType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_payload", BinaryType()),
    ]
)


def resize(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image-resize plumbing: (payload, w, h) -> payload', w', h' via
    mapInPandas.  The pixel transform itself is STUBBED (no PIL in this
    container): the stand-in deterministically truncates/pads the payload
    to w·h bytes so output size tracks the requested dims and tests can
    pin the contract.  Swap `_resize_stub` for a real decoder in prod."""

    def _resize_stub(payload: bytes) -> bytes:
        target = width * height
        if payload is None:
            raise NotImplementedError("resize of NULL payload")
        return payload[:target].ljust(target, b"\0")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": pdf["payload"].map(_resize_stub),
                    "meta_width": width,
                    "meta_height": height,
                }
            )

    return media.mapInPandas(batches, schema=RESIZED_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 64, max_frames: int = 8) -> DataFrame:
    """Video frame-sampling plumbing: one media row explodes to ≤max_frames
    frame rows via mapInPandas (1→N fan-out inside the Arrow batch — no
    shuffle; downstream repartitions if frames need re-balancing).  Frame
    extraction is STUBBED as fixed-stride byte slices standing in for
    decoded frames; signature (payload → indexed frame payloads) is the
    real contract."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    raise NotImplementedError("frame_sample of NULL payload")
                n = min(max_frames, max(1, len(payload) // every_n_bytes))
                for i in range(n):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(payload[i * every_n_bytes : (i + 1) * every_n_bytes])
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_payload": frames}
            )

    return media.mapInPandas(batches, schema=FRAME_SCHEMA)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: treat documents.text utf-8 bytes as an opaque payload.

    The testdata ships no binary media table, so the media pipeline is
    exercised over encoded text payloads — byte-for-byte well-defined, so
    the oracle can recompute n_bytes/digest in SQL.
    """
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("text").alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
        F.col("n_chars").alias("meta_width"),
        F.lit(1).cast("long").alias("meta_height"),
    )
