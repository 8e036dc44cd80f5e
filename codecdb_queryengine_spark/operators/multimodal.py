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
