"""Multimodal column handling: opaque binary payloads + typed metadata.

Driver-mandated extension.  Media (image/audio/video) rides as a `binary`
column with a metadata struct; decode/feature-extract runs as Arrow-batched
pandas functions over mapInPandas — the only sanctioned Python hot path.

Decoding tiers:
- REAL decode for uncompressed raster formats (binary PPM "P6" and PGM
  "P5") implemented numpy-only — header parse, pixel array, channel/
  luma statistics, nearest-neighbor resize.  No codec library needed.
- Codec formats (JPEG/PNG/audio/video) need libs absent from this
  container; those payloads fall back to `decode_stub` (deterministic
  md5-derived fake features) so the pipeline shape stays total.  The
  oracle-gated queries run text payloads and pin the stub tier explicitly
  (`decoder="stub"`) — real-decode behavior is pinned by direct fixtures
  in tests/test_multimodal_decode.py instead.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
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

    The fallback tier for codec formats whose decoders are absent from
    this container; the function signature (bytes -> fixed-dim list) is
    the contract the pipeline depends on.
    """
    if payload is None:
        raise NotImplementedError("decode of NULL payload")
    h = hashlib.md5(payload).digest()
    return [h[i] / 256.0 for i in range(FEATURE_DIM)]


def decode_image(payload: bytes):
    """REAL decode of binary PPM (P6, RGB) / PGM (P5, gray) — numpy only.

    Returns (width, height, pixels) with pixels shaped (h, w, 3) uint8
    (gray replicated to 3 channels), or None when the payload is not one
    of these formats (caller falls back to the stub tier).  Handles the
    full netpbm header grammar: '#' comments and arbitrary whitespace
    between tokens; only maxval<=255 (1 byte/sample) is supported.
    """
    if payload is None:
        raise NotImplementedError("decode of NULL payload")
    if len(payload) < 2 or payload[:2] not in (b"P6", b"P5"):
        return None
    try:
        # tokenize header: magic, width, height, maxval — comments skipped
        tokens: list[bytes] = []
        i = 2
        while len(tokens) < 3:
            while i < len(payload) and payload[i : i + 1].isspace():
                i += 1
            if payload[i : i + 1] == b"#":
                while i < len(payload) and payload[i : i + 1] != b"\n":
                    i += 1
                continue
            j = i
            while j < len(payload) and not payload[j : j + 1].isspace():
                j += 1
            tokens.append(payload[i:j])
            i = j
        i += 1  # single whitespace after maxval, then raw samples
        width, height, maxval = (int(t) for t in tokens)
        if maxval > 255 or width <= 0 or height <= 0:
            return None
        channels = 3 if payload[:2] == b"P6" else 1
        need = width * height * channels
        raw = np.frombuffer(payload, dtype=np.uint8, count=need, offset=i)
        px = raw.reshape(height, width, channels)
        if channels == 1:
            px = np.repeat(px, 3, axis=2)
        return width, height, px
    except (ValueError, IndexError):
        return None


def image_features(width: int, height: int, px: "np.ndarray") -> list[float]:
    """Real content features from decoded pixels (FEATURE_DIM values):
    log-dims, aspect, per-channel means, luma std, and a horizontal
    edge-energy proxy — the kind of cheap signal a curation pipeline
    filters on before an embedding model sees the image."""
    f = px.astype(np.float64) / 255.0
    luma = 0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]
    edge = float(np.abs(np.diff(luma, axis=1)).mean()) if width > 1 else 0.0
    return [
        float(np.log1p(width)),
        float(np.log1p(height)),
        float(width / height),
        float(f[:, :, 0].mean()),
        float(f[:, :, 1].mean()),
        float(f[:, :, 2].mean()),
        float(luma.std()),
        edge,
    ]


def decode_features(payload: bytes) -> list[float]:
    """Tiered decode: real pixels where the format allows, stub otherwise."""
    decoded = decode_image(payload)
    if decoded is None:
        return decode_stub(payload)
    return image_features(*decoded)


def extract_features(media: DataFrame, decoder: str = "auto") -> DataFrame:
    """binary payload -> (n_bytes, digest, feature vector) via mapInPandas.

    decoder="auto" tries the real image decode first (PPM/PGM) and falls
    back to the stub; decoder="stub" pins the stub tier — the oracle-gated
    queries use it because their payloads are text and the gate needs one
    deterministic tier, not a per-row format dispatch.

    Arrow-batched: each pandas batch is one partition slice; no per-row
    Python round trips.  Partitioning is preserved — at 100 TB this runs
    embarrassingly parallel on the scan, no shuffle.
    """
    decode = decode_stub if decoder == "stub" else decode_features

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "digest": payloads.map(lambda b: hashlib.md5(b).hexdigest()),
                    "feature": payloads.map(decode),
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


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """REAL nearest-neighbor resize of a decodable (PPM/PGM) payload,
    re-encoded as binary PPM; non-image payloads get the deterministic
    byte-level stand-in (truncate/pad to w·h) so the transform stays
    total."""
    if payload is None:
        raise NotImplementedError("resize of NULL payload")
    decoded = decode_image(payload)
    if decoded is None:
        target = width * height
        return payload[:target].ljust(target, b"\0")
    src_w, src_h, px = decoded
    # nearest-neighbor index maps (floor sampling — the deterministic,
    # lib-free choice; bilinear is a drop-in if quality ever matters)
    ys = (np.arange(height) * src_h) // height
    xs = (np.arange(width) * src_w) // width
    out = px[ys][:, xs]
    header = f"P6\n{width} {height}\n255\n".encode()
    return header + out.tobytes()


def resize(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize via mapInPandas: real pixel resampling for decodable
    formats (see resize_image), byte-level stand-in otherwise."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": pdf["payload"].map(
                        lambda b: resize_image(b, width, height)
                    ),
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
