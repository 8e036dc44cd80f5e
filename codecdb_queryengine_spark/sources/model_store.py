"""Persisted integer-model artifacts: the model-registry step between
training and serving for the engine's exact-integer models (Lloyd
centroids, PCA components, perceptron weights).

The ANN/text indexes persist their LAYOUTS (sources/ann_index,
sources/text_index); this module persists small trained VECTORS the same
way — parquet rows, a meta table carrying the layout constants, and a
loader that trusts the artifact over the caller (the r5 text-index
lesson: serving with a caller-guessed constant silently corrupts; the
artifact records its own shape and the loader reads it back).

Layout: `<path>/<name>/vectors` holds (kind, j, v) rows — one named
integer vector per `kind`, 0-based positions — and `<path>/<name>/meta`
one row per kind with its length.  Everything is exact BIGINT, so a
round-tripped model is bit-identical to the trained one by construction
(no float serialization ambiguity exists to worry about).

Scale: models here are intentionally tiny (dim-sized); the artifact read
is a broadcast-sized scan, and serving embeds the loaded vector as a
literal fold exactly like the in-memory path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def save_model(
    spark: SparkSession, path: str, name: str, vectors: dict[str, list[int]]
) -> None:
    """Persist named integer vectors as a model artifact (overwrite)."""
    base = os.path.join(path, name)
    rows = [
        (kind, j, int(v))
        for kind, vec in sorted(vectors.items())
        for j, v in enumerate(vec)
    ]
    spark.createDataFrame(rows, "kind string, j int, v long").coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(base, "vectors"))
    meta = [(kind, len(vec)) for kind, vec in sorted(vectors.items())]
    spark.createDataFrame(meta, "kind string, dim int").coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(base, "meta"))


def load_model(spark: SparkSession, path: str, name: str) -> dict[str, list[int]]:
    """Load a model artifact back as {kind: vector}; lengths come from the
    artifact's own meta and are validated against the stored rows, so a
    torn or mixed-version artifact fails loudly instead of serving a
    truncated model."""
    base = os.path.join(path, name)
    dims = {
        r["kind"]: int(r["dim"])
        for r in spark.read.parquet(os.path.join(base, "meta")).collect()
    }
    out: dict[str, list[int]] = {k: [0] * d for k, d in dims.items()}
    counts: dict[str, int] = {k: 0 for k in dims}
    for r in spark.read.parquet(os.path.join(base, "vectors")).collect():
        out[r["kind"]][int(r["j"])] = int(r["v"])
        counts[r["kind"]] += 1
    bad = {k: (counts[k], dims[k]) for k in dims if counts[k] != dims[k]}
    if bad:
        raise ValueError(f"model artifact {name!r} is torn: rows != meta dim {bad}")
    return out
