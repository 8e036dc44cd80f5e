#!/usr/bin/env python3
"""End-to-end pretraining-corpus pipeline, composed from the engine's
operators — the workflow a training-data team runs nightly:

    raw documents
      -> quality filter      (Gopher-style rules, scan-side)
      -> repetition filter   (intra-doc duplicate 3-grams)
      -> PII/lexicon masking (regex rewrite, audited by md5)
      -> exact dedup         (md5 digest, keep min doc_id)
      -> near-dup removal    (MinHash-LSH verified pairs -> connected
                              components -> drop non-representatives)
      -> decontamination     (word-shingle overlap vs a held-out eval set)
      -> sequence packing    (concat-and-chunk offsets, 256-token budget)
      -> partitioned parquet (hive layout for downstream pruning)

Run:  python examples/pretrain_pipeline.py [sf_dir] [out_dir]
Defaults: /root/testdata/sf0.001, a temp dir.  Prints a per-stage funnel.

Every stage is a lazy DataFrame transform — Catalyst fuses the scan-side
stages (quality/repetition/masking are ONE pass over the text) and the
only shuffles are the ones the algorithms require (digest groupBy, LSH
band bucket, CC rounds, pack-bucket window).  At 100 TB the same code runs
unchanged; only partition counts and the LSH parameters scale up
(SCALE.md).
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from codecdb_queryengine_spark.catalog import load_tables
from codecdb_queryengine_spark.functions import text as T
from codecdb_queryengine_spark.operators import corpus as C
from codecdb_queryengine_spark.operators import dedup as D
from codecdb_queryengine_spark.operators.graph import connected_components
from codecdb_queryengine_spark.session import get_spark
from codecdb_queryengine_spark.sources import io


def build_corpus(spark, sf_dir: str, out_dir: str, pack_budget: int = 256):
    """Returns (final_df, funnel) and writes the packed corpus to out_dir."""
    docs = load_tables(spark, sf_dir)["documents"]
    funnel: list[tuple[str, int]] = [("raw", docs.count())]

    # --- scan-side filters (one fused pass) -------------------------------
    quality = C.quality_filter(docs).filter("keep").select("doc_id")
    rep = C.repetition_stats(docs).filter(F.col("dup_ratio") < 0.5).select("doc_id")
    kept = docs.join(quality, "doc_id").join(rep, "doc_id")
    funnel.append(("quality+repetition", kept.count()))

    # --- masking (keeps every row, rewrites text) -------------------------
    # The SAME rewrite must later hit the eval side before decontamination:
    # comparing masked train shingles against raw eval shingles would let
    # any overlap that spans a masked term slip through undetected.
    def mask(df):
        return df.withColumn(
            "text", F.regexp_replace("text", C.MASK_PATTERN, C.MASK_TOKEN)
        )

    masked_base = mask(kept).persist()

    # --- exact dedup ------------------------------------------------------
    keep_exact = D.exact_dedup(masked_base, "text", "doc_id").select(
        F.col("keep_id").alias("doc_id")
    )
    masked = masked_base.join(keep_exact, "doc_id")
    funnel.append(("exact-dedup", masked.count()))

    # --- near-dup removal (LSH -> verified pairs -> CC, keep minima) ------
    pairs = D.minhash_verified_pairs(masked, "text", "doc_id", threshold=0.12)
    cc = connected_components(
        pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v")), "u", "v"
    )
    drop = cc.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    deduped = masked.join(drop, "doc_id", "left_anti").persist()
    funnel.append(("near-dedup", deduped.count()))

    # --- decontamination vs the held-out eval slice -----------------------
    # Drop docs with substantial overlap (>= 5 shared 3-shingles); 1-2
    # incidental shared n-grams are noise, not contamination.  The eval
    # side goes through the identical masking so shingles compare in the
    # same text space as the training side.
    ev = mask(docs.filter(F.col("doc_id") % 23 == 0))
    contaminated = (
        C.decontaminate(deduped, ev, "text", "doc_id")
        .filter(F.col("n_contaminated") >= 5)
        .select("doc_id")
    )
    clean = deduped.join(contaminated, "doc_id", "left_anti").persist()
    funnel.append(("decontaminated", clean.count()))

    # --- sequence packing + write ----------------------------------------
    packed = C.pack_offsets(
        clean, T.token_count("text"), "doc_id", budget=pack_budget, n_buckets=8
    )
    final = clean.join(packed.select("doc_id", "bucket", "tok_offset"), "doc_id")
    io.write(final, out_dir, partition_by=["bucket"])
    # Count the WRITTEN corpus (no third recompute of the lineage), then
    # release the stage caches: each funnel count and the write consumed
    # the persisted boundary instead of re-running minhash/CC upstream.
    written = docs.sparkSession.read.parquet(out_dir)
    funnel.append(("packed+written", written.count()))
    for cached in (masked_base, deduped, clean):
        cached.unpersist()
    return final, funnel


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(
        prefix="sg_corpus_"
    )
    spark = get_spark("pretrain-pipeline")
    _, funnel = build_corpus(spark, sf_dir, out_dir)
    for stage, n in funnel:
        print(f"{stage:22s} {n:8d}")
    print(f"corpus written to {out_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
