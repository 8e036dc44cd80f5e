#!/usr/bin/env python3
"""Nightly incremental shard ingest, composed from the engine's operators —
the companion workflow to examples/pretrain_pipeline.py (which builds a
corpus from scratch; this one ADDS a day's shard to it):

    incoming shard (new docs + accidental re-crawls of existing ones)
      -> cross-shard dedup    (Bloom pre-filter vs the existing corpus's
                               digests + exact confirming anti-join —
                               the shard itself never shuffles in full)
      -> quality scoring      (unigram-LM mean surprisal over the shard;
                               extremes reported, not silently dropped)
      -> Z-order write        (clustered by (n_chars, n_tokens) so parquet
                               min/max stats prune on both)
      -> snapshot diff        (added/changed/removed report vs yesterday)

Run:  python examples/incremental_ingest.py [sf_dir] [out_dir]
Defaults: /root/testdata/sf0.001, a temp dir.

Every stage is a DataFrame transform; the only shuffles are the bloom
build (reference side, one groupBy), the LM vocabulary count, the z-value
range exchange of the write, and the diff's keyed join.  At 100 TB the
shard-side scan stays map-side until the write (SCALE.md).
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from codecdb_queryengine_spark.catalog import load_tables
from codecdb_queryengine_spark.operators.membership import dedup_against_reference
from codecdb_queryengine_spark.session import get_spark
from codecdb_queryengine_spark.sources.layout import zorder_write


def ingest_shard(spark, sf_dir: str, out_dir: str):
    """Returns (written_df, report: list[(stage, count)])."""
    docs = load_tables(spark, sf_dir)["documents"]
    corpus = docs.filter(F.col("doc_id") % 5 == 0)
    # the incoming shard: genuinely new docs plus re-crawls of existing ones
    shard = (
        docs.filter(F.col("doc_id") % 5 != 0)
        .select("doc_id", "text", "lang", "n_chars")
        .unionByName(
            corpus.filter(F.col("doc_id") % 2 == 0).select(
                (F.col("doc_id") + 100000).alias("doc_id"), "text", "lang", "n_chars"
            )
        )
    )
    report: list[tuple[str, int]] = [("shard raw", shard.count())]

    # --- cross-shard dedup (bloom pre-filter + exact confirm) -------------
    kept_ids = dedup_against_reference(shard, corpus, "text", "doc_id").select("doc_id")
    fresh = shard.join(kept_ids, "doc_id").persist()
    report.append(("after cross-shard dedup", fresh.count()))

    # --- unigram-LM quality scoring over the surviving shard --------------
    from codecdb_queryengine_spark.operators.corpus import lm_scores

    scored = lm_scores(fresh, "text", "doc_id")
    flagged = scored.filter(F.col("avg_bits") > 8.0)
    report.append(("flagged high-surprisal", flagged.count()))

    # --- clustered write --------------------------------------------------
    final = fresh.join(scored, "doc_id")
    zorder_write(
        final.select("doc_id", "text", "lang", "n_chars", "n_tokens", "avg_bits"),
        ["n_chars", "n_tokens"],
        out_dir,
        bits=10,
        num_files=4,
    )
    written = spark.read.parquet(out_dir)
    report.append(("written", written.count()))

    # --- snapshot diff: what did tonight's ingest change? -----------------
    old = corpus.select("doc_id", F.md5("text").alias("digest"))
    new = old.unionByName(written.select("doc_id", F.md5("text").alias("digest")))
    diff = (
        old.withColumnRenamed("digest", "d_old")
        .join(new.withColumnRenamed("digest", "d_new"), "doc_id", "full_outer")
        .withColumn(
            "change",
            F.when(F.col("d_old").isNull(), "added")
            .when(F.col("d_new").isNull(), "removed")
            .when(F.col("d_old") != F.col("d_new"), "changed")
            .otherwise("same"),
        )
        .filter(F.col("change") != "same")
    )
    report.append(("diff rows (added)", diff.count()))
    fresh.unpersist()
    return written, report


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="sg_ingest_")
    spark = get_spark("incremental-ingest")
    _, report = ingest_shard(spark, sf_dir, out_dir)
    for stage, n in report:
        print(f"{stage:28s} {n:8d}")
    print(f"shard written to {out_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
