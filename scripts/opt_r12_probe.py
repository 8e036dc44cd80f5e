#!/usr/bin/env python3
"""r12 measurement probes (guide §1: measure first).

Modes:
  dedup_isolated   — fresh-session isolated re-times of the three queries the
                     r11 verdict flagged as 32-core suite-context regressions
                     (dedup_canonical, dedup_fuzzy, docs_train_classifier).
  dedup_context    — the same three timed AFTER running the two corpus-wide
                     token-explode gates 8a00910 added (docs_dedup_substrings,
                     docs_dsir_sample) plus the dedup-family neighborhood, to
                     reproduce the suite context.
  upsert_jobs      — per-phase wall time AND Spark job count for the
                     ivf/ivfpq upsert cores and the CDC mutation gates (job
                     count via the status-tracker job-id high-water mark).

Usage: python scripts/opt_r12_probe.py <mode> [sf_dir]
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from codecdb_queryengine_spark.catalog import load_tables
from codecdb_queryengine_spark.session import get_spark

MODE = sys.argv[1]
SF = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"


def _time_query(spark, name, n_runs=3):
    import __spark_entry__ as entry_mod

    fn = entry_mod.queries()[name]
    times = []
    for _ in range(n_runs):
        t0 = time.perf_counter()
        fn(spark, SF).collect()
        times.append(round(time.perf_counter() - t0, 3))
        spark.catalog.clearCache()
    return times


class JobMark:
    """Job-count delta via the monotone job-id counter."""

    def __init__(self, spark):
        self.spark = spark

    def mark(self) -> int:
        jids = self.spark.sparkContext.statusTracker().getJobIdsForGroup()
        return (max(jids) + 1) if jids else 0


def dedup_runs(spark, context: bool):
    out = {}
    if context:
        for warm in (
            "docs_dedup_substrings",
            "docs_dsir_sample",
            "dedup_minhash",
            "dedup_simhash_pairs",
            "dedup_ngram_jaccard",
            "dedup_minhash_verified",
        ):
            t = _time_query(spark, warm, n_runs=1)
            out[f"ctx:{warm}"] = t
    for name in ("dedup_fuzzy", "dedup_canonical", "docs_train_classifier"):
        out[name] = _time_query(spark, name, n_runs=3)
        out[f"{name}_median"] = statistics.median(out[name])
    return out


def upsert_jobs(spark):
    import codecdb_queryengine_spark.queries.pipeline as P
    from codecdb_queryengine_spark.operators import similarity as S
    from codecdb_queryengine_spark.sources import ann_index as AI

    jm = JobMark(spark)
    out = {}

    emb = load_tables(spark, SF)["embeddings"]
    cents = emb.filter(F.col("vec_id") % 29 == 0).select(
        F.col("vec_id").alias("c_id"),
        F.col("embedding").alias("c_vec"),
        S.norm(F.col("embedding")).alias("c_norm"),
    )

    def phase(label, fn):
        spark.sparkContext.setJobDescription(label)
        j0, t0 = jm.mark(), time.perf_counter()
        r = fn()
        out[label] = {
            "sec": round(time.perf_counter() - t0, 3),
            "jobs": jm.mark() - j0,
        }
        spark.sparkContext.setJobDescription(None)
        return r

    # --- flat IVF upsert (sim_ann_ivf_upserted core) ---
    path = P._scratch_dir("probe_r12_ivf_upsert", SF, fresh=True)
    phase("ivf:build", lambda: AI.ivf_index_build(
        emb, path, centroids=cents, max_list_rows=16))
    upd = emb.filter(F.expr(P._UPS_UPD)).select(
        "vec_id", F.reverse("embedding").alias("embedding"))
    dels = emb.filter(F.expr(P._UPS_DEL)).select("vec_id")
    phase("ivf:upsert", lambda: AI.ivf_index_upsert(
        path, updates=upd, delete_ids=dels))
    phase("ivf:serve", lambda: AI.ivf_index_topk(
        spark, path, P._query_vectors(emb), k=P._TOP_K, nprobe=2).collect())

    # --- IVFADC upsert (sim_ann_ivfpq_upserted core) ---
    path2 = P._scratch_dir("probe_r12_ivfpq_upsert", SF, fresh=True)
    c2, cb2 = phase("ivfpq:train", lambda: S.ivfpq_train_micro(emb, dim=64))
    phase("ivfpq:build", lambda: AI.ivfpq_index_build_micro(
        emb, path2, c2, cb2, max_list_rows=16))
    phase("ivfpq:upsert", lambda: AI.ivfpq_index_upsert(
        path2, updates=upd, delete_ids=dels, spark=spark))
    phase("ivfpq:serve", lambda: AI.ivfpq_index_topk_micro(
        spark, path2, P._query_vectors(emb), k=P._TOP_K, nprobe=2).collect())

    # --- the two CDC stream gates end to end ---
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    for gate in ("emb_stream_mutations", "emb_stream_pq_mutations"):
        phase(f"gate:{gate}", lambda g=gate: qs[g](spark, SF).collect())
    return out


def main():
    spark = get_spark("opt-r12-probe")
    # warm: session + python worker pool
    spark.range(1000).count()
    spark.range(256).repartition(32).mapInPandas(lambda it: it, "id long").collect()
    import os

    load0 = os.getloadavg()[0]
    if MODE == "dedup_isolated":
        out = dedup_runs(spark, context=False)
    elif MODE == "dedup_context":
        out = dedup_runs(spark, context=True)
    elif MODE == "upsert_jobs":
        out = upsert_jobs(spark)
    else:
        raise SystemExit(f"unknown mode {MODE}")
    out["_load_before"] = load0
    out["_load_after"] = os.getloadavg()[0]
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
