#!/usr/bin/env python3
"""Phase-level timing probe for the heavy lifecycle gates (r11 optimization
round, guide §1: measure first).  Reproduces the expensive gates' internal
sequence with a perf_counter around each phase (build / mutate / serve /
stream), so the optimization targets the phase that actually costs, not the
gate total.  Read-only: uses the same scratch dirs and entry code paths the
gates use; prints one JSON line per gate.

Usage: python scripts/opt_phase_probe.py [sf_dir] [gate ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from codecdb_queryengine_spark.catalog import load_tables
from codecdb_queryengine_spark.session import get_spark

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ONLY = set(sys.argv[2:])


def t(spark, label, fn, acc):
    spark.sparkContext.setJobDescription(label)
    t0 = time.perf_counter()
    out = fn()
    acc[label] = round(time.perf_counter() - t0, 3)
    spark.sparkContext.setJobDescription(None)
    return out


def probe_ivf_upsert(spark):
    """sim_ann_ivf_upserted phases."""
    import codecdb_queryengine_spark.queries.pipeline as P
    from codecdb_queryengine_spark.operators import similarity as S
    from codecdb_queryengine_spark.sources import ann_index as AI

    acc = {}
    emb = load_tables(spark, SF)["embeddings"]
    path = P._scratch_dir("probe_ivf_upsert", SF, fresh=True)
    cents = emb.filter(F.col("vec_id") % 29 == 0).select(
        F.col("vec_id").alias("c_id"),
        F.col("embedding").alias("c_vec"),
        S.norm(F.col("embedding")).alias("c_norm"),
    )
    t(spark, "build", lambda: AI.ivf_index_build(emb, path, centroids=cents, max_list_rows=16), acc)
    t(
        spark,
        "upsert",
        lambda: AI.ivf_index_upsert(
            path,
            updates=emb.filter(F.expr(P._UPS_UPD)).select(
                "vec_id", F.reverse("embedding").alias("embedding")
            ),
            delete_ids=emb.filter(F.expr(P._UPS_DEL)).select("vec_id"),
        ),
        acc,
    )
    t(
        spark,
        "serve",
        lambda: AI.ivf_index_topk(
            spark, path, P._query_vectors(emb), k=P._TOP_K, nprobe=2
        ).collect(),
        acc,
    )
    return acc


def probe_ivfpq_upsert(spark):
    """sim_ann_ivfpq_upserted phases."""
    import codecdb_queryengine_spark.queries.pipeline as P
    from codecdb_queryengine_spark.operators import similarity as S
    from codecdb_queryengine_spark.sources import ann_index as AI

    acc = {}
    emb = load_tables(spark, SF)["embeddings"]
    path = P._scratch_dir("probe_ivfpq_upsert", SF, fresh=True)
    pair = t(spark, "train", lambda: S.ivfpq_train_micro(emb, dim=64), acc)
    cents, cbs = pair
    t(
        spark,
        "build",
        lambda: AI.ivfpq_index_build_micro(emb, path, cents, cbs, max_list_rows=16),
        acc,
    )
    t(
        spark,
        "upsert",
        lambda: AI.ivfpq_index_upsert(
            path,
            updates=emb.filter(F.expr(P._UPS_UPD)).select(
                "vec_id", F.reverse("embedding").alias("embedding")
            ),
            delete_ids=emb.filter(F.expr(P._UPS_DEL)).select("vec_id"),
        ),
        acc,
    )
    t(
        spark,
        "serve",
        lambda: AI.ivfpq_index_topk_micro(
            spark, path, P._query_vectors(emb), k=P._TOP_K, nprobe=2
        ).collect(),
        acc,
    )
    return acc


def probe_text_purge(spark):
    """docs_search_purged phases."""
    import codecdb_queryengine_spark.queries.pipeline as P
    from codecdb_queryengine_spark.sources import text_index as TI

    acc = {}
    docs = load_tables(spark, SF)["documents"]
    path = P._scratch_dir("probe_text_purge", SF, fresh=True)
    t(
        spark,
        "build_all",
        lambda: TI.text_index_build_all(docs, path, layouts=("postings", "postings_tf")),
        acc,
    )
    t(spark, "mutate", lambda: P._text_index_mutate(spark, SF, path), acc)
    t(spark, "purge", lambda: TI.text_index_purge(spark, path), acc)
    t(
        spark,
        "serve_ranked",
        lambda: TI.text_index_search_ranked(spark, path, P._SEARCH_TERMS, k=10).collect(),
        acc,
    )
    return acc


def probe_build_all(spark):
    """text_index_build_all alone (docs_search_* family base)."""
    import codecdb_queryengine_spark.queries.pipeline as P
    from codecdb_queryengine_spark.sources import text_index as TI

    acc = {}
    docs = load_tables(spark, SF)["documents"]
    path = P._scratch_dir("probe_build_all", SF, fresh=True)
    t(spark, "build_all", lambda: TI.text_index_build_all(docs, path), acc)
    return acc


PROBES = {
    "ivf_upsert": probe_ivf_upsert,
    "ivfpq_upsert": probe_ivfpq_upsert,
    "text_purge": probe_text_purge,
    "build_all": probe_build_all,
}


def main():
    spark = get_spark("opt-phase-probe")
    # warmup like bench.py
    import __spark_entry__ as entry_mod

    entry_mod.queries()["q6"](spark, SF).collect()
    spark.range(256).repartition(32).mapInPandas(lambda it: it, "id long").collect()
    reps = int(os.environ.get("OPT_PROBE_REPS", "3"))
    for name, fn in PROBES.items():
        if ONLY and name not in ONLY:
            continue
        for i in range(reps):
            acc = fn(spark)
            acc["_total"] = round(
                sum(v for k, v in acc.items() if not k.startswith("_")), 3
            )
            print(json.dumps({"gate": name, "rep": i, "phases": acc}), flush=True)
            spark.catalog.clearCache()


if __name__ == "__main__":
    main()
