#!/usr/bin/env python3
"""Per-operator-family microbench → PERF_OPS.json (r8 verdict item 8).

The reference ships per-operator benchmark targets (filter/join/agg/...:
cpp/src/lqf/CMakeLists.txt:149-158 — join_benchmark, aggv_benchmark,
stream_benchmark, ...).  This is the Spark analog: a FIXED representative
query per operator family, timed as median-of-5 warm runs at sf0.1, with
the family medians appended to PERF_OPS.json as one history row per round
— so a per-operator regression is attributable round-over-round without
re-reading the 200-entry full-suite bench.

Families map to SURVEY §2 sections (§2.2 filter, §2.3 join shapes,
§2.4 agg, §2.5 topk) plus the repo's pipeline families; representatives
are the smallest gated query exercising mostly that operator.

Usage: python -u scripts/perf_ops.py          (appends a round row)
       SPARK_GRAFT_ROUND=9 python -u scripts/perf_ops.py
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from codecdb_queryengine_spark.session import get_spark

RUNS = int(os.environ.get("RUNS", "5"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ART = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PERF_OPS.json"
)

# family -> representative gated queries (ref: lqf CMake benchmark targets)
FAMILIES: dict[str, list[str]] = {
    "scan_filter": ["q6"],                       # ColFilter/Sboost pushdown scan
    "join_hash": ["q3"],                         # HashJoin + broadcast dims
    "join_semi_anti": ["q4", "q22"],             # FilterJoin / NotExistJoin
    "join_exist": ["q21"],                       # HashExistJoin
    "agg_hash": ["q1"],                          # multi-field hash agg
    "agg_distinct": ["q16"],                     # IntDistinctCount
    "topk": ["q10"],                             # TopN bounded heap
    "window": ["ext_window_funcs"],              # partitioned windows
    "dedup": ["dedup_minhash"],                  # banded LSH
    "ann": ["sim_ann_ivf"],                      # fold assignment + probe
    "text_search": ["docs_search_index"],        # persisted postings serve
    "streaming": ["events_stream_window"],       # MicroBatchExecution
}


def main() -> int:
    import __spark_entry__ as m

    rnd = os.environ.get("SPARK_GRAFT_ROUND")
    spark = get_spark("perf-ops")
    queries = m.queries()
    queries["q6"](spark, SF_DIR).collect()  # warm session + IO
    spark.range(256).repartition(32).mapInPandas(lambda it: it, "id long").collect()

    fams: dict[str, dict] = {}
    for fam, names in FAMILIES.items():
        per = {}
        for name in names:
            times = []
            for _ in range(RUNS):
                t0 = time.perf_counter()
                queries[name](spark, SF_DIR).collect()
                times.append(time.perf_counter() - t0)
                spark.catalog.clearCache()
            per[name] = round(statistics.median(times), 4)
        fams[fam] = {
            "queries": per,
            "median": round(statistics.median(per.values()), 4),
        }

    history = []
    if os.path.exists(ART):
        history = json.load(open(ART)).get("history", [])
    prev = history[-1] if history else None
    row = {
        "round": int(rnd) if rnd else (prev["round"] + 1 if prev else 1),
        "sf_dir": SF_DIR,
        "runs": RUNS,
        "families": fams,
    }
    if prev:
        row["delta_vs_prev"] = {
            fam: round(fams[fam]["median"] / p["median"], 3)
            for fam, p in prev["families"].items()
            if fam in fams and p["median"] > 0
        }
    history.append(row)
    with open(ART, "w") as f:
        json.dump({"history": history}, f, indent=1, sort_keys=True)
    print(json.dumps(row))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
