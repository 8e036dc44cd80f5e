#!/usr/bin/env python3
"""One sf1 scale point for the relational core (r7 verdict item 7).

BASELINE.md's protocol numbers are all sf0.1; this stages a 10x corpus and
times the 44-entry TPC-H + SSB core once, so the band claim ("~linear, no
query blows past 2x the data step") is measured instead of argued.

Staging: the driver ships no sf1 testdata (and /root/testdata is
read-only), so the corpus is synthesized from sf0.1 by KEY-SALTED
replication — copy i offsets every join key (custkey/suppkey/partkey/
orderkey) by i·(max+1), so each copy joins within itself and the join
fan-outs, group cardinalities per key, and selectivities of the literal
predicates all match a genuinely larger corpus; region/nation stay fixed
(TPC-H dimensions are constant across SF by spec).  events/documents/
embeddings are symlinked unscaled — the relational core never reads them,
they just satisfy the catalog's footer pass.

Usage: python -u scripts/sf1_bench.py   (stages to /tmp/sf1_data once,
~2 min; then the bench.py protocol: warm session, median of N_RUNS full
materializations per query).  Writes BENCH_sf1.json at the repo root and
prints one JSON line; per-query ratios vs the sf0.1 numbers in
BENCH_full.json ride along when that artifact exists.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from codecdb_queryengine_spark.session import get_spark

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.environ.get("SF1_DIR", "/tmp/sf1_data")
FACTOR = int(os.environ.get("SF1_FACTOR", "10"))
N_RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))


def stage(spark) -> None:
    done = os.path.join(OUT, "_STAGED")
    if os.path.exists(done):
        return
    os.makedirs(OUT, exist_ok=True)

    def rd(t):
        return spark.read.parquet(os.path.join(BASE, f"{t}.parquet"))

    for t in ("region", "nation"):
        rd(t).write.mode("overwrite").parquet(os.path.join(OUT, f"{t}.parquet"))
    strides = {
        t: rd(t).agg(F.max(k)).collect()[0][0] + 1
        for t, k in (
            ("customer", "c_custkey"),
            ("supplier", "s_suppkey"),
            ("part", "p_partkey"),
            ("orders", "o_orderkey"),
        )
    }
    offsets = {
        "customer": {"c_custkey": strides["customer"]},
        "supplier": {"s_suppkey": strides["supplier"]},
        "part": {"p_partkey": strides["part"]},
        "orders": {
            "o_orderkey": strides["orders"],
            "o_custkey": strides["customer"],
        },
        "lineitem": {
            "l_orderkey": strides["orders"],
            "l_partkey": strides["part"],
            "l_suppkey": strides["supplier"],
        },
    }
    for t, keymap in offsets.items():
        df = rd(t)
        parts = []
        for i in range(FACTOR):
            p = df
            for col, stride in keymap.items():
                p = p.withColumn(col, F.col(col) + F.lit(i * stride))
            parts.append(p)
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        u.repartition(32).write.mode("overwrite").parquet(
            os.path.join(OUT, f"{t}.parquet")
        )
    for t in ("events", "documents", "embeddings"):
        dst = os.path.join(OUT, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(BASE, f"{t}.parquet"), dst)
    open(done, "w").close()


def main() -> int:
    from codecdb_queryengine_spark.queries import ssb, tpch

    spark = get_spark("sf1-bench")
    stage(spark)
    queries = {**tpch.QUERIES, **ssb.QUERIES}
    queries["q6"](spark, OUT).collect()  # warm session + IO path, untimed

    per_query: dict[str, float] = {}
    for name, fn in queries.items():
        times = []
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            fn(spark, OUT).collect()
            times.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
        per_query[name] = round(statistics.median(times), 4)

    payload = {
        "metric": "tpch_ssb_core_total_median_wall",
        "value": round(sum(per_query.values()), 4),
        "unit": "sec",
        "queries": per_query,
        "sf": 1.0,
        "factor_vs_base": FACTOR,
    }
    base_bench = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_full.json",
    )
    if os.path.exists(base_bench):
        with open(base_bench) as f:
            base = json.load(f)["queries"]
        ratios = {
            n: round(per_query[n] / base[n], 2)
            for n in per_query
            if n in base and base[n] > 0
        }
        payload["ratio_vs_sf0.1"] = ratios
        payload["ratio_median"] = round(
            statistics.median(ratios.values()), 2
        )
        payload["ratio_max"] = max(ratios.values())
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_sf1.json",
    )
    try:
        with open(out, "w") as f:
            json.dump(payload, f, indent=1, sort_keys=True)
    except OSError as e:
        print(f"BENCH_sf1.json not written: {e}", file=sys.stderr)
    print(json.dumps(payload))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
