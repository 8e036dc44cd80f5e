#!/usr/bin/env python3
"""One-off perf probe: time a subset of queries() under extra session confs.

Usage: python -u scripts/perf_probe.py [k=v ...] -- q1 dedup_minhash_verified ...
Prints one JSON line {query: [t1, t2, t3]}.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from codecdb_queryengine_spark.session import get_spark

def main():
    argv = sys.argv[1:]
    split = argv.index("--")
    confs = dict(a.split("=", 1) for a in argv[:split])
    names = argv[split + 1:]
    runs = int(os.environ.get("RUNS", "3"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    spark = get_spark("probe", **confs)
    import __spark_entry__ as m
    queries = m.queries()
    queries["q6"](spark, sf_dir).collect()  # warmup

    out = {}
    for name in names:
        times = []
        for _ in range(runs):
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).collect()
            times.append(round(time.perf_counter() - t0, 2))
            spark.catalog.clearCache()
        out[name] = times
    print(json.dumps(out))

if __name__ == "__main__":
    main()
