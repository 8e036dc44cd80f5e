#!/usr/bin/env python3
"""Driver-gate SELF-CHECK: prove the contract surface the driver consumes
is healthy, as a committed one-line receipt (r10 verdict item 1).

Round 10's CORRECTNESS_r10.json came back literally `{}` — the driver's
oracle gate recorded zero entries — and nothing in-repo could distinguish
"the driver crashed before query 1" from "the repo broke the contract".
This script runs at every round close, in the DRIVER'S environment (a bare
SparkSession, no session.py defaults — the check_correctness discipline),
and asserts exactly what the driver needs:

1. `__spark_entry__` imports on a bare interpreter path;
2. queries() and oracle_sql() cover the same names (full parity — the
   driver pairs them one-to-one);
3. DRIVER_FIRST is exactly 50 unique registered names and queries()
   leads with them in order (the driver truncates at the first 50);
4. entry(spark) returns rows on sf0.001 (the driver's smoke);
5. the FIRST windowed gate runs end-to-end against its DuckDB oracle at
   sf0.01, bit-exact (the driver's very first comparison — if this
   passes here and the round's CORRECTNESS artifact is still empty, the
   failure was outside the repo, provably).

Writes SELFCHECK.json at the repo root (committed) and prints the same
one-line JSON; exits non-zero on any failure so the close aborts loudly.

Usage: python -u scripts/driver_gate_selfcheck.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    t0 = time.time()
    receipt: dict = {"ok": False}

    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    receipt["n_queries"] = len(queries)
    receipt["n_oracles"] = len(oracles)
    assert set(queries) == set(oracles), (
        f"queries()/oracle_sql() name mismatch: "
        f"only-queries={sorted(set(queries) - set(oracles))[:5]} "
        f"only-oracles={sorted(set(oracles) - set(queries))[:5]}"
    )

    first = entry_mod.DRIVER_FIRST
    assert len(first) == 50, f"DRIVER_FIRST has {len(first)} names, not 50"
    assert len(set(first)) == 50, "DRIVER_FIRST has duplicates"
    head = list(queries)[:50]
    assert head == first, (
        f"queries() does not lead with DRIVER_FIRST: first divergence at "
        f"{next(i for i, (a, b) in enumerate(zip(head, first)) if a != b)}"
    )
    receipt["driver_first_ok"] = True

    # the driver's environment: a bare session, no session.py defaults
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("driver-gate-selfcheck")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )

    n = entry_mod.entry(spark).count()
    assert n >= 0
    receipt["entry_rows"] = n

    from codecdb_queryengine_spark.oracle import compare

    gate = first[0]
    sf_dir = os.environ.get("SELFCHECK_SF_DIR", "/root/testdata/sf0.01")
    df = queries[gate](spark, sf_dir)
    ok, detail = compare(df, oracles[gate], sf_dir, ndigits=None)  # bit-exact
    assert ok, f"first windowed gate {gate} failed its oracle: {detail}"
    receipt["first_gate"] = gate
    receipt["first_gate_ok"] = True

    receipt["ok"] = True
    receipt["wall_s"] = round(time.time() - t0, 1)
    line = json.dumps(receipt, sort_keys=True)
    try:
        with open(os.path.join(REPO, "SELFCHECK.json"), "w") as f:
            f.write(line + "\n")
    except OSError as e:
        print(f"SELFCHECK.json not written: {e}", file=sys.stderr)
    print(line)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
