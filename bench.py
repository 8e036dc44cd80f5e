#!/usr/bin/env python3
"""Benchmark harness: run the headline query set at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Protocol (BASELINE.md): warm session — one untimed warmup pass of a small
query excludes JVM/session startup; then each query is timed as the median
of N_RUNS executions of a full materialization (collect of the result,
which is small for every TPC-H/SSB aggregate).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from codecdb_queryengine_spark.session import get_spark

N_RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))


def _current_round() -> tuple[int, str]:
    """Which build round this bench belongs to (r7 verdict item 6).

    SPARK_GRAFT_ROUND wins when the harness provides it.  Otherwise infer
    from the driver's artifact sequence: the driver writes
    CORRECTNESS_r{N}.json and then benches IMMEDIATELY (its round-N bench
    runs minutes after the artifact), while the builder benches mid-round
    N+1, long after round N closed — so a freshly written newest artifact
    (< 30 min) means this IS the driver's round-N close bench, and a stale
    one means the builder is already inside round N+1.  The chosen round
    and its basis are embedded in the payload so artifact diffs never have
    to re-derive the attribution."""
    import glob
    import re
    import time as _time

    env = os.environ.get("SPARK_GRAFT_ROUND")
    if env:
        return int(env), "env"
    here = os.path.dirname(os.path.abspath(__file__))
    arts = {
        int(m.group(1)): p
        for p in glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))
        if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", p))
    }
    if not arts:
        return 1, "no_artifacts"
    newest = max(arts)
    age = _time.time() - os.path.getmtime(arts[newest])
    if age < 1800:
        return newest, f"newest_correctness_fresh_{int(age)}s"
    return newest + 1, f"newest_correctness_stale_{int(age)}s"


def _load_stamp() -> dict:
    """Ambient-load snapshot for the artifact itself (r10 verdict item 3:
    twice the round comparison was muddied by shared-host load, and the
    evidence lived only in BASELINE.md prose).  1-min loadavg plus the
    cgroup CPU pressure (PSI avg10/avg60 %, when the kernel exposes it) —
    stamped before and after the run so any future 1.2× artifact
    self-documents whether its window was quiet."""
    stamp: dict = {}
    try:
        stamp["loadavg_1m"] = round(os.getloadavg()[0], 2)
    except OSError:
        pass
    for path in ("/sys/fs/cgroup/cpu.pressure", "/proc/pressure/cpu"):
        try:
            with open(path) as f:
                line = next(l for l in f if l.startswith("some"))
            kv = dict(p.split("=") for p in line.split()[1:])
            stamp["cpu_pressure_some_avg10"] = float(kv["avg10"])
            stamp["cpu_pressure_some_avg60"] = float(kv["avg60"])
            break
        except (OSError, StopIteration, KeyError, ValueError):
            continue
    return stamp


def main() -> None:
    import __spark_entry__ as entry_mod

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # parse sf from dir name, e.g. .../sf0.1
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        sf = float(base.replace("sf", ""))
    except ValueError:
        sf = -1.0

    # Pure-serve lifecycle gates reuse one base-layout build per process
    # (r9 verdict item 3): the timed number for the BENCH_PREBUILT family
    # becomes the serve (the single building run falls out of the median).
    # The correctness gate never sets this, so its timing stays
    # fixture-free.  SPARK_GRAFT_PREBUILT_LAYOUTS=0 restores rebuilds.
    os.environ.setdefault("SPARK_GRAFT_PREBUILT_LAYOUTS", "1")

    load_before = _load_stamp()

    spark = get_spark("bench")
    queries = entry_mod.queries()

    # warmup: session + IO path, untimed
    queries["q6"](spark, sf_dir).collect()
    # warm the Python worker pool + Arrow serialization path too: the first
    # pandas-UDF stage otherwise pays worker spawn + pandas import inside a
    # TIMED query (measured 10-15 s extra on the first dedup_minhash run).
    # mapInPandas, not pandas_udf: `from __future__ import annotations`
    # turns hints into strings, which pandas_udf's hint resolver rejects.
    spark.range(256).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).collect()

    skip = getattr(entry_mod, "BENCH_SKIP", set())
    # Family isolation (r8 verdict item 4): the index-building lifecycle
    # gates churn the JVM heap (layout writes, journaled swaps, streaming
    # micro-batches) and were measured skewing sub-second relational
    # queries 2-3x when interleaved.  The relational/streaming core runs
    # FIRST in registry order, the lifecycle family LAST, with a
    # cache-clear + explicit JVM GC at the boundary.
    lifecycle = getattr(entry_mod, "BENCH_LIFECYCLE", frozenset())
    ordered = [
        (n, f) for n, f in queries.items() if n not in skip and n not in lifecycle
    ] + [(n, f) for n, f in queries.items() if n not in skip and n in lifecycle]
    boundary = len(ordered) - sum(1 for n, _ in ordered if n in lifecycle)

    def _time_once(fn) -> float:
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        dt = time.perf_counter() - t0
        # Queries with mat() points persist a NEW DataFrame per run;
        # without this the executor cache accumulates dead entries all
        # suite long and GC pressure skews later queries' timings.
        spark.catalog.clearCache()
        return dt

    # Prebuilt fixture hygiene (r10 advice): the fixture previously relied
    # on the median of N_RUNS discarding the single layout-BUILDING run —
    # true only for odd N_RUNS ≥ 3.  Run each BENCH_PREBUILT gate once
    # UNTIMED first (creates the layout + marker), so every timed run is a
    # serve no matter what SPARK_GRAFT_BENCH_RUNS says.
    prebuilt = (
        getattr(entry_mod, "BENCH_PREBUILT", frozenset())
        if os.environ.get("SPARK_GRAFT_PREBUILT_LAYOUTS") == "1"
        else frozenset()
    )

    per_query: dict[str, float] = {}
    for i, (name, fn) in enumerate(ordered):
        if i == boundary:
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            time.sleep(1.0)
        if name in prebuilt:
            _time_once(fn)  # untimed: creates the prebuilt layout + marker
        times = [_time_once(fn) for _ in range(N_RUNS)]
        # Sub-second entries swing 2-3x on scheduler/GC noise alone (r8
        # verdict item 4): tighten them to median-of-5.
        if statistics.median(times) < 1.0:
            times += [_time_once(fn) for _ in range(2)]
        if os.environ.get("SPARK_GRAFT_BENCH_VERBOSE"):
            print(f"{name}: {[round(t, 2) for t in times]}", file=sys.stderr)
        per_query[name] = round(statistics.median(times), 4)

    total = round(sum(per_query.values()), 4)
    rnd, basis = _current_round()
    payload = {
        "metric": "query_suite_total_median_wall",
        "value": total,
        "unit": "sec",
        "queries": per_query,
        "sf": sf,
        "round": rnd,
        "round_basis": basis,
        "load": {"before": load_before, "after": _load_stamp()},
    }
    # The driver's artifact keeps only a truncated tail of this output, so
    # the early entries of the ~150-query map were lost from BENCH_r*.json
    # (r4 verdict item 3).  Persist the complete payload in-repo too; the
    # stdout line stays the driver contract.
    try:
        here = os.path.dirname(os.path.abspath(__file__))
        with open(os.path.join(here, "BENCH_full.json"), "w") as f:
            json.dump(payload, f, indent=1, sort_keys=True)
        # Round-keyed copy so r-over-r per-query deltas never depend on the
        # driver's truncated BENCH_r{N}.json tail (r6 verdict item 7).
        with open(os.path.join(here, f"BENCH_full_r{rnd:02d}.json"), "w") as f:
            json.dump(payload, f, indent=1, sort_keys=True)
    except OSError as e:  # read-only checkout: the stdout line still ships
        print(f"BENCH_full.json not written: {e}", file=sys.stderr)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
