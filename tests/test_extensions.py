"""Extension surface tests: set ops in the plan builder, approx-distinct
accuracy, source/sink round-trips."""

import os
import tempfile

from pyspark.sql import functions as F

from codecdb_queryengine_spark.catalog import load_tables
from codecdb_queryengine_spark.plans.builder import Plan
from codecdb_queryengine_spark.sources import io


def test_builder_set_ops(spark):
    a = Plan(spark.createDataFrame([(1,), (2,), (3,)], ["x"]))
    b = Plan(spark.createDataFrame([(2,), (3,), (4,)], ["x"]))
    assert sorted(r.x for r in a.union_all(b).done().collect()) == [1, 2, 2, 3, 3, 4]
    assert sorted(r.x for r in a.intersect(b).done().collect()) == [2, 3]
    assert sorted(r.x for r in a.except_all(b).done().collect()) == [1]


def test_builder_filter_union_and_mat(spark):
    df = spark.createDataFrame([(i,) for i in range(10)], ["x"])
    p = (
        Plan(df)
        .filter_union(F.col("x") < 2, F.col("x") > 7)
        .mat()
        .sort(F.col("x").asc())
    )
    assert [r.x for r in p.collect()] == [0, 1, 8, 9]


def test_mat_lifecycle_no_cache_growth(spark):
    """Repeated mat()-plan executions must not grow the persisted-RDD set:
    collect() releases the chain's persists, and mats survive joins into
    other chains until the owning chain releases them."""
    import time

    sc = spark.sparkContext._jsc.sc()
    spark.catalog.clearCache()
    baseline = len(sc.getRDDStorageInfo())
    df = spark.createDataFrame([(i, i % 3) for i in range(100)], ["x", "k"])
    dim = spark.createDataFrame([(0, "a"), (1, "b")], ["k", "name"])
    for _ in range(5):
        shared = Plan(df).filter(F.col("x") > 10).mat()
        out = shared.join(Plan(dim), "k", broadcast=True).agg(
            F.count(F.lit(1)).alias("n"), by=["name"]
        )
        rows = out.collect()  # materialize + auto-release the mat
        assert len(rows) == 2
    for _ in range(10):  # unpersist is async; give the executor a beat
        if len(sc.getRDDStorageInfo()) <= baseline:
            break
        time.sleep(0.5)
    assert len(sc.getRDDStorageInfo()) <= baseline


def test_stats_approx_close_to_exact(spark, sf_dir):
    """percentile_approx (the mergeable 100-TB path) must track the exact
    per-group percentiles: with accuracy=10000 the GK sketch's rank error
    is ≤ n/10000.  The query now self-checks the sketch contract (rank
    bound + element-of-group, r5) and emits booleans; this test pins them
    TRUE and keeps the value-level cross-check against exact percentile."""
    from codecdb_queryengine_spark.queries.extensions import ext_stats, ext_stats_approx

    exact = {r.l_returnflag: r for r in ext_stats(spark, sf_dir).collect()}
    approx = {r.l_returnflag: r for r in ext_stats_approx(spark, sf_dir).collect()}
    assert set(exact) == set(approx)
    li = load_tables(spark, sf_dir)["lineitem"]
    raw = {
        r.l_returnflag: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.expr("percentile_approx(l_extendedprice, array(0.5, 0.95), 10000)").alias(
                "p"
            )
        )
        .collect()
    }
    for flag, e in exact.items():
        a = approx[flag]
        assert a.median_rank_ok and a.median_is_element
        assert a.p95_rank_ok and a.p95_is_element
        assert abs(raw[flag].p[0] - e.price_median) / e.price_median < 0.01
        assert abs(raw[flag].p[1] - e.price_p95) / e.price_p95 < 0.01
        # non-sketch columns agree to fp-merge-order tolerance (two separate
        # jobs may merge partial aggregates in different orders)
        assert abs(a.price_stddev - e.price_stddev) / e.price_stddev < 1e-9


def test_approx_distinct_close_to_exact(spark, sf_dir):
    li = load_tables(spark, sf_dir)["lineitem"]
    row = li.agg(
        F.approx_count_distinct("l_orderkey").alias("approx"),
        F.countDistinct("l_orderkey").alias("exact"),
    ).collect()[0]
    assert abs(row.approx - row.exact) / row.exact < 0.1  # HLL default rsd 5%


def test_io_roundtrip_formats(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5)], ["id", "name", "v"]
    )
    with tempfile.TemporaryDirectory() as d:
        for fmt in ["parquet", "csv", "json", "orc"]:
            path = os.path.join(d, fmt)
            io.write(df, path, fmt=fmt)
            schema = "id long, name string, v double" if fmt in ("csv", "json") else None
            back = io.read(spark, path, fmt=fmt, schema=schema)
            got = sorted((r.id, r.name, r.v) for r in back.collect())
            assert got == [(1, "a", 1.5), (2, "b", 2.5)], fmt


def test_io_partitioned_write_prunes(spark):
    df = spark.createDataFrame(
        [(i, "even" if i % 2 == 0 else "odd") for i in range(100)], ["id", "par"]
    )
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "t")
        io.write(df, path, partition_by=["par"])
        back = io.read(spark, path).filter(F.col("par") == "even")
        assert back.count() == 50
        plan = back._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [isnotnull(par" in plan or "par#" in plan


def test_bucketed_join_eliminates_shuffle(spark):
    """Bucketed tables co-partition equi-joins: neither side shuffles —
    the Spark analog of the reference pre-building reusable hash
    containers (cpp/src/lqf/mat.h:30-55).  At 100 TB this turns repeated
    fact-fact joins into zero-exchange map-side joins."""
    a = spark.range(1000).selectExpr("id AS k", "id * 2 AS va")
    b = spark.range(1000).selectExpr("id AS k", "id * 3 AS vb")
    spark.sql("DROP TABLE IF EXISTS t_bucket_a")
    spark.sql("DROP TABLE IF EXISTS t_bucket_b")
    io.write_bucketed(a, "t_bucket_a", bucket_by=["k"], num_buckets=8, sort_by=["k"])
    io.write_bucketed(b, "t_bucket_b", bucket_by=["k"], num_buckets=8, sort_by=["k"])
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("t_bucket_a").join(spark.table("t_bucket_b"), "k")
        assert joined.count() == 1000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_bucket_a")
        spark.sql("DROP TABLE IF EXISTS t_bucket_b")


def test_compact_reduces_file_count_preserves_rows(spark, tmp_path):
    import pathlib

    path = str(tmp_path / "frag")
    df = spark.range(10_000).selectExpr("id", "id % 7 AS g")
    df.repartition(50).write.parquet(path)
    n_before = len(list(pathlib.Path(path).glob("*.parquet")))
    assert n_before == 50
    n_target = io.compact(spark, path, target_file_bytes=512 * 1024)
    n_after = len(list(pathlib.Path(path).glob("*.parquet")))
    assert n_after == n_target < n_before
    back = spark.read.parquet(path)
    assert back.count() == 10_000
    assert back.agg(F.sum("id")).collect()[0][0] == 10_000 * 9_999 // 2


def test_compact_partitioned_keeps_layout_and_content(spark, tmp_path):
    """compact_partitioned (r6 verdict item 5): shrinks the per-partition
    small-file population, KEEPS the partition directories (so pruning
    survives), and preserves content exactly."""
    path = str(tmp_path / "part_frag")
    df = spark.range(10_000).selectExpr("id", "CAST(id % 4 AS INT) AS b")
    # simulate 5 micro-batch appends: 5 writer rounds x 4 partitions
    df.repartition(5).write.partitionBy("b").parquet(path)
    for _ in range(4):
        df.repartition(5).write.mode("append").partitionBy("b").parquet(path)
    n_before = io.data_file_count(path)
    assert n_before >= 20
    io.compact_partitioned(spark, path, partition_by=("b",), target_file_bytes=1 << 30)
    n_after = io.data_file_count(path)
    assert n_after < n_before
    import pathlib

    dirs = {d.name for d in pathlib.Path(path).iterdir() if d.is_dir()}
    assert dirs == {f"b={i}" for i in range(4)}
    back = spark.read.parquet(path)
    assert back.count() == 50_000
    assert back.agg(F.sum("id")).collect()[0][0] == 5 * (10_000 * 9_999 // 2)
    # partition pruning still fires on the kept layout
    pruned = back.filter(F.col("b") == 1)
    assert pruned.count() == 12_500


def test_upsert_partitioned_latest_wins_touches_only_named_partitions(spark, tmp_path):
    """upsert_partitioned (r7): latest-wins by order column, inserts land,
    and partitions absent from the batch are never rewritten (same file
    inventory, same bytes)."""
    import os
    import pathlib

    path = str(tmp_path / "ups")
    base = spark.createDataFrame(
        [(i, f"t{i}", "a" if i % 2 else "b", 0) for i in range(100)],
        "k long, payload string, part string, version long",
    )
    base.write.partitionBy("part").parquet(path)
    before = {
        str(f): f.stat().st_mtime_ns
        for f in pathlib.Path(os.path.join(path, "part=b")).rglob("*")
        if f.is_file()
    }
    updates = spark.createDataFrame(
        [(1, "rev1", "a", 1), (3, "rev3", "a", 1), (1000, "new", "a", 1)],
        "k long, payload string, part string, version long",
    )
    n = io.upsert_partitioned(
        spark, path, updates, key_cols=("k",), partition_col="part",
        order_col="version",
    )
    assert n == 1
    after = {
        str(f): f.stat().st_mtime_ns
        for f in pathlib.Path(os.path.join(path, "part=b")).rglob("*")
        if f.is_file()
    }
    assert after == before  # untouched partition: same files, same mtimes
    back = spark.read.parquet(path)
    assert back.count() == 101
    got = {r.k: (r.payload, r.version) for r in back.filter("k in (1, 3, 1000, 5)").collect()}
    assert got == {
        1: ("rev1", 1),
        3: ("rev3", 1),
        1000: ("new", 1),
        5: ("t5", 0),
    }


def test_upsert_partitioned_refuses_ambiguous_winner(spark, tmp_path):
    import pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    path = str(tmp_path / "ups_dup")
    spark.createDataFrame(
        [(1, "x", "a", 0)], "k long, payload string, part string, version long"
    ).write.partitionBy("part").parquet(path)
    dup = spark.createDataFrame(
        [(1, "u1", "a", 1), (1, "u2", "a", 1)],
        "k long, payload string, part string, version long",
    )
    with pytest.raises(SparkRuntimeException, match="no deterministic winner"):
        io.upsert_partitioned(
            spark, path, dup, key_cols=("k",), partition_col="part",
            order_col="version",
        )
