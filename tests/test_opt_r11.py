"""Focused tests for the r11 optimization round's operator-internal changes:
write-task sizing, the shared slot plan, driver-side tiny-meta IO, and the
streaming state-partition scope."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from codecdb_queryengine_spark.sources import ann_index as AI
from codecdb_queryengine_spark.sources import io as IO


def test_write_task_count_bounds(spark):
    cap = int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert IO.write_task_count(spark, 0) == 1
    assert IO.write_task_count(spark, 1) == 1
    # never exceeds the session's shuffle parallelism (the cluster knob)
    assert IO.write_task_count(spark, 10**9) == cap
    # monotone in the directory count
    assert IO.write_task_count(spark, 64) <= IO.write_task_count(spark, 640)


def test_slot_plan_matches_ceil_rule():
    assert AI._slot_plan({3: 1, 7: 16, 5: 17}, 16) == [(3, 1), (5, 2), (7, 1)]
    # zero-row lists are the caller's business; min 1 slot when present
    assert AI._slot_plan({1: 0}, 16) == [(1, 1)]


def test_tiny_meta_roundtrip_both_engines(spark, tmp_path):
    """pyarrow-written meta must be Spark-readable and vice versa — the
    local fast path and the schemed-storage fallback share one on-disk
    format."""
    pa = pytest.importorskip("pyarrow")
    p1 = str(tmp_path / "meta_pa")
    assert IO.tiny_meta_write(
        p1, pa.table({"num_buckets": pa.array([32], type=pa.int32())})
    )
    assert spark.read.parquet(p1).first()["num_buckets"] == 32
    p2 = str(tmp_path / "meta_spark")
    spark.createDataFrame([(7,)], "num_buckets int").coalesce(1).write.mode(
        "overwrite"
    ).parquet(p2)
    t = IO.tiny_meta_read(p2)
    assert t is not None and t.column("num_buckets")[0].as_py() == 7
    # schemed paths decline, so callers fall back to Spark
    assert IO.tiny_meta_read("s3a://bucket/meta") is None
    assert not IO.tiny_meta_write(
        "hdfs://nn/meta", pa.table({"x": pa.array([1])})
    )


def test_tiny_meta_col_max_exact(spark, tmp_path):
    p = str(tmp_path / "dg")
    spark.createDataFrame(
        [(1, 3), (2, 9), (3, 4)], "doc_id long, gen long"
    ).coalesce(1).write.mode("overwrite").parquet(p)
    assert IO.tiny_meta_col_max(p, "gen") == 9
    assert IO.tiny_meta_col_max(p, "missing_col") is None
    assert IO.tiny_meta_col_max("s3a://x/y", "gen") is None


def test_one_file_per_partition_dir_after_sized_build(spark, tmp_path):
    """The sized exchange must keep the one-file-per-directory layout the
    serve contract (and the swap bookkeeping) relies on."""
    emb = spark.range(200).select(
        F.col("id").alias("vec_id"),
        F.array(*[(F.col("id") % 7 + i).cast("float") for i in range(4)]).alias(
            "embedding"
        ),
    )
    path = str(tmp_path / "idx")
    AI.ivf_index_build(emb, path, centroid_mod=29, max_list_rows=16)
    lists = os.path.join(path, "lists")
    for c_dir in os.listdir(lists):
        if not c_dir.startswith("c_list="):
            continue
        for slot_dir in os.listdir(os.path.join(lists, c_dir)):
            if not slot_dir.startswith("c_slot="):
                continue
            files = [
                f
                for f in os.listdir(os.path.join(lists, c_dir, slot_dir))
                if f.endswith(".parquet")
            ]
            assert len(files) == 1, (c_dir, slot_dir, files)


def test_state_partition_scope_restores(spark):
    from codecdb_queryengine_spark.streaming import events as E

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    with E.state_partition_scope(spark, 5):
        assert spark.conf.get("spark.sql.shuffle.partitions") == "5"
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev
    # default policy: conf override wins, else max(8, parallelism/2)
    assert E.default_state_partitions(spark) >= 8
