"""Crash-safe layout swaps (r7 verdict item 3 / ADVICE): the journaled
two-phase swap must fail fast on stale state, survive a kill at any point in
the move loop (recover_swap rolls forward to the staged generation), and the
selective compaction must touch only the fragmented partitions."""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from codecdb_queryengine_spark.sources import io as IO


def _mkdocs(spark, n=60):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3).cast("string").alias("part"),
        (F.col("id") * 7).alias("payload"),
        F.lit(0).cast("long").alias("version"),
    )


def _snapshot(path):
    """(relative file path -> size) for every data file under path."""
    out = {}
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.startswith((".", "_")):
                continue
            p = os.path.join(root, f)
            out[os.path.relpath(p, path)] = os.path.getsize(p)
    return out


def _rows(spark, path):
    return sorted(
        map(tuple, spark.read.parquet(path).select("doc_id", "payload").collect())
    )


def test_upsert_null_partition_raises(spark):
    base = tempfile.mkdtemp(prefix="upsert_null_")
    path = os.path.join(base, "t")
    _mkdocs(spark).write.partitionBy("part").parquet(path)
    updates = spark.range(3).select(
        F.col("id").alias("doc_id"),
        F.lit(None).cast("string").alias("part"),
        F.lit(0).alias("payload"),
        F.lit(1).cast("long").alias("version"),
    )
    with pytest.raises(ValueError, match="NULL"):
        IO.upsert_partitioned(
            spark, path, updates, key_cols=("doc_id",),
            partition_col="part", order_col="version",
        )


def test_stale_manifest_and_stale_old_fail_fast(spark):
    base = tempfile.mkdtemp(prefix="swap_stale_")
    path = os.path.join(base, "t")
    _mkdocs(spark).write.partitionBy("part").parquet(path)
    # stale manifest -> every maintenance entry point refuses to write
    with open(IO._manifest_path(path), "w") as f:
        f.write('{"tmp": "/nonexistent", "promote": [], "drop": []}')
    with pytest.raises(RuntimeError, match="recover_swap"):
        IO.compact_partitioned(spark, path, partition_by=("part",))
    assert IO.recover_swap(path) is True
    # stale .old aside (pre-journal crash artifact) -> swap refuses
    os.makedirs(os.path.join(path, "part=0.old"))
    tmp = path + ".upserting"
    os.makedirs(os.path.join(tmp, "part=0"))
    with pytest.raises(RuntimeError, match="stale aside"):
        IO.swap_partition_dirs(path, tmp, promote=["part=0"])
    shutil.rmtree(os.path.join(path, "part=0.old"))
    shutil.rmtree(tmp)


@pytest.mark.parametrize("fail_after", [0, 1, 2, 3, 4, 5])
def test_swap_killed_mid_loop_recovers_to_staged_generation(spark, fail_after):
    """Kill the swap after each possible number of renames; recover_swap must
    always restore the layout to exactly the staged (new) generation."""
    base = tempfile.mkdtemp(prefix=f"swap_kill_{fail_after}_")
    path = os.path.join(base, "t")
    _mkdocs(spark).write.partitionBy("part").parquet(path)
    new = _mkdocs(spark).withColumn("payload", F.col("payload") + 1)
    tmp = path + ".upserting"
    new.repartition(3, "part").write.partitionBy("part").parquet(tmp)
    expected = _rows(spark, tmp)
    entries = sorted(e for e in os.listdir(tmp) if e.startswith("part="))

    real_rename = os.rename
    calls = {"n": 0}

    def flaky(src, dst):
        if calls["n"] >= fail_after:
            raise OSError("killed mid-swap")
        calls["n"] += 1
        real_rename(src, dst)

    os.rename = flaky
    try:
        with pytest.raises(OSError, match="killed"):
            IO.swap_partition_dirs(path, tmp, promote=entries)
    finally:
        os.rename = real_rename
    # the manifest pins the in-flight swap; writes fail fast until recovered
    with pytest.raises(RuntimeError, match="recover_swap"):
        IO.swap_partition_dirs(path, tmp, promote=entries)
    assert IO.recover_swap(path) is True
    assert _rows(spark, path) == expected
    # recovery is idempotent and leaves no journal artifacts behind
    assert IO.recover_swap(path) is False
    assert not os.path.exists(tmp)
    assert not any(e.endswith(".old") for e in os.listdir(path))


def test_whole_layout_swap_killed_between_renames_recovers(spark):
    base = tempfile.mkdtemp(prefix="swap_whole_")
    path = os.path.join(base, "t")
    _mkdocs(spark).write.parquet(path)
    tmp = path + ".compacting"
    _mkdocs(spark).withColumn("payload", F.col("payload") + 1).coalesce(1).write.parquet(tmp)
    expected = _rows(spark, tmp)

    real_rename = os.rename
    calls = {"n": 0}

    def flaky(src, dst):
        if calls["n"] >= 1:  # first rename (path -> .old) succeeds, then die
            raise OSError("killed mid-swap")
        calls["n"] += 1
        real_rename(src, dst)

    os.rename = flaky
    try:
        with pytest.raises(OSError, match="killed"):
            IO.swap_layout(path, tmp)
    finally:
        os.rename = real_rename
    assert not os.path.exists(path)  # the dangerous window recover must close
    assert IO.recover_swap(path) is True
    assert _rows(spark, path) == expected


def test_swap_drop_entries_remove_partitions(spark):
    """A partition whose every row was deleted is staged as a `drop` entry:
    the swap removes it, and recovery after a kill still removes it."""
    base = tempfile.mkdtemp(prefix="swap_drop_")
    path = os.path.join(base, "t")
    _mkdocs(spark).write.partitionBy("part").parquet(path)
    kept = _mkdocs(spark).filter(F.col("part") != "2")
    tmp = path + ".upserting"
    kept.repartition(2, "part").write.partitionBy("part").parquet(tmp)
    IO.swap_partition_dirs(
        path, tmp, promote=["part=0", "part=1"], drop=["part=2"]
    )
    assert not os.path.exists(os.path.join(path, "part=2"))
    assert _rows(spark, path) == sorted(
        map(tuple, kept.select("doc_id", "payload").collect())
    )


def test_selective_compaction_touches_only_fragmented_partitions(spark):
    base = tempfile.mkdtemp(prefix="compact_sel_")
    path = os.path.join(base, "t")
    docs = _mkdocs(spark, n=90)
    # part=0 fragmented into ~12 files; parts 1 and 2 written compact
    docs.filter(F.col("part") == "0").repartition(12).write.partitionBy(
        "part"
    ).parquet(path)
    docs.filter(F.col("part") != "0").coalesce(1).write.mode("append").partitionBy(
        "part"
    ).parquet(path)
    before = _rows(spark, path)
    snap_before = _snapshot(path)
    untouched_before = {
        k: v for k, v in snap_before.items() if not k.startswith("part=0/")
    }
    frag_before = sum(1 for k in snap_before if k.startswith("part=0/"))
    assert frag_before > 8

    done = IO.compact_partitioned_selective(
        spark, path, partition_by=("part",), min_files=8,
        target_file_bytes=1 << 30,
    )
    assert done == ["part=0"]
    snap_after = _snapshot(path)
    untouched_after = {
        k: v for k, v in snap_after.items() if not k.startswith("part=0/")
    }
    # untouched partitions byte-identical (same files, same sizes)
    assert untouched_after == untouched_before
    # the fragmented partition shrank to ~1 file and content is unchanged
    frag_after = sum(1 for k in snap_after if k.startswith("part=0/"))
    assert frag_after < frag_before and frag_after <= 2
    assert _rows(spark, path) == before
    # below-threshold layout is a no-op
    assert IO.compact_partitioned_selective(
        spark, path, partition_by=("part",), min_files=8
    ) == []
