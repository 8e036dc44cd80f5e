"""Z-order layout tests: the interleave is a true Morton code, and
zorder_write produces files covering disjoint z-ranges (what makes
min/max stats prune on every clustered column)."""

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from codecdb_queryengine_spark.sources.layout import z_value, z_value_sql, zorder_write


def _py_z(vals, bits):
    z = 0
    for b in range(bits):
        for i, v in enumerate(vals):
            z += ((v >> b) & 1) << (b * len(vals) + i)
    return z


def test_z_value_matches_python_morton(spark):
    rows = [(x, y) for x in range(0, 64, 7) for y in range(0, 64, 5)]
    df = spark.createDataFrame(rows, ["x", "y"])
    got = {
        (r.x, r.y): r.z
        for r in df.withColumn("z", z_value([F.col("x"), F.col("y")], bits=6)).collect()
    }
    for x, y in rows:
        assert got[(x, y)] == _py_z([x, y], 6)


def test_z_value_sql_matches_column_form(spark):
    rows = [(x, y) for x in range(0, 33, 3) for y in range(0, 33, 4)]
    df = spark.createDataFrame(rows, ["x", "y"])
    import duckdb

    sql_expr = z_value_sql(["x", "y"], bits=6)
    pdf = df.toPandas()
    oracle = duckdb.sql(f"SELECT x, y, {sql_expr} AS z FROM pdf").df()
    got = {
        (r.x, r.y): r.z
        for r in df.withColumn("z", z_value([F.col("x"), F.col("y")], bits=6)).collect()
    }
    for _, row in oracle.iterrows():
        assert got[(row.x, row.y)] == row.z


def test_zorder_write_files_cover_disjoint_z_ranges(spark):
    out = tempfile.mkdtemp(prefix="sg_zorder_")
    try:
        df = spark.range(4096).select(
            (F.col("id") % 64).alias("x"),
            (F.col("id") / 64).cast("long").alias("y"),
            F.col("id").alias("payload"),
        )
        zorder_write(df, ["x", "y"], out, bits=6, num_files=8)
        back = spark.read.parquet(out).withColumn(
            "z", z_value([F.col("x"), F.col("y")], bits=6)
        )
        ranges = (
            back.withColumn("f", F.input_file_name())
            .groupBy("f")
            .agg(F.min("z").alias("lo"), F.max("z").alias("hi"), F.count("*").alias("n"))
            .collect()
        )
        assert len(ranges) > 1
        assert sum(r.n for r in ranges) == 4096
        spans = sorted((r.lo, r.hi) for r in ranges)
        for (lo1, hi1), (lo2, _hi2) in zip(spans, spans[1:]):
            assert hi1 <= lo2, f"overlapping file z-ranges: ({lo1},{hi1}) vs ({lo2},_)"
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_z_value_validations(spark):
    import pytest

    with pytest.raises(ValueError):
        z_value([F.col("x")], bits=4)
    with pytest.raises(ValueError):
        z_value([F.col("x"), F.col("y"), F.col("w")], bits=21)
