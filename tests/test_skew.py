"""Salted join / salted agg must be row-for-row equal to the plain forms
on a synthetically skewed input (one key holds 90% of rows)."""

from pyspark.sql import functions as F

from codecdb_queryengine_spark.operators import skew


def _skewed(spark, n=2000):
    # key 7 holds ~90% of rows, keys 0..9 share the rest
    df = spark.range(n).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 10).alias("k"),
        (F.col("id") * 1.5).alias("v"),
        F.col("id"),
    )
    return df


def test_salted_join_equals_plain(spark):
    left = _skewed(spark)
    right = spark.createDataFrame(
        [(i, f"dim{i}") for i in range(10)], ["k", "name"]
    )
    plain = sorted(
        (r.id, r.name) for r in left.join(right, ["k"]).collect()
    )
    salted = sorted(
        (r.id, r.name) for r in skew.salted_join(left, right, ["k"], salt=8).collect()
    )
    assert salted == plain and len(plain) == 2000


def test_salted_join_left_outer(spark):
    left = _skewed(spark)
    right = spark.createDataFrame([(7, "hot")], ["k", "name"])
    plain = sorted(
        (r.id, r.name) for r in left.join(right, ["k"], "left").collect()
    )
    salted = sorted(
        (r.id, r.name)
        for r in skew.salted_join(left, right, ["k"], how="left", salt=4).collect()
    )
    assert salted == plain


def test_salted_agg_equals_plain(spark):
    df = _skewed(spark)
    plain = {
        r.k: (round(r.s, 6), r.n)
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    salted = {
        r.k: (round(r.s, 6), r.n)
        for r in skew.salted_agg(
            df, ["k"], sums={"s": F.col("v")}, count_alias="n", salt=16
        ).collect()
    }
    assert salted == plain
