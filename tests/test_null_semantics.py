"""Null handling, defined and pinned explicitly.

The reference assumes no nulls exist ("Assume all fields are mandatory",
reference: cpp/src/lqf/data_model.h:365); its only null-like behavior is
outer-join miss rows filled from MemDataRow::EMPTY (cpp/src/lqf/join.cc:
255-288).  Our engine inherits full Spark SQL null semantics — these tests
pin the behaviors queries rely on so the upgrade is deliberate, not
accidental (SURVEY.md §7 risk 5)."""

from pyspark.sql import functions as F


def _t(spark):
    return spark.createDataFrame(
        [(1, 10.0), (2, None), (None, 30.0)],
        "k int, v double",
    )


def test_null_keys_never_join(spark):
    left = _t(spark)
    right = spark.createDataFrame([(1, "a"), (None, "n")], "k int, s string")
    inner = left.join(right, ["k"]).collect()
    # SQL equality: NULL = NULL is not true -> the null-key rows drop out
    assert [(r.k, r.s) for r in inner] == [(1, "a")]


def test_count_star_vs_count_col(spark):
    row = _t(spark).agg(
        F.count(F.lit(1)).alias("n_star"),
        F.count("v").alias("n_v"),
        F.count("k").alias("n_k"),
    ).collect()[0]
    assert (row.n_star, row.n_v, row.n_k) == (3, 2, 2)


def test_agg_ignores_nulls_sum_of_empty_is_null(spark):
    df = spark.createDataFrame([(1, None), (1, None), (2, 5.0)], "k int, v double")
    rows = {r.k: r.s for r in df.groupBy("k").agg(F.sum("v").alias("s")).collect()}
    assert rows[1] is None and rows[2] == 5.0


def test_outer_join_count_zero_groups(spark):
    """The Q13 pattern (reference emits count=0 via EMPTY rows,
    cpp/src/lqf/tpch/query13.cc:29-33): left outer + count(right-col)
    yields 0, not 1, for miss rows."""
    cust = spark.createDataFrame([(1,), (2,)], ["c"])
    orders = spark.createDataFrame([(1, 100)], ["c", "o"])
    got = {
        r.c: r.n
        for r in cust.join(orders, ["c"], "left")
        .groupBy("c")
        .agg(F.count("o").alias("n"))
        .collect()
    }
    assert got == {1: 1, 2: 0}


def test_null_sort_order_default(spark):
    vals = [r.k for r in _t(spark).orderBy(F.col("k").asc()).collect()]
    assert vals == [None, 1, 2]  # Spark default: nulls first on asc
    vals = [r.k for r in _t(spark).orderBy(F.col("k").asc_nulls_last()).collect()]
    assert vals == [1, 2, None]


def test_comparison_with_null_filters_out(spark):
    assert _t(spark).filter(F.col("v") > 0).count() == 2
    assert _t(spark).filter(~(F.col("v") > 0)).count() == 0  # NULL is not true either way
