"""as-of / range join semantics on hand-built fixtures."""

import datetime

import pytest

from codecdb_queryengine_spark.operators import temporal


def _ts(s):
    return datetime.datetime(2024, 1, 1, 0, 0, s)


@pytest.fixture
def sides(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), "l1"), (1, _ts(30), "l2"), (2, _ts(5), "l3")],
        ["k", "ts", "tag"],
    )
    right = spark.createDataFrame(
        [(1, _ts(10), 100.0), (1, _ts(20), 200.0), (2, _ts(50), 500.0)],
        ["k", "ts", "v"],
    )
    return left, right


def test_asof_backward_inclusive(sides):
    left, right = sides
    got = {
        r.tag: r.v
        for r in temporal.asof_join(left, right, ["k"], "ts", ["v"]).collect()
    }
    # l1 matches the equal-ts right row (inclusive); l2 the latest prior;
    # l3 has no prior right row.
    assert got == {"l1": 100.0, "l2": 200.0, "l3": None}


def test_asof_forward(sides):
    left, right = sides
    got = {
        r.tag: r.v
        for r in temporal.asof_join(
            left, right, ["k"], "ts", ["v"], direction="forward"
        ).collect()
    }
    assert got == {"l1": 100.0, "l2": None, "l3": 500.0}


def test_range_join_bounds(spark):
    left = spark.createDataFrame([(1, _ts(30), "L")], ["k", "ts", "tag"])
    right = spark.createDataFrame(
        [(1, _ts(s), s) for s in (19, 20, 30, 40, 41)], ["k", "ts", "s"]
    )
    # window [-10s, +10s] inclusive on both ends
    got = sorted(
        r.s_r
        for r in temporal.range_join(
            left, right, ["k"], "ts", -10_000_000, 10_000_000
        ).collect()
    )
    assert got == [20, 30, 40]


def test_range_join_no_cross_key(spark):
    left = spark.createDataFrame([(1, _ts(30))], ["k", "ts"])
    right = spark.createDataFrame([(2, _ts(30))], ["k", "ts"])
    assert (
        temporal.range_join(left, right, ["k"], "ts", -10_000_000, 10_000_000).count()
        == 0
    )


def test_interpolate_linear_known_series(spark):
    from codecdb_queryengine_spark.operators import temporal as TJ
    from pyspark.sql import functions as F

    # key a: observed at t=0 (v=10) and t=4 (v=2); gaps at 1..3 interpolate;
    # t=5 is AFTER the last observation -> stays NULL.
    # key b: single observation -> neighbors never bracket a gap.
    rows = [
        ("a", 0, 10), ("a", 1, None), ("a", 2, None), ("a", 3, None),
        ("a", 4, 2), ("a", 5, None),
        ("b", 0, None), ("b", 1, 7), ("b", 2, None),
    ]
    df = spark.createDataFrame(rows, "k string, t long, v long")
    out = {
        (r["k"], r["t"]): (r["observed"], r["v_filled"])
        for r in TJ.interpolate_linear(df, ["k"], "t", "v").collect()
    }
    assert out[("a", 0)] == (True, 10.0)
    assert out[("a", 1)] == (False, 10.0 + (2 - 10) * (1 / 4))
    assert out[("a", 2)] == (False, 6.0)
    assert out[("a", 3)] == (False, 10.0 + (2 - 10) * (3 / 4))
    assert out[("a", 4)] == (True, 2.0)
    assert out[("a", 5)] == (False, None)   # trailing edge: no next neighbor
    assert out[("b", 0)] == (False, None)   # leading edge: no prev neighbor
    assert out[("b", 1)] == (True, 7.0)
    assert out[("b", 2)] == (False, None)
