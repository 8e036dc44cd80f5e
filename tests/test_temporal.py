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
