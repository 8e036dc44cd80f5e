"""Count-Min sketch operator tests (Cormode & Muthukrishnan guarantees:
estimates never under-count; exact when counters escape collisions)."""

from pyspark.sql import functions as F

from codecdb_queryengine_spark.operators import sketch as SK


def _build_and_estimate(spark, items, probes, depth=4, width=64):
    df = spark.createDataFrame([(x,) for x in items], ["term"])
    cms = SK.count_min_build(df, "term", depth=depth, width=width)
    p = spark.createDataFrame([(x,) for x in probes], ["term"])
    est = SK.count_min_estimate(cms, p, "term", depth=depth, width=width)
    return {r.term: r.est_count for r in est.collect()}


def test_estimates_never_undercount(spark):
    items = ["a"] * 5 + ["b"] * 3 + ["c"]
    got = _build_and_estimate(spark, items, ["a", "b", "c"])
    assert got["a"] >= 5 and got["b"] >= 3 and got["c"] >= 1


def test_exact_with_wide_sketch(spark):
    # width >> distinct items: collisions vanishingly unlikely -> exact
    items = ["x"] * 7 + ["y"] * 2
    got = _build_and_estimate(spark, items, ["x", "y"], depth=4, width=4096)
    assert got == {"x": 7, "y": 2}


def test_unseen_item_estimates_small(spark):
    # an unseen probe can only pick up collision mass, never negative
    got = _build_and_estimate(spark, ["a"] * 4, ["zzz"], depth=4, width=4096)
    assert 0 <= got["zzz"] <= 4


def test_sketch_size_bounded(spark):
    df = spark.createDataFrame([(f"t{i}",) for i in range(1000)], ["term"])
    cms = SK.count_min_build(df, "term", depth=4, width=32)
    assert cms.count() <= 4 * 32
