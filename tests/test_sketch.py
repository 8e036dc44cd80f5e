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


def test_heavy_hitters_exact_vs_groupby(spark):
    # skewed stream across many partitions: exact result must equal the
    # plain groupBy+threshold answer regardless of partitioning
    items = ["hot"] * 400 + ["warm"] * 120 + [f"cold{i}" for i in range(480)]
    df = spark.createDataFrame([(x,) for x in items], ["term"]).repartition(16)
    got = {(r.term, r.cnt) for r in SK.heavy_hitters(df, "term", ratio=0.1).collect()}
    n = len(items)
    import collections

    c = collections.Counter(items)
    want = {(t, v) for t, v in c.items() if v >= -(-0.1 * n // 1)}
    assert got == want


def test_heavy_hitters_boundary_item_survives(spark):
    # an item at EXACTLY the threshold ratio must be kept (>= semantics)
    items = ["edge"] * 10 + [f"x{i}" for i in range(90)]
    df = spark.createDataFrame([(x,) for x in items], ["term"]).repartition(8)
    got = {r.term for r in SK.heavy_hitters(df, "term", ratio=0.1).collect()}
    assert "edge" in got


def test_grouped_topk_exact_vs_window_under_partitioning(spark):
    import random

    rng = random.Random(7)
    rows = [(f"g{i % 5}", i, float(rng.randint(0, 50))) for i in range(400)]
    df = spark.createDataFrame(rows, ["g", "id", "score"]).repartition(16)
    got = {
        (r.g, r.rk, r.id)
        for r in SK.grouped_topk(df, ["g"], "score", k=4).collect()
    }
    from pyspark.sql import Window

    w = Window.partitionBy("g").orderBy(F.col("score").desc(), F.col("id").asc())
    want = {
        (r.g, r.rk, r.id)
        for r in df.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter("rk <= 4")
        .collect()
    }
    assert got == want


def test_grouped_topk_null_group_keys_match_window_oracle(spark):
    rows = [(None if i % 3 == 0 else f"g{i % 2}", i, float(i % 7)) for i in range(60)]
    df = spark.createDataFrame(rows, "g string, id long, score double").repartition(8)
    got = {
        (r.g, r.rk, r.id)
        for r in SK.grouped_topk(df, ["g"], "score", k=2, tie_col="id").collect()
    }
    from pyspark.sql import Window

    w = Window.partitionBy("g").orderBy(F.col("score").desc(), F.col("id").asc())
    want = {
        (r.g, r.rk, r.id)
        for r in df.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter("rk <= 2")
        .collect()
    }
    assert got == want
    assert any(g is None for g, _, _ in got)  # the NULL group is present


def test_grouped_topk_requires_tie_column(spark):
    import pytest

    df = spark.createDataFrame([("a", 1.0)], "g string, score double")
    with pytest.raises(ValueError, match="tie"):
        SK.grouped_topk(df, ["g"], "score", k=1)


def test_heavy_hitters_excludes_nulls_from_items_and_total(spark):
    # 60 NULLs + 40 'a': with NULLs excluded N=40, 'a' ratio=1.0 -> kept;
    # NULL itself is never a result row
    rows = [(None,)] * 60 + [("a",)] * 40
    df = spark.createDataFrame(rows, "term string").repartition(4)
    got = {(r.term, r.cnt) for r in SK.heavy_hitters(df, "term", ratio=0.5).collect()}
    assert got == {("a", 40)}


def test_grouped_topk_nan_and_null_order_values_match_window_oracle(spark):
    """NaN order values rank FIRST under the Spark desc window (NaN >
    everything) and NULL order values rank LAST — but pandas sorts both as
    NA-last and cannot even tell them apart in a float64 column, so the
    local prune must pass NA rows through untouched (r3 advice).  Small
    groups force the old bug: a local head(k) that evicted the NaN row
    made it vanish from the global top-k."""
    rows = []
    # group 'a': k=2 of [NaN, 3.0, 1.0] -> NaN (rank 1), 3.0 (rank 2)
    rows += [("a", float("nan"), 1), ("a", 3.0, 2), ("a", 1.0, 3)]
    # group 'b': [NULL, 5.0] -> 5.0 (rank 1), NULL (rank 2)
    rows += [("b", None, 4), ("b", 5.0, 5)]
    # group 'c': NULL tie values must also survive the local phase
    rows += [("c", 7.0, None), ("c", 7.0, 6), ("c", 2.0, 7)]
    df = spark.createDataFrame(rows, "g string, score double, id int").repartition(4)
    got = {
        (r.g, r.rk, r.id)
        for r in SK.grouped_topk(df, ["g"], "score", k=2, tie_col="id").collect()
    }
    from pyspark.sql import Window

    w = Window.partitionBy("g").orderBy(F.col("score").desc(), F.col("id").asc())
    want = {
        (r.g, r.rk, r.id)
        for r in df.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter("rk <= 2")
        .collect()
    }
    assert got == want
    by_group = {}
    for g, rk, i in got:
        by_group.setdefault(g, set()).add(rk)
    assert by_group == {"a": {1, 2}, "b": {1, 2}, "c": {1, 2}}


def test_heavy_hitters_lazy_mode_matches_eager(spark):
    """eager=False (full-lineage recoverable plan, no cache, no call-time
    jobs — the cluster fault-tolerance mode, r5 review) must return the
    identical exact result."""
    items = ["hot"] * 300 + ["warm"] * 90 + [f"cold{i}" for i in range(200)]
    df = spark.createDataFrame([(x,) for x in items], ["term"]).repartition(8)
    eager = {(r.term, r.cnt) for r in SK.heavy_hitters(df, "term", ratio=0.1).collect()}
    lazy = {
        (r.term, r.cnt)
        for r in SK.heavy_hitters(df, "term", ratio=0.1, eager=False).collect()
    }
    assert eager == lazy and eager
