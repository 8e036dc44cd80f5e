"""Connected-components operator tests (no reference counterpart —
driver-mandated dedup-pipeline extension; labeling = min reachable id)."""

import pytest

from codecdb_queryengine_spark.operators.graph import (
    connected_components,
    connected_components_star,
)


def _components(spark, edges):
    df = spark.createDataFrame(edges, ["a", "b"])
    return {
        r.node: r.component for r in connected_components(df, "a", "b").collect()
    }


def test_single_edge(spark):
    assert _components(spark, [(2, 7)]) == {2: 2, 7: 2}


def test_chain_converges_to_min(spark):
    # path graph 5-4-3-2-1: diameter > 1 forces multiple propagation rounds
    got = _components(spark, [(5, 4), (4, 3), (3, 2), (2, 1)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_disjoint_components(spark):
    got = _components(spark, [(1, 2), (2, 3), (10, 11), (20, 21), (21, 20)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_self_loop_and_duplicate_edges(spark):
    got = _components(spark, [(4, 4), (1, 3), (3, 1), (1, 3)])
    assert got == {4: 4, 1: 1, 3: 1}


def _star_components(spark, edges, **kw):
    df = spark.createDataFrame(edges, ["a", "b"])
    return {
        r.node: r.component
        for r in connected_components_star(df, "a", "b", **kw).collect()
    }


def test_star_matches_propagation_on_random_graph(spark):
    import random

    rng = random.Random(11)
    edges = [(rng.randrange(60), rng.randrange(60)) for _ in range(80)]
    df = spark.createDataFrame(edges, ["a", "b"])
    prop = {r.node: r.component for r in connected_components(df, "a", "b").collect()}
    star = _star_components(spark, edges)
    assert star == prop


def test_star_long_chain_exceeds_propagation_rounds(spark):
    # Path graph of diameter 120: label propagation would need 120 rounds
    # (it raises at its default 20); the star algorithm's O(log² n) rounds
    # finish well inside its default budget.
    edges = [(i, i + 1) for i in range(120)]
    df = spark.createDataFrame(edges, ["a", "b"])
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, "a", "b").collect()
    got = _star_components(spark, edges)
    assert got == {i: 0 for i in range(121)}


def test_star_self_loops_and_disjoint(spark):
    got = _star_components(spark, [(4, 4), (1, 3), (3, 1), (10, 11)])
    assert got == {4: 4, 1: 1, 3: 1, 10: 10, 11: 10}


def test_reliable_checkpoint_dir_mode(spark, tmp_path):
    # cluster-durable mode: rounds checkpoint to a directory instead of
    # executor-local blocks; same answers.
    edges = [(i, i + 1) for i in range(30)]
    df = spark.createDataFrame(edges, ["a", "b"])
    prop = {
        r.node: r.component
        for r in connected_components(
            df, "a", "b", max_iter=40, checkpoint_dir=str(tmp_path / "ckpt_prop")
        ).collect()
    }
    assert prop == {i: 0 for i in range(31)}
    star = _star_components(spark, edges, checkpoint_dir=str(tmp_path / "ckpt_star"))
    assert star == {i: 0 for i in range(31)}
    import glob
    import os

    assert any(os.scandir(tmp_path / "ckpt_prop")) and any(os.scandir(tmp_path / "ckpt_star"))
    # Superseded rounds' reliable-checkpoint FILES must be reaped too —
    # only the final (still-consumable) frames may remain: labels for
    # propagation; the edge base (feeds nodes) + final star edges for star.
    n_prop = len(glob.glob(str(tmp_path / "ckpt_prop" / "*" / "rdd-*")))
    n_star = len(glob.glob(str(tmp_path / "ckpt_star" / "*" / "rdd-*")))
    assert n_prop <= 1, f"propagation retained {n_prop} checkpoint dirs"
    assert n_star <= 2, f"star retained {n_star} checkpoint dirs"


def test_no_cached_block_growth_across_rounds(spark):
    # Superseded round states must be unpersisted: a 15-round run may leave
    # only the final labels frame cached (not one frame per round).
    import time

    edges = [(i, i + 1) for i in range(15)]
    df = spark.createDataFrame(edges, ["a", "b"])
    before = len(spark.sparkContext._jsc.sc().getRDDStorageInfo())
    connected_components(df, "a", "b", max_iter=20).collect()
    for _ in range(10):  # unpersistRDD is async; poll instead of racing it
        after = len(spark.sparkContext._jsc.sc().getRDDStorageInfo())
        if after - before <= 1:
            break
        time.sleep(0.5)
    assert after - before <= 1  # final labels only, nothing per-round


def test_pagerank_micro_hand_checked_path(spark):
    """3-node path a–b–c (symmetrized): one hand-replayable round.
    pr0 = 1e6 each; contrib a→b = 1e6 (deg 1), b→a = 500000 (deg 2).
    pr1(a) = 150000 + 85*500000 div 100 = 575000 = pr1(c);
    pr1(b) = 150000 + 85*(1e6 + 1e6) div 100 = 1850000."""
    from codecdb_queryengine_spark.operators.graph import pagerank_micro

    e = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("b", "c"), ("c", "b")], "src string, dst string"
    )
    got = {r["node"]: r["pr"] for r in pagerank_micro(e, iters=1).collect()}
    assert got == {"a": 575000, "b": 1850000, "c": 575000}
    # mass is conserved up to the floor losses: total stays near 3e6
    got6 = {r["node"]: r["pr"] for r in pagerank_micro(e, iters=6).collect()}
    assert got6["b"] > got6["a"] == got6["c"]
    assert abs(sum(got6.values()) - 3_000_000) < 10


def test_triangle_counts_k4_minus_edge(spark):
    """K4 minus one edge has exactly 2 triangles; the two hub nodes sit in
    both, the two rim nodes in one each.  Duplicate/reversed input edges
    must not double-count."""
    from codecdb_queryengine_spark.operators.graph import triangle_counts

    edges = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("c", "d"),
             ("b", "a"), ("c", "a")]  # reversed duplicates on purpose
    e = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["n_tri"] for r in triangle_counts(e).collect()}
    assert got == {"a": 2, "c": 2, "b": 1, "d": 1}
