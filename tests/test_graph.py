"""Connected-components operator tests (no reference counterpart —
driver-mandated dedup-pipeline extension; labeling = min reachable id)."""

from codecdb_queryengine_spark.operators.graph import connected_components


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
