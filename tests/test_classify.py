"""Batch-perceptron training (operators/classify): exact integer updates,
hand-replayable rounds, convergence on separable data."""

from pyspark.sql import functions as F

from codecdb_queryengine_spark.operators import classify as CL


def _examples(spark):
    # positives carry feature 0 (weight 5), negatives don't; bias only
    # separates after the signal feature dominates.
    rows = [
        (0, [5, 1], 1),
        (1, [5, 1], 1),
        (2, [0, 1], -1),
        (3, [0, 1], -1),
    ]
    return spark.createDataFrame(rows, "id long, f array<long>, y int")


def test_batch_perceptron_hand_replayed_rounds(spark):
    """Round 0 (w=0, everything misclassified): g = 2·[5,1] − 2·[0,1] =
    [10,0].  Round 1 (only the negatives misclassified at margin 0):
    g = [0,−2] → w = [10,−2], which separates; round 2 changes nothing."""
    ex = _examples(spark)
    assert CL.perceptron_train_micro(ex, dim=1, iters=1) == [10, 0]
    w = CL.perceptron_train_micro(ex, dim=1, iters=3)
    assert w == [10, -2]
    w_arr = f"array({w[0]}L, {w[1]}L)"
    m = F.expr(f"aggregate(zip_with(f, {w_arr}, (a, b) -> a * b), 0L, (s, e) -> s + e)")
    got = {r["id"]: r["ok"] for r in ex.select("id", ((F.col("y") * m) > 0).alias("ok")).collect()}
    assert got == {0: True, 1: True, 2: True, 3: True}


def test_hashed_features_shape_and_bias(spark):
    docs = spark.createDataFrame(
        [(0, "alpha beta alpha"), (1, "")], "doc_id long, text string"
    )
    out = {r["id"]: r["f"] for r in CL.hashed_features(docs, dim=8).collect()}
    assert len(out[0]) == 9 and out[0][-1] == 1  # 8 buckets + bias
    assert sum(out[0][:-1]) == 3  # three token occurrences counted
