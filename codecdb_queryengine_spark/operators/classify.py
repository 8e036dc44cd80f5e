"""Supervised linear-classifier TRAINING inside the engine — the missing
half of the quality-classifier story: functions/text.classifier_logit runs
inference with a fixed weight table (docs_classify); this module LEARNS the
table from labeled documents, in exact integer arithmetic so the whole
training run replays bit-for-bit in a SQL oracle (the kmeans_lloyd_micro /
pca_power_micro discipline applied to supervised learning).

Algorithm: the batch perceptron (Rosenblatt 1958's update applied over the
full batch per round — the order-free variant; the classic per-example
perceptron depends on visit order, which no distributed engine should
promise).  Features are hashed token counts (the fasttext bag-of-words
reduction, Joulin et al. 2016), labels ±1:

    margin_i   = Σ_j w_j · f_ij                      (BIGINT fold per row)
    w'_j       = w_j + Σ_{i: y_i·margin_i ≤ 0} y_i · f_ij

Every quantity is an integer; the misclassified-set sum is order-free, so
any partitioning and any executor count produce the identical weight
vector every round.

Convergence caveat (textbook): the batch variant converges on linearly
separable data; on non-separable data it oscillates — per-example
(order-dependent) updates, pocket tracking, or averaging are the classic
mitigations, all of which sacrifice either order-freedom or simplicity.
This operator keeps the order-free batch form because distributed
determinism is the design constraint; callers on non-separable data
should track per-round misclassification counts and keep the best round's
weights (the pocket rule) — exact integers, so that choice is
deterministic too.

Scale shape per round: ONE scan of the (doc-count × dim) feature frame —
the margin is a literal-weight fold (no join), the gradient one
posexplode + dim-key aggregation with map-side partial sums — and a
dim-sized collect.  The feature frame is built once (one explode + one
doc-keyed aggregation of `dim` conditional sums, the SimHash shape) and
persisted across rounds.

Reference: the engine has no learning surface at all (SURVEY.md §2);
this is driver-mandated pipeline capability (quality classifiers à la
GPT-3/Gopher data filtering).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from codecdb_queryengine_spark.functions import text as T


def hashed_features(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 32,
    prefix: str = "pc|",
) -> DataFrame:
    """(id, f): per-document hashed token-count vector of length dim+1 —
    f[j] = #tokens hashing to bucket j (md5_slice32, the engine-portable
    hash), f[dim] = 1 (the bias slot).  One explode + one doc-keyed
    aggregation of `dim` conditional sums."""
    tok = docs.select(
        F.col(id_col).alias("id"),
        F.explode(T.tokens(text_col)).alias("tok"),
    ).withColumn("b", (T.md5_slice32(prefix, F.col("tok")) % dim).cast("int"))
    agg = tok.groupBy("id").agg(
        *[
            F.sum(F.when(F.col("b") == j, 1).otherwise(0)).alias(f"f{j}")
            for j in range(dim)
        ]
    )
    arr = "array(" + ",".join(f"f{j}" for j in range(dim)) + ", 1L)"
    return agg.select("id", F.expr(arr).alias("f"))


def perceptron_train_micro(
    examples: DataFrame,
    dim: int,
    iters: int = 4,
) -> list[int]:
    """Train batch-perceptron weights over `examples` (id, f array<long>
    of length dim+1 incl. bias, y ∈ {-1, +1}); returns the integer weight
    vector after `iters` rounds (w0 = 0).

    Weight growth is bounded by iters · Σ|f| — int64-safe far beyond any
    gate scale (the margin fold is the largest product: |w|·|f|·dim).
    """
    width = dim + 1
    w = [0] * width
    ex = examples.persist()
    try:
        for _ in range(iters):
            w_arr = "array(" + ",".join(f"{wj}L" for wj in w) + ")"
            margin = F.expr(
                f"aggregate(zip_with(f, {w_arr}, (a, b) -> a * b), 0L, (s, e) -> s + e)"
            )
            rows = (
                ex.withColumn("m", margin)
                .filter(F.col("y") * F.col("m") <= 0)
                .select((F.col("y")).alias("y"), F.posexplode("f").alias("j", "fv"))
                .groupBy("j")
                .agg(F.sum(F.col("y") * F.col("fv")).alias("g"))
                .collect()
            )
            for r in rows:
                w[int(r["j"])] += int(r["g"])
        return w
    finally:
        ex.unpersist()
