"""Vector similarity search over an embedding column (array<float>).

Driver-mandated extension (no reference counterpart; the reference's only
"search" is hash probing, cpp/src/lqf/join.cc:221-300).  Two tiers:

- brute_force_topk: exact cosine top-k — the correctness baseline.  Dot
  products run JVM-side via zip_with/aggregate; top-k per query via a
  rank window partitioned by query (shuffle width = n_queries).
- hyperplane LSH (random-projection signatures): the 100-TB path.  Bucket
  by sign-bit signature, search only within buckets; hyperplane components
  are md5-derived so engine- and oracle-reproducible (no RNG state).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢbᵢ as double, JVM-side (zip_with + aggregate)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return (dot(a, b) / (norm(a) * norm(b))).cast("double")


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    `queries` has (q_id, q_vec).  Cross join is the exact-search cost model:
    n_queries × n_vectors similarity evaluations, embarrassingly parallel;
    queries side broadcasts.  Deterministic tiebreak on neighbor id.
    """
    cand = vectors.select(F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec"))
    scored = (
        F.broadcast(queries)
        .crossJoin(cand)
        .filter(F.col("q_id") != F.col("n_id"))
        .withColumn("cosine", cosine(F.col("q_vec"), F.col("n_vec")))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("n_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("q_id", "n_id", "cosine", F.col("rk").cast("long").alias("rk"))
    )


def _hyperplane_component(plane: int, dim: int) -> Column:
    """Deterministic pseudo-random hyperplane component in [-0.5, 0.5).

    First 8 hex chars of md5('plane|dim') scaled — identical in DuckDB:
    ('0x' || substring(md5(...), 1, 8))::BIGINT / 4294967296.0 - 0.5.
    """
    h = F.conv(F.substring(F.md5(F.lit(f"{plane}|{dim}")), 1, 8), 16, 10).cast("long")
    return h / F.lit(4294967296.0) - F.lit(0.5)


def hyperplane_signature(vec: Column, dim: int, num_planes: int = 8) -> Column:
    """LSH signature: bit p = sign(vec · hyperplane_p), packed into a long."""
    sig = None
    for p in range(num_planes):
        proj = None
        for d in range(dim):
            term = F.element_at(vec, d + 1).cast("double") * _hyperplane_component(p, d)
            proj = term if proj is None else proj + term
        bit = F.when(proj >= 0, F.lit(2**p)).otherwise(F.lit(0))
        sig = bit if sig is None else sig + bit
    return sig.cast("long")


def lsh_bucket_topk(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    num_planes: int = 6,
) -> DataFrame:
    """Approximate top-k: candidates share the query's LSH bucket.

    2^num_planes buckets: the cross-join shrinks by ~2^planes vs brute
    force.  Recall is tested against brute_force_topk (tests/).
    """
    cand = vectors.select(
        F.col(id_col).alias("n_id"),
        F.col(vec_col).alias("n_vec"),
        hyperplane_signature(F.col(vec_col), dim, num_planes).alias("bucket"),
    )
    q = queries.withColumn("bucket", hyperplane_signature(F.col("q_vec"), dim, num_planes))
    scored = (
        F.broadcast(q)
        .join(cand, "bucket")
        .filter(F.col("q_id") != F.col("n_id"))
        .withColumn("cosine", cosine(F.col("q_vec"), F.col("n_vec")))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("n_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("q_id", "n_id", "cosine", F.col("rk").cast("long").alias("rk"))
    )
