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

# Module-level so pandas-UDF type hints (stringified by the future
# annotations import) resolve against module globals.
import math

import numpy as np  # noqa: F401
import pandas as pd  # noqa: F401

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


def cosine_pre(a: Column, b: Column, norm_a: Column, norm_b: Column) -> Column:
    """cosine with per-row precomputed norms: pair-wise work drops from
    three dot products to one (the norms are O(n) once instead of O(pairs));
    IEEE-identical to `cosine` since the same sqrt results are multiplied."""
    return (dot(a, b) / (norm_a * norm_b)).cast("double")


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
    cand = vectors.select(
        F.col(id_col).alias("n_id"),
        F.col(vec_col).alias("n_vec"),
        norm(F.col(vec_col)).alias("n_norm"),
    )
    scored = (
        F.broadcast(queries.withColumn("q_norm", norm(F.col("q_vec"))))
        .crossJoin(cand)
        .filter(F.col("q_id") != F.col("n_id"))
        .withColumn(
            "cosine",
            cosine_pre(F.col("q_vec"), F.col("n_vec"), F.col("q_norm"), F.col("n_norm")),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("n_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("q_id", "n_id", "cosine", F.col("rk").cast("long").alias("rk"))
    )


def hyperplane_component(plane: int, dim: int) -> float:
    """Deterministic pseudo-random hyperplane component in [-0.5, 0.5).

    First 8 hex chars of md5('plane|dim') scaled.  Computed host-side with
    hashlib (bit-identical to Spark/DuckDB md5), embedded as a double
    literal — the oracle recomputes it in SQL as
    ('0x' || substring(md5('p|d'), 1, 8))::BIGINT / 4294967296.0 - 0.5 and
    both IEEE paths agree exactly.
    """
    import hashlib

    h = int(hashlib.md5(f"{plane}|{dim}".encode()).hexdigest()[:8], 16)
    return h / 4294967296.0 - 0.5


def hyperplane_signature(vec: Column, dim: int, num_planes: int = 8, base_plane: int = 0) -> Column:
    """LSH signature: bit p = sign(vec · hyperplane_p), packed into a long.

    All planes ride in ONE nested-array literal (a single Catalyst Literal
    node); projections come from a `transform` over it, and the bit-packing
    folds with a weighted zip_with/aggregate.  The per-plane literal-array
    formulation this replaces produced O(planes × dim) expression nodes,
    dominating analysis/codegen time on self-joined LSH plans.  IEEE
    semantics are unchanged: each dot is the same left-to-right
    zip_with/aggregate sum the oracle SQL mirrors, and bit weights are
    exact small powers of two in doubles.
    """
    planes = F.lit(
        [
            [hyperplane_component(base_plane + p, d) for d in range(dim)]
            for p in range(num_planes)
        ]
    )
    weights = F.lit([float(2**p) for p in range(num_planes)])
    projs = F.transform(planes, lambda plane: dot(vec, plane))
    return (
        F.aggregate(
            F.zip_with(projs, weights, lambda x, w: F.when(x >= 0, w).otherwise(F.lit(0.0))),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        .cast("long")
    )


def _plane_matrix(dim: int, num_planes: int, base_plane: int = 0):
    """(num_planes × dim) float64 hyperplane matrix, same md5-derived
    components as hyperplane_component."""
    return np.array(
        [
            [hyperplane_component(base_plane + p, d) for d in range(dim)]
            for p in range(num_planes)
        ],
        dtype=np.float64,
    )


def lsh_band_keys_arrow(
    vectors: DataFrame,
    dim: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bands: int = 4,
    planes_per_band: int = 4,
    plane_stride: int | None = None,
) -> DataFrame:
    """(bid, band, band_key) via one vectorized pandas UDF: the whole
    batch's projections are a single (n × dim)·(dim × planes) matmul.

    `plane_stride` fixes band b's plane indices at [b·stride, b·stride +
    planes_per_band) independent of planes_per_band (default None keeps
    the legacy packed layout, stride = planes_per_band).  A stride ≥ the
    maximum planes count makes the signature STABLE under plane growth:
    adding a plane only subdivides existing buckets (every old bucket
    splits in two; no pair that was separated rejoins), which is what lets
    the planes-per-corpus-doubling dedup policy grow the key space
    incrementally instead of reshuffling every band's plane identity.

    Numerics note: numpy's dot uses pairwise summation while the expression
    form (and the DuckDB oracle) sums left-to-right.  The two differ by
    O(1e-16) relative error, which only matters to the SIGN of a projection
    whose exact value is within ~1e-15 of zero — vanishingly unlikely for
    md5-derived O(1)-magnitude planes, and a flip would only perturb one
    LSH bucket (verification re-filters candidates anyway).
    """
    stride = planes_per_band if plane_stride is None else plane_stride
    if stride < planes_per_band:
        raise ValueError(f"plane_stride={stride} < planes_per_band={planes_per_band}")
    planes = np.concatenate(
        [_plane_matrix(dim, planes_per_band, b * stride) for b in range(bands)]
    )  # (bands*ppb, dim)
    weights = (2 ** np.arange(planes_per_band, dtype=np.int64)).reshape(1, -1)

    from pyspark.sql.pandas.functions import pandas_udf
    from pyspark.sql.types import ArrayType, LongType

    @pandas_udf(returnType=ArrayType(LongType()))
    def band_keys(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy()).astype(np.float64)  # (n, dim)
        bits = (mat @ planes.T) >= 0  # (n, bands*ppb)
        keys = [
            (bits[:, b * planes_per_band : (b + 1) * planes_per_band] * weights).sum(axis=1)
            for b in range(bands)
        ]
        return pd.Series(np.stack(keys, axis=1).tolist())

    return (
        vectors.select(F.col(id_col).alias("bid"), band_keys(F.col(vec_col)).alias("__ks"))
        .select("bid", F.posexplode("__ks").alias("band", "band_key"))
    )


def cosine_arrow(a: Column, b: Column) -> Column:
    """Vectorized cosine over two array columns (batch matmul-free row-wise
    einsum; float64).  Numerics: einsum sums pairwise, NOT left-to-right —
    when a value lands exactly on a rounding boundary the last-ulp
    difference vs an order-sensitive oracle flips the rounded hash
    (observed: r2 dedup_embedding).  Use for bulk scoring; for
    oracle-hash-gated outputs use the expression-form `cosine`/`cosine_pre`
    whose summation order the oracle SQL can mirror exactly."""
    from pyspark.sql.pandas.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    @pandas_udf(returnType=DoubleType())
    def cos(va: pd.Series, vb: pd.Series) -> pd.Series:
        ma = np.stack(va.to_numpy()).astype(np.float64)
        mb = np.stack(vb.to_numpy()).astype(np.float64)
        dots = np.einsum("ij,ij->i", ma, mb)
        na = np.sqrt(np.einsum("ij,ij->i", ma, ma))
        nb = np.sqrt(np.einsum("ij,ij->i", mb, mb))
        return pd.Series(dots / (na * nb))

    return cos(a, b)


def lsh_band_pairs(
    vectors: DataFrame,
    dim: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bands: int = 4,
    planes_per_band: int = 4,
    use_arrow: bool = True,
    plane_stride: int | None = None,
) -> DataFrame:
    """Candidate pairs sharing ≥1 hyperplane band (random-projection LSH).

    The vector analog of MinHash banding: each band is an independent
    planes_per_band-bit signature; near vectors collide in some band with
    high probability.  Candidate generation is n·bands rows — never the
    O(n²) cross join.  `plane_stride` (see lsh_band_keys_arrow) pins each
    band's plane identities independent of the planes count.
    """
    stride = planes_per_band if plane_stride is None else plane_stride
    if use_arrow:
        bk = lsh_band_keys_arrow(
            vectors, dim, vec_col, id_col, bands, planes_per_band, plane_stride=stride
        )
    else:
        band_structs = [
            F.struct(
                F.lit(b).alias("band"),
                hyperplane_signature(
                    F.col(vec_col), dim, planes_per_band, base_plane=b * stride
                ).alias("key"),
            )
            for b in range(bands)
        ]
        bk = vectors.select(
            F.col(id_col).alias("bid"), F.explode(F.array(*band_structs)).alias("bk")
        ).select("bid", F.col("bk.band").alias("band"), F.col("bk.key").alias("band_key"))
    from codecdb_queryengine_spark.operators.bucketing import bucket_candidate_pairs

    return bucket_candidate_pairs(bk, "bid", ["band", "band_key"])


def kmeans_centroids(
    vectors: DataFrame,
    vec_col: str = "embedding",
    k: int = 16,
    seed: int = 13,
    max_iter: int = 10,
) -> DataFrame:
    """Train a coarse quantizer with pyspark.ml KMeans and return it in
    ivf_topk's centroid contract: (c_id, c_vec, c_norm).

    KMeans|| init + Lloyd iterations run distributed (one pass per
    iteration, model state broadcast); the returned frame is k rows, built
    driver-side from the fitted centers — exactly what ivf_topk broadcasts
    anyway.  Trained centers adapt the inverted lists to the corpus
    distribution, which is what makes IVF recall hold on clustered real
    embeddings (vs the deterministic mod-id stand-in the oracle pins).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = vectors.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    )
    model = KMeans(k=k, seed=seed, maxIter=max_iter).fit(feats)
    spark = vectors.sparkSession
    rows = [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())]
    cents = spark.createDataFrame(rows, "c_id long, c_vec array<double>")
    return cents.select("c_id", "c_vec", norm(F.col("c_vec")).alias("c_norm"))


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    centroid_mod: int = 29,
    nprobe: int = 2,
    centroids: DataFrame | None = None,
    keep_vecs: bool = False,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k — the other classic ANN scale
    path next to LSH bucketing.

    `keep_vecs=True` additionally returns the (q_vec, n_vec) pair each
    result was scored from: the scored frame carries them anyway, so a
    consumer that needs to RE-DERIVE something from the matched vectors
    (the trained-quantizer invariant gates) gets them as a pure projection
    of the shared scoring subplan instead of two corpus join-backs
    (r7 verdict item 5 — one subplan, two projections).

    Coarse quantizer: by default centroids are the vectors whose id ≡ 0 mod
    `centroid_mod` — a deterministic, training-free stand-in the DuckDB
    oracle can recompute exactly; pass `centroids` (c_id, c_vec, c_norm —
    e.g. from kmeans_centroids) to use a trained quantizer through the
    identical plumbing.  Every vector joins its nearest centroid's inverted
    list via a per-row argmax fold over the 1-row broadcast model — one
    shuffle-free projection of the corpus (no N×C expansion); queries
    probe the `nprobe` nearest lists and score exactly within them, so
    the scored candidate set is ~nprobe/C of the corpus.
    """
    if centroids is not None:
        cents = centroids
    else:
        cents = vectors.filter(F.col(id_col) % centroid_mod == 0).select(
            F.col(id_col).alias("c_id"),
            F.col(vec_col).alias("c_vec"),
            norm(F.col(vec_col)).alias("c_norm"),
        )
    # Nearest-centroid choice ranks dot/|c| — the probe vector's own norm is
    # a positive per-row constant, so dropping it preserves the cosine argmax
    # and removes two of three dot products per (vector, centroid) pair.
    # Tie-break toward the smaller centroid id.  The model rides along as a
    # 1-row broadcast array (r5 perf pass): assignment is a per-row
    # order-free fold, so the inverted lists are ONE shuffle-free
    # projection of the corpus — no crossJoin expansion, no groupBy(n_id)
    # exchange, no assigned⋈vectors re-join.
    cmodel = F.broadcast(_model_1row(cents, "c_id", "c_vec", "c_norm"))
    inv_lists = _spread(vectors).crossJoin(cmodel).select(
        F.col(id_col).alias("n_id"),
        F.col(vec_col).alias("n_vec"),
        norm(F.col(vec_col)).alias("n_norm"),
        _fold_argmax_sim(_centroid_sims(F.col(vec_col)))["c_id"].alias("c_id"),
    )
    # Probe selection: _probe_centroids replays the old rank window's
    # exact order (sim desc incl. NaN-first, ties to the smaller c_id)
    probe_lists = _probe_centroids(queries, cmodel, nprobe).select(
        "q_id", "q_vec", F.col("p")["c_id"].alias("c_id"), norm(F.col("q_vec")).alias("q_norm")
    )
    scored = (
        F.broadcast(probe_lists)
        .join(inv_lists, "c_id")
        .filter(F.col("q_id") != F.col("n_id"))
        .withColumn(
            "cosine",
            cosine_pre(F.col("q_vec"), F.col("n_vec"), F.col("q_norm"), F.col("n_norm")),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("n_id").asc())
    extra = ["q_vec", "n_vec"] if keep_vecs else []
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("q_id", "n_id", "cosine", F.col("rk").cast("long").alias("rk"), *extra)
    )


def l2sq(a: Column, b: Column) -> Column:
    """Σ (aᵢ−bᵢ)² as double, JVM-side, left-to-right (the oracle-mirrorable
    summation order, like `dot`)."""
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _spread(df: DataFrame) -> DataFrame:
    """Round-robin repartition up to the session's shuffle parallelism,
    ONLY when the input has fewer partitions.  The shuffle-free model-fold
    plans below do all their per-row scoring in the scan stage, so a
    small-file input (one parquet row-group = one non-splittable task)
    would run them single-threaded; one round-robin exchange restores the
    parallelism the old groupBy shuffle provided by accident.  At scale
    the scan already has ≥ parallelism splits and this adds NOTHING (the
    guard keeps the plan exchange-free exactly when partitioning is
    already adequate).  Degraded mode (r5 review): if the parallelism
    conf is non-numeric (AQE-managed "auto" on some platforms) or the
    partition count cannot be inspected (streaming frames; .rdd needs
    batch planning), return the input unchanged — correctness never
    depends on the spread, only small-input parallelism does."""
    try:
        p = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
        n = df.rdd.getNumPartitions()
    except Exception:
        return df
    return df.repartition(p) if n < p else df


def _model_1row(df: DataFrame, *cols: str) -> DataFrame:
    """The whole (tiny) model frame as ONE 1-row array<struct> column
    `model` — crossJoin(broadcast(·)) hands every data row the array with
    no shuffle, and per-row folds then compute argmin/argmax WITHOUT the
    crossJoin-expand + groupBy(n_id) full-corpus shuffle the old plan
    shape paid (r5 perf pass; runtime twin of the literal-model
    _sql_dist_arr discipline, for models that are DataFrames).
    collect_list order is nondeterministic, so consumers MUST fold with a
    total order (tie-broken argmin/argmax) — then the result is
    order-free.  Scale contract: the array must fit in task memory — the
    same bound as broadcasting the model, which the old shape already
    required."""
    return df.agg(F.collect_list(F.struct(*[F.col(c) for c in cols])).alias("model"))


def _fold_argmax_sim(entries: Column) -> Column:
    """struct(sim double, c_id long) with the LARGEST sim (ties to the
    smaller c_id) from an array<struct(sim, c_id)> — the exact max_by
    (sim, −c_id) ranking ivf_topk always used, as an order-free fold."""
    init = F.struct(
        F.lit(float("-inf")).alias("sim"), F.lit(-1).cast("long").alias("c_id")
    )
    return F.aggregate(
        entries,
        init,
        lambda acc, s: F.when(
            (s["sim"] > acc["sim"])
            | ((s["sim"] == acc["sim"]) & (s["c_id"] < acc["c_id"])),
            s,
        ).otherwise(acc),
    )


def _pq_model_1row(cbm: DataFrame, id_field: str, num_subspaces: int) -> DataFrame:
    """1-row codebook model array (columns m, `id_field`, c_sub) with an
    execution-time subspace-coverage guard (r5 review): an m absent from
    the codebook would make the per-row argmin fold return its −1 init,
    and the ADC lookup key m·K−1 would ALIAS the previous subspace's last
    codeword — a plausible wrong score instead of a loud failure.  The
    guard is evaluated once on the single model row (assert_true inside
    the model projection, so column pruning cannot drop it), never in the
    per-row encode path."""

    def has_m(m: int) -> Column:
        return F.exists(F.col("model0"), lambda e: e["m"] == F.lit(m))

    cond = has_m(0)
    for m in range(1, num_subspaces):
        cond = cond & has_m(m)
    agg = cbm.agg(
        F.collect_list(F.struct("m", id_field, "c_sub")).alias("model0")
    )
    return agg.select(
        F.when(
            F.assert_true(
                cond,
                F.lit(
                    "pq encode: codebook has no entries for some subspace in "
                    f"0..{num_subspaces - 1} — ADC keys would alias adjacent "
                    "subspaces"
                ),
            ).isNull(),
            F.col("model0"),
        ).alias("model")
    )


def _pq_code_entry(m: int, sub: int, vec: Column, id_field: str) -> Column:
    """map entry (m, codeword) for subspace `m`: order-free argmin of the
    left-assoc squared-L2 between `vec`'s m-th slice and the runtime model
    array's subspace-m codewords (ties to the smaller id).  Shared by
    pq_topk and ivf_pq_topk (r5 review: the two inlined copies risked
    diverging).  NB: per-m values are captured via this def, not lambda
    default args — PySpark infers HOF lambda arity from the signature, so
    a second (defaulted) parameter would silently become the ARRAY
    INDEX."""
    ents = F.filter(F.col("model"), lambda e: e["m"] == F.lit(m))
    return F.struct(
        F.lit(m).cast("long").alias("m"),
        _fold_argmin_d(
            F.transform(
                ents,
                lambda e: F.struct(
                    l2sq(F.slice(vec, m * sub + 1, sub), e["c_sub"]).alias("d"),
                    e[id_field].cast("long").alias("c_id"),
                ),
            )
        )["c_id"].alias("code"),
    )


def _probe_centroids(
    queries: DataFrame,
    cmodel: DataFrame,
    nprobe: int,
    with_vec: bool = False,
    with_rank: bool = False,
) -> DataFrame:
    """(q_id, q_vec, p) — per query the `nprobe` nearest centroids from
    the 1-row broadcast model, ranked exactly like the old rank window:
    sim DESC with Spark's NaN-greatest FIRST, ties to the smaller c_id.
    Ascending sort key = (non-NaN flag, −sim, c_id): negation is
    sign-exact for ordering non-NaN sims, and the leading flag restores
    NaN-first, which plain ascending −sim would invert (r5 review — a
    zero-norm centroid yields NaN sims for everyone; the assignment
    argmax still sends every vector to its list under Spark's
    NaN-greatest comparisons, so inverting the probe order would serve
    zero results where the window form served k).  The struct carries
    c_id (+ c_vec when requested) behind the sort fields; c_id is unique
    so trailing fields never compare.  Shared by ivf_topk and
    ivf_pq_topk (r5 review: the two inlined copies risked diverging)."""
    sims = F.transform(
        F.col("model"),
        lambda c: F.struct(
            (dot(F.col("q_vec"), c["c_vec"]) / c["c_norm"]).alias("sim"),
            c["c_id"].cast("long").alias("c_id"),
            *([c["c_vec"].alias("c_vec")] if with_vec else []),
        ),
    )
    # second transform so the dot is computed ONCE per centroid — the
    # NaN flag re-reads s.sim instead of re-folding the dot
    keyed = F.transform(
        sims,
        lambda s: F.struct(
            F.when(F.isnan(s["sim"]), F.lit(0)).otherwise(F.lit(1)).alias("nn"),
            (-s["sim"]).alias("nsim"),
            s["c_id"].alias("c_id"),
            *([s["c_vec"].alias("c_vec")] if with_vec else []),
        ),
    )
    if with_rank:
        # posexplode exposes the probe's 0-based rank in the sorted slice
        # (`pr`) — the coarse-shortlist stage-1 sort key of
        # ivf_coarse_shortlist; same order, same struct otherwise
        return queries.crossJoin(cmodel).select(
            "q_id",
            "q_vec",
            F.posexplode(F.slice(F.array_sort(keyed), 1, nprobe)).alias("pr", "p"),
        )
    return queries.crossJoin(cmodel).select(
        "q_id",
        "q_vec",
        F.explode(F.slice(F.array_sort(keyed), 1, nprobe)).alias("p"),
    )


def _centroid_sims(vec: Column) -> Column:
    """array<struct(sim, c_id)> of dot/|c| for `vec` against every
    centroid of the runtime 1-row model array (the ivf ranking; one
    definition shared by the assignment sites in ivf_topk, ivf_pq_topk
    and the index build — r5 review: three inlined copies risked
    diverging)."""
    return F.transform(
        F.col("model"),
        lambda c: F.struct(
            (dot(vec, c["c_vec"]) / c["c_norm"]).alias("sim"),
            c["c_id"].cast("long").alias("c_id"),
        ),
    )


# Above this coarse-model size, ivfpq_encode_micro switches from the
# literal array_min expression (whose SQL text grows with K·dim) to the
# broadcast-model integer fold.  Both compute the identical
# (min d, tie min c_id) assignment — pinned by tests/test_lloyd.py.
_ENCODE_LITERAL_MAX = 32


def _fold_argmin_micro(entries: Column) -> Column:
    """struct(d bigint, c_id long, c array<long>) with the SMALLEST
    integer L2 (ties to the smaller c_id) from an array of candidate
    structs — the broadcast-fold twin of the literal
    array_min(_sql_dist_arr(...)) ranking (lexicographic (d, c_id); the
    carried center array never participates because c_id is unique)."""
    init = F.struct(
        F.lit(2**62).cast("long").alias("d"),
        F.lit(-1).cast("long").alias("c_id"),
        F.array().cast("array<long>").alias("c"),
    )
    return F.aggregate(
        entries,
        init,
        lambda acc, s: F.when(
            (s["d"] < acc["d"]) | ((s["d"] == acc["d"]) & (s["c_id"] < acc["c_id"])),
            s,
        ).otherwise(acc),
    )


def _fold_argmin_d(entries: Column) -> Column:
    """struct(d double, c_id long) with the SMALLEST d (ties to the
    smaller c_id) from an array<struct(d, c_id)> — the exact min_by
    (d, c_id) ranking the PQ encoders always used, as an order-free
    fold."""
    init = F.struct(
        F.lit(float("inf")).alias("d"), F.lit(-1).cast("long").alias("c_id")
    )
    return F.aggregate(
        entries,
        init,
        lambda acc, s: F.when(
            (s["d"] < acc["d"]) | ((s["d"] == acc["d"]) & (s["c_id"] < acc["c_id"])),
            s,
        ).otherwise(acc),
    )


def pq_codebooks_kmeans(
    vectors: DataFrame,
    dim: int,
    vec_col: str = "embedding",
    num_subspaces: int = 4,
    num_codewords: int = 8,
    seed: int = 13,
    max_iter: int = 10,
) -> DataFrame:
    """Trained PQ codebooks — one pyspark.ml KMeans per subspace over the
    sliced vectors — in pq_topk's codebook contract (m, c_id, c_sub).

    This is classic PQ training (independent K-means per subquantizer,
    Jégou et al. 2011 §III).  Each fit runs distributed over the sliced
    column; the k·num_subspaces centers are assembled driver-side (tiny)
    exactly like ivf's kmeans_centroids.  Engine-specific by construction
    (KMeans|| init), so consumers gate rows-only + recall tests.
    """
    from concurrent.futures import ThreadPoolExecutor

    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    sub = dim // num_subspaces
    spark = vectors.sparkSession

    def _fit(m: int) -> list:
        feats = vectors.select(
            array_to_vector(
                F.slice(F.col(vec_col), m * sub + 1, sub).cast("array<double>")
            ).alias("features")
        )
        model = KMeans(k=num_codewords, seed=seed + m, maxIter=max_iter).fit(feats)
        return [
            (m, c, [float(x) for x in center])
            for c, center in enumerate(model.clusterCenters())
        ]

    # The subspace fits are independent; one thread per subspace overlaps
    # their (short, serial-stage-heavy) job chains on the shared scheduler
    # (r5 perf pass).  Each fit stays seed-deterministic — threading only
    # changes when jobs are *submitted* — and assembly order is pinned by
    # iterating futures in subspace order.
    with ThreadPoolExecutor(max_workers=num_subspaces) as pool:
        futures = [pool.submit(_fit, m) for m in range(num_subspaces)]
        rows = [r for fut in futures for r in fut.result()]
    return spark.createDataFrame(rows, "m long, c_id long, c_sub array<double>")


def pq_topk(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    num_subspaces: int = 4,
    num_codewords: int = 8,
    code_stride: int = 37,
    codebooks: DataFrame | None = None,
    keep_vecs: bool = False,
) -> DataFrame:
    """Product-quantization ANN — the memory-scale path next to LSH/IVF:

    `keep_vecs=True` additionally returns each result's (q_vec, n_vec)
    pair, carried through the scoring subplan so an invariant consumer
    re-derives its checks as a projection instead of two corpus join-backs
    (r7 verdict item 5; see ivf_topk).  NOTE this widens the pre-window
    candidate stream by the full vectors — leave it off for plain serving,
    where the codes-only stream is the point of PQ.
    each vector is compressed to `num_subspaces` small codes; query scoring
    is asymmetric-distance computation (ADC) — per neighbor just
    num_subspaces integer table lookups + adds, never a d-dim float dot.
    (Jégou, Douze, Schmid, "Product Quantization for Nearest Neighbor
    Search", TPAMI 2011.)

    Codebooks: by default codeword c of every subspace is the matching
    slice of the corpus vector with id = c·code_stride — the same
    deterministic, training-free sampling stand-in ivf_topk uses (mod-id
    centroids), so the DuckDB oracle recomputes the codes exactly; pass
    `codebooks` (m, c_id, c_sub — e.g. from pq_codebooks_kmeans) to run a
    trained quantizer through the identical plumbing.

    Cross-engine float discipline: encode argmin compares left-to-right
    squared-L2 sums (bit-identical both engines; ties break on codeword
    id), and ADC contributions are quantized to integer micro-units
    BEFORE the per-pair sum, so the ranking sum is a BIGINT — order-free.

    Plan shape (r5 perf pass): the codebook rides along as a 1-row
    broadcast array, so encode is num_subspaces per-row order-free argmin
    folds — one shuffle-free projection of the corpus; scoring =
    crossJoin against the broadcast per-query lookup maps (n rows
    streaming, no pair shuffle) + the top-k window on q_id, the only
    exchange left.  Scored output column `adc_micro` is the
    micro-quantized squared-L2 ADC estimate (smaller = nearer).
    """
    sub = dim // num_subspaces
    if sub * num_subspaces != dim:
        raise ValueError(f"dim={dim} not divisible by num_subspaces={num_subspaces}")
    ms = F.explode(F.array(*[F.lit(m).cast("long") for m in range(num_subspaces)])).alias("m")
    if codebooks is not None:
        cbm = codebooks
        # The ADC map key is m·K + c_id, so every codebook c_id must be
        # < num_codewords or adjacent subspaces' entries alias and corrupt
        # scores.  The caller passes K explicitly (pq_codebooks_kmeans can
        # return FEWER centers per subspace — ids stay dense from 0, which
        # only leaves unused key slots); no eager job runs at plan-build
        # time (r3 ADVICE: the old max(c_id) probe was a surprising action
        # inside a pure plan-building API).
    else:
        cbm = (
            vectors.filter(
                (F.col(id_col) % code_stride == 0)
                & (F.col(id_col) < code_stride * num_codewords)
            )
            .select((F.col(id_col) / code_stride).cast("long").alias("c_id"), F.col(vec_col).alias("cv"), ms)
            .select("c_id", "m", F.slice(F.col("cv"), (F.col("m") * sub + 1).cast("int"), sub).alias("c_sub"))
        )
    # The codebook rides along as a 1-row broadcast array (r5 perf pass):
    # encode is num_subspaces per-row order-free argmin folds — one
    # shuffle-free projection of the corpus instead of the old explode ×
    # join × two groupBy exchanges.
    cb1 = F.broadcast(_pq_model_1row(cbm, "c_id", num_subspaces))
    code_entries = [
        _pq_code_entry(m, sub, F.col(vec_col), "c_id") for m in range(num_subspaces)
    ]
    codes_wide = _spread(vectors).crossJoin(cb1).select(
        F.col(id_col).alias("n_id"),
        F.map_from_entries(F.array(*code_entries)).alias("cmap"),
        *([F.col(vec_col).alias("n_vec")] if keep_vecs else []),
    )

    # The ADC map key is m·K + c_id; a codebook row with c_id >= K would
    # alias an adjacent subspace's entry and silently corrupt every score
    # (r4 ADVICE).  Zero-cost lazy guard: misuse fails loudly at execution
    # instead of returning wrong rankings.  Both map-build and lookup go
    # through the same model array, so guarding the key build covers the
    # lookup too.
    def _adc_entry(e: Column) -> Column:
        key = F.when(
            e["c_id"] < num_codewords,
            e["m"] * num_codewords + e["c_id"],
        ).otherwise(
            F.raise_error(
                F.format_string(
                    "pq_topk: codebook c_id %s >= num_codewords %s — ADC keys "
                    "would alias adjacent subspaces; pass num_codewords matching "
                    "the trained codebooks",
                    e["c_id"].cast("string"),
                    F.lit(str(num_codewords)),
                )
            ).cast("long")
        )
        contrib = F.round(
            F.lit(1e6)
            * l2sq(
                F.slice(F.col("q_vec"), (e["m"] * sub + 1).cast("int"), sub),
                e["c_sub"],
            )
        ).cast("long")
        return F.struct(key.alias("key"), contrib.alias("contrib"))

    adc_wide = queries.crossJoin(cb1).select(
        "q_id",
        F.map_from_entries(F.transform(F.col("model"), _adc_entry)).alias("amap"),
        *(["q_vec"] if keep_vecs else []),
    )
    adc_sum: Column | None = None
    for m in range(num_subspaces):
        term = F.element_at(
            F.col("amap"),
            F.lit(m * num_codewords).cast("long") + F.element_at(F.col("cmap"), F.lit(m).cast("long")),
        )
        adc_sum = term if adc_sum is None else adc_sum + term
    scored = (
        codes_wide.crossJoin(F.broadcast(adc_wide))
        .filter(F.col("q_id") != F.col("n_id"))
        .withColumn("adc_micro", adc_sum)
    )
    w = Window.partitionBy("q_id").orderBy(F.col("adc_micro").asc(), F.col("n_id").asc())
    extra = ["q_vec", "n_vec"] if keep_vecs else []
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("q_id", "n_id", "adc_micro", F.col("rk").cast("long").alias("rk"), *extra)
    )


def ivf_pq_scored(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroid_mod: int = 29,
    nprobe: int = 2,
    num_subspaces: int = 4,
    num_codewords: int = 8,
    code_stride: int = 37,
    with_probe_rank: bool = False,
) -> DataFrame:
    """IVF-PQ (IVFADC, Jégou et al. 2011 §IV) — the production-scale ANN
    composition: a coarse inverted-file quantizer cuts the SCAN (only
    `nprobe` lists are visited) and a product quantizer over the
    RESIDUALS (vector − its centroid) cuts the MEMORY (num_subspaces
    bytes per vector) and the per-candidate cost (ADC table lookups).
    Residual encoding is what plain PQ lacks on clustered data: after
    subtracting the coarse centroid the residuals are near-isotropic,
    so the subquantizers spend their bits on local detail.

    Deterministic, oracle-reproducible quantizers (the ivf_topk/pq_topk
    stand-in convention): coarse centroids are the vectors with id ≡ 0
    (mod centroid_mod); residual codeword c of each subspace is the
    matching slice of the RESIDUAL of the vector with id = c·code_stride.
    Swap either for trained centers through the same frames.

    Exactness discipline: every distance is a left-to-right zip_with/
    aggregate fold (mirrored term-for-term by the generated oracle SQL);
    ADC contributions are micro-quantized BEFORE the per-pair BIGINT sum.
    The query's residual differs per probed list, so the broadcast ADC
    table is (q × nprobe × M × K) rows — still tiny.

    Plan shape (r5 perf pass): the coarse model and residual codebook
    ride along as 1-row broadcast arrays — assignment + residual are ONE
    shuffle-free projection (argmax fold + in-array centroid lookup),
    encode is per-row argmin folds over the same projection; scoring
    joins the code stream of the PROBED LISTS ONLY against the broadcast
    ADC maps and ranks per query (the top-k window is the only exchange).

    This function returns the SCORED relation (q_id, n_id, adc_micro)
    before the top-k cut; ivf_pq_topk adds the rank window.
    `with_probe_rank=True` additionally carries `pr` — the 1-based probe
    rank of the candidate's list for that query — which makes ONE
    all-lists relation (nprobe = K) servable at every smaller nprobe by
    a filter: the factoring the recall-vs-cost curve gate sweeps over.
    """
    sub = dim // num_subspaces
    if sub * num_subspaces != dim:
        raise ValueError(f"dim={dim} not divisible by num_subspaces={num_subspaces}")
    ms = F.explode(
        F.array(*[F.lit(m).cast("long") for m in range(num_subspaces)])
    ).alias("m")
    res = lambda v, c: F.zip_with(v, c, lambda x, y: x.cast("double") - y.cast("double"))  # noqa: E731

    cents = vectors.filter(F.col(id_col) % centroid_mod == 0).select(
        F.col(id_col).alias("c_id"),
        F.col(vec_col).alias("c_vec"),
        norm(F.col(vec_col)).alias("c_norm"),
    )
    # nearest-centroid assignment (same ranking + tie-break as ivf_topk),
    # with the model riding along as a 1-row broadcast array (r5 perf
    # pass): argmax fold + centroid lookup + residual in ONE shuffle-free
    # projection — no crossJoin expansion, no groupBy(n_id) exchange, no
    # assigned⋈vectors⋈cents re-joins.
    cmodel = F.broadcast(_model_1row(cents, "c_id", "c_vec", "c_norm"))
    with_res = (
        _spread(vectors).crossJoin(cmodel)
        .select(
            F.col(id_col).alias("n_id"),
            F.col(vec_col).alias("v"),
            F.col("model"),
            _fold_argmax_sim(_centroid_sims(F.col(vec_col))).alias("w"),
        )
        .select(
            "n_id",
            F.col("w")["c_id"].alias("c_list"),
            res(
                F.col("v"),
                F.element_at(
                    F.filter(
                        F.col("model"), lambda c: c["c_id"] == F.col("w")["c_id"]
                    ),
                    1,
                )["c_vec"],
            ).alias("r"),
        )
        # Materialized once: rcb init, encoding, and serving all read this
        # frame, and HOF folds see no CSE — without a barrier, collapsed
        # projections would re-inline the argmax fold into every consumer
        # (measured 7× slower).  LAZY localCheckpoint, not persist (r5
        # review): persist left a corpus-sized cache entry parked in the
        # caller's session with no unpersist point (the consumers are all
        # in the returned lazy plan); the checkpoint truncates lineage the
        # same way, lives outside the cache manager, and its blocks free
        # when the frame is GC'd.  Trade-off (the bpe.py/sketch.py note):
        # checkpoint blocks are not recomputable on executor loss.
        .localCheckpoint(eager=False)
    )
    # residual codebooks from the sampled vectors' residuals
    rcb = (
        with_res.filter(
            (F.col("n_id") % code_stride == 0)
            & (F.col("n_id") < code_stride * num_codewords)
        )
        .select((F.col("n_id") / code_stride).cast("long").alias("pq_c"), F.col("r").alias("cr"), ms)
        .select("pq_c", "m", F.slice(F.col("cr"), (F.col("m") * sub + 1).cast("int"), sub).alias("c_sub"))
    )
    # encode every residual: the residual codebook as a second 1-row
    # broadcast array (coverage-guarded); num_subspaces per-row argmin
    # folds, no shuffle
    rcb1 = F.broadcast(_pq_model_1row(rcb, "pq_c", num_subspaces))
    codes_wide = with_res.crossJoin(rcb1).select(
        "n_id",
        "c_list",
        F.map_from_entries(
            F.array(
                *[
                    _pq_code_entry(m, sub, F.col("r"), "pq_c")
                    for m in range(num_subspaces)
                ]
            )
        ).alias("cmap"),
    )
    # query probes: nprobe nearest coarse lists per query
    # (_probe_centroids = the old rank window's exact order), residual
    # per probed list — the probed centroid rides in the sort struct
    probe_lists = _probe_centroids(
        queries, cmodel, nprobe, with_vec=True, with_rank=with_probe_rank
    ).select(
        "q_id",
        *([(F.col("pr") + 1).cast("long").alias("pr")] if with_probe_rank else []),
        F.col("p")["c_id"].alias("c_list"),
        res(F.col("q_vec"), F.col("p")["c_vec"]).alias("qr"),
    )

    def _adc_entry(e: Column) -> Column:
        return F.struct(
            (e["m"] * num_codewords + e["pq_c"]).alias("key"),
            F.round(
                F.lit(1e6)
                * l2sq(
                    F.slice(F.col("qr"), (e["m"] * sub + 1).cast("int"), sub),
                    e["c_sub"],
                )
            )
            .cast("long")
            .alias("contrib"),
        )

    adc_wide = probe_lists.crossJoin(rcb1).select(
        "q_id",
        *(["pr"] if with_probe_rank else []),
        "c_list",
        F.map_from_entries(F.transform(F.col("model"), _adc_entry)).alias("amap"),
    )
    adc_sum: Column | None = None
    for m in range(num_subspaces):
        term = F.element_at(
            F.col("amap"),
            F.lit(m * num_codewords).cast("long")
            + F.element_at(F.col("cmap"), F.lit(m).cast("long")),
        )
        adc_sum = term if adc_sum is None else adc_sum + term
    return (
        codes_wide.join(F.broadcast(adc_wide), "c_list")
        .filter(F.col("q_id") != F.col("n_id"))
        .withColumn("adc_micro", adc_sum)
        .select(
            "q_id",
            "n_id",
            *(["pr"] if with_probe_rank else []),
            "adc_micro",
        )
    )


def ivf_pq_topk(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    centroid_mod: int = 29,
    nprobe: int = 2,
    num_subspaces: int = 4,
    num_codewords: int = 8,
    code_stride: int = 37,
) -> DataFrame:
    """IVFADC top-k: ivf_pq_scored's candidate relation (see there for the
    full composition/scale notes) cut by the per-query rank window
    (adc_micro ASC, n_id ASC)."""
    scored = ivf_pq_scored(
        vectors, queries, dim, vec_col, id_col, centroid_mod, nprobe,
        num_subspaces, num_codewords, code_stride,
    )
    w = Window.partitionBy("q_id").orderBy(F.col("adc_micro").asc(), F.col("n_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("q_id", "n_id", "adc_micro", F.col("rk").cast("long").alias("rk"))
    )


def exact_rerank(
    vectors: DataFrame,
    queries: DataFrame,
    shortlist: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
) -> DataFrame:
    """Exact-cosine RE-RANKING of an approximate shortlist — the second
    stage of two-stage retrieval (Jégou, Douze & Schmid 2011 §V's IVFADC+R:
    ADC cuts the corpus to R candidates on codes alone, then the R true
    vectors are fetched and ranked exactly; reference lineage:
    the CodecDB papers' eval reports quality the same way).  `shortlist`
    is any (q_id, n_id) frame (e.g. ivf_pq_topk at k=R); output is
    (q_id, n_id, cosine, rk ≤ k) — identical shape and ORDER SEMANTICS to
    brute_force_topk (cosine desc, n_id asc), so recall gates compose.

    Scale shape: the candidate fetch is a broadcast of the R·|q| shortlist
    against the corpus scan (one semi-join-shaped hash join — candidates
    pay the vector read, nothing else does), queries ride broadcast, and
    the final rank is a Window PARTITIONED by q_id over ≤R rows per
    query.

    The shortlist contract is ANY (q_id, n_id) frame: duplicates are
    dropped and q_id = n_id self-pairs filtered here (r10 advice — the
    rk-unique, self-excluded ivf_pq_topk output never exercised either,
    but a caller handing a multi-band candidate union would otherwise get
    duplicate neighbors inside its top-k).  Both ops act on the tiny
    R·|q| frame before the broadcast, so the corpus side never pays."""
    cand = vectors.select(
        F.col(id_col).alias("n_id"),
        F.col(vec_col).alias("n_vec"),
        norm(F.col(vec_col)).alias("n_norm"),
    )
    q = F.broadcast(queries.withColumn("q_norm", norm(F.col("q_vec"))))
    scored = (
        F.broadcast(
            shortlist.select("q_id", "n_id")
            .filter(F.col("q_id") != F.col("n_id"))
            .distinct()
        )
        .join(cand, "n_id")
        .join(q, "q_id")
        .withColumn(
            "cosine",
            cosine_pre(
                F.col("q_vec"), F.col("n_vec"), F.col("q_norm"), F.col("n_norm")
            ),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("n_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("q_id", "n_id", "cosine", F.col("rk").cast("long").alias("rk"))
    )


def ivf_coarse_shortlist(
    vectors: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    r: int = 100,
    centroid_mod: int = 29,
    nprobe: int = 4,
) -> DataFrame:
    """Stage 1 of two-stage retrieval on the FLAT IVF tier: an R-candidate
    shortlist ranked by the COARSE quantizer alone — a candidate's score
    is its inverted list's probe rank (how near the query is to that
    list's centroid), tie-broken by n_id.  No candidate vector is ever
    read: stage 1 touches only the (n_id, c_list) assignment stream, the
    zero-bytes-per-vector analog of IVFADC's code scan, and exact_rerank
    then fetches just the R true vectors (Jégou'11 §V composition).

    Why this exists next to ivf_topk: re-ranking ivf_topk's own shortlist
    is the IDENTITY (its stage already scores candidates by exact cosine),
    so the meaningful flat-tier two-stage serve is coarse-rank → exact
    re-rank.  Because a list's members share its probe rank, R should be
    sized generously (default 100) relative to expected list population —
    exactly the recall-vs-rows_read dial the ivfpq curve gate measures.

    Scale shape: assignment is the shuffle-free broadcast-model argmax
    fold over the corpus; probes ride broadcast; the only exchange is the
    per-query rank window over probed-list members."""
    cents = vectors.filter(F.col(id_col) % centroid_mod == 0).select(
        F.col(id_col).alias("c_id"),
        F.col(vec_col).alias("c_vec"),
        norm(F.col(vec_col)).alias("c_norm"),
    )
    cmodel = F.broadcast(_model_1row(cents, "c_id", "c_vec", "c_norm"))
    inv = _spread(vectors).crossJoin(cmodel).select(
        F.col(id_col).alias("n_id"),
        _fold_argmax_sim(_centroid_sims(F.col(vec_col)))["c_id"].alias("c_id"),
    )
    probes = _probe_centroids(queries, cmodel, nprobe, with_rank=True).select(
        "q_id", "pr", F.col("p")["c_id"].alias("c_id")
    )
    w = Window.partitionBy("q_id").orderBy(F.col("pr").asc(), F.col("n_id").asc())
    return (
        F.broadcast(probes)
        .join(inv, "c_id")
        .filter(F.col("q_id") != F.col("n_id"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= r)
        .select("q_id", "n_id", F.col("rk").cast("long").alias("rk"))
    )


def lsh_collision_shortlist(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    r: int = 20,
    bands: int = 4,
    planes_per_band: int = 4,
    plane_stride: int = 16,
) -> DataFrame:
    """Stage 1 of two-stage retrieval on the LSH tier: an R-candidate
    shortlist from MULTI-BAND signature collisions, ranked by how many
    bands agree (collision count DESC — the classic LSH amplification
    score: P[band collision] grows with cosine, so more agreeing bands ⇒
    nearer with higher confidence), tie-broken by n_id.  Like the coarse
    IVF shortlist, stage 1 reads only integer band keys — never a vector —
    and exact_rerank fetches just the R candidates.

    Contrast with lsh_bucket_topk (the single-signature serve, recall
    0.08 at the gated operating point): one 6-plane bucket both CUTS
    candidates hard and scores them with the exact cosine, so re-ranking
    it is the identity.  Banding with fewer planes per band recovers the
    missed neighbors (a true near pair collides in ≥1 of 4 bands with far
    higher probability), and the collision count gives a vector-free
    stage-1 order to cut the union back to R.  Plane identities use the
    stride-16 layout (see lsh_band_keys_arrow).

    Scale shape: corpus side is n·bands (band, key) rows; the query side
    rides broadcast; candidates group on (q_id, n_id) bounded by band
    collisions — never all-pairs."""
    nbk = vectors.select(
        F.col(id_col).alias("n_id"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        hyperplane_signature(
                            F.col(vec_col), dim, planes_per_band,
                            base_plane=b * plane_stride,
                        ).alias("key"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("n_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    qbk = queries.select(
        F.col("q_id"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        hyperplane_signature(
                            F.col("q_vec"), dim, planes_per_band,
                            base_plane=b * plane_stride,
                        ).alias("key"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("q_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    colls = (
        F.broadcast(qbk)
        .join(nbk, ["band", "key"])
        .filter(F.col("q_id") != F.col("n_id"))
        .groupBy("q_id", "n_id")
        .agg(F.count(F.lit(1)).alias("colls"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("colls").desc(), F.col("n_id").asc())
    return (
        colls.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= r)
        .select("q_id", "n_id", "colls", F.col("rk").cast("long").alias("rk"))
    )


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
        norm(F.col(vec_col)).alias("n_norm"),
        hyperplane_signature(F.col(vec_col), dim, num_planes).alias("bucket"),
    )
    q = queries.withColumn(
        "bucket", hyperplane_signature(F.col("q_vec"), dim, num_planes)
    ).withColumn("q_norm", norm(F.col("q_vec")))
    scored = (
        F.broadcast(q)
        .join(cand, "bucket")
        .filter(F.col("q_id") != F.col("n_id"))
        .withColumn(
            "cosine",
            cosine_pre(F.col("q_vec"), F.col("n_vec"), F.col("q_norm"), F.col("n_norm")),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("n_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("q_id", "n_id", "cosine", F.col("rk").cast("long").alias("rk"))
    )


def ivf_assign_arrow(
    vectors: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroid_mod: int = 29,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """(n_id, c_list): nearest-centroid assignment as ONE vectorized Arrow
    batch matmul — the throughput twin of ivf_topk's expression-fold
    assignment (r3 verdict item 8: the interpreted 69-centroid HOF fold is
    the local cost driver of in-stream encoding).

    Semantics match the expression form: rank dot(v,c)/|c| descending,
    tie-break to the smallest c_id (centroid rows are ordered by c_id and
    np.argmax returns the FIRST maximum).  Numerics: the matmul sums
    pairwise where the fold sums left-to-right — assignments can only
    differ when two centroids' similarities agree to ~1e-13, so the
    expression form remains the oracle-gated face and this one is pinned
    equal on separated data in tests (same contract as lsh_band_keys_arrow
    vs the expression signatures).

    Works unchanged on a streaming DataFrame (stateless projection).
    """
    import numpy as np
    import pandas as pd

    if centroids is None:
        centroids = vectors.filter(F.col(id_col) % centroid_mod == 0).select(
            F.col(id_col).alias("c_id"),
            F.col(vec_col).alias("c_vec"),
            norm(F.col(vec_col)).alias("c_norm"),
        )
    model = sorted(centroids.collect(), key=lambda r: r["c_id"])
    ids = np.array([int(r["c_id"]) for r in model], dtype=np.int64)
    C = np.array([[float(x) for x in r["c_vec"]] for r in model], dtype=np.float64)
    norms = np.array([float(r["c_norm"]) for r in model], dtype=np.float64)

    from pyspark.sql.pandas.functions import pandas_udf
    from pyspark.sql.types import LongType

    @pandas_udf(returnType=LongType())
    def assign(vs: pd.Series) -> pd.Series:
        mat = np.stack(vs.to_numpy()).astype(np.float64)  # (n, d)
        sims = (mat @ C.T) / norms  # (n, K)
        return pd.Series(ids[np.argmax(sims, axis=1)])

    return vectors.select(
        F.col(id_col).alias("n_id"), assign(F.col(vec_col)).alias("c_list")
    )


def _sql_double(v: float) -> str:
    """SQL text for an exact DOUBLE literal.  repr() is the shortest
    round-trip form and Spark's string→double cast (Double.parseDouble)
    is correctly rounded, so the parsed value is bit-identical to the
    Python float — scientific notation included, which a bare SQL numeric
    literal would type as DECIMAL."""
    return f"CAST('{float(v)!r}' AS DOUBLE)"


def _sql_double_arr(vals) -> str:
    """SQL text for an array<double> literal (see _sql_double)."""
    return "array(" + ",".join(_sql_double(v) for v in vals) + ")"


def _sql_dot(a_sql: str, b_sql: str) -> str:
    """SQL text for `dot` (left-to-right zip_with/aggregate double fold)
    — the same op sequence as the Column form and the oracle mirrors, so
    results are bit-identical."""
    return (
        f"aggregate(zip_with({a_sql},{b_sql},"
        f"(x,y)->CAST(x AS DOUBLE)*CAST(y AS DOUBLE)),"
        f"CAST(0 AS DOUBLE),(acc,x)->acc+x)"
    )


def ivf_assign_sql(vec_sql: str, centroid_rows: list) -> str:
    """SQL text for the nearest-centroid id of `vec_sql` — the stateless
    model-broadcast scorer used by the in-stream encoders, with the
    centroid model embedded as literals.  Ranking and tie-break match
    ivf_topk's assignment exactly (dot/|c| descending, smaller c_id
    wins), and every dot is the same left-to-right zip_with/aggregate
    fold the oracle SQL mirrors — so outputs stay value-gateable.
    `centroid_rows` are collected (c_id, c_vec[, ...]) rows, the usual
    tiny model artifact.  Generated as SQL TEXT parsed by one F.expr
    (r5 perf pass): building the same tree through the Python Column API
    costs thousands of py4j round-trips of driver time per plan (the
    _sql_dist_arr rationale).  |c| is pre-folded driver-side with the
    identical IEEE op sequence (left-assoc Σx², correctly-rounded sqrt —
    both engines' doubles), bit-identical to what Catalyst would
    constant-fold from the literal."""
    elems = []
    for r in centroid_rows:
        c_vec = [float(x) for x in r["c_vec"]]
        s = 0.0
        for v in c_vec:
            s += v * v
        sim = f"{_sql_dot(vec_sql, _sql_double_arr(c_vec))}/{_sql_double(math.sqrt(s))}"
        elems.append(
            f"named_struct('sim',{sim},'c_id',CAST({int(r['c_id'])} AS BIGINT))"
        )
    # similarity computed ONCE per centroid (array element), then a cheap
    # fold picks the argmax — HOF lambdas are interpreted with no CSE, so
    # a fold whose predicate repeated the dot would pay it three times
    init = "named_struct('sim',CAST('-Infinity' AS DOUBLE),'c_id',CAST(-1 AS BIGINT))"
    return (
        f"(aggregate(array({','.join(elems)}),{init},"
        f"(acc,s)->IF(s.sim>acc.sim OR (s.sim=acc.sim AND s.c_id<acc.c_id),"
        f"s,acc))).c_id"
    )


def ivf_assign_expr(vec_sql: str, centroid_rows: list) -> Column:
    """Column form of ivf_assign_sql (one F.expr parse)."""
    return F.expr(ivf_assign_sql(vec_sql, centroid_rows))


# --- exact-integer Lloyd k-means + IVF (the value-gateable TRAINED tier) ---


def quantize_micro(a: Column, scale: float = 1e6) -> Column:
    """Element-wise floor(x·scale + 0.5) as array<long> — the cross-engine
    integer anchor (same discipline as pq_topk's ADC micro-units): float32
    elements cast to double, one correctly-rounded multiply, floor.  Both
    engines produce identical BIGINTs, so every distance derived from the
    quantized vectors is exact integer arithmetic — order-free, no float
    gate risk at all."""
    return F.transform(
        a, lambda x: F.floor(x.cast("double") * F.lit(scale) + F.lit(0.5)).cast("long")
    )


def l2_micro(a: Column, b: Column) -> Column:
    """Σ (aᵢ−bᵢ)² over two array<long> columns as BIGINT (JVM-side fold).
    Exact: micro-quantized embedding components are ≤ ~1e6, so each term
    is ≤ 4e12 and a 64-dim sum ≤ ~3e14 — far inside BIGINT."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def dot_micro(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ over two array<long> columns as BIGINT (JVM-side fold).
    Exact and order-free (integer addition): with MILLI-quantized inputs
    (quantize_micro scale=1e3, components ≤ ~1e3) each term is ≤ 1e6 and a
    64-dim sum ≤ ~6.4e7 — small enough that downstream BIGINT products of
    two dots (the rational cosine test in dedup.semantic_dedup) stay far
    inside int64.  Micro-scale (1e6) inputs are for DISTANCES (l2_micro);
    dot-product consumers must quantize at milli scale or coarser."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _sql_dot_micro(a_sql: str, b_sql: str) -> str:
    """SQL text for dot_micro (BIGINT Σ aᵢ·bᵢ fold) — same shape as the
    Column form so oracles replay it exactly."""
    return (
        f"aggregate(zip_with({a_sql},{b_sql},(x,y)->x*y),"
        f"CAST(0 AS BIGINT),(acc,x)->acc+x)"
    )


def _sql_long_arr(vals) -> str:
    """SQL text for an array<bigint> literal."""
    return "array(" + ",".join(f"{int(v)}L" for v in vals) + ")"


def _sql_l2_micro(a_sql: str, b_sql: str) -> str:
    """SQL text for l2_micro (BIGINT Σ(aᵢ−bᵢ)² fold) — the same
    zip_with/aggregate shape, so semantics match the Column form and the
    oracles exactly."""
    return (
        f"aggregate(zip_with({a_sql},{b_sql},(x,y)->(x-y)*(x-y)),"
        f"CAST(0 AS BIGINT),(acc,x)->acc+x)"
    )


def _sql_dist_arr(vec_sql: str, entries, with_center: bool = False) -> str:
    """SQL text for array<struct(d, c_id[, c])> of BIGINT L2 distances from
    `vec_sql` to every literal center in `entries` ([(c_id, vec_micro)]
    Python rows — the usual tiny collected model).  The struct field order
    makes lexicographic struct comparison = (distance, then smaller c_id),
    so array_min / array_sort implement the exact argmin / probe-ranking
    semantics every micro-tier oracle mirrors — as ONE map-side expression:
    no N×K row expansion, no shuffle (the r5 perf pass: the join +
    groupBy(n_id) form paid a full-corpus shuffle per use).  Generated as
    SQL TEXT parsed by one F.expr call because building the same tree
    through the Python Column API costs hundreds of py4j round-trips
    (~2 s of driver time per plan at K·M=32 centers — measured)."""
    elems = []
    for cid, c in entries:
        carr = _sql_long_arr(c)
        fields = (
            f"'d',{_sql_l2_micro(vec_sql, carr)},'c_id',CAST({int(cid)} AS BIGINT)"
        )
        if with_center:
            fields += f",'c',{carr}"
        elems.append(f"named_struct({fields})")
    return "array(" + ",".join(elems) + ")"


def _micro_dist_arr(vec_sql: str, entries, with_center: bool = False) -> Column:
    """Column form of _sql_dist_arr (one F.expr parse)."""
    return F.expr(_sql_dist_arr(vec_sql, entries, with_center))


def _micro_argmin_sql(vec_sql: str, entries, with_center: bool = False) -> str:
    """SQL text for struct(d, c_id[, c]) of the nearest literal center
    (ties to the smaller c_id; `c` never participates in comparison
    because c_id is unique).  See _sql_dist_arr."""
    return f"array_min({_sql_dist_arr(vec_sql, entries, with_center)})"


def _micro_argmin(vec_sql: str, entries, with_center: bool = False) -> Column:
    """Column form of _micro_argmin_sql (one F.expr parse)."""
    return F.expr(_micro_argmin_sql(vec_sql, entries, with_center))


def kmeans_lloyd_micro(
    vectors: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    k: int = 8,
    stride: int = 37,
    iters: int = 2,
    init_cents: list[tuple[int, list[int]]] | None = None,
) -> list[tuple[int, list[int]]]:
    """TRAINED coarse quantizer with a cross-engine-exact Lloyd iteration —
    the value-gateable counterpart of kmeans_centroids (whose KMeans‖ init
    is engine-specific and therefore rows-only gated).

    Everything is integer-anchored so a SQL oracle replays training
    bit-for-bit: vectors are micro-quantized (quantize_micro), assignment
    is integer-L2 argmin with ties to the smaller centroid id, and the
    centroid update is round(Σv / n) back to integers — Σv is an exact
    BIGINT and Σv/n an exact-input double division, so the half-away-from-
    zero round is identical in Spark, DuckDB and this driver-side mirror.
    Init = the deterministic stride sample (ids 0, stride, …, (k−1)·stride),
    i.e. the same training-free stand-in the untrained tier uses — after
    `iters` Lloyd rounds the centers are genuinely data-adapted.

    Scale shape: per iteration ONE pass over the corpus (map-side
    literal-model argmin expression, no N×K shuffle) + ONE k×(dim+1)-cell
    aggregation; the k-row model is collected per round (the usual tiny
    model artifact, like kmeans_centroids' fitted centers).  Returns
    [(c_id, c_vec_micro)] rows for ivf_topk_micro / literal re-broadcast.
    """
    # operator-owned cache lifetime (the heavy_hitters discipline): the
    # quantized frame is scanned once per Lloyd round, so persist it for
    # the loop and release it before returning — iters=0 (the init-only
    # probe) skips the cache entirely
    vm = vectors.select(
        F.col(id_col).alias("n_id"), quantize_micro(F.col(vec_col)).alias("v")
    )
    spark = vectors.sparkSession
    # persist BEFORE the init collect (r12): the init sample job then fills
    # the cache as a side effect, so round 1 reads cached quantized blocks
    # instead of re-scanning + re-quantizing the corpus
    if iters > 1:
        vm = vm.persist()
    if init_cents is not None:
        # caller already collected the deterministic stride sample (e.g.
        # ivfpq_train_micro shares ONE sample collect between both
        # quantizers' inits) — identical tuples, one fewer action
        cents = sorted(init_cents)
    else:
        cents = sorted(
            (int(r["n_id"]) // stride, [int(x) for x in r["v"]])
            for r in vm.filter(
                (F.col("n_id") % stride == 0) & (F.col("n_id") < stride * k)
            ).collect()
        )
    try:
        cents = _lloyd_rounds(spark, vm, (), cents, dim, iters)
    finally:
        if iters > 1:
            vm.unpersist()
    return cents


def _round_half_away(s: int, n: int) -> int:
    """Half-away-from-zero rounding of the EXACT rational s/n (n > 0),
    in pure integer arithmetic.  The old float form floor(s/n + 0.5)
    diverged from true rounding on boundary doubles (e.g. the double
    nearest 0.4999999999999999 rounds UP once +0.5 is itself rounded) —
    r5 ADVICE.  The Lloyd oracles mirror this exact form in SQL
    ((2s + n) // (2n) with floor division on non-negative operands), so
    neither engine ever rounds a double."""
    assert n > 0
    s = int(s)
    return (2 * s + n) // (2 * n) if s >= 0 else -((-2 * s + n) // (2 * n))


def _lloyd_rounds(spark, vm, keys, model, vec_len: int, iters: int):
    """The ONE exact-Lloyd recurrence every trainer shares
    (kmeans_lloyd_micro, pq_codebooks_lloyd_micro, and the residual stage
    of ivf_pq_topk_lloyd_micro — r5 review: three inline copies risked
    silently diverging from each other and from their SQL oracles).

    `vm`: DataFrame (*keys, n_id, v) with v array<long> (micro units);
    `model`: sorted [( *keys, c_id, vec ), ...] tuples.  One round =
    literal-model BIGINT-L2 argmin as a map-side expression (ties to the
    smaller c_id; _micro_argmin per key group, dispatched by a when-chain
    on the key columns) → per-(keys, c_id) exact integer sums →
    round-half-away mean update; empty clusters keep their previous
    center.  Returns the updated model in the same tuple shape.  Cost per
    round: ONE pass over vm with a map-side partial aggregate into a
    k·|keys|-row collect — no row expansion, no per-row shuffle (the r5
    perf pass removed the broadcast-join + groupBy(n_id) form, which paid
    a full-corpus shuffle per round).
    """
    for _ in range(iters):
        groups: dict[tuple, list] = {}
        for *ks, c_id, vec in model:
            groups.setdefault(tuple(int(x) for x in ks), []).append((c_id, vec))
        if keys:
            whens = []
            for ks, entries in groups.items():
                cond = " AND ".join(
                    f"{kname} = {kval}" for kname, kval in zip(keys, ks)
                )
                whens.append(
                    f"WHEN {cond} THEN ({_micro_argmin_sql('v', entries)}).c_id"
                )
            cid_expr = F.expr("CASE " + " ".join(whens) + " END")
        else:
            cid_expr = F.expr(f"({_micro_argmin_sql('v', groups[()])}).c_id")
        stats = (
            vm.select(*keys, cid_expr.alias("c_id"), "v")
            .groupBy(*keys, "c_id")
            .agg(
                F.count(F.lit(1)).alias("n"),
                *[F.sum(F.col("v")[j]).alias(f"s{j}") for j in range(vec_len)],
            )
            .collect()
        )
        by_key = {tuple(int(r[k]) for k in (*keys, "c_id")): r for r in stats}
        new_model = []
        for row in model:
            *ks, c_id, old = row
            r = by_key.get((*[int(x) for x in ks], int(c_id)))
            if r is None:  # empty cluster: keep the old center (oracle mirrors)
                new_model.append(row)
                continue
            n = int(r["n"])
            new_model.append(
                (
                    *ks,
                    c_id,
                    [_round_half_away(int(r[f"s{j}"]), n) for j in range(vec_len)],
                )
            )
        model = new_model
    return model


def ivf_topk_micro(
    vectors: DataFrame,
    queries: DataFrame,
    cents: list[tuple[int, list[int]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    nprobe: int = 2,
) -> DataFrame:
    """IVF top-k over the micro-quantized integer space with a trained
    (kmeans_lloyd_micro) centroid model — every distance is BIGINT, so the
    whole query (training included) is bit-exact against a SQL oracle.

    Same semantics as ivf_topk with the model folded into map-side
    expressions (the r5 perf pass): corpus assignment is a literal-model
    argmin projection (no crossJoin expansion, no groupBy(n_id) shuffle)
    and probe selection is array_sort over the same literal distances
    (ascending (d, c_id) — exactly the old rank window's order) sliced to
    nprobe — so the serve plan is scan → broadcast join → ONE top-k
    window.  Output (q_id, n_id, l2_micro2, rk); smaller = nearer.
    """
    vm = vectors.select(
        F.col(id_col).alias("n_id"), quantize_micro(F.col(vec_col)).alias("v")
    )
    assigned = vm.select(
        "n_id", "v", F.expr(f"({_micro_argmin_sql('v', cents)}).c_id").alias("c_id")
    )
    qm = queries.select("q_id", quantize_micro(F.col("q_vec")).alias("qv"))
    probes = qm.selectExpr(
        "q_id",
        "qv",
        f"explode(slice(array_sort({_sql_dist_arr('qv', cents)}), 1, {nprobe})) AS p",
    ).select("q_id", "qv", F.col("p.c_id").alias("c_id"))
    scored = (
        F.broadcast(probes)
        .join(assigned, "c_id")
        .filter(F.col("q_id") != F.col("n_id"))
        .withColumn("l2_micro2", l2_micro(F.col("qv"), F.col("v")))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("l2_micro2").asc(), F.col("n_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("q_id", "n_id", "l2_micro2", F.col("rk").cast("long").alias("rk"))
    )


def pq_codebooks_lloyd_micro(
    vectors: DataFrame,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_subspaces: int = 4,
    num_codewords: int = 8,
    stride: int = 37,
    iters: int = 2,
) -> list[tuple[int, int, list[int]]]:
    """TRAINED product-quantizer codebooks with cross-engine-exact Lloyd —
    the PQ counterpart of kmeans_lloyd_micro (same integer discipline:
    micro-quantized slices, BIGINT-L2 argmin with ties to the smaller
    codeword id, round(Σv/n) centroid updates).  Classic PQ training
    (independent k-means per subquantizer, Jégou et al. TPAMI'11 §III)
    made bit-replayable by a SQL oracle, unlike pq_codebooks_kmeans whose
    KMeans‖ init is engine-specific.

    Per round: ONE broadcast pass over all (vector, subspace) slices +
    ONE (num_subspaces·k)×(sub+1)-cell aggregation; the 32-row model is
    collected per round.  Returns [(m, c_id, c_sub_micro)] rows.
    """
    sub = dim // num_subspaces
    ms = F.explode(
        F.array(*[F.lit(m).cast("long") for m in range(num_subspaces)])
    ).alias("m")
    vm = (
        vectors.select(
            F.col(id_col).alias("n_id"), quantize_micro(F.col(vec_col)).alias("vv"), ms
        )
        .select(
            "n_id",
            "m",
            F.slice(F.col("vv"), (F.col("m") * sub + 1).cast("int"), sub).alias("v"),
        )
    )
    spark = vectors.sparkSession
    init = (
        vectors.filter(
            (F.col(id_col) % stride == 0) & (F.col(id_col) < stride * num_codewords)
        )
        .select((F.col(id_col) / stride).cast("long").alias("c_id"),
                quantize_micro(F.col(vec_col)).alias("vv"), ms)
        .select("m", "c_id",
                F.slice(F.col("vv"), (F.col("m") * sub + 1).cast("int"), sub).alias("c"))
        .collect()
    )
    cbs = sorted((int(r["m"]), int(r["c_id"]), [int(x) for x in r["c"]]) for r in init)
    # operator-owned cache lifetime: the sliced frame feeds every Lloyd
    # round — persist for the loop, release before returning
    if iters > 1:
        vm = vm.persist()
    try:
        cbs = _lloyd_rounds(spark, vm, ("m",), cbs, sub, iters)
    finally:
        if iters > 1:
            vm.unpersist()
    return cbs


def pq_topk_micro(
    vectors: DataFrame,
    queries: DataFrame,
    codebooks: list[tuple[int, int, list[int]]],
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    num_subspaces: int = 4,
    num_codewords: int = 8,
) -> DataFrame:
    """PQ ADC top-k over the micro-quantized integer space with trained
    (pq_codebooks_lloyd_micro) codebooks — every encode distance AND every
    ADC contribution is BIGINT, so training + encode + scoring replay
    bit-for-bit in a SQL oracle (no 1e6-rounding step: the inputs are
    already integers, and a 64-dim micro L2 is ≤ ~3e14, far inside BIGINT).

    Plan shape (r5 perf pass): the 32-row codebook is a Python list, so
    encode is a literal-model argmin PROJECTION per subspace (cmap built
    with map_from_entries over num_subspaces expressions — no explode, no
    join, no groupBy) and the per-query ADC lookup map is the same pure
    projection over the query frame; the only shuffle left is the final
    top-k window.  Output (q_id, n_id, adc_q, rk); smaller = nearer."""
    sub = dim // num_subspaces
    # Same aliasing hazard pq_topk guards (r4 ADVICE): a codebook c_id >=
    # num_codewords would silently collide with an adjacent subspace's map
    # slot.  The codebook is driver-side here, so fail loudly at BUILD time.
    bad = sorted({int(c_id) for _, c_id, _ in codebooks if int(c_id) >= num_codewords})
    if bad:
        raise ValueError(
            f"pq_topk_micro: codebook c_id(s) {bad} >= num_codewords "
            f"{num_codewords} — ADC keys would alias adjacent subspaces"
        )
    by_m: dict[int, list] = {}
    for m, c_id, c_sub_v in codebooks:
        by_m.setdefault(int(m), []).append((c_id, c_sub_v))
    vvdf = vectors.select(
        F.col(id_col).alias("n_id"), quantize_micro(F.col(vec_col)).alias("vv")
    )
    code_entries = ",".join(
        f"named_struct('m',CAST({m} AS BIGINT),'c_id',"
        f"({_micro_argmin_sql(f'slice(vv,{m * sub + 1},{sub})', by_m[m])}).c_id)"
        for m in range(num_subspaces)
    )
    codes_wide = vvdf.select(
        "n_id", F.expr(f"map_from_entries(array({code_entries}))").alias("cmap")
    )
    qdf = queries.select("q_id", quantize_micro(F.col("q_vec")).alias("qv"))
    amap_entries = ",".join(
        f"named_struct('key',CAST({int(m) * num_codewords + int(c_id)} AS BIGINT),"
        f"'contrib',{_sql_l2_micro(f'slice(qv,{int(m) * sub + 1},{sub})', _sql_long_arr(c_sub_v))})"
        for m, c_id, c_sub_v in codebooks
    )
    adc_wide = qdf.select(
        "q_id", F.expr(f"map_from_entries(array({amap_entries}))").alias("amap")
    )
    adc_sum: Column | None = None
    for m in range(num_subspaces):
        term = F.element_at(
            F.col("amap"),
            F.lit(m * num_codewords).cast("long")
            + F.element_at(F.col("cmap"), F.lit(m).cast("long")),
        )
        adc_sum = term if adc_sum is None else adc_sum + term
    scored = (
        codes_wide.crossJoin(F.broadcast(adc_wide))
        .filter(F.col("q_id") != F.col("n_id"))
        .withColumn("adc_q", adc_sum)
    )
    w = Window.partitionBy("q_id").orderBy(F.col("adc_q").asc(), F.col("n_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("q_id", "n_id", "adc_q", F.col("rk").cast("long").alias("rk"))
    )


def ivf_pq_topk_lloyd_micro(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    k_coarse: int = 8,
    stride: int = 37,
    iters: int = 2,
    nprobe: int = 2,
    num_subspaces: int = 4,
    num_codewords: int = 8,
) -> DataFrame:
    """IVF-PQ (IVFADC, Jégou et al. TPAMI'11 §IV) with BOTH quantizers
    TRAINED — Lloyd-iterated coarse centroids AND Lloyd-iterated residual
    codebooks — and the whole thing bit-replayable by a SQL oracle: the
    production ANN composition, exactly.

    Everything runs in the micro-quantized integer space (the
    kmeans_lloyd_micro discipline): coarse training, residuals
    (v − centroid stays BIGINT), per-subspace residual-codebook training
    (init = residual slices of the stride-sampled vectors, mirroring
    ivf_pq_topk's deterministic rcbsrc convention), encoding, and ADC —
    so every intermediate is exact and order-free.

    Plan shape (r5 perf pass — the literal-model expression discipline of
    ivf_topk_micro/pq_topk_micro applied end to end): residual computation
    is a map-side argmin projection over the literal coarse model, encode
    is a per-subspace argmin projection over the literal residual
    codebooks (no explode/join/groupBy), probe selection is array_sort
    over literal coarse distances, and the ADC lookup maps are a pure
    projection over the (query, probed list) frame — the only shuffles
    left are the tiny training aggregates and the final top-k window.
    Output (q_id, n_id, adc_q, rk); smaller = nearer.
    """
    cents, cbs = ivfpq_train_micro(
        vectors,
        dim=dim,
        vec_col=vec_col,
        id_col=id_col,
        k_coarse=k_coarse,
        stride=stride,
        iters=iters,
        num_subspaces=num_subspaces,
        num_codewords=num_codewords,
    )
    codes_wide = ivfpq_encode_micro(
        vectors,
        cents,
        cbs,
        dim=dim,
        vec_col=vec_col,
        id_col=id_col,
        num_subspaces=num_subspaces,
    )
    return ivfpq_rank_micro(
        codes_wide,
        queries,
        cents,
        cbs,
        dim=dim,
        k=k,
        nprobe=nprobe,
        num_subspaces=num_subspaces,
        num_codewords=num_codewords,
    )


def ivfpq_train_micro(
    vectors: DataFrame,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k_coarse: int = 8,
    stride: int = 37,
    iters: int = 2,
    num_subspaces: int = 4,
    num_codewords: int = 8,
) -> tuple[list, list]:
    """Train the two IVFADC quantizers in micro-integer space and return
    the tiny model pair `(cents, cbs)` — cents = [(c_id, vec_micro)],
    cbs = [(m, c_id, c_sub_micro)] — the driver-side artifacts
    ivfpq_encode_micro / ivfpq_rank_micro (and the persisted index build)
    consume.  See ivf_pq_topk_lloyd_micro for the exactness story."""
    sub = dim // num_subspaces
    spark = vectors.sparkSession
    # ONE stride-sample collect feeds BOTH quantizers' inits (r12; was two
    # — the coarse init inside kmeans_lloyd_micro plus a residual-slice
    # collect here): the coarse init is the sampled micro vectors
    # verbatim, and the residual-codebook init is those same vectors
    # minus their nearest FINAL centroid — exact BIGINT arithmetic the
    # driver mirrors bit-for-bit (same (d, c_id)-lexicographic argmin as
    # _micro_argmin_sql, same integer subtraction and slicing), so the
    # recurrence and its SQL oracle are unchanged.
    n_sample = max(k_coarse, num_codewords)
    vm = vectors.select(
        F.col(id_col).alias("n_id"), quantize_micro(F.col(vec_col)).alias("v")
    )
    sample = {
        int(r["n_id"]): [int(x) for x in r["v"]]
        for r in vm.filter(
            (F.col("n_id") % stride == 0) & (F.col("n_id") < stride * n_sample)
        ).collect()
    }
    cents = kmeans_lloyd_micro(
        vectors, vec_col=vec_col, id_col=id_col, dim=dim, k=k_coarse,
        stride=stride, iters=iters,
        init_cents=[
            (nid // stride, v) for nid, v in sample.items() if nid < stride * k_coarse
        ],
    )
    # residuals: nearest coarse centroid (integer L2, min-c_id ties), r = v − c
    # (one argmin into a struct column; the later projection reads both
    # fields — Catalyst inlines it, duplicating a cheap per-row fold)
    best = _micro_argmin_sql("v", cents, with_center=True)
    res = (
        vm.selectExpr(
            "n_id",
            f"({best}).c_id AS c_list",
            f"zip_with(v, ({best}).c, (x,y)->x-y) AS r",
        )
        .persist()  # feeds the Lloyd stats rounds
    )
    try:
        ms = F.explode(
            F.array(*[F.lit(m).cast("long") for m in range(num_subspaces)])
        ).alias("m")
        rm = res.select("n_id", "c_list", F.col("r"), ms).select(
            "n_id",
            "c_list",
            "m",
            F.slice(F.col("r"), (F.col("m") * sub + 1).cast("int"), sub).alias("v_sub"),
        )
        cbs = []
        for nid, v in sample.items():
            if nid >= stride * num_codewords:
                continue
            # exact argmin with ties to the smaller c_id (the
            # _micro_argmin_sql (d, c_id)-lexicographic rule, mirrored)
            best_d, best_cid, best_c = None, None, None
            for cid, cv in cents:
                d = sum((a - int(b)) * (a - int(b)) for a, b in zip(v, cv))
                if best_d is None or d < best_d or (d == best_d and cid < best_cid):
                    best_d, best_cid, best_c = d, cid, cv
            r = [a - int(b) for a, b in zip(v, best_c)]
            for m in range(num_subspaces):
                cbs.append((m, nid // stride, r[m * sub:(m + 1) * sub]))
        cbs = sorted(cbs)
        cbs = _lloyd_rounds(
            spark,
            rm.select("n_id", "m", F.col("v_sub").alias("v")),
            ("m",),
            cbs,
            sub,
            iters,
        )
        return cents, cbs
    finally:
        # Operator-owned cache lifetime: the persisted residuals feed the
        # stats rounds; release them NOW rather than leak into the
        # caller's session.  Consumers recompute residuals from the
        # returned model — one extra pass, the price of not parking cache
        # on the caller.
        res.unpersist(False)


def ivfpq_encode_micro(
    vectors: DataFrame,
    cents: list,
    cbs: list,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_subspaces: int = 4,
    meta_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Encode the corpus against a trained IVFADC model: ONE shuffle-free
    projection (n_id, c_list, cmap[, meta...]) — coarse argmin + residual +
    per-subspace residual-codeword argmin, all map-side (see
    ivf_pq_topk_lloyd_micro's plan-shape note).

    The coarse assignment picks its expression form by model size: up to
    _ENCODE_LITERAL_MAX centroids inline as the literal array_min
    expression (the oracle-shaped form); past that the SQL text grows
    with K·dim and breaks codegen, so the model rides as a 1-row
    broadcast array and a per-row integer-L2 fold computes the SAME
    (min d, tie min c_id) ranking — the flat-IVF _assign shape, scaling
    to thousands of centroids (r9: what lets the persisted-IVFADC
    mutation path run at corpus-grain quantizers)."""
    sub = dim // num_subspaces
    vm = vectors.select(
        F.col(id_col).alias("n_id"),
        quantize_micro(F.col(vec_col)).alias("v"),
        *[F.col(c) for c in meta_cols],
    )
    if len(cents) <= _ENCODE_LITERAL_MAX:
        best = _micro_argmin_sql("v", cents, with_center=True)
        res = vm.selectExpr(
            "n_id",
            f"({best}).c_id AS c_list",
            f"zip_with(v, ({best}).c, (x,y)->x-y) AS r",
            *meta_cols,
        )
    else:
        cmodel = F.broadcast(
            _model_1row(
                vectors.sparkSession.createDataFrame(
                    sorted(cents), "c_id long, c array<long>"
                ),
                "c_id",
                "c",
            )
        )
        entries = F.transform(
            F.col("model"),
            lambda c: F.struct(
                l2_micro(F.col("v"), c["c"]).alias("d"),
                c["c_id"].cast("long").alias("c_id"),
                c["c"].alias("c"),
            ),
        )
        best_c = _fold_argmin_micro(entries)
        res = (
            _spread(vm)
            .crossJoin(cmodel)
            .select(
                "n_id",
                "v",
                best_c.alias("__best"),
                *[F.col(c) for c in meta_cols],
            )
            .select(
                "n_id",
                F.col("__best")["c_id"].alias("c_list"),
                F.zip_with(
                    F.col("v"), F.col("__best")["c"], lambda x, y: x - y
                ).alias("r"),
                *[F.col(c) for c in meta_cols],
            )
        )
    by_m: dict[int, list] = {}
    for m, c_id, c_sub_v in cbs:
        by_m.setdefault(int(m), []).append((c_id, c_sub_v))
    code_entries = ",".join(
        f"named_struct('m',CAST({m} AS BIGINT),'pq_c',"
        f"({_micro_argmin_sql(f'slice(r,{m * sub + 1},{sub})', by_m[m])}).c_id)"
        for m in range(num_subspaces)
    )
    return res.select(
        "n_id",
        "c_list",
        F.expr(f"map_from_entries(array({code_entries}))").alias("cmap"),
        *[F.col(c) for c in meta_cols],
    )


def ivfpq_rank_micro(
    codes_wide: DataFrame,
    queries: DataFrame,
    cents: list,
    cbs: list,
    dim: int = 64,
    k: int = 5,
    nprobe: int = 2,
    num_subspaces: int = 4,
    num_codewords: int = 8,
    probe_list_type: str | None = None,
) -> DataFrame:
    """ADC top-k over an encoded IVFADC corpus `codes_wide`
    (n_id, c_list, cmap — from ivfpq_encode_micro or a persisted index
    scan): literal-model probe selection, per-(query, probed list) ADC
    lookup maps as a pure projection, one top-k window.  Output
    (q_id, n_id, adc_q, rk); smaller = nearer.

    `probe_list_type`: for a PARTITIONED codes scan, the inferred type of
    its c_list partition column — the probe side casts to it so the join
    key types match without touching the scan side (a cast there can stop
    dynamic partition pruning from firing, r4 ADVICE)."""
    sub = dim // num_subspaces
    # probes: nprobe nearest coarse lists per query; query residual per
    # list.  Same size switch as ivfpq_encode_micro: past
    # _ENCODE_LITERAL_MAX centroids the literal array_sort expression is
    # replaced by the broadcast-model form — array_sort over
    # struct(d, c_id, c) entries is the IDENTICAL lexicographic (d, c_id)
    # probe order (c never compares: c_id is unique).
    qm = queries.select("q_id", quantize_micro(F.col("q_vec")).alias("qv"))
    if len(cents) <= _ENCODE_LITERAL_MAX:
        list_sql = (
            f"CAST(p.c_id AS {probe_list_type})" if probe_list_type else "p.c_id"
        )
        probes = qm.selectExpr(
            "q_id",
            "qv",
            f"explode(slice(array_sort({_sql_dist_arr('qv', cents, with_center=True)}), 1, {nprobe})) AS p",
        ).selectExpr(
            "q_id",
            f"{list_sql} AS c_list",
            "zip_with(qv, p.c, (x,y)->x-y) AS qr",
        )
    else:
        cmodel = F.broadcast(
            _model_1row(
                queries.sparkSession.createDataFrame(
                    sorted(cents), "c_id long, c array<long>"
                ),
                "c_id",
                "c",
            )
        )
        entries = F.transform(
            F.col("model"),
            lambda c: F.struct(
                l2_micro(F.col("qv"), c["c"]).alias("d"),
                c["c_id"].cast("long").alias("c_id"),
                c["c"].alias("c"),
            ),
        )
        probes = (
            qm.crossJoin(cmodel)
            .select(
                "q_id",
                "qv",
                F.explode(F.slice(F.array_sort(entries), 1, nprobe)).alias("p"),
            )
            .select(
                "q_id",
                F.col("p")["c_id"]
                .cast(probe_list_type or "bigint")
                .alias("c_list"),
                F.zip_with(
                    F.col("qv"), F.col("p")["c"], lambda x, y: x - y
                ).alias("qr"),
            )
        )
    amap_entries = ",".join(
        f"named_struct('key',CAST({int(m) * num_codewords + int(c_id)} AS BIGINT),"
        f"'contrib',{_sql_l2_micro(f'slice(qr,{int(m) * sub + 1},{sub})', _sql_long_arr(c_sub_v))})"
        for m, c_id, c_sub_v in cbs
    )
    adc_wide = probes.select(
        "q_id",
        "c_list",
        F.expr(f"map_from_entries(array({amap_entries}))").alias("amap"),
    )
    adc_sum: Column | None = None
    for m in range(num_subspaces):
        term = F.element_at(
            F.col("amap"),
            F.lit(m * num_codewords).cast("long")
            + F.element_at(F.col("cmap"), F.lit(m).cast("long")),
        )
        adc_sum = term if adc_sum is None else adc_sum + term
    scored = (
        codes_wide.join(F.broadcast(adc_wide), "c_list")
        .filter(F.col("q_id") != F.col("n_id"))
        .withColumn("adc_q", adc_sum)
    )
    w = Window.partitionBy("q_id").orderBy(F.col("adc_q").asc(), F.col("n_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("q_id", "n_id", "adc_q", F.col("rk").cast("long").alias("rk"))
    )


def sq8_scale(vectors: DataFrame, vec_col: str = "embedding") -> float:
    """Trained symmetric SQ8 scale: 127 / max|component| over the corpus
    (the symmetric variant of FAISS's ScalarQuantizer QT_8bit training —
    Jégou et al.'s scalar-quantization baseline tier).  One scalar probe;
    max of floats is exact and the division is a single correctly-rounded
    IEEE op, so both engines derive the bit-identical double."""
    mx = vectors.agg(
        F.max(
            F.array_max(F.transform(F.col(vec_col), lambda x: F.abs(x.cast("double"))))
        )
    ).first()[0]
    return 127.0 / float(mx)


def sq8_encode(c: Column, scale: float) -> Column:
    """Element-wise int8 code: clamp(floor(x·scale + 0.5), -127, 127) as
    array<long> — one correctly-rounded multiply then exact integer ops,
    the quantize_micro discipline at 8-bit width."""
    return F.transform(
        c,
        lambda x: F.greatest(
            F.lit(-127).cast("long"),
            F.least(
                F.lit(127).cast("long"),
                F.floor(x.cast("double") * F.lit(scale) + F.lit(0.5)).cast("long"),
            ),
        ),
    )


def sq8_topk(
    vectors: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
) -> DataFrame:
    """Top-k by EXACT integer dot product over trained int8 codes — the
    scalar-quantization compression tier between the full-precision scan
    (brute_force_topk) and the codebook tiers (pq_topk): 4× smaller scan
    footprint, no codebook training, distances exact BIGINT arithmetic so
    the whole tier value-gates bit-for-bit.

    Scale shape: codes stream map-side past the broadcast query codes —
    the same embarrassingly-parallel scan cost model as the brute-force
    baseline with a quarter of the bytes; no shuffle until the per-query
    top-k (TakeOrdered-sized window state).
    """
    scale = sq8_scale(vectors, vec_col)
    cand = vectors.select(
        F.col(id_col).alias("n_id"), sq8_encode(F.col(vec_col), scale).alias("nq")
    )
    qs = queries.select("q_id", sq8_encode(F.col("q_vec"), scale).alias("qq"))
    scored = (
        F.broadcast(qs)
        .crossJoin(cand)
        .filter(F.col("q_id") != F.col("n_id"))
        .withColumn(
            "dot_q",
            F.expr("aggregate(zip_with(qq, nq, (a, b) -> a * b), 0L, (s, x) -> s + x)"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("dot_q").desc(), F.col("n_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
        .select("q_id", "n_id", "dot_q", "rk")
    )


def pca_power_micro(
    vectors: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    iters: int = 6,
) -> tuple[list[int], list[int]]:
    """Top principal component by power iteration in EXACT integer
    arithmetic — the Lloyd-training discipline applied to dimensionality
    reduction: every step replays bit-for-bit in a SQL oracle, so even
    the TRAINING is value-gateable.

    Milli-quantized vectors are mean-centered with round-half-away
    integer means; the iteration never materializes the dim×dim
    covariance — each round is the tall-matrix two-pass form
        y_i = Σ_j c_ij·x_j      (map-side fold per row)
        z_j = Σ_i c_ij·y_i      (one explode + 64-key aggregation)
    with the z sums carried as DECIMAL(38,0) (exact and associative at
    any row count; DuckDB mirrors with HUGEINT), then x is rescaled to
    ≤1e6 by q = max(1, (max|z|+999999) // 1e6), x'_j = sign·(|z_j| // q)
    — floor division on non-negative operands, identical in Python,
    Spark and DuckDB.  Start vector x0_j = 1e6 + j (deterministic, not
    axis-aligned).

    Scale shape: the centered frame is persisted once and scanned
    `iters` times; per round the only shuffle is the 64-key partial
    aggregation (map-side combine does the work), and y is computed in
    ONE fold per row (the posexplode carries it, so CollapseProject
    cannot re-inline it per output column).  Row-local products stay
    under ~1e14, far inside int64.

    Returns (means, component): both length-`dim` integer lists (milli
    means, micro-unit component).
    """
    vm = vectors.select(
        F.col(id_col).alias("n_id"), quantize_micro(F.col(vec_col), 1e3).alias("v")
    )
    agg = vm.agg(
        F.count(F.lit(1)).alias("n"),
        *[F.sum(F.col("v")[j]).alias(f"s{j}") for j in range(dim)],
    ).first()
    n = int(agg["n"])
    means = [_round_half_away(int(agg[f"s{j}"]), n) for j in range(dim)]
    mean_arr = "array(" + ",".join(f"{m}L" for m in means) + ")"
    cen = vm.select(
        "n_id", F.expr(f"zip_with(v, {mean_arr}, (a, b) -> a - b)").alias("c")
    ).persist()
    x = [1_000_000 + j for j in range(dim)]
    try:
        for _ in range(iters):
            x_arr = "array(" + ",".join(f"{xi}L" for xi in x) + ")"
            y = F.expr(
                f"aggregate(zip_with(c, {x_arr}, (a, b) -> a * b), 0L, (s, e) -> s + e)"
            )
            rows = (
                cen.select(y.alias("y"), F.posexplode("c").alias("j", "cv"))
                .groupBy("j")
                .agg(F.sum((F.col("cv") * F.col("y")).cast("decimal(38,0)")).alias("z"))
                .collect()
            )
            z = [0] * dim
            for r in rows:
                z[int(r["j"])] = int(r["z"])
            mx = max(abs(e) for e in z)
            q = max(1, (mx + 999_999) // 1_000_000)
            x = [e // q if e >= 0 else -((-e) // q) for e in z]
        return means, x
    finally:
        cen.unpersist()
