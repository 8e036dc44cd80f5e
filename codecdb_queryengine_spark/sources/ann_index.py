"""Persisted IVF index: build once, store as a partitioned parquet layout,
query with partition-pruned probes.

The similarity operators (operators/similarity.py) recompute centroid
assignment per query — right for one-shot analytics, wrong for a serving
path that answers many top-k queries against the same corpus.  This module
is the index-as-a-table form:

- `ivf_index_build` runs the SAME expression-form assignment ivf_topk uses
  (dot/|c| ranking, min-c_id tie-break — oracle-compatible) ONCE and writes
  two parquet tables: `centroids/` (K rows) and `lists/` partitioned BY
  THE LIST ID, with each vector's norm precomputed.
- `ivf_index_topk` ranks the nprobe nearest lists per query and joins the
  broadcast probe set against `lists/` ON THE PARTITION COLUMN — Spark's
  dynamic partition pruning turns that into reading only the probed
  partitions, i.e. ~nprobe/K of the index regardless of corpus size.
  That is the scale contract of an inverted-file index expressed in
  storage layout instead of a custom in-memory structure: at 1e10 vectors
  a query touches nprobe partitions, not the corpus.

Results are bit-identical to operators/similarity.ivf_topk (same
assignment expressions, norms persisted as exact doubles, same
cosine_pre scoring), so the sim_ann_ivf oracle gates the indexed path too.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from codecdb_queryengine_spark.operators.similarity import (
    _centroid_sims,
    _fold_argmax_sim,
    _model_1row,
    _spread,
    cosine_pre,
    dot,
    norm,
)


def ivf_index_build(
    vectors: DataFrame,
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroid_mod: int = 29,
    centroids: DataFrame | None = None,
    max_list_rows: int | None = None,
    meta_cols: tuple[str, ...] = (),
) -> None:
    """Assign every vector to its nearest centroid and persist the index.

    Layout: `<path>/centroids` (c_id, c_vec, c_norm) and `<path>/lists`
    (n_id, n_vec, n_norm) partitioned by c_list.

    `meta_cols` rides metadata columns (labels, timestamps, source tags)
    into the lists layout next to each vector, which is what makes
    FILTERED vector search a storage property: a predicate on a metadata
    column reaches the parquet scan of the probed partitions (pushdown
    below the DPP prune — see ivf_index_topk's candidate_filter), instead
    of a post-search join back to the corpus.

    `max_list_rows` caps the rows per physical partition (r6 verdict
    item 6): real embedding distributions are lumpy, and a hot list makes
    one partition the serving bottleneck — with the cap set, any list
    whose row count exceeds it is SPLIT across ceil(n/cap) sub-partitions
    via a secondary `c_slot` partition column (pmod(n_id, n_slots) — no
    per-list window, so the build never funnels a hot list through a
    single task).  Serving joins on `c_list` alone, so dynamic partition
    pruning still skips unprobed lists at the first directory level while
    a probed hot list fans out over its slots as parallel tasks.  The
    split is a two-pass build — a tiny per-list count aggregate, then the
    assignment projection joined to the broadcast counts — which is the
    scale-correct shape: pass 1's result is K' rows however big the
    corpus is.
    """
    if centroids is None:
        centroids = vectors.filter(F.col(id_col) % centroid_mod == 0).select(
            F.col(id_col).alias("c_id"),
            F.col(vec_col).alias("c_vec"),
            norm(F.col(vec_col)).alias("c_norm"),
        )
    centroids.write.mode("overwrite").parquet(os.path.join(path, "centroids"))
    # 1-row broadcast model + per-row order-free argmax fold (the ivf_topk
    # r5 plan shape): one shuffle-free projection replaces the old
    # crossJoin-expand + groupBy(n_id) + re-join, so the only exchange
    # left in the build is the repartition(c_list) the layout wants.
    cmodel = F.broadcast(_model_1row(centroids, "c_id", "c_vec", "c_norm"))
    lists = _spread(vectors).crossJoin(cmodel).select(
        F.col(id_col).alias("n_id"),
        F.col(vec_col).alias("n_vec"),
        norm(F.col(vec_col)).alias("n_norm"),
        _fold_argmax_sim(_centroid_sims(F.col(vec_col)))["c_id"].alias("c_list"),
        *[F.col(c) for c in meta_cols],
    )
    _write_lists(lists, path, max_list_rows)


def ivf_index_append(
    new_vectors: DataFrame,
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    meta_cols: tuple[str, ...] = (),
) -> None:
    """Incrementally add vectors to an EXISTING persisted index without a
    rebuild: read the layout's own centroid model back (never the
    caller's guess — the index-layout discipline), assign only the new
    batch with the same fold expressions, and append into the partitioned
    `lists/` — new files land only in the touched c_list directories, so
    the maintenance cost is O(batch), not O(corpus).  Pair with
    io.compact_partitioned when accumulated appends fragment the lists
    (the streamed-ingest twins gate that pass).  Serving needs no change:
    partition discovery picks up the new files and results are identical
    to a from-scratch build over the union (gated by
    sim_ann_ivf_indexed_append under the verbatim sim_ann_ivf oracle)."""
    spark = new_vectors.sparkSession
    centroids = spark.read.parquet(os.path.join(path, "centroids"))
    cmodel = F.broadcast(_model_1row(centroids, "c_id", "c_vec", "c_norm"))
    lists = _spread(new_vectors).crossJoin(cmodel).select(
        F.col(id_col).alias("n_id"),
        F.col(vec_col).alias("n_vec"),
        norm(F.col(vec_col)).alias("n_norm"),
        _fold_argmax_sim(_centroid_sims(F.col(vec_col)))["c_id"].alias("c_list"),
        *[F.col(c) for c in meta_cols],
    )
    (
        lists.repartition("c_list")
        .write.mode("append")
        .partitionBy("c_list")
        .parquet(os.path.join(path, "lists"))
    )


def _write_lists(lists: DataFrame, path: str, max_list_rows: int | None) -> None:
    """Write the `lists/` layout, splitting oversized lists across a
    secondary `c_slot` partition level when `max_list_rows` is set (see
    ivf_index_build's docstring for the scale rationale)."""
    part_cols = ["c_list"]
    if max_list_rows is not None:
        counts = lists.groupBy("c_list").agg(F.count(F.lit(1)).alias("_n"))
        n_slots = F.greatest(
            F.lit(1).cast("long"),
            F.ceil(F.col("_n") / F.lit(max_list_rows)).cast("long"),
        )
        lists = (
            lists.join(F.broadcast(counts), "c_list")
            .withColumn("c_slot", F.pmod(F.col("n_id"), n_slots))
            .drop("_n")
        )
        part_cols = ["c_list", "c_slot"]
    (
        lists.repartition(*part_cols)
        .write.mode("overwrite")
        .partitionBy(*part_cols)
        .parquet(os.path.join(path, "lists"))
    )


def ivf_index_topk(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    candidate_filter: str | None = None,
) -> DataFrame:
    """Top-k over the persisted index: rank nprobe lists per query against
    the (broadcast) centroid table, then score ONLY the probed partitions
    of `lists/` — the c_list equi-join on the partition column lets
    dynamic partition pruning skip every unprobed list's files.

    `candidate_filter` (a SQL predicate over the lists columns, e.g.
    `"label = 1"` when the index was built with meta_cols) restricts the
    CANDIDATE set before scoring — filtered vector search as one scan:
    the predicate lands in the parquet PushedFilters of the probed
    partitions (row-group pruning under the DPP prune), never a
    post-search join back to the corpus.  Lists are assigned before
    filtering, so results equal brute-force-over-the-filtered-subset
    restricted to the probed lists — the same probe semantics as the
    unfiltered path."""
    cents = spark.read.parquet(os.path.join(path, "centroids"))
    # The scan-side partition column stays UNTOUCHED: rewriting it with a
    # cast can stop dynamic partition pruning from firing (r4 ADVICE), which
    # would silently void the "read only nprobe partitions" contract.  The
    # probe side casts to whatever type partition discovery inferred instead;
    # scripts/explain_audit.py pins the dynamicpruning subquery on this scan.
    lists = spark.read.parquet(os.path.join(path, "lists"))
    if candidate_filter is not None:
        lists = lists.filter(candidate_filter)
    part_type = dict(lists.dtypes)["c_list"]
    probes = queries.crossJoin(F.broadcast(cents)).select(
        "q_id",
        "q_vec",
        "c_id",
        (dot(F.col("q_vec"), F.col("c_vec")) / F.col("c_norm")).alias("sim"),
    )
    wp = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("c_id").asc())
    probe_lists = (
        probes.withColumn("r", F.row_number().over(wp))
        .filter(F.col("r") <= nprobe)
        .select(
            "q_id",
            "q_vec",
            F.col("c_id").cast(part_type).alias("c_list"),
            norm(F.col("q_vec")).alias("q_norm"),
        )
    )
    scored = (
        F.broadcast(probe_lists)
        .join(lists, "c_list")
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


# --- exact-integer (Lloyd-trained) index variant ---------------------------


def ivf_index_build_micro(
    vectors: DataFrame,
    path: str,
    cents: list[tuple[int, list[int]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_list_rows: int | None = None,
) -> None:
    """Persist an IVF index over the micro-quantized integer space with a
    TRAINED centroid model (operators/similarity.kmeans_lloyd_micro) —
    the trained counterpart of ivf_index_build, with the same layout
    contract (`centroids/` K rows, `lists/` partitioned by c_list,
    optional hot-list splitting via `max_list_rows` — see
    ivf_index_build) but BIGINT vectors and integer-L2 assignment, so the
    whole train→persist→serve loop stays bit-replayable by a SQL
    oracle."""
    from codecdb_queryengine_spark.operators.similarity import (
        _micro_argmin_sql,
        quantize_micro,
    )

    spark = vectors.sparkSession
    cdf = spark.createDataFrame(cents, "c_id long, c array<long>")
    cdf.write.mode("overwrite").parquet(os.path.join(path, "centroids"))
    vm = vectors.select(
        F.col(id_col).alias("n_id"), quantize_micro(F.col(vec_col)).alias("v")
    )
    # literal-model argmin projection (operators/similarity._micro_argmin_sql):
    # same assignment semantics as before, with no crossJoin expansion and
    # no groupBy(n_id) shuffle ahead of the repartition(c_list) write
    assigned = vm.select(
        "n_id",
        "v",
        F.expr(f"({_micro_argmin_sql('v', cents)}).c_id").alias("c_list"),
    )
    _write_lists(assigned, path, max_list_rows)


def ivf_index_topk_micro(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
) -> DataFrame:
    """Top-k over the persisted integer index: same partition-pruned plan
    shape as ivf_index_topk (broadcast centroids, nprobe lists per query,
    DPP on the c_list equi-join — scan-side partition column untouched),
    every distance BIGINT.  Output matches operators/similarity.
    ivf_topk_micro exactly, so one oracle gates both forms."""
    from codecdb_queryengine_spark.operators.similarity import l2_micro, quantize_micro

    cents = spark.read.parquet(os.path.join(path, "centroids"))
    lists = spark.read.parquet(os.path.join(path, "lists"))
    part_type = dict(lists.dtypes)["c_list"]
    qm = queries.select("q_id", quantize_micro(F.col("q_vec")).alias("qv"))
    wp = Window.partitionBy("q_id").orderBy(F.col("d").asc(), F.col("c_id").asc())
    probes = (
        qm.crossJoin(F.broadcast(cents))
        .select("q_id", "qv", "c_id", l2_micro(F.col("qv"), F.col("c")).alias("d"))
        .withColumn("r", F.row_number().over(wp))
        .filter(F.col("r") <= nprobe)
        .select("q_id", "qv", F.col("c_id").cast(part_type).alias("c_list"))
    )
    scored = (
        F.broadcast(probes)
        .join(lists, "c_list")
        .filter(F.col("q_id") != F.col("n_id"))
        .withColumn("l2_micro2", l2_micro(F.col("qv"), F.col("v")))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("l2_micro2").asc(), F.col("n_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("q_id", "n_id", "l2_micro2", F.col("rk").cast("long").alias("rk"))
    )


# --- persisted IVFADC (IVF-PQ) index ---------------------------------------


def ivfpq_index_build_micro(
    vectors: DataFrame,
    path: str,
    cents: list,
    cbs: list,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_subspaces: int = 4,
    max_list_rows: int | None = None,
) -> None:
    """Persist an IVFADC index for a trained model pair (similarity.
    ivfpq_train_micro): `centroids/` (K rows) + `codebooks/` (M·Kc rows)
    + `lists/` holding ONLY the codes — (n_id, cmap) partitioned by the
    coarse list id.  This is the storage form of Jégou'11 §IV's memory
    contract: M small codes per vector instead of d floats (here
    map<m,code> next to d·8-byte micro vectors — the full-precision
    corpus is NOT in the index), and serving scans just the probed
    partitions.  Everything stays BIGINT, so the persisted round-trip is
    bit-replayable by the same SQL oracle as the in-memory composition."""
    from codecdb_queryengine_spark.operators.similarity import ivfpq_encode_micro

    spark = vectors.sparkSession
    spark.createDataFrame(cents, "c_id long, c array<long>").write.mode(
        "overwrite"
    ).parquet(os.path.join(path, "centroids"))
    spark.createDataFrame(cbs, "m long, c_id long, c_sub array<long>").write.mode(
        "overwrite"
    ).parquet(os.path.join(path, "codebooks"))
    codes = ivfpq_encode_micro(
        vectors, cents, cbs, dim=dim, vec_col=vec_col, id_col=id_col,
        num_subspaces=num_subspaces,
    )
    _write_lists(codes, path, max_list_rows)


def ivfpq_index_topk_micro(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
) -> DataFrame:
    """ADC top-k over the persisted IVFADC index: the tiny models are
    collected back into literal expressions (the similarity.
    ivfpq_rank_micro serve shape) and the codes scan joins the broadcast
    probe set ON THE PARTITION COLUMN — dynamic partition pruning reads
    only the nprobe probed lists per query set (the scan-side partition
    column stays untouched; the probe side casts to the inferred
    partition type, r4 ADVICE).  Output matches ivf_pq_topk_lloyd_micro
    exactly, so one oracle gates both forms.

    dim / num_subspaces / num_codewords are INFERRED from the persisted
    model artifacts (r5 review): the index stores no hyperparameter
    metadata, and serving with stale caller-supplied values would NULL
    the ADC lookups — and NULLs rank FIRST under the ascending score
    window, i.e. plausible-looking garbage instead of an error."""
    from codecdb_queryengine_spark.operators.similarity import ivfpq_rank_micro

    cents = sorted(
        (int(r["c_id"]), [int(x) for x in r["c"]])
        for r in spark.read.parquet(os.path.join(path, "centroids")).collect()
    )
    cbs = sorted(
        (int(r["m"]), int(r["c_id"]), [int(x) for x in r["c_sub"]])
        for r in spark.read.parquet(os.path.join(path, "codebooks")).collect()
    )
    if not cents or not cbs:
        raise ValueError(f"ivfpq_index_topk_micro: empty model artifacts at {path}")
    dim = len(cents[0][1])
    num_subspaces = len({m for m, _, _ in cbs})
    num_codewords = max(c_id for _, c_id, _ in cbs) + 1
    lists = spark.read.parquet(os.path.join(path, "lists"))
    part_type = dict(lists.dtypes)["c_list"]
    return ivfpq_rank_micro(
        lists,
        queries,
        cents,
        cbs,
        dim=dim,
        k=k,
        nprobe=nprobe,
        num_subspaces=num_subspaces,
        num_codewords=num_codewords,
        probe_list_type=part_type,
    )
