"""LSH-bucketed ANN quality gate: recall vs exact brute force.

A single 6-plane signature partitions the space into 64 buckets; same-bucket
candidates only.  Random 64-d embeddings make this adversarial (neighbors
are not strongly clustered), so the gate is intentionally loose — it pins
that bucketing returns sane, non-empty, correctly-ranked results, not SOTA
recall."""

from pyspark.sql import functions as F

from codecdb_queryengine_spark.catalog import load_tables
from codecdb_queryengine_spark.operators import similarity as S


def test_lsh_topk_subset_of_bruteforce_order(spark, sf_dir):
    emb = load_tables(spark, sf_dir)["embeddings"]
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    exact = S.brute_force_topk(emb, queries, k=10).collect()
    approx = S.lsh_bucket_topk(emb, queries, dim=64, k=10, num_planes=6).collect()
    assert len(approx) > 0
    # every approx hit must carry the same cosine the exact search computed
    exact_scores = {(r.q_id, r.n_id): r.cosine for r in exact}
    all_pairs_exact = {
        (r.q_id, r.n_id)
        for r in S.brute_force_topk(emb, queries, k=10_000).collect()
    }
    for r in approx:
        assert (r.q_id, r.n_id) in all_pairs_exact
    # rank ordering within each query must be by descending cosine
    by_q: dict[int, list] = {}
    for r in sorted(approx, key=lambda r: (r.q_id, r.rk)):
        by_q.setdefault(r.q_id, []).append(r.cosine)
    for scores in by_q.values():
        assert scores == sorted(scores, reverse=True)
    # recall floor: bucketed search finds at least one true top-10 neighbor
    top_exact = {(r.q_id, r.n_id) for r in exact}
    hits = sum(1 for r in approx if (r.q_id, r.n_id) in top_exact)
    assert hits >= 1


def test_ivf_kmeans_centroids_recall_at_least_mod(spark, sf_dir):
    """Trained (pyspark.ml KMeans) centroids through the same ivf_topk
    plumbing must match-or-beat the deterministic mod-id stand-in on
    recall@5 vs brute force (seeded -> deterministic; measured 0.48 vs
    0.32 at sf0.001 with ~17 lists, nprobe=2)."""
    emb = load_tables(spark, sf_dir)["embeddings"]
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    exact = {(r.q_id, r.n_id) for r in S.brute_force_topk(emb, queries, k=5).collect()}

    def recall(df):
        hits = {(r.q_id, r.n_id) for r in df.collect()}
        return len(hits & exact) / len(exact)

    r_mod = recall(S.ivf_topk(emb, queries, k=5, centroid_mod=29, nprobe=2))
    cents = S.kmeans_centroids(emb, k=17, seed=13)
    assert cents.count() == 17
    r_trained = recall(S.ivf_topk(emb, queries, k=5, nprobe=2, centroids=cents))
    assert r_trained >= r_mod > 0


def test_ivf_topk_ranked_and_within_corpus(spark, sf_dir):
    emb = load_tables(spark, sf_dir)["embeddings"]
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    approx = S.ivf_topk(emb, queries, k=10, centroid_mod=29, nprobe=2).collect()
    assert len(approx) > 0
    # every query returns results and ranks are dense from 1
    by_q: dict[int, list] = {}
    for r in sorted(approx, key=lambda r: (r.q_id, r.rk)):
        by_q.setdefault(r.q_id, []).append(r)
    assert set(by_q) == {0, 1, 2}
    for rows in by_q.values():
        assert [r.rk for r in rows] == list(range(1, len(rows) + 1))
        scores = [r.cosine for r in rows]
        assert scores == sorted(scores, reverse=True)
    # probing more lists can only widen the candidate set
    wide = S.ivf_topk(emb, queries, k=10, centroid_mod=29, nprobe=4).collect()
    assert len(wide) >= len(approx)


def test_pq_adc_ranks_sanely_vs_bruteforce(spark, sf_dir):
    """PQ compresses 64 floats to 4 codes, so ADC ranking is coarse by
    design; the gate pins structure (k results per query, dedup'd ids,
    ascending ADC) and a loose recall floor vs exact top-20."""
    emb = load_tables(spark, sf_dir)["embeddings"]
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    pq = S.pq_topk(emb, queries, dim=64, k=5).collect()
    by_q: dict[int, list] = {}
    for r in sorted(pq, key=lambda r: (r.q_id, r.rk)):
        by_q.setdefault(r.q_id, []).append(r)
    assert set(by_q) == {0, 1, 2, 3, 4}
    for rows in by_q.values():
        assert len(rows) == 5
        assert len({r.n_id for r in rows}) == 5
        adcs = [r.adc_micro for r in rows]
        assert adcs == sorted(adcs)
        assert all(r.n_id != r.q_id for r in rows)
    exact20 = {
        (r.q_id, r.n_id) for r in S.brute_force_topk(emb, queries, k=20).collect()
    }
    hits = sum(1 for r in pq if (r.q_id, r.n_id) in exact20)
    # random 64-d embeddings are adversarial for 4x8 PQ; require evidence of
    # signal, not SOTA recall (measured: 7/25 at sf0.001)
    assert hits >= 2, hits


def test_pq_kmeans_codebooks_cut_quantization_error(spark, sf_dir):
    """Trained (per-subspace KMeans) codebooks must beat the sampled
    stand-in on the objective KMeans optimizes: mean squared
    reconstruction (quantization) error (measured 0.80 vs 1.20 at
    sf0.001).  Recall-vs-cosine is deliberately NOT asserted: on these
    near-isotropic synthetic embeddings MSE-optimal centers pull toward
    the mean, compressing the ADC spread, so trained codebooks do not
    improve cosine recall (a data property, cross-checked with a numpy
    replica; real clustered embeddings are where training pays, and the
    residual IVF-PQ composition is implemented as S.ivf_pq_topk).  The trained query path itself is pinned
    structurally."""
    import numpy as np

    emb = load_tables(spark, sf_dir)["embeddings"]
    pdf = emb.toPandas()
    v = np.stack(pdf.embedding.to_numpy()).astype(np.float64)
    ids = list(pdf.vec_id.to_numpy())
    sub = 16

    def mse(rows):
        cb = {}
        for m, c, vec in rows:
            cb.setdefault(m, {})[c] = np.asarray(vec, dtype=np.float64)
        total = 0.0
        for m in range(4):
            sl = v[:, m * sub : (m + 1) * sub]
            centers = np.stack([cb[m][c] for c in sorted(cb[m])])
            d = ((sl[:, None, :] - centers[None, :, :]) ** 2).sum(2)
            total += d.min(1).mean()
        return total

    sampled_rows = []
    for c in range(8):
        vec = v[ids.index(c * 37)]
        for m in range(4):
            sampled_rows.append((m, c, vec[m * sub : (m + 1) * sub]))
    cbs = S.pq_codebooks_kmeans(emb, dim=64)
    trained_rows = [(r.m, r.c_id, r.c_sub) for r in cbs.collect()]
    assert mse(trained_rows) < mse(sampled_rows)

    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    pq = S.pq_topk(emb, queries, dim=64, k=5, codebooks=cbs).collect()
    by_q: dict[int, list] = {}
    for r in sorted(pq, key=lambda r: (r.q_id, r.rk)):
        by_q.setdefault(r.q_id, []).append(r)
    assert set(by_q) == {0, 1, 2, 3, 4}
    for rows in by_q.values():
        assert len(rows) == 5 and len({r.n_id for r in rows}) == 5
        assert [r.adc_micro for r in rows] == sorted(r.adc_micro for r in rows)


def test_ivfpq_structure_and_candidates_come_from_probed_lists(spark, sf_dir):
    """IVF-PQ output structure: k dedup'd neighbors per query in ascending
    ADC order, and every returned neighbor belongs to one of the query's
    nprobe probed inverted lists (the scan-cut invariant)."""
    emb = load_tables(spark, sf_dir)["embeddings"]
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    out = S.ivf_pq_topk(emb, queries, dim=64, k=5).collect()
    by_q: dict[int, list] = {}
    for r in sorted(out, key=lambda r: (r.q_id, r.rk)):
        by_q.setdefault(r.q_id, []).append(r)
    assert set(by_q) == {0, 1, 2, 3, 4}
    for rows in by_q.values():
        assert len(rows) == 5 and len({r.n_id for r in rows}) == 5
        assert [r.adc_micro for r in rows] == sorted(r.adc_micro for r in rows)
    # scan-cut invariant: neighbors only from probed lists
    cents = emb.filter(F.col("vec_id") % 29 == 0).select(
        F.col("vec_id").alias("c_id"),
        F.col("embedding").alias("c_vec"),
        S.norm(F.col("embedding")).alias("c_norm"),
    )
    from pyspark.sql import Window

    assigned = {
        r.n_id: r.c_list
        for r in emb.crossJoin(F.broadcast(cents))
        .select(
            F.col("vec_id").alias("n_id"),
            "c_id",
            (S.dot(F.col("embedding"), F.col("c_vec")) / F.col("c_norm")).alias("sim"),
        )
        .groupBy("n_id")
        .agg(
            F.max_by(
                "c_id", F.struct(F.col("sim").alias("s"), (-F.col("c_id")).alias("t"))
            ).alias("c_list")
        )
        .collect()
    }
    wp = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("c_id").asc())
    probed = {}
    for r in (
        queries.crossJoin(F.broadcast(cents))
        .select(
            "q_id", "c_id",
            (S.dot(F.col("q_vec"), F.col("c_vec")) / F.col("c_norm")).alias("sim"),
        )
        .withColumn("rnk", F.row_number().over(wp))
        .filter(F.col("rnk") <= 2)
        .collect()
    ):
        probed.setdefault(r.q_id, set()).add(r.c_id)
    for r in out:
        assert assigned[r.n_id] in probed[r.q_id], (r.q_id, r.n_id)


def _clustered_fixture(spark, n_clusters=16, n=400, dim=64, sigma=0.15):
    """Mixture-of-gaussians embeddings (vec_id i belongs to cluster i % C):
    a non-vacuous recall fixture — the sf* synthetic embeddings are
    near-isotropic, where ANN recall is uninformative (r3 verdict item 4).
    Seeded numpy -> deterministic across runs."""
    import numpy as np

    rng = np.random.RandomState(7)
    centers = rng.normal(0, 1.0, (n_clusters, dim))
    rows = []
    for i in range(n):
        v = centers[i % n_clusters] + rng.normal(0, sigma, dim)
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_clustered_recall_all_ann_tiers(spark):
    """recall@5 vs brute force on clustered data, per ANN tier.

    Measured on this fixture (seed 7): lsh 0.72, trained-IVF 1.0, mod-IVF
    1.0, PQ-ADC exact-recall 0.17 but cluster-recall ~1.0 — PQ collapses
    same-cluster near-twins to identical codes, so it retrieves the right
    CLUSTER while tie-breaking arbitrarily inside it; that is the designed
    coarse-quantization behavior, hence the cluster-level assertion.
    Thresholds carry slack below the measured values."""
    n_clusters = 16
    emb = _clustered_fixture(spark, n_clusters=n_clusters)
    queries = emb.filter(F.col("vec_id") < 12).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    exact = {(r.q_id, r.n_id) for r in S.brute_force_topk(emb, queries, k=5).collect()}

    def recall(df):
        hits = {(r.q_id, r.n_id) for r in df.collect()}
        return len(hits & exact) / len(exact)

    def cluster_recall(df):
        rows = df.collect()
        same = sum(1 for r in rows if r.n_id % n_clusters == r.q_id % n_clusters)
        return same / len(rows)

    assert recall(S.lsh_bucket_topk(emb, queries, dim=64, k=5, num_planes=6)) >= 0.5
    cents = S.kmeans_centroids(emb, k=n_clusters, seed=13)
    assert recall(S.ivf_topk(emb, queries, k=5, nprobe=2, centroids=cents)) >= 0.9
    assert recall(S.ivf_topk(emb, queries, k=5, centroid_mod=29, nprobe=2)) >= 0.9
    cbs = S.pq_codebooks_kmeans(emb, dim=64, num_subspaces=4, num_codewords=16)
    pq = S.pq_topk(emb, queries, dim=64, k=5, codebooks=cbs, num_codewords=16)
    assert cluster_recall(pq) >= 0.8
    ivfpq = S.ivf_pq_topk(emb, queries, dim=64, k=5, centroid_mod=29, nprobe=2)
    assert cluster_recall(ivfpq) >= 0.8
    # every tier must beat the random-guess baseline on exact recall too
    # (5 correct of 399 candidates ~ 0.0125)
    assert recall(pq) >= 0.1
    assert recall(ivfpq) >= 0.1


def test_ivf_assign_arrow_matches_expression_assignment(spark):
    """The vectorized Arrow assignment must agree with the expression-fold
    assignment (the oracle-gated face) wherever centroids are separated —
    clustered fixture: every vector sits near its own center."""
    emb = _clustered_fixture(spark)
    cents = S.kmeans_centroids(emb, k=8, seed=13)
    fast = {r.n_id: r.c_list for r in S.ivf_assign_arrow(emb, centroids=cents).collect()}
    # expression form: same ranking ivf_topk uses for its inverted lists
    from pyspark.sql import functions as FX

    scored = (
        emb.crossJoin(FX.broadcast(cents))
        .select(
            FX.col("vec_id").alias("n_id"),
            "c_id",
            (S.dot(FX.col("embedding"), FX.col("c_vec")) / FX.col("c_norm")).alias("sim"),
        )
        .groupBy("n_id")
        .agg(
            FX.max_by(
                "c_id", FX.struct(FX.col("sim").alias("s"), (-FX.col("c_id")).alias("t"))
            ).alias("c_id")
        )
    )
    slow = {r.n_id: r.c_id for r in scored.collect()}
    assert fast == slow


def test_recall_gates_pin_quality_values(spark, sf_dir):
    """The r10 recall@10 gates (sim_ann_recall_{ivf,ivfpq,lsh}) put the
    retrieval-quality number itself in the value-hashed output; this pins
    the measured values on the deterministic sf0.001 fixture so a silent
    quality regression (changed assignment exprs, broken probe pruning,
    codebook drift) fails HERE with the number, not just as an opaque
    hash mismatch in the driver gate.  Random embeddings are adversarial
    for ANN, hence the honest low absolutes; the relative order
    (full-precision IVF above the code-quantized and bucket-cut tiers)
    is the substantive invariant."""
    from codecdb_queryengine_spark.queries import pipeline as P

    expected = {
        "sim_ann_recall_ivf": {0: (10, 1.0), 1: (0, 0.0), 2: (4, 0.4),
                               3: (4, 0.4), 4: (2, 0.2)},
        "sim_ann_recall_ivfpq": {0: (3, 0.3), 1: (0, 0.0), 2: (1, 0.1),
                                 3: (1, 0.1), 4: (0, 0.0)},
        "sim_ann_recall_lsh": {0: (0, 0.0), 1: (2, 0.2), 2: (1, 0.1),
                               3: (1, 0.1), 4: (0, 0.0)},
        "sim_ann_recall_ivfpq_reranked": {0: (6, 0.6), 1: (0, 0.0),
                                          2: (2, 0.2), 3: (2, 0.2),
                                          4: (1, 0.1)},
    }
    means = {}
    per_q = {}
    for name, want in expected.items():
        rows = P.QUERIES[name](spark, sf_dir).collect()
        got = {r.q_id: (r.hits, r.recall_at_10) for r in rows}
        assert got == want, f"{name}: {got}"
        means[name] = sum(v[1] for v in got.values()) / len(got)
        per_q[name] = got
    assert means["sim_ann_recall_ivf"] >= means["sim_ann_recall_ivfpq"]
    # the exact second stage can only keep or improve recall PER QUERY at
    # the same candidate budget: within the R-shortlist the re-rank
    # retains the truly nearest k, a superset-ordering argument that a
    # broken rerank join/window would violate immediately
    for q, (hits, _) in per_q["sim_ann_recall_ivfpq"].items():
        assert per_q["sim_ann_recall_ivfpq_reranked"][q][0] >= hits


def test_two_stage_rerank_flat_tiers(spark, sf_dir):
    """r11: two-stage retrieval composed onto the FLAT tiers, each with a
    genuinely cheap stage 1 (re-ranking an exact-cosine-scored shortlist
    would be the identity): coarse-quantizer rank for IVF, multi-band
    collision count for LSH.  Pins (a) the measured recall@10 values at
    sf0.001, (b) the aggregate lift over the single-stage gates, and (c)
    the PER-QUERY monotone-lift invariant against the stage-1-ordered
    top-10 of the SAME shortlist — the guarantee the rerank provides by
    construction (it keeps the truly nearest 10 of the R candidates, so
    no stage-1 order over those candidates can beat it)."""
    from codecdb_queryengine_spark.queries import pipeline as P

    expected = {
        "sim_ann_recall_ivf_reranked": {0: (10, 1.0), 1: (2, 0.2),
                                        2: (4, 0.4), 3: (5, 0.5),
                                        4: (5, 0.5)},
        "sim_ann_recall_lsh_reranked": {0: (0, 0.0), 1: (1, 0.1),
                                        2: (0, 0.0), 3: (3, 0.3),
                                        4: (3, 0.3)},
    }
    got = {}
    for name, want in expected.items():
        rows = P.QUERIES[name](spark, sf_dir).collect()
        got[name] = {r.q_id: (r.hits, r.recall_at_10) for r in rows}
        assert got[name] == want, f"{name}: {got[name]}"

    # aggregate lift over the single-stage serves (measured: ivf 20->26
    # hits, lsh 4->7 at sf0.001)
    single = {}
    for name in ("sim_ann_recall_ivf", "sim_ann_recall_lsh"):
        rows = P.QUERIES[name](spark, sf_dir).collect()
        single[name] = sum(r.hits for r in rows)
    assert sum(h for h, _ in got["sim_ann_recall_ivf_reranked"].values()) > \
        single["sim_ann_recall_ivf"]
    assert sum(h for h, _ in got["sim_ann_recall_lsh_reranked"].values()) > \
        single["sim_ann_recall_lsh"]

    # per-query monotone lift vs the stage-1 order of the SAME shortlist
    emb = load_tables(spark, sf_dir)["embeddings"]
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    exact10 = {}
    for r in S.brute_force_topk(emb, queries, k=10).collect():
        exact10.setdefault(r.q_id, set()).add(r.n_id)
    shortlists = {
        "sim_ann_recall_ivf_reranked": S.ivf_coarse_shortlist(
            emb, queries, r=100, centroid_mod=29, nprobe=4
        ),
        "sim_ann_recall_lsh_reranked": S.lsh_collision_shortlist(
            emb, queries, dim=64, r=20, bands=4, planes_per_band=4
        ),
    }
    for name, short in shortlists.items():
        stage1 = {}
        for r in short.filter(F.col("rk") <= 10).collect():
            stage1.setdefault(r.q_id, set()).add(r.n_id)
        for q, (hits, _) in got[name].items():
            stage1_hits = len(stage1.get(q, set()) & exact10[q])
            assert hits >= stage1_hits, (name, q, hits, stage1_hits)


def test_ivfpq_operating_curve_pinned(spark, sf_dir):
    """r11: the recall-vs-cost operating curve gate (nprobe x R sweep over
    ONE all-lists ADC relation).  Pins the sf0.001 points and the curve's
    structural laws: rows_read grows with nprobe and is R-independent
    (it's the ADC scan cost), and recall at FIXED nprobe is non-decreasing
    in R (a larger shortlist is a superset, and the exact re-rank of a
    superset can only keep or improve recall@10).  Recall is NOT asserted
    monotone in nprobe at fixed R: more lists means more quantization-
    noise impostors competing for the R ADC slots — visible in the pinned
    values (nprobe 18, R=20 scores 0.20 under nprobe 1's 0.24), the
    honest ADC artifact the curve exists to expose."""
    from codecdb_queryengine_spark.queries import pipeline as P

    rows = P.QUERIES["sim_ann_ivfpq_curve"](spark, sf_dir).collect()
    got = {(r.nprobe, r.r_shortlist): (r.hits, r.recall_at_10, r.rows_read)
           for r in rows}
    assert got == {
        (1, 20): (12, 0.24, 139),
        (1, 100): (17, 0.34, 139),
        (4, 20): (12, 0.24, 571),
        (4, 100): (26, 0.52, 571),
        (18, 20): (10, 0.2, 2495),
        (18, 100): (24, 0.48, 2495),
    }, got
    for np_ in (1, 4, 18):
        assert got[(np_, 20)][2] == got[(np_, 100)][2]  # cost is R-free
        assert got[(np_, 100)][0] >= got[(np_, 20)][0]  # recall mono in R
    assert got[(1, 20)][2] < got[(4, 20)][2] < got[(18, 20)][2]
