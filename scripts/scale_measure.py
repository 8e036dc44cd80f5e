#!/usr/bin/env python3
"""Empirical scale evidence for the heaviest operator families
(r6 verdict item 4): synthetic corpora at 1x / 4x / 16x of sf0.1, wall
time AND shuffle read/write bytes per run pulled from the Spark UI REST
metrics, plus a shuffle-COUNT check — the claims in SCALE.md are plan
shapes; this measures them.

What the synthetic scaling preserves (and why): every copy of the base
corpus is token-salted (copy i appends `_i` to every token) or
vector-shifted, so duplicate/near-dup DENSITY stays constant across
factors — naive replication would make every doc a 16-way near-dup of
itself and quadratic pair growth inside buckets would be a DATA artifact,
not an algorithm property.  With density held constant:

- wall time and shuffle bytes should grow ~linearly with rows (CC and
  PageRank add a log/iteration term that is constant here: fixed rounds);
- the NUMBER of shuffle stages must stay constant — a plan whose shuffle
  count grows with data dies at 100 TB regardless of per-shuffle cost.

Families: simhash near-dup -> star-CC clusters, inverted text index
build, IVFPQ train+encode+serve (Lloyd micro), PageRank over the
co-occurrence graph, segment-level dedup (RefinedWeb rule).

Usage: python -u scripts/scale_measure.py [out_md]   (writes
SCALE_MEASURED.md; ~10-20 min).  SCALE_MEASURE_FACTORS / _RUNS override.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from codecdb_queryengine_spark.session import get_spark

BASE_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FACTORS = [int(x) for x in os.environ.get("SCALE_MEASURE_FACTORS", "1,4,16").split(",")]
RUNS = int(os.environ.get("SCALE_MEASURE_RUNS", "2"))
SCRATCH = "/tmp/scale_measure"


# --- UI REST metrics --------------------------------------------------------


def _ui_json(spark, path: str):
    base = spark.sparkContext.uiWebUrl
    with urllib.request.urlopen(f"{base}/api/v1/{path}") as r:
        return json.load(r)


def _app_id(spark) -> str:
    return _ui_json(spark, "applications")[0]["id"]


def _stages(spark, app: str):
    """Completed-stage metrics keyed by (stageId, attemptId)."""
    out = {}
    for s in _ui_json(spark, f"applications/{app}/stages?status=complete"):
        out[(s["stageId"], s["attemptId"])] = (
            s.get("shuffleReadBytes", 0),
            s.get("shuffleWriteBytes", 0),
            s.get("inputBytes", 0),
        )
    return out


class MetricWindow:
    """Shuffle bytes, INPUT bytes (source scans — the serving-side pruning
    evidence) and shuffle-stage count for the jobs run inside the `with`
    block (delta of the UI's completed-stage metrics)."""

    def __init__(self, spark):
        self.spark = spark
        self.app = _app_id(spark)

    def __enter__(self):
        self.before = _stages(self.spark, self.app)
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.wall = time.perf_counter() - self.t0
        after = _stages(self.spark, self.app)
        new = {k: v for k, v in after.items() if k not in self.before}
        self.shuffle_read = sum(r for r, _, _ in new.values())
        self.shuffle_write = sum(w for _, w, _ in new.values())
        self.input_bytes = sum(i for _, _, i in new.values())
        # one map-side shuffle write boundary == one shuffle
        self.n_shuffles = sum(1 for _, w, _ in new.values() if w > 0)
        self.n_stages = len(new)


# --- synthetic corpora: constant duplicate density across factors -----------


def stage_scaled_inputs(spark, factor: int) -> str:
    """Write documents/embeddings scaled `factor`x under SCRATCH and return
    the directory.  Copy i token-salts text (disjoint vocabularies) and
    offsets ids, so intra-copy structure — dup clusters, co-occurrence
    graph, segment repeats — replicates instead of cross-linking."""
    out = os.path.join(SCRATCH, f"f{factor}")
    done = os.path.join(out, "_STAGED2")  # v2: embeddings carry label (r8)
    if os.path.exists(done):
        return out
    docs = spark.read.parquet(os.path.join(BASE_SF_DIR, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(BASE_SF_DIR, "embeddings.parquet"))
    n_docs = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    n_vecs = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    d_parts, e_parts = [], []
    for i in range(factor):
        if i == 0:
            d_parts.append(docs.select("doc_id", "text"))
            e_parts.append(emb.select("vec_id", "embedding", "label"))
            continue
        salt = f"_{i}"
        d_parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(i * n_docs)).alias("doc_id"),
                F.array_join(
                    F.transform(
                        F.split(F.col("text"), " "),
                        lambda t: F.concat(t, F.lit(salt)),
                    ),
                    " ",
                ).alias("text"),
            )
        )
        e_parts.append(
            emb.select(
                (F.col("vec_id") + F.lit(i * n_vecs)).alias("vec_id"),
                F.transform(
                    F.col("embedding"), lambda x: x + F.lit(float(i) * 0.0017)
                ).alias("embedding"),
                "label",
            )
        )
    d = d_parts[0]
    for p in d_parts[1:]:
        d = d.unionByName(p)
    e = e_parts[0]
    for p in e_parts[1:]:
        e = e.unionByName(p)
    d.repartition(max(4, 2 * factor)).write.mode("overwrite").parquet(
        os.path.join(out, "documents")
    )
    e.repartition(max(4, 2 * factor)).write.mode("overwrite").parquet(
        os.path.join(out, "embeddings")
    )
    open(done, "w").close()
    return out


# --- serving layouts (built once per factor; queries measured alone) --------


def stage_serving_layouts(spark, d: str) -> None:
    """Persist the SERVE-side layouts for a staged corpus (r7 verdict
    item 4): three IVF index variants, the inverted text index, and an
    ingest-shaped partitioned docs layout for the compaction families.
    Build cost is paid once per factor and excluded from every serve
    measurement — serving scale is the question here, build scale is
    already covered by index_build/ivfpq_lloyd above."""
    from codecdb_queryengine_spark.sources import ann_index as AI
    from codecdb_queryengine_spark.sources import text_index as TI

    done = os.path.join(d, "_SERVE_STAGED")
    if os.path.exists(done):
        return
    emb = spark.read.parquet(os.path.join(d, "embeddings"))
    docs = spark.read.parquet(os.path.join(d, "documents"))
    # mod-29 quantizer: K grows with the corpus, list size stays ~29 rows —
    # the "probe cost independent of corpus" regime
    AI.ivf_index_build(emb, os.path.join(d, "ivf_plain"), centroid_mod=29)
    AI.ivf_index_build(
        emb, os.path.join(d, "ivf_meta"), centroid_mod=29, meta_cols=("label",)
    )
    # FIXED quantizer (base-corpus centroids at every factor): K constant,
    # lists grow with the corpus — the regime where hot-list splitting is
    # what keeps a probed partition from becoming one giant serving task
    from codecdb_queryengine_spark.operators.similarity import norm

    base_emb = spark.read.parquet(os.path.join(BASE_SF_DIR, "embeddings.parquet"))
    n_base_emb = base_emb.count()
    fixed = emb.filter(
        (F.col("vec_id") < n_base_emb) & (F.col("vec_id") % 29 == 0)
    ).select(
        F.col("vec_id").alias("c_id"),
        F.col("embedding").alias("c_vec"),
        norm(F.col("embedding")).alias("c_norm"),
    )
    AI.ivf_index_build(
        emb, os.path.join(d, "ivf_split"), centroids=fixed, max_list_rows=64
    )
    TI.text_index_build(docs, os.path.join(d, "text_index"))
    # ingest-shaped docs layout: constant-size partitions whose COUNT grows
    # with the corpus (date-partition shape) — doc_ids are dense per copy,
    # so floor(doc_id / (base/8)) yields 8·factor equal chunks
    n_base_docs = spark.read.parquet(
        os.path.join(BASE_SF_DIR, "documents.parquet")
    ).count()
    chunk = max(1, n_base_docs // 8)
    docs.select(
        "doc_id", "text", F.floor(F.col("doc_id") / chunk).alias("p")
    ).repartition("p").write.mode("overwrite").partitionBy("p").parquet(
        os.path.join(d, "docs_parts")
    )
    open(done, "w").close()


def _serve_queries(spark, d):
    emb = spark.read.parquet(os.path.join(d, "embeddings"))
    return emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )


def fam_ivf_serve(spark, d):
    from codecdb_queryengine_spark.sources import ann_index as AI

    return AI.ivf_index_topk(
        spark, os.path.join(d, "ivf_plain"), _serve_queries(spark, d), k=5, nprobe=2
    ).count()


def fam_ivf_serve_cached(spark, d):
    """The long-lived-serving profile: cached=True reuses the layout's
    resolved file index across queries, so the per-directory listing job
    (the cold families' wall residual) is paid once per layout generation
    instead of per query."""
    from codecdb_queryengine_spark.sources import ann_index as AI

    return AI.ivf_index_topk(
        spark, os.path.join(d, "ivf_plain"), _serve_queries(spark, d),
        k=5, nprobe=2, cached=True,
    ).count()


def fam_ivf_serve_split(spark, d):
    from codecdb_queryengine_spark.sources import ann_index as AI

    return AI.ivf_index_topk(
        spark, os.path.join(d, "ivf_split"), _serve_queries(spark, d), k=5, nprobe=2
    ).count()


def fam_ivf_serve_filtered(spark, d):
    from codecdb_queryengine_spark.sources import ann_index as AI

    return AI.ivf_index_topk(
        spark,
        os.path.join(d, "ivf_meta"),
        _serve_queries(spark, d),
        k=5,
        nprobe=2,
        candidate_filter="label = 1",
    ).count()


def fam_text_serve(spark, d):
    from codecdb_queryengine_spark.sources import text_index as TI

    return TI.text_index_search_all(
        spark, os.path.join(d, "text_index"), ("data", "model", "spark")
    ).count()


def _reset_text_mutations(spark, d):
    """Restore the staged text index to its pristine build: the mutation
    protocol never touches base files (base + delta + tombstones), so
    dropping docgen and the delta directories IS a full reset.  Run
    OUTSIDE the metric window, and also before text_serve so a prior
    invocation's mutated state can't change what that family measures."""
    import shutil

    ti = os.path.join(d, "text_index")
    shutil.rmtree(os.path.join(ti, "docgen"), ignore_errors=True)
    for sub in os.listdir(ti):
        if sub.endswith("_delta"):
            shutil.rmtree(os.path.join(ti, sub), ignore_errors=True)


def _text_mutation_batch(spark, d):
    """Constant-size mutation batch at every factor: 200 re-texted docs +
    100 deletes, drawn from the base copy's dense id range."""
    docs = spark.read.parquet(os.path.join(BASE_SF_DIR, "documents.parquet"))
    upd = docs.filter(F.col("doc_id") < 200).select(
        "doc_id", F.concat("text", F.lit(" upsmarker data model spark")).alias("text")
    )
    dels = docs.filter((F.col("doc_id") >= 200) & (F.col("doc_id") < 300)).select(
        "doc_id"
    )
    return upd, dels


def fam_text_upsert(spark, d):
    """One mutation generation against the persisted text index: the
    100-TB claim is O(batch) — no base file read or rewritten — so wall
    and bytes should be ~FLAT in the corpus factor."""
    from codecdb_queryengine_spark.sources import text_index as TI

    upd, dels = _text_mutation_batch(spark, d)
    return TI.text_index_upsert(
        os.path.join(d, "text_index"), updates=upd, delete_ids=dels
    )


def _prepare_text_serve_upserted(spark, d):
    from codecdb_queryengine_spark.sources import text_index as TI

    _reset_text_mutations(spark, d)
    upd, dels = _text_mutation_batch(spark, d)
    TI.text_index_upsert(os.path.join(d, "text_index"), updates=upd, delete_ids=dels)


def fam_text_serve_upserted(spark, d):
    """text_serve through a constant-size mutation overlay: base-minus-
    tombstones plus the delta generation's postings, both bucket-pruned —
    the serve cost should track text_serve plus a constant delta term."""
    from codecdb_queryengine_spark.sources import text_index as TI

    return TI.text_index_search_all(
        spark, os.path.join(d, "text_index"), ("data", "model", "spark")
    ).count()


def _fragment_docs_parts(spark, d):
    """Per-run prep for the compaction families: pile 12 small files into
    partition p=0 (a constant-size ingest burst, whatever the corpus
    factor) — run OUTSIDE the metric window."""
    docs = spark.read.parquet(os.path.join(BASE_SF_DIR, "documents.parquet"))
    frag = docs.filter(F.col("doc_id") < 200).select(
        "doc_id", "text", F.lit(0).cast("bigint").alias("p")
    )
    frag.repartition(12).write.mode("append").partitionBy("p").parquet(
        os.path.join(d, "docs_parts")
    )


def fam_compact_selective(spark, d):
    from codecdb_queryengine_spark.sources import io as IO

    return len(
        IO.compact_partitioned_selective(
            spark, os.path.join(d, "docs_parts"), partition_by=("p",), min_files=8
        )
    )


def fam_compact_full(spark, d):
    from codecdb_queryengine_spark.sources import io as IO

    return IO.compact_partitioned(
        spark, os.path.join(d, "docs_parts"), partition_by=("p",)
    )


# --- the five families -------------------------------------------------------


def fam_simhash_cc(spark, d):
    from codecdb_queryengine_spark.operators import dedup as D
    from codecdb_queryengine_spark.operators.graph import connected_components_star

    docs = spark.read.parquet(os.path.join(d, "documents"))
    sim = D.simhash(docs, "text", "doc_id")
    pairs = D.simhash_near_dups(sim, max_hamming=3, bands=4)
    cc = connected_components_star(pairs, "id_a", "id_b")
    return cc.count()


def fam_simhash_cc60(spark, d):
    """simhash_cc at the corpus-scale banding config the operator
    docstring prescribes (bits=60, bands=5 → 12-bit band keys): the toy
    config (32/4 → 8-bit bands, 256 buckets) saturates its band space and
    random collisions re-grow quadratically once n >> 256 — this family
    measures that the parameter change (not an algorithm change) restores
    ~linear candidate volume."""
    from codecdb_queryengine_spark.operators import dedup as D
    from codecdb_queryengine_spark.operators.graph import connected_components_star

    docs = spark.read.parquet(os.path.join(d, "documents"))
    sim = D.simhash(docs, "text", "doc_id", bits=60)
    pairs = D.simhash_near_dups(sim, max_hamming=3, bands=5, bits=60)
    cc = connected_components_star(pairs, "id_a", "id_b")
    return cc.count()


def _factor_of(d: str) -> int:
    return int(os.path.basename(d.rstrip("/")).lstrip("f"))


def fam_embdup_fixed(spark, d):
    """Embedding near-dup at the gated 4-band × 4-plane config: 16 buckets
    per band, so in-bucket pair expansion grows quadratically once
    n >> 16·sqrt(budget) — the hyperplane analog of the simhash toy
    banding, expected to saturate."""
    from codecdb_queryengine_spark.operators import dedup as D

    emb = spark.read.parquet(os.path.join(d, "embeddings"))
    return D.embedding_near_dups(
        emb, "embedding", "vec_id", threshold=0.4, dim=64, bands=4,
        planes_per_band=4,
    ).count()


def fam_embdup_scaled(spark, d):
    """Same pipeline with planes_per_band grown one per corpus doubling
    (4/6/8 at 1x/4x/16x): band-key space 16 -> 64 -> 256 keeps the
    per-bucket population (and so the in-bucket quadratic term) constant
    — the log-of-corpus dial SCALE.md prescribes, measured."""
    from codecdb_queryengine_spark.operators import dedup as D

    f = _factor_of(d)
    ppb = {1: 4, 4: 6, 16: 8}.get(f, 4 + max(0, f.bit_length() - 1) // 2)
    emb = spark.read.parquet(os.path.join(d, "embeddings"))
    return D.embedding_near_dups(
        emb, "embedding", "vec_id", threshold=0.4, dim=64, bands=4,
        planes_per_band=ppb,
    ).count()


def fam_index_build(spark, d):
    from codecdb_queryengine_spark.sources import text_index as TI

    docs = spark.read.parquet(os.path.join(d, "documents"))
    TI.text_index_build(docs, os.path.join(d, "text_index"))
    return 1


def fam_ivfpq(spark, d):
    from codecdb_queryengine_spark.operators import similarity as S

    emb = spark.read.parquet(os.path.join(d, "embeddings"))
    qs = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    return S.ivf_pq_topk_lloyd_micro(emb, qs, dim=64, k=5).count()


def _stage_ivfpq(spark, d: str) -> None:
    """Persist a pristine IVFADC index per factor for the mutation family
    (r8 verdict item 2): coarse quantizer at mod-29 grain — K grows with
    the corpus, lists stay ~29 rows, the regime where 'touched lists'
    really is O(batch) — which exercises ivfpq_encode_micro's broadcast-
    fold assignment (literal SQL can't carry thousands of centroids).
    Residual codebooks are fixed synthetic slices (any internally-
    consistent model measures the same maintenance cost)."""
    from codecdb_queryengine_spark.operators.similarity import quantize_micro
    from codecdb_queryengine_spark.sources import ann_index as AI

    done = os.path.join(d, "_IVFPQ_STAGED")
    if os.path.exists(done):
        return
    emb = spark.read.parquet(os.path.join(d, "embeddings"))
    cents = sorted(
        (int(r["c_id"]), [int(x) for x in r["c"]])
        for r in emb.filter(F.col("vec_id") % 29 == 0)
        .select(
            F.col("vec_id").alias("c_id"), quantize_micro(F.col("embedding")).alias("c")
        )
        .collect()
    )
    seeds = sorted(
        (int(r["j"]), [int(x) for x in r["c"]])
        for r in spark.read.parquet(os.path.join(BASE_SF_DIR, "embeddings.parquet"))
        .filter((F.col("vec_id") % 37 == 0) & (F.col("vec_id") < 37 * 8))
        .select(
            (F.col("vec_id") / 37).cast("long").alias("j"),
            quantize_micro(F.col("embedding")).alias("c"),
        )
        .collect()
    )
    sub = 64 // 4
    cbs = [
        (m, j, q[m * sub : (m + 1) * sub]) for j, q in seeds for m in range(4)
    ]
    AI.ivfpq_index_build_micro(
        emb, os.path.join(d, "ivfpq_idx_base"), cents, cbs, max_list_rows=64
    )
    open(done, "w").close()


def _reset_ivfpq(spark, d: str) -> None:
    """Restore the mutation family's index to the pristine build (the
    upsert rewrites touched list directories, so unlike the text index a
    drop-the-overlay reset does not exist) — a file-level copy of the
    codes-only layout, OUTSIDE the metric window."""
    import shutil

    live = os.path.join(d, "ivfpq_idx")
    shutil.rmtree(live, ignore_errors=True)
    shutil.copytree(os.path.join(d, "ivfpq_idx_base"), live)


def fam_ivfpq_upsert(spark, d):
    """Constant-size mutation batch against the persisted IVFADC index:
    200 updates (reversed vectors, re-encoded against the layout's own
    quantizers) + 100 deletes from the base copy's dense id range —
    O(batch + touched lists), and with the mod-29-grain quantizer the
    touched lists are ~batch-many ~29-row lists: wall and bytes ~FLAT."""
    from codecdb_queryengine_spark.sources import ann_index as AI

    emb = spark.read.parquet(os.path.join(BASE_SF_DIR, "embeddings.parquet"))
    upd = emb.filter(F.col("vec_id") < 200).select(
        "vec_id", F.reverse("embedding").alias("embedding")
    )
    dels = emb.filter((F.col("vec_id") >= 200) & (F.col("vec_id") < 300)).select(
        "vec_id"
    )
    return AI.ivfpq_index_upsert(
        os.path.join(d, "ivfpq_idx"), updates=upd, delete_ids=dels
    )


def fam_pagerank(spark, d):
    from codecdb_queryengine_spark.operators import graph as G
    from codecdb_queryengine_spark.queries.pipeline import _cooc_edges

    docs = spark.read.parquet(os.path.join(d, "documents"))
    return G.pagerank_micro(_cooc_edges(docs), iters=6).count()


def fam_segment_dedup(spark, d):
    from codecdb_queryengine_spark.operators import dedup as D

    docs = spark.read.parquet(os.path.join(d, "documents"))
    return D.segment_dedup(docs, "text", "doc_id", seg_tokens=8).count()


FAMILIES = [
    ("simhash_cc", fam_simhash_cc, "band-bucketed pairs + O(log^2 n)-round star-CC (toy 32/4 banding — 8-bit band space, expected to saturate)"),
    ("simhash_cc60", fam_simhash_cc60, "same pipeline at the corpus-scale 60/5 banding (12-bit band space)"),
    ("embdup_fixed", fam_embdup_fixed, "hyperplane-LSH embedding near-dup at the fixed 4x4-plane config (16 buckets/band — expected to saturate)"),
    ("embdup_scaled", fam_embdup_scaled, "same with planes/band grown 4/6/8 across 1x/4x/16x (constant per-bucket population)"),
    ("index_build", fam_index_build, "postings explode + 1 repartition(bucket) write"),
    ("ivfpq_lloyd", fam_ivfpq, "integer Lloyd train + encode + ADC serve, fixed iters"),
    ("pagerank", fam_pagerank, "6 damped integer rounds, shuffles ~ iterations"),
    ("segment_dedup", fam_segment_dedup, "segment hash-groupBy keep-first + rebuild"),
    # --- serve-side families (r7 verdict item 4): prebuilt layouts, the
    # measured work is the QUERY alone — input bytes are the DPP/bucket
    # pruning evidence
    ("ivf_serve", fam_ivf_serve, "top-k over the persisted IVF index, mod-29 quantizer (K grows with corpus, lists stay ~29 rows: probed bytes ~FLAT)"),
    ("ivf_serve_cached", fam_ivf_serve_cached, "same query with the opt-in cached file index (the long-lived-serving profile: listing paid once per layout generation, so wall should be ~FLAT)"),
    ("ivf_serve_split", fam_ivf_serve_split, "top-k over the FIXED-quantizer split index (K=69 at every factor, lists grow, cap 64 shards them: probed bytes ~ corpus·nprobe/K, parallel slots)"),
    ("ivf_serve_filtered", fam_ivf_serve_filtered, "filtered top-k (label=1 in PushedFilters UNDER the DPP prune) over the meta index"),
    ("text_serve", fam_text_serve, "3-term bucket-pruned search over the persisted text index (reads only the terms' buckets)"),
    ("text_upsert", fam_text_upsert, "one constant-size mutation generation (200 updates + 100 deletes) into the text index — O(batch), no base file touched: ~FLAT"),
    ("ivfpq_upsert", fam_ivfpq_upsert, "one constant-size mutation batch (200 reversed-vector updates re-encoded on the layout's own quantizers + 100 deletes) into the persisted IVFADC index, mod-29-grain coarse model — touched-list rewrite is O(batch); the honest corpus-residuals are the column-pruned (n_id, c_list) locate scan and the K∝corpus quantizer collect → sub-linear wall/bytes, FLAT shuffle count"),
    ("text_serve_upserted", fam_text_serve_upserted, "the same 3-term search through the mutation overlay (base minus tombstones + delta postings, both bucket-pruned): text_serve plus a constant delta term"),
    ("compact_selective", fam_compact_selective, "selective compaction of ONE fragmented constant-size partition out of 8·factor (O(touched): ~FLAT)"),
    ("compact_full", fam_compact_full, "full-layout compaction of the same state (O(corpus): ~linear — the contrast)"),
]

# per-run preparation excluded from the metric window
PREPARE = {
    "compact_selective": _fragment_docs_parts,
    "compact_full": _fragment_docs_parts,
    "text_serve": _reset_text_mutations,
    "text_upsert": _reset_text_mutations,
    "text_serve_upserted": _prepare_text_serve_upserted,
    "ivfpq_upsert": _reset_ivfpq,
}


def main() -> int:
    out_md = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/SCALE_MEASURED.md"
    spark = get_spark(
        "scale-measure",
        **{"spark.ui.enabled": "true", "spark.ui.port": "4055"},
    )
    assert spark.sparkContext.uiWebUrl, "UI must be on for REST metrics"
    os.makedirs(SCRATCH, exist_ok=True)
    # warm: IO + python worker pool so factor-1 cells don't eat the session tax
    spark.read.parquet(os.path.join(BASE_SF_DIR, "documents.parquet")).count()
    spark.range(256).repartition(32).mapInPandas(lambda it: it, "id long").collect()

    dirs = {f: stage_scaled_inputs(spark, f) for f in FACTORS}
    for f in FACTORS:
        stage_serving_layouts(spark, dirs[f])
        _stage_ivfpq(spark, dirs[f])
    rows = {
        f: spark.read.parquet(os.path.join(dirs[f], "documents")).count()
        for f in FACTORS
    }
    vrows = {
        f: spark.read.parquet(os.path.join(dirs[f], "embeddings")).count()
        for f in FACTORS
    }

    results: dict[str, dict[int, dict]] = {}
    for name, fn, _ in FAMILIES:
        results[name] = {}
        for f in FACTORS:
            walls, reads, writes, inputs, shuffles = [], [], [], [], []
            for _ in range(RUNS):
                prep = PREPARE.get(name)
                if prep is not None:
                    prep(spark, dirs[f])
                spark.catalog.clearCache()
                with MetricWindow(spark) as mw:
                    fn(spark, dirs[f])
                walls.append(mw.wall)
                reads.append(mw.shuffle_read)
                writes.append(mw.shuffle_write)
                inputs.append(mw.input_bytes)
                shuffles.append(mw.n_shuffles)
            results[name][f] = {
                "wall": statistics.median(walls),
                "read": statistics.median(reads),
                "write": statistics.median(writes),
                "input": statistics.median(inputs),
                "n_shuffles": min(shuffles),  # AQE retries can only add
            }
            print(
                f"{name} x{f}: {results[name][f]['wall']:.2f}s "
                f"read={results[name][f]['read'] / 1e6:.1f}MB "
                f"write={results[name][f]['write'] / 1e6:.1f}MB "
                f"input={results[name][f]['input'] / 1e6:.1f}MB "
                f"shuffles={results[name][f]['n_shuffles']}",
                file=sys.stderr,
                flush=True,
            )

    # --- ANN recall stability across factors (r9 verdict item 4) --------
    # The recall GATES pin the quality value at one SF; this measures that
    # retrieval quality HOLDS as the corpus scales when the quantizer
    # follows the documented scaling discipline — fixed-K Lloyd coarse
    # quantization (nprobe/K constant) and hyperplane planes grown one per
    # corpus doubling — next to the fixed-6-plane config as the decay
    # contrast (the embdup_fixed/embdup_scaled law on the retrieval axis).
    import math

    from codecdb_queryengine_spark.operators import similarity as SIM
    from codecdb_queryengine_spark.queries.pipeline import _recall_df

    recall: dict[str, dict[int, float]] = {}
    curve_rows_read: dict[str, dict[int, int]] = {}
    for f in FACTORS:
        emb = spark.read.parquet(os.path.join(dirs[f], "embeddings"))
        q = _serve_queries(spark, dirs[f])
        exact = SIM.brute_force_topk(emb, q, k=10)
        cents = SIM.kmeans_lloyd_micro(emb, dim=64, k=8, stride=37, iters=2)
        planes = 6 + int(round(math.log2(f)))
        tiers = {
            "ivf_lloyd_k8": SIM.ivf_topk_micro(emb, q, cents, k=10, nprobe=2),
            "lsh_scaled_planes": SIM.lsh_bucket_topk(
                emb, q, dim=64, k=10, num_planes=planes
            ),
            "lsh_fixed_6planes": SIM.lsh_bucket_topk(
                emb, q, dim=64, k=10, num_planes=6
            ),
        }
        for tier, approx in tiers.items():
            vals = [
                r["recall_at_10"] for r in _recall_df(exact, approx, 10).collect()
            ]
            recall.setdefault(tier, {})[f] = sum(vals) / len(vals)
            print(
                f"recall {tier} x{f}: {recall[tier][f]:.2f}",
                file=sys.stderr, flush=True,
            )

        # IVFADC operating-curve stability (r10 verdict item 5): the gated
        # curve (sim_ann_ivfpq_curve) sweeps nprobe x R at one SF; here the
        # same two-stage points run across the scale step under the fixed-K
        # discipline expressed through the mod dial (centroid_mod scales
        # with the factor, so K ≈ 69 lists and nprobe/K stay constant).
        # Curve SHAPE must hold — recall ordering across operating points
        # stable — while rows_read (the ADC scan-cost axis) tracks the
        # corpus ~linearly (lists grow, their count doesn't).
        from pyspark.sql import Window as _W

        curve_scored = SIM.ivf_pq_scored(
            emb, q, dim=64, centroid_mod=29 * f, nprobe=4, with_probe_rank=True
        ).localCheckpoint(eager=False)
        wcurve = _W.partitionBy("q_id").orderBy(
            F.col("adc_micro").asc(), F.col("n_id").asc()
        )
        for np_, r_ in ((1, 20), (4, 20), (4, 100)):
            sub = curve_scored.filter(F.col("pr") <= np_)
            short = (
                sub.withColumn("rk", F.row_number().over(wcurve))
                .filter(F.col("rk") <= r_)
                .select("q_id", "n_id")
            )
            rrk = SIM.exact_rerank(emb, q, short, k=10)
            vals = [
                x["recall_at_10"] for x in _recall_df(exact, rrk, 10).collect()
            ]
            tier = f"ivfpq_curve_np{np_}_r{r_}"
            recall.setdefault(tier, {})[f] = sum(vals) / len(vals)
            curve_rows_read.setdefault(tier, {})[f] = sub.count()
            print(
                f"curve {tier} x{f}: recall {recall[tier][f]:.2f} "
                f"rows_read {curve_rows_read[tier][f]}",
                file=sys.stderr, flush=True,
            )

    f0, fN = FACTORS[0], FACTORS[-1]
    span = fN // f0
    lines = [
        "# SCALE_MEASURED — synthetic-scale curves for the heaviest operator families",
        "",
        "Generated by `scripts/scale_measure.py` (r6 verdict item 4).",
        f"Inputs: sf0.1 corpus replicated x{FACTORS} with token-salted copies",
        "(constant duplicate density — see the script docstring), documents "
        f"{rows[f0]:,} → {rows[fN]:,} rows, embeddings {vrows[f0]:,} → "
        f"{vrows[fN]:,}.  Median of "
        f"{RUNS} warm runs; shuffle bytes and stage counts from the Spark UI",
        "REST metrics (`/api/v1/.../stages`), delta per run.",
        "",
        "Reading it: `gN` = value(16x)/value(1x).  Near-linear wall/bytes",
        f"growth ≈ {span}x confirms the SCALE.md plan-shape claims; the",
        "shuffle COUNT staying flat is the 100-TB property (a plan whose",
        "number of shuffles grows with data is dead at scale regardless of",
        "per-shuffle cost).  Wall gN below the data ratio = fixed per-stage",
        "overhead still amortizing — fine; wall gN >> data ratio would flag",
        "a quadratic term.",
        "",
    ]
    for name, _, claim in FAMILIES:
        lines += [f"## {name} — {claim}", ""]
        lines.append(
            "| factor | docs rows | wall s | shuffle read MB | shuffle write MB | input MB | shuffle stages |"
        )
        lines.append("|---|---|---|---|---|---|---|")
        for f in FACTORS:
            r = results[name][f]
            lines.append(
                f"| {f}x | {rows[f]:,} | {r['wall']:.2f} | "
                f"{r['read'] / 1e6:.1f} | {r['write'] / 1e6:.1f} | "
                f"{r['input'] / 1e6:.1f} | {r['n_shuffles']} |"
            )
        a, b = results[name][f0], results[name][fN]
        gw = b["wall"] / a["wall"] if a["wall"] else float("inf")
        gb = (
            (b["read"] + b["write"]) / (a["read"] + a["write"])
            if (a["read"] + a["write"])
            else float("inf")
        )
        gi = b["input"] / a["input"] if a["input"] else float("inf")
        flat = "FLAT" if b["n_shuffles"] <= a["n_shuffles"] + 1 else "GREW!"
        lines += [
            "",
            f"g{span}: wall {gw:.1f}x, shuffle bytes {gb:.1f}x, input bytes "
            f"{gi:.1f}x over a {span}x data step; shuffle-stage count "
            f"{a['n_shuffles']} → {b['n_shuffles']} ({flat}).",
            "",
        ]
    lines += [
        "## ANN recall stability (r9 verdict item 4)",
        "",
        "Mean recall@10 over the 5 standing queries vs brute-force exact",
        "cosine on the same staged corpus (the gated quality metric of",
        "sim_ann_recall_*, here measured ACROSS the scale step).  The",
        "scaled configs follow the quantizer-scaling discipline: fixed-K",
        "Lloyd coarse quantizer (constant nprobe/K probe fraction) and",
        "hyperplane planes grown one per corpus doubling.  Reading it with",
        "the embdup rows above: recall must HOLD (not sink) as data grows",
        "— and the cost of that recall is the real axis of comparison.",
        "The fixed 6-plane config holds recall only by letting its buckets",
        "crowd (the embdup_fixed quadratic-bytes law above is the SAME",
        "config's cost curve); the scaled-planes config holds recall",
        "within a few points of it while its candidate cost stays ~linear",
        "(embdup_scaled).  Quality stable, cost linear — both measured.",
        "",
        "| tier | " + " | ".join(f"recall@10 at {f}x" for f in FACTORS) + " |",
        "|---|" + "---|" * len(FACTORS),
    ]
    for tier, vals in recall.items():
        lines.append(
            f"| {tier} | " + " | ".join(f"{vals[f]:.2f}" for f in FACTORS) + " |"
        )
    lines += [
        "",
        "The `ivfpq_curve_*` rows are the gated operating curve",
        "(sim_ann_ivfpq_curve's nprobe × R sweep) measured across the scale",
        "step under the fixed-K mod dial: the curve SHAPE — which operating",
        "point buys how much recall — must stay readable as data grows,",
        "and its cost axis must stay ~linear.  rows_read (ADC-scored",
        "candidate pairs; the cost each recall point pays):",
        "",
        "| curve point | "
        + " | ".join(f"rows_read at {f}x" for f in FACTORS)
        + " | g |",
        "|---|" + "---|" * (len(FACTORS) + 1),
    ]
    for tier, vals in curve_rows_read.items():
        g = vals[fN] / vals[f0] if vals[f0] else float("inf")
        lines.append(
            f"| {tier} | "
            + " | ".join(f"{vals[f]:,}" for f in FACTORS)
            + f" | {g:.1f}x |"
        )
    lines.append("")

    def _g(name, field):
        a, b = results[name][f0], results[name][fN]
        if field == "bytes":
            denom = a["read"] + a["write"]
            return (b["read"] + b["write"]) / denom if denom else float("inf")
        return b[field] / a[field] if a[field] else float("inf")

    lines += [
        "## Interpretation (r7, against SCALE.md's claims)",
        "",
        "- **index_build / segment_dedup**: shuffle bytes track the data",
        f"  step ~exactly ({_g('index_build', 'bytes'):.1f}x /"
        f" {_g('segment_dedup', 'bytes'):.1f}x over {span}x) at a FLAT",
        "  shuffle count — the one-shuffle claims hold as measured, not",
        "  just as plan shapes.",
        f"- **ivfpq_lloyd**: FLAT shuffle count and SUB-linear bytes"
        f" ({_g('ivfpq_lloyd', 'bytes'):.1f}x): the",
        "  training shuffles move model-sized partial aggregates (k x (d+1)",
        "  cells), not the corpus — the broadcast-model discipline visible",
        "  in the metrics.",
        "- **pagerank**: FLAT shuffle count (= rounds, data-independent).",
        f"  The bytes ratio ({_g('pagerank', 'bytes'):.1f}x) overshoots the",
        "  data step from a tiny absolute base because the edge side",
        "  crosses the broadcast-join threshold between 1x and 16x —",
        "  per-round bytes then scale with edges, which grow linearly in",
        "  the salted replication.",
        "- **simhash_cc vs simhash_cc60**: the toy 32-bit/4-band config",
        f"  SATURATES its 8-bit band space — shuffle bytes grow"
        f" {_g('simhash_cc', 'bytes'):.1f}x over a",
        f"  {span}x step (random band collisions re-introduce a quadratic",
        "  term once n >> 2^(bits/bands), exactly as simhash_near_dups'",
        "  docstring warns).  The corpus-scale 60/5 config on the SAME data",
        f"  measures {_g('simhash_cc60', 'bytes'):.1f}x ≈ linear and"
        f" {results['simhash_cc'][fN]['wall'] / results['simhash_cc60'][fN]['wall']:.1f}x"
        f" less wall at {span}x — the gated",
        "  entries run 60/5 since r7.  Both CC stage counts drift up with",
        "  n: large/small-star rounds are O(log^2 n) by design (rounds grow",
        "  with log of data, never proportionally).",
        "- **embdup_fixed vs embdup_scaled**: the hyperplane twin of the",
        f"  same law — fixed 4-plane bands (16 buckets) grow"
        f" {_g('embdup_fixed', 'bytes'):.1f}x bytes /"
        f" {_g('embdup_fixed', 'wall'):.1f}x wall over {span}x as buckets",
        "  crowd, while growing planes/band one per corpus doubling",
        f"  (4/6/8) holds the per-bucket population constant:"
        f" {_g('embdup_scaled', 'bytes'):.1f}x bytes /"
        f" {_g('embdup_scaled', 'wall'):.1f}x wall.",
        "",
        "## Interpretation — serving paths (r8, r7 verdict item 4)",
        "",
        "Serve families run against PREBUILT layouts; input bytes are the",
        "bytes the query's scans actually pulled, so pruning shows up as the",
        f"gap between input-bytes growth and the {span}x corpus step.",
        "ABSOLUTE scale matters more than the ratios here: the 1x baselines",
        "are fractions of a megabyte (footers + the centroid table), so a",
        "'5x' input growth still means the 16x serve reads well under 1% of",
        "the multi-tens-of-MB lists layout.  Running this section is what",
        "exposed the r8 DPP finding: pre-fix, the serve scanned the WHOLE",
        "index at every factor (3.4 MB at 16x vs 0.2 MB after the",
        "window-free-probe fix in sources/ann_index.py) while the plan text",
        "still printed a dynamicpruning expression — it had silently",
        "degraded to dynamicpruningexpression(true).  The residual wall",
        "growth of the mod-29 families is the partition-DISCOVERY job (one",
        "listing task per c_list directory, 1104 at 16x, run once per",
        "fresh read of the layout), not data: at production scale either",
        "the quantizer K is bounded (the fixed-K split family below is",
        "wall-FLAT) or a table format's manifest replaces directory",
        "listing.",
        "",
        f"- **ivf_serve**: wall {_g('ivf_serve', 'wall'):.1f}x, input"
        f" {_g('ivf_serve', 'input'):.1f}x over {span}x data — with the",
        "  corpus-proportional quantizer (constant list size) the probed",
        "  partitions are constant-sized and DPP skips the rest; the",
        "  residual input growth is the (tiny) centroid table, which grows",
        "  with K.",
        f"- **ivf_serve_split**: input {_g('ivf_serve_split', 'input'):.1f}x"
        f" — fixed K means the two probed lists DO grow with the corpus",
        "  (nprobe/K of it); the cap turns each probed hot list into",
        "  parallel slot tasks instead of one straggler, which is why wall",
        f"  grows only {_g('ivf_serve_split', 'wall'):.1f}x.",
        f"- **ivf_serve_filtered**: input {_g('ivf_serve_filtered', 'input'):.1f}x,"
        f" wall {_g('ivf_serve_filtered', 'wall'):.1f}x — the metadata",
        "  predicate rides in PushedFilters under the same DPP prune;",
        "  filtered search costs what unfiltered search costs.",
        f"- **text_serve**: input {_g('text_serve', 'input'):.1f}x — bucket",
        "  pruning reads only the 3 searched terms' buckets; their postings",
        "  grow with term frequency (~corpus), but the read stays a fixed",
        "  fraction of the index however big it gets.",
        f"- **text_upsert**: wall {_g('text_upsert', 'wall'):.1f}x /"
        f" input {_g('text_upsert', 'input'):.1f}x — the mutation protocol",
        "  never reads a base file (delta write + docgen swap only), so a",
        "  constant batch costs the same against any corpus size: the",
        "  O(batch) claim, measured.",
        f"- **text_serve_upserted**: wall {_g('text_serve_upserted', 'wall'):.1f}x /"
        f" input {_g('text_serve_upserted', 'input'):.1f}x — serving through",
        "  the overlay (base anti-join tombstones + delta generation) adds a",
        "  constant term to text_serve; both scans stay bucket-pruned.",
        f"- **ivfpq_upsert**: wall {_g('ivfpq_upsert', 'wall'):.1f}x /"
        f" shuffle bytes {_g('ivfpq_upsert', 'read'):.1f}x over 16x, stage",
        "  count FLAT — the touched-list rewrite itself is O(batch)",
        "  (~300 mutated ids → ~300 ~29-row lists at every factor); the",
        "  sub-linear residual is the column-pruned (n_id, c_list) locate",
        "  scan plus the K∝corpus quantizer collect, both thin by design",
        "  (unlike the TEXT index, a deleted vector's list must be found,",
        "  since codes live in exactly one partition).",
        f"- **compact_selective vs compact_full**: the maintenance-pass",
        f"  contrast — selective wall {_g('compact_selective', 'wall'):.1f}x /"
        f" input {_g('compact_selective', 'input'):.1f}x (O(touched): one",
        "  constant-size fragmented partition out of 8·factor) against the",
        f"  full rewrite's {_g('compact_full', 'wall'):.1f}x wall /"
        f" {_g('compact_full', 'input'):.1f}x input (O(corpus)).",
        "",
    ]
    # carry the spill_probe.py section (its own JVM-per-config harness,
    # r9 verdict item 5) across regenerations of this file
    try:
        cur = open(out_md).read()
        if "<!-- SPILL:BEGIN -->" in cur and "<!-- SPILL:END -->" in cur:
            block = (
                "<!-- SPILL:BEGIN -->"
                + cur.split("<!-- SPILL:BEGIN -->", 1)[1].split(
                    "<!-- SPILL:END -->", 1
                )[0]
                + "<!-- SPILL:END -->"
            )
            lines += [block, ""]
    except OSError:
        pass
    with open(out_md, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
