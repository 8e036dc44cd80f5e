"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from codecdb_queryengine_spark.queries import extensions, pipeline, sqltext, ssb, tpch

# Queries bench.py does NOT time (correctness-gated like everything else):
# the SQL-text variants compile to the same Catalyst physical plans as the
# DataFrame forms already in the bench, so timing all of them would just
# double-count the same execution.  Three representatives stay timed to
# pin the SQL path's overhead (parse/analyze) itself.
_SQL_KEEP = {"q1_sql", "q6_sql", "ssb_q2_1_sql"}
assert _SQL_KEEP <= sqltext.QUERIES.keys(), (
    f"BENCH_SKIP keep-list drifted from sqltext registry: "
    f"{_SQL_KEEP - sqltext.QUERIES.keys()}"
)
BENCH_SKIP = {name for name in sqltext.QUERIES if name not in _SQL_KEEP}
# Gate twins re-run an already-timed pipeline to value-check an
# engine-specific path (trained-quantizer invariants, checkpointed CC,
# fold-vs-Arrow parity); timing them would double-count the same work.
BENCH_SKIP |= {
    "emb_pca_served",
    "graph_pagerank_ckpt",
    "graph_cc_chain_ckpt",
    "emb_encode_parity",
}

# The driver's correctness gate truncates at the first 50 queries() entries
# (observed: CORRECTNESS_r01/r02 cover exactly entries 1-50).  Rotation
# policy (r7 verdict item 8, STALENESS-KEYED since r8): the new round's
# gates lead (a new entry is always windowed the round it lands), then the
# stalest names by last-green driver round, tie-broken alphabetically, fill
# the remaining slots.  Round-9 window: the 5 new r9 gates + all 19 names
# last green in r3 + the first 26 (alphabetically) of the 42 last green in
# r4 — after r9 the stalest name outside the window is r4-green (5 rounds),
# holding the policy's ceil((surface - new) / 48) ≈ 5-round bound as the
# surface grows.  Everything rotated out stays covered by
# scripts/check_correctness.py over the full surface (ORACLE_NDIGITS=exact
# for the bit-exact standard).
DRIVER_FIRST = [
    # part 1: the five r9 gates — IVFADC (PQ-tier) index mutability
    # (vector upsert/delete re-encoded against the layout's persisted
    # quantizers), filtered ADC search (metadata pushdown under the DPP
    # prune on the codes layout), batched hybrid retrieval (8 concurrent
    # per-query RRF fusions over one pass per index), and CDC mutation
    # streaming into BOTH persisted vector-index families (one
    # touched-lists rewrite per micro-batch — PQ updates re-encoded on
    # the layout's quantizers — idempotent under at-least-once replay)
    "docs_hybrid_search_batch",
    "emb_stream_mutations",
    "emb_stream_pq_mutations",
    "sim_ann_ivfpq_filtered",
    "sim_ann_ivfpq_upserted",
    # part 2: the 45 stalest names (last green r3, then the first 26 of
    # r4's 42, alphabetical within a round)
    "ext_salted_agg",
    "ext_setops",
    "ext_window_funcs",
    "ext_zorder",
    "q10",
    "q11",
    "q12",
    "q14",
    "q15",
    "q16",
    "q18",
    "q2",
    "q20",
    "q3",
    "q4",
    "q5",
    "q7",
    "q8",
    "sim_ann_lsh",
    "dedup_canonical",
    "dedup_keep_docs",
    "dedup_report",
    "docs_bigrams",
    "docs_decontaminate",
    "docs_pack_chunks",
    "docs_pack_sequences",
    "docs_quality_by_source",
    "docs_quality_filter",
    "docs_sample_stratified",
    "docs_sample_weighted",
    "docs_stream_quality",
    "docs_tfidf",
    "emb_stream_encode",
    "events_anomaly",
    "events_asof_forward",
    "events_funnel",
    "events_json_props",
    "events_resample",
    "events_retention",
    "events_sessionize",
    "events_stream_enrich",
    "events_stream_score",
    "events_stream_sliding",
    "events_window",
    "ext_corr",
]


# Gates that BUILD a persisted scratch layout (index/model/file lifecycle)
# before serving.  bench.py times these LAST as their own family, after the
# relational/streaming core, with a cache-clear + JVM GC at the family
# boundary: r8's close showed the ten index-building gates' allocation
# churn skewing sub-second relational queries 2-3x run-to-run when
# interleaved (r8 verdict item 4).  tests/test_entry_contract.py regenerates
# this set from the query sources (every gate whose body calls
# _scratch_dir), so it cannot drift from the registry.
BENCH_LIFECYCLE = frozenset({
    "docs_binaryfile",
    "docs_compact_roundtrip",
    "docs_hybrid_search",
    "docs_hybrid_search_batch",
    "docs_io_roundtrip",
    "docs_search_cached",
    "docs_search_index",
    "docs_search_phrase",
    "docs_search_purged",
    "docs_search_ranked",
    "docs_search_upserted",
    "docs_stream_compact_selective",
    "docs_stream_index_compact",
    "docs_stream_index_ingest",
    "docs_stream_mutations",
    "docs_upsert_partitioned",
    "emb_pca_served",
    "emb_stream_index_compact",
    "emb_stream_index_ingest",
    "emb_stream_ivfpq_ingest",
    "emb_stream_mutations",
    "emb_stream_pq_mutations",
    "ext_zorder_lifecycle",
    "graph_cc_chain_ckpt",
    "graph_pagerank_ckpt",
    "sim_ann_ivf_appended_split",
    "sim_ann_ivf_cached",
    "sim_ann_ivf_filtered",
    "sim_ann_ivf_indexed",
    "sim_ann_ivf_indexed_append",
    "sim_ann_ivf_indexed_split",
    "sim_ann_ivf_lloyd_indexed",
    "sim_ann_ivf_upserted",
    "sim_ann_ivfpq_filtered",
    "sim_ann_ivfpq_lloyd_indexed",
    "sim_ann_ivfpq_upserted",
})


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on /root/testdata/sf0.001."""
    return tpch.q1(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator/query from SURVEY.md §2,
    DRIVER_FIRST names leading (see above)."""
    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    merged.update(tpch.QUERIES)
    merged.update(ssb.QUERIES)
    merged.update(pipeline.QUERIES)
    merged.update(extensions.QUERIES)
    # A *_sql name registered by a non-sqltext module would be silently
    # shadowed by the generated variant — refuse instead.
    overlap = sqltext.QUERIES.keys() & merged.keys()
    assert not overlap, f"sqltext names shadow earlier registrations: {sorted(overlap)}"
    merged.update(sqltext.QUERIES)
    missing = [n for n in DRIVER_FIRST if n not in merged]
    assert not missing, f"DRIVER_FIRST names not registered: {missing}"
    out = {n: merged[n] for n in DRIVER_FIRST}
    out.update(merged)
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each queries() entry."""
    out: dict[str, str] = {}
    out.update(tpch.ORACLE)
    out.update(ssb.ORACLE)
    out.update(pipeline.ORACLE)
    out.update(extensions.ORACLE)
    out.update(sqltext.ORACLE)
    return out
