"""Driver-contract invariants: the first 50 queries() entries are the
driver's correctness-gate window — keep the curated cross-section stable —
and every oracle key must have a matching query."""

import __spark_entry__ as entry


def test_driver_window_is_the_curated_cross_section():
    qs = list(entry.queries())
    assert qs[:50] == entry.DRIVER_FIRST
    # the window must span operator families, not just the relational core
    non_relational = [
        n
        for n in qs[:50]
        if n.startswith(("dedup_", "sim_", "events_", "ext_", "docs_", "graph_", "mm_"))
    ]
    assert len(non_relational) >= 10


def test_every_oracle_key_has_a_query_and_no_orphans():
    qs = entry.queries()
    oracles = entry.oracle_sql()
    assert set(oracles) <= set(qs)
    # rows-only queries are the deliberate exceptions (sketch estimates and
    # KMeans|| centers are engine-specific — no cross-engine value oracle)
    rows_only = set(qs) - set(oracles)
    assert rows_only == {
        # KMeans|| centers are engine-specific — no cross-engine value
        # oracle for the raw pairs; their CONTRACTS are value-gated by
        # sim_ann_{ivf,pq}_trained_gate and the exact-trained tier by
        # sim_ann_ivf_lloyd (r5)
        "sim_ann_ivf_trained",
        "sim_ann_pq_trained",
        # iterative argmax has no SQL oracle; pinned vs a pure-Python BPE
        # reference in tests/test_bpe.py
        "text_bpe_trained",
        # numpy matmul near-tie divergence vs the fold oracle — pinned
        # equal to the expression assignment in tests/test_ann_recall.py
        "emb_stream_encode_fast",
    }


def test_bench_skip_only_hides_twins():
    """BENCH_SKIP may hide exactly two kinds of redundant timings: SQL-text
    twins (same physical plans as the DataFrame forms) and value-gate twins
    (re-run an already-timed pipeline to check an engine-specific path)."""
    gate_twins = {
        "emb_pca_served",
        "graph_pagerank_ckpt",
        "sim_ann_ivf_trained_gate",
        "sim_ann_pq_trained_gate",
        "graph_cc_chain_ckpt",
        "emb_encode_parity",
        "text_bpe_gate",
    }
    assert all(n.endswith("_sql") or n in gate_twins for n in entry.BENCH_SKIP)
