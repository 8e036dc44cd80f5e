#!/usr/bin/env python3
"""End-to-end corpus search serving, composed from the engine's persisted
inverted-index layouts — the workflow a data team runs to stand up exact
search over a document store (contamination audits, targeted corpus
inspection, eval-set leakage lookups):

    documents table
      -> build 3 layouts      (distinct postings, positional postings,
                               tf postings + doclens — all partitioned by
                               the term's md5 bucket; sources/text_index)
      -> boolean AND search   (plan-time static pruning to the query
                               terms' buckets + parquet `term IN` pushdown)
      -> exact phrase search  (positional adjacency joins over the same
                               pruned buckets)
      -> ranked top-k         (BM25-shaped scoring, rational idf, 1-row
                               corpus-stats broadcast)
      -> pruning audit        (buckets read vs buckets on disk)

Run:  python examples/corpus_search.py [sf_dir] [index_dir]
Defaults: /root/testdata/sf0.001, a temp dir.

Scale story (SCALE.md): build is linear in corpus token count; a k-term
query reads ≤ k of the fixed bucket set no matter how large the corpus,
and every serving plan ends data-side (group/join over the pruned
postings), never with a corpus rescan.
"""

from __future__ import annotations

import glob
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from codecdb_queryengine_spark.catalog import load_tables
from codecdb_queryengine_spark.sources import text_index as TI


def build_and_search(
    spark,
    sf_dir: str,
    index_dir: str,
    terms: list[str] | None = None,
    phrase: list[str] | None = None,
    k: int = 10,
):
    """Build all three layouts, run the three query forms, audit pruning.

    Returns (and_ids, phrase_ids, ranked_rows, buckets_read, buckets_on_disk).
    """
    terms = terms or ["hash", "scan", "merge"]
    phrase = phrase or ["hash", "join"]
    docs = load_tables(spark, sf_dir)["documents"]

    TI.text_index_build(docs, index_dir)
    TI.text_index_build_positional(docs, index_dir)
    TI.text_index_build_ranked(docs, index_dir)

    and_ids = sorted(
        r["doc_id"] for r in TI.text_index_search_all(spark, index_dir, terms).collect()
    )
    phrase_ids = sorted(
        r["doc_id"]
        for r in TI.text_index_search_phrase(spark, index_dir, phrase).collect()
    )
    ranked = TI.text_index_search_ranked(spark, index_dir, terms, k=k).collect()

    buckets_read = len({TI._bucket_of(t, 32) for t in terms})
    buckets_on_disk = len(glob.glob(os.path.join(index_dir, "postings", "t_bucket=*")))
    return and_ids, phrase_ids, ranked, buckets_read, buckets_on_disk


def main() -> None:
    from codecdb_queryengine_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    index_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="ti_")
    spark = get_spark("corpus-search-example")
    and_ids, phrase_ids, ranked, b_read, b_disk = build_and_search(
        spark, sf_dir, index_dir
    )
    print(f"AND(hash, scan, merge): {len(and_ids)} docs, first 10: {and_ids[:10]}")
    print(f'phrase "hash join":     {len(phrase_ids)} docs, first 10: {phrase_ids[:10]}')
    print("ranked top-k:")
    for r in ranked:
        print(f"  doc {r['doc_id']:>6}  score {r['score']:.6f}")
    print(f"pruning: read {b_read} of {b_disk} postings buckets on disk")


if __name__ == "__main__":
    main()
