"""Persisted inverted text index (sources/text_index): build, prune, AND."""

import glob

from pyspark.sql import functions as F

from codecdb_queryengine_spark.sources import text_index as TI


def _corpus(spark):
    rows = [
        (0, "alpha beta gamma"),
        (1, "alpha beta"),
        (2, "beta gamma delta"),
        (3, "alpha alpha alpha"),  # duplicate tokens must not double-count
        (4, "epsilon"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_search_all_terms_is_exact_and(spark, tmp_path):
    path = str(tmp_path / "ti")
    TI.text_index_build(_corpus(spark), path, num_buckets=8)
    got = {
        r["doc_id"]
        for r in TI.text_index_search_all(
            spark, path, ["alpha", "beta"], num_buckets=8
        ).collect()
    }
    assert got == {0, 1}
    # single term, duplicated in-doc: present once
    got = {
        r["doc_id"]
        for r in TI.text_index_search_all(spark, path, ["alpha"], num_buckets=8).collect()
    }
    assert got == {0, 1, 3}
    # absent term: empty intersection
    assert (
        TI.text_index_search_all(spark, path, ["alpha", "zeta"], num_buckets=8).count()
        == 0
    )


def test_driver_bucket_mirrors_jvm_expression(spark):
    """_bucket_of (plan-time pruning) must match the build-side JVM md5
    bucket expression for every term, or a query would prune away the
    partition holding its own postings."""
    from codecdb_queryengine_spark.functions import text as T

    terms = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "Ω", ""]
    df = spark.createDataFrame([(t,) for t in terms], "term string").select(
        "term", (T.md5_slice32("ti|", F.col("term")) % 8).alias("b")
    )
    jvm = {r["term"]: r["b"] for r in df.collect()}
    assert jvm == {t: TI._bucket_of(t, 8) for t in terms}


def test_search_reads_only_hashed_buckets(spark, tmp_path):
    path = str(tmp_path / "ti")
    TI.text_index_build(_corpus(spark), path, num_buckets=8)
    df = TI.text_index_search_all(spark, path, ["alpha", "beta"], num_buckets=8)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    want = sorted({TI._bucket_of(t, 8) for t in ["alpha", "beta"]})
    assert "PartitionFilters: [t_bucket" in plan
    assert all(str(b) in plan.split("PartitionFilters")[1][:80] for b in want)
    assert len(glob.glob(path + "/postings/t_bucket=*")) >= len(want)


def test_phrase_search_adjacency_and_repeats(spark, tmp_path):
    path = str(tmp_path / "ti")
    TI.text_index_build_positional(_corpus(spark), path, num_buckets=8)

    def phrase(*terms):
        return {
            r["doc_id"]
            for r in TI.text_index_search_phrase(
                spark, path, list(terms), num_buckets=8
            ).collect()
        }

    # adjacency, not just co-occurrence: docs 0/1 have "alpha beta";
    # doc 2 has beta and gamma adjacent but NOT alpha beta
    assert phrase("alpha", "beta") == {0, 1}
    assert phrase("beta", "gamma") == {0, 2}
    # order matters
    assert phrase("beta", "alpha") == set()
    # repeated-term phrase must anchor on true consecutive positions
    assert phrase("alpha", "alpha") == {3}
    assert phrase("alpha", "alpha", "alpha") == {3}
    assert phrase("alpha", "alpha", "alpha", "alpha") == set()
    # single-term phrase degenerates to membership
    assert phrase("epsilon") == {4}


def test_ranked_search_prefers_rare_terms_and_high_tf(spark, tmp_path):
    path = str(tmp_path / "ti")
    rows = [
        (0, "rare rare common filler filler filler"),
        (1, "rare common filler filler filler filler"),
        (2, "common filler filler filler filler filler"),
        (3, "filler filler filler filler filler filler"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    TI.text_index_build_ranked(docs, path, num_buckets=8)
    out = TI.text_index_search_ranked(
        spark, path, ["rare", "common"], k=4, num_buckets=8
    ).collect()
    ids = [r["doc_id"] for r in out]
    # doc 3 has neither term -> absent entirely (no postings row)
    assert ids == [0, 1, 2]
    scores = [r["score"] for r in out]
    assert scores[0] > scores[1] > scores[2] > 0.0
