"""Persisted inverted text index: build once as a bucket-partitioned
postings layout, serve conjunctive term queries reading only the buckets
the query terms hash to.

The text analog of sources/ann_index: the reference engine's world has no
full-text surface (its tables are TPC-H/SSB — SURVEY.md §2), but a corpus
store that answers "which documents contain all of these terms?" is a
standard capability next to the dedup/decontamination operators — e.g.
benchmark-contamination audits look up exact benchmark phrases corpus-wide.

Layout contract:
- `<path>/postings`: (doc_id, term) DISTINCT pairs, partitioned by
  `t_bucket = md5_slice32("ti|" + term) % num_buckets`.  Partitioning by
  a hash bucket (not the raw term) keeps the directory fanout fixed while
  still letting a term query prune: the query's bucket set is computable
  AT PLAN TIME (md5 is engine- and driver-side reproducible), so the scan
  reads only |distinct buckets(terms)| partitions — static pruning, no
  DPP subquery needed — and the parquet `term IN (...)` pushdown prunes
  row groups within each bucket.

Scale shape: build is one explode + one repartition-by-bucket write
(linear in corpus token count); a k-term query reads ≤ k/num_buckets of
the postings regardless of corpus size, and the conjunctive AND is one
groupBy(doc_id) count over just those postings.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from codecdb_queryengine_spark.functions import text as T


def _bucket_of(term: str, num_buckets: int) -> int:
    """Driver-side mirror of functions/text.md5_slice32('ti|', term) —
    bit-identical to the JVM md5 build-side expression, so plan-time
    pruning and the stored layout can never disagree."""
    return int(hashlib.md5(f"ti|{term}".encode()).hexdigest()[:8], 16) % num_buckets


def _meta_path(path: str, layout: str) -> str:
    """Each physical layout under `path` (postings / postings_pos /
    postings_tf) gets its OWN meta table.  A single shared `<path>/meta`
    let two layouts built at the same path with different bucket counts
    clobber each other, and the loser would then be pruned with the wrong
    modulus — the silent wrong-answer class the meta table exists to
    prevent (r5 ADVICE)."""
    return os.path.join(path, f"meta_{layout}")


def _fs_exists(spark: SparkSession, path: str) -> bool:
    """Existence through the Hadoop FileSystem of the path's scheme, so
    the check is correct on hdfs:// and s3a:// layouts too, not only on
    the local filesystem the tests use."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(hpath))


def _write_meta(
    spark: SparkSession, path: str, num_buckets: int, layout: str = "postings"
) -> None:
    """Persist the layout's bucket count next to the postings.  A search
    pruning with a DIFFERENT modulus than the build silently drops every
    posting whose bucket doesn't collide — a wrong-answer class, not an
    error — so the layout records the constant and searches read it back
    instead of trusting their caller."""
    spark.createDataFrame([(int(num_buckets),)], "num_buckets int").coalesce(
        1
    ).write.mode("overwrite").parquet(_meta_path(path, layout))


def _read_buckets(
    spark: SparkSession, path: str, fallback: int, layout: str = "postings"
) -> int:
    """Bucket count from the layout's own meta table; `fallback` only for
    pre-meta layouts (neither the per-layout meta nor the legacy shared
    `<path>/meta` exists).  Existence is checked explicitly so a genuine
    read error (permissions, corrupt parquet, transient FS failure)
    PROPAGATES instead of silently reintroducing the wrong-modulus prune
    the meta table guards against."""
    for meta in (_meta_path(path, layout), os.path.join(path, "meta")):
        if _fs_exists(spark, meta):
            return int(spark.read.parquet(meta).first()["num_buckets"])
    return fallback


def postings_of(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 32,
) -> DataFrame:
    """(doc_id, term, t_bucket): per-document DISTINCT terms with their
    layout bucket.  A stateless projection + explode, so it runs unchanged
    on a STREAMING frame — the in-stream indexing path
    (docs_stream_index_ingest) and the batch build share this exact
    expression, which is what keeps the two layouts interchangeable."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(T.tokens(text_col))).alias("term"),
    ).withColumn(
        "t_bucket", (T.md5_slice32("ti|", F.col("term")) % num_buckets).cast("int")
    )


def text_index_build(
    docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 32,
) -> None:
    """Explode per-document DISTINCT terms and persist the postings
    partitioned by term bucket."""
    postings = postings_of(docs, text_col, id_col, num_buckets)
    (
        postings.repartition("t_bucket")
        .write.mode("overwrite")
        .partitionBy("t_bucket")
        .parquet(os.path.join(path, "postings"))
    )
    _write_meta(docs.sparkSession, path, num_buckets, layout="postings")


def text_index_search_all(
    spark: SparkSession,
    path: str,
    terms: list[str],
    num_buckets: int = 32,
) -> DataFrame:
    """doc_ids containing ALL `terms`: postings-intersection as one count.

    The bucket literals are computed driver-side, so partition pruning is
    static (the scan lists only those directories); the `term IN` filter
    reaches parquet as a pushed predicate.  Postings are distinct
    (doc, term) pairs, so `count(*) == len(terms)` is the exact AND.
    """
    want = sorted(set(terms))
    num_buckets = _read_buckets(spark, path, num_buckets, layout="postings")
    buckets = sorted({_bucket_of(t, num_buckets) for t in want})
    postings = spark.read.parquet(os.path.join(path, "postings"))
    hits = postings.filter(
        F.col("t_bucket").isin(buckets) & F.col("term").isin(want)
    )
    return (
        hits.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
        .filter(F.col("n_hit") == len(want))
        .select("doc_id")
    )


# --- positional postings: phrase queries ------------------------------------


def positional_postings_of(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 32,
) -> DataFrame:
    """(doc_id, pos, term, t_bucket): EVERY token occurrence with its
    0-based position — the positional layout phrase queries need (the
    distinct layout answers AND/OR membership but cannot see adjacency).
    ~n_tokens rows instead of distinct-terms rows; same bucketing."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(T.tokens(text_col)).alias("pos", "term"),
    ).withColumn(
        "t_bucket", (T.md5_slice32("ti|", F.col("term")) % num_buckets).cast("int")
    )


def text_index_build_positional(
    docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 32,
) -> None:
    """Persist the positional postings under `<path>/postings_pos`,
    bucket-partitioned like the distinct layout."""
    (
        positional_postings_of(docs, text_col, id_col, num_buckets)
        .repartition("t_bucket")
        .write.mode("overwrite")
        .partitionBy("t_bucket")
        .parquet(os.path.join(path, "postings_pos"))
    )
    _write_meta(docs.sparkSession, path, num_buckets, layout="postings_pos")


def text_index_search_phrase(
    spark: SparkSession,
    path: str,
    phrase: list[str],
    num_buckets: int = 32,
) -> DataFrame:
    """doc_ids containing the exact token phrase: the classic positional-
    postings join — occurrences of phrase[i] at position p+i for every i,
    intersected on (doc_id, anchor position).  Bucket pruning and term
    pushdown are identical to the AND search; the joins run only over the
    phrase terms' pruned postings, keyed by (doc_id, pos) — no corpus
    scan, no row explosion beyond the terms' occurrence lists."""
    assert phrase, "empty phrase"
    num_buckets = _read_buckets(spark, path, num_buckets, layout="postings_pos")
    buckets = sorted({_bucket_of(t, num_buckets) for t in phrase})
    postings = spark.read.parquet(os.path.join(path, "postings_pos"))
    hits = postings.filter(
        F.col("t_bucket").isin(buckets) & F.col("term").isin(sorted(set(phrase)))
    ).select("doc_id", "pos", "term")
    anchor = hits.filter(F.col("term") == phrase[0]).select(
        "doc_id", F.col("pos").alias("p0")
    )
    for i, t in enumerate(phrase[1:], start=1):
        nxt = hits.filter(F.col("term") == t).select(
            "doc_id", (F.col("pos") - i).alias("p0")
        )
        anchor = anchor.join(nxt, ["doc_id", "p0"])
    return anchor.select("doc_id").distinct()


# --- ranked retrieval (BM25-shaped) -----------------------------------------


def text_index_build_ranked(
    docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 32,
) -> None:
    """Persist the ranked-retrieval layout: `<path>/postings_tf`
    (doc_id, term, tf) bucket-partitioned like the other layouts, plus
    `<path>/doclens` (doc_id, dl) — the per-document statistics BM25-style
    scoring needs."""
    pos = positional_postings_of(docs, text_col, id_col, num_buckets)
    tf = pos.groupBy("doc_id", "term", "t_bucket").agg(
        F.count(F.lit(1)).alias("tf")
    )
    (
        tf.repartition("t_bucket")
        .write.mode("overwrite")
        .partitionBy("t_bucket")
        .parquet(os.path.join(path, "postings_tf"))
    )
    docs.select(
        F.col(id_col).alias("doc_id"), T.token_count(text_col).alias("dl")
    ).write.mode("overwrite").parquet(os.path.join(path, "doclens"))
    _write_meta(docs.sparkSession, path, num_buckets, layout="postings_tf")


def text_index_search_ranked(
    spark: SparkSession,
    path: str,
    terms: list[str],
    k: int = 10,
    k1: float = 1.25,
    b: float = 0.75,
    num_buckets: int = 32,
) -> DataFrame:
    """Top-k documents by a BM25-shaped score over the persisted ranked
    layout (Robertson & Zaragoza 2009, "The Probabilistic Relevance
    Framework"): per query term,

        part(t, d) = idf_r(t) · tf·(k1+1) / (tf + k1·(1−b + b·dl/avgdl))

    with the RATIONAL idf  idf_r = (N − df + 0.5)/(df + 0.5) — the inside
    of BM25's log, used without the log.  The log is monotone, so the
    PER-TERM preference order is classical BM25's; the cross-engine reason
    is harder: ln() is the one op here that is not IEEE-correctly-rounded
    (JVM vs DuckDB libm differ at the last ulp — the classifier_logit
    sigmoid note), while +,−,×,÷ on exact-integer inputs are deterministic
    in any IEEE engine.  A serving stack that wants the textbook ln(idf)
    drops it in unchanged — same plan, same layout.

    The per-document score sums the ≤|terms| parts in FIXED term order
    (one pivoted column per query term, added left-to-right), so the
    double is reproducible under any partitioning or merge order.

    Scale shape: bucket pruning + term pushdown as in the boolean search;
    df comes from the pruned postings themselves (one k-row aggregate),
    corpus stats (N, Σdl) are a 1-row broadcast, and the final top-k is a
    TakeOrderedAndProject — no corpus scan anywhere.
    """
    assert terms, "empty query"
    want = sorted(set(terms))
    num_buckets = _read_buckets(spark, path, num_buckets, layout="postings_tf")
    buckets = sorted({_bucket_of(t, num_buckets) for t in want})
    tfp = (
        spark.read.parquet(os.path.join(path, "postings_tf"))
        .filter(F.col("t_bucket").isin(buckets) & F.col("term").isin(want))
        .select("doc_id", "term", "tf")
    )
    doclens = spark.read.parquet(os.path.join(path, "doclens"))
    stats = doclens.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    dfs = tfp.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    hits = (
        tfp.join(doclens, "doc_id")
        .join(F.broadcast(dfs), "term")
        .crossJoin(F.broadcast(stats))
    )
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")
    idf_r = ((F.col("n_docs") - F.col("df")).cast("double") + F.lit(0.5)) / (
        F.col("df").cast("double") + F.lit(0.5)
    )
    tff = (F.col("tf").cast("double") * F.lit(k1 + 1.0)) / (
        F.col("tf").cast("double")
        + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * (F.col("dl").cast("double") / avgdl))
    )
    parts = hits.select("doc_id", "term", (idf_r * tff).alias("part"))
    agg = parts.groupBy("doc_id").agg(
        *[
            F.max(F.when(F.col("term") == t, F.col("part"))).alias(f"p{i}")
            for i, t in enumerate(want)
        ]
    )
    score = F.coalesce(F.col("p0"), F.lit(0.0))
    for i in range(1, len(want)):
        score = score + F.coalesce(F.col(f"p{i}"), F.lit(0.0))
    return (
        agg.select("doc_id", score.alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
    )
