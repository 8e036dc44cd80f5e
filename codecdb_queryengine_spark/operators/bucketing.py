"""LSH bucket → candidate-pair expansion without a self-join.

Both MinHash banding (dedup.py) and hyperplane banding (similarity.py)
need "all unordered id pairs sharing a bucket".  The self-join
formulation (bk ⋈ bk on bucket key) costs two shuffles of the full
banding stream plus a join whose physical strategy is at the planner's
mercy — measured locally, AQE's runtime SMJ→broadcast choice swung
dedup_minhash between 3 s and 12 s at sf0.1.

The groupBy form is one shuffle on the bucket key: collect the (sorted)
ids per bucket, expand the k·(k-1)/2 in-bucket pairs with an array
expression, explode.  Output is identical (distinct unordered pairs).

100-TB note: pair expansion is quadratic in bucket size by definition —
identical to the self-join, which produces the same pairs through the
shuffle instead.  Bucket sizes are bounded by LSH design (band keys
spread near-uniformly; degenerate keys such as empty-shingle docs are
filtered upstream), so per-bucket arrays stay small; `collect_list` per
bucket is map-side-combined and never materializes more than one
bucket's ids per row.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucket_candidate_pairs(
    bk: DataFrame, id_col: str, bucket_cols: Sequence[str]
) -> DataFrame:
    """Distinct (id_a, id_b) with id_a < id_b sharing ≥1 bucket.

    bk: one row per (id, bucket); bucket_cols identify the bucket.
    """
    pairs = F.explode(
        F.expr(
            "flatten(transform(ids, (a, i) -> "
            "filter(transform(slice(ids, i + 2, size(ids)), b -> struct(a, b)), "
            "p -> p.a <> p.b)))"
        )
    )
    return (
        bk.groupBy(*bucket_cols)
        .agg(F.sort_array(F.collect_list(id_col)).alias("ids"))
        .filter(F.size("ids") >= 2)
        .select(pairs.alias("p"))
        .select(F.col("p.a").alias("id_a"), F.col("p.b").alias("id_b"))
        .distinct()
    )


def bucket_verified_pairs(
    bk: DataFrame,
    id_col: str,
    payload_col: str,
    bucket_cols: Sequence[str],
    verify_sql: str,
    keep_sql: str = "p.keep",
) -> DataFrame:
    """bucket_candidate_pairs with the verification fused INTO the
    per-bucket expansion: each bucket row carries (id, payload); pairs are
    expanded as struct(id_a, id_b, verify) with `verify_sql` evaluated on
    (a, b) structs (fields `id`, `p`) and only rows where the resulting
    `keep` field is true survive to the distinct.

    Why: the expansion-then-verify-after-shuffle form moves EVERY candidate
    through the distinct exchange; fusing the predicate means only true
    pairs shuffle (measured on the simhash graph at sf0.1: ~2.8M candidates
    for 83k true pairs — 34× less exchange traffic), and the per-side
    payload join-backs disappear.  Duplicate-id inputs cannot emit (x, x)
    self-pairs: the sorted positional expansion filters id_a <> id_b,
    matching the a.id < b.id contract of the join formulation.

    verify_sql: a SQL expression over `a`/`b` structs returning a struct
    that MUST contain `id_a`, `id_b`, plus any verified columns, e.g.
    ``struct(a.id AS id_a, b.id AS id_b, bit_count(a.p ^ b.p) AS hamming)``.
    keep_sql: the keep-predicate over the emitted struct `p` (default: a
    boolean `keep` field inside the struct).  Expressing the predicate
    over an EMITTED field (e.g. ``p.edits >= 0``) lets an expensive
    verification value be computed once — HOF lambdas are interpreted
    with no common-subexpression elimination, so a predicate that repeats
    the verify expression doubles its cost.
    """
    pairs = F.explode(
        F.expr(
            "flatten(transform(xs, (a, i) -> "
            f"filter(transform(slice(xs, i + 2, size(xs)), b -> {verify_sql}), "
            f"p -> p.id_a <> p.id_b AND ({keep_sql}))))"
        )
    )
    out = (
        bk.groupBy(*bucket_cols)
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col(id_col).alias("id"), F.col(payload_col).alias("p")))
            ).alias("xs")
        )
        .filter(F.size("xs") >= 2)
        .select(pairs.alias("p"))
        .select("p.*")
    )
    if "keep" in out.columns:
        out = out.drop("keep")
    return out.distinct()
