"""Approximate-membership (Bloom filter) operators for cross-shard dedup.

No reference counterpart (the reference's membership structure is the
in-memory hash predicate behind MapFilter, cpp/src/lqf/filter.cc:60-120 —
exact and single-node); this is the driver-mandated extension for the
incremental-ingest shape a 100-TB corpus pipeline hits constantly: "drop
every document of today's shard whose content digest already exists in the
corpus" without shuffling either side in full.

Spark-first design: Spark's own runtime bloom-filter join
(spark.sql.optimizer.runtime.bloomFilter.*, enabled in session.py) injects
this pattern automatically inside a join, but its sketch is opaque,
join-scoped, and not reusable across queries.  This module builds an
EXPLICIT Bloom filter as a one-row DataFrame with nothing but JVM
expressions — no UDF, no collect:

  build: k = num_hashes positions per key via seeded xxhash64, explode,
         groupBy word-index with bit_or of the set bit — one shuffle whose
         output is at most num_bits/64 rows — then fold the sparse words
         into a single map<word_idx, bits> row.
  probe: broadcast the one-row map; membership is an AND of k
         element_at + getbit tests — pure whole-stage-codegen expressions
         on the probe side, which therefore never shuffles.

False-positive handling is the caller's choice: `dedup_against_reference`
confirms bloom-positives with an exact anti-join on the digest, so its
result is EXACTLY new ∖ reference (the oracle is the plain anti-join)
while the big new-shard side only pays the join shuffle for the tiny
bloom-positive slice.

Sizing (100 TB): bits ≈ 10 × n_reference_keys gives ~1% FPP with k=7;
1e9 reference digests → ~1.25 GB map, the upper edge of a comfortable
broadcast — beyond that, shard the reference by digest prefix and run one
bloom per shard (the build is the same one groupBy either way).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _positions(key: Column, num_bits: int, num_hashes: int) -> list[Column]:
    """k Bloom bit positions in [0, num_bits): one seeded xxhash64 each.

    xxhash64's seed parameter gives k independent hash families without
    string-concatenation tricks; pmod keeps positions non-negative.
    """
    return [
        F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(num_bits))
        for seed in range(num_hashes)
    ]


def bloom_build(
    df: DataFrame, key_col: str, num_bits: int = 1 << 16, num_hashes: int = 5
) -> DataFrame:
    """One-row DataFrame (`bloom`: map<long, long>) — the Bloom filter over
    `key_col`, storing only nonzero 64-bit words.

    One shuffle: (n_keys × num_hashes) position rows group into at most
    num_bits/64 word rows with map-side bit_or combine; the
    map_from_entries fold is a second tiny aggregation over those word
    rows.  Words use all 64 bits incl. the sign bit (bit_or is bitwise;
    probes read bits with getbit, never compare magnitudes).
    """
    if num_bits % 64:
        raise ValueError(f"num_bits must be a multiple of 64, got {num_bits}")
    # NULL keys hash to NULL positions and would land a NULL entry in
    # map_from_entries (an error); they also can't match any probe, so
    # dropping them preserves anti-join semantics exactly.
    pos = df.filter(F.col(key_col).isNotNull()).select(
        F.explode(F.array(*_positions(F.col(key_col), num_bits, num_hashes))).alias("pos")
    )
    words = (
        pos.select(
            (F.col("pos") / 64).cast("long").alias("w"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias("bit"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(bit)").alias("bits"))
    )
    return words.agg(
        F.map_from_entries(F.collect_list(F.struct("w", "bits"))).alias("bloom")
    )


def bloom_might_contain(
    bloom: Column, key: Column, num_bits: int, num_hashes: int
) -> Column:
    """True iff every one of the key's k bits is set: no false negatives,
    false positives at the designed rate.  Words absent from the sparse
    map are zero."""
    cond: Column | None = None
    for p in _positions(key, num_bits, num_hashes):
        word = F.coalesce(
            F.element_at(bloom, (p / 64).cast("long")), F.lit(0).cast("long")
        )
        test = F.getbit(word, (p % 64).cast("int")) == 1
        cond = test if cond is None else cond & test
    assert cond is not None
    return cond


def dedup_against_reference(
    new_df: DataFrame,
    ref_df: DataFrame,
    content_col: str,
    id_col: str,
    num_bits: int = 1 << 16,
    num_hashes: int = 5,
) -> DataFrame:
    """Exact incremental dedup: rows of `new_df` whose content digest does
    NOT appear in `ref_df`, with a Bloom pre-filter so only bloom-positive
    rows pay the anti-join.

    Result is exactly the digest anti-join (bloom false-positives are
    re-checked; false negatives cannot exist), so a plain anti-join SQL is
    its oracle.  Returns (id_col, digest).

    Plan shape at scale: the reference side is read once for the bloom
    build (one groupBy shuffle of n_ref × k longs) and once more for the
    anti-join build side — but the anti-join's probe stream is only the
    bloom-positive slice of the new shard (≈ true dups + FPP·n_new), so
    the dominant new-shard scan never shuffles.  Definite-new rows
    short-circuit through the NOT-might-contain branch as a pure map-side
    filter.
    """
    new_d = new_df.select(
        F.col(id_col), F.md5(F.col(content_col)).alias("digest")
    )
    ref_d = ref_df.select(F.md5(F.col(content_col)).alias("digest"))
    bloom = bloom_build(ref_d, "digest", num_bits, num_hashes)
    probed = new_d.join(F.broadcast(bloom)).withColumn(
        "__maybe", bloom_might_contain(F.col("bloom"), F.col("digest"), num_bits, num_hashes)
    )
    # NULL digests (null content) probe to NULL: the anti-join contract KEEPS
    # them (a null key matches nothing), so route them to the definite-new
    # branch instead of letting ~NULL silently drop the row.
    definite_new = probed.filter(
        ~F.coalesce(F.col("__maybe"), F.lit(False))
    ).select(id_col, "digest")
    confirmed_new = (
        probed.filter(F.col("__maybe"))
        .select(id_col, "digest")
        .join(ref_d, "digest", "left_anti")
        .select(id_col, "digest")
    )
    return definite_new.unionByName(confirmed_new)
