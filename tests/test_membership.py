"""Bloom-filter membership tests: no false negatives ever; FPP within the
designed envelope; the incremental-dedup composition is exactly the
anti-join (pre-filter + confirm removes all false positives)."""

from pyspark.sql import functions as F

from codecdb_queryengine_spark.operators import membership as MB


def _keys_df(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], ["k"])


def test_no_false_negatives(spark):
    keys = [f"key-{i}" for i in range(300)]
    bloom = MB.bloom_build(_keys_df(spark, keys), "k", num_bits=1 << 12, num_hashes=5)
    probed = (
        _keys_df(spark, keys)
        .join(F.broadcast(bloom))
        .withColumn("m", MB.bloom_might_contain(F.col("bloom"), F.col("k"), 1 << 12, 5))
    )
    assert probed.filter(~F.col("m")).count() == 0


def test_false_positive_rate_bounded(spark):
    # 300 keys in 4096 bits, k=5: theoretical FPP ~ (1-e^{-kn/m})^k ≈ 0.6%.
    # Assert a loose 5% ceiling so the test never flakes on hash luck.
    keys = [f"key-{i}" for i in range(300)]
    other = [f"other-{i}" for i in range(2000)]
    bloom = MB.bloom_build(_keys_df(spark, keys), "k", num_bits=1 << 12, num_hashes=5)
    fp = (
        _keys_df(spark, other)
        .join(F.broadcast(bloom))
        .withColumn("m", MB.bloom_might_contain(F.col("bloom"), F.col("k"), 1 << 12, 5))
        .filter(F.col("m"))
        .count()
    )
    assert fp / len(other) < 0.05, fp


def test_bad_num_bits_rejected(spark):
    import pytest

    with pytest.raises(ValueError):
        MB.bloom_build(_keys_df(spark, ["a"]), "k", num_bits=100)


def test_dedup_against_reference_is_exact_anti_join(spark):
    # Undersized bloom (128 bits for 200 keys) forces MANY false positives;
    # the confirming anti-join must still yield exactly new \ ref.
    ref = spark.createDataFrame(
        [(i, f"doc text {i}") for i in range(200)], ["id", "text"]
    )
    new = spark.createDataFrame(
        [(1000 + i, f"doc text {i}") for i in range(150, 250)]
        + [(2000 + i, f"fresh text {i}") for i in range(50)],
        ["id", "text"],
    )
    out = MB.dedup_against_reference(new, ref, "text", "id", num_bits=128, num_hashes=3)
    got = sorted(r.id for r in out.collect())
    # texts 150..199 duplicate ref; 200..249 and the 50 fresh ones survive
    expect = sorted([1000 + i for i in range(200, 250)] + [2000 + i for i in range(50)])
    assert got == expect


def test_null_content_rows_follow_anti_join_semantics(spark):
    # a NULL key matches nothing in an anti-join, so null-content rows must
    # be KEPT (the bloom probe evaluates to NULL and must not drop them)
    ref = spark.createDataFrame([(i, f"t{i}") for i in range(20)], ["id", "text"])
    new = spark.createDataFrame(
        [(100, "t5"), (101, None), (102, "fresh")],
        "id long, text string",
    )
    out = MB.dedup_against_reference(new, ref, "text", "id", num_bits=1 << 10)
    got = sorted(r.id for r in out.collect())
    exact = sorted(
        r.id
        for r in new.select("id", F.md5("text").alias("d"))
        .join(ref.select(F.md5("text").alias("d")), "d", "left_anti")
        .collect()
    )
    assert got == exact == [101, 102]


def test_null_reference_keys_do_not_crash_build(spark):
    ref = spark.createDataFrame(
        [(0, "a"), (1, None), (2, "b")], "id long, text string"
    )
    new = spark.createDataFrame([(10, "a"), (11, None), (12, "c")], "id long, text string")
    out = MB.dedup_against_reference(new, ref, "text", "id", num_bits=1 << 10)
    # 'a' drops; null-content and fresh rows survive (anti-join contract)
    assert sorted(r.id for r in out.collect()) == [11, 12]
