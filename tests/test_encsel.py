"""encsel feature semantics pinned on hand-computable fixtures
(reference: cpp/src/lqf/encsel/feature.cc)."""

import math

import pytest

from codecdb_queryengine_spark.operators import encsel


def _fmap(df):
    return {r.feature: r.value for r in df.collect()}


def test_string_features_hand_values(spark):
    df = spark.createDataFrame([(0, "aabb"), (1, "abcd"), (2, "")], ["id", "s"])
    f = _fmap(encsel.string_features(df, "s", "id"))
    assert f["sparsity_ratio"] == pytest.approx(1 / 3)
    assert f["distinct_ratio"] == pytest.approx(1.0)
    assert f["len_min"] == 0.0 and f["len_max"] == 4.0
    assert f["len_mean"] == pytest.approx(8 / 3)
    # chars: a×3 b×3 c×1 d×1, T=8 → H = 3 - 6·log2(3)/8
    assert f["entropy"] == pytest.approx(3 - 6 * math.log2(3) / 8)
    # line entropies: "aabb" → 1.0, "abcd" → 2.0 (empty row contributes no chars)
    assert f["line_entropy_min"] == pytest.approx(1.0)
    assert f["line_entropy_max"] == pytest.approx(2.0)
    assert f["line_entropy_mean"] == pytest.approx(1.5)
    assert f["line_entropy_var"] == pytest.approx(0.25)


@pytest.mark.parametrize(
    "values,expected",
    [([1, 2, 3, 4], 0.0), ([4, 3, 2, 1], 1.0), ([2, 1, 4, 3], 2 / 6)],
)
def test_sortedness(spark, values, expected):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], ["seq", "v"]
    )
    got = encsel.sortedness(df, "v", "seq", window=4).collect()[0].value
    assert got == pytest.approx(expected)


def test_recommend_encoding_heuristics():
    assert encsel.recommend_encoding({"sparsity_ratio": 0.9}) == "RLE"
    assert encsel.recommend_encoding({"distinct_ratio": 0.01}) == "DICTIONARY"
    assert (
        encsel.recommend_encoding({"distinct_ratio": 0.9, "sort_inverted_ratio": 0.0})
        == "DELTA_BINARY_PACKED"
    )
    assert (
        encsel.recommend_encoding({"distinct_ratio": 0.9, "entropy": 1.5})
        == "DICTIONARY"
    )
    assert (
        encsel.recommend_encoding(
            {"distinct_ratio": 0.9, "sort_inverted_ratio": 0.5, "entropy": 6.0}
        )
        == "PLAIN"
    )


def test_profile_to_recommendation_roundtrip(spark):
    # a repetitive column profiles into a DICTIONARY recommendation
    df = spark.createDataFrame([(i, "ab") for i in range(50)], ["id", "s"])
    feats = _fmap(encsel.string_features(df, "s", "id"))
    assert encsel.recommend_encoding(feats) == "DICTIONARY"
    opts = encsel.writer_options({"s": "DICTIONARY"})
    assert opts["parquet.enable.dictionary"] == "true"
