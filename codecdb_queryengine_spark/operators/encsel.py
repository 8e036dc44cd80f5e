"""Column-feature extraction for encoding selection ("encsel").

The reference computes per-column statistics used to pick a Parquet
encoding (reference: cpp/src/lqf/encsel/feature.h:28-105, feature.cc):

- Sparsity  — fraction of empty values (feature.cc:19-26)
- Entropy   — char-level Shannon entropy, whole column plus per-row
              min/max/mean/var (feature.cc:28-90)
- Length    — value-length min/max/mean/var (feature.cc:92-115)
- Distinct  — distinct ratio (feature.cc:117-125)
- Sortness  — inverted-pair ratio inside sampled fixed-size windows
              (feature.cc:127-160)

Spark-first re-expression: everything is a DataFrame aggregation —
char-level features explode to (id, char) and use the identity
-Σ p·log2 p = log2(T) - Σ c·log2 c / T so each entropy is one partial-
aggregated pass (no per-row state, no UDF).  Sortness replaces the
reference's random window sampling with deterministic tumbling windows
keyed by floor(seq/window) so results are reproducible and no global
sort/row_number (a single-partition bottleneck at 100 TB) is needed;
the within-window pair comparison is a self-equi-join on the window id,
which shuffles both sides by window and stays skew-free because windows
are fixed-size.

Intentional divergences from the reference implementation (kept,
because they look like bugs there): feature.cc:66 computes the global
entropy from the *last row's* counters (we use the global counters) and
feature.cc:88 records lmean as lmin (we record the mean); variance is
recorded as an un-normalized squared-deviation sum (we use population
variance).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SORT_WINDOW = 8


def _chars(df: DataFrame, col: str, id_col: str) -> DataFrame:
    return (
        df.select(F.col(id_col).alias("_id"), F.explode(F.split(F.col(col), "")).alias("ch"))
        .filter(F.col("ch") != "")
    )


def string_features(df: DataFrame, col: str, id_col: str) -> DataFrame:
    """Sparsity / Length / Distinct / Entropy features of a string column.

    Returns long-form rows (feature: string, value: double).
    """
    c = F.col(col)
    basic = df.agg(
        F.avg((F.length(c) == 0).cast("double")).alias("sparsity_ratio"),
        (F.countDistinct(c).cast("double") / F.count(F.lit(1))).alias("distinct_ratio"),
        F.min(F.length(c)).cast("double").alias("len_min"),
        F.max(F.length(c)).cast("double").alias("len_max"),
        F.avg(F.length(c)).alias("len_mean"),
        F.var_pop(F.length(c)).alias("len_var"),
    ).selectExpr(
        "stack(6, 'sparsity_ratio', sparsity_ratio, 'distinct_ratio', distinct_ratio,"
        " 'len_min', len_min, 'len_max', len_max, 'len_mean', len_mean,"
        " 'len_var', len_var) AS (feature, value)"
    )

    chars = _chars(df, col, id_col)
    # Global char entropy in one aggregated pass over per-char counts.
    n = F.col("n")
    global_ent = (
        chars.groupBy("ch")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(
            (F.log2(F.sum(n)) - F.sum(n * F.log2(n)) / F.sum(n)).alias("value")
        )
        .select(F.lit("entropy").alias("feature"), "value")
    )
    # Per-row entropy, then distribution stats across rows.
    line_ent = (
        chars.groupBy("_id", "ch")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("_id")
        .agg((F.log2(F.sum(n)) - F.sum(n * F.log2(n)) / F.sum(n)).alias("h"))
        .agg(
            F.min("h").alias("lmin"),
            F.max("h").alias("lmax"),
            F.avg("h").alias("lmean"),
            F.var_pop("h").alias("lvar"),
        )
        .selectExpr(
            "stack(4, 'line_entropy_min', lmin, 'line_entropy_max', lmax,"
            " 'line_entropy_mean', lmean, 'line_entropy_var', lvar) AS (feature, value)"
        )
    )
    return basic.unionByName(global_ent).unionByName(line_ent)


def sortedness(
    df: DataFrame, value_col: str, seq_col: str, window: int = SORT_WINDOW
) -> DataFrame:
    """Inverted-pair ratio within tumbling windows of `window` rows keyed by
    floor(seq/window) — the deterministic form of the reference's sampled
    Kendall-tau windows (feature.cc:149-160).  0.0 = sorted ascending,
    1.0 = sorted descending, ~0.5 = random.
    """
    base = df.select(
        (F.col(seq_col) / window).cast("long").alias("wid"),
        F.col(seq_col).alias("seq"),
        F.col(value_col).alias("v"),
    )
    a, b = base.alias("a"), base.alias("b")
    pairs = a.join(
        b, (F.col("a.wid") == F.col("b.wid")) & (F.col("a.seq") < F.col("b.seq"))
    )
    return pairs.agg(
        (
            F.sum((F.col("a.v") > F.col("b.v")).cast("double")) / F.count(F.lit(1))
        ).alias("value")
    ).select(F.lit("sort_inverted_ratio").alias("feature"), "value")


def column_profile(df: DataFrame, col: str, id_col: str) -> DataFrame:
    """Full string-feature profile labeled with the column name."""
    return string_features(df, col, id_col).select(
        F.lit(col).alias("col_name"), "feature", "value"
    )


def recommend_encoding(features: dict[str, float]) -> str:
    """Map a feature profile to a Parquet encoding — the decision the
    reference extracts these features FOR (CodecDB's encoding-selection
    line; the repo ships extraction + a timing harness,
    cpp/src/lqf/encsel/encsel_featuretime.cc, with the trained model
    external).  This is a transparent heuristic stand-in with the same
    inputs/outputs:

    - near-empty column                  → RLE (runs of empties)
    - few distinct values                → DICTIONARY
    - near-sorted numeric                → DELTA_BINARY_PACKED
    - low char entropy (repetitive text) → DICTIONARY
    - otherwise                          → PLAIN
    """
    if features.get("sparsity_ratio", 0.0) > 0.5:
        return "RLE"
    if features.get("distinct_ratio", 1.0) < 0.1:
        return "DICTIONARY"
    srt = features.get("sort_inverted_ratio")
    if srt is not None and (srt < 0.05 or srt > 0.95):
        return "DELTA_BINARY_PACKED"
    if features.get("entropy", 8.0) < 3.0:
        return "DICTIONARY"
    return "PLAIN"


def writer_options(recommendations: dict[str, str]) -> dict[str, str]:
    """Parquet writer options honoring the recommendations as far as the
    Spark writer exposes (dictionary encoding is a file-level toggle;
    delta/rle are chosen by the parquet writer automatically when
    dictionary is off and pages compress well)."""
    any_dict = any(v == "DICTIONARY" for v in recommendations.values())
    return {"parquet.enable.dictionary": "true" if any_dict else "false"}
