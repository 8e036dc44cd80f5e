"""Exact global ordering without a single-partition window.

`row_number() OVER (ORDER BY ...)` and `ntile(k) OVER (ORDER BY ...)` are
the two places a declarative plan can silently collapse to ONE task: Spark
plans a partition-less window as `Exchange SinglePartition` + one sort on
one executor — correct at any SF, dead at 100 TB (and Spark logs a
WindowExec warning saying exactly this).  The reference never hits the
problem because it is single-node by construction (its SmallSort /
SnapshotSort, cpp/src/lqf/sort.h:63-95, sort one process's memory); a
distributed engine needs the classic two-pass prefix-offset form instead:

  pass 1  count rows per ORDER-monOTONE bucket        (B-row aggregate)
  pass 2  rank within each bucket (PARTITIONED window)
          + add the bucket's broadcast prefix offset  (B-row join)

The result is bit-identical to the global window — position is a pure
function of the total order — but the plan is a hash shuffle on the bucket
plus per-bucket sorts: every stage parallel, no single-task sort, offsets
are B rows regardless of corpus size.  scripts/explain_audit.py enforces
the discipline repo-wide: any executed plan containing a partition-less
WindowExec outside the bounded-input whitelist FAILS the audit.

Bucket contract: `bucket` must be a PURE column expression, integral, and
monotone non-decreasing along the (order_cols) lexicographic order — i.e.
a step function of the leading sort key.  Uniform keys (md5 slices) get
fixed-width buckets for free; arbitrarily-distributed numeric keys get
`quantile_buckets`, whose approximate boundaries only balance partitions —
exactness never depends on them because pass 1 counts exactly.

Determinism contract (r9 ADVICE item 4): the two passes are SEPARATE
Spark jobs over the same lazy lineage — pass 1's counts must describe
exactly the rows pass 2 ranks, so `df`'s lineage must be deterministic
under re-evaluation.  A nondeterministic input — `sample()` / `rand()`-
derived columns without a fixed seed, `monotonically_increasing_id()`,
a LIMIT without a total order, or source files mutated between the two
jobs — yields silently duplicated or skipped global positions (offsets
computed for one row population, ranks for another).  Callers with such
lineage must `.persist()` (and materialize) the frame before calling in
here, so both passes read one materialization; this module deliberately
does not persist internally — every repo call site is deterministic
(parquet scans + pure expressions) and an unconditional cache would tax
the common case to subsidize the broken one.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["global_row_number", "global_ntile", "quantile_buckets"]

_B = "__go_bucket"
_O = "__go_offset"


def _ranked(
    df: DataFrame, order_cols: Sequence, bucket: Column, out: str
) -> tuple[DataFrame, int]:
    """Shared two-pass core: (df + exact global 1-based `out`, total rows)."""
    b = df.withColumn(_B, bucket.cast("long"))
    # pass 1: exact per-bucket counts — a partial-agg shuffle of B rows,
    # collected driver-side (B is bounded by the bucket expression, not
    # the data), prefix-summed into offsets
    counts = sorted(
        (r[_B], r["n"])
        for r in b.groupBy(_B).agg(F.count(F.lit(1)).alias("n")).collect()
    )
    offsets, acc = [], 0
    for k, n in counts:
        offsets.append((k, acc))
        acc += n
    spark = df.sparkSession
    odf = spark.createDataFrame(offsets, f"{_B} long, {_O} long")
    # pass 2: PARTITIONED window (hash shuffle on bucket, per-bucket sort)
    w = Window.partitionBy(_B).orderBy(*order_cols)
    ranked = (
        b.join(F.broadcast(odf), _B)
        .withColumn(out, F.row_number().over(w).cast("long") + F.col(_O))
        .drop(_B, _O)
    )
    return ranked, acc


def global_row_number(
    df: DataFrame, order_cols: Sequence, bucket: Column, out: str = "pos"
) -> DataFrame:
    """df + exact 1-based `out` = row_number() OVER (ORDER BY order_cols),
    computed with partitioned windows only (see module docstring)."""
    ranked, _ = _ranked(df, order_cols, bucket, out)
    return ranked


def global_ntile(
    df: DataFrame,
    order_cols: Sequence,
    bucket: Column,
    k: int,
    out: str = "tile",
) -> DataFrame:
    """df + exact `out` = ntile(k) OVER (ORDER BY order_cols): the standard
    split (first n mod k tiles one row larger) restated as arithmetic on
    the two-pass global position, so the equi-depth assignment needs no
    total sort either."""
    ranked, n = _ranked(df, order_cols, bucket, "__go_pos")
    small = n // k
    n_big = n % k
    pivot = n_big * (small + 1)
    pos = F.col("__go_pos")
    if small == 0:
        tile = pos  # fewer rows than tiles: row i is tile i
    else:
        tile = (
            F.when(pos <= pivot, (pos - 1) / (small + 1))
            .otherwise(n_big + (pos - pivot - 1) / small)
            .cast("long")
            + 1
        )
    return ranked.withColumn(out, tile.cast("long")).drop("__go_pos")


def quantile_buckets(
    df: DataFrame, key: str, n_buckets: int = 32, accuracy: int = 10000
) -> Column:
    """A monotone step-function bucket for an arbitrarily-distributed
    numeric key: approximate-quantile boundaries (one percentile_approx
    pass) turned into `Σ [key >= boundary]`.  Approximation only affects
    partition BALANCE — global_row_number counts each bucket exactly —
    so the accuracy dial trades the pass-0 sketch size against skew."""
    qs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = df.select(
        F.percentile_approx(F.col(key).cast("double"), qs, F.lit(accuracy)).alias("b")
    ).first()["b"]
    out = F.lit(0)
    for b in sorted(set(bounds or [])):
        out = out + F.when(F.col(key).cast("double") >= F.lit(float(b)), 1).otherwise(0)
    return out.cast("long")
