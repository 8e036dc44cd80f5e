"""Data-layout operators: Z-order (Morton) clustering for multi-column
data skipping.

No reference counterpart (the reference reads pre-made TPC-H parquet,
cpp/src/lqf/data_model.cc:239-260); this is the 100-TB table-maintenance
operator a lakehouse pipeline runs so that parquet min/max row-group stats
prune on EVERY interleaved column, not just the leading sort key: rows are
globally range-partitioned and sorted by the Morton interleave of the
chosen columns, so each output file covers a small hyper-rectangle of the
key space and a filter on ANY of the columns skips most files.

Spark-first: the z-value is a pure integer column expression (div/mod bit
extraction — portable to the DuckDB oracle verbatim), the layout pass is
repartitionByRange + sortWithinPartitions — one range-exchange shuffle,
exactly what a sorted write costs; no UDF, no driver involvement beyond
Spark's own range-boundary sampling.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def z_value(cols: Sequence[Column], bits: int = 10) -> Column:
    """Morton interleave of `bits` low bits of each column (non-negative
    ints): result bit (b·n + i) = bit b of cols[i].

    JVM-side shift/mask expressions; the DuckDB oracle mirror
    (z_value_sql) uses integer div/mod — bit-identical on non-negative
    inputs.  `bits·len(cols)` must stay < 63 to fit a signed long.
    """
    n = len(cols)
    if n < 2:
        raise ValueError("z_value needs >= 2 columns")
    if bits * n >= 63:
        raise ValueError(f"{bits} bits x {n} cols overflows a signed long")
    z: Column | None = None
    for b in range(bits):
        for i, c in enumerate(cols):
            term = F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1)) * F.lit(
                2 ** (b * n + i)
            )
            z = term if z is None else z + term
    assert z is not None
    return z.cast("long")


def z_value_sql(col_exprs: Sequence[str], bits: int = 10) -> str:
    """The identical interleave as DuckDB SQL text (// integer division)."""
    n = len(col_exprs)
    terms = [
        f"((CAST({c} AS BIGINT) // {2 ** b}) % 2) * {2 ** (b * n + i)}"
        for b in range(bits)
        for i, c in enumerate(col_exprs)
    ]
    return "(" + " + ".join(terms) + ")"


def zorder_write(
    df: DataFrame,
    cols: Sequence[str],
    path: str,
    bits: int = 10,
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write `df` clustered by the Z-order of `cols`: one range exchange on
    the z-value, an in-partition sort, then a parquet write (the z column
    itself is dropped — it is derivable).  Files end up covering disjoint
    z-ranges, so min/max stats prune on every clustered column.

    Every clustered column must fit in [0, 2^bits): values past the bit
    budget would WRAP in the interleave (1024 → 0 at bits=10), silently
    destroying the z-order ↔ column-order correlation the pruning promise
    rests on — so the bounds are checked up front (one cheap aggregate)
    and violations fail loudly; pre-bucket wide columns (e.g. `col % 2^b`
    or `col div scale`) before clustering.
    """
    bounds = df.agg(
        *[F.min(c).alias(f"{c}__mn") for c in cols],
        *[F.max(c).alias(f"{c}__mx") for c in cols],
    ).first()
    for c in cols:
        lo, hi = bounds[f"{c}__mn"], bounds[f"{c}__mx"]
        if lo is not None and (lo < 0 or hi >= 2**bits):
            raise ValueError(
                f"zorder_write column {c!r} spans [{lo}, {hi}] which exceeds "
                f"the {bits}-bit budget [0, {2**bits}); pre-bucket it or raise bits"
            )
    z = z_value([F.col(c) for c in cols], bits).alias("__z")
    zdf = df.withColumn("__z", z)
    if num_files:
        zdf = zdf.repartitionByRange(num_files, "__z")
    else:
        zdf = zdf.repartitionByRange("__z")
    zdf.sortWithinPartitions("__z").drop("__z").write.mode(mode).parquet(path)
