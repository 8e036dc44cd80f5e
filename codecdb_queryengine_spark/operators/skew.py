"""Skew mitigation: salted joins and two-phase salted aggregation.

The reference never needs these (single process, shared memory — a hot key
just means one thread works longer, cpp/src/lqf/threadpool.h:62-110); on a
1000-executor shuffle a heavy-hitter key lands entire on one reducer and
becomes the job's critical path.  AQE's skew-join splitting covers
sort-merge joins at runtime; these operators are the explicit form for when
the skew is known ahead (e.g. the null-key flood of a sparse foreign key,
or a power-law group column) or the plan shape AQE won't rewrite.

- salted_join: left rows get a deterministic salt in [0, salt); the (small)
  right side replicates `salt`×.  The hot key's rows spread over `salt`
  reducers; right-side replication cost = |right|·salt, chosen when
  |right| is dimension-sized.
- salted_agg: partial-aggregate on (keys, salt), then final-aggregate on
  keys — splits a hot group's reduce work across `salt` tasks.  Only
  algebraic aggregates (sum/count/min/max) decompose this way.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt_col(df: DataFrame, salt: int) -> Column:
    """Deterministic per-row salt: hash of the full row spreads even exact
    duplicate rows of a hot key only when other columns differ; for pure
    duplicates any spread requires a nondeterministic source, which would
    break retry idempotency — so we stay deterministic."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt)).cast("int")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Equi-join with the left (large, skewed) side salted and the right
    (small) side replicated `salt` times.  Result equals
    left.join(right, on, how) row-for-row for the supported join types.

    Right/full outer variants are rejected: an unmatched right row exists
    `salt` times after replication and would be emitted once per salt value,
    duplicating the null-extended output."""
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti", "cross"}
    if how.lower().replace("_", "") not in {h.replace("_", "") for h in allowed}:
        raise ValueError(
            f"salted_join does not support how={how!r}: right-side replication "
            "duplicates unmatched right rows under right/full outer joins. "
            f"Supported: {sorted(allowed)}"
        )
    on = list(on)
    l_s = left.withColumn("_salt", _salt_col(left, salt))
    r_s = right.withColumn("_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)])))
    out = l_s.join(r_s, [*on, "_salt"], how)
    return out.drop("_salt")


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    sums: dict[str, Column] = None,
    count_alias: str | None = None,
    salt: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation: sum/count decomposed through a
    salted partial phase.

    sums: {out_name: column_expr} summed per group.
    count_alias: if set, adds a row count under that name.
    """
    keys = list(keys)
    sums = sums or {}
    salted = df.withColumn("_salt", _salt_col(df, salt))
    partial_exprs = [F.sum(expr).alias(f"_p_{name}") for name, expr in sums.items()]
    if count_alias:
        partial_exprs.append(F.count(F.lit(1)).alias("_p__cnt"))
    partial = salted.groupBy(*keys, "_salt").agg(*partial_exprs)
    final_exprs = [F.sum(f"_p_{name}").alias(name) for name in sums]
    if count_alias:
        final_exprs.append(F.sum("_p__cnt").alias(count_alias))
    return partial.groupBy(*keys).agg(*final_exprs)
