"""Temporal joins: as-of and bounded-range — operators the reference
lacks entirely (its only join family is equi-hash, reference:
cpp/src/lqf/join.h:129-391) but a training-data/event pipeline needs.

Scale design:

- `asof_join` avoids any per-key loop or inequality join blowup: both
  sides are unioned into one stream, shuffled ONCE on the key, and the
  match is a running `last(payload, ignorenulls)` over (ts, side) order
  — O(n log n) per key partition, state bounded by one row of payload,
  no candidate explosion.  This is the standard log-merge formulation
  (same shape Flink's temporal join and pandas.merge_asof use).
- `range_join` buckets time into `width = upper - lower` bins so every
  right row lands in exactly one bin and every left row probes at most
  two adjacent bins: the candidate set is |pairs within 2·width|, not
  |left|×|right|, and the join is a plain equi-join on (key, bin) that
  AQE can plan like any other shuffle join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts: str,
    payload: Sequence[str],
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach `payload` from the right row with the
    greatest right.ts <= left.ts (backward, inclusive) — or the smallest
    right.ts >= left.ts (forward) — within the same `on` key group.

    Right rows should be unique per (on, ts); with duplicates the
    match among equal timestamps is tie-broken arbitrarily.
    Output: all left columns + payload columns + `<ts>_matched`.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    on = list(on)
    payload = list(payload)
    left_only = [c for c in left.columns if c not in on and c != ts]
    overlap = set(left_only) & set(payload)
    if overlap:
        raise ValueError(f"payload columns collide with left columns: {overlap}")

    l_tagged = left.select(
        *on,
        F.col(ts),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in left_only],
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in payload],
        F.lit(None).cast(left.schema[ts].dataType).alias("_r_ts"),
    )
    r_tagged = right.select(
        *on,
        F.col(ts),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_only],
        *[F.col(c) for c in payload],
        F.col(ts).alias("_r_ts"),
    )
    merged = l_tagged.unionByName(r_tagged)

    # Right rows (side 0) order before left rows at equal ts, making the
    # match inclusive in both directions.
    order = (
        [F.col(ts).asc(), F.col("_side").asc()]
        if direction == "backward"
        else [F.col(ts).desc(), F.col("_side").asc()]
    )
    w = Window.partitionBy(*on).orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    out = merged.select(
        *on,
        F.col(ts),
        F.col("_side"),
        *[F.col(c) for c in left_only],
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in payload],
        F.last("_r_ts", ignorenulls=True).over(w).alias(f"{ts}_matched"),
    )
    return out.filter(F.col("_side") == 1).drop("_side")


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts: str,
    lower_us: int,
    upper_us: int,
    right_suffix: str = "_r",
) -> DataFrame:
    """All (left, right) pairs sharing the `on` key with
    right.ts ∈ [left.ts + lower_us, left.ts + upper_us] (microseconds).

    Output: all left columns + right's non-key columns suffixed.
    """
    if upper_us <= lower_us:
        raise ValueError("upper_us must be > lower_us")
    on = list(on)
    width = upper_us - lower_us

    l_us = F.unix_micros(F.col(ts))
    lo, hi = l_us + F.lit(lower_us), l_us + F.lit(upper_us)
    l_b = left.withColumn("_bin", F.explode(F.sequence(F.floor(lo / width), F.floor(hi / width))))

    r_cols = [c for c in right.columns if c not in on]
    r_renamed = right.select(
        *on, *[F.col(c).alias(c + right_suffix) for c in r_cols]
    )
    r_us = F.unix_micros(F.col(ts + right_suffix))
    r_b = r_renamed.withColumn("_bin", F.floor(r_us / width))

    cond = [F.col(f"l.{c}") == F.col(f"r.{c}") for c in on] + [
        F.col("l._bin") == F.col("r._bin")
    ]
    pairs = l_b.alias("l").join(r_b.alias("r"), cond)
    in_range = (F.unix_micros(F.col(f"r.{ts}{right_suffix}")) >= F.unix_micros(F.col(f"l.{ts}")) + lower_us) & (
        F.unix_micros(F.col(f"r.{ts}{right_suffix}")) <= F.unix_micros(F.col(f"l.{ts}")) + upper_us
    )
    keep = [F.col(f"l.{c}") for c in left.columns] + [
        F.col(f"r.{c}{right_suffix}") for c in r_cols
    ]
    return pairs.filter(in_range).select(*keep)


def interpolate_linear(
    df: DataFrame,
    key_cols: Sequence[str],
    t_col: str,
    v_col: str,
) -> DataFrame:
    """Linear-interpolation gap fill over a (possibly dense-gridded)
    series: rows where `v_col` IS NULL get
        v_prev + (v_next − v_prev) · (t − t_prev)/(t_next − t_prev)
    between the nearest non-null neighbors per key; rows outside a key's
    observed span stay NULL.  The fill(linear)/interpolate() of
    timeseries stores.

    `t_col` must be an integer-valued column (epoch seconds, bucket
    index), UNIQUE per key — the running windows order by it alone, so a
    duplicated timestamp would make neighbor selection depend on
    partition arrival order (pre-aggregate to the grid first, as
    events_interpolate does) — and `v_col` integer-valued: the
    interpolation is then ONE float expression over exact inputs,
    deterministic on any IEEE engine (+,−,×,÷ are correctly rounded;
    this is why the operator takes the integers rather than doubles).

    Scale shape: two running last/first IGNORE-NULLS windows per key —
    ONE hash shuffle on the key, per-row state.  Returns the input
    columns plus `observed` and `v_filled` (double).
    """
    wp = (
        Window.partitionBy(*key_cols)
        .orderBy(t_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = (
        Window.partitionBy(*key_cols)
        .orderBy(t_col)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    v, t = F.col(v_col), F.col(t_col)
    obs_t = F.when(v.isNotNull(), t)
    prev_v = F.last(v_col, ignorenulls=True).over(wp)
    prev_t = F.last(obs_t, ignorenulls=True).over(wp)
    next_v = F.first(v_col, ignorenulls=True).over(wn)
    next_t = F.first(obs_t, ignorenulls=True).over(wn)
    interp = prev_v.cast("double") + (next_v - prev_v).cast("double") * (
        (t - prev_t).cast("double") / (next_t - prev_t).cast("double")
    )
    return df.withColumn("observed", v.isNotNull()).withColumn(
        "v_filled",
        F.when(v.isNotNull(), v.cast("double")).otherwise(
            F.when(prev_v.isNotNull() & next_v.isNotNull(), interp)
        ),
    )
