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
