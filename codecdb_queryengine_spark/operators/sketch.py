"""Mergeable frequency sketches for corpus-scale term statistics.

The reference has no sketch/approximate structures (SURVEY.md §2.4: its
distinct count is exact); this is the driver-mandated "novel sketch"
extension.  A Count-Min sketch (Cormode & Muthukrishnan, J. Algorithms
2005) summarizes item frequencies in a fixed (depth × width) counter
matrix: update adds 1 at (d, h_d(x)) for each of `depth` hash rows; the
estimate min_d counter[d][h_d(x)] never under-counts and over-counts by
at most εN with probability 1-δ (width = e/ε, depth = ln 1/δ).

Spark-first shape: the sketch IS a (row, pos, cnt) DataFrame — built with
one explode + one counting shuffle (map-side combined, key space bounded
by depth·width regardless of corpus size), merged across corpora by
unioning and re-summing, and probed with a broadcast join.  Hashes are
md5-slice (functions/text.py convention), so DuckDB recomputes the sketch
bit-identically for the oracle gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cms_position(item: Column, row: int, width: int) -> Column:
    """Counter column for hash row `row`: first 32 bits of md5('row|item').

    Mirror SQL: ('0x' || substring(md5(concat('{row}|', item)), 1, 8))::BIGINT % width
    """
    from codecdb_queryengine_spark.functions.text import md5_slice32

    return F.pmod(md5_slice32(f"{row}|", item), F.lit(width))


def count_min_build(items: DataFrame, item_col: str, depth: int = 4, width: int = 64) -> DataFrame:
    """Build the sketch from an item stream: (row, pos, cnt).

    One pass: each item emits `depth` (row, pos) updates via a single
    array+explode (no per-row Python, no depth× re-scan), then one
    groupBy whose key space is ≤ depth·width — constant-size state and
    shuffle regardless of input size.
    """
    item = F.col(item_col)
    updates = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(d).cast("int").alias("row"),
                    cms_position(item, d, width).alias("pos"),
                )
                for d in range(depth)
            ]
        )
    ).alias("u")
    return (
        items.select(updates)
        .select("u.row", "u.pos")
        .groupBy("row", "pos")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def count_min_estimate(
    sketch: DataFrame, probes: DataFrame, item_col: str, depth: int = 4, width: int = 64
) -> DataFrame:
    """Estimate each probe item's frequency: min over rows of its counter.

    The probe side explodes to (item, row, pos) and broadcast-joins the
    sketch (≤ depth·width rows — always broadcastable); absent counters
    mean the item was never seen (estimate 0).
    """
    item = F.col(item_col)
    probe_pos = (
        probes.select(
            item,
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(d).cast("int").alias("row"),
                            cms_position(item, d, width).alias("pos"),
                        )
                        for d in range(depth)
                    ]
                )
            ).alias("u"),
        )
        .select(item_col, "u.row", "u.pos")
    )
    return (
        probe_pos.join(F.broadcast(sketch), ["row", "pos"], "left")
        .groupBy(item_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_count"))
    )


def heavy_hitters(
    items: DataFrame, item_col: str, ratio: float = 0.01, eager: bool = True
) -> DataFrame:
    """Exact frequent items (count ≥ ratio·N) WITHOUT a full-vocabulary
    shuffle — the distributed heavy-hitters pattern:

    1. candidates: each partition locally counts its items (Arrow-batched
       mapInPandas, no shuffle) and emits only those with local ratio ≥
       the global target.  Ratio pigeonhole guarantees the union is a
       SUPERSET of the true heavy hitters: a global ratio ≥ r is a
       weighted average of per-partition ratios, so at least one
       partition must reach r locally.
    2. verify: exact global counts for candidates only (semi-join the
       item stream against the distinct candidate set, then one small
       groupBy), filtered by the exact threshold count ≥ ceil(r·N).

    The result is therefore EXACT over non-NULL items (NULLs are excluded
    from both candidates and the total, matching GROUP BY ... HAVING over
    `WHERE item IS NOT NULL`); the only shuffles move candidate rows —
    O(partitions/r) keys — instead of the whole vocabulary.  The
    Misra-Gries-style bound: each partition emits < 1/r items, so the
    candidate set is ≤ partitions/r regardless of corpus size.  Nothing is
    collected driver-side: the candidate sliver persists as a DataFrame
    (distinct → broadcast semi-join) and the total N rides as a broadcast
    1-row aggregate, so the operator stays two distributed passes over the
    items at any partition count — at 1e5 partitions × r=0.01 the old
    driver collect was up to 1e7 rows; the broadcast sliver is the same
    rows but never funnels through one process's memory as Python objects.

    Threshold exactness: `count >= ceil(ratio·N)` for integer count is
    equivalent to `count·denom >= num·N` with ratio = num/denom read as
    EXACT DECIMAL (Fraction(str(ratio))) — pure BIGINT arithmetic, so a
    binary-float product like 0.02·N landing just above an integer can
    never shift the cut-off relative to a decimal-arithmetic oracle
    (`HAVING cnt >= ceil(0.02 * total)` — DuckDB decimal-exact).

    Cache lifetime is operator-owned (r4 ADVICE): with `eager=True` (the
    default) the sliver is persisted only long enough to materialize its
    two tiny consumers (the 1-row N aggregate and the candidate set, both
    eager localCheckpoints bounded by partitions/r), then unpersisted
    before returning — nothing cached leaks into library callers'
    sessions.  Trade-off (r5 review): eager mode runs two small jobs at
    call time, and localCheckpoint blocks are NOT recomputable — on a
    cluster losing an executor holding them after this returns fails the
    downstream job instead of recomputing.  Long-running cluster callers
    who prefer full lineage recoverability pass `eager=False`: the
    returned plan is then fully lazy with zero cache footprint, at the
    cost of the local-count pass running twice at materialization (three
    item scans total instead of two).
    """
    from fractions import Fraction

    import pandas as pd

    # str(ratio) recovers the user's decimal literal; Fraction of the raw
    # binary float would encode the representation error into num/denom.
    frac = Fraction(str(ratio))
    num, denom = frac.numerator, frac.denominator
    items = items.filter(F.col(item_col).isNotNull())

    def local_heavy(batches):
        counts: dict = {}
        n = 0
        for pdf in batches:
            vc = pdf[item_col].value_counts()
            n += len(pdf)
            for k, v in vc.items():
                counts[k] = counts.get(k, 0) + int(v)
        # one-count slack so float rounding of ratio·n can never drop a
        # boundary item — the exact global recount re-filters anyway; the
        # n_rows row rides along so N needs no separate pass
        out = [k for k, v in counts.items() if v >= ratio * n - 1]
        yield pd.DataFrame(
            {item_col: out + [None], "n_rows": [0] * len(out) + [n]}
        )

    item_type = items.schema[item_col].dataType.simpleString()
    local = items.mapInPandas(
        local_heavy, schema=f"{item_col} {item_type}, n_rows long"
    )  # bounded sliver; never collected
    if eager:
        local = local.persist()
    n_total = local.agg(F.sum("n_rows").alias("n_total"))
    cand = local.filter(F.col(item_col).isNotNull()).select(item_col).distinct()
    if eager:
        # Materialize both consumers off ONE persisted sliver pass, then
        # release it NOW rather than park it in the session cache until
        # someone clearCache()s (r4 ADVICE; recoverability caveat above).
        n_total = n_total.localCheckpoint(eager=True)
        cand = cand.localCheckpoint(eager=True)
        local.unpersist()
    return (
        items.join(F.broadcast(cand), item_col, "left_semi")
        .groupBy(item_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(n_total))
        .filter(F.col("cnt") * F.lit(denom) >= F.lit(num) * F.col("n_total"))
        .drop("n_total")
        .orderBy(F.col("cnt").desc(), F.col(item_col).asc())
    )


def grouped_topk(
    df: DataFrame,
    group_cols: list,
    order_col: str,
    k: int = 3,
    tie_col: str | None = None,
) -> DataFrame:
    """Exact top-k rows per group WITHOUT shuffling whole groups — the
    two-phase pattern next to heavy_hitters:

    1. local: each partition keeps its own top-k per group (Arrow-batched
       mapInPandas, no shuffle).  Superset guarantee by pigeonhole: every
       globally-top-k row lives in some partition, where at most k-1
       group rows can outrank it — so it survives that partition's local
       top-k.
    2. global: one window over the surviving ≤ k·partitions rows per
       group — not the full group — ranked by (order_col DESC, tie_col
       ASC).  `tie_col` defaults to the frame's first non-group non-order
       column; pass an id-like column explicitly for determinism.  NULL
       group keys form their own group (matching the window oracle).

    Result is EXACT when (order_col, tie_col) totally orders each group's
    rows — the same (order, tie) ranking is applied locally and globally,
    so the pigeonhole argument above holds under ties too; a plain window
    row_number is its oracle.  Shuffle volume is k·partitions rows per
    group instead of the whole group — the difference between ranking
    inside a 1e9-row group and a k·partitions sliver of it.

    NULL/NaN order or tie values rank differently in pandas (always last)
    than in the Spark window (NULL first under asc / NaN first under desc),
    a float64 pandas column cannot even distinguish NULL from NaN, and the
    Arrow round trip itself rewrites NaN to NULL — so rows whose order/tie
    value is NA never enter the pandas phase at all: they are split off
    Spark-side and unioned back in front of the global window, which
    applies the one true (Spark) ordering to the combined sliver.  The
    k·partitions shuffle bound therefore assumes NA order/tie values are
    rare; with many NA rows results stay exact but the sliver grows by
    their count.
    """
    import pandas as pd

    from pyspark.sql import Window
    from pyspark.sql import types as T

    if tie_col is None:
        candidates = [c for c in df.columns if c not in group_cols and c != order_col]
        if not candidates:
            raise ValueError(
                "grouped_topk needs a tie-break column besides the group/order "
                "columns; pass tie_col or include an id-like column"
            )
        tie_col = candidates[0]

    def _is_na(col_name: str):
        cond = F.col(col_name).isNull()
        if isinstance(df.schema[col_name].dataType, (T.DoubleType, T.FloatType)):
            cond = cond | F.isnan(F.col(col_name))
        return cond

    na_cond = _is_na(order_col) | _is_na(tie_col)
    na_rows = df.filter(na_cond)
    clean = df.filter(~na_cond)

    def local_topk(batches):
        acc = None
        for pdf in batches:
            acc = pdf if acc is None else pd.concat([acc, pdf])
            # keep the running candidate set bounded per batch; NULL group
            # keys must survive (dropna=False) to match the window oracle
            acc = (
                acc.sort_values([order_col, tie_col], ascending=[False, True])
                .groupby(group_cols, sort=False, dropna=False)
                .head(k)
            )
        if acc is not None:
            yield acc

    schema = df.schema
    cand = clean.mapInPandas(local_topk, schema=schema).unionByName(na_rows)
    w = Window.partitionBy(*group_cols).orderBy(
        F.col(order_col).desc(), F.col(tie_col).asc()
    )
    return (
        cand.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
    )
