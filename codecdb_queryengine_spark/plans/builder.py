"""Plan builder: the reference's operator vocabulary as a thin fluent API.

The reference's primary entry point is a hand-assembled DAG of physical
operators (ExecutionGraph, reference: cpp/src/lqf/parallel.cc:29-48; e.g.
Q3's filter→semijoin→hashjoin→agg→top10, cpp/src/lqf/tpch/query3.cc:33-99).
This builder preserves that "engine as a library" vocabulary — scan /
filter / semi-join / join / agg / sort / topk / mat — while compiling every
step to DataFrame operations, so Catalyst still performs the global
optimization the reference does by hand.

Physical idioms carried over deliberately:
- `semi_join` / `anti_join`  — the reference's FilterJoin fact-pruning
  (cpp/src/lqf/join.h:179-199): explicit left-semi before wide joins.
- `join(..., broadcast=True)` — the reference always hashes the small side
  (cpp/src/lqf/join.cc:221-229); broadcast() makes that explicit for dims.
- `mat()` — FilterMat/HashMat shared-subplan reuse (cpp/src/lqf/mat.h:19-55):
  Spark does not auto-cache shared subtrees, so the builder exposes persist.
- `topk` — TopN's bounded heap (cpp/src/lqf/sort.h:95-112) maps to
  orderBy+limit, which Spark plans as TakeOrderedAndProject.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class Plan:
    """Immutable-ish fluent wrapper; every method returns a new Plan.

    Lifecycle: `mat()` persists are tracked through the chain (including
    across joined Plans) and owned by the final Plan — call `release()`
    after the result is materialized, or use `collect()` which does both.
    `done()` hands back the bare DataFrame and leaves the persists live
    (they are the point of mat() — the reuse happens at execution); the
    caller then owns the release.
    """

    def __init__(self, df: DataFrame, mats: list[DataFrame] | None = None):
        self.df = df
        self._mats: list[DataFrame] = list(mats) if mats else []

    def _next(self, df: DataFrame, *others: "Plan | DataFrame") -> "Plan":
        """Successor Plan inheriting this chain's persists (plus any from
        Plans joined in)."""
        mats = list(self._mats)
        for o in others:
            if isinstance(o, Plan):
                mats.extend(o._mats)
        return Plan(df, mats)

    # --- sources ----------------------------------------------------------
    @staticmethod
    def scan(df: DataFrame, columns: Iterable[str] | None = None) -> "Plan":
        """ParquetTable::Open analog — optional explicit projection
        (reference: cpp/src/lqf/data_model.h:482-484); Catalyst prunes
        anyway, the explicit form documents intent."""
        return Plan(df.select(*columns) if columns else df)

    # --- filters ----------------------------------------------------------
    def filter(self, *preds: Column) -> "Plan":
        """ColFilter: conjunction of predicates (cpp/src/lqf/filter.h:304)."""
        out = self.df
        for p in preds:
            out = out.filter(p)
        return self._next(out)

    def filter_union(self, *preds: Column) -> "Plan":
        """FilterUnion: OR of predicate blocks over the same base table
        (cpp/src/lqf/union.h:14-35, TPC-H Q19)."""
        combined = None
        for p in preds:
            combined = p if combined is None else (combined | p)
        return self._next(self.df.filter(combined))

    # --- joins ------------------------------------------------------------
    def semi_join(self, right: "Plan | DataFrame", on, broadcast: bool = True) -> "Plan":
        """FilterJoin: prune with the (small) right side's keys
        (cpp/src/lqf/join.h:179-199)."""
        r = right.df if isinstance(right, Plan) else right
        r = F.broadcast(r) if broadcast else r
        return self._next(self.df.join(r, on, "left_semi"), right)

    def anti_join(self, right: "Plan | DataFrame", on, broadcast: bool = True) -> "Plan":
        """FilterJoin::useAnti (cpp/src/lqf/join.h:190-199)."""
        r = right.df if isinstance(right, Plan) else right
        r = F.broadcast(r) if broadcast else r
        return self._next(self.df.join(r, on, "left_anti"), right)

    def join(
        self,
        right: "Plan | DataFrame",
        on,
        how: str = "inner",
        broadcast: bool = False,
    ) -> "Plan":
        """HashJoin / HashMultiJoin / outer variant (cpp/src/lqf/join.h:129-177);
        broadcast=True = the reference's build-small-side convention."""
        r = right.df if isinstance(right, Plan) else right
        r = F.broadcast(r) if broadcast else r
        return self._next(self.df.join(r, on, how), right)

    def exist_join(self, probe: "Plan | DataFrame", on, broadcast: bool = False) -> "Plan":
        """HashExistJoin: keep THIS (build) side's rows having ≥1 probe
        match (cpp/src/lqf/join.h:216-250, TPC-H Q21) — a semi join with
        the reference's build/probe sides made explicit."""
        p = probe.df if isinstance(probe, Plan) else probe
        p = F.broadcast(p) if broadcast else p
        return self._next(self.df.join(p, on, "left_semi"), probe)

    def not_exist_join(self, probe: "Plan | DataFrame", on, broadcast: bool = False) -> "Plan":
        """HashNotExistJoin (cpp/src/lqf/join.h:252-265, TPC-H Q22)."""
        p = probe.df if isinstance(probe, Plan) else probe
        p = F.broadcast(p) if broadcast else p
        return self._next(self.df.join(p, on, "left_anti"), probe)

    # --- aggregation ------------------------------------------------------
    def agg(self, *exprs: Column, by: Iterable[str | Column] = ()) -> "Plan":
        """SimpleAgg (no keys) / HashAgg (cpp/src/lqf/agg.h:475-532)."""
        by = list(by)
        if by:
            return self._next(self.df.groupBy(*by).agg(*exprs))
        return self._next(self.df.agg(*exprs))

    def having(self, pred: Column) -> "Plan":
        """Agg dump predicate (cpp/src/lqf/agg.h:448,472)."""
        return self._next(self.df.filter(pred))

    def arg_max(self, keys: Iterable[str], of: Column) -> "Plan":
        """RecordingMax: ALL rows achieving the per-group maximum —
        the reference keeps the full tie set (cpp/src/lqf/agg.h:346-427,
        TPC-H Q15's max-revenue suppliers), so this is rank()==1, not
        max_by (which keeps one arbitrary row)."""
        from pyspark.sql import Window

        w = Window.partitionBy(*list(keys)).orderBy(of.desc())
        return self._next(
            self.df.withColumn("_rk", F.rank().over(w)).filter(F.col("_rk") == 1).drop("_rk")
        )

    def arg_min(self, keys: Iterable[str], of: Column) -> "Plan":
        """RecordingMin (cpp/src/lqf/agg.h:346-427, TPC-H Q2)."""
        from pyspark.sql import Window

        w = Window.partitionBy(*list(keys)).orderBy(of.asc())
        return self._next(
            self.df.withColumn("_rk", F.rank().over(w)).filter(F.col("_rk") == 1).drop("_rk")
        )

    def key_find(self, pred: Column, key_col: str):
        """KeyFinder scalar probe: the key of the single row matching pred,
        consumed while building the enclosing plan (cpp/src/lqf/filter.h:
        403-416; Q8 binds a nation key into a later lambda).  Forces a tiny
        job — use only for dimension lookups."""
        row = self.df.filter(pred).select(key_col).first()
        return None if row is None else row[0]

    # --- order / limit ----------------------------------------------------
    def sort(self, *cols: Column) -> "Plan":
        """SmallSort/SnapshotSort (cpp/src/lqf/sort.h:63-93)."""
        return self._next(self.df.orderBy(*cols))

    def topk(self, k: int, *cols: Column) -> "Plan":
        """TopN bounded heap (cpp/src/lqf/sort.h:95-112) →
        TakeOrderedAndProject."""
        return self._next(self.df.orderBy(*cols).limit(k))

    # --- set operations -----------------------------------------------------
    # The reference only has bitmap FilterUnion/FilterAnd over one base table
    # (cpp/src/lqf/union.h:14-35); these expose the general table-level forms
    # Spark supports natively (SURVEY.md §2.6).
    def union_all(self, other: "Plan | DataFrame") -> "Plan":
        o = other.df if isinstance(other, Plan) else other
        return self._next(self.df.unionByName(o), other)

    def intersect(self, other: "Plan | DataFrame") -> "Plan":
        o = other.df if isinstance(other, Plan) else other
        return self._next(self.df.intersect(o), other)

    def except_all(self, other: "Plan | DataFrame") -> "Plan":
        o = other.df if isinstance(other, Plan) else other
        return self._next(self.df.exceptAll(o), other)

    # --- materialization --------------------------------------------------
    def mat(self) -> "Plan":
        """FilterMat/HashMat shared-subplan reuse (cpp/src/lqf/mat.h:19-55).

        The persisted frame is tracked by the chain: finish with
        `collect()` (auto-release) or call `release()` after the result
        is materialized.  `done()` alone leaves the persist live — the
        caller owns it from there (bench/check call clearCache()).
        """
        persisted = self.df.persist()
        nxt = self._next(persisted)
        nxt._mats.append(persisted)
        return nxt

    def release(self) -> "Plan":
        """Unpersist every mat() in this chain (safe to call repeatedly —
        and AFTER the result has been materialized; unpersisting first
        would silently discard the shared-subplan reuse)."""
        for m in self._mats:
            m.unpersist()
        self._mats.clear()
        return self

    def collect(self):
        """Materialize the result, then release this chain's mats —
        the unpersist-on-collect lifecycle for one-shot plan execution."""
        try:
            return self.df.collect()
        finally:
            self.release()

    def select(self, *cols) -> "Plan":
        return self._next(self.df.select(*cols))

    def done(self) -> DataFrame:
        return self.df
