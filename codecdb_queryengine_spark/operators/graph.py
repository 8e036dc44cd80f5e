"""Distributed graph primitives for the dedup pipeline.

The reference has no graph operators (SURVEY.md §2 — its only "graph" is
the query DAG itself); connected components is the driver-mandated
extension that turns near-duplicate PAIRS (dedup.py) into duplicate
CLUSTERS, the form a 100-TB dedup job actually consumes (keep one doc per
component, drop the rest).

Algorithm: iterative min-label propagation (each node adopts the smallest
label among itself and its neighbors until fixpoint), the classic
MapReduce-CC formulation (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14).  Near-dup components are tiny
(near-cliques of copies, diameter ≤ 3-4 in practice), so the loop
converges in a handful of rounds; each round is one shuffle-join keyed on
node id.  For adversarial long-chain graphs the same paper's
large-star/small-star variant converges in O(log² n) rounds — not needed
for dedup workloads, noted here as the scale escape hatch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str,
    dst: str,
    max_iter: int = 20,
) -> DataFrame:
    """(node, component) for every node in `edges`, component = min node id
    reachable — deterministic, so oracle-comparable.

    Scale design per round: `labels` is one row per node and `nbr` one row
    per directed edge; both shuffles key on node id (uniform — ids, not
    content), with map-side partial min.  Lineage is truncated with
    localCheckpoint every round: without it the plan doubles per iteration
    and Catalyst analysis time dominates past ~8 rounds (and at cluster
    scale the recursive re-computation on task retry would be quadratic).
    Convergence is detected by an aggregate (any label changed?) — one
    lightweight job per round on the already-checkpointed labels.
    """
    und = (
        edges.select(F.col(src).alias("n"), F.col(dst).alias("m"))
        .union(edges.select(F.col(dst).alias("n"), F.col(src).alias("m")))
        .distinct()
    )
    und = und.localCheckpoint(eager=True)
    labels = (
        und.select("n").distinct().withColumn("comp", F.col("n"))
    ).localCheckpoint(eager=True)

    for _ in range(max_iter):
        nbr_min = (
            und.join(labels, on="n")
            .select(F.col("m").alias("n"), "comp")
            .groupBy("n")
            .agg(F.min("comp").alias("nbr_comp"))
        )
        new_labels = (
            labels.join(nbr_min, on="n", how="left")
            .select(
                "n",
                F.least(F.col("comp"), F.coalesce(F.col("nbr_comp"), F.col("comp"))).alias(
                    "comp"
                ),
                (F.col("nbr_comp") < F.col("comp")).alias("_changed"),
            )
        ).localCheckpoint(eager=True)
        changed = new_labels.agg(F.sum(F.col("_changed").cast("int")).alias("c")).first()["c"]
        labels = new_labels.drop("_changed")
        if not changed:
            break
    else:
        # Exhausting the loop without a no-change round means some
        # component's diameter exceeds max_iter and its labels are still
        # intermediate — silently returning them would split one real
        # component into several.  Fail loudly; the caller can raise
        # max_iter or switch to the large-star/small-star variant.
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds: "
            "a component's diameter exceeds max_iter (labels would be wrong)"
        )
    return labels.select(F.col("n").alias("node"), F.col("comp").alias("component"))
