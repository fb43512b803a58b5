"""Distributed connected components via min-label propagation.

The missing last step of a near-dup pipeline at scale: LSH gives PAIRS,
but dedup needs CLUSTERS (keep one representative per component of the
similarity graph).  Label propagation:

    label(v) <- min(label(v), min_{u ~ v} label(u))

iterated to fixpoint; converges in O(component diameter) rounds — for
near-dup graphs components are tiny cliques/chains, so 2-4 rounds.
Each round is one shuffle (edge-label join) + one groupBy(min); lineage
is truncated per round with localCheckpoint so 100-round worst cases
don't build quadratic plans.  This is the standard formulation (cf.
"large-star/small-star", Kiveris et al., CIKM'14 — worth switching to
if components with large diameter ever show up; near-dup clusters
don't have them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 25,
) -> DataFrame:
    """(src, dst) undirected edge list -> (node, component) where
    component is the minimum node id reachable from ``node``.
    Isolated nodes don't appear (callers union them back if needed)."""
    sym = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
    nodes = sym.select(F.col("a").alias("node")).distinct()
    labels = nodes.select("node", F.col("node").alias("label")).localCheckpoint(
        eager=False
    )
    for _ in range(max_iterations):
        neighbor_min = (
            sym.join(labels, sym.b == labels.node)
            .groupBy("a")
            .agg(F.min("label").alias("nl"))
        )
        proposed = (
            labels.join(neighbor_min, labels.node == F.col("a"), "left")
            .select(
                "node",
                F.col("label").alias("old"),
                F.least(
                    F.col("label"), F.coalesce(F.col("nl"), F.col("label"))
                ).alias("label"),
            )
        ).localCheckpoint()  # eager: truncate lineage each round
        changed = proposed.filter(F.col("label") != F.col("old")).limit(1).count()
        labels = proposed.select("node", "label")
        if changed == 0:
            break
    return labels.select("node", F.col("label").alias("component"))
