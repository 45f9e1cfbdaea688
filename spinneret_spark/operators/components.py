"""Connected components via iterative min-label propagation
(SURVEY.md J4/A4; north rule "GraphFrames-style connected components"
— GraphFrames itself is absent in-sandbox, and at 10^12 scale the
plain-DataFrame large-star/small-star loop is the portable core of it
anyway).

Algorithm: labels start as node ids; each round every node takes the
min label over itself and its neighbors (undirected: edges are
symmetrized once up front). ``localCheckpoint()`` truncates lineage
each round (mandatory — the iterative plan otherwise grows
exponentially), and the loop stops at fixpoint (no label changed) or
``max_iter``. Convergence on any graph is bounded by the graph
diameter; alternating large-star/small-star would square that — kept
simple here because fixture diameters are small, flagged for the
cluster path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
    checkpoint_every: int = 1,
) -> DataFrame:
    """edges(src, dst) → (node, component) with component = min node
    id in the component. Nodes appear iff they touch an edge; callers
    union isolated nodes afterwards (see :func:`components_with_isolated`).
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    sym = sym.localCheckpoint()
    if sym.limit(1).count() == 0:
        # no edges → every node is its own component; skip the loop
        # (saves several driver-serial jobs on sparse corpora)
        return sym.select(
            F.col("a").alias("node"), F.col("a").alias("component")
        )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    ).localCheckpoint()

    for i in range(max_iter):
        # candidate labels: my own + min over neighbors' labels
        neighbor = (
            sym.join(labels, sym["b"] == labels["node"])
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("component").alias("nbr_min"))
        )
        updated = (
            labels.join(neighbor, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce("nbr_min", F.col("component"))
                ).alias("component"),
                (F.coalesce("nbr_min", F.col("component")) < F.col("component"))
                .alias("changed"),
            )
        )
        if (i + 1) % checkpoint_every == 0:
            updated = updated.localCheckpoint()
        n_changed = updated.filter("changed").limit(1).count()
        labels = updated.drop("changed")
        if n_changed == 0:
            break
    return labels


def components_with_isolated(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "node",
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """CC over the full node set: isolated nodes get their own id."""
    cc = connected_components(edges, src, dst, max_iter)
    return (
        nodes.select(F.col(node_col).alias("node"))
        .join(cc, "node", "left")
        .select(
            "node", F.coalesce("component", F.col("node")).alias("component")
        )
    )
