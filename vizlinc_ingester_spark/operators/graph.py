"""Iterative graph operators (SURVEY.md §2.10 G1).

The reference's cluster merge (src/CorefBase.groovy:220-270) rewires
mention edges onto a surviving entity node per cluster. For
sort-adjacent merge edges the clusters degenerate to runs (handled in
coref.py without iteration); this module provides the *general*
connected-components fixpoint for arbitrary candidate-edge sets
(e.g. union of adjacent-close W1 edges + firstname-prefix J5 edges,
or cross-blocking LSH edges).

Algorithm: small-star / large-star style min-label propagation —
each node repeatedly adopts the smallest component id among itself
and its neighbors until no label changes. Edges are re-used across
iterations (one shuffle per join per iteration); labels are
localCheckpoint()ed every iteration to cut the lineage (otherwise the
plan doubles per iteration and the job dies long before convergence).
Converges in O(log d) iterations for diameter d; the reference's
chains are sort-adjacent so d is tiny.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 20,
) -> DataFrame:
    """edges(src, dst) -> (node, component) where component is the
    minimum node id reachable. Nodes appearing in no edge are absent
    (callers union isolated nodes back with component = own id).
    """
    sym = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
    sym = sym.filter(F.col("a") != F.col("b")).distinct().persist()
    sym.count()

    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint()
    )

    def shortcut(lbl: DataFrame) -> DataFrame:
        """Pointer doubling: component <- component(component). The
        hook step alone moves labels one hop per iteration (O(d));
        shortcutting compounds pointer depth for O(log d)."""
        ptr = lbl.select(
            F.col("node").alias("c_node"), F.col("component").alias("c_comp")
        )
        return lbl.join(ptr, lbl["component"] == ptr["c_node"], "left").select(
            "node",
            F.least(
                F.col("component"), F.coalesce(F.col("c_comp"), F.col("component"))
            ).alias("component"),
        )

    for _ in range(max_iterations):
        # hook: adopt the minimum component among neighbors
        neighbor_min = (
            sym.join(labels, sym["b"] == labels["node"])
            .groupBy(F.col("a").alias("node2"))
            .agg(F.min("component").alias("nbr_component"))
        )
        new_labels = labels.join(
            neighbor_min, labels["node"] == F.col("node2"), "left"
        ).select(
            "node",
            F.least(
                F.col("component"),
                F.coalesce(F.col("nbr_component"), F.col("component")),
            ).alias("component"),
        )
        new_labels = shortcut(shortcut(new_labels)).localCheckpoint()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break

    sym.unpersist()
    return labels


def cluster_by_edges(
    items: DataFrame,
    edges: DataFrame,
    id_col: str,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Attach a ``component`` column to ``items``: connected-component
    id over ``edges``, own id for isolated items. This is the general
    form of the reference's mergeClusters rewrite — every item in a
    component belongs to one merged entity."""
    cc = connected_components(edges, src=src, dst=dst)
    return (
        items.join(cc, items[id_col] == cc["node"], "left")
        .drop("node")
        .withColumn("component", F.coalesce(F.col("component"), F.col(id_col)))
    )
