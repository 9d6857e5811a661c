"""Distributed connected components (Pregel-style min-label
propagation) — shared by text near-dup clustering (dedup.py) and
embedding near-dup clustering (registry: embed_dedup_clusters).

Each round every node takes the min of its own label and its
neighbors' labels: one equi-join + groupBy per round, O(component
diameter) rounds. The driver loop controls iteration count only; all
data movement is distributed joins. localCheckpoint truncates
lineage so the plan does not grow with rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 20,
) -> DataFrame:
    """(id_col, cluster_id) — cluster_id = min node id reachable via
    undirected edges; isolated nodes form singleton clusters."""
    bidir = edges.select(
        F.col(src).alias("_src"), F.col(dst).alias("_dst")
    ).unionByName(
        edges.select(F.col(dst).alias("_src"), F.col(src).alias("_dst"))
    ).localCheckpoint()
    labels = nodes.select(
        F.col(id_col), F.col(id_col).alias("cluster_id")
    ).localCheckpoint()
    for _ in range(max_iter):
        neigh = (
            bidir.join(labels, bidir["_dst"] == labels[id_col])
            .groupBy("_src")
            .agg(F.min("cluster_id").alias("_n_min"))
        )
        new_labels = (
            labels.join(neigh, labels[id_col] == neigh["_src"], "left")
            .select(
                id_col,
                F.least(
                    F.col("cluster_id"),
                    F.coalesce(F.col("_n_min"), F.col("cluster_id")),
                ).alias("cluster_id"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), id_col)
            .where("n.cluster_id <> o.cluster_id")
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels
