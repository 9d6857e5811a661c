"""Distributed connected components (Pregel-style min-label
propagation) — shared by text near-dup clustering (dedup.py) and
embedding near-dup clustering (registry: embed_dedup_clusters).

Each round every node takes the min of its own label and its
neighbors' labels: one equi-join + groupBy per round, O(component
diameter) rounds. The driver loop controls iteration count only; all
data movement is distributed joins. Checkpointing truncates lineage
so the plan does not grow with rounds; two modes:

- "local": localCheckpoint — executor-memory blocks, no replication.
  Fast, fine on local[k], but a SINGLE executor loss after round k
  aborts the whole job on a real cluster.
- "reliable": checkpoint() against a checkpoint directory (HDFS/S3 in
  production) — survives executor loss; this is the 1000-executor
  deployment mode.
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
    checkpoint_mode: str = "local",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """(id_col, cluster_id) — cluster_id = min node id reachable via
    undirected edges; isolated nodes form singleton clusters.

    checkpoint_mode: "local" (default, test/single-node) or
    "reliable" (production — replicated checkpoint files under
    ``checkpoint_dir``, which is set on the SparkContext if given and
    must already be set otherwise).
    """
    if checkpoint_mode == "reliable":
        sc = nodes.sparkSession.sparkContext
        if checkpoint_dir is not None:
            sc.setCheckpointDir(checkpoint_dir)
        elif sc._jsc.sc().checkpointDir().isEmpty():
            raise ValueError(
                "checkpoint_mode='reliable' needs checkpoint_dir (or a "
                "checkpoint dir already set on the SparkContext)"
            )

        def _ckpt(df: DataFrame) -> DataFrame:
            return df.checkpoint(eager=True)

    elif checkpoint_mode == "local":

        def _ckpt(df: DataFrame) -> DataFrame:
            return df.localCheckpoint()

    else:
        raise ValueError(f"unknown checkpoint_mode: {checkpoint_mode!r}")

    # materialize the incoming edge list ONCE before the undirected
    # union references it twice (forward + reversed arms are separate
    # subtrees — without this the caller's whole candidate-generation
    # chain executes twice inside the bidir build; measured ~4 s off
    # embed_dedup_clusters_lsh at sf0.1)
    e1 = _ckpt(
        edges.select(F.col(src).alias("_src"), F.col(dst).alias("_dst"))
    )
    bidir = _ckpt(
        e1.unionByName(
            e1.select(F.col("_dst").alias("_src"), F.col("_src").alias("_dst"))
        )
    )
    labels = _ckpt(nodes.select(F.col(id_col), F.col(id_col).alias("cluster_id")))
    for _ in range(max_iter):
        # LABEL-SPACE CONTRACTION (r9): map the fixed edge list
        # through the current labeling and keep only cross-label
        # edges. The node-space neighbor-min + halving loop this
        # replaces converged O(diameter/2) on chain-shaped graphs —
        # observed crawling at ~1 merge/round past max_iter on the
        # sf0.1 mutual-KNN graph, SILENTLY returning a split
        # component. Contracting first makes every round merge
        # whole label groups (a path of labels halves per round),
        # and the exit test is exact: no cross-label edge left IS
        # connectivity-fixpoint, so a non-converged exit can only
        # be max_iter, which now raises instead of lying.
        le = _ckpt(
            bidir.join(labels, bidir["_src"] == labels[id_col])
            .select(F.col("cluster_id").alias("_la"), "_dst")
            .join(labels, F.col("_dst") == labels[id_col])
            .select("_la", F.col("cluster_id").alias("_lb"))
            .where("_la <> _lb")
            .distinct()
        )
        # per-label min over contracted neighbors (strict improvers)
        lmin = le.groupBy("_la").agg(F.min("_lb").alias("_m")).where(
            "_m < _la"
        )
        n_merge = lmin.count()
        if n_merge == 0:
            break
        relabeled = _ckpt(
            labels.join(
                lmin, labels["cluster_id"] == lmin["_la"], "left"
            ).select(
                id_col,
                F.coalesce(F.col("_m"), F.col("cluster_id")).alias(
                    "cluster_id"
                ),
            )
        )
        # path-halving on the label map (label <- label(label)):
        # composes the per-round merges so label chains collapse
        # geometrically
        lmap = relabeled.select(
            F.col(id_col).alias("_k"), F.col("cluster_id").alias("_kl")
        )
        labels = _ckpt(
            relabeled.join(
                lmap, relabeled["cluster_id"] == lmap["_k"], "left"
            ).select(
                id_col,
                F.least(
                    F.col("cluster_id"),
                    F.coalesce(F.col("_kl"), F.col("cluster_id")),
                ).alias("cluster_id"),
            )
        )
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )
    return labels
