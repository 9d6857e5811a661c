"""Round-8 additions: embed_keep_list gate materialization (r3
verdict item 1), Gopher duplicate-line/paragraph battery, line-level
corpus dedup, multi-round BPE, plan-driven incremental snapshot."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aurora_cdc_demo_spark.registry import QUERIES


def test_embed_keep_list_gates_materialized(spark, sf_dir):
    """The three gate maps are checkpointed before the joins: the
    final plan joins three LogicalRDD scans plus ONE parquet scan of
    embeddings — no Generate (the kmeans/LSH explode chains) may
    survive into the composed plan (r3 verdict: the re-derived
    subtrees doubled the query's cost)."""
    df = QUERIES["embed_keep_list"](spark, sf_dir)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "Generate" not in plan
    assert plan.count("LogicalRDD") == 3
    # exactly one parquet relation: the vec_id spine
    assert plan.count("parquet") == 1


def test_embed_keep_list_matches_unmaterialized_composition(spark, sf_dir):
    """Materialization must not change answers: rebuild the same
    composition without checkpoints and compare exactly."""
    from aurora_cdc_demo_spark.registry import embed_diversity

    kl = QUERIES["embed_keep_list"](spark, sf_dir)
    cl = QUERIES["embed_dedup_clusters_lsh"](spark, sf_dir)
    sd = QUERIES["semdedup_cells"](spark, sf_dir).select(
        "vec_id", F.col("keep").alias("sem_keep_i")
    )
    dv = embed_diversity(spark, sf_dir).select(
        "vec_id", F.lit(1).alias("dv_hit")
    )
    j = cl.join(sd, "vec_id").join(dv, "vec_id", "left")
    ref = {
        r["vec_id"]: (
            r["cluster_id"],
            r["sem_keep_i"] == 1,
            r["dv_hit"] is not None,
        )
        for r in j.collect()
    }
    got = {
        r["vec_id"]: (r["cluster_id"], r["sem_keep"], r["in_quota"])
        for r in kl.collect()
    }
    assert got == ref
