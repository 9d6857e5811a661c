"""Embedding similarity + multimodal: oracle parity + invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aurora_cdc_demo_spark.registry import QUERIES

from .helpers import assert_matches_oracle

SIM_QUERIES = [
    "embed_cosine_topk",
    "embed_near_dup",
    "embed_near_dup_lsh",
    "embed_centroids",
    "ann_ivf_topk",
    "ann_ivf_multiprobe",
    "mm_binary_meta",
    "mm_frame_sample",
]


@pytest.mark.parametrize("name", SIM_QUERIES)
def test_oracle_parity(spark, sf_dir, name):
    assert_matches_oracle(spark, name, sf_dir)


def test_topk_exactly_k_per_query(spark, sf_dir):
    topk = QUERIES["embed_cosine_topk"](spark, sf_dir)
    counts = topk.groupBy("query_id").count().collect()
    assert all(r["count"] == 5 for r in counts)
    assert len(counts) == 10


def test_topk_cosine_in_bounds(spark, sf_dir):
    topk = QUERIES["embed_cosine_topk"](spark, sf_dir)
    assert (
        topk.where((F.col("cosine") < -1.000001) | (F.col("cosine") > 1.000001)).count()
        == 0
    )


def test_ivf_recall_vs_brute_force(spark, sf_dir):
    """IVF probes one cell, so it can miss neighbors, but whatever it
    returns must be real corpus vectors ranked consistently: every
    IVF rank-1 neighbor must appear in the brute-force top-k OR have
    a lower cosine than the brute-force rank-k."""
    brute = QUERIES["embed_cosine_topk"](spark, sf_dir).toPandas()
    ivf = QUERIES["ann_ivf_topk"](spark, sf_dir).toPandas()
    kth = brute.groupby("query_id")["cosine"].min().to_dict()
    for _, row in ivf.iterrows():
        in_brute = (
            (brute["query_id"] == row["query_id"])
            & (brute["neighbor_id"] == row["neighbor_id"])
        ).any()
        assert in_brute or row["cosine"] <= kth[row["query_id"]] + 1e-9


def test_multiprobe_recall_at_least_single_probe(spark, sf_dir):
    """Probing 2 cells must recover at least as many true (brute
    force) neighbors as probing 1, for every query."""
    brute = QUERIES["embed_cosine_topk"](spark, sf_dir).toPandas()
    single = QUERIES["ann_ivf_topk"](spark, sf_dir).toPandas()
    multi = QUERIES["ann_ivf_multiprobe"](spark, sf_dir).toPandas()
    truth = set(zip(brute["query_id"], brute["neighbor_id"]))
    hits_single = sum(
        (q, n) in truth for q, n in zip(single["query_id"], single["neighbor_id"])
    )
    hits_multi = sum(
        (q, n) in truth for q, n in zip(multi["query_id"], multi["neighbor_id"])
    )
    assert hits_multi >= hits_single


def test_mm_binary_meta_deterministic(spark, sf_dir):
    a = QUERIES["mm_binary_meta"](spark, sf_dir).toPandas().sort_values("doc_id")
    b = QUERIES["mm_binary_meta"](spark, sf_dir).toPandas().sort_values("doc_id")
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


def test_near_dup_lsh_recall_and_no_false_positives(spark, sf_dir):
    """The blocked (LSH) near-dup must be a SUBSET of the exact
    all-pairs result (exact-cosine verify => no false positives) with
    high recall — measured on this data: 58/59 pairs (0.983)."""
    exact = QUERIES["embed_near_dup"](spark, sf_dir).select("vec_a", "vec_b")
    lsh = QUERIES["embed_near_dup_lsh"](spark, sf_dir).select("vec_a", "vec_b")
    t = {(r.vec_a, r.vec_b) for r in exact.collect()}
    l = {(r.vec_a, r.vec_b) for r in lsh.collect()}
    assert l <= t  # no false positives, values verified exact
    assert len(t) > 0
    assert len(l & t) / len(t) >= 0.9  # recall floor


def test_near_dup_lsh_candidate_join_is_equi_join(spark, sf_dir):
    """Scale guard: candidate generation must be a key-partitioned
    equi-join on the band bucket, never a cross product (the exact
    twin's O(n^2) join is the thing this operator exists to avoid)."""
    plan = (
        QUERIES["embed_near_dup_lsh"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_embed_dedup_clusters_lsh_close_to_allpairs(spark, sf_dir):
    """Cluster assignments from the blocked graph match the all-pairs
    graph on ~all vectors (one missed borderline edge at most can
    split a cluster; everything else must be identical)."""
    a = {r.vec_id: r.cluster_id
         for r in QUERIES["embed_dedup_clusters"](spark, sf_dir).collect()}
    b = {r.vec_id: r.cluster_id
         for r in QUERIES["embed_dedup_clusters_lsh"](spark, sf_dir).collect()}
    assert a.keys() == b.keys()
    same = sum(1 for k in a if a[k] == b[k])
    # measured: the one missed borderline edge (recall 58/59) splits
    # one cluster, relabeling 6 of 500 vectors -> 0.988 agreement
    assert same / len(a) >= 0.98


def test_sign_hamming_oracle_parity(spark, sf_dir):
    assert_matches_oracle(spark, "embed_sign_hamming_topk", sf_dir)


def test_sign_hamming_recall_and_shape(spark, sf_dir):
    """1-bit codes lose most of the vector, so this is the weakest
    rung of the quantization ladder — but a 10x-topk Hamming
    candidate pool reranked by exact cosine must still recover the
    majority of true neighbors (measured on this data: 0.68-0.70),
    and every returned neighbor's cosine is exact (rerank), so a
    returned set is always correctly ordered."""
    brute = QUERIES["embed_cosine_topk"](spark, sf_dir).toPandas()
    sign = QUERIES["embed_sign_hamming_topk"](spark, sf_dir).toPandas()
    truth = set(zip(brute["query_id"], brute["neighbor_id"]))
    hits = sum(
        (q, n) in truth for q, n in zip(sign["query_id"], sign["neighbor_id"])
    )
    assert hits / len(truth) >= 0.6
    counts = sign.groupby("query_id")["neighbor_id"].count()
    assert (counts == 5).all() and len(counts) == 10
    # rerank order: cosine non-increasing within each query
    for _, g in sign.sort_values(["query_id", "nn_rank"]).groupby("query_id"):
        assert (g["cosine"].diff().dropna() <= 1e-12).all()
