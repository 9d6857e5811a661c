"""Round-5 additions: the LSH-graph keep-list chain (v2/v3/v4 on the
MinHash-banded near-dup graph — the 100 TB deployment path the R2
verdict asked for), plus this round's scale-fix laws."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aurora_cdc_demo_spark.registry import QUERIES

from .helpers import assert_matches_oracle


# -- LSH keep-list chain ----------------------------------------------------


@pytest.mark.parametrize(
    "name",
    [
        "corpus_keep_list_v2_lsh",
        "corpus_keep_list_v3_lsh",
        "corpus_keep_list_v4_lsh",
    ],
)
def test_keep_list_lsh_oracle_parity(spark, sf_dir, name):
    assert_matches_oracle(spark, name, sf_dir)


def _keep_map(spark, sf_dir, name):
    return {
        r["doc_id"]: (r["keep"], r["decision"])
        for r in QUERIES[name](spark, sf_dir).collect()
    }


def test_lsh_chain_refinement(spark, sf_dir):
    """The v(n)-refines-v(n-1) law re-pinned on the LSH chain: each
    version only REMOVES docs from the previous version's keep set
    (no resurrection), every new drop carries one of the newly added
    reason codes, and high-priority carried codes stay verbatim."""
    v1 = _keep_map(spark, sf_dir, "corpus_keep_list_lsh")
    v2 = _keep_map(spark, sf_dir, "corpus_keep_list_v2_lsh")
    v3 = _keep_map(spark, sf_dir, "corpus_keep_list_v3_lsh")
    v4 = _keep_map(spark, sf_dir, "corpus_keep_list_v4_lsh")
    assert set(v1) == set(v2) == set(v3) == set(v4)

    chain = [
        (v1, v2, {"contaminated", "repetitive"}),
        (v2, v3, {"dup_heavy", "c4_filtered"}),
        (v3, v4, {"gopher_filtered", "off_target"}),
    ]
    for prev, nxt, new_codes in chain:
        for doc_id, (keep_n, dec_n) in nxt.items():
            keep_p, dec_p = prev[doc_id]
            if keep_n:
                assert keep_p, f"doc {doc_id} resurrected"
            if keep_p and not keep_n:
                assert dec_n in new_codes, (doc_id, dec_p, dec_n)


def test_lsh_v4_agrees_with_exact_v4(spark, sf_dir):
    """The LSH chain differs from the exact chain only through
    near-dup recall: every divergent decision involves 'near_dup' on
    the exact side or the LSH side, and overall agreement stays
    high (recall >= 0.9 band of the underlying LSH pairs)."""
    exact = _keep_map(spark, sf_dir, "corpus_keep_list_v4")
    lsh = _keep_map(spark, sf_dir, "corpus_keep_list_v4_lsh")
    assert set(exact) == set(lsh)
    diverged = 0
    for doc_id, (ke, de) in exact.items():
        kl, dl = lsh[doc_id]
        if (ke, de) != (kl, dl):
            diverged += 1
            assert "near_dup" in (de, dl), (doc_id, de, dl)
    assert diverged <= max(2, len(exact) // 20), diverged


def test_lsh_v4_near_dup_gate_is_the_lsh_graph(spark, sf_dir):
    """Structural guard (the final plan is cut at the Pregel
    checkpoint, so this is pinned on results, not plan text): the
    near_dup drops of the LSH v4 chain must be EXACTLY the near_dup
    drops of the v1 LSH keep-list — i.e. v2-v4 thread the same
    LSH cluster map through, never recomputing an exact graph."""
    v1l = {
        d for d, (_, dec) in _keep_map(
            spark, sf_dir, "corpus_keep_list_lsh"
        ).items() if dec == "near_dup"
    }
    v4l = {
        d for d, (_, dec) in _keep_map(
            spark, sf_dir, "corpus_keep_list_v4_lsh"
        ).items() if dec == "near_dup"
    }
    assert v4l == v1l


# -- parameterized coarse-quantizer cell count ------------------------------


def _duck(sf_dir, sql):
    from .helpers import duck_connection

    return duck_connection(sf_dir).execute(sql).fetchdf()


def _assert_frames_equal(sdf, ddf):
    from .helpers import normalize

    import pandas as pd

    a, b = normalize(sdf), normalize(ddf)
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


@pytest.mark.parametrize("n_seeds", [8, 32])
def test_cell_count_parameterized_oracles(spark, sf_dir, n_seeds):
    """The same oracles stay green at a NON-DEFAULT cell count —
    both engine sides are generated from the same n_seeds value, so
    this pins that no operator hardcodes 16 cells anywhere in its
    algebra (the r2 verdict's scale complaint: cell-bounded is only
    scale-safe if the cell count can track corpus size)."""
    from aurora_cdc_demo_spark.operators import similarity as _sim
    from aurora_cdc_demo_spark.registry import (
        embed_diversity,
        embed_diversity_oracle_sql,
    )

    cases = [
        (
            _sim.semdedup(spark, sf_dir, n_seeds),
            _sim.semdedup_sql("duck", n_seeds),
        ),
        (
            _sim.knn_graph(spark, sf_dir, n_seeds),
            _sim.knn_graph_sql("duck", n_seeds),
        ),
        (
            _sim.kmeans_cells(spark, sf_dir, n_seeds),
            _sim.kmeans_sql("duck", n_seeds),
        ),
        (
            _sim.pagerank_knn(spark, sf_dir, n_seeds),
            _sim.pagerank_sql("duck", n_seeds),
        ),
        (
            embed_diversity(spark, sf_dir, n_seeds),
            embed_diversity_oracle_sql(n_seeds),
        ),
    ]
    for sdf, oracle in cases:
        _assert_frames_equal(sdf.toPandas(), _duck(sf_dir, oracle))


def test_cell_population_bounded(spark, sf_dir):
    """Per-cell candidate bound: the within-cell pairwise work is
    Σ cell², so cells must actually split the corpus. At every
    tested cell count the largest cell must hold well under the
    whole corpus, and raising the cell count must not concentrate
    MORE of the corpus into the largest cell."""
    from aurora_cdc_demo_spark.operators import similarity as _sim

    max_share = {}
    for n_seeds in (8, 32):
        stats = _sim.ivf_cell_stats(spark, sf_dir, n_seeds).collect()
        n_total = sum(r["n_vecs"] for r in stats)
        biggest = max(r["n_vecs"] for r in stats)
        assert len(stats) > n_seeds // 2
        assert biggest < n_total // 2, (n_seeds, biggest, n_total)
        max_share[n_seeds] = biggest
    assert max_share[32] <= max_share[8]


# -- DAU/WAU stickiness -----------------------------------------------------


def test_stickiness_oracle_parity(spark, sf_dir):
    assert_matches_oracle(spark, "events_dau_wau_stickiness", sf_dir)


def test_stickiness_laws(spark, sf_dir):
    """DAU ≤ WAU per day (the day's users are in its own trailing
    window), stickiness ≤ 10000 bp, and the dau column agrees with
    events_cumulative_users' active_users."""
    rows = QUERIES["events_dau_wau_stickiness"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["dau"] <= r["wau"]
        assert 0 < r["stickiness_bp"] <= 10000
    dau = {r["day"]: r["dau"] for r in rows}
    active = {
        r["day"]: r["active_users"]
        for r in QUERIES["events_cumulative_users"](spark, sf_dir).collect()
    }
    assert dau == active


# -- trained-quantizer ANN search -------------------------------------------


def test_kmeans_topk_oracle_parity(spark, sf_dir):
    assert_matches_oracle(spark, "ann_ivf_kmeans_topk", sf_dir)


def test_kmeans_multiprobe_oracle_parity(spark, sf_dir):
    assert_matches_oracle(spark, "ann_ivf_kmeans_multiprobe", sf_dir)


def test_kmeans_multiprobe_recall_at_least_single(spark, sf_dir):
    """Widening the probe set can only add candidates; a candidate
    that displaces a true top-k neighbor has higher cosine and is
    therefore itself in the exact top-k — so recall is monotone in
    nprobe (measured 0.86 → 0.90 at sf0.001)."""
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in QUERIES["embed_cosine_topk"](spark, sf_dir).collect()
    }
    one = {
        (r["query_id"], r["neighbor_id"])
        for r in QUERIES["ann_ivf_kmeans_topk"](spark, sf_dir).collect()
    }
    two = {
        (r["query_id"], r["neighbor_id"])
        for r in QUERIES["ann_ivf_kmeans_multiprobe"](
            spark, sf_dir
        ).collect()
    }
    assert len(exact & two) >= len(exact & one)


def test_kmeans_topk_recall_floor(spark, sf_dir):
    """Serving through the trained quantizer must preserve most of
    the exact top-k neighborhood (measured 0.86 on this corpus at
    sf0.001 and sf0.01; a broken codebook or probe falls far
    below)."""
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in QUERIES["embed_cosine_topk"](spark, sf_dir).collect()
    }
    trained = {
        (r["query_id"], r["neighbor_id"])
        for r in QUERIES["ann_ivf_kmeans_topk"](spark, sf_dir).collect()
    }
    assert len(exact & trained) / len(exact) >= 0.7


# -- two-level diversity quota ----------------------------------------------


def test_diversity_sampling_salted_prerank(spark, sf_dir):
    """Plan guard for the two-level quota: the first Window runs
    over (cell, _salt) — the salted pre-rank that keeps any single
    reducer from seeing a whole cell — and only the second, exact
    window partitions by cell alone; result stays oracle-pinned."""
    import re

    # probe the BUILDER plan — the registered query returns the
    # materialized gate map (a cached RDD scan)
    from aurora_cdc_demo_spark.registry import _embed_diversity_impl
    from aurora_cdc_demo_spark.operators import similarity as _sim

    df = _embed_diversity_impl(spark, sf_dir, _sim.N_SEEDS)
    plan = df._jdf.queryExecution().executedPlan().toString()
    windows = re.findall(r"Window \[[^\]]*row_number[^\]]*\]", plan)
    assert len(windows) >= 2
    assert any("_salt" in w for w in windows)
    assert_matches_oracle(spark, "sample_embed_diversity", sf_dir)


# -- PageRank edge materialization ------------------------------------------


def test_pagerank_iterates_over_materialized_edges(spark, sf_dir):
    """The unrolled rounds must NOT re-evaluate the KNN chain: the
    final plan scans the checkpointed edge RDD and contains no
    cell-keyed self-join (that join ran exactly once, before the
    checkpoint cut the lineage)."""
    df = QUERIES["graph_pagerank_knn"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" in plan or "LogicalRDD" in plan
    assert "cell" not in plan
    # and the result is still the oracle-pinned fixpoint
    assert_matches_oracle(spark, "graph_pagerank_knn", sf_dir)


# -- per-row salt law (operator-level; the query-level law lives in
# test_round4) -------------------------------------------------------------


def test_row_salt_whole_row_fallback(spark):
    """Without a row id column, row_salt hashes the whole row —
    distinct rows of one key must still spread across salts."""
    from aurora_cdc_demo_spark.operators.skew import row_salt

    df = spark.createDataFrame(
        [(1, i) for i in range(64)], "k int, payload int"
    )
    got = df.withColumn("_salt", row_salt(df, None, 8))
    n_salts = got.select("_salt").distinct().count()
    assert n_salts >= 4
    assert got.where("_salt < 0 OR _salt >= 8").count() == 0
