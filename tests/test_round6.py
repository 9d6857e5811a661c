"""Round-6 additions: KNN-graph community structure (label
propagation, triangles/clustering), the 1-bit quantization ANN rung,
and this round's curation/sampling operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aurora_cdc_demo_spark.operators.similarity import KNN_K
from aurora_cdc_demo_spark.registry import QUERIES

from .helpers import assert_matches_oracle


@pytest.mark.parametrize(
    "name",
    ["graph_label_prop_knn", "graph_triangle_knn"],
)
def test_graph_oracle_parity(spark, sf_dir, name):
    assert_matches_oracle(spark, name, sf_dir)


def test_label_prop_is_partition(spark, sf_dir):
    """LPA output is a valid partition: one label per vector, every
    label is itself a member's vec_id (labels start as identities and
    propagate — a label can only spread from a node that carries it),
    and community sizes are consistent with membership counts."""
    lp = QUERIES["graph_label_prop_knn"](spark, sf_dir).toPandas()
    assert lp["vec_id"].is_unique
    ids = set(lp["vec_id"])
    assert set(lp["community_id"]) <= ids
    sizes = lp.groupby("community_id")["vec_id"].count()
    declared = lp.drop_duplicates("community_id").set_index("community_id")[
        "community_size"
    ]
    assert (sizes == declared.reindex(sizes.index)).all()
    # propagation happened: fewer communities than nodes
    assert lp["community_id"].nunique() < len(lp)


def test_triangle_conservation_and_bounds(spark, sf_dir):
    """Per-corner triangle credits must sum to 3x the number of
    distinct triangles (each triangle has exactly 3 corners);
    clustering coefficient is a proper ratio (<= 10000 bp). KNN
    OUT-degree is K-bounded but IN-degree is not (hub vectors) — the
    degree histogram itself documents the hubness the degree-ordered
    orientation exists to absorb."""
    t = QUERIES["graph_triangle_knn"](spark, sf_dir).toPandas()
    assert t["triangles"].sum() % 3 == 0
    assert (t["clustering_bp"] <= 10000).all()
    assert (t["clustering_bp"] >= 0).all()
    assert (t["degree"] >= 1).all()
    # hubness is real on this data: some node's undirected degree
    # exceeds 2*KNN_K (the reason for degree-ordered orientation)
    assert t["degree"].max() > 2 * KNN_K


def test_graph_queries_share_edge_checkpoint(spark, sf_dir):
    """Scale guard: the iteration plans must run over the
    materialized (checkpointed) edge list — no CartesianProduct and
    no re-derivation of the KNN cell join inside the iteration SQL
    (the checkpoint cuts the lineage, so the executed plan of the
    final query contains scan-of-RDD, not the cosine cross join)."""
    for name in ["graph_label_prop_knn", "graph_triangle_knn"]:
        df = QUERIES[name](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        # the KNN chain's seed cross join must NOT appear in the
        # post-checkpoint iteration plan
        assert "BroadcastNestedLoopJoin" not in plan


def test_tombstone_gc_oracle_parity(spark, sf_dir):
    assert_matches_oracle(spark, "cdc_tombstone_gc", sf_dir)


def test_tombstone_gc_retention_partition(spark, sf_dir):
    """GC must partition keys exactly: a key is purged iff its final
    operation is DELETE and that delete is older than the retention
    watermark; every surviving key keeps its FULL history (version
    counts unchanged vs cdc_scd2_history)."""
    from aurora_cdc_demo_spark.registry import _TOMBSTONE_RETENTION_HOURS

    full = QUERIES["cdc_scd2_history"](spark, sf_dir).toPandas()
    kept = QUERIES["cdc_tombstone_gc"](spark, sf_dir).toPandas()
    full_sorted = full.sort_values(["key_id", "valid_from", "seq"])
    last = full_sorted.groupby("key_id").tail(1)
    maxts = full["valid_from"].max()
    cutoff = maxts - __import__("pandas").Timedelta(
        hours=_TOMBSTONE_RETENTION_HOURS
    )
    expected_purged = set(
        last[(last["operation"] == "DELETE") & (last["valid_from"] <= cutoff)][
            "key_id"
        ]
    )
    assert set(full["key_id"]) - set(kept["key_id"]) == expected_purged
    assert len(expected_purged) > 0  # retention actually bites here
    counts_full = full.groupby("key_id")["seq"].count()
    counts_kept = kept.groupby("key_id")["seq"].count()
    surv = counts_kept.index
    assert (counts_full.loc[surv] == counts_kept).all()


def test_unimax_oracle_parity(spark, sf_dir):
    assert_matches_oracle(spark, "sample_unimax_budget", sf_dir)


def test_unimax_waterfilling_laws(spark, sf_dir):
    """UniMax allocation laws: no language over-allocated, capped
    languages taken whole, budget never exceeded (and exactly
    exhausted when any language is uncapped, up to floor-div
    remainder < n_uncapped), and the 3-round unroll is a FIXPOINT on
    this data (a 4th round changes nothing)."""
    from aurora_cdc_demo_spark.operators.sampling import unimax_sql
    from aurora_cdc_demo_spark.tables import load_table

    df = QUERIES["sample_unimax_budget"](spark, sf_dir).toPandas()
    assert (df["allocation"] <= df["n_docs"]).all()
    capped = df[df["is_capped"]]
    assert (capped["allocation"] == capped["n_docs"]).all()
    budget = 4 * df["n_docs"].sum() // 5
    assert df["allocation"].sum() <= budget
    n_open = (~df["is_capped"]).sum()
    if n_open:
        assert budget - df["allocation"].sum() < n_open
    # fixpoint certificate: one more round is identical
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    df4 = (
        spark.sql(unimax_sql("spark", rounds=4))
        .toPandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    df3 = df.sort_values("lang").reset_index(drop=True)
    assert df3.equals(df4)


def test_bm25_oracle_parity(spark, sf_dir):
    assert_matches_oracle(spark, "text_bm25_topk", sf_dir)


def test_bm25_rare_term_dominates_and_plan(spark, sf_dir):
    """Retrieval sanity: the rare query term ('dup', df~5% of docs)
    must out-rank common-term-only matches — the rank-1 document
    contains 'dup'. Plan guard: the top-N must execute as
    TakeOrderedAndProject (distributed partial top-k), never a
    single-partition global window over the full candidate set."""
    df = QUERIES["text_bm25_topk"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    top = df.toPandas().sort_values("bm25_rank")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").toPandas()
    rank1_text = docs.set_index("doc_id").loc[top.iloc[0]["doc_id"], "text"]
    assert "dup" in rank1_text.split()
    assert len(top) == 10 and top["score_e4"].is_monotonic_decreasing


def test_decontaminate_lsh_oracle_parity(spark, sf_dir):
    assert_matches_oracle(spark, "corpus_decontaminate_lsh", sf_dir)


def test_decontaminate_lsh_consistent_with_dedup_pairs(spark, sf_dir):
    """Same threshold, same sketch: the contamination report must be
    exactly the bench-side slice of the dedup pair list — every
    (bench < 20 <= train) LSH near-dup pair contributes one hit."""
    from aurora_cdc_demo_spark.registry import _DECON_BENCH_MAX_ID

    pairs = QUERIES["dedup_minhash_lsh"](spark, sf_dir).toPandas()
    rep = QUERIES["corpus_decontaminate_lsh"](spark, sf_dir).toPandas()
    cross = pairs[
        (pairs["doc_a"] < _DECON_BENCH_MAX_ID)
        & (pairs["doc_b"] >= _DECON_BENCH_MAX_ID)
    ]
    expected = cross.groupby("doc_b").agg(
        n=("doc_a", "count"), mx=("jaccard_bp", "max")
    )
    got = rep.set_index("doc_id").sort_index()
    assert set(got.index) == set(expected.index)
    assert (got["n_bench_hits"] == expected["n"].sort_index()).all()
    assert (got["max_jaccard_bp"] == expected["mx"].sort_index()).all()


def test_importance_hash_oracle_parity(spark, sf_dir):
    assert_matches_oracle(spark, "sample_importance_hash", sf_dir)


def test_importance_hash_budget_and_bias(spark, sf_dir):
    """Weighted acceptance laws: the sample is a subset of the
    weighted corpus with size binomially around the 20% budget, and
    selection is biased TOWARD weight — the selected docs' mean
    importance weight exceeds the corpus mean (that bias is the
    operator's purpose), while every selected doc satisfies the
    acceptance inequality exactly."""
    iw = QUERIES["sample_importance_weights"](spark, sf_dir).toPandas()
    sel = QUERIES["sample_importance_hash"](spark, sf_dir).toPandas()
    n, b = len(iw), len(iw) // 5
    assert set(sel["doc_id"]) <= set(iw["doc_id"])
    assert 0.5 * b <= len(sel) <= 1.6 * b  # binomial envelope
    assert sel["mean_ratio_ppm"].mean() > iw["mean_ratio_ppm"].mean()
    sw = iw["mean_ratio_ppm"].sum()
    for _, r in sel.iterrows():
        assert r["u_ppm"] * sw < b * r["mean_ratio_ppm"] * 1_000_000


def test_phash_oracle_parity(spark, sf_dir):
    assert_matches_oracle(spark, "mm_phash_near_dup", sf_dir)


def test_phash_symmetric_floor_and_duplicate_detection(spark, sf_dir):
    """(a) Hamming is a metric: each reported nearest distance is
    achieved by a real candidate pair, so if a's NN is b at d, then
    b's NN distance is <= d. (b) A byte-identical payload pair MUST
    be reported at hamming 0 (pigeonhole guarantee at distance 0) —
    constructed duplicate through the same SQL on a temp view."""
    rep = QUERIES["mm_phash_near_dup"](spark, sf_dir).toPandas()
    d = rep.set_index("doc_id")["hamming"].to_dict()
    nn = rep.set_index("doc_id")["nn_doc_id"].to_dict()
    for a, b in nn.items():
        if b in d:
            assert d[b] <= d[a]
    # constructed duplicate payloads
    from aurora_cdc_demo_spark.operators.multimodal import phash_near_dup_sql

    docs = spark.createDataFrame(
        [(1, "x" * 40 + "y" * 40), (2, "x" * 40 + "y" * 40), (3, "z" * 80)],
        "doc_id long, text string",
    )
    docs.createOrReplaceTempView("documents")
    out = spark.sql(phash_near_dup_sql("spark")).toPandas()
    pair = out[out["doc_id"] == 1]
    assert len(pair) == 1 and pair.iloc[0]["nn_doc_id"] == 2
    assert pair.iloc[0]["hamming"] == 0


def test_link_pred_oracle_parity(spark, sf_dir):
    assert_matches_oracle(spark, "graph_link_pred_knn", sf_dir)


def test_link_pred_laws(spark, sf_dir):
    """(a) predicted pairs are genuinely NON-adjacent (disjoint from
    the edge list); (b) Jaccard is a proper ratio and common <=
    min(deg) holds for every pair; (c) the witness cap is inactive on
    this data (max degree < cap), so the counts are exact here — the
    cap exists for hub fan-out at scale."""
    from aurora_cdc_demo_spark.operators.similarity import LP_WITNESS_CAP

    lp = QUERIES["graph_link_pred_knn"](spark, sf_dir).toPandas()
    tri = QUERIES["graph_triangle_knn"](spark, sf_dir).toPandas()
    deg = tri.set_index("vec_id")["degree"].to_dict()
    assert (lp["jaccard_bp"] <= 10000).all() and (lp["jaccard_bp"] > 0).all()
    for _, r in lp.iterrows():
        assert r["common_neighbors"] <= min(deg[r["vec_a"]], deg[r["vec_b"]])
    assert max(deg.values()) <= LP_WITNESS_CAP
    # non-adjacency: no predicted pair may appear in the KNN edges
    # (r9: the family rides the banded-LSH edge builder)
    knn = QUERIES["ann_knn_graph_lsh"](spark, sf_dir).toPandas()
    edges = set(zip(knn["vec_id"], knn["neighbor_id"])) | set(
        zip(knn["neighbor_id"], knn["vec_id"])
    )
    assert all((a, b) not in edges for a, b in zip(lp["vec_a"], lp["vec_b"]))


def test_markov_oracle_parity(spark, sf_dir):
    assert_matches_oracle(spark, "events_markov_stationary", sf_dir)


def test_markov_mass_conservation(spark, sf_dir):
    """Power-iteration mass law: with every event type having
    outgoing transitions (verified), total stationary mass equals the
    1e9 start mass minus only floor-division loss — bounded by
    (#types + #matrix-cells) per round; and the distribution is
    non-degenerate (no type holds all the mass)."""
    m = QUERIES["events_markov_stationary"](spark, sf_dir).toPandas()
    assert (m["n_outgoing"] > 0).all()
    k = len(m)
    total = m["stationary_e9"].sum()
    loss_bound = 3 * (k + k * k) + k  # 3 rounds + initial split
    assert 1_000_000_000 - loss_bound <= total <= 1_000_000_000
    assert m["stationary_e9"].max() < 1_000_000_000


def test_kcenter_oracle_parity(spark, sf_dir):
    assert_matches_oracle(spark, "sample_kcenter_greedy", sf_dir)


def test_kcenter_radius_monotone_and_distinct(spark, sf_dir):
    """Adding a center can only shrink the covering radius (the
    min-dist fold is pointwise <=), centers are distinct, and the
    seed is the min vec_id."""
    kc = (
        QUERIES["sample_kcenter_greedy"](spark, sf_dir)
        .toPandas()
        .sort_values("sel_round")
    )
    assert kc["covering_radius_e6"].is_monotonic_decreasing
    assert kc["center_id"].is_unique
    assert kc.iloc[0]["center_id"] == 0
    assert len(kc) == 4


def test_pruning_report_oracle_parity(spark, sf_dir):
    assert_matches_oracle(spark, "events_scan_pruning_report", sf_dir)


def test_pruning_report_correct_and_effective(spark, sf_dir):
    """The would_scan verdict must be exactly right: re-running the
    probe predicate per partition, a day is skippable iff no row
    matches — and on this ingestion-time-clustered layout the probe
    must actually prune most days (zone maps are worth maintaining)."""
    rep = QUERIES["events_scan_pruning_report"](spark, sf_dir).toPandas()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    mx = ev["event_id"].max()
    lo, hi = mx * 4000 // 10000, mx * 4500 // 10000
    ev["day"] = ev["ts"].dt.floor("D")
    truth = (
        ev[(ev["event_id"] >= lo) & (ev["event_id"] <= hi)]["day"]
        .unique()
        .tolist()
    )
    flagged = set(rep[rep["would_scan"]]["day"])
    assert flagged == set(truth)
    assert len(flagged) <= len(rep) * 0.25  # pruning actually bites


def test_top_paths_oracle_parity(spark, sf_dir):
    assert_matches_oracle(spark, "events_top_paths", sf_dir)


def test_top_paths_consistent_with_transitions(spark, sf_dir):
    """Coherence with the one-step matrix: the total occurrences of
    paths starting a>b (summed over all c) can never exceed the a>b
    transition count (every length-3 occurrence contains that
    two-step prefix at the same position); ranks are 1..20 dense and
    n_users <= n_occurrences."""
    paths = QUERIES["events_top_paths"](spark, sf_dir).toPandas()
    trans = QUERIES["events_type_transitions"](spark, sf_dir).toPandas()
    t = {(r["from_type"], r["to_type"]): r["n_transitions"]
         for _, r in trans.iterrows()}
    assert sorted(paths["path_rank"]) == list(range(1, 21))
    assert (paths["n_users"] <= paths["n_occurrences"]).all()
    pre = {}
    for _, r in paths.iterrows():
        a, b, _c = r["path"].split(">")
        pre[(a, b)] = pre.get((a, b), 0) + r["n_occurrences"]
    for k, v in pre.items():
        assert v <= t[k]


def test_tpch_rf_merge_oracle_parity(spark, sf_dir):
    assert_matches_oracle(spark, "tpch_rf_merge", sf_dir)


def test_tpch_rf_merge_semantics(spark, sf_dir):
    """MERGE semantics on the orders table: deleted slice absent,
    updated slice re-priced exactly +10% (integer cents) with status
    R, inserted slice present past the offset, untouched slice
    byte-identical, and |result| = |orders| - |deletes| + |inserts|."""
    from aurora_cdc_demo_spark.registry import _RF_NEWKEY_OFFSET

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").toPandas()
    out = QUERIES["tpch_rf_merge"](spark, sf_dir).toPandas()
    orders["price_e2"] = (orders["o_totalprice"] * 100).round().astype("int64")
    m = orders["o_orderkey"] % 10
    assert not (out["o_orderkey"] % 10 == 7).any() or (
        out[out["o_orderkey"] % 10 == 7]["o_orderkey"]
        > _RF_NEWKEY_OFFSET
    ).all()
    n_del, n_ins = (m == 7).sum(), (m == 9).sum()
    assert len(out) == len(orders) - n_del + n_ins
    upd = out[(out["o_orderkey"] % 10 == 3) & (out["o_orderkey"] < _RF_NEWKEY_OFFSET)]
    base3 = orders[m == 3].set_index("o_orderkey")
    for _, r in upd.iterrows():
        assert r["o_orderstatus"] == "R"
        assert r["price_e2"] == base3.loc[r["o_orderkey"], "price_e2"] * 11 // 10
    ins = out[out["o_orderkey"] >= _RF_NEWKEY_OFFSET]
    assert len(ins) == n_ins and (ins["o_orderstatus"] == "O").all()
