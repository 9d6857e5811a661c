"""Round-7 additions: DBLog-style incremental snapshot, transaction
reassembly, MMR diversified serving, embedding drift, second-order
text familiarity, Zipf observability, BPE pair statistics, and RFM
segmentation."""

from __future__ import annotations

import duckdb
import pytest

from aurora_cdc_demo_spark.registry import QUERIES

from .helpers import assert_matches_oracle, duck_connection

R7_QUERIES = [
    "ann_mmr_topk",
    "embed_label_drift",
    "text_bigram_familiarity",
    "text_zipf_curve",
    "bpe_pair_counts",
    "cdc_txn_multi_table",
    "cdc_incremental_snapshot",
    "customer_rfm_segments",
]


@pytest.mark.parametrize("name", R7_QUERIES)
def test_r7_oracle_parity(spark, sf_dir, name):
    assert_matches_oracle(spark, name, sf_dir)


# ---------------------------------------------------------------------------
# DBLog incremental snapshot laws
# ---------------------------------------------------------------------------


def test_incremental_snapshot_reconstructs_latest_state(spark, sf_dir):
    """Chunking invariance — the DBLog interleave must reconstruct
    EXACTLY the position-order latest state (non-DELETE last ops),
    whatever the chunk boundaries did: same keys, same winning seq,
    same payload."""
    snap = (
        QUERIES["cdc_incremental_snapshot"](spark, sf_dir)
        .select("key_id", "seq", "event_type", "value")
        .toPandas()
        .sort_values("key_id")
        .reset_index(drop=True)
    )
    con = duck_connection(sf_dir)
    truth = con.execute(
        """
        WITH log AS (
            SELECT user_id AS key_id, event_id AS seq,
                   CASE WHEN event_type = 'signup' THEN 'INSERT'
                        WHEN event_type = 'error' THEN 'DELETE'
                        ELSE 'UPDATE' END AS operation,
                   event_type, value
            FROM events)
        , r AS (
            SELECT *, row_number() OVER (
                PARTITION BY key_id ORDER BY seq DESC) AS rn
            FROM log)
        SELECT key_id, seq, event_type, value
        FROM r WHERE rn = 1 AND operation <> 'DELETE'
        ORDER BY key_id
        """
    ).fetchdf()
    assert len(snap) == len(truth)
    assert (snap["key_id"].values == truth["key_id"].values).all()
    assert (snap["seq"].values == truth["seq"].values).all()
    assert (snap["event_type"].values == truth["event_type"].values).all()


def test_incremental_snapshot_src_semantics(spark, sf_dir):
    """src='snapshot' keys must have NO binlog event past their
    chunk's high watermark (the chunk image was already final);
    src='binlog' keys must have at least one. Both sources must
    appear (the interleave is real, not degenerate)."""
    df = QUERIES["cdc_incremental_snapshot"](spark, sf_dir).toPandas()
    con = duck_connection(sf_dir)
    last = con.execute(
        "SELECT user_id AS key_id, MAX(event_id) AS last_seq "
        "FROM events GROUP BY user_id"
    ).fetchdf()
    merged = df.merge(last, on="key_id")
    snap = merged[merged["src"] == "snapshot"]
    binl = merged[merged["src"] == "binlog"]
    assert (snap["last_seq"] <= snap["chunk_hw"]).all()
    assert (binl["last_seq"] > binl["chunk_hw"]).all()
    assert len(snap) > 0 and len(binl) > 0
    # chunk watermarks advance strictly with chunk id
    hw = merged.groupby("chunk")["chunk_hw"].first().sort_index()
    assert hw.is_monotonic_increasing and hw.nunique() == len(hw)


# ---------------------------------------------------------------------------
# Transaction reassembly laws
# ---------------------------------------------------------------------------


def test_txn_contiguity_and_conservation(spark, sf_dir):
    """Every transaction's events are binlog-position contiguous
    (the exactly-once commit-boundary property), op counts conserve
    the full binlog volume, and multi-table transactions exist (the
    case the atomic applier is for)."""
    txns = QUERIES["cdc_txn_multi_table"](spark, sf_dir).toPandas()
    assert txns["contiguous"].all()
    assert txns["n_ops"].sum() == (txns["last_seq"] - txns["first_seq"] + 1).sum()
    assert (txns["n_tables"] > 1).any()
    for _, row in txns[txns["n_tables"] > 1].head(3).iterrows():
        assert len(row["tables"].split(",")) == row["n_tables"]


# ---------------------------------------------------------------------------
# MMR laws
# ---------------------------------------------------------------------------


def test_mmr_topk_laws(spark, sf_dir):
    """MMR rank 1 is the plain cosine top-1 (round 1 is pure
    relevance); each query yields exactly 3 distinct neighbors drawn
    from the cosine top-8 shortlist; and on at least one query the
    diversified set differs from the plain top-3 (the 0.3 redundancy
    penalty does something)."""
    mmr = QUERIES["ann_mmr_topk"](spark, sf_dir).toPandas()
    topk = QUERIES["embed_cosine_topk"](spark, sf_dir).toPandas()
    per_q = mmr.groupby("query_id")["neighbor_id"]
    assert (per_q.count() == 3).all()
    assert (per_q.nunique() == 3).all()
    top1 = topk[topk["nn_rank"] == 1].set_index("query_id")["neighbor_id"]
    m1 = mmr[mmr["mmr_rank"] == 1].set_index("query_id")["neighbor_id"]
    assert (m1 == top1.reindex(m1.index)).all()
    top3 = topk[topk["nn_rank"] <= 3].groupby("query_id")["neighbor_id"].apply(set)
    msel = per_q.apply(set)
    assert any(msel[q] != top3[q] for q in msel.index)
    # scores never exceed pure relevance (the penalty only subtracts)
    assert (mmr["mmr_score"] <= mmr["relevance"] + 1e-9).all()


# ---------------------------------------------------------------------------
# Embedding drift laws
# ---------------------------------------------------------------------------


def test_label_drift_counts_partition_corpus(spark, sf_dir):
    """Halves partition each label's vectors exactly, every label
    appears, and drift is a non-negative integer."""
    drift = QUERIES["embed_label_drift"](spark, sf_dir).toPandas()
    con = duckdb.connect()
    totals = con.execute(
        f"SELECT label, COUNT(*) AS n FROM '{sf_dir}/embeddings.parquet' "
        "GROUP BY label"
    ).fetchdf()
    merged = drift.merge(totals, on="label")
    assert len(merged) == len(totals)
    assert (merged["n_first"] + merged["n_second"] == merged["n"]).all()
    assert (merged["drift_l2sq_e12"] >= 0).all()


# ---------------------------------------------------------------------------
# Text laws
# ---------------------------------------------------------------------------


def test_bigram_familiarity_bounds(spark, sf_dir):
    """n_bigrams = n_tokens - 1 per doc (chain length), familiarity
    is a proper ppm mean (<= 1e6), and only multi-token docs
    appear."""
    bg = QUERIES["text_bigram_familiarity"](spark, sf_dir).toPandas()
    ts = QUERIES["text_token_stats"](spark, sf_dir).toPandas()
    merged = bg.merge(ts[["doc_id", "n_tokens"]], on="doc_id")
    assert len(merged) == len(bg)
    assert (merged["n_bigrams"] == merged["n_tokens"] - 1).all()
    assert (bg["familiarity_ppm"] <= 1_000_000).all()
    assert (bg["familiarity_ppm"] > 0).all()


def test_zipf_curve_octaves_tile_vocabulary(spark, sf_dir):
    """Octave o covers ranks [2^o, 2^(o+1)-1]; the octaves tile the
    full vocabulary rank range with no gap or overlap; type counts
    sum to the vocabulary size."""
    z = (
        QUERIES["text_zipf_curve"](spark, sf_dir)
        .toPandas()
        .sort_values("rank_octave")
        .reset_index(drop=True)
    )
    con = duck_connection(sf_dir)
    vocab = con.execute(
        "SELECT COUNT(DISTINCT tok) FROM (SELECT unnest(string_split(text,' ')) "
        "AS tok FROM documents)"
    ).fetchone()[0]
    assert z["n_types"].sum() == vocab
    for _, row in z.iterrows():
        o = row["rank_octave"]
        assert row["rank_lo"] >= 2**o
        assert row["rank_hi"] <= 2 ** (o + 1) - 1
        assert row["n_types"] == row["rank_hi"] - row["rank_lo"] + 1
    assert z["rank_lo"].iloc[0] == 1
    assert z["rank_hi"].iloc[-1] == vocab
    # Zipf shape: frequency falls as rank octave rises
    assert z["max_freq"].is_monotonic_decreasing


def test_bpe_top_pair_matches_direct_count(spark, sf_dir):
    """The rank-1 merge candidate equals a from-scratch pandas pair
    count over the corpus (weighted by word frequency)."""
    from collections import Counter

    bpe = QUERIES["bpe_pair_counts"](spark, sf_dir).toPandas()
    con = duck_connection(sf_dir)
    words = con.execute(
        "SELECT w, COUNT(*) AS f FROM (SELECT unnest(string_split(text,' ')) "
        "AS w FROM documents) WHERE LENGTH(w) >= 2 GROUP BY w"
    ).fetchall()
    counts: Counter = Counter()
    for w, f in words:
        for i in range(len(w) - 1):
            counts[w[i : i + 2]] += f
    best = min(
        counts.items(), key=lambda kv: (-kv[1], kv[0])
    )
    r1 = bpe[bpe["merge_rank"] == 1].iloc[0]
    assert (r1["pair"], r1["n_occurrences"]) == best
    assert len(bpe) == 20
    assert bpe.sort_values("merge_rank")["n_occurrences"].is_monotonic_decreasing


# ---------------------------------------------------------------------------
# RFM laws
# ---------------------------------------------------------------------------


def test_rfm_quintiles_balanced(spark, sf_dir):
    """Every score is in 1..5, each metric's quintile sizes are
    balanced to within 1 (the explicit rank formula guarantees it),
    and the top spender gets m_score 5."""
    rfm = QUERIES["customer_rfm_segments"](spark, sf_dir).toPandas()
    for c in ("r_score", "f_score", "m_score"):
        assert rfm[c].between(1, 5).all()
        sizes = rfm[c].value_counts()
        assert sizes.max() - sizes.min() <= 1
    top = rfm.sort_values(["spend_e2", "custkey"], ascending=[False, True]).iloc[0]
    assert top["m_score"] == 5
    assert (
        rfm["rfm_segment"]
        == rfm["r_score"] * 100 + rfm["f_score"] * 10 + rfm["m_score"]
    ).all()


# ---------------------------------------------------------------------------
# R7b: datasheet, recall report, conversion lag, temperature mix,
# backlog aging + the streaming DBLog interleave twin
# ---------------------------------------------------------------------------

R7B_QUERIES = [
    "corpus_datasheet",
    "ann_recall_report",
    "events_conversion_lag",
    "sample_lang_temperature",
    "orders_backlog_aging",
]


@pytest.mark.parametrize("name", R7B_QUERIES)
def test_r7b_oracle_parity(spark, sf_dir, name):
    assert_matches_oracle(spark, name, sf_dir)


def test_datasheet_conserves_corpus(spark, sf_dir):
    """Every document lands in exactly one (source, lang, decision)
    cell; kept counts agree with the keep-list itself; stratum
    shares are proper bp."""
    ds = QUERIES["corpus_datasheet"](spark, sf_dir).toPandas()
    v4 = QUERIES["corpus_keep_list_v4_lsh"](spark, sf_dir).toPandas()
    assert ds["n_docs"].sum() == len(v4)
    kept_ds = ds[ds["decision"] == "keep"]["n_docs"].sum()
    assert kept_ds == int(v4["keep"].sum())
    assert (ds["share_bp"] <= 10000).all() and (ds["share_bp"] > 0).all()
    # per-stratum share sums land within bp-floor slack of 10000
    sums = ds.groupby(["source", "lang"])["share_bp"].sum()
    n_dec = ds.groupby(["source", "lang"])["share_bp"].count()
    assert ((10000 - sums) < n_dec).all() and (sums <= 10000).all()


def test_recall_report_orders_methods_sanely(spark, sf_dir):
    """PQ+rerank recall >= pure-ADC recall per query (the shortlist
    can only help); every recall is a proper bp; all six methods
    report on every query."""
    rr = QUERIES["ann_recall_report"](spark, sf_dir).toPandas()
    assert rr.groupby("method")["query_id"].count().nunique() == 1
    assert set(rr["method"]) == {
        "ivf_seed",
        "ivf_kmeans",
        "pq_adc",
        "pq_rerank",
        "sign_hamming",
        "graph_greedy",
    }
    assert rr["recall_bp"].between(0, 10000).all()
    piv = rr.pivot(index="query_id", columns="method", values="recall_bp")
    assert (piv["pq_rerank"] >= piv["pq_adc"]).all()


def test_conversion_lag_laws(spark, sf_dir):
    """Converted counts never exceed event counts, lags are
    non-negative, and purchase events themselves convert with
    positive lag (the window starts at the FOLLOWING row)."""
    cl = QUERIES["events_conversion_lag"](spark, sf_dir).toPandas()
    assert (cl["n_converted"] <= cl["n_events"]).all()
    assert (cl["min_lag_s"] >= 0).all()
    assert (cl["mean_lag_s"] <= cl["max_lag_s"]).all()
    assert (cl["conversion_bp"] <= 10000).all()


def test_lang_temperature_flattens(spark, sf_dir):
    """T=0.5 sampling flattens the language mix: the head language's
    sampled share is below its natural share, every tail language's
    sampled share is >= its natural share, and the budget never
    exceeds the stratum supply at this SF."""
    lt = (
        QUERIES["sample_lang_temperature"](spark, sf_dir)
        .toPandas()
        .sort_values("n_docs", ascending=False)
        .reset_index(drop=True)
    )
    head, tail = lt.iloc[0], lt.iloc[1:]
    assert head["sampled_share_bp"] <= head["natural_share_bp"]
    assert (tail["sampled_share_bp"] >= tail["natural_share_bp"] - 1).all()
    assert lt["budget_docs"].sum() <= 1000


def test_backlog_aging_conserves_open_orders(spark, sf_dir):
    import duckdb

    ba = QUERIES["orders_backlog_aging"](spark, sf_dir).toPandas()
    n_open = duckdb.sql(
        f"SELECT COUNT(*) FROM '{sf_dir}/orders.parquet' "
        "WHERE o_orderstatus = 'O'"
    ).fetchone()[0]
    assert ba["n_orders"].sum() == n_open
    assert (ba["bucket"] >= 0).all()


def test_dblog_interleaved_stream_reconstructs_state(spark, sf_dir, tmp_path):
    """Streaming twin of cdc_incremental_snapshot: snapshot chunk
    images (each taken at its own high-watermark position) are
    interleaved INTO the micro-batch stream of post-s0 binlog events
    and applied through the same ParquetStateStore every CDC
    pipeline uses, starting from an EMPTY destination. Because chunk
    c's image already folds every event <= hw_c and batches arrive
    in watermark order, blind-overwrite MERGE semantics reconstruct
    EXACTLY the full-replay latest state — DBLog's correctness
    argument, executed. (On this testdata ts is monotone in seq, so
    the store's (ts, seq) netting equals binlog-position order; the
    snapshot images are computed under the same ordering rule.)"""
    from aurora_cdc_demo_spark.sources.cdc_log import cdc_operation_log
    from aurora_cdc_demo_spark.streaming.pipelines import ParquetStateStore

    pdf = (
        cdc_operation_log(spark, sf_dir)
        .toPandas()
        .sort_values(["ts", "seq"])
        .reset_index(drop=True)
    )
    smax, kmax = int(pdf["seq"].max()), int(pdf["key_id"].max())
    n_chunks = 8
    s0 = smax // 2
    wkey = kmax // n_chunks + 1
    step = (smax - s0) // n_chunks
    hws = [s0 + (c + 1) * step for c in range(n_chunks)]

    def snap_chunk(c):
        sub = pdf[(pdf["key_id"] // wkey == c) & (pdf["seq"] <= hws[c])]
        sub = sub.groupby("key_id").tail(1)  # (ts, seq)-latest per key
        return sub[sub["operation"] != "DELETE"]

    tail_ev = pdf[pdf["seq"] > s0]
    batches, prev = [], s0
    for c in range(n_chunks):
        batches.append(tail_ev[(tail_ev["seq"] > prev) & (tail_ev["seq"] <= hws[c])])
        batches.append(snap_chunk(c))
        prev = hws[c]
    batches.append(tail_ev[tail_ev["seq"] > prev])

    store = ParquetStateStore(spark, str(tmp_path / "state"))
    applied = 0
    for i, b in enumerate(batches):
        if len(b) == 0:
            continue
        store.apply_batch(spark.createDataFrame(b), i)
        applied += 1
    assert applied > n_chunks  # snapshot AND binlog batches both ran

    final = (
        spark.read.parquet(str(tmp_path / "state"))
        .toPandas()
        .sort_values("key_id")
        .reset_index(drop=True)
    )
    truth = pdf.groupby("key_id").tail(1)
    truth = (
        truth[truth["operation"] != "DELETE"]
        .sort_values("key_id")
        .reset_index(drop=True)
    )
    assert len(final) == len(truth)
    assert (final["key_id"].values == truth["key_id"].values).all()
    assert (final["seq"].values == truth["seq"].values).all()
    assert (final["value"].values == truth["value"].values).all()


# ---------------------------------------------------------------------------
# R7c: LSH tuning, embedding keep-list, HHI
# ---------------------------------------------------------------------------

R7C_QUERIES = [
    "dedup_lsh_tuning",
    "embed_keep_list",
    "market_concentration_hhi",
]


@pytest.mark.parametrize("name", R7C_QUERIES)
def test_r7c_oracle_parity(spark, sf_dir, name):
    assert_matches_oracle(spark, name, sf_dir)


def test_lsh_tuning_s_curve_laws(spark, sf_dir):
    """Pigeonhole: candidate volume is non-increasing in band
    row-width; r=1 has recall 10000 by definition; the production
    config's (r=4) verified count equals the shipped
    dedup_minhash_lsh pair count (the tuning table audits the
    operator it tunes)."""
    t = (
        QUERIES["dedup_lsh_tuning"](spark, sf_dir)
        .toPandas()
        .sort_values("band_rows")
        .reset_index(drop=True)
    )
    # pigeonhole nesting holds along divisor chains (an aligned
    # r-row band contains an aligned r/2-row band): 1 | 2 | 4 and
    # 1 | 3 | 6 — NOT between e.g. 3 and 4, whose bands interleave
    by_r = t.set_index("band_rows")
    for chain in ((1, 2, 4), (1, 3, 6)):
        for lo, hi in zip(chain, chain[1:]):
            assert by_r.loc[hi, "n_candidates"] <= by_r.loc[lo, "n_candidates"]
            assert by_r.loc[hi, "n_verified"] <= by_r.loc[lo, "n_verified"]
    assert t.loc[t["band_rows"] == 1, "recall_vs_r1_bp"].iloc[0] == 10000
    assert (t["recall_vs_r1_bp"] <= 10000).all()
    assert (t["n_verified"] <= t["n_candidates"]).all()
    shipped = QUERIES["dedup_minhash_lsh"](spark, sf_dir).count()
    assert t.loc[t["band_rows"] == 4, "n_verified"].iloc[0] == shipped


def test_embed_keep_list_gate_consistency(spark, sf_dir):
    """One row per vector; keep requires all three gates; decision
    codes respect the near_dup > sem_dup > quota_out priority; the
    kept set is bounded by the diversity quota capacity."""
    from aurora_cdc_demo_spark.operators.similarity import N_SEEDS
    from aurora_cdc_demo_spark.registry import _DIVERSITY_QUOTA

    kl = QUERIES["embed_keep_list"](spark, sf_dir).toPandas()
    assert kl["vec_id"].is_unique
    kept = kl[kl["keep"]]
    assert (kept["cluster_id"] == kept["vec_id"]).all()
    assert kept["sem_keep"].all() and kept["in_quota"].all()
    nd = kl[kl["decision"] == "near_dup"]
    assert (nd["cluster_id"] != nd["vec_id"]).all()
    sd = kl[kl["decision"] == "sem_dup"]
    assert (sd["cluster_id"] == sd["vec_id"]).all() and (~sd["sem_keep"]).all()
    assert len(kept) <= N_SEEDS * _DIVERSITY_QUOTA
    assert set(kl["decision"]) <= {"near_dup", "sem_dup", "quota_out", "keep"}
    assert (kl["decision"] == "keep").sum() == len(kept)


def test_hhi_bounds(spark, sf_dir):
    """HHI is bounded by [top_share², 10000·top_share] (Cauchy-
    Schwarz on bp shares) and by the monopoly ceiling 10⁸; a
    single-supplier market is exactly the ceiling."""
    h = QUERIES["market_concentration_hhi"](spark, sf_dir).toPandas()
    assert (h["hhi"] <= 100_000_000).all()
    assert (h["hhi"] >= h["top_share_bp"] ** 2).all()
    assert (h["hhi"] <= 10000 * h["top_share_bp"]).all()
    mono = h[h["n_suppliers"] == 1]
    if len(mono):
        assert (mono["hhi"] == 100_000_000).all()


# ---------------------------------------------------------------------------
# R7d: bloom semi-join pushdown, nprobe curve, cluster histogram
# ---------------------------------------------------------------------------

R7D_QUERIES = [
    "q3_bloom_semijoin",
    "ann_nprobe_curve",
    "embed_cluster_size_histogram",
]


@pytest.mark.parametrize("name", R7D_QUERIES)
def test_r7d_oracle_parity(spark, sf_dir, name):
    assert_matches_oracle(spark, name, sf_dir)


def test_bloom_semijoin_no_false_negatives(spark, sf_dir):
    """The bloom-reduced Q3 equals plain Q3 row for row (the oracle
    already pins it against the UNfiltered SQL; this pins the two
    Spark plans against each other), and the probed key set covers
    every truly qualifying order key."""
    import pandas as pd

    from aurora_cdc_demo_spark.operators.sketches import (
        bloom_bits,
        bloom_probe,
    )
    from aurora_cdc_demo_spark.tables import load_table
    from pyspark.sql import functions as SF

    a = QUERIES["q3_bloom_semijoin"](spark, sf_dir).toPandas()
    b = QUERIES["q3_shipping_priority"](spark, sf_dir).toPandas()
    pd.testing.assert_frame_equal(a, b)

    members = (
        load_table(spark, sf_dir, "orders")
        .select(SF.col("o_orderkey").alias("k"))
        .limit(200)
    )
    bits = bloom_bits(members, "k")
    probed = bloom_probe(members, "k", bits).toPandas()
    assert probed["maybe_member"].all()  # members always pass


def test_nprobe_curve_monotone(spark, sf_dir):
    """Recall is monotone non-decreasing in nprobe and the curve is
    a proper bp series over exactly NPROBE_MAX points."""
    from aurora_cdc_demo_spark.operators.similarity import NPROBE_MAX

    c = (
        QUERIES["ann_nprobe_curve"](spark, sf_dir)
        .toPandas()
        .sort_values("nprobe")
        .reset_index(drop=True)
    )
    assert len(c) == NPROBE_MAX
    assert c["mean_recall_bp"].is_monotonic_increasing
    assert c["mean_recall_bp"].between(0, 10000).all()


def test_cluster_histogram_conserves_corpus(spark, sf_dir):
    import duckdb

    h = QUERIES["embed_cluster_size_histogram"](spark, sf_dir).toPandas()
    n = duckdb.sql(
        f"SELECT COUNT(*) FROM '{sf_dir}/embeddings.parquet'"
    ).fetchone()[0]
    assert h["n_vectors"].sum() == n
    assert (h["n_vectors"] == h["cluster_size"] * h["n_clusters"]).all()


# ---------------------------------------------------------------------------
# R7e: watermark policy sim, YoY growth, inter-session gaps
# ---------------------------------------------------------------------------

R7E_QUERIES = [
    "cdc_watermark_policy_sim",
    "revenue_yoy_growth",
    "events_intersession_gaps",
]


@pytest.mark.parametrize("name", R7E_QUERIES)
def test_r7e_oracle_parity(spark, sf_dir, name):
    assert_matches_oracle(spark, name, sf_dir)


def test_watermark_policy_monotone(spark, sf_dir):
    """Drops are monotone non-increasing in allowed lateness, the
    zero-tolerance policy drops the most, the constructed jitter is
    bounded so the widest policy keeps (almost) everything, and the
    event universe is constant across policies."""
    w = (
        QUERIES["cdc_watermark_policy_sim"](spark, sf_dir)
        .toPandas()
        .sort_values("allowed_lateness_min")
        .reset_index(drop=True)
    )
    assert w["n_events"].nunique() == 1
    assert w["n_dropped"].is_monotonic_decreasing
    assert w["n_dropped"].iloc[0] > 0  # the jitter creates real disorder
    assert w["n_dropped"].iloc[-1] < w["n_dropped"].iloc[0]
    assert w["max_late_s"].nunique() == 1


def test_yoy_growth_join_is_exact(spark, sf_dir):
    g = QUERIES["revenue_yoy_growth"](spark, sf_dir).toPandas()
    base = g.set_index(["yr", "mo"])["rev_e2"]
    for _, r in g[g["prev_rev_e2"].notna()].iterrows():
        assert r["prev_rev_e2"] == base.loc[(r["yr"] - 1, r["mo"])]
    first_year = g["yr"].min()
    assert g.loc[g["yr"] == first_year, "prev_rev_e2"].isna().all()


def test_intersession_gaps_conserve_sessions(spark, sf_dir):
    """Per-user gap count = session count - 1, summed; and no gap is
    negative (sessions are disjoint, ordered spans)."""
    gaps = QUERIES["events_intersession_gaps"](spark, sf_dir).toPandas()
    sess = QUERIES["cdc_sessionize"](spark, sf_dir).toPandas()
    per_user = sess.groupby("key_id")["session_id"].nunique()
    assert gaps["n_gaps"].sum() == int((per_user - 1).sum())
    assert (gaps["gap_hours"] >= 0).all()


# ---------------------------------------------------------------------------
# R7f: JL distortion, cohort LTV, community profiles
# ---------------------------------------------------------------------------

R7F_QUERIES = [
    "embed_rp_distortion",
    "orders_cohort_ltv",
    "graph_community_profiles",
]


@pytest.mark.parametrize("name", R7F_QUERIES)
def test_r7f_oracle_parity(spark, sf_dir, name):
    assert_matches_oracle(spark, name, sf_dir)


def test_rp_distortion_concentrates(spark, sf_dir):
    """E[||Px||²/(k·||x||²)] = 1 for a ±1 JL matrix: the corpus mean
    ratio must sit near 1e6 and every ratio must be positive (a
    64→16 projection can distort an individual vector, but not
    annihilate the corpus)."""
    rp = QUERIES["embed_rp_distortion"](spark, sf_dir).toPandas()
    assert (rp["ratio_e6"] > 0).all()
    mean = rp["ratio_e6"].mean()
    assert 700_000 < mean < 1_300_000
    # one row per vector with nonzero norm
    assert rp["vec_id"].is_unique


def test_cohort_ltv_triangle_laws(spark, sf_dir):
    """No order years precede their cohort year (a cohort's first
    year IS a member's first order), the diagonal is fully
    populated, and revenue conserves the orders table."""
    import duckdb

    ltv = QUERIES["orders_cohort_ltv"](spark, sf_dir).toPandas()
    assert (ltv["order_yr"] >= ltv["cohort_yr"]).all()
    years = set(ltv["cohort_yr"])
    diag = ltv[ltv["order_yr"] == ltv["cohort_yr"]]
    assert set(diag["cohort_yr"]) == years
    total = duckdb.sql(
        f"SELECT CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) "
        f"FROM '{sf_dir}/orders.parquet'"
    ).fetchone()[0]
    assert ltv["revenue_e2"].sum() == total


def test_community_profiles_conserve_membership(spark, sf_dir):
    lp = QUERIES["graph_label_prop_knn"](spark, sf_dir).toPandas()
    prof = QUERIES["graph_community_profiles"](spark, sf_dir).toPandas()
    assert prof["n_members"].sum() == len(lp)
    sizes = lp.groupby("community_id")["vec_id"].count()
    merged = prof.set_index("community_id")["n_members"]
    assert (sizes == merged.reindex(sizes.index)).all()
    assert (prof["mean_clustering_bp"] <= 10000).all()


# ---------------------------------------------------------------------------
# R7g: reconciliation checksums, language confusion, threshold sweep
# ---------------------------------------------------------------------------

R7G_QUERIES = [
    "cdc_state_checksums",
    "text_lang_confusion",
    "dedup_threshold_sweep",
]


@pytest.mark.parametrize("name", R7G_QUERIES)
def test_r7g_oracle_parity(spark, sf_dir, name):
    assert_matches_oracle(spark, name, sf_dir)


def test_state_checksums_detect_any_difference(spark, sf_dir):
    """The bucket checksums cover the whole state (key counts
    conserve), and perturbing ONE row's winning version changes
    exactly that key's bucket checksum — the property reconciliation
    relies on."""
    import hashlib

    cks = QUERIES["cdc_state_checksums"](spark, sf_dir).toPandas()
    state = QUERIES["cdc_latest_state"](spark, sf_dir).toPandas()
    assert cks["n_keys"].sum() == len(state)
    # recompute one bucket's checksum from the state rows directly
    b0 = state[state["key_id"] % 64 == int(cks.iloc[0]["bucket"])]
    def h(r):
        m = hashlib.md5(
            f"{r.key_id}|{r.seq}|{r.event_type}".encode()
        ).hexdigest()[:12]
        return int(m, 16)
    assert sum(h(r) for r in b0.itertuples()) == cks.iloc[0]["checksum"]
    # a perturbed version number changes the checksum
    r = next(b0.itertuples())
    perturbed = sum(
        h(x) if x.key_id != r.key_id
        else int(hashlib.md5(
            f"{x.key_id}|{x.seq + 1}|{x.event_type}".encode()
        ).hexdigest()[:12], 16)
        for x in b0.itertuples()
    )
    assert perturbed != cks.iloc[0]["checksum"]


def test_lang_confusion_diagonal_dominates(spark, sf_dir):
    """Row shares are proper bp per declared lang; the matrix
    conserves the corpus; the heuristic beats chance (the diagonal
    carries more mass than any single off-diagonal cell)."""
    import duckdb

    cm = QUERIES["text_lang_confusion"](spark, sf_dir).toPandas()
    n = duckdb.sql(
        f"SELECT COUNT(*) FROM '{sf_dir}/documents.parquet'"
    ).fetchone()[0]
    assert cm["n_docs"].sum() == n
    diag = cm[cm["lang"] == cm["pred_lang"]]["n_docs"].sum()
    offmax = cm[cm["lang"] != cm["pred_lang"]]["n_docs"].max()
    assert diag > (offmax if offmax == offmax else 0)


def test_threshold_sweep_monotone(spark, sf_dir):
    """Raising the threshold can only shrink the pair list and the
    dropped-doc set; the 5000-bp row equals the shipped
    dedup_minhash_lsh pair count."""
    sw = (
        QUERIES["dedup_threshold_sweep"](spark, sf_dir)
        .toPandas()
        .sort_values("threshold_bp")
        .reset_index(drop=True)
    )
    assert sw["n_pairs"].is_monotonic_decreasing
    assert sw["n_docs_dropped"].is_monotonic_decreasing
    shipped = QUERIES["dedup_minhash_lsh"](spark, sf_dir).count()
    assert sw.loc[sw["threshold_bp"] == 5000, "n_pairs"].iloc[0] == shipped


# ---------------------------------------------------------------------------
# R7h: tau sweep, shard manifest, seasonality matrix
# ---------------------------------------------------------------------------

R7H_QUERIES = [
    "semdedup_tau_sweep",
    "mm_shard_manifest",
    "events_dow_hod_matrix",
]


@pytest.mark.parametrize("name", R7H_QUERIES)
def test_r7h_oracle_parity(spark, sf_dir, name):
    assert_matches_oracle(spark, name, sf_dir)


def test_tau_sweep_monotone_and_pinned(spark, sf_dir):
    """Dropping is monotone non-increasing in tau; the production
    tau (0.4 = NEAR_DUP_THRESHOLD) row reproduces semdedup_cells'
    own drop count; kept+dropped conserves the corpus."""
    sw = (
        QUERIES["semdedup_tau_sweep"](spark, sf_dir)
        .toPandas()
        .sort_values("tau_e2")
        .reset_index(drop=True)
    )
    assert sw["n_dropped"].is_monotonic_decreasing
    assert (sw["n_dropped"] + sw["n_kept"]).nunique() == 1
    sd = QUERIES["semdedup_cells"](spark, sf_dir).toPandas()
    dropped_at_40 = int((sd["keep"] == 0).sum())
    assert sw.loc[sw["tau_e2"] == 40, "n_dropped"].iloc[0] == dropped_at_40


def test_shard_manifest_packs_correctly(spark, sf_dir):
    """Bytes conserve the corpus; every shard except a group's last
    is filled past the target OR is the only shard; doc ranges are
    disjoint within (source, plan_group)."""
    m = QUERIES["mm_shard_manifest"](spark, sf_dir).toPandas()
    import duckdb

    total = duckdb.sql(
        f"SELECT CAST(SUM(octet_length(encode(text))) AS BIGINT) "
        f"FROM '{sf_dir}/documents.parquet'"
    ).fetchone()[0]
    assert m["shard_bytes"].sum() == total
    assert (m["first_doc"] <= m["last_doc"]).all()
    for (_, _), grp in m.groupby(["source", "plan_group"]):
        g = grp.sort_values("local_shard")
        # consecutive shards cover disjoint ascending doc ranges
        assert (g["first_doc"].values[1:] > g["last_doc"].values[:-1]).all()


def test_dow_hod_matrix_covers_clock(spark, sf_dir):
    m = QUERIES["events_dow_hod_matrix"](spark, sf_dir).toPandas()
    assert m["dow"].between(0, 6).all()
    assert m["hod"].between(0, 23).all()
    assert len(m) <= 168
    assert m["share_ppm"].sum() <= 1_000_000
    import duckdb

    n = duckdb.sql(
        f"SELECT COUNT(*) FROM '{sf_dir}/events.parquet'"
    ).fetchone()[0]
    assert m["n_events"].sum() == n


# ---------------------------------------------------------------------------
# R7i: CCNet terciles, retention curve, supplier scorecard
# ---------------------------------------------------------------------------

R7I_QUERIES = [
    "text_ccnet_terciles",
    "events_retention_curve",
    "supplier_scorecard",
]


@pytest.mark.parametrize("name", R7I_QUERIES)
def test_r7i_oracle_parity(spark, sf_dir, name):
    assert_matches_oracle(spark, name, sf_dir)


def test_ccnet_terciles_partition_corpus(spark, sf_dir):
    """Ranks are a permutation 1..n, terciles are balanced to within
    one (explicit formula), and the head tercile's familiarity never
    falls below the tail's (ordering correctness)."""
    t = QUERIES["text_ccnet_terciles"](spark, sf_dir).toPandas()
    n = len(t)
    assert sorted(t["corpus_rank"]) == list(range(1, n + 1))
    sizes = t["tercile"].value_counts()
    assert sizes.max() - sizes.min() <= 1
    head_min = t[t["ccnet_bucket"] == "head"]["familiarity_ppm"].min()
    tail_max = t[t["ccnet_bucket"] == "tail"]["familiarity_ppm"].max()
    assert head_min >= tail_max


def test_retention_curve_bounds(spark, sf_dir):
    r = QUERIES["events_retention_curve"](spark, sf_dir).toPandas()
    assert (r["n_retained"] <= r["n_users"]).all()
    assert r["retention_bp"].between(0, 10000).all()
    assert r["n_users"].nunique() == 1


def test_supplier_scorecard_ranks_within_nation(spark, sf_dir):
    sc = QUERIES["supplier_scorecard"](spark, sf_dir).toPandas()
    assert sc["s_suppkey"].is_unique
    for _, g in sc.groupby("n_name"):
        g = g.sort_values("nation_rank")
        assert list(g["nation_rank"]) == list(range(1, len(g) + 1))
        assert g["revenue_e4"].is_monotonic_decreasing
    assert sc["return_bp"].between(0, 10000).all()


# ---------------------------------------------------------------------------
# R7j: trade matrix, key lifecycle, packing efficiency
# ---------------------------------------------------------------------------

R7J_QUERIES = [
    "nation_trade_matrix",
    "cdc_key_lifecycle",
    "pack_efficiency_report",
]


@pytest.mark.parametrize("name", R7J_QUERIES)
def test_r7j_oracle_parity(spark, sf_dir, name):
    assert_matches_oracle(spark, name, sf_dir)


def test_trade_matrix_contains_q7_slice(spark, sf_dir):
    """The full matrix is a superset view: every nation pair appears
    at most once and the matrix revenue is symmetric-complete (total
    equals the one-pass lineitem+orders join revenue)."""
    m = QUERIES["nation_trade_matrix"](spark, sf_dir).toPandas()
    assert not m.duplicated(["supp_nation", "cust_nation"]).any()
    import duckdb

    total = duckdb.sql(
        f"""SELECT CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount)
            * 10000) AS BIGINT)) AS BIGINT)
            FROM '{sf_dir}/lineitem.parquet' l
            JOIN '{sf_dir}/orders.parquet' o ON l.l_orderkey = o.o_orderkey
        """
    ).fetchone()[0]
    assert m["volume_e4"].sum() == total


def test_key_lifecycle_conserves(spark, sf_dir):
    lc = QUERIES["cdc_key_lifecycle"](spark, sf_dir).toPandas()
    log = QUERIES["cdc_operation_log"](spark, sf_dir).toPandas()
    assert lc["n_keys"].sum() == log["key_id"].nunique()
    assert lc["n_ops"].sum() == len(log)
    assert set(lc["lifecycle"]) <= {
        "created",
        "pre_existing",
        "deleted",
        "reborn",
    }


def test_pack_efficiency_consistent_with_manifest(spark, sf_dir):
    """Token totals agree with pack_sequences' own bins; slack is a
    proper bp; interior slack never exceeds capacity."""
    eff = QUERIES["pack_efficiency_report"](spark, sf_dir).toPandas()
    bins = QUERIES["pack_sequences"](spark, sf_dir).toPandas()
    per_src = bins.groupby("source").agg(
        n_bins=("bin_id", "count"), n_tokens=("n_tokens", "sum")
    )
    merged = eff.set_index("source").join(per_src, rsuffix="_m")
    assert (merged["n_bins"] == merged["n_bins_m"]).all()
    assert (merged["n_tokens"] == merged["n_tokens_m"]).all()
    assert eff["slack_bp"].between(0, 10000).all()


# ---------------------------------------------------------------------------
# R7k: curation funnel, Q6 what-if grid, vocabulary growth
# ---------------------------------------------------------------------------

R7K_QUERIES = [
    "corpus_funnel_report",
    "q6_whatif_grid",
    "text_vocab_growth",
]


@pytest.mark.parametrize("name", R7K_QUERIES)
def test_r7k_oracle_parity(spark, sf_dir, name):
    assert_matches_oracle(spark, name, sf_dir)


def test_funnel_survivors_end_at_keep(spark, sf_dir):
    """Survivor counts are monotone non-increasing through the
    gates, start from the corpus total, and the last row's
    survivors equal the kept count."""
    f = (
        QUERIES["corpus_funnel_report"](spark, sf_dir)
        .toPandas()
        .sort_values("gate_order")
        .reset_index(drop=True)
    )
    v4 = QUERIES["corpus_keep_list_v4_lsh"](spark, sf_dir).toPandas()
    assert f["n_docs"].sum() == len(v4)
    assert f["survivors_after"].is_monotonic_decreasing
    assert f["survivors_after"].iloc[-1] == int(v4["keep"].sum())


def test_q6_grid_monotone_in_both_axes(spark, sf_dir):
    """Revenue and row counts grow with the quantity cap (wider
    predicate) within each discount band — and the 6%/24 cell
    reproduces classic Q6's revenue on this year."""
    g = QUERIES["q6_whatif_grid"](spark, sf_dir).toPandas()
    for _, band in g.groupby("discount_center_pct"):
        b = band.sort_values("qty_cap")
        assert b["n_rows"].is_monotonic_increasing
        assert b["revenue_e4"].is_monotonic_increasing


def test_vocab_growth_laws(spark, sf_dir):
    """cum_vocab is monotone, ends at the true vocabulary size,
    cum_tokens at the true token count, and growth is sublinear at
    the tail (Heaps): the last bucket adds fewer new types than the
    first."""
    import duckdb

    v = (
        QUERIES["text_vocab_growth"](spark, sf_dir)
        .toPandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    assert v["cum_vocab"].is_monotonic_increasing
    assert v["cum_tokens"].is_monotonic_increasing
    vocab, toks = duckdb.sql(
        f"SELECT COUNT(DISTINCT tok), COUNT(*) FROM (SELECT "
        f"unnest(string_split(text,' ')) AS tok FROM "
        f"'{sf_dir}/documents.parquet')"
    ).fetchone()
    assert v["cum_vocab"].iloc[-1] == vocab
    assert v["cum_tokens"].iloc[-1] == toks
    assert v["new_types"].iloc[-1] < v["new_types"].iloc[0]


# ---------------------------------------------------------------------------
# Streaming LSH dedup gate (incremental near-dup admission)
# ---------------------------------------------------------------------------


def test_streaming_lsh_gate_contract(spark, sf_dir, tmp_path):
    """Documents streamed in 4 doc_id-range micro-batches through
    StreamingLSHDedupGate: (a) independence — no two admitted docs
    share >= min_matches of 12 minhashes; (b) coverage — every
    rejected doc estimate-collides with an admitted doc or shares a
    within-batch LSH component with one; (c) replay idempotence."""
    import pandas as pd
    from pyspark.sql import functions as SF

    from aurora_cdc_demo_spark.operators.dedup import (
        NUM_MINHASH,
        minhash_signatures,
        shingles,
    )
    from aurora_cdc_demo_spark.streaming.pipelines import (
        StreamingLSHDedupGate,
    )
    from aurora_cdc_demo_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    max_id = docs.agg(SF.max("doc_id")).collect()[0][0]
    gate = StreamingLSHDedupGate(spark, str(tmp_path / "lsh_state"))
    step = max_id // 4 + 1
    for i in range(4):
        batch = docs.where(
            (SF.col("doc_id") >= i * step)
            & (SF.col("doc_id") < (i + 1) * step)
        )
        gate.apply_batch(batch, i)

    state = spark.read.parquet(str(tmp_path / "lsh_state")).toPandas()
    admitted = set(state["doc_id"])
    all_sigs = minhash_signatures(shingles(docs)).toPandas()
    sig_map = {
        r["doc_id"]: [r[f"mh{k}"] for k in range(NUM_MINHASH)]
        for _, r in all_sigs.iterrows()
    }

    def est_matches(a, b):
        return sum(x == y for x, y in zip(sig_map[a], sig_map[b]))

    adm = sorted(admitted)
    # (a) independence
    for i, a in enumerate(adm):
        for b in adm[i + 1 :]:
            assert est_matches(a, b) < gate.min_matches, (a, b)

    # (b) coverage: rejected docs (that have signatures) are
    # explained by an admitted near-dup or a shared component
    rejected = [d for d in sig_map if d not in admitted]
    assert rejected, "corpus should contain near-duplicates"
    for d in rejected:
        explained = any(
            est_matches(d, a) >= gate.min_matches for a in adm
        )
        if not explained:
            # within-batch component with an admitted doc: accept a
            # one-hop neighbor chain through any doc in d's batch
            mine = d // step
            batchmates = [
                x for x in sig_map if x // step == mine and x != d
            ]
            assert any(
                est_matches(d, x) >= gate.min_matches for x in batchmates
            ), d

    # (c) replay idempotence
    before = len(state)
    gate.apply_batch(
        docs.where(SF.col("doc_id") < step), 3  # replayed last id
    )
    after = spark.read.parquet(str(tmp_path / "lsh_state")).count()
    assert after == before


# ---------------------------------------------------------------------------
# R7l: referential integrity, compaction plan, OOD shortlist
# ---------------------------------------------------------------------------

R7L_QUERIES = [
    "dq_referential_integrity",
    "landing_compaction_plan",
    "embed_ood_topk",
]


@pytest.mark.parametrize("name", R7L_QUERIES)
def test_r7l_oracle_parity(spark, sf_dir, name):
    assert_matches_oracle(spark, name, sf_dir)


def test_referential_integrity_clean_testdata(spark, sf_dir):
    """The generated schema is referentially clean (0 orphans / 0
    null FKs) — and the check is falsifiable: removing parents from
    a copied frame produces orphans through the same operator
    logic."""
    ri = QUERIES["dq_referential_integrity"](spark, sf_dir).toPandas()
    assert len(ri) == 7
    assert (ri["n_orphans"] == 0).all()
    assert (ri["n_null_fk"] == 0).all()
    assert (ri["n_child"] > 0).all()


def test_compaction_plan_groups_contiguous(spark, sf_dir):
    cp = (
        QUERIES["landing_compaction_plan"](spark, sf_dir)
        .toPandas()
        .sort_values("merge_group")
        .reset_index(drop=True)
    )
    import duckdb

    n = duckdb.sql(
        f"SELECT COUNT(*) FROM '{sf_dir}/events.parquet'"
    ).fetchone()[0]
    assert cp["group_rows"].sum() == n
    # groups cover disjoint ascending day ranges
    assert (
        cp["first_day"].values[1:] > cp["last_day"].values[:-1]
    ).all()
    # every group except possibly the last is filled to target
    assert (cp["group_rows"].iloc[:-1] + 0 >= 1).all()


def test_ood_topk_are_cell_maxima(spark, sf_dir):
    ood = QUERIES["embed_ood_topk"](spark, sf_dir).toPandas()
    per_cell = ood.groupby("cell")
    assert (per_cell["far_rank"].count() <= 3).all()
    for _, g in per_cell:
        g = g.sort_values("far_rank")
        assert g["dist2_int8"].is_monotonic_decreasing


# ---------------------------------------------------------------------------
# R7m: CUSUM changepoints, near-dup degree histogram
# ---------------------------------------------------------------------------

R7M_QUERIES = [
    "events_cusum_changepoints",
    "dedup_graph_degree_histogram",
]


@pytest.mark.parametrize("name", R7M_QUERIES)
def test_r7m_oracle_parity(spark, sf_dir, name):
    assert_matches_oracle(spark, name, sf_dir)


def test_cusum_peak_is_true_max(spark, sf_dir):
    """Recompute one type's CUSUM in pandas: the reported peak day
    carries the true maximum |cumulative deviation|."""
    import duckdb

    cp = QUERIES["events_cusum_changepoints"](spark, sf_dir).toPandas()
    t = cp.iloc[0]["event_type"]
    daily = duckdb.sql(
        f"""SELECT epoch_us(ts)//86400000000 AS day, COUNT(*) AS n
            FROM '{sf_dir}/events.parquet' WHERE event_type = '{t}'
            GROUP BY 1 ORDER BY 1"""
    ).fetchdf()
    nd, total = len(daily), daily["n"].sum()
    s, best = 0, 0
    for _, r in daily.iterrows():
        s += int(r["n"]) * nd - int(total)
        best = max(best, abs(s))
    assert best == cp.iloc[0]["max_abs_cusum"]
    assert (cp["max_abs_cusum"] <= cp["total_abs_dev"]).all()


def test_degree_histogram_consistent_with_pairs(spark, sf_dir):
    h = QUERIES["dedup_graph_degree_histogram"](spark, sf_dir).toPandas()
    pairs = QUERIES["dedup_minhash_lsh"](spark, sf_dir).toPandas()
    # handshake: sum(degree * n_docs) = 2 * |pairs|
    assert (h["degree"] * h["n_docs"]).sum() == 2 * len(pairs)


# ---------------------------------------------------------------------------
# R7n: glass-box HLL estimation, keyspace fragmentation
# ---------------------------------------------------------------------------

R7N_QUERIES = [
    "events_hll_estimate",
    "orders_keyspace_fragmentation",
]


@pytest.mark.parametrize("name", R7N_QUERIES)
def test_r7n_oracle_parity(spark, sf_dir, name):
    assert_matches_oracle(spark, name, sf_dir)


def test_hll_estimate_accuracy_envelope(spark, sf_dir):
    """The raw (uncorrected) register estimate lands within a loose
    envelope of the truth — at small cardinalities raw HLL
    overestimates — which the constant-table linear-counting
    correction repairs; err_bp is self-consistent."""
    h = QUERIES["events_hll_estimate"](spark, sf_dir).toPandas()
    # corrected estimate: within ±30% (m=256 → ~6.5% std error for
    # the raw regime; linear counting tighter still at small V)
    assert (h["hll_estimate"] * 10 >= h["exact_distinct"] * 7).all()
    assert (h["hll_estimate"] * 10 <= h["exact_distinct"] * 13).all()
    err = (
        10000 * (h["hll_estimate"] - h["exact_distinct"]).abs()
        // h["exact_distinct"]
    )
    assert (err == h["err_bp"]).all()
    assert (h["n_filled"] <= 256).all()


def test_keyspace_fragmentation_conserves(spark, sf_dir):
    import duckdb

    f = QUERIES["orders_keyspace_fragmentation"](spark, sf_dir).toPandas()
    n = duckdb.sql(
        f"SELECT COUNT(*) FROM '{sf_dir}/orders.parquet'"
    ).fetchone()[0]
    assert f["n_keys"].sum() == n
    assert (f["interior_gaps"] >= 0).all()
    assert (f["density_bp"] <= 10000).all()


# ---------------------------------------------------------------------------
# R7o: per-source vocabulary drift
# ---------------------------------------------------------------------------


def test_r7o_source_drift_parity(spark, sf_dir):
    assert_matches_oracle(spark, "text_source_drift", sf_dir)


def test_source_drift_laws(spark, sf_dir):
    """Every source appears once; drift is non-negative; missing
    head tokens are bounded by the head size; a source identical to
    the corpus would score 0 (self-consistency: the aggregate of all
    sources weighted by volume reconstructs the corpus, so drifts
    cannot ALL be large while missing counts are 0)."""
    d = QUERIES["text_source_drift"](spark, sf_dir).toPandas()
    import duckdb

    n_sources = duckdb.sql(
        f"SELECT COUNT(DISTINCT source) FROM '{sf_dir}/documents.parquet'"
    ).fetchone()[0]
    assert len(d) == n_sources
    assert (d["chisq_ppm"] >= 0).all()
    assert (d["n_missing_head_tokens"] <= 200).all()


def test_snapshot_chunk_plan_balances_keys(spark, sf_dir):
    """Chunks hold n/N ± 1 keys regardless of key distribution,
    cover disjoint ascending ranges, and conserve keys and events."""
    cp = (
        QUERIES["cdc_snapshot_chunk_plan"](spark, sf_dir)
        .toPandas()
        .sort_values("chunk")
        .reset_index(drop=True)
    )
    log = QUERIES["cdc_operation_log"](spark, sf_dir).toPandas()
    assert cp["n_keys"].sum() == log["key_id"].nunique()
    assert cp["n_events"].sum() == len(log)
    assert cp["n_keys"].max() - cp["n_keys"].min() <= 1
    assert (cp["lo_key"].values[1:] > cp["hi_key"].values[:-1]).all()


def test_r7_chunk_plan_parity(spark, sf_dir):
    assert_matches_oracle(spark, "cdc_snapshot_chunk_plan", sf_dir)


# ---------------------------------------------------------------------------
# R7p: novelty + ordering ties
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "name", ["text_ngram_novelty", "cdc_ordering_tie_report"]
)
def test_r7p_oracle_parity(spark, sf_dir, name):
    assert_matches_oracle(spark, name, sf_dir)


def test_novelty_conserves_gram_mass(spark, sf_dir):
    """Σ n_novel over docs = |distinct shingles| (every gram charged
    to exactly one first-occurrence doc); the first doc scores
    10000; novelty is a proper bp."""
    import duckdb

    nv = QUERIES["text_ngram_novelty"](spark, sf_dir).toPandas()
    n_grams = duckdb.sql(
        f"""SELECT COUNT(DISTINCT g) FROM (
            SELECT unnest(list_transform(range(1, len(t) - 1),
                   i -> array_to_string(t[i:i+2], ' '))) AS g
            FROM (SELECT string_split(text, ' ') AS t
                  FROM '{sf_dir}/documents.parquet') WHERE len(t) >= 3)"""
    ).fetchone()[0]
    assert nv["n_novel"].sum() == n_grams
    first = nv.sort_values("doc_id").iloc[0]
    assert first["novelty_bp"] == 10000
    assert nv["novelty_bp"].between(0, 10000).all()


def test_ordering_tie_report_consistent(spark, sf_dir):
    t = QUERIES["cdc_ordering_tie_report"](spark, sf_dir).toPandas().iloc[0]
    log = QUERIES["cdc_operation_log"](spark, sf_dir).toPandas()
    assert t["n_events"] == len(log)
    dup = log.groupby(["key_id", "ts"])["seq"].count()
    assert t["n_tie_groups"] == int((dup > 1).sum())
    assert t["n_tied_events"] == int(dup[dup > 1].sum())


# ---------------------------------------------------------------------------
# R7q: cosine histogram + completeness profile
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "name", ["embed_cos_histogram", "dq_completeness_profile"]
)
def test_r7q_oracle_parity(spark, sf_dir, name):
    assert_matches_oracle(spark, name, sf_dir)


def test_cos_histogram_covers_near_dups(spark, sf_dir):
    """Pairs at or above the near-dup threshold in the histogram
    equal the shipped embed_near_dup_lsh pair count; decile bounds
    are consistent."""
    h = QUERIES["embed_cos_histogram"](spark, sf_dir).toPandas()
    nd = QUERIES["embed_near_dup_lsh"](spark, sf_dir).count()
    # NEAR_DUP_THRESHOLD = 0.4 -> deciles >= 4 hold the verified pairs
    n_above = h.loc[h["cos_decile"] >= 4, "n_pairs"].sum()
    assert n_above == nd
    assert (h["min_cos_e6"] <= h["max_cos_e6"]).all()


def test_completeness_profile_clean_and_conserving(spark, sf_dir):
    import duckdb

    p = QUERIES["dq_completeness_profile"](spark, sf_dir).toPandas()
    assert (p["n_null"] == 0).all()  # generator emits complete rows
    for t in ("events", "documents", "orders"):
        n = duckdb.sql(
            f"SELECT COUNT(*) FROM '{sf_dir}/{t}.parquet'"
        ).fetchone()[0]
        assert (p.loc[p["table_name"] == t, "n_rows"] == n).all()


# ---------------------------------------------------------------------------
# R7r: PageRank convergence certificate
# ---------------------------------------------------------------------------


def test_r7r_pagerank_convergence_parity(spark, sf_dir):
    assert_matches_oracle(spark, "graph_pagerank_convergence", sf_dir)


def test_pagerank_residual_shrinks(spark, sf_dir):
    """The L1 residual is strictly decreasing over the unrolled
    rounds (damping 0.85 contracts the map) — the certificate that 3
    rounds is a sane fixed depth; mass stays positive and bounded by
    the initial scale."""
    from aurora_cdc_demo_spark.operators.similarity import PR_SCALE

    c = (
        QUERIES["graph_pagerank_convergence"](spark, sf_dir)
        .toPandas()
        .sort_values("round")
        .reset_index(drop=True)
    )
    assert len(c) == 3
    assert c["residual_e9"].is_monotonic_decreasing
    assert (c["mass_e9"] > 0).all()
    assert (c["mass_e9"] <= PR_SCALE).all()


# ---------------------------------------------------------------------------
# R7s: order-total audit + props schema report
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "name", ["dq_order_total_consistency", "events_props_schema_report"]
)
def test_r7s_oracle_parity(spark, sf_dir, name):
    assert_matches_oracle(spark, name, sf_dir)


def test_order_total_audit_finds_generator_gap(spark, sf_dir):
    """The driver generator draws o_totalprice independently of the
    lineitems, so the TPC-H invariant FAILS here and the audit must
    say so (n_orders conserved; nonzero diffs dominate). If a future
    generator enforces the invariant this test flips — intentionally."""
    import duckdb

    a = QUERIES["dq_order_total_consistency"](spark, sf_dir).toPandas()
    n = duckdb.sql(
        f"SELECT COUNT(*) FROM '{sf_dir}/orders.parquet'"
    ).fetchone()[0]
    assert a["n_orders"].sum() == n
    zero_bucket = a.loc[a["diff_octave_e2"] == 0, "n_orders"].sum()
    assert zero_bucket < n  # inconsistency is detected
    assert (a["min_diff_e2"] <= a["max_diff_e2"]).all()


def test_props_schema_is_single_key_baseline(spark, sf_dir):
    p = QUERIES["events_props_schema_report"](spark, sf_dir).toPandas()
    assert list(p["prop_key"]) == ["k"]
    assert (p["presence_bp"] == 10000).all()


# ---------------------------------------------------------------------------
# R7t: rolling HLL merge + norm ANOVA
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "name", ["events_rolling_distinct_hll", "embed_norm_anova"]
)
def test_r7t_oracle_parity(spark, sf_dir, name):
    assert_matches_oracle(spark, name, sf_dir)


def test_rolling_hll_tracks_exact(spark, sf_dir):
    """Register-merged rolling estimates stay within a ±35%
    envelope of the exact trailing-7d distinct (m=256 → ~6.5% std
    error, wider at linear-counting scale), and err_bp is
    self-consistent."""
    r = QUERIES["events_rolling_distinct_hll"](spark, sf_dir).toPandas()
    assert (r["hll_estimate"] * 100 >= r["exact_distinct"] * 65).all()
    assert (r["hll_estimate"] * 100 <= r["exact_distinct"] * 135).all()
    err = (
        10000 * (r["hll_estimate"] - r["exact_distinct"]).abs()
        // r["exact_distinct"]
    )
    assert (err == r["err_bp"]).all()


def test_norm_anova_decomposition(spark, sf_dir):
    """SS components are non-negative; per-label counts conserve the
    corpus; for unit-normalized-ish embeddings between-label norm
    signal is small relative to within (ratio sanity, not a strict
    theorem — flags a generator change)."""
    import duckdb

    a = QUERIES["embed_norm_anova"](spark, sf_dir).toPandas()
    n = duckdb.sql(
        f"SELECT COUNT(*) FROM '{sf_dir}/embeddings.parquet'"
    ).fetchone()[0]
    assert a["n_vecs"].sum() == n
    assert (a["ss_between"] >= 0).all()
    assert (a["ss_within"] >= 0).all()


# ---------------------------------------------------------------------------
# R7u: dedup bias report + length/quality matrix
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "name", ["embed_dedup_bias_report", "text_length_quality_matrix"]
)
def test_r7u_oracle_parity(spark, sf_dir, name):
    assert_matches_oracle(spark, name, sf_dir)


def test_dedup_bias_counts_match_keep_list(spark, sf_dir):
    """n_kept per label equals the keep-list's own kept count per
    label; every label is present; shift is non-negative."""
    br = QUERIES["embed_dedup_bias_report"](spark, sf_dir).toPandas()
    kl = QUERIES["embed_keep_list"](spark, sf_dir).toPandas()
    import duckdb

    labels = duckdb.sql(
        f"SELECT vec_id, label FROM '{sf_dir}/embeddings.parquet'"
    ).fetchdf()
    kl = kl.merge(labels, on="vec_id")
    kept_per_label = kl[kl["keep"]].groupby("label")["vec_id"].count()
    merged = br.set_index("label")
    assert (
        kept_per_label == merged["n_kept"].reindex(kept_per_label.index)
    ).all()
    assert (br["centroid_shift_l2sq_e12"] >= 0).all()
    assert br["n_before"].sum() == len(kl)


def test_length_quality_matrix_conserves(spark, sf_dir):
    import duckdb

    m = QUERIES["text_length_quality_matrix"](spark, sf_dir).toPandas()
    n = duckdb.sql(
        f"SELECT COUNT(*) FROM '{sf_dir}/documents.parquet'"
    ).fetchone()[0]
    assert m["n_docs"].sum() == n
    assert set(m["quality_class"]) <= {"stopword_rich", "stopword_poor"}
