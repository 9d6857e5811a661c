"""Round-4 additions: deterministic sketches (count-min, Bloom),
plus their probabilistic-structure laws and plan shapes."""

from __future__ import annotations

import pytest

from aurora_cdc_demo_spark.registry import QUERIES

from .helpers import assert_matches_oracle
from .test_plans import plan_of

R4_QUERIES = [
    "events_count_min_users",
    "corpus_bloom_decontaminate",
]


@pytest.mark.parametrize("name", R4_QUERIES)
def test_oracle_parity(spark, sf_dir, name):
    assert_matches_oracle(spark, name, sf_dir)


def test_count_min_one_sided_error(spark, sf_dir):
    """The count-min guarantee: est >= exact for EVERY key (each
    occurrence incremented all depth counters; collisions only add).
    Also sanity-check the sketch carries signal: at this load factor
    (n_keys << width) most keys should be exact."""
    rows = QUERIES["events_count_min_users"](spark, sf_dir).collect()
    assert rows
    assert all(r["overestimate"] >= 0 for r in rows)
    assert all(r["est_count"] == r["exact_count"] + r["overestimate"] for r in rows)
    exact_frac = sum(r["overestimate"] == 0 for r in rows) / len(rows)
    assert exact_frac >= 0.5


def test_bloom_no_false_negatives(spark, sf_dir):
    """Every exact contamination hit must bloom-hit: per doc
    n_bloom_hits >= n_exact_hits, and the exact-decontaminate doc
    set is a subset of the bloom-flagged doc set."""
    bloom = {
        r["doc_id"]: r
        for r in QUERIES["corpus_bloom_decontaminate"](spark, sf_dir).collect()
    }
    exact = {
        r["doc_id"]: r["n_shared_ngrams"]
        for r in QUERIES["corpus_decontaminate"](spark, sf_dir).collect()
    }
    for doc_id, n_exact in exact.items():
        assert doc_id in bloom
        assert bloom[doc_id]["n_bloom_hits"] >= n_exact
    for r in bloom.values():
        assert r["n_false_pos"] >= 0
        assert r["n_bloom_hits"] == r["n_exact_hits"] + r["n_false_pos"]


def test_sketch_plans_broadcast_constant_sides(spark, sf_dir):
    """The sketch/bits tables are bounded by constants (depth*width
    counters; k*|bench| positions), so their probe joins must
    broadcast — the corpus-sized side never shuffles for scoring."""
    cm = plan_of(spark, sf_dir, "events_count_min_users")
    assert "BroadcastHashJoin" in cm
    bl = plan_of(spark, sf_dir, "corpus_bloom_decontaminate")
    assert "BroadcastHashJoin" in bl


@pytest.mark.parametrize("name", ["cdc_state_diff", "cdc_agg_incremental"])
def test_oracle_parity_cdc(spark, sf_dir, name):
    assert_matches_oracle(spark, name, sf_dir)


def test_agg_incremental_split_invariance(spark, sf_dir):
    """The maintained aggregate must not depend on WHERE the
    base/delta split falls: three different snapshot points (early,
    the registered constant, late) must all produce the identical
    result set."""
    from aurora_cdc_demo_spark.registry import _incremental_state_agg

    def rows(as_of):
        return sorted(
            (r["event_type"], r["n_keys"], r["total_value"])
            for r in _incremental_state_agg(spark, sf_dir, as_of).collect()
        )

    r_early = rows("2024-01-10 00:00:00")
    r_mid = rows("2024-01-16 00:00:00")
    r_late = rows("2024-01-25 00:00:00")
    assert r_early == r_mid == r_late


def test_state_diff_consistent_with_snapshots(spark, sf_dir):
    """Applying the diff to snapshot-1 must land exactly on
    snapshot-2: ADDED+CHANGED carry the snapshot-2 row, REMOVED keys
    are absent from snapshot-2, and untouched keys appear in
    neither."""
    from aurora_cdc_demo_spark.operators import cdc_apply
    from aurora_cdc_demo_spark.registry import TIME_TRAVEL_AS_OF
    from aurora_cdc_demo_spark.sources.cdc_log import cdc_operation_log
    from pyspark.sql import functions as F

    log = cdc_operation_log(spark, sf_dir)
    as_of = F.to_timestamp(F.lit(TIME_TRAVEL_AS_OF))
    s1 = {
        r["key_id"]: r["seq"]
        for r in cdc_apply.latest_state(log.where(F.col("ts") <= as_of))
        .select("key_id", "seq")
        .collect()
    }
    s2 = {
        r["key_id"]: r["seq"]
        for r in cdc_apply.latest_state(log).select("key_id", "seq").collect()
    }
    diff = QUERIES["cdc_state_diff"](spark, sf_dir).collect()
    seen = set()
    for r in diff:
        k = r["key_id"]
        seen.add(k)
        if r["change_type"] == "ADDED":
            assert k not in s1 and s2[k] == r["new_seq"]
        elif r["change_type"] == "REMOVED":
            assert k not in s2 and s1[k] == r["old_seq"]
        else:
            assert s1[k] == r["old_seq"] and s2[k] == r["new_seq"]
            assert r["old_seq"] != r["new_seq"]
    for k in set(s1) | set(s2):
        if k not in seen:
            assert s1.get(k) == s2.get(k)


R4_TEXT_QUERIES = [
    "text_gopher_rules",
    "sample_importance_weights",
    "mm_content_dedup",
]


@pytest.mark.parametrize("name", R4_TEXT_QUERIES)
def test_oracle_parity_text(spark, sf_dir, name):
    assert_matches_oracle(spark, name, sf_dir)


def test_gopher_flags_imply_keep(spark, sf_dir):
    """keep == 1 exactly when all four flags are 0; bounds hold."""
    rows = QUERIES["text_gopher_rules"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        all_clear = (
            r["flag_word_count"]
            + r["flag_word_length"]
            + r["flag_alpha"]
            + r["flag_stopwords"]
        ) == 0
        assert (r["keep"] == 1) == all_clear
        assert 0 <= r["alpha_word_bp"] <= 10000
    # the battery must discriminate on this corpus, not rubber-stamp
    kept = sum(r["keep"] for r in rows)
    assert 0 < kept < len(rows)


def test_importance_weights_favor_target_lang(spark, sf_dir):
    """DSIR sanity: the mean importance ratio of target-language
    (en) docs must exceed the non-target mean — the weights must
    actually pull the mixture toward the target distribution."""
    from aurora_cdc_demo_spark.tables import load_table

    langs = {
        r["doc_id"]: r["lang"]
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "lang")
        .collect()
    }
    rows = QUERIES["sample_importance_weights"](spark, sf_dir).collect()
    en = [r["mean_ratio_ppm"] for r in rows if langs[r["doc_id"]] == "en"]
    rest = [r["mean_ratio_ppm"] for r in rows if langs[r["doc_id"]] != "en"]
    assert en and rest
    assert sum(en) / len(en) > sum(rest) / len(rest)


def test_mm_content_dedup_family_law(spark, sf_dir):
    """Each family has exactly one canonical doc (its min doc_id)
    and family sizes sum to the corpus size."""
    rows = QUERIES["mm_content_dedup"](spark, sf_dir).collect()
    by_md5 = {}
    for r in rows:
        by_md5.setdefault(r["content_md5"], []).append(r)
    n_docs = len(rows)
    assert sum(len(v) for v in by_md5.values()) == n_docs
    for fam in by_md5.values():
        assert sum(r["is_canonical"] for r in fam) == 1
        canon = min(r["doc_id"] for r in fam)
        for r in fam:
            assert r["family_size"] == len(fam)
            assert r["is_canonical"] == (r["doc_id"] == canon)


R4B_QUERIES = [
    "scd2_point_in_time_join",
    "events_cumulative_users",
    "basket_part_pairs",
    "sample_per_group_topk",
]


@pytest.mark.parametrize("name", R4B_QUERIES)
def test_oracle_parity_r4b(spark, sf_dir, name):
    assert_matches_oracle(spark, name, sf_dir)


def test_pit_join_matches_asof_semantics(spark, sf_dir):
    """The point-in-time join must hand every probe the LATEST
    non-deleted state at or before its timestamp — cross-checked
    against a direct last-event-per-probe computation."""
    from aurora_cdc_demo_spark.sources.cdc_log import cdc_operation_log
    from pyspark.sql import functions as F

    rows = QUERIES["scd2_point_in_time_join"](spark, sf_dir).collect()
    assert rows
    log = {}
    for r in cdc_operation_log(spark, sf_dir).collect():
        log.setdefault(r["key_id"], []).append(r)
    for changes in log.values():
        changes.sort(key=lambda r: (r["ts"], r["seq"]))
    for r in rows[:200]:
        changes = log[r["key_id"]]
        last = None
        for c in changes:
            if c["ts"] <= r["probe_ts"]:
                last = c
            else:
                break
        assert last is not None
        assert last["operation"] != "DELETE"
        assert r["state_seq"] == last["seq"]


def test_cumulative_users_laws(spark, sf_dir):
    """Monotone growth; final cumulative == corpus-wide distinct
    users; daily active never exceeds cumulative-so-far."""
    from aurora_cdc_demo_spark.tables import load_table

    rows = sorted(
        QUERIES["events_cumulative_users"](spark, sf_dir).collect(),
        key=lambda r: r["day"],
    )
    total = (
        load_table(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .count()
    )
    prev = 0
    for r in rows:
        assert r["cumulative_users"] >= prev
        assert r["active_users"] <= r["cumulative_users"]
        assert r["new_users"] >= 0
        prev = r["cumulative_users"]
    assert rows[-1]["cumulative_users"] == total
    assert sum(r["new_users"] for r in rows) == total


def test_basket_pairs_recount(spark, sf_dir):
    """Recount the top pair's support directly from lineitem."""
    from aurora_cdc_demo_spark.tables import load_table

    rows = QUERIES["basket_part_pairs"](spark, sf_dir).collect()
    assert rows
    top = min(rows, key=lambda r: r["rnk"])
    assert top["rnk"] == 1
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    )
    by_order = {}
    for r in li:
        by_order.setdefault(r["l_orderkey"], set()).add(r["l_partkey"])
    n = sum(
        1
        for parts in by_order.values()
        if top["part_a"] in parts and top["part_b"] in parts
    )
    assert n == top["n_orders"]
    # no pair below it has higher support
    assert all(r["n_orders"] <= top["n_orders"] for r in rows)


def test_per_group_sample_exact_k(spark, sf_dir):
    """Exactly K (or group size) rows per source, stable across
    runs."""
    from aurora_cdc_demo_spark.registry import _GROUP_SAMPLE_K
    from aurora_cdc_demo_spark.tables import load_table

    rows = QUERIES["sample_per_group_topk"](spark, sf_dir).collect()
    sizes = {
        r["source"]: r["cnt"]
        for r in load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .count()
        .withColumnRenamed("count", "cnt")
        .collect()
    }
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    assert set(by_src) == set(sizes)
    for src, picks in by_src.items():
        assert len(picks) == min(_GROUP_SAMPLE_K, sizes[src])
        assert sorted(p["sample_rank"] for p in picks) == list(
            range(1, len(picks) + 1)
        )
    again = {
        (r["doc_id"], r["source"])
        for r in QUERIES["sample_per_group_topk"](spark, sf_dir).collect()
    }
    assert again == {(r["doc_id"], r["source"]) for r in rows}


def test_pagerank_oracle_parity(spark, sf_dir):
    assert_matches_oracle(spark, "graph_pagerank_knn", sf_dir)


def test_pagerank_laws(spark, sf_dir):
    """Rank laws on the integer-exact fixpoint: (a) every rank holds
    at least the teleport floor; (b) total mass never exceeds the
    scaled unit (floor division + dangling drop only LOSE mass);
    (c) ranks discriminate (not all equal); (d) a node with no
    in-links sits exactly on the teleport floor."""
    rows = QUERIES["graph_pagerank_knn"](spark, sf_dir).collect()
    n = len(rows)
    assert n
    from aurora_cdc_demo_spark.operators.similarity import PR_SCALE

    floor = (15 * (PR_SCALE // n)) // 100
    total = sum(r["pagerank_e9"] for r in rows)
    assert all(r["pagerank_e9"] >= floor for r in rows)
    assert total <= PR_SCALE
    assert len({r["pagerank_e9"] for r in rows}) > 1

    # r9: the graph family rides the banded-LSH edge builder — sinks
    # must be derived from the SAME edge list pagerank consumed
    edges = QUERIES["ann_knn_graph_lsh"](spark, sf_dir).collect()
    with_inlinks = {e["neighbor_id"] for e in edges}
    sinks = [r for r in rows if r["vec_id"] not in with_inlinks]
    for r in sinks:
        assert r["pagerank_e9"] == floor


def test_keep_list_v4_oracle_parity(spark, sf_dir):
    assert_matches_oracle(spark, "corpus_keep_list_v4", sf_dir)


def test_v4_refines_v3(spark, sf_dir):
    """v4 may only REMOVE docs from v3's keep set (two extra gates,
    no resurrection), carried codes stay stable, and every v4-only
    drop is attributed to one of the two new codes."""
    v3 = {
        r["doc_id"]: (r["keep"], r["decision"])
        for r in QUERIES["corpus_keep_list_v3"](spark, sf_dir).collect()
    }
    v4 = {
        r["doc_id"]: (r["keep"], r["decision"])
        for r in QUERIES["corpus_keep_list_v4"](spark, sf_dir).collect()
    }
    assert set(v3) == set(v4)
    new_codes = {"gopher_filtered", "off_target"}
    demoted = 0
    for doc_id, (k4, d4) in v4.items():
        k3, d3 = v3[doc_id]
        if k4:
            assert k3, f"doc {doc_id} kept by v4 but dropped by v3"
        if k3 and not k4:
            demoted += 1
            assert d4 in new_codes
        if d3 != "keep" and d3 not in ("low_quality", "sampled_out"):
            # high-priority codes are carried verbatim
            assert d4 == d3
    assert demoted > 0, "v4's new gates never fired — thresholds vacuous"


def test_containment_oracle_parity(spark, sf_dir):
    assert_matches_oracle(spark, "dedup_containment", sf_dir)


def test_containment_corpus_laws(spark, sf_dir):
    """Structural laws on the corpus: containment >= jaccard always,
    every emitted pair clears the containment bar, and the flag is
    exactly the below-Jaccard-threshold predicate. (This synthetic
    corpus's dup families are same-length rewrites, so no asymmetric
    pair exists here — the asymmetric behavior is pinned on
    constructed rows below.)"""
    from aurora_cdc_demo_spark.operators.dedup import (
        CONTAINMENT_THRESHOLD_BP,
        JACCARD_THRESHOLD_BP,
    )

    rows = QUERIES["dedup_containment"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["containment_bp"] >= r["jaccard_bp"]
        assert r["containment_bp"] >= CONTAINMENT_THRESHOLD_BP
        assert r["containment_only"] == (
            r["jaccard_bp"] < JACCARD_THRESHOLD_BP
        )


def test_containment_catches_constructed_swallowed_doc(spark):
    """A short doc verbatim-contained in a much longer doc must be
    caught as containment_only: containment = 1.0 while Jaccard sits
    far below the symmetric dedup threshold."""
    from aurora_cdc_demo_spark.operators.dedup import containment_pairs

    small = "alpha beta gamma delta epsilon zeta"
    filler = " ".join(f"tok{i} tok{i + 1} pad{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(1, small), (2, small + " " + filler), (3, "unrelated words only")],
        "doc_id long, text string",
    )
    rows = {
        (r["doc_a"], r["doc_b"]): r
        for r in containment_pairs(docs).collect()
    }
    assert (1, 2) in rows
    r = rows[(1, 2)]
    assert r["containment_bp"] == 10000
    assert r["containment_only"]
    assert all(k == (1, 2) for k in rows)


def test_kmeans_oracle_parity(spark, sf_dir):
    assert_matches_oracle(spark, "ann_ivf_kmeans", sf_dir)


def test_kmeans_wss_improves(spark, sf_dir):
    """Lloyd's monotone property must survive integer rounding:
    total within-cluster L2² after round 2 <= after round 1, every
    vector assigned to exactly one live cell, and the trained cells
    actually move vectors (assignment differs from pure seed
    assignment for at least one vector)."""
    rows = QUERIES["ann_ivf_kmeans"](spark, sf_dir).collect()
    assert rows
    wss1 = sum(r["dist2_round1"] for r in rows)
    wss2 = sum(r["dist2"] for r in rows)
    assert wss2 <= wss1
    assert len({r["vec_id"] for r in rows}) == len(rows)
    from aurora_cdc_demo_spark.operators.similarity import N_SEEDS

    assert len({r["cell"] for r in rows}) <= N_SEEDS


R4C_QUERIES = [
    "events_type_transitions",
    "cdc_late_arrival_report",
    "sample_embed_diversity",
]


@pytest.mark.parametrize("name", R4C_QUERIES)
def test_oracle_parity_r4c(spark, sf_dir, name):
    assert_matches_oracle(spark, name, sf_dir)


def test_transitions_conservation(spark, sf_dir):
    """Total transitions == total events minus one per multi-event
    user (each user's chain has n_i - 1 links)."""
    from aurora_cdc_demo_spark.tables import load_table

    rows = QUERIES["events_type_transitions"](spark, sf_dir).collect()
    total = sum(r["n_transitions"] for r in rows)
    per_user = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .count()
        .collect()
    )
    want = sum(r["count"] - 1 for r in per_user if r["count"] > 0)
    assert total == want


def test_late_arrival_fires_on_disorder(spark, sf_dir):
    """The driver testdata is fully in-order (empty report — pinned),
    and a constructed out-of-order log is reported with the exact
    lateness."""
    import datetime as dt

    from aurora_cdc_demo_spark.operators.cdc_apply import late_arrival_report

    assert QUERIES["cdc_late_arrival_report"](spark, sf_dir).count() == 0

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, 1, t0),
        (1, 2, t0 + dt.timedelta(seconds=100)),
        (1, 3, t0 + dt.timedelta(seconds=40)),  # 60 s late
        (2, 4, t0),
        (2, 5, t0 + dt.timedelta(seconds=10)),
    ]
    log = spark.createDataFrame(
        rows, "key_id long, seq long, ts timestamp"
    )
    got = {r["key_id"]: r for r in late_arrival_report(log).collect()}
    assert set(got) == {1}
    assert got[1]["n_late"] == 1
    assert got[1]["max_late_s"] == 60


def test_diversity_sample_covers_cells(spark, sf_dir):
    """Every trained cell contributes min(quota, |cell|) picks, rank
    sequences are 1..k, and picks are stable across runs."""
    from aurora_cdc_demo_spark.registry import _DIVERSITY_QUOTA

    cells = {}
    for r in QUERIES["ann_ivf_kmeans"](spark, sf_dir).collect():
        cells[r["cell"]] = cells.get(r["cell"], 0) + 1
    picks = {}
    for r in QUERIES["sample_embed_diversity"](spark, sf_dir).collect():
        picks.setdefault(r["cell"], []).append(r["pick_rank"])
    assert set(picks) == set(cells)
    for cell, ranks in picks.items():
        assert sorted(ranks) == list(
            range(1, min(_DIVERSITY_QUOTA, cells[cell]) + 1)
        )


def test_pareto_oracle_parity(spark, sf_dir):
    assert_matches_oracle(spark, "supplier_revenue_pareto", sf_dir)


def test_pareto_cumulative_laws(spark, sf_dir):
    """Cumulative share is monotone in (rev desc, key asc) order and
    ends at exactly 10000 bp; the top-80 head is a proper prefix and
    non-trivial."""
    rows = sorted(
        QUERIES["supplier_revenue_pareto"](spark, sf_dir).collect(),
        key=lambda r: (-r["rev_e4"], r["suppkey"]),
    )
    assert rows
    prev = 0
    flipped = False
    for r in rows:
        assert r["cum_share_bp"] >= prev
        prev = r["cum_share_bp"]
        if not r["in_top80"]:
            flipped = True
        else:
            assert not flipped, "in_top80 must be a prefix"
    assert rows[-1]["cum_share_bp"] == 10000
    n_top = sum(r["in_top80"] for r in rows)
    assert 0 < n_top <= len(rows)


def test_pareto_plan_has_no_global_data_window(spark, sf_dir):
    """The supplier-sized running sum must be partitioned by bucket;
    the only unpartitioned window runs over the 32-row bucket-totals
    aggregate. We assert the window over the supplier-sized relation
    carries a partition spec (bucket) in the executed plan."""
    plan = plan_of(spark, sf_dir, "supplier_revenue_pareto")
    import re

    # every Window node mentioning rev_e4's running sum must be
    # partitioned by bucket; the bucket-prefix window (over
    # bucket_total) is the only one allowed without it
    for m in re.finditer(r"Window \[[^\]]*in_bucket_cum[^\]]*\]", plan):
        assert "bucket" in m.group(0)


def test_scd2_compact_oracle_parity(spark, sf_dir):
    assert_matches_oracle(spark, "scd2_compact", sf_dir)


def test_scd2_compact_laws(spark, sf_dir):
    """Conservation: merged row counts sum to the raw SCD2 row
    count; islands actually merge on this data (n_merged > 1
    exists); within a key, island spans are disjoint and ordered
    (each span's valid_from follows the previous span's end); and
    each span is homogeneous by construction (one (operation,
    event_type))."""
    from aurora_cdc_demo_spark.operators.cdc_apply import scd2_history
    from aurora_cdc_demo_spark.sources.cdc_log import cdc_operation_log

    raw_n = cdc_operation_log(spark, sf_dir).count()
    rows = QUERIES["scd2_compact"](spark, sf_dir).collect()
    assert sum(r["n_merged"] for r in rows) == raw_n
    assert any(r["n_merged"] > 1 for r in rows)
    by_key = {}
    for r in rows:
        by_key.setdefault(r["key_id"], []).append(r)
    for spans in by_key.values():
        spans.sort(key=lambda r: r["island"])
        for prev, nxt in zip(spans, spans[1:]):
            assert prev["valid_to"] is not None
            assert prev["valid_to"] <= nxt["valid_from"]
        # exactly one open span per key, and only at the end: every
        # key's raw SCD2 chain ends with the open row (lead == NULL),
        # so compaction must preserve exactly one open span — a
        # closed last span means MAX(valid_to) swallowed the NULL
        # (the bug ADVICE r2 flagged: 'valid_to IS NULL = current'
        # consumers would lose the key)
        open_spans = [s for s in spans if s["valid_to"] is None]
        assert len(open_spans) == 1
        assert open_spans[0] is spans[-1]


@pytest.mark.parametrize(
    "name", ["debezium_gold_scd1", "debezium_gold_scd2"]
)
def test_oracle_parity_debezium_gold(spark, sf_dir, name):
    assert_matches_oracle(spark, name, sf_dir)


def test_debezium_gold_consistency(spark, sf_dir):
    """Medallion-internal law: SCD1 is exactly SCD2's is_current
    slice, and each key's SCD2 version chain is contiguous in binlog
    position (end_pos of one version == pos of the next)."""
    scd1 = {
        r["key_id"]: r["pos"]
        for r in QUERIES["debezium_gold_scd1"](spark, sf_dir).collect()
    }
    scd2 = QUERIES["debezium_gold_scd2"](spark, sf_dir).collect()
    current = {
        r["key_id"]: r["pos"] for r in scd2 if r["is_current"]
    }
    assert scd1 == current
    chains = {}
    for r in scd2:
        chains.setdefault(r["key_id"], []).append(r)
    for rows in chains.values():
        rows.sort(key=lambda r: r["pos"])
        for a, b in zip(rows, rows[1:]):
            assert a["end_pos"] == b["pos"]
        assert rows[-1]["end_pos"] is None


def test_salted_join_oracle_parity(spark, sf_dir):
    assert_matches_oracle(spark, "skew_salted_join", sf_dir)


def test_salted_join_equals_plain_and_salts_keys(spark, sf_dir):
    """The salted join must equal the plain join row-for-row, and
    the physical join keys must include the salt column (that IS the
    skew mechanism)."""
    from aurora_cdc_demo_spark.operators import cdc_apply
    from aurora_cdc_demo_spark.sources.cdc_log import cdc_operation_log
    from aurora_cdc_demo_spark.tables import load_table
    from pyspark.sql import functions as F

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id"
    )
    dim = cdc_apply.latest_state(
        cdc_operation_log(spark, sf_dir)
    ).select("key_id", F.col("seq").alias("state_seq"))
    plain = {
        (r["event_id"], r["state_seq"])
        for r in events.join(
            dim, events.user_id == dim.key_id
        ).collect()
    }
    got = {
        (r["event_id"], r["state_seq"])
        for r in QUERIES["skew_salted_join"](spark, sf_dir).collect()
    }
    assert got == plain

    plan = plan_of(spark, sf_dir, "skew_salted_join")
    assert "_salt" in plan

    # the point of the pattern: one hot key's rows must NOT share a
    # single salt (a key-derived salt would leave the (key, salt)
    # distribution identical to key alone — ADVICE r2)
    from aurora_cdc_demo_spark.operators.skew import N_SALTS, row_salt

    salted = events.withColumn(
        "_salt", row_salt(events, "event_id", N_SALTS)
    )
    spread = (
        salted.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("_salt").alias("n_salts"),
        )
        .where(F.col("n") >= 2 * N_SALTS)
        .collect()
    )
    assert spread, "expected at least one key with >= 2*N_SALTS rows"
    for r in spread:
        assert r["n_salts"] > N_SALTS // 2, (
            r["user_id"],
            r["n"],
            r["n_salts"],
        )


def test_funnel_windowed_oracle_parity(spark, sf_dir):
    assert_matches_oracle(spark, "events_funnel_windowed", sf_dir)


def test_funnel_windowed_bounds_unbounded(spark, sf_dir):
    """The attribution window can only shrink each step's count, and
    step counts are monotone down the funnel."""
    unb = QUERIES["events_funnel"](spark, sf_dir).collect()[0]
    win = QUERIES["events_funnel_windowed"](spark, sf_dir).collect()[0]
    assert win["n_signup"] == unb["n_signup"]
    assert win["n_click_72h"] <= unb["n_click_after_signup"]
    assert win["n_purchase_72h"] <= unb["n_purchase_after_click"]
    assert win["n_signup"] >= win["n_click_72h"] >= win["n_purchase_72h"]
    assert win["n_click_72h"] > 0


def test_bloom_probe_unit(spark):
    """Unit law for the reusable bloom_probe operator: every true
    member passes (no false negatives), and flags are booleans over
    exactly the probe set."""
    from aurora_cdc_demo_spark.operators.sketches import (
        bloom_bits,
        bloom_probe,
    )

    members = spark.createDataFrame(
        [(f"member-{i}",) for i in range(50)], "g string"
    )
    probes = spark.createDataFrame(
        [(f"member-{i}",) for i in range(0, 50, 5)]
        + [(f"outsider-{i}",) for i in range(40)],
        "g string",
    )
    bits = bloom_bits(members, "g")
    got = {r["g"]: r["maybe_member"] for r in bloom_probe(probes, "g", bits).collect()}
    assert len(got) == 10 + 40
    for i in range(0, 50, 5):
        assert got[f"member-{i}"] is True
    # outsiders may false-positive, but at n=50, m=65536, k=3 the
    # expected FP rate is ~1e-8 — all should read False here
    assert sum(got[f"outsider-{i}"] for i in range(40)) == 0
