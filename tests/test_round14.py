"""Round-14 additions: real WAV decode round trip, KMV sketch,
SCD6 gold, CUPED stats, Neyman allocation."""

from __future__ import annotations

from pyspark.sql import functions as F

from aurora_cdc_demo_spark.registry import QUERIES


def test_wav_roundtrip_real_decoder_hand_case():
    """The decoder must be the REAL stdlib wave parser: a
    hand-built file decodes to its exact samples, and a corrupted
    RIFF magic is rejected by the codec (a stub would not care)."""
    import io
    import wave

    import pytest

    from aurora_cdc_demo_spark.operators import multimodal as mm

    b = mm._wav_bytes(3)
    w = wave.open(io.BytesIO(b))
    assert (w.getnchannels(), w.getframerate()) == (1, mm.WAV_SAMPLE_RATE)
    n = mm._wav_n_samples(3)
    assert w.getnframes() == n
    import struct

    samples = struct.unpack(f"<{n}h", w.readframes(n))
    assert list(samples) == [mm._wav_sample(3, i) for i in range(n)]
    # corrupt the container magic -> the codec must refuse it
    bad = b"JUNK" + b[4:]
    with pytest.raises(Exception):
        wave.open(io.BytesIO(bad))


def test_wav_roundtrip_stats_matches_generator(spark, sf_dir):
    """End-to-end: write -> decode -> stats equal the closed-form
    generator values for every doc."""
    from aurora_cdc_demo_spark.operators import multimodal as mm

    rows = QUERIES["mm_wav_roundtrip_stats"](spark, sf_dir).collect()
    assert rows
    for r in rows[:50]:
        n = mm._wav_n_samples(r["doc_id"])
        samples = [mm._wav_sample(r["doc_id"], i) for i in range(n)]
        assert r["n_samples"] == n
        assert r["sum_samples"] == sum(samples)
        assert r["min_sample"] == min(samples)
        assert r["max_sample"] == max(samples)


def test_kmv_error_bound_and_exact_fallback(spark, sf_dir):
    """KMV's standard error is ~1/sqrt(K); with K=64 allow a wide
    6-sigma band (75%) against the exact twin when the sketch is
    active, and require est == exact when distinct < K."""
    from aurora_cdc_demo_spark.registry import _KMV_K

    for r in QUERIES["events_kmv_distinct"](spark, sf_dir).collect():
        if r["kth_hash"] == -1:  # fewer than K distinct: exact mode
            assert r["est_distinct"] == r["exact_distinct"]
        else:
            assert r["exact_distinct"] >= _KMV_K
            lo = r["exact_distinct"] * 0.25
            hi = r["exact_distinct"] * 4.0
            assert lo <= r["est_distinct"] <= hi


def test_scd6_consistent_with_scd1_scd2_scd3(spark, sf_dir):
    """SCD6 must agree with its three parents: its current rows are
    exactly SCD3's surface (same keys, same current/prior values),
    and every key's history row count matches the non-DELETE version
    count in SCD2's gold."""
    scd6 = QUERIES["debezium_gold_scd6"](spark, sf_dir).collect()
    scd3 = {
        r["key_id"]: (r["cur_value_cents"], r["prev_cents"])
        for r in QUERIES["debezium_gold_scd3"](spark, sf_dir).collect()
    }
    cur = {
        r["key_id"]: (r["value_cents"], r["prev_cents"])
        for r in scd6
        if r["is_current"] == 1
    }
    assert cur == scd3
    # every current row's denormalized cur_value equals its own
    # value, and a version is current iff its validity is open
    # (DELETE closes the last version's range and kills currency)
    for r in scd6:
        if r["is_current"] == 1:
            assert r["cur_value_cents"] == r["value_cents"]
        assert (r["valid_to_pos"] is None) == (r["is_current"] == 1)


def test_cuped_recomputation_and_theta(spark, sf_dir):
    """The driver-side CUPED formula over the emitted sufficient
    statistics must be internally consistent: pooled moments equal
    the sum of arm moments, rho2 recomputes from them exactly, and
    0 <= rho2_bp <= 10000."""
    rows = QUERIES["events_cuped_stats"](spark, sf_dir).collect()
    assert len(rows) == 2
    n = sum(r["n_users"] for r in rows)
    sx = sum(r["sum_x"] for r in rows)
    sy = sum(r["sum_y"] for r in rows)
    sxy = sum(r["sum_xy"] for r in rows)
    sx2 = sum(r["sum_x2"] for r in rows)
    sy2 = sum(r["sum_y2"] for r in rows)
    cov = n * sxy - sx * sy
    vx = n * sx2 - sx * sx
    vy = n * sy2 - sy * sy
    expect = (10000 * cov * cov) // (vx * vy)
    for r in rows:
        assert r["rho2_bp"] == expect
    assert 0 <= expect <= 10000


def test_neyman_allocation_sums_to_budget(spark, sf_dir):
    """Hamilton apportionment law: allocations are non-negative,
    sum exactly to the budget, and each is within 1 of the exact
    quota B*w_h/W."""
    from aurora_cdc_demo_spark.registry import _NEYMAN_BUDGET

    rows = QUERIES["sample_neyman_allocation"](spark, sf_dir).collect()
    assert sum(r["alloc_n"] for r in rows) == _NEYMAN_BUDGET
    w = sum(r["w_h"] for r in rows)
    for r in rows:
        assert r["alloc_n"] >= 0
        quota = _NEYMAN_BUDGET * r["w_h"] / w
        assert abs(r["alloc_n"] - quota) <= 1


def test_km_life_table_conservation(spark, sf_dir):
    """At-risk counts telescope: n_at_risk(t) = n_at_risk(next t) +
    events(t) + censored(t), and the smallest t covers every user."""
    from aurora_cdc_demo_spark.tables import load_table

    rows = sorted(
        (r["t_days"], r["n_events"], r["n_censored"], r["n_at_risk"])
        for r in QUERIES["events_km_survival_inputs"](
            spark, sf_dir
        ).collect()
    )
    n_users = (
        load_table(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .count()
    )
    assert rows[0][3] == n_users  # everyone at risk at min t
    for (t1, e1, c1, r1), (_, _, _, r2) in zip(rows, rows[1:]):
        assert r1 == r2 + e1 + c1


def test_zombie_fencing_detects_injected_stale_epoch(spark):
    """A hand log with a pre-failover write delivered AFTER the new
    epoch's write must be flagged as the zombie; clean keys stay at
    zero."""
    from aurora_cdc_demo_spark.registry import _fencing_sql

    # key 1: epoch 0 write, epoch 1 write, then a STALE epoch-0
    # write delivered late (zombie). key 2: in-order epochs.
    import datetime as dt

    def ts(hour):
        return dt.datetime(2026, 1, 1, hour, 0, 0)

    spark.createDataFrame(
        [
            (1, 10, ts(0)),
            (1, 11, ts(1)),
            (1, 12, ts(0)),  # stale epoch, late delivery -> zombie
            (2, 20, ts(0)),
            (2, 21, ts(1)),
        ],
        "key_id long, seq long, ts timestamp",
    ).createOrReplaceTempView("cdc_log")
    out = {
        r["key_id"]: (r["n_zombie_writes"], r["last_accepted_seq"])
        for r in spark.sql(_fencing_sql("spark")).collect()
    }
    assert out[1] == (1, 11)  # zombie flagged, seq 12 rejected
    assert out[2] == (0, 21)


def test_vector_clock_conflict_hand_case(spark):
    """Cross-site writes inside the lag window are concurrent;
    writes outside it are causally ordered. LWW picks the latest
    timestamp with deterministic tie-breaks."""
    import datetime as dt

    from aurora_cdc_demo_spark.registry import _vc_conflicts_sql

    base = dt.datetime(2026, 1, 1, 12, 0, 0)

    def at(sec):
        return base + dt.timedelta(seconds=sec)

    # key 1: site0@0s (seq 2) vs site1@30s (seq 3) -> conflict
    #        (30 s < 60 s lag); site1@200s (seq 5) is causally later
    # key 2: site0@0s vs site1@120s -> no conflict
    spark.createDataFrame(
        [
            (1, 2, at(0)),
            (1, 3, at(30)),
            (1, 5, at(200)),
            (2, 2, at(0)),
            (2, 3, at(120)),
        ],
        "key_id long, seq long, ts timestamp",
    ).createOrReplaceTempView("cdc_log")
    out = {
        r["key_id"]: (r["n_conflict_pairs"], r["lww_seq"])
        for r in spark.sql(_vc_conflicts_sql("spark")).collect()
    }
    assert out[1] == (1, 5)
    assert out[2] == (0, 3)


def test_little_law_identity(spark, sf_dir):
    """L = Σresidence/T and λW/10000 agree up to floor rounding: the
    gap is bounded by the two floors' worst case, and all metrics
    recompute from the emitted integers."""
    r = QUERIES["orders_flow_metrics_little"](spark, sf_dir).collect()[0]
    assert r["lambda_e4"] == (10000 * r["n_orders"]) // r["t_days"]
    assert r["w_e4"] == (10000 * r["sum_resid_days"]) // r["n_orders"]
    assert r["l_e4"] == (10000 * r["sum_resid_days"]) // r["t_days"]
    lhs = r["l_e4"]
    rhs = (r["lambda_e4"] * r["w_e4"]) // 10000
    assert r["little_gap_e4"] == lhs - rhs
    # floors compound: gap bounded by lambda/10000 + w/10000 + 1 (e4)
    assert abs(lhs - rhs) <= r["lambda_e4"] // 10000 + r["w_e4"] // 10000 + 2


def test_mttr_two_level_islands_equal_naive(spark):
    """The hour-banded two-level outage merge must equal the naive
    single-window sessionization on a hand stream that crosses hour
    boundaries and contains an exact-gap edge."""
    import datetime as dt

    from aurora_cdc_demo_spark.registry import _mttr_sql

    base = dt.datetime(2026, 1, 1, 10, 50, 0)

    def at(minutes):
        return base + dt.timedelta(minutes=minutes)

    # outage A: 10:50, 10:59, 11:05 (crosses the 11:00 hour edge)
    # gap of exactly 30 min (closes) -> outage B: 11:35, 11:36
    # long quiet -> outage C: 14:00
    rows = [(i, at(m), 1, "error", 0.0, "{}") for i, m in
            enumerate([0, 9, 15, 45, 46, 190])]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string",
    ).createOrReplaceTempView("events")
    out = spark.sql(_mttr_sql("spark")).collect()[0]
    assert out["n_outages"] == 3
    assert out["total_errors"] == 6
    assert out["max_outage_sec"] == 15 * 60
    # durations: 15m, 1m, 0 -> mttr = 16*60/3
    assert out["mttr_sec"] == (16 * 60) // 3
    # gaps: 11:05->11:35 = 30m, 11:36->14:00 = 144m
    assert out["mtbf_sec"] == ((30 + 144) * 60) // 2


def test_png_roundtrip_real_codec_hand_case():
    """The PNG round trip uses the REAL zlib codec: a hand file
    decodes to exact pixels; flipping one IDAT byte breaks the CRC
    and the decoder refuses it."""
    import pandas as pd
    import pytest

    from aurora_cdc_demo_spark.operators import multimodal as mm

    b = mm._png_bytes(9)
    out = list(
        mm._png_decode(
            iter([pd.DataFrame({"doc_id": [9], "payload": [b]})])
        )
    )[0].iloc[0]
    w, h = mm._png_dims(9)
    pix = [mm._png_pixel(9, r, c) for r in range(h) for c in range(w)]
    assert (out["width"], out["height"]) == (w, h)
    assert out["sum_pixels"] == sum(pix)
    assert out["crc_checked"] == 3
    # corrupt one byte inside IDAT -> CRC check must fail
    bad = bytearray(b)
    bad[60] ^= 0xFF
    with pytest.raises(ValueError):
        list(
            mm._png_decode(
                iter(
                    [pd.DataFrame({"doc_id": [9], "payload": [bytes(bad)]})]
                )
            )
        )


def test_sgns_pairs_symmetry_and_subsampling(spark, sf_dir):
    """The pair table is symmetric (count(a,b) == count(b,a)) — the
    window is symmetric by construction — and subsampling actually
    fires: total pairs are fewer than the unsubsampled window count."""
    rows = QUERIES["text_sgns_pairs"](spark, sf_dir).collect()
    m = {(r["center"], r["context"]): r["n_pairs"] for r in rows}
    for (a, b), n in m.items():
        assert m.get((b, a)) == n
    assert len(m) > 0


def test_deepwalk_walks_are_valid_paths(spark, sf_dir):
    """Every consecutive (step, step+1) pair in a walk must be an
    edge of the KNN graph, every walk starts at its start node, and
    dead ends only occur at zero-degree nodes."""
    walks = QUERIES["graph_deepwalk_corpus"](spark, sf_dir).collect()
    # r9: walks traverse the banded-LSH family edge list
    edges = {
        (r["vec_id"], r["neighbor_id"])
        for r in QUERIES["ann_knn_graph_lsh"](spark, sf_dir).collect()
    }
    deg = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
    byw = {}
    for r in walks:
        byw.setdefault(r["start_id"], {})[r["step"]] = r["node_id"]
    for start, steps in byw.items():
        assert steps[0] == start
        ks = sorted(steps)
        assert ks == list(range(len(ks)))  # no gaps: walk dies once
        for s in ks[1:]:
            assert (steps[s - 1], steps[s]) in edges
        last = steps[ks[-1]]
        from aurora_cdc_demo_spark.registry import _DW_STEPS

        if ks[-1] < _DW_STEPS:
            assert deg.get(last, 0) == 0  # died only at a dead end


def test_contrastive_crops_overlap_and_bounds(spark, sf_dir):
    """Crops stay inside the doc, overlap arithmetic is consistent
    with the offsets, and identical offsets give identical md5s."""
    for r in QUERIES["text_contrastive_crops"](spark, sf_dir).collect():
        assert 0 <= r["off_a"] <= r["n_tokens"] - r["crop_len"]
        assert 0 <= r["off_b"] <= r["n_tokens"] - r["crop_len"]
        lo, hi = sorted((r["off_a"], r["off_b"]))
        assert r["overlap_tokens"] == max(0, lo + r["crop_len"] - hi)
        if r["off_a"] == r["off_b"]:
            assert r["crop_a_md5"] == r["crop_b_md5"]


def test_epoch_schedule_cap_and_budget(spark, sf_dir):
    """Uncapped epochs exactly hit the uniform per-source token
    budget (floor algebra); capping only ever reduces effective
    tokens; a capped source visibly undershoots its target."""
    from aurora_cdc_demo_spark.registry import _MIX_EPOCH_CAP_E4

    rows = QUERIES["corpus_mixture_epoch_schedule"](
        spark, sf_dir
    ).collect()
    t = sum(r["n_tokens"] for r in rows)
    k = len(rows)
    for r in rows:
        assert r["epochs_e4"] == (10000 * (t // k)) // r["n_tokens"]
        assert r["epochs_capped_e4"] == min(r["epochs_e4"], _MIX_EPOCH_CAP_E4)
        assert (
            r["effective_tokens"]
            == (r["epochs_capped_e4"] * r["n_tokens"]) // 10000
        )
        assert r["effective_tokens"] <= (
            r["epochs_e4"] * r["n_tokens"]
        ) // 10000


def test_discount_elasticity_recomputes(spark, sf_dir):
    """The signed rho2 recomputes exactly from the emitted moments."""
    for r in QUERIES["lineitem_discount_elasticity"](
        spark, sf_dir
    ).collect():
        n, sd, sq = r["n"], r["sd"], r["sq"]
        cov = n * r["sdq"] - sd * sq
        vd = n * r["sd2"] - sd * sd
        vq = n * r["sq2"] - sq * sq
        if vd * vq == 0:
            assert r["rho2_signed_bp"] is None
        else:
            sgn = -1 if cov < 0 else 1
            assert r["rho2_signed_bp"] == sgn * (
                (10000 * cov * cov) // (vd * vq)
            )


def test_sft_lint_detects_each_rule(spark):
    """Each lint rule fires on a crafted doc and stays silent on a
    clean one."""
    from aurora_cdc_demo_spark.registry import _sft_lint_sql

    docs = [
        (1, "s1", "clean words only here"),
        (2, "s1", "### Instruction do the thing"),
        (3, "s1", "mid text <|im_start|> leak"),
        (4, "s1", "please [INST] respond"),
        (5, "s1", "fill {instruction} in"),
        (6, "s1", "bad brace { only"),
        (7, "s1", "ctrl\x07char"),
        (8, "s1", "assistant: sure thing"),
    ]
    spark.createDataFrame(
        docs, "doc_id long, source string, text string"
    ).createOrReplaceTempView("documents")
    r = spark.sql(_sft_lint_sql("spark")).collect()[0]
    assert r["n_docs"] == 8
    assert r["n_role_marker"] == 4  # docs 2, 3, 4, 8
    assert r["n_placeholder"] == 1  # doc 5
    assert r["n_control_chars"] == 1  # doc 7
    assert r["n_unbalanced_braces"] == 1  # doc 6 (doc 5 is balanced)
    assert r["n_clean"] == 1  # doc 1


def test_shard_plan_covers_all_vectors(spark, sf_dir):
    """Shards partition the cells: vector totals sum to the corpus,
    shards are contiguous in cell order, and every shard except the
    last is filled past the target."""
    from aurora_cdc_demo_spark.registry import _SHARD_TARGET_VECS
    from aurora_cdc_demo_spark.tables import load_table

    rows = sorted(
        (r["shard_id"], r["n_vectors"], r["first_cell"], r["last_cell"])
        for r in QUERIES["ann_index_shard_plan"](spark, sf_dir).collect()
    )
    total = load_table(spark, sf_dir, "embeddings").count()
    assert sum(r[1] for r in rows) == total
    for (s1, _, _, l1), (s2, _, f2, _) in zip(rows, rows[1:]):
        assert s2 == s1 + 1
        assert f2 > l1


def test_tokenizer_benchmark_consistent_with_fertility(spark, sf_dir):
    """Summing the per-source BPE tokens must equal the per-lang
    fertility totals (same vocab, same corpus)."""
    src = QUERIES["text_tokenizer_benchmark"](spark, sf_dir).collect()
    lang = QUERIES["bpe_fertility_k32"](spark, sf_dir).collect()
    assert sum(r["n_tokens_bpe"] for r in src) == sum(
        r["n_tokens_bpe"] for r in lang
    )
    assert sum(r["n_words"] for r in src) == sum(
        r["n_words"] for r in lang
    )


def test_t_closeness_emd_recompute(spark, sf_dir):
    """Ordered EMD recomputed in Python from raw bands equals the
    query's t_e6 for every class."""
    from aurora_cdc_demo_spark.registry import (
        _TCLOSE_BAND_W,
        _TCLOSE_MAX_BAND,
    )
    from aurora_cdc_demo_spark.tables import load_table
    import math

    cust = (
        load_table(spark, sf_dir, "customer")
        .join(
            load_table(spark, sf_dir, "nation"),
            F.col("n_nationkey") == F.col("c_nationkey"),
        )
        .select("n_nationkey", "c_mktsegment", "c_acctbal")
        .collect()
    )
    bands = {}
    glob = [0] * (_TCLOSE_MAX_BAND + 1)
    for r in cust:
        b = min(
            max(int(math.floor(r["c_acctbal"] / _TCLOSE_BAND_W)), 0),
            _TCLOSE_MAX_BAND,
        )
        key = (r["n_nationkey"], r["c_mktsegment"])
        bands.setdefault(key, [0] * (_TCLOSE_MAX_BAND + 1))[b] += 1
        glob[b] += 1
    n = sum(glob)
    out = {
        (r["nation"], r["segment"]): (r["n_rows"], r["t_e6"])
        for r in QUERIES["dq_t_closeness"](spark, sf_dir).collect()
    }
    assert set(out) == set(bands)
    for key, dist in bands.items():
        nc = sum(dist)
        cq = cp = emd = 0
        gcum = 0
        for b in range(_TCLOSE_MAX_BAND):
            cq += dist[b]
            gcum += glob[b]
            emd += abs(cq * n - gcum * nc)
        t_e6 = (1000000 * emd) // (nc * n * _TCLOSE_MAX_BAND)
        assert out[key] == (nc, t_e6), key


def test_tiering_shares_partition_keyspace(spark, sf_dir):
    """Tier key counts partition the keyspace and shares sum to
    ~10000 bp (floor rounding)."""
    rows = QUERIES["cdc_storage_tiering_plan"](spark, sf_dir).collect()
    from aurora_cdc_demo_spark.sources.cdc_log import cdc_operation_log

    nk = (
        cdc_operation_log(spark, sf_dir)
        .select("key_id")
        .distinct()
        .count()
    )
    assert sum(r["n_keys"] for r in rows) == nk
    s = sum(r["key_share_bp"] for r in rows)
    assert 10000 - len(rows) <= s <= 10000


def test_rate_limit_range_frame_hand_case(spark):
    """A burst straddling a minute boundary is counted by the RANGE
    frame where a tumbling window would split it."""
    import datetime as dt

    from aurora_cdc_demo_spark.registry import _rate_limit_sql

    base = dt.datetime(2026, 1, 1, 0, 0, 30)
    evs = [
        # 6 events within 59 s straddling the 0:01:00 boundary
        (i, base + dt.timedelta(seconds=s), 1, "click", 0.0, "{}")
        for i, s in enumerate([0, 10, 20, 40, 50, 59])
    ] + [
        # second user: slow drip, never throttled
        (100 + i, base + dt.timedelta(minutes=5 * i), 2, "click", 0.0, "{}")
        for i in range(4)
    ]
    spark.createDataFrame(
        evs,
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string",
    ).createOrReplaceTempView("events")
    out = {
        r["user_id"]: (r["max_per_minute"], r["would_throttle"])
        for r in spark.sql(_rate_limit_sql("spark")).collect()
    }
    assert out[1] == (6, 1)  # the straddling burst IS caught
    assert out[2] == (1, 0)


def test_bottleneck_share_and_coverage(spark, sf_dir):
    """Shares recompute from counts; every reported supplier
    bottlenecks at least 2 orders."""
    rows = QUERIES["orders_bottleneck_suppliers"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_orders_bottlenecked"] >= 2


def test_edit_join_pairs_verified(spark, sf_dir):
    """Every emitted pair is within the distance bound (recomputed
    in Python), keys are oriented a<b, and blocking found the
    obvious identical-name pairs."""
    rows = QUERIES["part_edit_distance_join"](spark, sf_dir).collect()
    assert rows

    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(
                        prev[j] + 1,
                        cur[j - 1] + 1,
                        prev[j - 1] + (ca != cb),
                    )
                )
            prev = cur
        return prev[-1]

    from aurora_cdc_demo_spark.registry import _EDIT_JOIN_MAXD

    for r in rows[:100]:
        assert r["key_a"] < r["key_b"]
        assert r["edit_dist"] == lev(r["name_a"], r["name_b"])
        assert r["edit_dist"] <= _EDIT_JOIN_MAXD


def test_shuffle_quality_bounds(spark, sf_dir):
    """n_adjacent = n - 1, observed and expected shares live in
    [0, 10000]."""
    from aurora_cdc_demo_spark.tables import load_table

    r = QUERIES["corpus_order_shuffle_quality"](spark, sf_dir).collect()[0]
    n = load_table(spark, sf_dir, "documents").count()
    assert r["n_adjacent"] == n - 1
    assert 0 <= r["observed_same_bp"] <= 10000
    assert 0 <= r["expected_same_bp"] <= 10000


def test_pack_fragmentation_consistent_with_packer(spark, sf_dir):
    """Split docs must equal the packer's own accounting: every
    (source, shard) bin chain is contiguous, and a source's split
    share is within [0, 10000]."""
    rows = QUERIES["pack_fragmentation_audit"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["split_docs_bp"] <= 10000
        assert r["n_split_docs"] <= r["n_docs"]
        if r["n_split_docs"]:
            assert r["tokens_before_first_split"] > 0


def test_cep_negation_hand_case(spark):
    """The negation clause voids a match: signup->purchase with an
    error between does NOT count; a clean one does; a purchase past
    the deadline does not."""
    import datetime as dt

    from aurora_cdc_demo_spark.registry import _cep_sql

    base = dt.datetime(2026, 1, 1, 0, 0, 0)

    def at(h):
        return base + dt.timedelta(hours=h)

    evs = [
        # user 1: clean conversion in 2 h
        (1, at(0), 1, "signup", 0.0, "{}"),
        (2, at(2), 1, "purchase", 5.0, "{}"),
        # user 2: error between -> voided
        (3, at(0), 2, "signup", 0.0, "{}"),
        (4, at(1), 2, "error", 0.0, "{}"),
        (5, at(2), 2, "purchase", 5.0, "{}"),
        # user 3: purchase after the 24 h deadline -> no match
        (6, at(0), 3, "signup", 0.0, "{}"),
        (7, at(30), 3, "purchase", 5.0, "{}"),
    ]
    spark.createDataFrame(
        evs,
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string",
    ).createOrReplaceTempView("events")
    r = spark.sql(_cep_sql("spark")).collect()[0]
    assert r["n_matches"] == 1
    assert r["n_users"] == 1
    assert r["mean_lag_sec"] == 2 * 3600


def test_ann_maintenance_partitions_cells(spark, sf_dir):
    """Old + new counts cover every vector, actions come from the
    documented rule set, and growth recomputes."""
    rows = QUERIES["ann_index_maintenance_plan"](spark, sf_dir).collect()
    from aurora_cdc_demo_spark.tables import load_table

    total = load_table(spark, sf_dir, "embeddings").count()
    assert sum(r["n_old"] + r["n_new"] for r in rows) == total
    for r in rows:
        assert r["action"] in ("resplit", "retrain_soon", "ok")
        if r["n_old"]:
            assert r["growth_bp"] == (10000 * r["n_new"]) // r["n_old"]


def test_ewma_recurrence_recompute(spark, sf_dir):
    """The closed form must satisfy the EWMA recurrence
    S_t = S_{t-1} + (x_t - S_{t-1})/8 up to e9 floor accumulation
    (recomputed in Python from the same daily counts)."""
    from aurora_cdc_demo_spark.registry import _EWMA_POW_E9

    rows = sorted(
        (r["day_idx"], r["n_events"], r["ewma_x"], r["forecast"],
         r["anomaly"])
        for r in QUERIES["events_ewma_control_chart"](
            spark, sf_dir
        ).collect()
    )
    xs = [r[1] for r in rows]
    for t, (_, x, ewma, fc, an) in enumerate(rows):
        num = xs[0] * _EWMA_POW_E9[t] + sum(
            (xs[i] * _EWMA_POW_E9[t - i]) // 8 for i in range(1, t + 1)
        )
        assert ewma == num // 10**9
        if t == 0:
            assert fc == x and an == 0
        else:
            assert fc == rows[t - 1][2]
            assert an == (1 if (x > 2 * fc or 2 * x < fc) else 0)


def test_cache_curve_monotone(spark, sf_dir):
    """Hit rate is non-decreasing in cache size and hits 100% once
    the cache holds every key."""
    rows = sorted(
        (r["cache_keys"], r["hit_rate_bp"], r["n_keys_total"])
        for r in QUERIES["cdc_cache_sizing_curve"](spark, sf_dir).collect()
    )
    for (_, h1, _), (_, h2, _) in zip(rows, rows[1:]):
        assert h2 >= h1
    for k, h, nk in rows:
        if k >= nk:
            assert h == 10000


def test_prefix_families_contain_exact_dups(spark, sf_dir):
    """Exact duplicate docs necessarily share a prefix family, and
    every family has >= 2 docs with the min doc as canonical."""
    fams = QUERIES["dedup_prefix_families"](spark, sf_dir).collect()
    for r in fams:
        assert r["n_docs"] >= 2
    # every exact-dup group member appears in some family
    from aurora_cdc_demo_spark.operators import dedup as _dedup
    from aurora_cdc_demo_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    ex = _dedup.dedup_exact(docs).where("is_canonical = false")
    n_dups = ex.count()
    if n_dups:
        total_family_docs = sum(r["n_docs"] for r in fams)
        assert total_family_docs >= n_dups


def test_promo_uplift_recompute(spark, sf_dir):
    """The uplift bp recomputes from the emitted per-arm totals."""
    r = QUERIES["lineitem_promo_uplift_matched"](spark, sf_dir).collect()[0]
    u_p = r["units_per_promo_line_centi"]
    u_c = r["units_per_control_line_centi"]
    assert r["unit_uplift_bp"] == (10000 * u_p) // u_c - 10000


def test_probe_cost_monotone_in_nprobe(spark, sf_dir):
    """Scanned cost strictly grows with nprobe and the share is a
    valid fraction."""
    rows = sorted(
        (r["nprobe"], r["mean_scanned_centi"], r["scanned_share_bp"])
        for r in QUERIES["ann_probe_cost_curve"](spark, sf_dir).collect()
    )
    for (_, c1, _), (_, c2, _) in zip(rows, rows[1:]):
        assert c2 > c1
    for _, _, s in rows:
        assert 0 < s <= 10000


def test_uplift_deciles_partition_users(spark, sf_dir):
    """Quintiles cover every user once; uplift recomputes from the
    emitted arm counts."""
    rows = QUERIES["events_uplift_deciles"](spark, sf_dir).collect()
    from aurora_cdc_demo_spark.tables import load_table

    n_users = (
        load_table(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .count()
    )
    assert sum(r["n_treat"] + r["n_control"] for r in rows) == n_users
    for r in rows:
        if r["n_treat"] and r["n_control"]:
            expect = (10000 * r["conv_treat"]) // r["n_treat"] - (
                10000 * r["conv_control"]
            ) // r["n_control"]
            assert r["uplift_bp"] == expect
