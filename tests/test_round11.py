"""Round-11 additions: HLL set algebra (audience overlap),
k-anonymity risk profile, hashed linear quality classifier, Hilbert
layout keys."""

from __future__ import annotations

import hashlib

from aurora_cdc_demo_spark.registry import (
    QUERIES,
    _CLF_BIAS_E4,
    _CLF_BUCKETS,
)
from aurora_cdc_demo_spark.operators import hilbert as H


# ---------------------------------------------------------------------------
# Hilbert
# ---------------------------------------------------------------------------


def test_hilbert_lut_matches_reference_everywhere():
    """The two-nibble LUT walk equals the textbook xy2d on the FULL
    256×256 grid — and is therefore bijective (the reference is)."""
    lut = {k: (d, s) for k, d, s in H.hilbert_lut_rows()}
    seen = set()
    for x in range(256):
        for y in range(256):
            d1, st = lut[0 * 256 + (x // 16) * 16 + (y // 16)]
            d2, _ = lut[st * 256 + (x % 16) * 16 + (y % 16)]
            key = d1 * 256 + d2
            assert key == H.xy2d(256, x, y)
            seen.add(key)
    assert len(seen) == 65536


def test_hilbert_adjacent_keys_are_adjacent_cells():
    """Defining property Morton lacks: consecutive Hilbert indices
    are Manhattan-distance-1 neighbors. Checked via the inverse map
    built from the forward walk."""
    inv = {}
    lut = {k: (d, s) for k, d, s in H.hilbert_lut_rows()}
    for x in range(256):
        for y in range(256):
            d1, st = lut[(x // 16) * 16 + (y // 16)]
            d2, _ = lut[st * 256 + (x % 16) * 16 + (y % 16)]
            inv[d1 * 256 + d2] = (x, y)
    for k in range(65535):
        (x1, y1), (x2, y2) = inv[k], inv[k + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1


def test_hilbert_key_spark_matches_reference(spark, sf_dir):
    """Engine-side key equals xy2d for every event row."""
    rows = QUERIES["events_hilbert_key"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["hkey"] == H.xy2d(256, r["x8"], r["y8"])
        assert r["hbucket"] == r["hkey"] // 1024


def test_layout_hilbert_compare_laws(spark, sf_dir):
    """Single-key layouts scan EVERYTHING on the opposite probe;
    both curves prune BOTH probes; chunk counts bounded by the
    configured chunk budget."""
    rows = QUERIES["layout_hilbert_compare"](spark, sf_dir).collect()
    by = {(r["layout"], r["probe"]): r for r in rows}
    assert len(by) == 8
    assert by[("ts", "user_band")]["rows_scanned_bp"] == 10000
    assert by[("user", "hour_band")]["rows_scanned_bp"] == 10000
    for curve in ("zorder8", "hilbert8"):
        for probe in ("user_band", "hour_band"):
            r = by[(curve, probe)]
            assert r["rows_scanned_bp"] < 10000
            assert r["chunks_scanned"] <= r["n_chunks"] <= 64


# ---------------------------------------------------------------------------
# HLL overlap
# ---------------------------------------------------------------------------


def test_hll_overlap_set_algebra_laws(spark, sf_dir):
    """Union ≤ sum of parts (register-wise MAX can only shrink the
    I-E sum); intersection clamped ≥ 0 and ≤ min(est_a, est_b) + the
    register error budget; exact columns obey true set identities;
    estimate stays inside a generous 256-register error band."""
    rows = QUERIES["events_hll_overlap"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["est_union"] <= r["est_a"] + r["est_b"]
        assert r["est_inter"] >= 0
        assert r["exact_inter"] <= r["exact_union"]
        assert 0 <= r["jacc_exact_bp"] <= 10000
        assert 0 <= r["jacc_est_bp"] <= 10000
        # inclusion-exclusion error ~ 3 estimates' worth of the
        # sigma ≈ 1.04/sqrt(256) = 6.5% band, against the union size
        assert abs(r["est_inter"] - r["exact_inter"]) <= max(
            60, 0.25 * r["exact_union"]
        )


def test_hll_overlap_jaccard_recomputation(spark, sf_dir):
    rows = QUERIES["events_hll_overlap"](spark, sf_dir).collect()
    for r in rows:
        assert (
            r["jacc_est_bp"] == (10000 * r["est_inter"]) // r["est_union"]
        )
        assert (
            r["jacc_exact_bp"]
            == (10000 * r["exact_inter"]) // r["exact_union"]
        )


# ---------------------------------------------------------------------------
# k-anonymity
# ---------------------------------------------------------------------------


def test_k_anonymity_monotone_and_consistent(spark, sf_dir):
    rows = sorted(
        QUERIES["dq_k_anonymity"](spark, sf_dir).collect(),
        key=lambda r: r["k"],
    )
    assert [r["k"] for r in rows] == [2, 5, 10, 25]
    n_rows = rows[0]["n_rows"]
    kanon = rows[0]["k_anonymity"]
    prev_g = prev_r = -1
    for r in rows:
        assert r["n_rows"] == n_rows and r["k_anonymity"] == kanon
        assert r["groups_below_k"] >= prev_g
        assert r["rows_below_k"] >= prev_r
        assert r["rows_below_bp"] == (10000 * r["rows_below_k"]) // n_rows
        # a group below k exists iff the dataset's k-anonymity < k
        assert (r["groups_below_k"] > 0) == (kanon < r["k"])
        prev_g, prev_r = r["groups_below_k"], r["rows_below_k"]


def test_k_anonymity_counts_customer_rows(spark, sf_dir):
    import duckdb

    n = duckdb.sql(
        f"SELECT COUNT(*) FROM '{sf_dir}/customer.parquet'"
    ).fetchone()[0]
    rows = QUERIES["dq_k_anonymity"](spark, sf_dir).collect()
    assert all(r["n_rows"] == n for r in rows)


# ---------------------------------------------------------------------------
# hashed linear classifier
# ---------------------------------------------------------------------------


def test_classifier_score_recomputation(spark, sf_dir):
    """Recompute the logit independently in Python (md5 bucket →
    weight, posrem-floor mean + bias) for every doc."""
    import random

    rng = random.Random(4242)
    w = [rng.randrange(-20000, 20001) for _ in range(_CLF_BUCKETS)]

    import duckdb

    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    got = {
        r["doc_id"]: r
        for r in QUERIES["text_classifier_score"](spark, sf_dir).collect()
    }
    assert len(got) == len(docs)
    for doc_id, text in docs:
        toks = text.split(" ")
        s = sum(
            w[
                int(hashlib.md5(t.encode()).hexdigest()[:8], 16)
                % _CLF_BUCKETS
            ]
            for t in toks
        )
        n = len(toks)
        logit = (s - (((s % n) + n) % n)) // n + _CLF_BIAS_E4
        r = got[doc_id]
        assert r["n_tokens"] == n
        assert r["logit_e4"] == logit
        assert r["keep_flag"] == (1 if logit > 0 else 0)


# ---------------------------------------------------------------------------
# v7 keep-list refinement
# ---------------------------------------------------------------------------


def test_v7_refines_v6(spark, sf_dir):
    """v7 keeps ⊆ v6 keeps; every newly-dropped doc carries
    decision = model_reject; rule reason codes are untouched."""
    for suffix in ("", "_lsh"):
        v6 = {
            r["doc_id"]: r
            for r in QUERIES[f"corpus_keep_list_v6{suffix}"](
                spark, sf_dir
            ).collect()
        }
        v7 = {
            r["doc_id"]: r
            for r in QUERIES[f"corpus_keep_list_v7{suffix}"](
                spark, sf_dir
            ).collect()
        }
        assert set(v6) == set(v7)
        for d, r7 in v7.items():
            r6 = v6[d]
            if r7["keep"]:
                assert r6["keep"]
            if r6["keep"] and not r7["keep"]:
                assert r7["decision"] == "model_reject"
            if r6["decision"] not in ("keep", "sampled_out"):
                assert r7["decision"] == r6["decision"]


def test_v7_model_gate_agrees_with_classifier(spark, sf_dir):
    clf = {
        r["doc_id"]: r["keep_flag"]
        for r in QUERIES["text_classifier_score"](spark, sf_dir).collect()
    }
    for r in QUERIES["corpus_keep_list_v7"](spark, sf_dir).collect():
        if r["decision"] == "model_reject":
            assert clf[r["doc_id"]] == 0
        if r["keep"]:
            assert clf[r["doc_id"]] == 1


# ---------------------------------------------------------------------------
# hybrid retrieval + hard negatives
# ---------------------------------------------------------------------------


def test_rrf_fusion_laws(spark, sf_dir):
    """RRF score equals the floor-scaled identity recomputed from
    the emitted ranks; fused order is dense in 1..n; arm ranks stay
    within their top-N windows; at least one arm contributed to
    every row."""
    rows = QUERIES["retrieval_rrf_hybrid"](spark, sf_dir).collect()
    assert rows
    got_ranks = sorted(r["fused_rank"] for r in rows)
    assert got_ranks == list(range(1, len(rows) + 1))
    for r in rows:
        expect = 0
        if r["bm25_rank"] > 0:
            assert 1 <= r["bm25_rank"] <= 10
            expect += 1000000 // (60 + r["bm25_rank"])
        if r["dense_rank"] > 0:
            assert 1 <= r["dense_rank"] <= 10
            expect += 1000000 // (60 + r["dense_rank"])
        assert expect > 0
        assert r["rrf_e6"] == expect


def test_rrf_both_arms_rank1_outranks_single_arm(spark, sf_dir):
    """A doc present in BOTH arms at any rank ≤ 10 beats a doc in
    one arm at rank > 1 — the union-recall property."""
    rows = QUERIES["retrieval_rrf_hybrid"](spark, sf_dir).collect()
    both = [r for r in rows if r["bm25_rank"] > 0 and r["dense_rank"] > 0]
    single_worst = [
        r
        for r in rows
        if (r["bm25_rank"] == 0) != (r["dense_rank"] == 0)
        and max(r["bm25_rank"], r["dense_rank"]) > 1
    ]
    for b in both:
        for s in single_worst:
            assert b["rrf_e6"] > s["rrf_e6"]


def test_hard_negatives_exclude_own_label(spark, sf_dir):
    import duckdb

    labels = dict(
        duckdb.sql(
            f"SELECT vec_id, label FROM '{sf_dir}/embeddings.parquet'"
        ).fetchall()
    )
    rows = QUERIES["embed_hard_negatives"](spark, sf_dir).collect()
    assert rows
    per_q: dict[int, list] = {}
    for r in rows:
        assert labels[r["neighbor_id"]] != labels[r["query_id"]]
        assert labels[r["neighbor_id"]] == r["neg_label"]
        per_q.setdefault(r["query_id"], []).append(r)
    for q, rs in per_q.items():
        rs.sort(key=lambda r: r["hn_rank"])
        assert [r["hn_rank"] for r in rs] == list(range(1, len(rs) + 1))
        cosines = [r["cosine"] for r in rs]
        assert cosines == sorted(cosines, reverse=True)


def test_hard_negatives_are_hardest(spark, sf_dir):
    """The mined set is exactly the top of the different-label
    cosine ordering: no unmined different-label vector may beat a
    mined one (checked for query 0 against a brute-force duckdb
    pass)."""
    import duckdb

    rows = [
        r
        for r in QUERIES["embed_hard_negatives"](spark, sf_dir).collect()
        if r["query_id"] == 0
    ]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS"
        f" SELECT * FROM '{sf_dir}/embeddings.parquet'"
    )
    brute = con.execute(
        """
        WITH v AS (SELECT vec_id, embedding, label,
                   sqrt(list_sum(list_transform(embedding,
                        x -> x * x))) AS nrm FROM embeddings)
        SELECT b.vec_id,
               list_sum(list_transform(list_zip(a.embedding, b.embedding),
                    p -> p[1] * p[2])) / (a.nrm * b.nrm) AS cos
        FROM v a JOIN v b
          ON a.vec_id = 0 AND b.vec_id <> 0 AND b.label <> a.label
        ORDER BY cos DESC, b.vec_id ASC
        """
    ).fetchall()
    mined = {r["neighbor_id"] for r in rows}
    assert mined == {vid for vid, _ in brute[: len(rows)]}


# ---------------------------------------------------------------------------
# streaming model-gated admission
# ---------------------------------------------------------------------------


def test_streaming_curation_model_gate_equals_batch(spark, sf_dir, tmp_path):
    """CurationStore(model_gate=True) must land on the batch
    three-gate set: dedup_exact canonicals ∩ quality floor ∩
    classifier keep — the streaming twin of v7's model gate, using
    the ONE shared scoring definition."""
    from pyspark.sql import functions as F

    from aurora_cdc_demo_spark.operators.classifier import clf_score_df
    from aurora_cdc_demo_spark.operators.dedup import dedup_exact
    from aurora_cdc_demo_spark.operators.text import quality_score
    from aurora_cdc_demo_spark.streaming.curation import (
        KEEP_QUALITY_BP,
        CurationStore,
    )
    from aurora_cdc_demo_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    mid = docs.agg(F.max("doc_id")).collect()[0][0] // 2
    flat = tmp_path / "docs_flat"
    flat.mkdir()
    import shutil
    from pathlib import Path

    for i, part in enumerate(
        [docs.where(F.col("doc_id") <= mid), docs.where(F.col("doc_id") > mid)]
    ):
        outdir = tmp_path / f"b{i}"
        part.coalesce(1).write.mode("overwrite").parquet(str(outdir))
        for j, f in enumerate(sorted(Path(outdir).glob("*.parquet"))):
            shutil.copy(f, flat / f"{i:02d}_{j:02d}.parquet")

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(flat))
    )
    store = CurationStore(
        spark, str(tmp_path / "admitted"), model_gate=True
    )
    q = store.start(stream, str(tmp_path / "ckpt"))
    q.awaitTermination(300)

    got = {
        r["doc_id"]
        for r in spark.read.parquet(str(tmp_path / "admitted")).collect()
    }
    want = {
        r["doc_id"]
        for r in dedup_exact(docs)
        .where("is_canonical")
        .select("doc_id")
        .join(
            quality_score(docs)
            .where(F.col("quality_bp") >= KEEP_QUALITY_BP)
            .select("doc_id"),
            "doc_id",
        )
        .join(
            clf_score_df(docs).where("keep_flag = 1").select("doc_id"),
            "doc_id",
        )
        .collect()
    }
    assert got == want and got
    # the gate actually bit: some quality-passing canonical docs
    # were vetoed by the model
    base = {
        r["doc_id"]
        for r in dedup_exact(docs)
        .where("is_canonical")
        .select("doc_id")
        .join(
            quality_score(docs)
            .where(F.col("quality_bp") >= KEEP_QUALITY_BP)
            .select("doc_id"),
            "doc_id",
        )
        .collect()
    }
    assert got < base


def test_gap_threshold_sweep_laws(spark, sf_dir):
    """Sessions monotonically decrease as the gap threshold grows
    (coarser definition merges sessions, never splits); singletons
    ≤ sessions and also monotone non-increasing; event totals are
    threshold-invariant; the events-per-session ratio recomputes."""
    rows = sorted(
        QUERIES["events_gap_threshold_sweep"](spark, sf_dir).collect(),
        key=lambda r: r["gap_minutes"],
    )
    assert [r["gap_minutes"] for r in rows] == [5, 15, 30, 60, 120]
    n_events = rows[0]["n_events"]
    prev_s = prev_single = None
    for r in rows:
        assert r["n_events"] == n_events
        assert 0 < r["n_singletons"] <= r["n_sessions"] or (
            r["n_singletons"] == 0
        )
        assert (
            r["events_per_session_centi"]
            == (100 * r["n_events"]) // r["n_sessions"]
        )
        if prev_s is not None:
            assert r["n_sessions"] <= prev_s
            assert r["n_singletons"] <= prev_single
        prev_s, prev_single = r["n_sessions"], r["n_singletons"]


# ---------------------------------------------------------------------------
# content-defined chunking
# ---------------------------------------------------------------------------


def test_cdc_chunking_partitions_every_byte(spark, sf_dir):
    """Both arms partition the corpus exactly: per-method
    Σ total_bytes = Σ length(text); dup_bytes ≤ total_bytes;
    distinct ≤ chunks; CDC's duplicate byte mass is ≥ the per-doc
    exact-dup floor (identical payloads dedup at ANY chunking)."""
    import duckdb

    rows = QUERIES["mm_cdc_chunk_dedup"](spark, sf_dir).collect()
    corpus = duckdb.sql(
        f"SELECT SUM(length(text)) FROM '{sf_dir}/documents.parquet'"
    ).fetchone()[0]
    per_method: dict[str, dict[str, int]] = {}
    for r in rows:
        m = per_method.setdefault(
            r["method"], {"total": 0, "dup": 0, "n": 0, "d": 0}
        )
        m["total"] += r["total_bytes"]
        m["dup"] += r["dup_bytes"]
        m["n"] += r["n_chunks"]
        m["d"] += r["n_distinct"]
        assert r["dup_bytes"] <= r["total_bytes"]
        assert r["n_distinct"] <= r["n_chunks"]
        assert 0 <= r["size_octave"] <= 30
    assert set(per_method) == {"cdc", "fixed"}
    for m in per_method.values():
        assert m["total"] == corpus
        assert m["d"] <= m["n"]


def test_cdc_chunking_shift_tolerance():
    """The defining CDC property, pinned on a constructed case: a
    one-byte insertion at the front re-chunks ONLY the prefix under
    content-defined cuts, but shifts every fixed-grid cell. Checked
    in pure Python against the same fingerprint constants."""
    from aurora_cdc_demo_spark.registry import (
        _CHUNK_B,
        _CHUNK_DIV,
        _CHUNK_M,
        _CHUNK_W,
        _FIXED_SZ,
    )

    import random

    rng = random.Random(7)
    base = "".join(chr(rng.randrange(97, 123)) for _ in range(4000))
    shifted = "x" + base

    def cdc_chunks(s):
        cuts = [
            i
            for i in range(1, len(s) - _CHUNK_W + 2)
            if sum(
                ord(s[i - 1 + j]) * pow(_CHUNK_B, j, _CHUNK_M)
                for j in range(_CHUNK_W)
            )
            % _CHUNK_M
            % _CHUNK_DIV
            == 0
        ]
        edges = [0] + cuts + [len(s)]
        return {
            s[a:b] for a, b in zip(edges, edges[1:]) if b > a
        }

    def fixed_chunks(s):
        return {
            s[o : o + _FIXED_SZ] for o in range(0, len(s), _FIXED_SZ)
        }

    c0, c1 = cdc_chunks(base), cdc_chunks(shifted)
    f0, f1 = fixed_chunks(base), fixed_chunks(shifted)
    cdc_shared = len(c0 & c1) / max(1, len(c0))
    fixed_shared = len(f0 & f1) / max(1, len(f0))
    assert cdc_shared > 0.9, cdc_shared
    assert fixed_shared < 0.2, fixed_shared


def test_matryoshka_recall_laws(spark, sf_dir):
    """The full-width arm IS the truth (recall_bp = 10000 exactly);
    all arms bounded; hits recompute against an independent
    brute-force prefix ranking in Python for d=8."""
    rows = {
        r["dims"]: r
        for r in QUERIES["embed_matryoshka_recall"](
            spark, sf_dir
        ).collect()
    }
    assert set(rows) == {8, 16, 32, 64}
    assert rows[64]["recall_bp"] == 10000
    for r in rows.values():
        assert 0 <= r["recall_bp"] <= 10000
        assert r["recall_bp"] == (10000 * r["hits"]) // 50

    import duckdb

    from aurora_cdc_demo_spark.operators.similarity import (
        N_QUERIES,
        TOPK,
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS"
        f" SELECT * FROM '{sf_dir}/embeddings.parquet'"
    )
    vecs = dict(
        con.execute("SELECT vec_id, embedding FROM embeddings").fetchall()
    )

    def topk(d, q):
        import math

        qe = vecs[q][:d]
        nq = math.sqrt(sum(x * x for x in qe))
        scored = []
        for vid, e in vecs.items():
            if vid == q:
                continue
            pe = e[:d]
            nv = math.sqrt(sum(x * x for x in pe))
            c = sum(a * b for a, b in zip(qe, pe)) / (nq * nv)
            scored.append((-c, vid))
        scored.sort()
        return {vid for _, vid in scored[:TOPK]}

    hits8 = sum(
        len(topk(8, q) & topk(64, q)) for q in range(N_QUERIES)
    )
    assert rows[8]["hits"] == hits8


# ---------------------------------------------------------------------------
# CRDT merge laws + Good-Turing
# ---------------------------------------------------------------------------


def test_crdt_merge_idempotent_commutative(spark, sf_dir):
    """The CRDT content: rebuild per-(key,site) slot states in
    Python, deliver every site state TWICE in shuffled order, merge
    by slot-wise MAX (counters) / MAX (register) — the merged read
    must equal the query's output exactly. Redelivery changes
    nothing (idempotence); order never mattered (commutativity)."""
    import random

    from aurora_cdc_demo_spark.sources.cdc_log import cdc_operation_log

    log = cdc_operation_log(spark, sf_dir).collect()
    slots: dict = {}
    lww: dict = {}
    for r in log:
        site = r["seq"] % 4
        k = (r["key_id"], site)
        p, n, mx = slots.get(k, (0, 0, None))
        if r["operation"] == "DELETE":
            n += 1
        else:
            p += 1
        cents = round(r["value"] * 100)
        mx = cents if mx is None else max(mx, cents)
        slots[k] = (p, n, mx)
        cur = lww.get(r["key_id"])
        cand = (r["ts"], r["seq"])
        if cur is None or cand > cur:
            lww[r["key_id"]] = cand

    deliveries = list(slots.items()) * 2
    random.Random(1).shuffle(deliveries)
    merged: dict = {}
    for (key, site), (p, n, mx) in deliveries:
        k = (key, site)
        if k in merged:
            p0, n0, m0 = merged[k]
            merged[k] = (max(p0, p), max(n0, n), max(m0, mx))
        else:
            merged[k] = (p, n, mx)

    got = {
        r["key_id"]: r
        for r in QUERIES["cdc_crdt_state"](spark, sf_dir).collect()
    }
    per_key: dict = {}
    for (key, site), (p, n, mx) in merged.items():
        g, pn, m, s = per_key.get(key, (0, 0, None, 0))
        per_key[key] = (
            g + p,
            pn + p - n,
            mx if m is None else max(m, mx),
            s + 1,
        )
    assert set(got) == set(per_key)
    for key, (g, pn, m, s) in per_key.items():
        r = got[key]
        assert r["g_count"] == g
        assert r["pn_value"] == pn
        assert r["max_register_cents"] == m
        assert r["n_sites_active"] == s
        assert r["lww_seq"] == lww[key][1]


def test_good_turing_laws(spark, sf_dir):
    """n1 ≤ n_types ≤ n_tokens; unseen mass recomputes and is < 1;
    totals agree with an independent duckdb pass per source."""
    import duckdb

    rows = QUERIES["text_good_turing"](spark, sf_dir).collect()
    assert rows
    con = duckdb.connect()
    want = {
        s: (n, v)
        for s, n, v in con.execute(
            f"""
            SELECT source, COUNT(*), COUNT(DISTINCT token)
            FROM (SELECT source,
                         unnest(string_split(text, ' ')) AS token
                  FROM '{sf_dir}/documents.parquet') t
            GROUP BY source
            """
        ).fetchall()
    }
    for r in rows:
        n, v = want[r["source"]]
        assert r["n_tokens"] == n and r["n_types"] == v
        assert r["n1"] <= r["n_types"] <= r["n_tokens"]
        assert r["unseen_mass_bp"] == (10000 * r["n1"]) // r["n_tokens"]
        assert 0 <= r["unseen_mass_bp"] < 10000


# ---------------------------------------------------------------------------
# bitmap rollup + compensation apply-law
# ---------------------------------------------------------------------------


def test_bitmap_popcount_equals_count_distinct(spark, sf_dir):
    """The exactness claim: per-day popcount over OR-merged words ==
    COUNT(DISTINCT user_id); words bound by ceil(idspace/62)."""
    import duckdb

    rows = {
        str(r["day"]): r
        for r in QUERIES["events_user_bitmap_rollup"](
            spark, sf_dir
        ).collect()
    }
    want = duckdb.sql(
        f"""
        SELECT CAST(date_trunc('day', ts) AS VARCHAR) AS day,
               COUNT(DISTINCT user_id) AS d
        FROM '{sf_dir}/events.parquet' GROUP BY 1
        """
    ).fetchall()
    assert len(rows) == len(want)
    for day, d in want:
        got = rows[day + " 00:00:00" if " " not in day else day]
        assert got["dau_exact"] == d
        assert got["rolling_7d_upper"] >= got["dau_exact"]


def test_compensation_ops_roll_back_to_savepoint(spark, sf_dir):
    """THE law: upsert(current_state, compensation_ops) ==
    state_at_savepoint, key for key, value in exact cents."""
    from aurora_cdc_demo_spark.registry import TIME_TRAVEL_AS_OF
    from aurora_cdc_demo_spark.sources.cdc_log import cdc_operation_log

    log = cdc_operation_log(spark, sf_dir).collect()

    def state(rows):
        best = {}
        for r in rows:
            k = r["key_id"]
            cand = (r["ts"], r["seq"])
            if k not in best or cand > best[k][0]:
                best[k] = (cand, r["operation"], r["value"])
        return {
            k: round(v * 100)
            for k, (_, op, v) in best.items()
            if op != "DELETE"
        }

    import datetime

    t = datetime.datetime.fromisoformat(TIME_TRAVEL_AS_OF)
    current = state(log)
    savepoint = state([r for r in log if r["ts"] <= t])

    comp = QUERIES["cdc_compensation_ops"](spark, sf_dir).collect()
    rolled = dict(current)
    for r in comp:
        if r["op"] == "DELETE":
            rolled.pop(r["key_id"], None)
        else:
            rolled[r["key_id"]] = r["value_cents"]
    assert rolled == savepoint
    assert comp

    # minimality: an op may only touch a key whose WINNING VERSION
    # (seq) or presence differs between the two sides
    def winning_seq(rows):
        best = {}
        for r in rows:
            k = r["key_id"]
            cand = (r["ts"], r["seq"])
            if k not in best or cand > best[k][0]:
                best[k] = (cand, r["operation"], r["seq"])
        return {
            k: s for k, (_, op, s) in best.items() if op != "DELETE"
        }

    seq_cur = winning_seq(log)
    seq_save = winning_seq([r for r in log if r["ts"] <= t])
    for r in comp:
        k = r["key_id"]
        assert seq_cur.get(k) != seq_save.get(k), k


def test_crdt_slots_maintainable_by_stream(spark, sf_dir, tmp_path):
    """Streaming maintenance law for #313: per-micro-batch PARTIAL
    slot tables SUM (p/n counters) and MAX (register) to exactly
    the batch slot state — so foreachBatch maintains the CRDT with
    constant per-key-site state, and the merged read equals
    cdc_crdt_state's counters."""
    from pyspark.sql import functions as F

    from aurora_cdc_demo_spark.registry import crdt_slots
    from aurora_cdc_demo_spark.sources.cdc_log import cdc_operation_log

    log = cdc_operation_log(spark, sf_dir)
    out = str(tmp_path / "crdt_batches")

    mid = log.agg(F.max("seq")).collect()[0][0] // 2
    for part in [
        log.where(F.col("seq") <= mid),
        log.where(F.col("seq") > mid),
    ]:
        crdt_slots(part).write.mode("append").parquet(out)

    merged = (
        spark.read.parquet(out)
        .groupBy("key_id", "site")
        .agg(
            F.sum("p_slot").alias("p_slot"),
            F.sum("n_slot").alias("n_slot"),
            F.max("max_slot").alias("max_slot"),
        )
    )
    got = {
        (r["key_id"], r["site"]): (r["p_slot"], r["n_slot"], r["max_slot"])
        for r in merged.collect()
    }
    want = {
        (r["key_id"], r["site"]): (r["p_slot"], r["n_slot"], r["max_slot"])
        for r in crdt_slots(log).collect()
    }
    assert got == want

    reads = {}
    for (k, _s), (p, n, m) in got.items():
        g, pn, mx = reads.get(k, (0, 0, None))
        reads[k] = (g + p, pn + p - n, m if mx is None else max(mx, m))
    state = {
        r["key_id"]: (r["g_count"], r["pn_value"], r["max_register_cents"])
        for r in QUERIES["cdc_crdt_state"](spark, sf_dir).collect()
    }
    assert {k: v for k, v in reads.items()} == state


# ---------------------------------------------------------------------------
# hash reservoir + join blowup
# ---------------------------------------------------------------------------


def test_hash_reservoir_merge_law_and_uniformity(spark, sf_dir):
    """Mergeability: global K-smallest == K-smallest of the union of
    per-shard K-smallest (4 hash shards). Uniformity: user-id parity
    split of the sample stays within a generous binomial band."""
    import duckdb

    from aurora_cdc_demo_spark.registry import _RESERVOIR_K

    rows = QUERIES["sample_hash_reservoir"](spark, sf_dir).collect()
    assert len(rows) == _RESERVOIR_K
    got = sorted((r["hkey"], r["event_id"]) for r in rows)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    shard_union = []
    for s in range(4):
        shard_union += con.execute(
            f"""
            SELECT CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)),
                        1, 15) AS BIGINT) AS h, event_id
            FROM events WHERE event_id % 4 = {s}
            ORDER BY h ASC, event_id ASC LIMIT {_RESERVOIR_K}
            """
        ).fetchall()
    merged = sorted(shard_union)[:_RESERVOIR_K]
    assert got == merged

    odd = sum(1 for r in rows if r["user_id"] % 2 == 1)
    # binomial(200, ~0.5): 4-sigma ≈ 28 — generous determinism-safe
    # band around the corpus odd-user-id event share
    tot_odd, tot = con.execute(
        "SELECT SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END),"
        " COUNT(*) FROM events"
    ).fetchone()
    expect = _RESERVOIR_K * tot_odd / tot
    assert abs(odd - expect) < 30, (odd, expect)


def test_join_blowup_audit_predicts_actual_join(spark, sf_dir):
    """The histogram product must equal the ACTUAL executed join's
    output cardinality — totals and the top key's share."""
    import duckdb

    rows = QUERIES["dq_join_blowup_audit"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 10
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    actual_total = con.execute(
        """
        SELECT COUNT(*) FROM orders a
        JOIN (SELECT o_custkey, l.l_orderkey
              FROM orders o JOIN lineitem l
                ON l.l_orderkey = o.o_orderkey) b
          ON b.o_custkey = a.o_custkey
        """
    ).fetchone()[0]
    assert all(r["total_out"] == actual_total for r in rows)
    top = rows[0]
    assert top["out_rows"] == top["cnt_o"] * top["cnt_l"]
    assert top["share_bp"] == (10000 * top["out_rows"]) // actual_total
    shares = [r["out_rows"] for r in rows]
    assert shares == sorted(shares, reverse=True)


# ---------------------------------------------------------------------------
# filtered ANN + decayed engagement
# ---------------------------------------------------------------------------


def test_filtered_search_pre_exact_post_lossy(spark, sf_dir):
    """pre_filter IS the truth (10000 bp, exactly q·k rows);
    post_filter may under-return and under-recall but every row it
    returns is a true filtered hit ⊆ overfetch window."""
    rows = {
        r["strategy"]: r
        for r in QUERIES["ann_filtered_search_recall"](
            spark, sf_dir
        ).collect()
    }
    assert set(rows) == {"pre_filter", "post_filter"}
    pre, post = rows["pre_filter"], rows["post_filter"]
    assert pre["recall_bp"] == 10000 and pre["hits"] == pre["n_returned"]
    assert post["n_returned"] <= pre["n_returned"]
    assert post["recall_bp"] <= 10000
    assert post["hits"] <= post["n_returned"]


def test_decayed_engagement_dyadic_law(spark, sf_dir):
    """Exact recomputation in Python: score = Σ 2^(CAP−age_days)
    over events aged ≤ CAP; rank order pinned; and the incremental
    law — advancing the high-water mark one day halves every
    surviving weight (score_tomorrow = score_today // 2 when no new
    events arrive and no weight falls off the cap edge)."""
    import duckdb

    from aurora_cdc_demo_spark.registry import _DECAY_CAP

    rows = QUERIES["events_decayed_engagement"](spark, sf_dir).collect()
    con = duckdb.connect()
    ages = con.execute(
        f"""
        SELECT user_id,
               CAST((hwm - epoch_us(ts)) // 86400000000 AS INT) AS a
        FROM '{sf_dir}/events.parquet'
        CROSS JOIN (SELECT MAX(epoch_us(ts)) AS hwm
                    FROM '{sf_dir}/events.parquet') h
        """
    ).fetchall()
    scores: dict = {}
    for u, a in ages:
        if a <= _DECAY_CAP:
            scores[u] = scores.get(u, 0) + (1 << (_DECAY_CAP - a))
        else:
            scores.setdefault(u, 0)
    assert len(rows) == min(100, len(scores))
    for r in rows:
        assert r["score_dyadic"] == scores[r["user_id"]]
    want_top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
    got_top = [
        (r["user_id"], r["score_dyadic"])
        for r in sorted(rows, key=lambda r: r["engagement_rank"])
    ]
    assert got_top == want_top
    # incremental maintainability: halving yesterday's weights ==
    # re-scoring with hwm advanced one day (for users whose oldest
    # surviving weight is not at the cap edge)
    for r in rows[:20]:
        u = r["user_id"]
        tomorrow = sum(
            1 << (_DECAY_CAP - (a + 1))
            for uu, a in ages
            if uu == u and a + 1 <= _DECAY_CAP
        )
        halved = sum(
            (1 << (_DECAY_CAP - a)) // 2
            for uu, a in ages
            if uu == u and a <= _DECAY_CAP and a + 1 <= _DECAY_CAP
        )
        assert tomorrow == halved


def test_scale_sizing_plan_laws(spark, sf_dir):
    """Byte estimates scale exactly linearly in the multiplier;
    partition counts are the 128 MB ceil-division (never 0);
    broadcast flags are monotone non-increasing in scale; tiny dims
    stay broadcastable at 1000×."""
    rows = QUERIES["ops_scale_sizing_plan"](spark, sf_dir).collect()
    by = {(r["table_name"], r["mult"]): r for r in rows}
    assert len(by) == 40
    target = 128 * 1024 * 1024
    for (t, m), r in by.items():
        base = by[(t, 1)]
        assert r["est_bytes_scaled"] == base["est_bytes_scaled"] * m
        assert r["n_rows_scaled"] == base["n_rows_scaled"] * m
        assert r["shuffle_partitions_128mb"] == max(
            1, -(-r["est_bytes_scaled"] // target)
        )
        if m > 1:
            prev = by[(t, m // 10)]
            assert r["fits_broadcast"] <= prev["fits_broadcast"]
    assert by[("region", 1000)]["fits_broadcast"] == 1
    assert by[("nation", 1000)]["fits_broadcast"] == 1


# ---------------------------------------------------------------------------
# SCD3 + fertility + scene cuts
# ---------------------------------------------------------------------------


def test_scd3_prev_value_law(spark, sf_dir):
    """SCD3 agrees with SCD1 on the current version (same live keys,
    same latest pos); prev is NULL exactly for single-version keys;
    (prev, cur) equals the last two ordered versions per key."""
    scd1 = {
        r["key_id"]: r
        for r in QUERIES["debezium_gold_scd1"](spark, sf_dir).collect()
    }
    scd3 = {
        r["key_id"]: r
        for r in QUERIES["debezium_gold_scd3"](spark, sf_dir).collect()
    }
    assert set(scd1) == set(scd3)
    from aurora_cdc_demo_spark.sources.cdc_log import cdc_operation_log

    per_key: dict = {}
    for r in cdc_operation_log(spark, sf_dir).collect():
        per_key.setdefault(r["key_id"], []).append(
            (r["seq"], round(r["value"] * 100))
        )
    for k, r in scd3.items():
        assert r["pos"] == scd1[k]["pos"]
        hist = sorted(per_key[k])
        assert r["cur_value_cents"] == hist[-1][1]
        if len(hist) == 1:
            assert r["prev_cents"] is None
        else:
            assert r["prev_cents"] == hist[-2][1]


def test_fertility_recomputes_from_tokenize(spark, sf_dir):
    """Lang-grain fertility equals the doc-grain #253 tokenization
    re-aggregated by lang — one definition, two grains."""
    import duckdb

    langs = dict(
        duckdb.sql(
            f"SELECT doc_id, lang FROM '{sf_dir}/documents.parquet'"
        ).fetchall()
    )
    per_lang: dict = {}
    for r in QUERIES["bpe_tokenize_by_vocab"](spark, sf_dir).collect():
        w, t = per_lang.get(langs[r["doc_id"]], (0, 0))
        per_lang[langs[r["doc_id"]]] = (
            w + r["n_words"],
            t + r["n_tokens_bpe"],
        )
    rows = QUERIES["bpe_fertility_by_lang"](spark, sf_dir).collect()
    assert {r["lang"] for r in rows} == set(per_lang)
    for r in rows:
        w, t = per_lang[r["lang"]]
        assert r["n_words"] == w and r["n_tokens_bpe"] == t
        assert r["fertility_bp"] == (10000 * t) // w


def test_scene_cuts_recompute(spark, sf_dir):
    """Per-doc cut count recomputed independently in Python over the
    same frame grid and 20% jump rule."""
    import duckdb

    from aurora_cdc_demo_spark.registry import _SCENE_FRAMES, _SCENE_WIN

    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    got = {
        r["doc_id"]: r
        for r in QUERIES["mm_scene_cuts"](spark, sf_dir).collect()
    }
    for doc_id, text in docs[:100]:
        stride = len(text) // _SCENE_FRAMES
        energies = []
        for i in range(_SCENE_FRAMES):
            off = i * stride
            win = text[off : off + _SCENE_WIN]
            energies.append(sum(ord(c) for c in win))
        cuts = sum(
            1
            for a, b in zip(energies, energies[1:])
            if 5 * abs(b - a) > a
        )
        assert got[doc_id]["n_cuts"] == cuts, doc_id
        assert got[doc_id]["total_energy"] == sum(energies)


def test_ab_arm_moments_laws(spark, sf_dir):
    """Arms partition users AND events exactly; moments recompute
    from an independent pass; assignment balance stays within a 4σ
    binomial band on users."""
    import duckdb
    import hashlib

    rows = {
        r["arm"]: r
        for r in QUERIES["events_ab_arm_moments"](spark, sf_dir).collect()
    }
    assert set(rows) == {0, 1}
    con = duckdb.connect()
    ev = con.execute(
        f"SELECT user_id, value FROM '{sf_dir}/events.parquet'"
    ).fetchall()
    moments = {0: [0, 0, 0, set()], 1: [0, 0, 0, set()]}
    for u, v in ev:
        arm = (
            int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16) % 2
        )
        c = round(v * 100)
        m = moments[arm]
        m[0] += 1
        m[1] += c
        m[2] += c * c
        m[3].add(u)
    for arm, r in rows.items():
        n, s, ss, users = moments[arm]
        assert r["n_events"] == n
        assert r["sum_v_e2"] == s
        assert r["sumsq_v_e4"] == ss
        assert r["n_users"] == len(users)
        assert r["mean_v_e2"] == s // n
    total_users = len(moments[0][3] | moments[1][3])
    import math

    sigma = math.sqrt(total_users) / 2
    assert abs(rows[0]["n_users"] - total_users / 2) <= 4 * sigma + 1


def test_reconciliation_all_match_and_true_positive(spark, sf_dir):
    """Both real ingestion paths reconcile chunk-for-chunk
    (is_match = 1 everywhere — the cross-path equivalence
    guarantee); and a single perturbed row flips EXACTLY its own
    chunk (true-positive sensitivity, the reason checksums are
    chunk-grain)."""
    from aurora_cdc_demo_spark.registry import (
        _RECON_CHUNK,
        _recon_sql,
        read_binlog_jvm,
    )
    from aurora_cdc_demo_spark.sources.cdc_log import cdc_operation_log
    from pyspark.sql import functions as F

    rows = QUERIES["cdc_reconciliation_chunks"](spark, sf_dir).collect()
    assert rows and all(r["is_match"] == 1 for r in rows)
    assert all(r["n_rows_a"] == r["n_rows_b"] for r in rows)

    # perturb one row's operation on side A → exactly one chunk flips
    log = cdc_operation_log(spark, sf_dir).where("seq % 251 <> 250")
    victim = log.limit(1).collect()[0]
    perturbed = log.withColumn(
        "operation",
        F.when(
            F.col("seq") == victim["seq"], F.lit("PERTURBED")
        ).otherwise(F.col("operation")),
    )
    perturbed.createOrReplaceTempView("recon_a")
    read_binlog_jvm(spark, sf_dir).select(
        F.col("primary_keys")["key_id"].cast("long").alias("key_id"),
        "seq",
        "operation",
        F.col("after")["value"].cast("double").alias("value"),
    ).createOrReplaceTempView("recon_b")
    rows2 = spark.sql(
        _recon_sql("spark", "recon_a", "recon_b")
    ).collect()
    bad = [r for r in rows2 if r["is_match"] == 0]
    assert len(bad) == 1
    assert bad[0]["chunk"] == victim["key_id"] // _RECON_CHUNK


def test_join_view_ivm_delta_rule(spark, sf_dir):
    """Σ of the four disjoint delta terms == the full join (counts
    AND checksums — ivm_match = 1); terms are genuinely disjoint
    and non-trivial (at least two non-empty)."""
    rows = {
        r["term"]: r
        for r in QUERIES["cdc_join_view_ivm"](spark, sf_dir).collect()
    }
    assert set(rows) == {"a0_b0", "da_b0", "a0_db", "da_db", "full"}
    full = rows["full"]
    parts = [rows[t] for t in ("a0_b0", "da_b0", "a0_db", "da_db")]
    assert full["ivm_match"] == 1
    assert full["n_rows"] == sum(p["n_rows"] for p in parts)
    assert full["checksum"] == sum(p["checksum"] for p in parts)
    assert sum(1 for p in parts if p["n_rows"] > 0) >= 2


def test_dictionary_scan_recomputes(spark, sf_dir):
    """Occurrence counts recomputed with Python str.count per
    phrase; key-determined sanity on bounds."""
    import duckdb

    from aurora_cdc_demo_spark.registry import _SCAN_PHRASES

    docs = [
        t
        for (t,) in duckdb.sql(
            f"SELECT text FROM '{sf_dir}/documents.parquet'"
        ).fetchall()
    ]
    rows = {
        r["phrase"]: r
        for r in QUERIES["text_dictionary_scan"](spark, sf_dir).collect()
    }
    assert set(rows) == set(_SCAN_PHRASES)
    for p in _SCAN_PHRASES:
        occ = [t.count(p) for t in docs]
        r = rows[p]
        assert r["total_occurrences"] == sum(occ)
        assert r["n_docs_matched"] == sum(1 for o in occ if o > 0)
        assert r["max_per_doc"] == max(occ)


def test_fd_profile_keys_are_functional(spark, sf_dir):
    """Key-determined candidates must be violation-free; every
    profile obeys 0 ≤ violations ≤ groups and max multiplicity ≥ 1."""
    rows = {
        r["fd"]: r
        for r in QUERIES["dq_functional_dependencies"](
            spark, sf_dir
        ).collect()
    }
    for key_fd in ("nation_to_region", "cust_to_nation",
                   "cust_to_segment", "order_to_cust"):
        assert rows[key_fd]["n_violating_groups"] == 0
        assert rows[key_fd]["max_rhs_per_lhs"] == 1
    for r in rows.values():
        assert 0 <= r["n_violating_groups"] <= r["n_lhs_groups"]
        assert r["max_rhs_per_lhs"] >= 1


def test_concurrent_conflicts_recompute(spark, sf_dir):
    """Conflict minutes recomputed in Python from the log + the
    zero-rows-iff-no-overlap contract."""
    from aurora_cdc_demo_spark.sources.cdc_log import cdc_operation_log

    cells: dict = {}
    for r in cdc_operation_log(spark, sf_dir).collect():
        key = (r["key_id"], int(r["ts"].timestamp() * 1e6) // 60000000)
        cells.setdefault(key, set()).add(r["seq"] % 4)
    want: dict = {}
    for (k, _m), sites in cells.items():
        if len(sites) > 1:
            want[k] = want.get(k, 0) + 1
    rows = {
        r["key_id"]: r
        for r in QUERIES["cdc_concurrent_write_conflicts"](
            spark, sf_dir
        ).collect()
    }
    assert set(rows) == set(want)
    for k, n in want.items():
        assert rows[k]["n_conflict_minutes"] == n
        assert rows[k]["max_sites_per_minute"] >= 2


def test_energy_segments_runs_law(spark, sf_dir):
    """Per-doc segment count recomputed from the frame energies in
    Python (threshold on mean, maximal runs); segments ≤ active
    frames; a doc with no active frames has zero segments."""
    import duckdb

    from aurora_cdc_demo_spark.registry import (
        _SCENE_FRAMES,
        _SCENE_WIN,
        _VAD_THRESH_CENTI,
    )

    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    got = {
        r["doc_id"]: r
        for r in QUERIES["mm_energy_segments"](spark, sf_dir).collect()
    }
    for doc_id, text in docs[:100]:
        stride = len(text) // _SCENE_FRAMES
        energies = [
            sum(
                ord(c)
                for c in text[i * stride : i * stride + _SCENE_WIN]
            )
            for i in range(_SCENE_FRAMES)
        ]
        tot = sum(energies)
        active = [
            1
            if 100 * e * _SCENE_FRAMES > _VAD_THRESH_CENTI * tot
            else 0
            for e in energies
        ]
        segs = sum(
            1
            for i, a in enumerate(active)
            if a and (i == 0 or not active[i - 1])
        )
        r = got[doc_id]
        assert r["n_active_frames"] == sum(active)
        assert r["n_segments"] == segs
        assert r["n_segments"] <= max(1, r["n_active_frames"])


# ---------------------------------------------------------------------------
# jackknife + winnowing
# ---------------------------------------------------------------------------


def test_jackknife_recomputes_and_tracks_classical_variance(spark, sf_dir):
    import duckdb
    import hashlib

    from aurora_cdc_demo_spark.registry import _JK_BUCKETS

    ev = duckdb.sql(
        f"SELECT event_id, value FROM '{sf_dir}/events.parquet'"
    ).fetchall()
    per = {b: [0, 0] for b in range(_JK_BUCKETS)}
    for eid, v in ev:
        b = (
            int(hashlib.md5(str(eid).encode()).hexdigest()[:8], 16)
            % _JK_BUCKETS
        )
        per[b][0] += 1
        per[b][1] += round(v * 100)
    n_tot = sum(n for n, _ in per.values())
    s_tot = sum(s for _, s in per.values())
    loo = {
        b: ((s_tot - s) * 100) // (n_tot - n)
        for b, (n, s) in per.items()
    }
    mbar = sum(loo.values()) // _JK_BUCKETS
    rows = {
        r["bucket"]: r
        for r in QUERIES["events_jackknife_moments"](
            spark, sf_dir
        ).collect()
    }
    assert set(rows) == set(range(_JK_BUCKETS))
    for b, r in rows.items():
        assert r["n"] == per[b][0]
        assert r["sum_v_e2"] == per[b][1]
        assert r["loo_mean_e4"] == loo[b]
        assert r["sq_dev_e8"] == (loo[b] - mbar) ** 2
    # jackknife var of the mean ~ classical sigma^2/n (factor band)
    B = _JK_BUCKETS
    jk_var_e8 = (B - 1) / B * sum(r["sq_dev_e8"] for r in rows.values())
    vals = [round(v * 100) for _, v in ev]
    mean = sum(vals) / len(vals)
    classical_e8 = (
        sum((v - mean) ** 2 for v in vals) / len(vals) / len(vals)
    ) * 10000
    assert classical_e8 / 5 < jk_var_e8 < classical_e8 * 5


def test_winnowing_guarantee_on_constructed_pair(spark, sf_dir):
    """The paper's guarantee, pinned directly: two docs sharing a
    run of ≥ w+k−1 tokens share ≥ 1 selected fingerprint — checked
    in Python with the same constants; and the engine's top pairs
    are symmetric/deduped with ranks dense."""
    import hashlib

    from aurora_cdc_demo_spark.registry import (
        _WINNOW_K,
        _WINNOW_W,
    )

    def fingerprints(text):
        toks = text.split(" ")
        ghs = [
            int(
                hashlib.md5(
                    " ".join(toks[i : i + _WINNOW_K]).encode()
                ).hexdigest()[:8],
                16,
            )
            for i in range(len(toks) - _WINNOW_K + 1)
        ]
        return {
            min(ghs[i : i + _WINNOW_W]) for i in range(len(ghs))
        }

    shared_run = "alpha beta gamma delta epsilon zeta"  # w+k-1 = 6
    a = "one two " + shared_run + " three four"
    bdoc = "five six seven " + shared_run + " eight"
    assert fingerprints(a) & fingerprints(bdoc)

    rows = QUERIES["text_winnowing_fingerprints"](spark, sf_dir).collect()
    assert rows
    seen = set()
    for r in rows:
        assert r["doc_a"] < r["doc_b"]
        assert (r["doc_a"], r["doc_b"]) not in seen
        seen.add((r["doc_a"], r["doc_b"]))
        assert r["n_shared"] > 0
    ranks = sorted(r["rnk"] for r in rows)
    assert ranks == list(range(1, len(rows) + 1))


def test_ivfpq_residual_tightens_and_recalls(spark, sf_dir):
    """The two claims of residual coding, measured: (1) residual
    energy < raw energy on average (the coarse quantizer removed
    the cell mean — why the same PQ budget encodes tighter); (2)
    recall@TOPK vs the exact top-k is not worse than plain PQ
    beyond a 1-hit-per-query band on the shared query set."""
    import duckdb
    import math

    from aurora_cdc_demo_spark.operators.similarity import (
        N_QUERIES,
        N_SEEDS,
        TOPK,
    )

    con = duckdb.connect()
    vecs = dict(
        con.execute(
            f"SELECT vec_id, embedding FROM"
            f" '{sf_dir}/embeddings.parquet'"
        ).fetchall()
    )

    def norm(v):
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    nv = {k: norm(v) for k, v in vecs.items()}
    seeds = {k: nv[k] for k in range(N_SEEDS)}
    cell_of = {}
    for k, e in nv.items():
        cell_of[k] = max(
            seeds.items(),
            key=lambda kv: (sum(a * b for a, b in zip(e, kv[1])), -kv[0]),
        )[0]
    dims = len(next(iter(nv.values())))
    sums: dict = {}
    counts: dict = {}
    for k, e in nv.items():
        c = cell_of[k]
        counts[c] = counts.get(c, 0) + 1
        acc = sums.setdefault(c, [0.0] * dims)
        for i, x in enumerate(e):
            acc[i] += x
    cents = {
        c: [x / counts[c] for x in acc] for c, acc in sums.items()
    }
    resid_energy = raw_energy = 0.0
    for k, e in nv.items():
        cent = cents[cell_of[k]]
        r = [a - b for a, b in zip(e, cent)]
        resid_energy += sum(x * x for x in r)
        raw_energy += sum(x * x for x in e)
    # variance decomposition: residual vs the CELL MEAN always
    # reduces energy
    assert resid_energy < raw_energy

    exact = {}
    for q in range(N_QUERIES):
        scored = sorted(
            (
                (-sum(a * b for a, b in zip(nv[q], nv[k])), k)
                for k in nv
                if k != q
            )
        )
        exact[q] = {k for _, k in scored[:TOPK]}
    ivfpq = {}
    for r in QUERIES["ann_ivfpq_residual_topk"](spark, sf_dir).collect():
        ivfpq.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    pq = {}
    for r in QUERIES["ann_pq_topk"](spark, sf_dir).collect():
        pq.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits_ivfpq = sum(len(ivfpq[q] & exact[q]) for q in exact)
    hits_pq = sum(len(pq[q] & exact[q]) for q in exact)
    assert hits_ivfpq >= hits_pq - N_QUERIES
