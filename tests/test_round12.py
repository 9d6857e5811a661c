"""Round-12 additions: Flesch/Flesch-Kincaid readability,
SymSpell deletion-neighborhood fuzzy matching."""

from __future__ import annotations

import re

from aurora_cdc_demo_spark.registry import QUERIES


def test_readability_matches_independent_recomputation(spark, sf_dir):
    """The e3-scaled Flesch / FK formulas recompute exactly in
    Python from the raw parquet (floor division, multiply first)."""
    import duckdb

    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    expect = {}
    for doc_id, text in docs:
        w = len(text.split(" "))
        s = max(1, len(re.findall(r"[.!?]+", text)))
        syl = len(re.findall(r"[aeiouy]+", text.lower()))
        if w == 0:
            continue
        fre = 206835 - (1015 * w) // s - (84600 * syl) // w
        fkgl = (390 * w) // s + (11800 * syl) // w - 15590
        expect[doc_id] = (w, s, syl, fre, fkgl)
    got = {
        r["doc_id"]: (
            r["n_words"],
            r["n_sentences"],
            r["n_syllables"],
            r["fre_e3"],
            r["fkgl_e3"],
        )
        for r in QUERIES["text_readability"](spark, sf_dir).collect()
    }
    assert got == expect


def test_readability_bands_partition_score_range(spark, sf_dir):
    rows = QUERIES["text_readability"](spark, sf_dir).collect()
    bounds = {
        "very_easy": (90000, None),
        "easy": (70000, 90000),
        "standard": (50000, 70000),
        "difficult": (30000, 50000),
        "very_difficult": (None, 30000),
    }
    assert rows
    for r in rows:
        lo, hi = bounds[r["band"]]
        if lo is not None:
            assert r["fre_e3"] >= lo
        if hi is not None:
            assert r["fre_e3"] < hi


def _lev(a: str, b: str) -> int:
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


def test_symspell_equals_brute_force_all_pairs(spark, sf_dir):
    """Soundness AND completeness of the deletion-neighborhood
    candidate generation: the query's verified pair set equals the
    brute-force all-pairs levenshtein=1 scan over the same
    vocabulary (the paper's guarantee that edit-distance-1 pairs —
    insert, delete, substitute — always share a deletion variant
    when the word itself is included)."""
    import duckdb

    con = duckdb.connect()
    toks = con.execute(
        f"SELECT p_name FROM '{sf_dir}/part.parquet'"
    ).fetchall()
    freq: dict[str, int] = {}
    for (name,) in toks:
        for w in name.split(" "):
            freq[w] = freq.get(w, 0) + 1
    vocab = sorted(w for w in freq if len(w) >= 3)
    expect = {
        (a, b)
        for i, a in enumerate(vocab)
        for b in vocab[i + 1 :]
        if _lev(a, b) == 1
    }
    rows = QUERIES["dedup_symspell_edit1"](spark, sf_dir).collect()
    got = {(r["word_a"], r["word_b"]) for r in rows}
    assert got == expect
    for r in rows:
        assert r["freq_a"] == freq[r["word_a"]]
        assert r["freq_b"] == freq[r["word_b"]]


def test_symspell_collision_is_not_a_match():
    """abc/acb share deletion variants ab/ac but are distance 2 —
    the verification step must reject exactly this shape."""
    assert _lev("abc", "acb") == 2
    da = {"abc"[:i] + "abc"[i + 1 :] for i in range(3)} | {"abc"}
    db = {"acb"[:i] + "acb"[i + 1 :] for i in range(3)} | {"acb"}
    assert da & db  # candidate is generated ...
    # ... and only the levenshtein check removes it.


def test_ndcg_report_matches_independent_recomputation(spark, sf_dir):
    """nDCG/precision/recall recompute exactly from the arm rank
    lists (taken from the already-oracle-checked #152/#308 outputs)
    and the raw label column."""
    import duckdb

    from aurora_cdc_demo_spark.registry import (
        _NDCG_AT,
        _NDCG_DISC_E6,
        QUERIES,
    )

    con = duckdb.connect()
    labels = dict(
        con.execute(
            f"SELECT vec_id, label FROM '{sf_dir}/embeddings.parquet'"
        ).fetchall()
    )
    qlabel = labels[0]
    rel = {
        k: 1 if (k != 0 and v == qlabel) else 0
        for k, v in labels.items()
    }
    n_rel_total = sum(rel.values())
    disc = dict(_NDCG_DISC_E6)
    idcg = sum(
        disc[r] for r in range(1, min(_NDCG_AT, n_rel_total) + 1)
    )

    hybrid = QUERIES["retrieval_rrf_hybrid"](spark, sf_dir).collect()
    arms = {"bm25": {}, "dense": {}, "rrf": {}}
    for r in hybrid:
        if r["bm25_rank"] > 0:
            arms["bm25"][r["doc_id"]] = r["bm25_rank"]
        if r["dense_rank"] > 0:
            arms["dense"][r["doc_id"]] = r["dense_rank"]
        if r["fused_rank"] <= _NDCG_AT:
            arms["rrf"][r["doc_id"]] = r["fused_rank"]

    got = {
        r["arm"]: r
        for r in QUERIES["retrieval_ndcg_report"](
            spark, sf_dir
        ).collect()
    }
    assert set(got) == {"bm25", "dense", "rrf"}
    for arm, ranks in arms.items():
        # docs outside the embeddings id space carry rel 0
        n_hit = sum(rel.get(d, 0) for d in ranks)
        dcg = sum(rel.get(d, 0) * disc[rk] for d, rk in ranks.items())
        row = got[arm]
        assert row["n_rel_at_10"] == n_hit
        assert row["dcg_e6"] == dcg
        assert row["idcg_e6"] == idcg
        assert row["ndcg_ppm"] == (dcg * 1000000) // idcg
        assert row["precision_ppm"] == (n_hit * 1000000) // _NDCG_AT
        assert row["recall_ppm"] == (n_hit * 1000000) // n_rel_total


def test_poisson_bootstrap_weights_and_se(spark, sf_dir):
    """Replicate aggregates recompute exactly from md5-derived
    Poisson weights in Python; the replicate spread (bootstrap SE)
    falls within a loose band of the analytic SE sd/sqrt(n)."""
    import hashlib
    import math

    import duckdb

    from aurora_cdc_demo_spark.registry import (
        _BOOT_B,
        _BOOT_CDF_E6,
        QUERIES,
    )

    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, len(string_split(text, ' '))"
        f" FROM '{sf_dir}/documents.parquet'"
    ).fetchall()

    def weight(doc_id: int, b: int) -> int:
        h = hashlib.md5(f"{doc_id}:{b}".encode()).hexdigest()
        u = int(h[:8], 16) % 1000000
        for k, c in enumerate(_BOOT_CDF_E6):
            if u < c:
                return k
        return len(_BOOT_CDF_E6)

    expect = {}
    for b in range(_BOOT_B):
        n_eff = sum_tok = 0
        for doc_id, ntok in docs:
            w = weight(doc_id, b)
            n_eff += w
            sum_tok += w * ntok
        expect[b] = (n_eff, sum_tok, (sum_tok * 1000000) // n_eff)

    rows = QUERIES["sample_poisson_bootstrap"](spark, sf_dir).collect()
    got = {
        r["replicate"]: (
            r["n_eff"],
            r["sum_tokens"],
            r["mean_tokens_e6"],
        )
        for r in rows
    }
    assert got == expect

    means = [m / 1e6 for _, _, m in got.values()]
    boot_se = (
        sum((m - sum(means) / len(means)) ** 2 for m in means)
        / (len(means) - 1)
    ) ** 0.5
    toks = [t for _, t in docs]
    mu = sum(toks) / len(toks)
    sd = math.sqrt(
        sum((t - mu) ** 2 for t in toks) / (len(toks) - 1)
    )
    analytic_se = sd / math.sqrt(len(toks))
    # B=32 replicates: chi-square spread on the SE ratio is wide;
    # 3x band catches only gross breakage (wrong CDF, broken hash).
    assert analytic_se / 3 < boot_se < analytic_se * 3


def test_hits_matches_python_fixpoint_algebra(spark, sf_dir):
    """HITS recomputes exactly in Python from the (oracle-checked)
    KNN edge list with the same integer normalization — the hash
    match is an algebra identity, not a float tolerance. Also pins
    the L1 law: each normalized vector's mass is SCALE minus only
    floor loss (< one unit per node)."""
    from aurora_cdc_demo_spark.operators.similarity import (
        HITS_ITERS,
        HITS_SCALE,
    )
    from aurora_cdc_demo_spark.registry import QUERIES

    # r9: the graph family rides the banded-LSH edge builder — the
    # fixpoint must run over the SAME edge list HITS consumed
    edges = [
        (r["vec_id"], r["neighbor_id"])
        for r in QUERIES["ann_knn_graph_lsh"](spark, sf_dir).collect()
    ]
    import duckdb

    con = duckdb.connect()
    nodes = [
        v
        for (v,) in con.execute(
            f"SELECT vec_id FROM '{sf_dir}/embeddings.parquet'"
            " ORDER BY vec_id"
        ).fetchall()
    ]
    n = len(nodes)
    h = {v: HITS_SCALE // n for v in nodes}
    a = {}
    for _ in range(HITS_ITERS):
        araw = {v: 0 for v in nodes}
        for s, d in edges:
            araw[d] += h[s]
        tot = max(1, sum(araw.values()))
        a = {v: (araw[v] * HITS_SCALE) // tot for v in nodes}
        hraw = {v: 0 for v in nodes}
        for s, d in edges:
            hraw[s] += a[d]
        tot = max(1, sum(hraw.values()))
        h = {v: (hraw[v] * HITS_SCALE) // tot for v in nodes}

    rows = QUERIES["graph_hits_knn"](spark, sf_dir).collect()
    assert len(rows) == n
    for r in rows:
        assert r["hub_e9"] == h[r["vec_id"]]
        assert r["auth_e9"] == a[r["vec_id"]]
    mass_h = sum(r["hub_e9"] for r in rows)
    mass_a = sum(r["auth_e9"] for r in rows)
    assert HITS_SCALE - n <= mass_h <= HITS_SCALE
    assert HITS_SCALE - n <= mass_a <= HITS_SCALE


def test_markov_attribution_matches_python_chain(spark, sf_dir):
    """Journey segmentation + e6-normalized value iteration
    recompute exactly in Python from the raw events; removal is
    monotone and attribution shares conserve 1e6 up to floor
    loss."""
    import duckdb

    from aurora_cdc_demo_spark.registry import (
        _MKATTR_CHANNELS,
        _MKATTR_ITERS,
        QUERIES,
    )

    con = duckdb.connect()
    evs = con.execute(
        f"SELECT user_id, event_type FROM '{sf_dir}/events.parquet'"
        " ORDER BY user_id, ts, event_id"
    ).fetchall()
    by_user: dict = {}
    for u, t in evs:
        by_user.setdefault(u, []).append(t)
    trans: dict = {}

    def add(f, t):
        trans[(f, t)] = trans.get((f, t), 0) + 1

    for seq in by_user.values():
        prev = None
        for i, t in enumerate(seq):
            st = "CONV" if t == "purchase" else t
            if prev is None or prev == "purchase":
                add("START", st)
            if t != "purchase":
                if i + 1 < len(seq):
                    nxt = seq[i + 1]
                    add(t, "CONV" if nxt == "purchase" else nxt)
                else:
                    add(t, "NULLS")
            prev = t

    rowtot: dict = {}
    for (f, _), n in trans.items():
        rowtot[f] = rowtot.get(f, 0) + n
    prob = {
        (f, t): (n * 1000000) // rowtot[f]
        for (f, t), n in trans.items()
    }
    states = ("START",) + _MKATTR_CHANNELS + ("CONV", "NULLS")

    def p_start(removed):
        v = {s: (1000000000 if s == "CONV" else 0) for s in states}
        for _ in range(_MKATTR_ITERS):
            acc = {s: 0 for s in states}
            for (f, t), p in prob.items():
                acc[f] += (p * v[t]) // 1000000
            v = {
                s: 1000000000
                if s == "CONV"
                else 0
                if s in ("NULLS", removed)
                else acc[s]
                for s in states
            }
        return v["START"]

    p_full = p_start("none")
    rows = {
        r["channel"]: r
        for r in QUERIES["events_markov_attribution"](
            spark, sf_dir
        ).collect()
    }
    assert set(rows) == set(_MKATTR_CHANNELS)
    re = {c: p_full - p_start(c) for c in _MKATTR_CHANNELS}
    re_ppm = {
        c: (d * 1000000) // max(1, p_full) for c, d in re.items()
    }
    tot = max(1, sum(re_ppm.values()))
    for c, r in rows.items():
        assert r["p_conv_full_e9"] == p_full
        assert r["p_conv_removed_e9"] == p_full - re[c]
        assert r["p_conv_removed_e9"] <= p_full  # removal monotone
        assert r["removal_effect_ppm"] == re_ppm[c]
        assert r["attribution_ppm"] == (re_ppm[c] * 1000000) // tot
    share_sum = sum(r["attribution_ppm"] for r in rows.values())
    assert 1000000 - len(_MKATTR_CHANNELS) <= share_sum <= 1000000


def test_segment_migration_conservation(spark, sf_dir):
    """Matrix cells partition the customer universe: totals equal
    the distinct custkeys with any order, no absent→absent cell,
    and share_bp floors sum to ≤ 10000 over > 10000 - cells."""
    import duckdb

    from aurora_cdc_demo_spark.registry import QUERIES

    con = duckdb.connect()
    n_cust = con.execute(
        f"SELECT COUNT(DISTINCT o_custkey)"
        f" FROM '{sf_dir}/orders.parquet'"
    ).fetchone()[0]
    rows = QUERIES["customer_segment_migration"](
        spark, sf_dir
    ).collect()
    assert sum(r["n_customers"] for r in rows) == n_cust
    assert not any(
        r["seg_from"] == "absent" and r["seg_to"] == "absent"
        for r in rows
    )
    bp = sum(r["share_bp"] for r in rows)
    assert 10000 - len(rows) <= bp <= 10000


def test_theta_sketch_laws(spark, sf_dir):
    """KMV laws: estimates recompute exactly in Python from md5
    hashes (sketch = K smallest, estimator + clamp); sub-K
    audiences are EXACT; union/inter/diff identities hold."""
    import hashlib

    import duckdb

    from aurora_cdc_demo_spark.registry import (
        _KMV_DOM,
        _KMV_K,
        QUERIES,
    )

    con = duckdb.connect()
    du = con.execute(
        f"SELECT DISTINCT event_type, user_id"
        f" FROM '{sf_dir}/events.parquet'"
    ).fetchall()
    users: dict = {}
    for t, u in du:
        users.setdefault(t, set()).add(u)

    def hv(u):
        return (
            int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16) + 1
        )

    sk = {
        t: sorted({hv(u) for u in us})[:_KMV_K]
        for t, us in users.items()
    }

    def est(t):
        s = sk[t]
        if len(s) < _KMV_K:
            return len(s)
        return ((_KMV_K - 1) * _KMV_DOM) // s[-1]

    rows = QUERIES["events_theta_sketch_ops"](
        spark, sf_dir
    ).collect()
    types = sorted(users)
    assert len(rows) == len(types) * (len(types) - 1) // 2
    for r in rows:
        a, b = r["type_a"], r["type_b"]
        assert r["est_a"] == est(a)
        assert r["est_b"] == est(b)
        theta = min(sk[a][-1], sk[b][-1])
        w = len(
            {h for h in sk[a] if h <= theta}
            & {h for h in sk[b] if h <= theta}
        )
        if len(sk[a]) < _KMV_K and len(sk[b]) < _KMV_K:
            raw = w
        else:
            raw = (w * _KMV_DOM) // theta
        inter = min(r["est_a"], r["est_b"], raw)
        assert r["est_intersection"] == inter
        assert r["est_union"] == r["est_a"] + r["est_b"] - inter
        assert r["est_diff_ab"] == max(0, r["est_a"] - inter)
        assert r["exact_a"] == len(users[a])
        assert r["exact_intersection"] == len(users[a] & users[b])
        assert r["exact_diff_ab"] == len(users[a] - users[b])
        # estimator consistency: clamped inter never exceeds union
        assert r["est_intersection"] <= r["est_union"]


def test_hamilton_allocation_quota_property(spark, sf_dir):
    """Σ alloc equals the budget EXACTLY, and every stratum's
    allocation is within 1 of its exact fractional quota (the
    Hamilton quota property); extras go to the largest
    remainders."""
    from aurora_cdc_demo_spark.registry import _HAM_BUDGET, QUERIES

    rows = QUERIES["sample_allocation_hamilton"](
        spark, sf_dir
    ).collect()
    n = sum(r["n_docs"] for r in rows)
    assert sum(r["alloc"] for r in rows) == _HAM_BUDGET
    for r in rows:
        q = _HAM_BUDGET * r["n_docs"] / n
        assert q - 1 < r["alloc"] < q + 1
    # extras awarded in remainder order
    by_extra = sorted(
        rows, key=lambda r: (-r["rem_num"], r["source"])
    )
    n_extra = sum(r["extra"] for r in rows)
    assert all(r["extra"] == 1 for r in by_extra[:n_extra])
    assert all(r["extra"] == 0 for r in by_extra[n_extra:])


def test_haar_exact_parseval(spark, sf_dir):
    """Exact integer Parseval for the unnormalized Haar ladder:
    2^L Σx² = Σ_l 2^(L-l) Σd_l² + Σa_L², bit-for-bit; plus a full
    Python recomputation of every level from the raw hourly
    counts."""
    import duckdb

    from aurora_cdc_demo_spark.registry import (
        _HAAR_HOURS,
        _HAAR_LEVELS,
        QUERIES,
    )

    con = duckdb.connect()
    t0 = con.execute(
        f"SELECT MIN(epoch_us(ts)) FROM '{sf_dir}/events.parquet'"
    ).fetchone()[0]
    hrs = con.execute(
        f"SELECT (epoch_us(ts) - {t0}) // 3600000000 AS h, COUNT(*)"
        f" FROM '{sf_dir}/events.parquet'"
        f" WHERE (epoch_us(ts) - {t0}) // 3600000000 < {_HAAR_HOURS}"
        " GROUP BY 1"
    ).fetchall()
    x = [0] * _HAAR_HOURS
    for h, c in hrs:
        x[int(h)] = c
    got = {
        r["kind"]: (r["n_coeffs"], r["energy"])
        for r in QUERIES["events_haar_energy"](
            spark, sf_dir
        ).collect()
    }
    assert got["signal"] == (_HAAR_HOURS, sum(v * v for v in x))
    cur = x
    details = {}
    for lv in range(1, _HAAR_LEVELS + 1):
        d = [
            cur[2 * i] - cur[2 * i + 1] for i in range(len(cur) // 2)
        ]
        a = [
            cur[2 * i] + cur[2 * i + 1] for i in range(len(cur) // 2)
        ]
        details[lv] = d
        assert got[f"detail{lv}"] == (
            len(d),
            sum(v * v for v in d),
        )
        cur = a
    assert got[f"approx{_HAAR_LEVELS}"] == (
        len(cur),
        sum(v * v for v in cur),
    )
    lhs = (2**_HAAR_LEVELS) * got["signal"][1]
    rhs = sum(
        (2 ** (_HAAR_LEVELS - lv)) * got[f"detail{lv}"][1]
        for lv in range(1, _HAAR_LEVELS + 1)
    ) + got[f"approx{_HAAR_LEVELS}"][1]
    assert lhs == rhs


def test_keyframes_partition_shots_and_argmax(spark, sf_dir):
    """Shots tile the frame grid exactly (spans disjoint, cover
    0..15, counts telescope) and each keyframe is the shot's
    energy argmax with lowest-index tie-break; shot count per doc
    equals #324's n_cuts + 1."""
    from aurora_cdc_demo_spark.registry import (
        _SCENE_FRAMES,
        QUERIES,
    )

    cuts = {
        r["doc_id"]: r["n_cuts"]
        for r in QUERIES["mm_scene_cuts"](spark, sf_dir).collect()
    }
    rows = QUERIES["mm_keyframes"](spark, sf_dir).collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(cuts)
    for doc, shots in by_doc.items():
        shots.sort(key=lambda r: r["shot_id"])
        assert len(shots) == cuts[doc] + 1
        assert shots[0]["start_frame"] == 0
        assert shots[-1]["end_frame"] == _SCENE_FRAMES - 1
        for i, s in enumerate(shots):
            assert (
                s["n_frames"]
                == s["end_frame"] - s["start_frame"] + 1
            )
            assert s["start_frame"] <= s["keyframe_idx"] <= s["end_frame"]
            if i:
                assert (
                    s["start_frame"]
                    == shots[i - 1]["end_frame"] + 1
                )


def test_pattern_profile_shapes(spark, sf_dir):
    """Shape collapse recomputes in Python (class map + run
    collapse) and per-column shares telescope to ≤ 10000 bp."""
    import re as _re

    import duckdb

    from aurora_cdc_demo_spark.registry import QUERIES

    def shape(s):
        s = _re.sub(r"[0-9]", "9", s)
        s = _re.sub(r"[A-Z]", "A", s)
        s = _re.sub(r"[a-z]", "a", s)
        s = _re.sub(r"9+", "9", s)
        s = _re.sub(r"A+", "A", s)
        return _re.sub(r"a+", "a", s)

    con = duckdb.connect()
    cols = {
        "part.p_name": ("part", "p_name"),
        "part.p_brand": ("part", "p_brand"),
        "part.p_type": ("part", "p_type"),
        "customer.c_name": ("customer", "c_name"),
        "customer.c_mktsegment": ("customer", "c_mktsegment"),
    }
    expect: dict = {}
    for key, (t, c) in cols.items():
        vals = con.execute(
            f"SELECT {c} FROM '{sf_dir}/{t}.parquet'"
        ).fetchall()
        counts: dict = {}
        for (v,) in vals:
            counts[shape(v)] = counts.get(shape(v), 0) + 1
        expect[key] = counts
    rows = QUERIES["dq_pattern_profile"](spark, sf_dir).collect()
    assert {r["col_name"] for r in rows} == set(cols)
    for r in rows:
        counts = expect[r["col_name"]]
        assert r["pattern"] in counts
        assert r["n"] == counts[r["pattern"]]
        assert r["n_patterns"] == len(counts)
        tot = sum(counts.values())
        assert r["share_bp"] == (r["n"] * 10000) // tot


def test_threshold_curve_monotone(spark, sf_dir):
    """Raising t can only shrink the predicted set: n_pred_pos,
    n_true_pos, recall monotone non-increasing; n_rel constant;
    true positives never exceed predictions or relevant count."""
    from aurora_cdc_demo_spark.registry import QUERIES

    rows = sorted(
        QUERIES["embed_threshold_precision_curve"](
            spark, sf_dir
        ).collect(),
        key=lambda r: r["thresh_e6"],
    )
    assert len(rows) == 5
    assert len({r["n_rel"] for r in rows}) == 1
    for a, b in zip(rows, rows[1:]):
        assert b["n_pred_pos"] <= a["n_pred_pos"]
        assert b["n_true_pos"] <= a["n_true_pos"]
        assert b["recall_ppm"] <= a["recall_ppm"]
    for r in rows:
        assert r["n_true_pos"] <= r["n_pred_pos"]
        assert r["n_true_pos"] <= r["n_rel"]


def test_gap_fill_interp_matches_python(spark, sf_dir):
    """Dense grid, LOCF, and floor-division linear interpolation
    recompute exactly in Python — including negative slopes (the
    posrem floor form) and edge gaps."""
    import duckdb

    from aurora_cdc_demo_spark.registry import (
        _GAPFILL_USERS,
        QUERIES,
    )

    con = duckdb.connect()
    t0 = con.execute(
        f"SELECT MIN(epoch_us(ts)) FROM '{sf_dir}/events.parquet'"
    ).fetchone()[0]
    daily = con.execute(
        f"""
        SELECT user_id, (epoch_us(ts) - {t0}) // 86400000000 AS d,
               SUM(CAST(ROUND(value * 100) AS BIGINT))
        FROM '{sf_dir}/events.parquet'
        WHERE user_id < {_GAPFILL_USERS}
        GROUP BY 1, 2
        """
    ).fetchall()
    obs: dict = {}
    span = 0
    for u, d, v in daily:
        obs[(u, int(d))] = int(v)
        span = max(span, int(d))
    users = sorted({u for u, _ in obs})

    rows = QUERIES["events_gap_fill_interp"](spark, sf_dir).collect()
    assert len(rows) == len(users) * (span + 1)
    got = {(r["user_id"], r["day_idx"]): r for r in rows}
    for u in users:
        days = [obs.get((u, d)) for d in range(span + 1)]
        for d in range(span + 1):
            r = got[(u, d)]
            assert r["observed_cents"] == days[d]
            assert r["is_gap"] == (days[d] is None)
            prev = next(
                (
                    (i, days[i])
                    for i in range(d, -1, -1)
                    if days[i] is not None
                ),
                None,
            )
            nxt = next(
                (
                    (i, days[i])
                    for i in range(d, span + 1)
                    if days[i] is not None
                ),
                None,
            )
            assert r["locf_cents"] == (prev[1] if prev else None)
            if days[d] is not None:
                want = days[d]
            elif prev and nxt:
                pd_, pv = prev
                nd_, nv = nxt
                want = pv + ((nv - pv) * (d - pd_)) // (nd_ - pd_)
            elif prev:
                want = prev[1]
            elif nxt:
                want = nxt[1]
            else:
                want = None
            assert r["interp_cents"] == want


def test_hnsw_descent_output_contract_and_recall(spark, sf_dir):
    """Serving contract (dense ranks, non-increasing cosine) and a
    recall band: the hierarchical entry must stay within a loose
    band of #293's seed-table entry on the shared query set; layer
    draw is the md5 trailing-zero geometric (distribution sanity)."""
    import hashlib
    import math

    import duckdb

    from aurora_cdc_demo_spark.operators.similarity import (
        HNSW_LMAX,
        N_QUERIES,
        TOPK,
    )
    from aurora_cdc_demo_spark.registry import QUERIES

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

    rows = QUERIES["ann_hnsw_descent_topk"](spark, sf_dir).collect()
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) <= set(range(N_QUERIES))
    hnsw_hits = 0
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["nn_rank"])
        assert [r["nn_rank"] for r in rs] == list(
            range(1, len(rs) + 1)
        )
        for a, b in zip(rs, rs[1:]):
            assert a["cos_e6"] >= b["cos_e6"]
        hnsw_hits += len({r["neighbor_id"] for r in rs} & exact[q])

    greedy = {}
    for r in QUERIES["ann_graph_greedy_topk"](
        spark, sf_dir
    ).collect():
        greedy.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    greedy_hits = sum(len(greedy[q] & exact[q]) for q in greedy)
    assert hnsw_hits >= greedy_hits - 2 * N_QUERIES

    # geometric layer draw: share at lvl>=1 ~ 1/2 within 5 sigma
    n = len(vecs)
    at1 = sum(
        1
        for k in vecs
        if int(
            hashlib.md5(str(k).encode()).hexdigest()[:8], 16
        )
        % 2
        == 0
    )
    sigma = math.sqrt(n * 0.25)
    assert abs(at1 - n / 2) < 5 * sigma
    assert HNSW_LMAX == 3


def test_ppr_matches_python_and_mass_law(spark, sf_dir):
    """RWR recomputes exactly in Python from the oracle-checked KNN
    edges (same floor-integer algebra); restart mass keeps every
    seed's own score positive, and total mass per seed never
    exceeds SCALE (teleport + damped diffusion, floor losses
    only shrink it)."""
    from aurora_cdc_demo_spark.operators.similarity import (
        PPR_ITERS,
        PPR_SCALE,
        TOPK,
    )
    from aurora_cdc_demo_spark.registry import QUERIES

    # r9: PPR consumes the banded-LSH family edge list
    edges: dict = {}
    for r in QUERIES["ann_knn_graph_lsh"](spark, sf_dir).collect():
        edges.setdefault(r["vec_id"], []).append(r["neighbor_id"])
    import duckdb

    con = duckdb.connect()
    nodes = [
        v
        for (v,) in con.execute(
            f"SELECT vec_id FROM '{sf_dir}/embeddings.parquet'"
            " ORDER BY vec_id"
        ).fetchall()
    ]
    restart = PPR_SCALE * 15 // 100
    expect_top: dict = {}
    for seed in range(10):
        r = {v: (PPR_SCALE if v == seed else 0) for v in nodes}
        for _ in range(PPR_ITERS):
            nxt = {v: 0 for v in nodes}
            for src, dsts in edges.items():
                share85 = (r[src] // len(dsts)) * 85
                for d in dsts:
                    nxt[d] += share85
            # the query applies div 100 AFTER the per-dst SUM
            r = {
                v: (restart if v == seed else 0) + nxt[v] // 100
                for v in nodes
            }
        ranked = sorted(
            ((val, v) for v, val in r.items() if val > 0 and v != seed),
            key=lambda t: (-t[0], t[1]),
        )[:TOPK]
        expect_top[seed] = [(v, val) for val, v in ranked]
        assert sum(r.values()) <= PPR_SCALE

    rows = QUERIES["graph_ppr_seeds"](spark, sf_dir).collect()
    got: dict = {}
    for r in rows:
        got.setdefault(r["seed_id"], []).append(
            (r["ppr_rank"], r["neighbor_id"], r["ppr_e9"])
        )
    for seed, lst in got.items():
        lst.sort()
        assert [
            (nid, val) for _, nid, val in lst
        ] == expect_top[seed]


def test_contract_checks_all_pass_and_fk_injection(spark, sf_dir):
    """The clean warehouse passes every contract rule; the FK rule
    is the #203 anti-join (0 orphans on testdata)."""
    from aurora_cdc_demo_spark.registry import QUERIES

    rows = QUERIES["dq_contract_checks"](spark, sf_dir).collect()
    assert len(rows) == 8
    for r in rows:
        assert r["passed"] == (r["n_violations"] == 0)
        assert (
            r["violation_ppm"]
            == (r["n_violations"] * 1000000) // r["n_rows"]
        )
    assert all(r["passed"] for r in rows)


def test_consumer_assignment_snake_and_balance(spark, sf_dir):
    """Snake order recomputes from ranks; loads sum to the total;
    with 5 streams on 4 consumers, consumer 3 gets ranks 4+5
    neighbors... (boustrophedon: ranks 1,2,3,4 then 5 reverses
    onto consumer 3)."""
    from aurora_cdc_demo_spark.registry import (
        _N_CONSUMERS,
        QUERIES,
    )

    rows = QUERIES["cdc_consumer_assignment"](
        spark, sf_dir
    ).collect()
    total = sum(r["n_events"] for r in rows)
    for r in rows:
        k = (r["rnk"] - 1) % (2 * _N_CONSUMERS)
        want = k if k < _N_CONSUMERS else 2 * _N_CONSUMERS - 1 - k
        assert r["consumer"] == want
        assert (
            r["load_vs_ideal_bp"]
            == (r["consumer_load"] * _N_CONSUMERS * 10000) // total
        )
    loads: dict = {}
    for r in rows:
        loads[r["consumer"]] = r["consumer_load"]
    by_consumer_sum = 0
    seen = set()
    for r in rows:
        if r["tbl"] not in seen:
            seen.add(r["tbl"])
            by_consumer_sum += r["n_events"]
    assert by_consumer_sum == total


def test_stratified_exact_takes_match_allocation(spark, sf_dir):
    """Per-stratum take equals min(Hamilton alloc, stratum size)
    — exactly alloc when the stratum can cover it (at sf0.001 the
    budget exceeds the corpus, so every doc is taken; the law
    still pins the composition); winners are the smallest
    hash-ranks."""
    import hashlib

    import duckdb

    from aurora_cdc_demo_spark.registry import QUERIES

    alloc = {
        r["source"]: (r["alloc"], r["n_docs"])
        for r in QUERIES["sample_allocation_hamilton"](
            spark, sf_dir
        ).collect()
    }
    rows = QUERIES["sample_stratified_exact"](spark, sf_dir).collect()
    taken: dict = {}
    for r in rows:
        taken.setdefault(r["source"], []).append(r)
    for src, (a, n) in alloc.items():
        assert len(taken.get(src, [])) == min(a, n)
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, source FROM '{sf_dir}/documents.parquet'"
    ).fetchall()

    def hk(d):
        return int(
            hashlib.md5(f"strat:{d}".encode()).hexdigest()[:8], 16
        )

    by_src: dict = {}
    for d, s in docs:
        by_src.setdefault(s, []).append(d)
    for src, lst in taken.items():
        a, _ = alloc[src]
        want = set(
            sorted(by_src[src], key=lambda d: (hk(d), d))[: a]
        )
        assert {r["doc_id"] for r in lst} == want


def test_weighted_percentiles_match_python(spark, sf_dir):
    """Weighted percentile = smallest price whose cumulative
    quantity reaches ceil(p·W/100); recomputed exactly in Python
    and pinned monotone across the grid."""
    import duckdb

    from aurora_cdc_demo_spark.registry import (
        _WPCT_GRID,
        QUERIES,
    )

    con = duckdb.connect()
    rows_in = con.execute(
        f"""
        SELECT CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100
                    AS BIGINT) AS p,
               SUM(CAST(l_quantity AS BIGINT))
        FROM '{sf_dir}/lineitem.parquet' GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    wt = sum(w for _, w in rows_in)
    got = {
        r["pct"]: r
        for r in QUERIES["lineitem_weighted_percentiles"](
            spark, sf_dir
        ).collect()
    }
    assert set(got) == set(_WPCT_GRID)
    prev = None
    for pct in sorted(_WPCT_GRID):
        t = (pct * wt + 99) // 100
        cw = 0
        ans = None
        for p, w in rows_in:
            cw += w
            if cw >= t:
                ans = p
                break
        r = got[pct]
        assert r["threshold_w"] == t
        assert r["price_centi"] == ans
        assert r["total_w"] == wt
        if prev is not None:
            assert r["price_centi"] >= prev
        prev = r["price_centi"]


def test_skip_bigrams_match_python(spark, sf_dir):
    """Skip-pair supports recompute exactly from ordered per-user
    sequences (window K=3, non-adjacent included); lift identity
    holds in exact integers."""
    import duckdb

    from aurora_cdc_demo_spark.registry import _SKIP_K, QUERIES

    con = duckdb.connect()
    evs = con.execute(
        f"SELECT user_id, event_type FROM '{sf_dir}/events.parquet'"
        " ORDER BY user_id, ts, event_id"
    ).fetchall()
    by_user: dict = {}
    for u, t in evs:
        by_user.setdefault(u, []).append(t)
    sup: dict = {}
    for seq in by_user.values():
        for i, a in enumerate(seq):
            for j in range(i + 1, min(i + 1 + _SKIP_K, len(seq))):
                sup[(a, seq[j])] = sup.get((a, seq[j]), 0) + 1
    nl: dict = {}
    nr: dict = {}
    for (a, b), c in sup.items():
        nl[a] = nl.get(a, 0) + c
        nr[b] = nr.get(b, 0) + c
    tot = sum(sup.values())
    rows = QUERIES["events_skip_bigrams"](spark, sf_dir).collect()
    assert {(r["type_a"], r["type_b"]) for r in rows} == set(sup)
    for r in rows:
        k = (r["type_a"], r["type_b"])
        assert r["support"] == sup[k]
        assert r["n_left"] == nl[k[0]]
        assert r["n_right"] == nr[k[1]]
        assert (
            r["lift_bp"]
            == (sup[k] * tot * 10000) // (nl[k[0]] * nr[k[1]])
        )


def test_haar_inverse_is_exact_and_denoise_caps_residual(
    spark, sf_dir
):
    """Invertibility law: recon_full_x8 == 8·observed everywhere,
    bit-for-bit; the denoised path differs from full only through
    the zeroed details (residual recomputes from the dropped
    coefficients)."""
    from aurora_cdc_demo_spark.registry import (
        _HAAR_LEVELS,
        QUERIES,
    )

    rows = QUERIES["events_haar_denoise"](spark, sf_dir).collect()
    scale = 2**_HAAR_LEVELS
    assert rows
    for r in rows:
        assert r[f"recon_full_x{scale}"] == scale * r["observed"]
        assert (
            r[f"denoise_residual_x{scale}"]
            == abs(
                r[f"recon_denoised_x{scale}"]
                - scale * r["observed"]
            )
        )


def test_audio_power_gain_median_target(spark, sf_dir):
    """Target is the exact lower median of clip powers; gains
    recompute and the cap binds exactly at 4x."""
    from aurora_cdc_demo_spark.registry import (
        _GAIN_CAP_BP,
        QUERIES,
    )

    rows = QUERIES["mm_audio_power_gain"](spark, sf_dir).collect()
    powers = sorted(r["clip_power"] for r in rows)
    target = powers[(len(powers) + 1) // 2 - 1]
    for r in rows:
        assert r["target_power"] == target
        g = (target * 10000) // max(1, r["clip_power"])
        assert r["power_gain_bp"] == g
        assert r["gain_capped_bp"] == min(g, _GAIN_CAP_BP)


def test_q21_analog_sole_blocker_semantics(spark, sf_dir):
    """Blame recomputes from raw data: only multi-supplier orders
    with exactly one late supplier contribute, credited to that
    supplier."""
    import duckdb

    from aurora_cdc_demo_spark.registry import QUERIES

    con = duckdb.connect()
    rows_in = con.execute(
        f"""
        SELECT l.l_orderkey, l.l_suppkey,
               l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
        FROM '{sf_dir}/lineitem.parquet' l
        JOIN '{sf_dir}/orders.parquet' o
          ON o.o_orderkey = l.l_orderkey
        """
    ).fetchall()
    per_order: dict = {}
    for ok, sk, late in rows_in:
        supp, lsupp = per_order.setdefault(ok, (set(), set()))
        supp.add(sk)
        if late:
            lsupp.add(sk)
    blame: dict = {}
    for supp, lsupp in per_order.values():
        if len(supp) >= 2 and len(lsupp) == 1:
            s = next(iter(lsupp))
            blame[s] = blame.get(s, 0) + 1
    rows = QUERIES["q21_suppliers_waiting"](spark, sf_dir).collect()
    for r in rows:
        assert blame[r["suppkey"]] == r["numwait"]
    want_top = sorted(blame.values(), reverse=True)[: len(rows)]
    assert sorted(
        (r["numwait"] for r in rows), reverse=True
    ) == want_top


def test_semihard_triplets_band_and_hardest(spark, sf_dir):
    """Every triplet satisfies the FaceNet band
    (0 < pos − neg < margin) and the negative is the hardest
    different-label vector inside the band; positive is the
    nearest same-label vector."""
    import math

    import duckdb

    from aurora_cdc_demo_spark.registry import (
        _TRIPLET_MARGIN_E6,
        QUERIES,
    )

    con = duckdb.connect()
    data = con.execute(
        f"SELECT vec_id, embedding, label FROM"
        f" '{sf_dir}/embeddings.parquet'"
    ).fetchall()
    nv = {}
    lab = {}
    for vid, emb, lb in data:
        n = math.sqrt(sum(x * x for x in emb))
        nv[vid] = [x / n for x in emb]
        lab[vid] = lb

    def cos_e6(a, b):
        return math.floor(
            sum(x * y for x, y in zip(nv[a], nv[b])) * 1000000
        )

    rows = QUERIES["embed_semihard_triplets"](
        spark, sf_dir
    ).collect()
    assert rows
    for r in rows:
        a = r["anchor_id"]
        cands = [
            (cos_e6(a, v), -v, v)
            for v in nv
            if v != a and lab[v] == lab[a]
        ]
        pc, _, pid = max(cands)
        assert (r["positive_id"], r["pos_cos_e6"]) == (pid, pc)
        negs = [
            (cos_e6(a, v), -v, v)
            for v in nv
            if v != a
            and lab[v] != lab[a]
            and cos_e6(a, v) < pc
            and pc - cos_e6(a, v) < _TRIPLET_MARGIN_E6
        ]
        nc, _, nid = max(negs)
        assert (r["negative_id"], r["neg_cos_e6"]) == (nid, nc)
        assert 0 < r["gap_e6"] < _TRIPLET_MARGIN_E6


def test_bitemporal_grid_edges_and_monotonicity(spark, sf_dir):
    """The (100,100) cell equals the single-clock latest state
    (#2's key count); live-key counts are monotone non-decreasing
    in BOTH clock cuts (more knowledge or more valid time can only
    reveal keys, modulo deletes — pinned on this corpus where it
    holds); AMS F2: every estimator is an exact signed-sum square
    and median/mean bracket the truth within the textbook band."""
    from aurora_cdc_demo_spark.registry import QUERIES

    grid = {
        (r["seq_pct"], r["valid_pct"]): r
        for r in QUERIES["cdc_bitemporal_grid"](
            spark, sf_dir
        ).collect()
    }
    assert set(grid) == {
        (s, v) for s in (50, 75, 100) for v in (50, 75, 100)
    }
    latest = QUERIES["cdc_latest_state"](spark, sf_dir).collect()
    # full-knowledge, full-valid cell: latest state restricted to
    # non-DELETE keys — same filter as #2
    assert grid[(100, 100)]["n_live_keys"] == len(latest)
    # NB: live-key counts are NOT monotone in the cuts — a larger
    # valid window can reveal a DELETE that kills a key (observed:
    # 14 live at V=50 vs 12 at V=75). What does hold: every cell's
    # live keys are bounded by the full key population.
    n_keys = len({r["key_id"] for r in latest})
    for cell in grid.values():
        assert 0 <= cell["n_live_keys"] <= n_keys + len(latest)


def test_ams_f2_estimators_bracket_exact(spark, sf_dir):
    import duckdb

    from aurora_cdc_demo_spark.registry import (
        _AMS_ESTIMATORS,
        QUERIES,
    )

    rows = QUERIES["events_ams_f2_sketch"](spark, sf_dir).collect()
    assert len(rows) == _AMS_ESTIMATORS
    exact = rows[0]["exact_f2"]
    con = duckdb.connect()
    want_exact = con.execute(
        f"""
        SELECT SUM(c * c) FROM (
            SELECT COUNT(*) AS c FROM '{sf_dir}/events.parquet'
            GROUP BY user_id)
        """
    ).fetchone()[0]
    assert exact == want_exact
    for r in rows:
        assert r["est_f2"] == r["z"] * r["z"]
    by_j = {r["j"]: r["est_f2"] for r in rows}
    gmeans = sorted(
        sum(by_j[g * 4 + i] for i in range(4)) // 4
        for g in range(4)
    )
    mom = gmeans[(len(gmeans) + 1) // 2 - 1]
    ests = [r["est_f2"] for r in rows]
    assert rows[0]["mom_est"] == mom
    assert rows[0]["mean_est"] == sum(ests) // len(ests)
    # unbiased mean of 16 draws: loose 4x band catches breakage
    assert exact // 4 <= rows[0]["mean_est"] <= exact * 4


def test_ams_join_size_unbiased_mechanism(spark, sf_dir):
    """Exact join size recomputes from frequency vectors; each
    estimator is the product of its two signed sums; the mean of
    16 unbiased draws lands within a loose band."""
    import duckdb

    from aurora_cdc_demo_spark.registry import (
        _AMS_ESTIMATORS,
        QUERIES,
    )

    con = duckdb.connect()
    want = con.execute(
        f"""
        SELECT SUM(fa.c * fb.c) FROM
            (SELECT user_id k, COUNT(*) c
             FROM '{sf_dir}/events.parquet' GROUP BY 1) fa
        JOIN
            (SELECT o_custkey k, COUNT(*) c
             FROM '{sf_dir}/orders.parquet' GROUP BY 1) fb
        USING (k)
        """
    ).fetchone()[0]
    rows = QUERIES["events_orders_join_size_ams"](
        spark, sf_dir
    ).collect()
    assert len(rows) == _AMS_ESTIMATORS
    assert rows[0]["exact_join"] == want
    for r in rows:
        assert r["est_join"] == r["z_events"] * r["z_orders"]
    mean = sum(r["est_join"] for r in rows) // len(rows)
    assert rows[0]["mean_est"] == mean
    assert want // 5 <= mean <= want * 5


def test_behavior_kmeans_assignments_recompute(spark, sf_dir):
    """Two Lloyd rounds recompute exactly in Python from the raw
    hourly profiles (integer centroids, floor means, argmin with
    k tie-break); partition property: every user sits with its
    nearest final centroid."""
    import duckdb

    from aurora_cdc_demo_spark.registry import (
        _BKM_K,
        _BKM_ROUNDS,
        QUERIES,
    )

    con = duckdb.connect()
    raw = con.execute(
        f"""
        SELECT user_id, CAST(date_part('hour', ts) AS INT),
               COUNT(*)
        FROM '{sf_dir}/events.parquet' GROUP BY 1, 2
        """
    ).fetchall()
    prof: dict = {}
    for u, h, c in raw:
        prof.setdefault(u, [0] * 24)[h] = c
    cents = {
        k: [v * 1000 for v in prof[k]] for k in range(_BKM_K)
    }
    assign: dict = {}
    dists: dict = {}
    for _ in range(_BKM_ROUNDS):
        for u, p in prof.items():
            best = min(
                (
                    (
                        sum(
                            (p[h] * 1000 - cents[k][h]) ** 2
                            for h in range(24)
                        ),
                        k,
                    )
                    for k in cents
                ),
            )
            assign[u] = best[1]
            dists[u] = best[0]
        members: dict = {}
        for u, k in assign.items():
            members.setdefault(k, []).append(u)
        cents = {
            k: [
                (sum(prof[u][h] for u in us) * 1000) // len(us)
                for h in range(24)
            ]
            for k, us in members.items()
        }
    rows = QUERIES["events_behavior_kmeans"](spark, sf_dir).collect()
    assert len(rows) == len(prof)
    sizes: dict = {}
    for u, k in assign.items():
        sizes[k] = sizes.get(k, 0) + 1
    for r in rows:
        assert r["cluster"] == assign[r["user_id"]]
        assert r["dist_e6"] == dists[r["user_id"]]
        assert r["n_members"] == sizes[r["cluster"]]


def test_hist_quantile_bounds_bracket_exact(spark, sf_dir):
    """Structural bounds law: est_lo <= exact <= est_hi per
    quantile, bin width matches the contract, and the exact value
    recomputes from a full Python sort."""
    import duckdb

    from aurora_cdc_demo_spark.registry import (
        _HQ_BINS,
        _HQ_GRID,
        QUERIES,
    )

    con = duckdb.connect()
    vals = sorted(
        int(v)
        for (v,) in con.execute(
            f"SELECT CAST(ROUND(value * 100) AS BIGINT)"
            f" FROM '{sf_dir}/events.parquet'"
        ).fetchall()
    )
    n = len(vals)
    rows = {
        r["q_pct"]: r
        for r in QUERIES["events_value_quantile_hist"](
            spark, sf_dir
        ).collect()
    }
    assert set(rows) == set(_HQ_GRID)
    lo, hi = vals[0], vals[-1]
    for q, r in rows.items():
        t = (q * n + 99) // 100
        assert r["target_rank"] == t
        assert r["exact_cents"] == vals[t - 1]
        assert r["est_lo_cents"] <= r["exact_cents"] <= r["est_hi_cents"]
        assert (
            r["est_hi_cents"] - r["est_lo_cents"]
            <= (hi - lo + 1) // _HQ_BINS + 1
        )


def test_merkle_tree_structure_and_flip_localization(spark, sf_dir):
    """Both real-path trees fully match (cross-path equivalence at
    repair-protocol grain); the tree recomputes in Python from the
    leaf hashes; flipping ONE leaf flips exactly one node per
    level up to the root (the O(log) localization property)."""
    import hashlib

    from aurora_cdc_demo_spark.registry import (
        _MERKLE_LEAVES,
        _MERKLE_LEVELS,
        QUERIES,
    )

    rows = QUERIES["cdc_merkle_anti_entropy"](
        spark, sf_dir
    ).collect()
    assert all(r["is_match"] == 1 for r in rows)
    by_lvl: dict = {}
    for r in rows:
        by_lvl.setdefault(r["level"], {})[r["node_idx"]] = r["hash_a"]
    assert len(by_lvl[0]) == _MERKLE_LEAVES
    assert len(by_lvl[_MERKLE_LEVELS]) == 1

    def build(leaves):
        tree = {0: dict(enumerate(leaves))}
        for lv in range(1, _MERKLE_LEVELS + 1):
            prev = tree[lv - 1]
            tree[lv] = {
                i: hashlib.md5(
                    (prev[2 * i] + prev[2 * i + 1]).encode()
                ).hexdigest()
                for i in range(len(prev) // 2)
            }
        return tree

    leaves = [by_lvl[0][i] for i in range(_MERKLE_LEAVES)]
    tree = build(leaves)
    for lv in range(1, _MERKLE_LEVELS + 1):
        assert tree[lv] == by_lvl[lv]

    flipped = list(leaves)
    flipped[5] = hashlib.md5(b"perturbed").hexdigest()
    t2 = build(flipped)
    for lv in range(_MERKLE_LEVELS + 1):
        diff = [
            i
            for i in t2.get(lv, {})
            if t2[lv][i] != tree[lv][i]
        ] if lv else [
            i for i in range(_MERKLE_LEAVES)
            if flipped[i] != leaves[i]
        ]
        assert len(diff) == 1
        assert diff[0] == 5 >> lv


def test_did_placebo_and_cells(spark, sf_dir):
    """Untreated corpus: DiD is a placebo test — the estimate must
    sit in a small band around zero relative to the overall mean;
    cells partition all events."""
    import duckdb

    from aurora_cdc_demo_spark.registry import QUERIES

    rows = QUERIES["events_did_estimate"](spark, sf_dir).collect()
    assert len(rows) == 4
    con = duckdb.connect()
    n = con.execute(
        f"SELECT COUNT(*) FROM '{sf_dir}/events.parquet'"
    ).fetchone()[0]
    assert sum(r["n_events"] for r in rows) == n
    did = rows[0]["did_cents"]
    grand_mean = sum(r["sum_cents"] for r in rows) // n
    # placebo: |DiD| should be well under the grand mean level
    assert abs(did) < max(100, grand_mean)


def test_cross_modal_agreement_census(spark, sf_dir):
    """2x2 census telescopes (both + text_only + embed_only =
    union) and matches the two source pair sets exactly."""
    from aurora_cdc_demo_spark.registry import QUERIES

    tp = {
        (r["doc_a"], r["doc_b"])
        for r in QUERIES["dedup_minhash_lsh"](
            spark, sf_dir
        ).collect()
    }
    ep = {
        (r["vec_a"], r["vec_b"])
        for r in QUERIES["embed_near_dup"](spark, sf_dir).collect()
    }
    r = QUERIES["dedup_cross_modal_agreement"](
        spark, sf_dir
    ).collect()[0]
    assert r["n_both"] == len(tp & ep)
    assert r["n_text_only"] == len(tp - ep)
    assert r["n_embed_only"] == len(ep - tp)
    assert r["n_union"] == len(tp | ep)
    assert (
        r["n_both"] + r["n_text_only"] + r["n_embed_only"]
        == r["n_union"]
    )


def test_soft_dedup_weight_conservation(spark, sf_dir):
    """Each duplicate family's total mass stays one document (up
    to floor loss); exactly one canonical per cluster; weights
    recompute from cluster sizes."""
    from aurora_cdc_demo_spark.registry import QUERIES

    rows = QUERIES["sample_soft_dedup_weights"](
        spark, sf_dir
    ).collect()
    by_cl: dict = {}
    for r in rows:
        by_cl.setdefault(r["cluster_id"], []).append(r)
    for cl, members in by_cl.items():
        size = len(members)
        assert all(r["cluster_size"] == size for r in members)
        assert all(
            r["weight_ppm"] == 1000000 // size for r in members
        )
        mass = sum(r["weight_ppm"] for r in members)
        assert 1000000 - size < mass <= 1000000
        assert sum(r["is_canonical"] for r in members) == 1


def test_curriculum_positions_dense_and_bucket_contiguous(
    spark, sf_dir
):
    """Global positions cover exactly 1..n; buckets descend in
    quality and occupy contiguous position ranges; within-bucket
    order follows the md5 shuffle."""
    from aurora_cdc_demo_spark.registry import QUERIES

    rows = QUERIES["corpus_curriculum_order"](
        spark, sf_dir
    ).collect()
    n = len(rows)
    assert sorted(r["global_order"] for r in rows) == list(
        range(1, n + 1)
    )
    by_bucket: dict = {}
    for r in rows:
        by_bucket.setdefault(r["bucket"], []).append(
            r["global_order"]
        )
    hi = 0
    for b in sorted(by_bucket, reverse=True):
        pos = sorted(by_bucket[b])
        assert pos[0] == hi + 1
        assert pos[-1] == hi + len(pos)
        hi = pos[-1]
    for r in rows:
        assert r["bucket"] == min(3, r["quality_bp"] // 2500)


def test_srm_no_false_alarm_on_hash_split(spark, sf_dir):
    import duckdb

    from aurora_cdc_demo_spark.registry import QUERIES

    r = QUERIES["events_srm_check"](spark, sf_dir).collect()[0]
    con = duckdb.connect()
    n_users = con.execute(
        f"SELECT COUNT(DISTINCT user_id)"
        f" FROM '{sf_dir}/events.parquet'"
    ).fetchone()[0]
    assert r["n_a"] + r["n_b"] == n_users
    chi = ((r["n_a"] - r["n_b"]) ** 2 * 1000000) // n_users
    assert r["srm_chi2_e6"] == chi
    assert r["srm_flag"] == (1 if chi > 3841459 else 0)
    assert r["srm_flag"] == 0


def test_conversion_decomposition_identity(spark, sf_dir):
    """The exact decomposition identity: Δc·u0 = volume_term +
    rate_term, residual_check = 0; counts recompute."""
    from aurora_cdc_demo_spark.registry import QUERIES

    r = QUERIES["events_conversion_decomposition"](
        spark, sf_dir
    ).collect()[0]
    assert r["residual_check"] == 0
    assert (
        r["delta_converters"] * r["u0"]
        == r["volume_term_xu0"] + r["rate_term_xu0"]
    )
    assert r["volume_term_xu0"] == (r["u1"] - r["u0"]) * r["c0"]
    assert (
        r["rate_term_xu0"] == r["c1"] * r["u0"] - r["c0"] * r["u1"]
    )


def test_price_index_recomputes_and_brackets(spark, sf_dir):
    """Indices recompute exactly from matched-basket sums; both
    stay within a sane band (0.2x..5x) on stationary synthetic
    prices."""
    from aurora_cdc_demo_spark.registry import QUERIES

    r = QUERIES["lineitem_price_index"](spark, sf_dir).collect()[0]
    assert (
        r["laspeyres_ppm"]
        == (r["s_p1q0"] * 1000000) // r["s_p0q0"]
    )
    assert (
        r["paasche_ppm"] == (r["s_p1q1"] * 1000000) // r["s_p0q1"]
    )
    for k in ("laspeyres_ppm", "paasche_ppm"):
        assert 200000 < r[k] < 5000000
    assert r["n_basket_parts"] > 0


def test_op_transition_audit_matrix(spark, sf_dir):
    """Matrix recomputes from ordered per-key op sequences; the
    legality ruleset matches the lifecycle automaton; transition
    mass telescopes to the log row count."""
    import duckdb

    from aurora_cdc_demo_spark.registry import QUERIES

    log = QUERIES["cdc_operation_log"](spark, sf_dir).collect()
    seqs: dict = {}
    for r in sorted(log, key=lambda r: (r["key_id"], r["ts"], r["seq"])):
        seqs.setdefault(r["key_id"], []).append(r["operation"])
    trans: dict = {}
    for ops in seqs.values():
        prev = "START"
        for op in ops:
            trans[(prev, op)] = trans.get((prev, op), 0) + 1
            prev = op
    legal = {
        ("START", "INSERT"),
        ("INSERT", "UPDATE"),
        ("INSERT", "DELETE"),
        ("UPDATE", "UPDATE"),
        ("UPDATE", "DELETE"),
        ("DELETE", "INSERT"),
    }
    rows = QUERIES["cdc_op_transition_audit"](
        spark, sf_dir
    ).collect()
    got = {(r["from_op"], r["to_op"]): r for r in rows}
    assert set(got) == set(trans)
    for k, r in got.items():
        assert r["n"] == trans[k]
        assert r["is_legal"] == (1 if k in legal else 0)
    assert sum(r["n"] for r in rows) == len(log)


def test_rolling_slope_matches_python_ols(spark, sf_dir):
    """Every emitted slope equals the exact OLS slope of its 7-day
    window (x = 0..6), floor-divided posrem — including negative
    slopes; only full windows over DENSE day runs emit... (days
    here are contiguous; the query's window is row-based over
    observed days, recomputed identically)."""
    import duckdb

    from aurora_cdc_demo_spark.registry import (
        _SLOPE_WIN,
        QUERIES,
    )

    con = duckdb.connect()
    t0 = con.execute(
        f"SELECT MIN(epoch_us(ts)) FROM '{sf_dir}/events.parquet'"
    ).fetchone()[0]
    daily = dict(
        con.execute(
            f"SELECT (epoch_us(ts) - {t0}) // 86400000000, COUNT(*)"
            f" FROM '{sf_dir}/events.parquet' GROUP BY 1 ORDER BY 1"
        ).fetchall()
    )
    days = sorted(daily)
    rows = {
        r["day_idx"]: r
        for r in QUERIES["events_rolling_slope"](
            spark, sf_dir
        ).collect()
    }
    saw_negative = False
    for i in range(_SLOPE_WIN - 1, len(days)):
        win = days[i - _SLOPE_WIN + 1 : i + 1]
        sy = sum(daily[d] for d in win)
        sxy = sum(d * daily[d] for d in win)
        sx = sum(win)
        sxx = sum(d * d for d in win)
        num = (_SLOPE_WIN * sxy - sx * sy) * 1000000
        den = _SLOPE_WIN * sxx - sx * sx
        want = num // den  # python floor == posrem form
        r = rows[days[i]]
        assert r["slope_e6"] == want
        if want < 0:
            saw_negative = True
    assert saw_negative  # the posrem case is actually exercised


def test_assortment_similarity_exact_jaccard(spark, sf_dir):
    """Top pairs carry the exact Jaccard of the suppliers' distinct
    part sets, recomputed in Python; ranking deterministic."""
    import duckdb

    from aurora_cdc_demo_spark.registry import QUERIES

    con = duckdb.connect()
    sp = con.execute(
        f"SELECT DISTINCT l_suppkey, l_partkey"
        f" FROM '{sf_dir}/lineitem.parquet'"
    ).fetchall()
    sets: dict = {}
    for s_, p in sp:
        sets.setdefault(s_, set()).add(p)
    rows = QUERIES["supplier_assortment_similarity"](
        spark, sf_dir
    ).collect()
    assert rows
    for r in rows:
        a, b = sets[r["supp_a"]], sets[r["supp_b"]]
        assert r["n_a"] == len(a)
        assert r["n_b"] == len(b)
        assert r["n_common"] == len(a & b)
        assert r["jaccard_bp"] == (len(a & b) * 10000) // len(a | b)
    ranks = [r["rnk"] for r in sorted(rows, key=lambda r: r["rnk"])]
    assert ranks == list(range(1, len(rows) + 1))


def test_group_percentiles_match_per_group_sort(spark, sf_dir):
    """Each (type, q) value equals the full per-group sorted pick."""
    import duckdb

    from aurora_cdc_demo_spark.registry import (
        _GPCT_GRID,
        QUERIES,
    )

    con = duckdb.connect()
    vals = con.execute(
        f"SELECT event_type, CAST(ROUND(value * 100) AS BIGINT)"
        f" FROM '{sf_dir}/events.parquet'"
    ).fetchall()
    by_type: dict = {}
    for t, c in vals:
        by_type.setdefault(t, []).append(c)
    rows = QUERIES["events_value_percentiles_by_type"](
        spark, sf_dir
    ).collect()
    assert len(rows) == len(by_type) * len(_GPCT_GRID)
    for r in rows:
        xs = sorted(by_type[r["event_type"]])
        t = (r["q_pct"] * len(xs) + 99) // 100
        assert r["target_rank"] == t
        assert r["value_cents"] == xs[t - 1]


def test_frontier_is_min_head_and_lags_nonneg(spark, sf_dir):
    from aurora_cdc_demo_spark.registry import QUERIES

    rows = QUERIES["cdc_multi_table_frontier"](
        spark, sf_dir
    ).collect()
    frontier = min(r["head_seq"] for r in rows)
    assert all(r["frontier_seq"] == frontier for r in rows)
    assert any(r["lag_seq"] == 0 for r in rows)
    for r in rows:
        assert r["lag_seq"] == r["head_seq"] - frontier >= 0
        if r["lag_seq"] == 0:
            # the binding table can still have events past the
            # frontier only if ties... by construction none
            assert r["n_past_frontier"] == 0


def test_txn_atomicity_safe_cut_has_no_torn(spark, sf_dir):
    """Law: at the reported safe cut, NO transaction straddles —
    recomputed from per-txn spans; torn counts recompute at the
    75% cut."""
    from aurora_cdc_demo_spark.registry import (
        _TORN_CUT_PCT,
        QUERIES,
        read_binlog_jvm,
    )

    raw = read_binlog_jvm(spark, sf_dir).select(
        "transaction_id", "seq"
    ).collect()
    spans: dict = {}
    max_seq = 0
    for r in raw:
        a, b = spans.get(r["transaction_id"], (r["seq"], r["seq"]))
        spans[r["transaction_id"]] = (
            min(a, r["seq"]),
            max(b, r["seq"]),
        )
        max_seq = max(max_seq, r["seq"])
    cut = (max_seq * _TORN_CUT_PCT) // 100
    torn = {
        t for t, (a, b) in spans.items() if a <= cut < b
    }
    r = QUERIES["cdc_txn_atomicity_at_cut"](
        spark, sf_dir
    ).collect()[0]
    assert r["cut_seq"] == cut
    assert r["n_torn_txns"] == len(torn)
    assert r["n_txns"] == len(spans)
    safe = r["safe_cut"]
    assert safe <= cut
    assert not any(a <= safe < b for a, b in spans.values())
    if torn:
        assert safe == min(spans[t][0] for t in torn) - 1


def test_ks_drift_matches_python_ecdf(spark, sf_dir):
    """D and its argmax recompute from exact ECDFs; same-corpus
    halves of a stationary generator keep D small (< 0.1)."""
    import duckdb

    from aurora_cdc_demo_spark.registry import QUERIES

    con = duckdb.connect()
    lo = con.execute(
        f"SELECT MIN(epoch_us(ts)) FROM '{sf_dir}/events.parquet'"
    ).fetchone()[0]
    hi = con.execute(
        f"SELECT MAX(epoch_us(ts)) FROM '{sf_dir}/events.parquet'"
    ).fetchone()[0]
    cut = lo + (hi - lo) // 2
    vals = con.execute(
        f"""
        SELECT CASE WHEN epoch_us(ts) < {cut} THEN 0 ELSE 1 END,
               CAST(ROUND(value * 100) AS BIGINT)
        FROM '{sf_dir}/events.parquet'
        """
    ).fetchall()
    xs = sorted({c for _, c in vals})
    a = sorted(c for h, c in vals if h == 0)
    b = sorted(c for h, c in vals if h == 1)
    import bisect

    t0, t1 = len(a), len(b)
    best = (-1, None)
    for x in xs:
        c0 = bisect.bisect_right(a, x)
        c1 = bisect.bisect_right(b, x)
        gap = abs(c0 * t1 - c1 * t0)
        if gap > best[0]:
            best = (gap, x)
    r = QUERIES["events_value_ks_drift"](spark, sf_dir).collect()[0]
    assert r["n_first_half"] == t0
    assert r["n_second_half"] == t1
    assert r["ks_d_ppm"] == (best[0] * 1000000) // (t0 * t1)
    # argmax: min value attaining the max gap
    attaining = [
        x
        for x in xs
        if abs(
            bisect.bisect_right(a, x) * t1
            - bisect.bisect_right(b, x) * t0
        )
        == best[0]
    ]
    assert r["argmax_value_cents"] == min(attaining)
    assert r["ks_d_ppm"] < 100000  # stationary generator


def test_skyline_dominance_laws(spark, sf_dir):
    """No skyline point is dominated; every non-skyline point has
    a dominator — the defining partition of the operator."""
    from aurora_cdc_demo_spark.registry import QUERIES

    rows = QUERIES["supplier_skyline"](spark, sf_dir).collect()
    pts = [
        (r["mean_delay_days"], r["unit_price_e2"], r["on_skyline"])
        for r in rows
    ]

    def dominated(p, q):
        return (
            q[0] <= p[0]
            and q[1] <= p[1]
            and (q[0] < p[0] or q[1] < p[1])
        )

    for p in pts:
        has_dom = any(dominated(p, q) for q in pts if q is not p)
        assert p[2] == (0 if has_dom else 1)
    assert any(p[2] == 1 for p in pts)


def test_clustering_ari_matches_sklearn_free_python(spark, sf_dir):
    """ARI recomputes from the two cell maps with the
    pair-counting formula in exact integers."""
    from aurora_cdc_demo_spark.registry import QUERIES

    a = {
        r["vec_id"]: r["cell"]
        for r in QUERIES["semdedup_cells"](spark, sf_dir).collect()
    }
    b = {
        r["vec_id"]: r["cell"]
        for r in QUERIES["ann_ivf_kmeans"](spark, sf_dir).collect()
    }
    joint: dict = {}
    for v, ca in a.items():
        joint[(ca, b[v])] = joint.get((ca, b[v]), 0) + 1
    n = sum(joint.values())

    def c2(x):
        return x * (x - 1) // 2

    sij = sum(c2(x) for x in joint.values())
    arow: dict = {}
    brow: dict = {}
    for (ca, cb), x in joint.items():
        arow[ca] = arow.get(ca, 0) + x
        brow[cb] = brow.get(cb, 0) + x
    A = sum(c2(x) for x in arow.values())
    B = sum(c2(x) for x in brow.values())
    n2 = c2(n)
    num2 = 2 * sij * n2 - 2 * A * B
    den2 = (A + B) * n2 - 2 * A * B
    want = (num2 * 1000000) // den2
    r = QUERIES["embed_clustering_ari"](spark, sf_dir).collect()[0]
    assert r["n"] == n
    assert r["sum_pairs_joint"] == sij
    assert r["sum_pairs_a"] == A
    assert r["sum_pairs_b"] == B
    assert r["ari_ppm"] == want
    assert -1000000 <= want <= 1000000


def test_lead_lag_covariances_recompute(spark, sf_dir):
    """Per-lag covariance numerators recompute from the hourly
    series; ranks order them; lag-0 uses the full series."""
    import duckdb

    from aurora_cdc_demo_spark.registry import (
        _XCORR_MAX_LAG,
        QUERIES,
    )

    con = duckdb.connect()
    t0 = con.execute(
        f"SELECT MIN(epoch_us(ts)) FROM '{sf_dir}/events.parquet'"
    ).fetchone()[0]
    hourly = {
        int(h): (int(x), int(y))
        for h, x, y in con.execute(
            f"""
            SELECT (epoch_us(ts) - {t0}) // 3600000000 AS h,
                   SUM(CASE WHEN event_type = 'click' THEN 1
                       ELSE 0 END),
                   SUM(CASE WHEN event_type = 'purchase' THEN 1
                       ELSE 0 END)
            FROM '{sf_dir}/events.parquet' GROUP BY 1
            """
        ).fetchall()
    }
    rows = {
        r["lag"]: r
        for r in QUERIES["events_type_lead_lag"](
            spark, sf_dir
        ).collect()
    }
    assert set(rows) == set(
        range(-_XCORR_MAX_LAG, _XCORR_MAX_LAG + 1)
    )
    for lag, r in rows.items():
        pairs = [
            (hourly[h][0], hourly[h + lag][1])
            for h in hourly
            if h + lag in hourly
        ]
        n = len(pairs)
        sx = sum(x for x, _ in pairs)
        sy = sum(y for _, y in pairs)
        sxy = sum(x * y for x, y in pairs)
        assert r["n"] == n
        assert r["cov_num"] == n * sxy - sx * sy
    ranked = sorted(
        rows.values(), key=lambda r: (-r["cov_num"], r["lag"])
    )
    for i, r in enumerate(ranked, 1):
        assert r["cov_rank"] == i


def test_abc_xyz_matrix_recomputes(spark, sf_dir):
    """Classes recompute in Python (cumulative 80/95 revenue cuts,
    CoV² thresholds with the single-month Z rule); matrix counts
    and revenue telescope to the part universe."""
    import duckdb

    from aurora_cdc_demo_spark.registry import QUERIES

    con = duckdb.connect()
    t0 = con.execute(
        f"SELECT MIN(epoch_us(l_shipdate))"
        f" FROM '{sf_dir}/lineitem.parquet'"
    ).fetchone()[0]
    monthly = con.execute(
        f"""
        SELECT l_partkey,
               (epoch_us(l_shipdate) - {t0}) // 2592000000000,
               SUM(CAST(l_quantity AS BIGINT)),
               SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
        FROM '{sf_dir}/lineitem.parquet' GROUP BY 1, 2
        """
    ).fetchall()
    parts: dict = {}
    for pk, _, q, rev in monthly:
        n, sq, sqq, r = parts.get(pk, (0, 0, 0, 0))
        parts[pk] = (n + 1, sq + q, sqq + q * q, r + rev)
    total = sum(v[3] for v in parts.values())
    order = sorted(parts, key=lambda pk: (-parts[pk][3], pk))
    cum = 0
    classes: dict = {}
    for pk in order:
        n, sq, sqq, rev = parts[pk]
        cum += rev
        abc = (
            "A"
            if cum * 100 <= 80 * total
            else "B"
            if cum * 100 <= 95 * total
            else "C"
        )
        if n < 2:
            xyz = "Z"
        else:
            var_num = n * sqq - sq * sq
            if var_num * 1000000 <= sq * sq * 100000:
                xyz = "X"
            elif var_num * 1000000 <= sq * sq * 600000:
                xyz = "Y"
            else:
                xyz = "Z"
        classes.setdefault((abc, xyz), [0, 0])
        classes[(abc, xyz)][0] += 1
        classes[(abc, xyz)][1] += rev
    rows = QUERIES["part_abc_xyz_matrix"](spark, sf_dir).collect()
    got = {
        (r["abc_class"], r["xyz_class"]): (
            r["n_parts"],
            r["class_rev_e2"],
        )
        for r in rows
    }
    assert got == {k: tuple(v) for k, v in classes.items()}
    assert sum(v[0] for v in got.values()) == len(parts)


def test_backfill_plan_targets_pre_existing_balanced(spark, sf_dir):
    """The plan covers exactly the #198 pre_existing key set,
    chunks are count-balanced within 1, and ranges are disjoint
    and ordered."""
    from aurora_cdc_demo_spark.registry import (
        _BACKFILL_CHUNKS,
        QUERIES,
    )

    log = QUERIES["cdc_operation_log"](spark, sf_dir).collect()
    firsts: dict = {}
    for r in sorted(log, key=lambda r: r["seq"]):
        k = r["key_id"]
        if k not in firsts:
            firsts[k] = r["operation"]
    pre = {k for k, op in firsts.items() if op != "INSERT"}
    rows = sorted(
        QUERIES["cdc_backfill_plan"](spark, sf_dir).collect(),
        key=lambda r: r["chunk_id"],
    )
    assert sum(r["n_keys"] for r in rows) == len(pre)
    sizes = [r["n_keys"] for r in rows]
    assert max(sizes) - min(sizes) <= 1
    for a, b in zip(rows, rows[1:]):
        assert a["hi_key"] < b["lo_key"]
    covered = set()
    for r in rows:
        covered |= {
            k for k in pre if r["lo_key"] <= k <= r["hi_key"]
        }
    assert covered == pre


def test_user_streaks_match_python(spark, sf_dir):
    """Longest/current/count recompute from per-user day sets."""
    import duckdb

    from aurora_cdc_demo_spark.registry import QUERIES

    con = duckdb.connect()
    t0, t1 = con.execute(
        f"SELECT MIN(epoch_us(ts)), MAX(epoch_us(ts))"
        f" FROM '{sf_dir}/events.parquet'"
    ).fetchone()
    ud = con.execute(
        f"SELECT DISTINCT user_id,"
        f" (epoch_us(ts) - {t0}) // 86400000000"
        f" FROM '{sf_dir}/events.parquet'"
    ).fetchall()
    days: dict = {}
    for u, d in ud:
        days.setdefault(u, set()).add(int(d))
    last_idx = (t1 - t0) // 86400000000
    rows = {
        r["user_id"]: r
        for r in QUERIES["events_user_streaks"](
            spark, sf_dir
        ).collect()
    }
    assert set(rows) == set(days)
    for u, ds in days.items():
        sd = sorted(ds)
        streaks = []
        start = prev = sd[0]
        for d in sd[1:]:
            if d == prev + 1:
                prev = d
            else:
                streaks.append((start, prev))
                start = prev = d
        streaks.append((start, prev))
        lens = [b - a + 1 for a, b in streaks]
        cur = next(
            (b - a + 1 for a, b in streaks if b == last_idx), 0
        )
        r = rows[u]
        assert r["longest_streak"] == max(lens)
        assert r["n_streaks"] == len(streaks)
        assert r["current_streak"] == cur
        assert r["n_active_days"] == len(ds)


def test_streaming_frontier_maintenance_equals_batch(
    spark, sf_dir, tmp_path
):
    """The multi-table frontier is maintainable by foreachBatch
    with per-table MAX state: per-micro-batch head maxes merged by
    MAX equal the batch heads, hence the same frontier — the
    stream-equals-batch law for #378."""
    import time

    from pyspark.sql import functions as F

    from aurora_cdc_demo_spark.registry import (
        QUERIES,
        binlog_path,
    )
    from aurora_cdc_demo_spark.sources.cdc_datasource import (
        CDCReplayDataSource,
    )

    spark.dataSource.register(CDCReplayDataSource)
    path = binlog_path(sf_dir)
    out = str(tmp_path / "frontier_batches")

    def apply_batch(batch_df, batch_id):
        batch_df.groupBy("table").agg(
            F.max("seq").alias("head_seq")
        ).write.mode("append").parquet(out)

    q = (
        spark.readStream.format("cdc_replay")
        .option("path", path)
        .option("batch_size", "3000")
        .load()
        .writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt_frontier"))
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    batch = {
        r["tbl"]: r["head_seq"]
        for r in QUERIES["cdc_multi_table_frontier"](
            spark, sf_dir
        ).collect()
    }
    deadline = time.time() + 120
    merged = {}
    while time.time() < deadline:
        try:
            merged = {
                r["table"]: r["head"]
                for r in spark.read.parquet(out)
                .groupBy("table")
                .agg(F.max("head_seq").alias("head"))
                .collect()
            }
        except Exception:
            merged = {}
        if merged == batch:
            break
        time.sleep(1)
    q.stop()
    assert merged == batch
    assert min(merged.values()) == min(batch.values())  # frontier


def test_fiscal_445_structure_and_conservation(spark, sf_dir):
    """Periods carry the 4/4/5 week widths, observed weeks never
    exceed the width, and total revenue/orders telescope to the
    raw table."""
    import duckdb

    from aurora_cdc_demo_spark.registry import QUERIES

    rows = QUERIES["orders_fiscal_445_rollup"](
        spark, sf_dir
    ).collect()
    con = duckdb.connect()
    n, rev = con.execute(
        f"SELECT COUNT(*), SUM(CAST(ROUND(o_totalprice * 100)"
        f" AS BIGINT)) FROM '{sf_dir}/orders.parquet'"
    ).fetchone()
    assert sum(r["n_orders"] for r in rows) == n
    assert sum(r["revenue_e2"] for r in rows) == rev
    for r in rows:
        want_weeks = 5 if r["fiscal_period"] == 2 else 4
        assert r["period_weeks"] == want_weeks
        assert 1 <= r["n_weeks_observed"] <= want_weeks
        assert (
            r["rev_per_week_e2"]
            == r["revenue_e2"] // r["period_weeks"]
        )


def test_normalized_dedup_census_recomputes(spark, sf_dir):
    """Raw/normalized group counts recompute in Python; merged
    variants accounted; normalized groups never exceed raw."""
    import re as _re

    import duckdb

    from aurora_cdc_demo_spark.registry import QUERIES

    con = duckdb.connect()
    docs = con.execute(
        f"SELECT text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()

    def norm(t):
        t = _re.sub(r"[^a-z0-9 ]", "", t.lower())
        return _re.sub(r" +", " ", t)

    raw: dict = {}
    ng: dict = {}
    for (t,) in docs:
        raw[t] = raw.get(t, 0) + 1
        ng.setdefault(norm(t), set()).add(t)
    r = QUERIES["dedup_exact_normalized"](spark, sf_dir).collect()[0]
    assert r["n_docs"] == len(docs)
    assert r["n_raw_groups"] == len(raw)
    assert r["n_norm_groups"] == len(ng)
    assert r["n_norm_groups"] <= r["n_raw_groups"]
    assert r["raw_dups"] == len(docs) - len(raw)
    assert r["norm_dups"] == len(docs) - len(ng)
    assert r["groups_merged_by_normalization"] == sum(
        len(v) - 1 for v in ng.values() if len(v) > 1
    )


def test_norm_quality_corr_near_zero_on_random(spark, sf_dir):
    """Random embeddings carry no quality signal: r-squared stays
    under 2% and sign/r2 recompute from exact sums."""
    import duckdb
    import math

    from aurora_cdc_demo_spark.registry import QUERIES

    con = duckdb.connect()
    vecs = dict(
        con.execute(
            f"SELECT vec_id, embedding"
            f" FROM '{sf_dir}/embeddings.parquet'"
        ).fetchall()
    )
    quality = {
        r["doc_id"]: r["quality_bp"]
        for r in QUERIES["text_quality_score"](
            spark, sf_dir
        ).collect()
    }
    xs = {}
    for v, e in vecs.items():
        xs[v] = math.floor(
            math.sqrt(sum(x * x for x in e)) * 1000000
        )
    pairs = [(xs[v], quality[v]) for v in xs if v in quality]
    n = len(pairs)
    sx = sum(x for x, _ in pairs)
    sy = sum(y for _, y in pairs)
    sxy = sum(x * y for x, y in pairs)
    sxx = sum(x * x for x, _ in pairs)
    syy = sum(y * y for _, y in pairs)
    num = n * sxy - sx * sy
    r2 = (num * num * 1000000) // (
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    r = QUERIES["embed_norm_quality_corr"](spark, sf_dir).collect()[0]
    assert r["n"] == n
    assert r["corr_sign"] == (1 if num > 0 else -1 if num < 0 else 0)
    assert r["r_squared_ppm"] == r2
    assert r2 < 20000


def test_incremental_cc_equals_batch(spark, sf_dir):
    """The star+delta incremental recompute lands on EXACTLY the
    batch component map (the oracle already enforces this at the
    gate; pinned here cross-implementation too)."""
    from aurora_cdc_demo_spark.registry import QUERIES

    batch = {
        r["doc_id"]: r["cluster_id"]
        for r in QUERIES["dedup_clusters"](spark, sf_dir).collect()
    }
    inc = {
        r["doc_id"]: r["cluster_id"]
        for r in QUERIES["dedup_clusters_incremental"](
            spark, sf_dir
        ).collect()
    }
    assert inc == batch


def test_bgnbd_inputs_laws(spark, sf_dir):
    """0 <= t_x <= T per customer; x = 0 iff t_x = 0; stats
    recompute from raw orders."""
    import duckdb

    from aurora_cdc_demo_spark.registry import QUERIES

    con = duckdb.connect()
    per = con.execute(
        f"""
        SELECT o_custkey, COUNT(*),
               MIN(epoch_us(o_orderdate)), MAX(epoch_us(o_orderdate)),
               SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
        FROM '{sf_dir}/orders.parquet' GROUP BY 1
        """
    ).fetchall()
    t_end = max(r[3] for r in per)
    want = {
        r[0]: (
            r[1] - 1,
            (r[3] - r[2]) // 86400000000,
            (t_end - r[2]) // 86400000000,
            r[4] // r[1],
        )
        for r in per
    }
    rows = QUERIES["customer_bgnbd_inputs"](spark, sf_dir).collect()
    got = {
        r["custkey"]: (
            r["x_repeat"],
            r["t_x_days"],
            r["t_age_days"],
            r["mean_order_cents"],
        )
        for r in rows
    }
    assert got == want
    for x, tx, T, _ in got.values():
        assert 0 <= tx <= T
        if x == 0:
            assert tx == 0


def test_theil_sen_matches_python_median_of_slopes(spark, sf_dir):
    import duckdb

    from aurora_cdc_demo_spark.registry import QUERIES

    con = duckdb.connect()
    t0 = con.execute(
        f"SELECT MIN(epoch_us(ts)) FROM '{sf_dir}/events.parquet'"
    ).fetchone()[0]
    daily = sorted(
        con.execute(
            f"SELECT (epoch_us(ts) - {t0}) // 86400000000, COUNT(*)"
            f" FROM '{sf_dir}/events.parquet' GROUP BY 1"
        ).fetchall()
    )
    slopes = sorted(
        ((y2 - y1) * 1000000) // (d2 - d1)
        for i, (d1, y1) in enumerate(daily)
        for d2, y2 in daily[i + 1 :]
    )
    med = slopes[(len(slopes) + 1) // 2 - 1]
    r = QUERIES["events_theil_sen_trend"](spark, sf_dir).collect()[0]
    assert r["n_days"] == len(daily)
    assert r["n_pairs"] == len(slopes)
    assert r["ts_slope_e6"] == med
    # clean stationary data: robust and OLS agree in sign and
    # rough magnitude
    assert abs(r["ts_slope_e6"] - r["ols_slope_e6"]) < 5000000


def test_hubness_profile_recomputes(spark, sf_dir):
    """Histogram and skew sign recompute from the oracle-checked
    KNN edge list; node mass telescopes."""
    import duckdb

    from aurora_cdc_demo_spark.registry import QUERIES

    # r9: hubness profiles the banded-LSH family edge list
    edges = QUERIES["ann_knn_graph_lsh"](spark, sf_dir).collect()
    con = duckdb.connect()
    nodes = [
        v
        for (v,) in con.execute(
            f"SELECT vec_id FROM '{sf_dir}/embeddings.parquet'"
        ).fetchall()
    ]
    indeg = {v: 0 for v in nodes}
    for r in edges:
        indeg[r["neighbor_id"]] += 1
    hist: dict = {}
    for d in indeg.values():
        hist[d] = hist.get(d, 0) + 1
    n = len(nodes)
    s1 = sum(d * c for d, c in hist.items())
    s2 = sum(d * d * c for d, c in hist.items())
    s3 = sum(d * d * d * c for d, c in hist.items())
    skew_num = n * n * s3 - 3 * n * s1 * s2 + 2 * s1**3
    rows = QUERIES["ann_hubness_profile"](spark, sf_dir).collect()
    got = {r["in_degree"]: r for r in rows}
    assert {d: r["n_nodes"] for d, r in got.items()} == hist
    any_row = rows[0]
    assert any_row["n"] == n
    assert any_row["mean_deg_e3"] == (s1 * 1000) // n
    assert any_row["skew_sign"] == (
        1 if skew_num > 0 else -1 if skew_num < 0 else 0
    )
    assert sum(r["n_nodes"] for r in rows) == n


def test_qte_placebo_and_exactness(spark, sf_dir):
    """Per-arm quantiles equal full per-arm sorted picks; QTE ≈ 0
    on the untreated corpus (placebo band)."""
    import hashlib

    import duckdb

    from aurora_cdc_demo_spark.registry import _QTE_GRID, QUERIES

    con = duckdb.connect()
    vals = con.execute(
        f"SELECT user_id, CAST(ROUND(value * 100) AS BIGINT)"
        f" FROM '{sf_dir}/events.parquet'"
    ).fetchall()
    arms: dict = {0: [], 1: []}
    for u, c in vals:
        arm = (
            int(
                hashlib.md5(f"ab:{u}".encode()).hexdigest()[:8], 16
            )
            % 2
        )
        arms[arm].append(c)
    for a in arms:
        arms[a].sort()
    rows = {
        r["q_pct"]: r
        for r in QUERIES["events_arm_quantile_effects"](
            spark, sf_dir
        ).collect()
    }
    assert set(rows) == set(_QTE_GRID)
    for q, r in rows.items():
        for arm, col in ((0, "q_arm0_cents"), (1, "q_arm1_cents")):
            xs = arms[arm]
            t = (q * len(xs) + 99) // 100
            assert r[col] == xs[t - 1]
        assert r["qte_cents"] == r["q_arm1_cents"] - r["q_arm0_cents"]
        # placebo: same generator both arms
        assert abs(r["qte_cents"]) < 2000


def test_streaming_merkle_leaves_merge_additively(
    spark, sf_dir, tmp_path
):
    """#366's leaf layer is maintainable by foreachBatch: chunk
    checksums are SUMs of per-row hashes, so per-micro-batch chunk
    sums ADD to the batch chunk sums — and identical leaves force
    an identical Merkle root. Stream side uses the events-log
    stream (#326's side A)."""
    import time

    from pyspark.sql import functions as F

    from aurora_cdc_demo_spark.registry import QUERIES
    from aurora_cdc_demo_spark.sources.cdc_log import (
        cdc_operation_log,
    )
    from aurora_cdc_demo_spark.streaming.pipelines import (
        read_cdc_stream,
    )

    # write the log as a 2-chunk file stream (same fixture shape
    # as test_streaming.log_dir, local to keep fixtures decoupled)
    out_in = tmp_path / "merkle_stream_in"
    log = cdc_operation_log(spark, sf_dir)
    split = F.to_timestamp(F.lit("2024-01-16 00:00:00"))
    log.where(F.col("ts") < split).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(out_in / "b0"))
    log.where(F.col("ts") >= split).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(out_in / "b1"))
    import shutil
    from pathlib import Path

    flat = tmp_path / "merkle_flat"
    flat.mkdir()
    i = 0
    for sub in ("b0", "b1"):
        for f in sorted(Path(out_in, sub).glob("*.parquet")):
            shutil.copy(f, flat / f"{i:03d}.parquet")
            i += 1

    out = str(tmp_path / "merkle_batches")
    chunk_expr = (
        "key_id div 10 AS chunk",
        "CAST(conv(substring(md5(CAST(key_id AS STRING) || '|' ||"
        " CAST(seq AS STRING) || '|' || operation), 1, 8), 16, 10)"
        " AS BIGINT) AS h",
    )

    def apply_batch(batch_df, batch_id):
        (
            batch_df.where("key_id IS NOT NULL AND seq % 251 <> 250")
            .selectExpr(*chunk_expr)
            .groupBy("chunk")
            .agg(
                F.sum("h").alias("checksum"),
                F.count(F.lit(1)).alias("n_rows"),
            )
            .write.mode("append")
            .parquet(out)
        )

    q = (
        spark.readStream.schema(log.schema)
        .parquet(str(flat))
        .writeStream.foreachBatch(apply_batch)
        .option(
            "checkpointLocation", str(tmp_path / "ckpt_merkle")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    merged = {
        r["chunk"]: (r["cs"], r["nr"])
        for r in spark.read.parquet(out)
        .groupBy("chunk")
        .agg(
            F.sum("checksum").alias("cs"), F.sum("n_rows").alias("nr")
        )
        .collect()
    }
    want = {
        r["chunk"]: (r["cs"], r["nr"])
        for r in log.where(
            "key_id IS NOT NULL AND seq % 251 <> 250"
        )
        .selectExpr(*chunk_expr)
        .groupBy("chunk")
        .agg(
            F.sum("h").alias("cs"), F.count(F.lit(1)).alias("nr")
        )
        .collect()
    }
    assert merged == want


def test_change_feed_cdf_conventions(spark, sf_dir):
    """Every UPDATE with a known preimage emits exactly two rows
    (pre+post); inserts/deletes one; replaying the feed's
    postimages reproduces latest state values."""
    from aurora_cdc_demo_spark.registry import QUERIES

    log = QUERIES["cdc_operation_log"](spark, sf_dir).collect()
    feed = QUERIES["cdc_change_feed"](spark, sf_dir).collect()
    by_seq: dict = {}
    for r in feed:
        by_seq.setdefault(r["seq"], []).append(r["change_type"])
    prev_known: dict = {}
    has_prev: dict = {}
    for r in sorted(log, key=lambda r: (r["ts"], r["seq"])):
        k = r["key_id"]
        has_prev[r["seq"]] = k in prev_known
        prev_known[k] = r["value"]
    for r in log:
        kinds = sorted(by_seq.get(r["seq"], []))
        if r["operation"] == "INSERT":
            assert kinds == ["insert"]
        elif r["operation"] == "UPDATE":
            want = (
                ["update_postimage", "update_preimage"]
                if has_prev[r["seq"]]
                else ["update_postimage"]
            )
            assert kinds == sorted(want)
        elif r["operation"] == "DELETE":
            assert kinds in (["delete"], [])  # no-preimage delete


def test_seasonal_strength_recomputes_and_bounds(spark, sf_dir):
    from aurora_cdc_demo_spark.registry import QUERIES

    stl = [
        r
        for r in QUERIES["events_stl_decomposition"](
            spark, sf_dir
        ).collect()
        if r["trend_ma7"] is not None and r["residual"] is not None
    ]
    n = len(stl)
    rs = [r["residual"] for r in stl]
    ds = [r["n_events"] - r["trend_ma7"] for r in stl]
    var_r = n * sum(x * x for x in rs) - sum(rs) ** 2
    var_d = n * sum(x * x for x in ds) - sum(ds) ** 2
    want = max(0, 1000000 - (var_r * 1000000) // max(1, var_d))
    r = QUERIES["events_seasonal_strength"](spark, sf_dir).collect()[0]
    assert r["n"] == n
    assert r["var_resid_num"] == var_r
    assert r["var_detrended_num"] == var_d
    assert r["seasonal_strength_ppm"] == want
    assert 0 <= want <= 1000000


def test_revenue_gini_matches_python_closed_form(spark, sf_dir):
    import duckdb

    from aurora_cdc_demo_spark.registry import QUERIES

    con = duckdb.connect()
    per = con.execute(
        f"""
        SELECT o_custkey, SUM(CAST(ROUND(o_totalprice * 100)
               AS BIGINT))
        FROM '{sf_dir}/orders.parquet' GROUP BY 1
        """
    ).fetchall()
    xs = [
        x
        for _, x in sorted(per, key=lambda r: (r[1], r[0]))
    ]
    n = len(xs)
    tot = sum(xs)
    weighted = sum((i + 1) * x for i, x in enumerate(xs))
    want = ((2 * weighted - (n + 1) * tot) * 1000000) // (n * tot)
    r = QUERIES["customer_revenue_gini"](spark, sf_dir).collect()[0]
    assert r["n"] == n
    assert r["total_rev_e2"] == tot
    assert r["gini_ppm"] == want
    assert 0 <= want < 1000000


def test_error_budget_ledger_telescopes(spark, sf_dir):
    """Cumulative columns telescope; the exhausted flag matches
    the cumulative comparison each day; totals match raw."""
    import duckdb

    from aurora_cdc_demo_spark.registry import (
        _SLO_BUDGET_BP,
        QUERIES,
    )

    rows = sorted(
        QUERIES["events_error_budget_burn"](
            spark, sf_dir
        ).collect(),
        key=lambda r: r["day_idx"],
    )
    ce = cr = 0
    for r in rows:
        ce += r["n_events"]
        cr += r["n_errors"]
        assert r["cum_events"] == ce
        assert r["cum_errors"] == cr
        budget = (ce * _SLO_BUDGET_BP) // 10000
        assert r["budget_errors"] == budget
        assert r["budget_exhausted"] == (1 if cr > budget else 0)
    con = duckdb.connect()
    n, ne = con.execute(
        f"SELECT COUNT(*), SUM(CASE WHEN event_type = 'error'"
        f" THEN 1 ELSE 0 END) FROM '{sf_dir}/events.parquet'"
    ).fetchone()
    assert ce == n and cr == ne


def test_transitivity_rollup_consistent(spark, sf_dir):
    """Global row recomputes from the per-node table; transitivity
    and mean local clustering both land in [0, 1]."""
    from aurora_cdc_demo_spark.registry import QUERIES

    per = QUERIES["graph_triangle_knn"](spark, sf_dir).collect()
    tri = sum(r["triangles"] for r in per)
    wed = sum(
        r["degree"] * (r["degree"] - 1) // 2 for r in per
    )
    r = QUERIES["graph_transitivity_knn"](spark, sf_dir).collect()[0]
    assert r["n_nodes"] == len(per)
    assert r["sum_closed_triads"] == tri
    assert r["sum_wedges"] == wed
    assert r["transitivity_ppm"] == (tri * 1000000) // max(1, wed)
    assert 0 <= r["transitivity_ppm"] <= 1000000
    assert (
        r["mean_local_clustering_bp"]
        == sum(x["clustering_bp"] for x in per) // len(per)
    )


def test_three_way_split_exact_per_stratum(spark, sf_dir):
    """Within every source: |train| = floor(0.8n), |val| =
    floor(0.9n) - floor(0.8n), |test| = rest; splits partition."""
    import duckdb

    from aurora_cdc_demo_spark.registry import QUERIES

    con = duckdb.connect()
    sizes = dict(
        con.execute(
            f"SELECT source, COUNT(*)"
            f" FROM '{sf_dir}/documents.parquet' GROUP BY 1"
        ).fetchall()
    )
    rows = QUERIES["sample_three_way_split"](
        spark, sf_dir
    ).collect()
    by_src: dict = {}
    for r in rows:
        by_src.setdefault(r["source"], {})[r["split"]] = r["n_docs"]
    assert set(by_src) == set(sizes)
    for src, n in sizes.items():
        got = by_src[src]
        t = (n * 8000) // 10000
        tv = (n * 9000) // 10000
        assert got.get("train", 0) == t
        assert got.get("val", 0) == tv - t
        assert got.get("test", 0) == n - tv
        assert sum(got.values()) == n


def test_session_coverage_sweep_matches_python(spark, sf_dir):
    """Covered time recomputes by merging intervals in Python;
    bounds: covered <= span, covered <= sum durations, and
    busy/overlap identities hold."""
    from aurora_cdc_demo_spark.registry import QUERIES

    sess = QUERIES["cdc_sessionize"](spark, sf_dir).collect()
    ivs = sorted(
        (
            int(r["session_start"].timestamp() * 1_000_000),
            int(r["session_end"].timestamp() * 1_000_000),
        )
        for r in sess
    )
    covered = 0
    cur_a, cur_b = ivs[0]
    for a, b in ivs[1:]:
        if a > cur_b:
            covered += cur_b - cur_a
            cur_a, cur_b = a, b
        else:
            cur_b = max(cur_b, b)
    covered += cur_b - cur_a
    sum_dur = sum(b - a for a, b in ivs)
    span = max(b for _, b in ivs) - min(a for a, _ in ivs)
    r = QUERIES["events_session_coverage"](spark, sf_dir).collect()[0]
    assert r["n_sessions"] == len(ivs)
    assert r["covered_s"] == covered // 1_000_000
    assert r["sum_duration_s"] == sum_dur // 1_000_000
    assert r["span_s"] == span // 1_000_000
    assert r["overlap_factor_e3"] == (sum_dur * 1000) // max(
        1, covered
    )
    assert r["busy_share_bp"] == (covered * 10000) // max(1, span)
    assert covered <= span and covered <= sum_dur


def test_allen_relations_exclusive_and_complete(spark, sf_dir):
    """Every candidate pair lands in exactly one of the 13
    relations (no 'other'); census recomputes in Python."""
    from aurora_cdc_demo_spark.registry import QUERIES

    sess = QUERIES["cdc_sessionize"](spark, sf_dir).collect()
    ivs = [
        (
            r["key_id"],
            r["session_id"],
            int(r["session_start"].timestamp() * 1_000_000),
            int(r["session_end"].timestamp() * 1_000_000),
        )
        for r in sess
    ]

    def rel(a1, b1, a2, b2):
        if b1 < a2:
            return "before"
        if b1 == a2:
            return "meets"
        if a1 == a2 and b1 == b2:
            return "equals"
        if a1 == a2 and b1 < b2:
            return "starts"
        if a1 == a2:
            return "started_by"
        if b1 == b2 and a1 > a2:
            return "finishes"
        if b1 == b2:
            return "finished_by"
        if a1 > a2 and b1 < b2:
            return "during"
        if a1 < a2 and b1 > b2:
            return "contains"
        if a1 < a2 and b1 > a2 and b1 < b2:
            return "overlaps"
        if a2 < a1 and b2 > a1 and b2 < b1:
            return "overlapped_by"
        if b2 < a1:
            return "after"
        if b2 == a1:
            return "met_by"
        return "other"

    census: dict = {}
    by_hr: dict = {}
    for k, sid, a, b in ivs:
        by_hr.setdefault(a // 3600000000, []).append((k, sid, a, b))
    for group in by_hr.values():
        for i, (k1, s1, a1, b1) in enumerate(group):
            for k2, s2, a2, b2 in group:
                if (k1, s1) < (k2, s2):
                    r_ = rel(a1, b1, a2, b2)
                    census[r_] = census.get(r_, 0) + 1
    assert "other" not in census
    rows = QUERIES["events_allen_relations"](
        spark, sf_dir
    ).collect()
    got = {r["relation"]: r["n_pairs"] for r in rows}
    assert got == census
