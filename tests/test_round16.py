"""R16 operator laws: deterministic quantile sketch (Munro-Paterson
halving cascade) — Python recompute, rank-error bound, mergeability.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from aurora_cdc_demo_spark.registry import (  # noqa: E402
    _MRL_K,
    _MRL_PCTS,
    QUERIES,
)
from aurora_cdc_demo_spark.tables import load_table  # noqa: E402


def _cascade(items: list[tuple[int, int]], k: int):
    """Python twin of the SQL halving cascade: items are
    (value_cents, id); returns (survivors_sorted, weight)."""
    cur = sorted(items)
    w = 1
    while len(cur) > k:
        cur = cur[::2]  # odd ranks, 1-indexed == evens 0-indexed
        w *= 2
    return cur, w


def _events_cents(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "value", "event_id")
        .collect()
    )
    by_type: dict[str, list[tuple[int, int]]] = {}
    for r in rows:
        if r["value"] is None:
            continue
        # Python round() is banker's like Spark/DuckDB ROUND halves
        # to even on exact .5 cents — the testdata has none (values
        # are 2-dp already), so int(round()) matches both engines.
        by_type.setdefault(r["event_type"], []).append(
            (int(round(r["value"] * 100)), r["event_id"])
        )
    return by_type


def test_mrl_sketch_recompute(spark, sf_dir):
    """The full cascade recomputed in Python must agree exactly:
    survivor count, weight (a power of two == the halving count),
    and every quantile estimate read at survivor rank
    ceil(q*m/100)."""
    got = {
        r["event_type"]: r
        for r in QUERIES["events_mrl_quantile_sketch"](
            spark, sf_dir
        ).collect()
    }
    by_type = _events_cents(spark, sf_dir)
    assert set(got) == set(by_type)
    for t, items in by_type.items():
        surv, w = _cascade(items, _MRL_K)
        m = len(surv)
        r = got[t]
        assert r["n_items"] == len(items)
        assert r["n_survivors"] == m
        assert r["item_weight"] == w
        assert w & (w - 1) == 0  # power of two
        assert m <= _MRL_K
        for q in _MRL_PCTS:
            j = max(1, (q * m + 99) // 100)
            assert r[f"p{q}_cents"] == surv[j - 1][0]


def test_mrl_sketch_rank_error_bound(spark, sf_dir):
    """Sketch quantile estimates are rank-accurate within
    weight*(halvings+2) of the exact target rank — the
    Munro-Paterson deterministic bound (each halving displaces any
    rank by at most its level weight); estimates are monotone
    across the percentile grid."""
    got = {
        r["event_type"]: r
        for r in QUERIES["events_mrl_quantile_sketch"](
            spark, sf_dir
        ).collect()
    }
    by_type = _events_cents(spark, sf_dir)
    for t, items in by_type.items():
        vals = sorted(v for v, _ in items)
        n = len(vals)
        r = got[t]
        w = r["item_weight"]
        c = w.bit_length() - 1
        bound = w * (c + 2)
        prev = None
        for q in _MRL_PCTS:
            est = r[f"p{q}_cents"]
            if prev is not None:
                assert est >= prev
            prev = est
            # exact rank window of est within the sorted values
            import bisect

            lo = bisect.bisect_left(vals, est) + 1
            hi = bisect.bisect_right(vals, est)
            target = max(1, (q * n + 99) // 100)
            assert lo - bound <= target <= hi + bound, (
                t,
                q,
                lo,
                hi,
                target,
                bound,
            )


def test_mrl_sketch_mergeable(spark, sf_dir):
    """Mergeability — the property that makes the cascade a SKETCH:
    split each type's stream by event_id parity, cascade each half,
    concat the two summaries (re-weighting to the max weight by
    resampling the lighter one is unnecessary when both halves halve
    equally often; assert weights equal here), re-halve to capacity,
    and the merged estimates stay within the combined rank-error
    bound of the exact quantiles."""
    by_type = _events_cents(spark, sf_dir)
    for t, items in by_type.items():
        a = [x for x in items if x[1] % 2 == 0]
        b = [x for x in items if x[1] % 2 == 1]
        sa, wa = _cascade(a, _MRL_K)
        sb, wb = _cascade(b, _MRL_K)
        # equal-rate halving on near-equal split sizes
        w = max(wa, wb)
        # re-weight lighter side by keeping every (w//wx)-th item
        def lift(s, wx):
            step = w // wx
            return s[::step] if step > 1 else s

        merged = sorted(lift(sa, wa) + lift(sb, wb))
        mw = w
        while len(merged) > _MRL_K:
            merged = merged[::2]
            mw *= 2
        vals = sorted(v for v, _ in items)
        n = len(vals)
        m = len(merged)
        c = mw.bit_length() - 1
        bound = mw * (c + 3)
        for q in _MRL_PCTS:
            j = max(1, (q * m + 99) // 100)
            est = merged[j - 1][0]
            import bisect

            lo = bisect.bisect_left(vals, est) + 1
            hi = bisect.bisect_right(vals, est)
            target = max(1, (q * n + 99) // 100)
            assert lo - bound <= target <= hi + bound


def test_node2vec_recompute(spark, sf_dir):
    """The full biased walk recomputed in Python from the SAME KNN
    edge list: second-order weights (back=1, common=4, fwd=16),
    cumulative intervals in nn_rank order, md5 pick — every
    (start, step, node) row must match exactly; and the bias must
    be observable: walks differ from the weights-all-equal
    (first-order) simulation somewhere on this data."""
    import hashlib

    from aurora_cdc_demo_spark.registry import (
        _N2V_BACK,
        _N2V_COMMON,
        _N2V_FWD,
        _N2V_STEPS,
    )

    # r9: node2vec walks the banded-LSH family edge list
    edges = {}
    for r in QUERIES["ann_knn_graph_lsh"](spark, sf_dir).collect():
        edges.setdefault(r["vec_id"], []).append(
            (r["nn_rank"], r["neighbor_id"])
        )
    for v in edges:
        edges[v].sort()
    adj = {
        (v, nb) for v, nbs in edges.items() for _, nb in nbs
    }

    def pick_hash(start, prev, node, s):
        h = hashlib.md5(
            f"{start}:{prev}:{node}:{s}".encode()
        ).hexdigest()[:8]
        return int(h, 16)

    def walk(start, weights):
        back, common, fwd = weights
        prev, node = start, start
        out = [(start, 0, start)]
        for s in range(1, _N2V_STEPS + 1):
            nbs = edges.get(node)
            if not nbs:
                break
            wts = []
            for _, nb in nbs:
                if nb == prev:
                    wts.append(back)
                elif (prev, nb) in adj:
                    wts.append(common)
                else:
                    wts.append(fwd)
            tot = sum(wts)
            p = pick_hash(start, prev, node, s) % tot
            cw = 0
            for (_, nb), w in zip(nbs, wts):
                cw += w
                if p < cw:
                    prev, node = node, nb
                    break
            out.append((start, s, node))
        return out

    starts = sorted(
        {r["start_id"] for r in QUERIES["graph_node2vec_corpus"](
            spark, sf_dir
        ).select("start_id").distinct().collect()}
    )
    got = sorted(
        (r["start_id"], r["step"], r["node_id"])
        for r in QUERIES["graph_node2vec_corpus"](
            spark, sf_dir
        ).collect()
    )
    want = sorted(
        row
        for st in starts
        for row in walk(st, (_N2V_BACK, _N2V_COMMON, _N2V_FWD))
    )
    assert got == want
    first_order = sorted(
        row for st in starts for row in walk(st, (1, 1, 1))
    )
    assert first_order != want  # the p/q bias is live on this data


def test_topk_ivm_refill_and_copy_forward(spark):
    """Crafted-log mechanism proof for the top-K IVM: a post-split
    DELETE of group A's top row forces a REFILL (rank K+1 pulled in
    from the merged state) and an insert re-ranks A, while untouched
    group B is copied forward verbatim — the affected-group set is
    exactly {A}."""
    import datetime as dt

    from aurora_cdc_demo_spark.registry import (
        _TOPK_IVM_K,
        _topk_view_ivm,
    )

    assert _TOPK_IVM_K == 3
    old = dt.datetime(2024, 1, 10)
    new = dt.datetime(2024, 1, 25)
    rows = [
        # (key, seq, op, type, ts, value) — old half
        (1, 1, "INSERT", "A", old, 60.0),
        (2, 2, "INSERT", "A", old, 50.0),
        (3, 3, "INSERT", "A", old, 40.0),
        (4, 4, "INSERT", "A", old, 30.0),
        (11, 5, "INSERT", "B", old, 9.0),
        (12, 6, "INSERT", "B", old, 8.0),
        (13, 7, "INSERT", "B", old, 7.0),
        (14, 8, "INSERT", "B", old, 6.0),
        # new half: delete A's top-1, insert a mid A row
        (1, 9, "DELETE", "A", new, 60.0),
        (5, 10, "INSERT", "A", new, 45.0),
    ]
    log = spark.createDataFrame(
        rows,
        "key_id long, seq long, operation string, event_type string,"
        " ts timestamp, value double",
    )
    probe: dict = {}
    got = sorted(
        (r["event_type"], r["rnk"], r["key_id"], r["value_cents"])
        for r in _topk_view_ivm(
            log, "2024-01-24 00:00:00", probe
        ).collect()
    )
    assert probe["affected"] == ["A"]
    assert got == [
        ("A", 1, 2, 5000),
        ("A", 2, 5, 4500),
        ("A", 3, 3, 4000),  # key 4 refilled INTO state, 3 holds rank
        ("B", 1, 11, 900),
        ("B", 2, 12, 800),
        ("B", 3, 13, 700),
    ]


def test_topk_ivm_refill_from_below_view(spark):
    """Deletion refill specifically: deleting TWO of A's top-3
    pulls former rank-4 (key 4) into the view — a row yesterday's
    VIEW never contained, provable only because re-ranking reads
    the merged STATE."""
    import datetime as dt

    from aurora_cdc_demo_spark.registry import _topk_view_ivm

    old = dt.datetime(2024, 1, 10)
    new = dt.datetime(2024, 1, 25)
    rows = [
        (1, 1, "INSERT", "A", old, 60.0),
        (2, 2, "INSERT", "A", old, 50.0),
        (3, 3, "INSERT", "A", old, 40.0),
        (4, 4, "INSERT", "A", old, 30.0),
        (1, 5, "DELETE", "A", new, 60.0),
        (2, 6, "DELETE", "A", new, 50.0),
    ]
    log = spark.createDataFrame(
        rows,
        "key_id long, seq long, operation string, event_type string,"
        " ts timestamp, value double",
    )
    got = sorted(
        (r["event_type"], r["rnk"], r["key_id"], r["value_cents"])
        for r in _topk_view_ivm(log, "2024-01-24 00:00:00").collect()
    )
    assert got == [("A", 1, 3, 4000), ("A", 2, 4, 3000)]


def test_kn_surprisal_recompute(spark, sf_dir):
    """Interpolated-KN surprisal recomputed in exact Python
    rationals over the same train (doc_id%4!=0) / held-out
    (doc_id%4==0) split: bigram/context/continuation counts,
    three-case num/den algebra, bitlen quantization — every row
    must match; and the smoothing must be LIVE on this data (some
    held-out bigram is unseen in train)."""
    from collections import Counter

    got = {
        r["doc_id"]: (
            r["n_bigrams"],
            r["n_unseen"],
            r["surprisal_bits"],
            r["mean_centibits"],
        )
        for r in QUERIES["text_kn_surprisal"](spark, sf_dir).collect()
    }
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    ).collect()
    bgc: Counter = Counter()
    vocab = set()
    held = {}
    for d in docs:
        t = d["text"].split(" ")
        bgs = list(zip(t, t[1:]))
        if d["doc_id"] % 4 != 0:
            vocab.update(t)
            for b in bgs:
                bgc[b] += 1
        elif bgs:
            held[d["doc_id"]] = bgs
    ctx_c1: Counter = Counter()
    ctx_r: Counter = Counter()
    cont: Counter = Counter()
    n1 = n2 = 0
    for (w1, w2), c in bgc.items():
        ctx_c1[w1] += c
        ctx_r[w1] += 1
        cont[w2] += 1
        n1 += c == 1
        n2 += c == 2
    nt = len(bgc)
    v = len(vocab)
    dn, dd = n1, n1 + 2 * n2
    want = {}
    total_unseen = 0
    for doc_id, bgs in held.items():
        bits = []
        unseen = 0
        for w1, w2 in bgs:
            nc1 = cont.get(w2, 0) + 1
            if w1 not in ctx_c1:
                num, den = nc1, nt + v
                unseen += 1
            elif (w1, w2) not in bgc:
                num = dn * ctx_r[w1] * nc1
                den = ctx_c1[w1] * dd * (nt + v)
                unseen += 1
            else:
                c = bgc[(w1, w2)]
                num = (c * dd - dn) * (nt + v) + dn * ctx_r[w1] * nc1
                den = ctx_c1[w1] * dd * (nt + v)
            assert den >= num > 0
            bits.append((den // num).bit_length() - 1)
        total_unseen += unseen
        want[doc_id] = (
            len(bgs),
            unseen,
            sum(bits),
            (100 * sum(bits)) // len(bgs),
        )
    assert got == want
    assert total_unseen > 0  # the smoothing branch is exercised


def test_sax_symbols_recompute(spark, sf_dir):
    """SAX recomputed in Python: zero-filled daily series on the
    global day spine, ceil-rank quartile breakpoints, 5-day PAA
    floor-means, alphabet assignment — exact row match; symbols
    must span more than one letter per type (the alphabet is live),
    and low/high PAA segments map to ordered symbols."""
    import datetime as dt
    from collections import Counter

    from aurora_cdc_demo_spark.registry import _SAX_WINDOW

    got = {
        (r["event_type"], r["seg"]): (
            r["seg_days"],
            r["paa_e2"],
            r["b25_e2"],
            r["b50_e2"],
            r["b75_e2"],
            r["symbol"],
        )
        for r in QUERIES["events_sax_symbols"](spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "ts"
    ).collect()
    daily: Counter = Counter()
    days = set()
    types = set()
    for r in ev:
        d = r["ts"].date()
        days.add(d)
        types.add(r["event_type"])
        daily[(r["event_type"], d)] += 1
    days = sorted(days)
    want = {}
    for t in types:
        series = [daily.get((t, d), 0) for d in days]
        n = len(series)
        ranked = sorted(
            (v, d) for v, d in zip(series, days)
        )
        brk = [
            ranked[(q * n + 99) // 100 - 1][0] * 100
            for q in (25, 50, 75)
        ]
        for seg in range((n + _SAX_WINDOW - 1) // _SAX_WINDOW):
            chunk = series[seg * _SAX_WINDOW:(seg + 1) * _SAX_WINDOW]
            paa = (100 * sum(chunk)) // len(chunk)
            sym = (
                "a" if paa < brk[0]
                else "b" if paa < brk[1]
                else "c" if paa < brk[2]
                else "d"
            )
            want[(t, seg)] = (
                len(chunk), paa, brk[0], brk[1], brk[2], sym
            )
    assert got == want
    for t in types:
        syms = {v[5] for (tt, _), v in got.items() if tt == t}
        assert len(syms) > 1  # alphabet live per type


def test_mrr_multiquery_recompute(spark, sf_dir):
    """Macro metrics recomputed in Python from the three arms'
    own (oracle-checked) outputs and the vec->label map: per-query
    first-relevant rank, floor-ppm reciprocal ranks and recalls,
    floor-div macro averages — exact row match per arm."""
    from aurora_cdc_demo_spark.operators import similarity as sim

    labels = {
        r["vec_id"]: r["label"]
        for r in load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "label")
        .collect()
    }
    nrel = {
        q: sum(
            1
            for d, dl in labels.items()
            if d != q and dl == labels[q]
        )
        for q in range(sim.N_QUERIES)
    }
    got = {
        r["arm"]: (
            r["n_queries"],
            r["macro_mrr_ppm"],
            r["macro_recall_ppm"],
            r["n_hit_queries"],
            r["n_rel_at_k_total"],
        )
        for r in QUERIES["retrieval_mrr_multiquery"](
            spark, sf_dir
        ).collect()
    }
    arm_keys = {
        "exact": "embed_cosine_topk",
        "ivf": "ann_ivf_multiprobe",
        "sign": "embed_sign_hamming_topk",
    }
    for arm, key in arm_keys.items():
        per_q: dict = {}
        for r in QUERIES[key](spark, sf_dir).collect():
            q = r["query_id"]
            rel = labels[r["neighbor_id"]] == labels[q]
            n, first = per_q.get(q, (0, None))
            if rel:
                n += 1
                if first is None or r["nn_rank"] < first:
                    first = r["nn_rank"]
            per_q[q] = (n, first)
        rr = [
            0 if first is None else 1000000 // first
            for _, first in per_q.values()
        ]
        rec = [
            (1000000 * n) // min(sim.TOPK, nrel[q])
            for q, (n, _) in per_q.items()
        ]
        want = (
            len(per_q),
            sum(rr) // len(per_q),
            sum(rec) // len(per_q),
            sum(1 for n, _ in per_q.values() if n > 0),
            sum(n for n, _ in per_q.values()),
        )
        assert got[arm] == want, arm


def test_mrl_streaming_maintenance(spark, sf_dir, tmp_path):
    """The LEVELED sketch is maintainable by foreachBatch on an
    endless stream: feed the events table through a file stream in
    micro-batches, keep the (grp, lvl, v, w, id) buffer table as
    the only state (level-0 insert + compact per batch), and the
    final estimates stay within the MRL rank-error budget of the
    exact quantiles — with state bounded by cap x levels per type
    however long the stream runs."""
    from pyspark.sql import functions as F

    from aurora_cdc_demo_spark.operators.sketches import (
        MRL_CAP,
        mrl_compact,
        mrl_level0,
        mrl_quantiles,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "value", "event_id", "ts"
    )
    incoming = tmp_path / "mrl_in"
    split = F.to_timestamp(F.lit("2024-01-16 00:00:00"))
    ev.where(F.col("ts") < split).coalesce(1).write.parquet(
        str(incoming / "b0")
    )
    ev.where(F.col("ts") >= split).coalesce(1).write.parquet(
        str(incoming / "b1")
    )
    state_dir = str(tmp_path / "mrl_state")

    def apply_batch(batch_df, batch_id):
        lvl0 = mrl_level0(
            batch_df,
            "event_type",
            "CAST(ROUND(value * 100) AS BIGINT)",
            "event_id",
        )
        try:
            state = spark.read.parquet(state_dir)
        except Exception:
            state = lvl0.limit(0)
        merged = mrl_compact(state.unionByName(lvl0))
        merged.write.mode("overwrite").parquet(state_dir + "_next")
        # swap (stage-and-swap, the transactional-sink discipline)
        spark.read.parquet(state_dir + "_next").write.mode(
            "overwrite"
        ).parquet(state_dir)

    stream = (
        spark.readStream.schema(ev.drop("ts").schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(incoming / "*"))
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda df, bid: apply_batch(df, bid)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt_mrl"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    final = spark.read.parquet(state_dir)
    # bounded state: <= cap rows per (type, level)
    for r in final.groupBy("grp", "lvl").count().collect():
        assert r["count"] <= MRL_CAP
    ests = {
        (r["grp"], r["pct"]): r["est_cents"]
        for r in mrl_quantiles(final).collect()
    }
    by_type = _events_cents(spark, sf_dir)
    import bisect

    for t, items in by_type.items():
        vals = sorted(v for v, _ in items)
        n = len(vals)
        max_w = max(
            r["w"] for r in final.where(F.col("grp") == t).collect()
        )
        levels = max_w.bit_length()  # levels touched
        bound = max_w * (levels + 3)
        for q_ in (50, 90, 99):
            est = ests[(t, q_)]
            lo = bisect.bisect_left(vals, est) + 1
            hi = bisect.bisect_right(vals, est)
            target = max(1, (q_ * n + 99) // 100)
            assert lo - bound <= target <= hi + bound, (
                t, q_, lo, hi, target, bound,
            )


def test_int8_gemm_recompute_and_boundary(spark, sf_dir):
    """The GEMM arm recomputed in pure Python from the embeddings:
    e6-floor, per-dim [lo,hi], 256-bin codes, centered integer dot,
    (dot DESC, id ASC) top-5 — exact row match across the
    numpy/JVM/Python triple; and the plan carries exactly one
    MapInPandas boundary (the documented compute-bound exhibit)."""
    import math

    df = QUERIES["ann_int8_gemm_topk"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInPandas") == 1
    got = sorted(
        (r["query_id"], r["nn_rank"], r["neighbor_id"], r["dot_int8"])
        for r in df.collect()
    )

    from aurora_cdc_demo_spark.operators import similarity as sim

    emb = {
        r["vec_id"]: list(r["embedding"])
        for r in load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    }
    dims = len(next(iter(emb.values())))
    xi = {
        v: [math.floor(float(x) * 1000000) for x in xs]
        for v, xs in emb.items()
    }
    lo = [min(x[d] for x in xi.values()) for d in range(dims)]
    hi = [max(x[d] for x in xi.values()) for d in range(dims)]
    codes = {
        v: [
            0
            if hi[d] == lo[d]
            else ((x[d] - lo[d]) * 256) // (hi[d] - lo[d] + 1)
            for d in range(dims)
        ]
        for v, x in xi.items()
    }
    want = []
    for q in range(sim.N_QUERIES):
        cq = codes[q]
        scored = sorted(
            (
                -sum(
                    (cq[d] - 128) * (cv[d] - 128)
                    for d in range(dims)
                ),
                v,
            )
            for v, cv in codes.items()
            if v != q
        )[: sim.TOPK]
        for rnk, (negdot, v) in enumerate(scored, 1):
            want.append((q, rnk, v, -negdot))
    assert got == sorted(want)


def test_ppjoin_equals_bruteforce_and_prunes(spark, sf_dir):
    """Exact-recall theorem check on real data: the PPJoin pair
    list equals the brute-force shared-shingle pair list (#26)
    exactly — same pairs, same jaccard_bp; and the prefix index is
    a strict subset of the shingle mass (the filter actually
    prunes)."""
    from aurora_cdc_demo_spark.operators import dedup as dd

    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard_bp"]
        for r in QUERIES["dedup_ppjoin_exact"](spark, sf_dir).collect()
    }
    want = {
        (r["doc_a"], r["doc_b"]): r["jaccard_bp"]
        for r in QUERIES["dedup_ngram_jaccard"](
            spark, sf_dir
        ).collect()
    }
    assert got == want
    assert got  # non-trivial on this data

    sh = dd.shingles(load_table(spark, sf_dir, "documents"))
    rows = sh.collect()
    from collections import Counter

    df = Counter(r["s"] for r in rows)
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["s"])
    tbp = dd.JACCARD_THRESHOLD_BP
    n_sh = len(rows)
    n_prefix = 0
    for doc, toks in by_doc.items():
        c = len(toks)
        plen = c - ((tbp * c + 9999) // 10000) + 1
        n_prefix += plen
        # pigeonhole sanity: prefix + required overlap > c
        assert plen + ((tbp * c + 9999) // 10000) == c + 1
    assert n_prefix < n_sh  # the prefix filter prunes the index


def test_chao1_recompute_and_laws(spark, sf_dir):
    """Chao1 recomputed in Python from (type, user) frequencies —
    exact match; estimator laws: chao1_est >= d_observed always
    (the correction only adds), equality iff f1 <= 1, and coverage
    in [0, 10000]."""
    from collections import Counter

    got = {
        r["event_type"]: r
        for r in QUERIES["events_chao1_richness"](
            spark, sf_dir
        ).collect()
    }
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "user_id"
    ).collect()
    freq: Counter = Counter((r["event_type"], r["user_id"]) for r in ev)
    by_type: dict = {}
    for (t, _u), k in freq.items():
        n, d, f1, f2 = by_type.get(t, (0, 0, 0, 0))
        by_type[t] = (n + k, d + 1, f1 + (k == 1), f2 + (k == 2))
    for t, (n, d, f1, f2) in by_type.items():
        r = got[t]
        chao1 = d + (f1 * (f1 - 1)) // (2 * (f2 + 1))
        cov = 10000 - (10000 * f1) // n
        assert (
            r["n_events"],
            r["d_observed"],
            r["f1"],
            r["f2"],
            r["chao1_est"],
            r["coverage_bp"],
        ) == (n, d, f1, f2, chao1, cov)
        assert r["chao1_est"] >= r["d_observed"]
        if f1 <= 1:
            assert r["chao1_est"] == r["d_observed"]
        assert 0 <= r["coverage_bp"] <= 10000


def test_scd4_minidim_laws(spark, sf_dir):
    """SCD4 structural laws: band runs never exceed versions
    (collapse only shrinks), the compression is LIVE on this data
    (some key has runs < versions), current band brackets hold
    band_lo <= cur value cents <= band_hi, and the live-key set
    equals SCD1's."""
    rows = QUERIES["debezium_gold_scd4_minidim"](
        spark, sf_dir
    ).collect()
    assert rows
    compressed = 0
    for r in rows:
        assert 1 <= r["n_band_runs"] <= r["n_versions"]
        assert r["band_lo_cents"] <= r["band_hi_cents"]
        assert (
            r["band_lo_cents"]
            == r["band_id"] * (r["band_hi_cents"] - r["band_lo_cents"] + 1)
        )
        assert 0 < r["history_ratio_bp"] <= 10000
        compressed += r["n_band_runs"] < r["n_versions"]
    assert compressed > 0
    scd1_keys = {
        r["key_id"]
        for r in QUERIES["debezium_gold_scd1"](spark, sf_dir).collect()
    }
    assert {r["key_id"] for r in rows} == scd1_keys


def test_markov_entropy_recompute(spark, sf_dir):
    """Whole-bit transition entropy recomputed in Python from the
    per-user event sequences: MLE transition counts, bitlen
    surprisal, mass-weighted centibits per state and the weighted
    corpus rate — exact match; and mean_centibits respects the
    uniform upper bound 100*ceil(log2(n_dests))."""
    from collections import Counter

    got = {
        r["from_type"]: r
        for r in QUERIES["events_markov_entropy_rate"](
            spark, sf_dir
        ).collect()
    }
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    ).collect()
    seqs: dict = {}
    for r in ev:
        seqs.setdefault(r["user_id"], []).append(
            (r["ts"], r["event_id"], r["event_type"])
        )
    trans: Counter = Counter()
    for u, rows in seqs.items():
        rows.sort()
        for (_, _, a), (_, _, b) in zip(rows, rows[1:]):
            trans[(a, b)] += 1
    rows_tot: Counter = Counter()
    dests: Counter = Counter()
    for (a, _b), c in trans.items():
        rows_tot[a] += c
        dests[a] += 1
    tot_mass = 0
    tot_c = 0
    per_state = {}
    for a in rows_tot:
        mass = sum(
            c * ((rows_tot[a] // c).bit_length() - 1)
            for (x, _b), c in trans.items()
            if x == a
        )
        per_state[a] = mass
        tot_mass += mass
        tot_c += rows_tot[a]
    corpus_rate = (100 * tot_mass) // tot_c
    assert set(got) == set(rows_tot)
    for a in rows_tot:
        r = got[a]
        assert r["n_transitions"] == rows_tot[a]
        assert r["n_dests"] == dests[a]
        assert r["bit_mass"] == per_state[a]
        assert (
            r["mean_centibits"]
            == (100 * per_state[a]) // rows_tot[a]
        )
        assert r["corpus_rate_centibits"] == corpus_rate
        ub = 100 * ((dests[a] - 1).bit_length())
        assert r["mean_centibits"] <= ub + 100  # floor-bit slack


def test_sprt_recompute_and_sticky(spark, sf_dir):
    """SPRT recomputed in Python: md5 arm split, daily cumulative
    (n, k), integer LLR with the precomputed e6 increments, first
    ±ln(19) crossing, sticky state — exact row match; states are
    monotone per arm (once decided, never 'continue' again) and the
    decision matches the stop-day LLR's sign."""
    import hashlib

    from aurora_cdc_demo_spark.registry import (
        _AB_ARMS,
        _SPRT_A_E6,
        _SPRT_C0_E6,
        _SPRT_C1_E6,
    )

    got = sorted(
        (r["arm"], r["day"], r["n_cum"], r["k_cum"], r["llr_e6"],
         r["state"])
        for r in QUERIES["events_ab_sprt_monitor"](
            spark, sf_dir
        ).collect()
    )
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type"
    ).collect()
    from collections import defaultdict

    daily = defaultdict(lambda: [0, 0])
    for r in ev:
        arm = (
            int(
                hashlib.md5(str(r["user_id"]).encode()).hexdigest()[:8],
                16,
            )
            % _AB_ARMS
        )
        day = r["ts"].replace(
            hour=0, minute=0, second=0, microsecond=0
        )
        d = daily[(arm, day)]
        d[0] += 1
        d[1] += r["event_type"] == "purchase"
    want = []
    by_arm = defaultdict(list)
    for (arm, day), (n, k) in daily.items():
        by_arm[arm].append((day, n, k))
    for arm, rows in by_arm.items():
        rows.sort()
        n_cum = k_cum = 0
        stop_day, stop_llr = None, None
        series = []
        for day, n, k in rows:
            n_cum += n
            k_cum += k
            llr = _SPRT_C1_E6 * k_cum + _SPRT_C0_E6 * (n_cum - k_cum)
            series.append((day, n_cum, k_cum, llr))
            if stop_day is None and abs(llr) >= _SPRT_A_E6:
                stop_day, stop_llr = day, llr
        for day, n_cum, k_cum, llr in series:
            if stop_day is None or day < stop_day:
                state = "continue"
            elif stop_llr >= _SPRT_A_E6:
                state = "accept_h1"
            else:
                state = "accept_h0"
            want.append((arm, day, n_cum, k_cum, llr, state))
    assert got == sorted(want)
    for arm, rows in by_arm.items():
        states = [
            s for (a, _d, _n, _k, _l, s) in got if a == arm
        ]
        decided = False
        for s in states:  # got is day-sorted within arm
            if s != "continue":
                decided = True
            elif decided:
                raise AssertionError("state reverted to continue")


def test_graph_robustness_recompute(spark, sf_dir):
    """Attack curve recomputed in Python: undirected KNN pairs,
    degree ranks with the same tie order, per-level BFS largest
    component — exact match; largest_cc is non-increasing in h
    (subgraph components only shrink)."""
    got = sorted(
        (
            r["n_removed"],
            r["n_nodes"],
            r["n_edges"],
            r["largest_cc"],
            r["lcc_share_bp"],
        )
        for r in QUERIES["graph_robustness_knn"](
            spark, sf_dir
        ).collect()
    )
    from aurora_cdc_demo_spark.registry import _ROBUST_LEVELS

    # r9: robustness percolates the banded-LSH family edge list
    pairs = set()
    for r in QUERIES["ann_knn_graph_lsh"](spark, sf_dir).collect():
        a, b = sorted((r["vec_id"], r["neighbor_id"]))
        pairs.add((a, b))
    nodes = sorted(
        r["vec_id"]
        for r in load_table(spark, sf_dir, "embeddings")
        .select("vec_id")
        .collect()
    )
    from collections import Counter, defaultdict, deque

    deg = Counter()
    for a, b in pairs:
        deg[a] += 1
        deg[b] += 1
    order = sorted(nodes, key=lambda v: (-deg[v], v))
    want = []
    prev_largest = None
    for h in _ROBUST_LEVELS:
        keep = set(order[h:])
        e = [(a, b) for a, b in pairs if a in keep and b in keep]
        adj = defaultdict(list)
        for a, b in e:
            adj[a].append(b)
            adj[b].append(a)
        seen = set()
        largest = 0
        for v in keep:
            if v in seen:
                continue
            q = deque([v])
            seen.add(v)
            sz = 0
            while q:
                x = q.popleft()
                sz += 1
                for y in adj[x]:
                    if y not in seen:
                        seen.add(y)
                        q.append(y)
            largest = max(largest, sz)
        want.append(
            (
                h,
                len(keep),
                len(e),
                largest,
                (10000 * largest) // len(keep),
            )
        )
        if prev_largest is not None:
            assert largest <= prev_largest
        prev_largest = largest
    assert got == sorted(want)


def test_ngram_coverage_curve_laws(spark, sf_dir):
    """Learning-curve laws: docs/types/coverage monotone
    non-decreasing in prefix_pct; at 100% every train doc and type
    is in; CROSS-OPERATOR identity: uncovered held-out occurrences
    at the full prefix == the KN scorer's total n_unseen (the two
    operators must agree on what 'unseen bigram' means)."""
    rows = sorted(
        (
            r["prefix_pct"],
            r["n_train_docs"],
            r["n_train_types"],
            r["covered_bg"],
            r["total_bg"],
            r["coverage_bp"],
        )
        for r in QUERIES["text_ngram_coverage_curve"](
            spark, sf_dir
        ).collect()
    )
    assert [p for p, *_ in rows] == [25, 50, 75, 100]
    for a, b in zip(rows, rows[1:]):
        assert a[1] <= b[1]  # docs
        assert a[2] <= b[2]  # types
        assert a[3] <= b[3]  # covered
        assert a[4] == b[4]  # total fixed
    full = rows[-1]
    kn_unseen = sum(
        r["n_unseen"]
        for r in QUERIES["text_kn_surprisal"](spark, sf_dir).collect()
    )
    assert full[4] - full[3] == kn_unseen


def test_session_entry_profile_recompute(spark, sf_dir):
    """Entry-type census recomputed in Python with the same
    strictly-greater 30-min gap islands — exact match; session
    totals are conserved (Σ n_sessions over entry types == total
    islands)."""
    got = {
        r["entry_type"]: (
            r["n_sessions"],
            r["bounce_bp"],
            r["mean_depth_e2"],
            r["max_depth"],
            r["purchase_rate_bp"],
        )
        for r in QUERIES["events_session_entry_profile"](
            spark, sf_dir
        ).collect()
    }
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    ).collect()
    from collections import defaultdict

    by_user = defaultdict(list)
    for r in ev:
        by_user[r["user_id"]].append(
            (r["ts"], r["event_id"], r["event_type"])
        )
    sessions = []
    for u, rows in by_user.items():
        rows.sort()
        cur = None
        prev_ts = None
        for ts, eid, et in rows:
            gap = (
                None
                if prev_ts is None
                else int(
                    (ts - prev_ts).total_seconds()
                )
            )
            if prev_ts is None or gap > 1800:
                if cur:
                    sessions.append(cur)
                cur = []
            cur.append(et)
            prev_ts = ts
        if cur:
            sessions.append(cur)
    agg = defaultdict(lambda: [0, 0, 0, 0, 0])  # n, bounce, depth, maxd, purch
    for s in sessions:
        a = agg[s[0]]
        a[0] += 1
        a[1] += len(s) == 1
        a[2] += len(s)
        a[3] = max(a[3], len(s))
        a[4] += "purchase" in s
    want = {
        t: (
            n,
            (10000 * b) // n,
            (100 * d) // n,
            mx,
            (10000 * p) // n,
        )
        for t, (n, b, d, mx, p) in agg.items()
    }
    assert got == want
    assert sum(v[0] for v in got.values()) == len(sessions)


def test_topk_view_streaming_maintenance(spark, sf_dir, tmp_path):
    """The top-K rank view (#490's shape) maintained on a STREAM:
    foreachBatch keeps (state, view) parquet tables; each
    micro-batch nets its deltas, re-ranks only the affected groups
    from the merged key-bounded state, and copies every other
    group's view rows forward. After the stream drains, the
    maintained view equals the from-scratch top-K over the full
    log — the sequential (multi-batch) extension of the two-batch
    oracle gate."""
    from pyspark.sql import functions as F

    from aurora_cdc_demo_spark.operators import cdc_apply
    from aurora_cdc_demo_spark.registry import (
        _topk_rank_view,
        cdc_operation_log,
    )

    log = cdc_operation_log(spark, sf_dir)
    incoming = tmp_path / "topk_in"
    cuts = ["2024-01-08", "2024-01-16", "2024-01-24"]
    bounds = (
        [F.lit(None)] + [F.to_timestamp(F.lit(c)) for c in cuts]
        + [F.lit(None)]
    )
    for i in range(4):
        part = log
        if i > 0:
            part = part.where(F.col("ts") >= bounds[i])
        if i < 3:
            part = part.where(F.col("ts") < bounds[i + 1])
        part.coalesce(1).write.parquet(str(incoming / f"b{i}"))
    state_dir = str(tmp_path / "topk_state")
    view_dir = str(tmp_path / "topk_view")

    def apply_batch(batch_df, batch_id):
        net = cdc_apply.net_changes(batch_df).localCheckpoint()
        try:
            state = spark.read.parquet(state_dir)
            view = spark.read.parquet(view_dir)
        except Exception:
            state = net.limit(0)
            view = _topk_rank_view(state).limit(0)
        merged = cdc_apply.upsert_merge(state, net).localCheckpoint()
        changed = net.select("key_id").distinct()
        affected = (
            state.join(changed, "key_id")
            .select("event_type")
            .unionByName(
                net.where(F.col("operation") != "DELETE").select(
                    "event_type"
                )
            )
            .distinct()
            .localCheckpoint()
        )
        new_view = view.join(
            F.broadcast(affected), "event_type", "left_anti"
        ).unionByName(
            _topk_rank_view(
                merged.join(F.broadcast(affected), "event_type")
            )
        )
        for path, df in ((state_dir, merged), (view_dir, new_view)):
            df.write.mode("overwrite").parquet(path + "_next")
            spark.read.parquet(path + "_next").write.mode(
                "overwrite"
            ).parquet(path)

    stream = (
        spark.readStream.schema(log.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(incoming / "*"))
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda df, bid: apply_batch(df, bid)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt_topk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = sorted(
        tuple(r)
        for r in spark.read.parquet(view_dir).collect()
    )
    want = sorted(
        tuple(r)
        for r in _topk_rank_view(
            cdc_apply.latest_state(log)
        ).collect()
    )
    assert got == want
    assert want


def test_asof_nearest_recompute(spark, sf_dir):
    """Nearest as-of recomputed in Python over the purchase/click
    streams: min |delta| with ties to the past, directional seq tie
    rules inside each side — exact match; and the result dominates
    both directional joins (nearest delta <= backward delta and
    <= forward delta wherever those match)."""
    got = {
        (r["key_id"], r["purchase_seq"]): (
            r["asof_ts"],
            r["asof_seq"],
            r["asof_value"],
        )
        for r in QUERIES["asof_order_event_nearest"](
            spark, sf_dir
        ).collect()
    }
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "value", "event_type"
    ).collect()
    from collections import defaultdict

    clicks = defaultdict(list)
    purchases = []
    for r in ev:
        if r["event_type"] == "click":
            clicks[r["user_id"]].append(
                (r["ts"], r["event_id"], r["value"])
            )
        elif r["event_type"] == "purchase":
            purchases.append((r["user_id"], r["event_id"], r["ts"]))
    want = {}
    for u, pseq, pts in purchases:
        best = None
        for ts, seq, val in clicks.get(u, []):
            delta = abs((ts - pts).total_seconds())
            fwd = ts > pts
            key = (delta, fwd, seq if fwd else -seq)
            if best is None or key < best[0]:
                best = (key, (ts, seq, val))
        want[(u, pseq)] = best[1] if best else (None, None, None)
    assert got == want
    assert any(v[0] is not None for v in got.values())


def test_histogram_selectivity_recompute(spark, sf_dir):
    """Both histogram estimators recomputed in Python (equi-width
    integer edges from (lo, hi); equi-depth edges from the
    registered decile boundaries + column max; uniform-in-bucket
    floor interpolation) — exact row match; exact counts are exact;
    full-domain probe (0,50..) sanity: estimate within one bucket
    count of exact."""
    from aurora_cdc_demo_spark.registry import _HIST_PROBES

    got = {
        (r["method"], r["probe_id"]): (
            r["probe_lo_centi"],
            r["probe_hi_centi"],
            r["est_rows"],
            r["exact_rows"],
            r["err_bp"],
        )
        for r in QUERIES["ops_histogram_selectivity_error"](
            spark, sf_dir
        ).collect()
    }
    vals = sorted(
        int(round(float(r["l_extendedprice"]) * 100))
        for r in load_table(spark, sf_dir, "lineitem")
        .select("l_extendedprice")
        .collect()
    )
    lo, hi, n = vals[0], vals[-1], len(vals)
    dec = {
        r["decile"]: r["price_centi"]
        for r in QUERIES["lineitem_price_deciles"](
            spark, sf_dir
        ).collect()
    }
    dec[10] = hi
    wedges = [
        (lo - 1 + ((b - 1) * (hi - lo + 1)) // 10,
         lo - 1 + (b * (hi - lo + 1)) // 10)
        for b in range(1, 11)
    ]
    dedges = []
    prev = lo - 1
    for b in range(1, 11):
        dedges.append((prev, dec[b]))
        prev = dec[b]
    import bisect

    def cnt_range(a, b):  # count of vals in [a, b]
        return bisect.bisect_right(vals, b) - bisect.bisect_left(
            vals, a
        )

    def estimate(edges, a, b):
        total = 0
        for lo_e, hi_e in edges:
            c = cnt_range(lo_e + 1, hi_e)
            ov = max(0, min(hi_e, b) - max(lo_e + 1, a) + 1)
            total += (c * ov) // max(hi_e - lo_e, 1)
        return total

    for pid, (pa, pb) in enumerate(_HIST_PROBES):
        a = lo + (pa * (hi - lo)) // 100
        b = lo + (pb * (hi - lo)) // 100
        exact = cnt_range(a, b)
        for method, edges in (
            ("equi_width", wedges),
            ("equi_depth", dedges),
        ):
            est = estimate(edges, a, b)
            err = (10000 * abs(est - exact)) // max(exact, 1)
            assert got[(method, pid)] == (a, b, est, exact, err), (
                method,
                pid,
            )


def test_lof_recompute(spark, sf_dir):
    """LOF recomputed in Python from the same KNN edge list:
    k-distances, reachability smoothing, integer lrd/lof chain,
    top-N rank — exact match; inlier sanity: a vector whose
    neighborhood is its own density class scores ~10000 bp, and
    the emitted top-N is the global maximum set."""
    from aurora_cdc_demo_spark.registry import _LOF_TOPN
    from aurora_cdc_demo_spark.operators import similarity as sim

    k = sim.KNN_K
    # r9: LOF distances come from the banded-LSH family edge list
    edges = {}
    for r in QUERIES["ann_knn_graph_lsh"](spark, sf_dir).collect():
        edges.setdefault(r["vec_id"], []).append(
            (r["nn_rank"], r["neighbor_id"], 1000000 - r["cos_e6"])
        )
    full = {v: sorted(nbs) for v, nbs in edges.items()
            if len(nbs) == k}
    kdist = {v: nbs[-1][2] for v, nbs in full.items()}
    lrd = {}
    for v, nbs in full.items():
        if all(nb in kdist for _, nb, _d in nbs):
            s = sum(max(kdist[nb], d) for _, nb, d in nbs)
            lrd[v] = (k * 10**9) // s
    lof = {}
    for v, nbs in full.items():
        if v in lrd and all(nb in lrd for _, nb, _d in nbs):
            lof[v] = (10000 * sum(lrd[nb] for _, nb, _d in nbs)) // (
                k * lrd[v]
            )
    want = sorted(
        ((-b, v) for v, b in lof.items())
    )[:_LOF_TOPN]
    want = [
        (v, kdist[v], lrd[v], -nb, i + 1)
        for i, (nb, v) in enumerate(want)
    ]
    got = sorted(
        (
            r["vec_id"],
            r["kdist_e6"],
            r["lrd_e9"],
            r["lof_bp"],
            r["rnk"],
        )
        for r in QUERIES["embed_lof_outliers"](
            spark, sf_dir
        ).collect()
    )
    assert got == sorted(want)
    assert got[0][3] is not None


def test_pvm_bridge_conservation(spark, sf_dir):
    """PVM waterfall laws: per brand volume + price == Δrev
    exactly; the TOTAL row's volume + mix + price == Δrev exactly,
    its mix equals Σ brand-volumes − total-volume, and brand q/r
    sums reconcile to the TOTAL row."""
    rows = QUERIES["lineitem_pvm_brand_bridge"](
        spark, sf_dir
    ).collect()
    total = [r for r in rows if r["brand"] == "TOTAL"]
    brands = [r for r in rows if r["brand"] != "TOTAL"]
    assert len(total) == 1 and brands
    t = total[0]
    for r in brands:
        assert r["mix_effect_e4"] == 0
        assert (
            r["volume_effect_e4"] + r["price_effect_e4"]
            == r["rev1_e4"] - r["rev0_e4"]
        )
    assert (
        t["volume_effect_e4"] + t["mix_effect_e4"]
        + t["price_effect_e4"]
        == t["rev1_e4"] - t["rev0_e4"]
    )
    assert t["mix_effect_e4"] == sum(
        r["volume_effect_e4"] for r in brands
    ) - t["volume_effect_e4"]
    assert sum(r["q0"] for r in brands) == t["q0"]
    assert sum(r["rev1_e4"] for r in brands) == t["rev1_e4"]
