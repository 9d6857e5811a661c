"""Round-10 additions: graph-walk ANN, b-bit minwise sketches,
multi-touch attribution, RAKE keywords, interarrival hazard."""

from __future__ import annotations

from aurora_cdc_demo_spark.registry import QUERIES


def test_graph_greedy_visited_pool_bounded(spark, sf_dir):
    """Candidate pool per probe is ≤ 1 + HOPS·KNN_K before the self
    filter — the walk only ever scores entry + per-hop neighbor
    expansions."""
    from aurora_cdc_demo_spark.operators import similarity as s

    rows = QUERIES["ann_graph_greedy_topk"](spark, sf_dir).collect()
    assert rows
    per_q: dict[int, int] = {}
    for r in rows:
        per_q[r["query_id"]] = per_q.get(r["query_id"], 0) + 1
        assert r["neighbor_id"] != r["query_id"]
    bound = 1 + s.GREEDY_HOPS * s.KNN_K
    assert all(n <= min(s.TOPK, bound) for n in per_q.values())


def test_graph_greedy_recall_band(spark, sf_dir):
    """recall@TOPK vs the brute-force oracle stays in a pinned band:
    a 3-hop greedy walk over a K=3 graph from a quantizer entry
    must beat random (the pool is ~10 of 600+ vectors) without
    claiming exactness."""
    exact = QUERIES["embed_cosine_topk"](spark, sf_dir).collect()
    greedy = QUERIES["ann_graph_greedy_topk"](spark, sf_dir).collect()
    truth: dict[int, set[int]] = {}
    for r in exact:
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    got: dict[int, set[int]] = {}
    for r in greedy:
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(len(truth[q] & got.get(q, set())) for q in truth)
    total = sum(len(v) for v in truth.values())
    assert hits / total >= 0.3, (hits, total)


def test_graph_greedy_first_hit_improves_on_entry(spark, sf_dir):
    """The walk's best result is at least as close as the entry
    seed itself (greedy frontier cosine is monotone by
    construction; rank-1 of the visited pool dominates it)."""
    from pyspark.sql import functions as F

    from aurora_cdc_demo_spark.operators import similarity as s
    from aurora_cdc_demo_spark.tables import load_table

    load_table(spark, sf_dir, "embeddings").createOrReplaceTempView(
        "embeddings"
    )
    entry = spark.sql(
        f"""
        WITH v AS (
            SELECT vec_id, embedding,
                   {s._norm('embedding', 'spark')} AS nrm
            FROM embeddings)
        , seeds AS (
            SELECT vec_id AS seed_id, embedding AS se, nrm AS snrm
            FROM v WHERE vec_id < {s.N_SEEDS})
        , gq AS (
            SELECT vec_id AS query_id, embedding AS qe, nrm AS qn
            FROM v WHERE vec_id < {s.N_QUERIES})
        SELECT query_id,
               MAX(CAST(FLOOR(({s._dot('gq.qe', 's2.se', 'spark')})
                   / (gq.qn * s2.snrm) * 1000000) AS BIGINT))
                   AS best_seed_e6
        FROM gq CROSS JOIN seeds s2
        WHERE s2.seed_id <> gq.query_id
        GROUP BY query_id
        """
    ).collect()
    best_seed = {r["query_id"]: r["best_seed_e6"] for r in entry}
    top1 = (
        QUERIES["ann_graph_greedy_topk"](spark, sf_dir)
        .where(F.col("nn_rank") == 1)
        .collect()
    )
    assert top1
    for r in top1:
        assert r["cos_e6"] >= best_seed[r["query_id"]]


def test_bbit_dominance_and_fixpoint(spark, sf_dir):
    """b-bit matches dominate full matches (equal words ⇒ equal low
    bits); the estimator hits exactly 10000 bp iff all 12 b-bit
    slots agree; est_b4 never exceeds est_full by more than the
    collision correction allows at the top."""
    rows = QUERIES["dedup_minhash_b_bit"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["matches_b4"] >= r["matches_full"]
        assert 0 <= r["est_b4_bp"] <= 10000
        if r["matches_b4"] == 12:
            assert r["est_b4_bp"] == 10000
        if r["matches_full"] == 12:
            assert r["matches_b4"] == 12


def test_bbit_estimator_tracks_full(spark, sf_dir):
    """Mean |est_b4 − est_full| stays small on real candidates —
    the 16× compression costs resolution, not validity (Li & Konig
    2010's point). Band, not equality: the correction is unbiased
    over hash draws, not per-pair."""
    rows = QUERIES["dedup_minhash_b_bit"](spark, sf_dir).collect()
    diffs = [abs(r["est_b4_bp"] - r["est_full_bp"]) for r in rows]
    assert sum(diffs) / len(diffs) <= 1500, sum(diffs) / len(diffs)


def test_multitouch_conservation(spark, sf_dir):
    """Every attribution model distributes exactly 10000 bp per
    purchase-with-touches — the remainder trick makes linear exact,
    not approximately exact."""
    from pyspark.sql import functions as F2

    rows = QUERIES["events_multitouch_attribution"](
        spark, sf_dir
    ).collect()
    assert rows
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    purchases = ev.where("event_type = 'purchase'").select(
        F2.col("event_id").alias("pid"),
        "user_id",
        F2.col("ts").alias("pts"),
    )
    touches = ev.where("event_type <> 'purchase'")
    n_attr = (
        purchases.join(
            touches.select(
                "user_id", F2.col("ts").alias("tts")
            ),
            "user_id",
        )
        .where(
            (F2.col("tts") < F2.col("pts"))
            & (
                F2.unix_micros("tts")
                >= F2.unix_micros("pts") - 7 * 86400000000
            )
        )
        .select("pid")
        .distinct()
        .count()
    )
    for model in ("first_credit_bp", "last_credit_bp", "linear_credit_bp"):
        assert sum(r[model] for r in rows) == 10000 * n_attr, model


def test_rake_laws(spark, sf_dir):
    """deg ≥ freq (every phrase has length ≥ 1), score ≥ 100 centi,
    stopwords never rank, and freq sums over ranked tokens can't
    exceed the corpus non-stop token count."""
    from aurora_cdc_demo_spark.operators.text import STOPWORDS

    rows = QUERIES["text_rake_keywords"](spark, sf_dir).collect()
    assert len(rows) == 20
    n_nonstop = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .selectExpr(
            "size(filter(split(text, ' '), "
            f"x -> NOT array_contains(array({','.join(repr(s) for s in STOPWORDS)}), x))) AS n"
        )
        .groupBy()
        .sum("n")
        .collect()[0][0]
    )
    for r in rows:
        assert r["token"] not in STOPWORDS
        assert r["deg"] >= r["freq"] >= 1
        assert r["score_centi"] >= 100
    assert sum(r["freq"] for r in rows) <= n_nonstop


def test_reorder_hazard_laws(spark, sf_dir):
    """At-risk telescopes: n_at_risk(b) − events(b) − censored(b)
    = n_at_risk(next b); total observations = gaps + customers
    (every customer contributes exactly one censored open gap);
    hazards in [0, 10000]."""
    rows = sorted(
        QUERIES["orders_reorder_hazard"](spark, sf_dir).collect(),
        key=lambda r: r["gap_week"],
    )
    assert rows
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    n_orders = orders.count()
    n_cust = orders.select("o_custkey").distinct().count()
    # gaps = orders - customers (per customer: n-1 consecutive gaps)
    assert rows[0]["n_at_risk"] == (n_orders - n_cust) + n_cust == n_orders
    assert sum(r["n_censored"] for r in rows) == n_cust
    for i, r in enumerate(rows):
        assert 0 <= r["hazard_bp"] <= 10000
        nxt = rows[i + 1]["n_at_risk"] if i + 1 < len(rows) else 0
        assert (
            r["n_at_risk"] - r["n_reorder"] - r["n_censored"] == nxt
        )


def test_peak_concurrency_laws_and_python_sweep(spark, sf_dir):
    """carry_in ≥ 0; peaks bound sensibly; and the per-day peak
    equals a brute-force Python interval sweep at test SF."""
    rows = QUERIES["events_peak_concurrency"](spark, sf_dir).collect()
    assert rows
    got = {r["day"]: r for r in rows}
    for r in rows:
        assert r["carry_in"] >= 0
        assert r["peak_concurrent"] >= r["carry_in"]
        assert r["peak_concurrent"] >= 1 or r["n_started"] == 0
    # brute-force sweep over the same session spans
    import datetime as dt

    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr("user_id", "unix_micros(ts) AS t", "event_id")
        .collect()
    )
    by_user: dict[str, list[tuple[int, int]]] = {}
    for r in ev:
        by_user.setdefault(r["user_id"], []).append((r["t"], r["event_id"]))
    spans = []
    for _, ts in by_user.items():
        ts.sort()
        start = prev = ts[0][0]
        for t, _eid in ts[1:]:
            if t - prev > 1800000000:
                spans.append((start, prev))
                start = t
            prev = t
        spans.append((start, prev))
    bounds = []
    for s, e in spans:
        bounds.append((s, 0, 1))
        bounds.append((e, 1, -1))
    bounds.sort()
    cur = 0
    peaks: dict[object, int] = {}
    carry: dict[object, int] = {}

    def day_of(us: int):
        return dt.datetime.fromtimestamp(
            us / 1e6, tz=dt.timezone.utc
        ).replace(hour=0, minute=0, second=0, microsecond=0)

    for t, _ord, d in bounds:
        day = day_of(t)
        if day not in carry:
            carry[day] = cur
            peaks[day] = cur
        cur += d
        peaks[day] = max(peaks[day], cur)
    assert cur == 0  # every span closes
    for day, r in got.items():
        key = day.replace(tzinfo=dt.timezone.utc)
        if key in peaks:
            assert r["peak_concurrent"] == peaks[key], (day, r)


def test_rake_phrases_laws(spark, sf_dir):
    """Phrases contain no stopwords, respect the length cap, and a
    phrase's score equals the sum of its member words' word-grain
    scores recomputed independently."""
    from aurora_cdc_demo_spark.operators.text import (
        RAKE_MAX_PHRASE,
        STOPWORDS,
    )

    rows = QUERIES["text_rake_phrases"](spark, sf_dir).collect()
    assert rows
    # word-grain stats recomputed without the top-20 cut: rebuild
    # from the registered word query's own inputs via docs
    import collections

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    freq: collections.Counter = collections.Counter()
    deg: collections.Counter = collections.Counter()
    for d in docs:
        run: list[str] = []
        for tok in d["text"].split(" ") + ["the"]:
            if tok in STOPWORDS:
                for w in run:
                    freq[w] += 1
                    deg[w] += len(run)
                run = []
            else:
                run.append(tok)
    for r in rows:
        toks = r["phrase"].split(" ")
        assert 1 <= r["n_words"] == len(toks) <= RAKE_MAX_PHRASE
        assert all(t not in STOPWORDS for t in toks)
        expected = sum((100 * deg[t]) // freq[t] for t in toks)
        assert r["score_centi"] == expected, r["phrase"]


def test_seed_reach_census_conserves(spark, sf_dir):
    """Layer counts partition the corpus: Σ n_nodes (incl. −1)
    = |embeddings|; layer 0 = N_SEEDS; all counts ≥ 0; and the
    unreached mass upper-bounds greedy misses."""
    from aurora_cdc_demo_spark.operators import similarity as s

    rows = {
        r["layer"]: r["n_nodes"]
        for r in QUERIES["graph_seed_reach_layers"](
            spark, sf_dir
        ).collect()
    }
    n = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert sum(rows.values()) == n
    assert rows[0] == s.N_SEEDS
    assert all(v >= 0 for v in rows.values())
    assert set(rows) == {-1, 0, 1, 2, 3}
