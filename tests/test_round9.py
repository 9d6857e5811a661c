"""Round-9 additions: KNN-graph structure metrics (assortativity,
edge embeddedness), log-free behavioral diversity, self-relative
purchase-cadence churn."""

from __future__ import annotations

from pyspark.sql import functions as F

from aurora_cdc_demo_spark.registry import QUERIES


def test_assortativity_symmetric_variances(spark, sf_dir):
    """The directed edge list holds both orientations of every
    undirected edge, so the x- and y-degree marginals are identical
    distributions: their variance numerators must be EQUAL, and the
    signed r-squared must lie in [-1e6, 1e6]."""
    row = QUERIES["graph_assortativity_knn"](spark, sf_dir).collect()[0]
    assert row["varx_num"] == row["vary_num"]
    assert row["varx_num"] > 0
    assert row["n_directed_edges"] % 2 == 0
    assert -1_000_000 <= row["assort_r2_signed_e6"] <= 1_000_000


def test_assortativity_matches_python(spark, sf_dir):
    """Recompute Pearson moment numerators from the materialized
    edge list in plain Python and compare exactly."""
    QUERIES["graph_assortativity_knn"](spark, sf_dir).collect()
    edges = [
        (r["src"], r["dst"])
        for r in spark.sql("SELECT src, dst FROM knn_uedges_mat").collect()
    ]
    deg: dict[int, int] = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    xs = [deg[s] for s, d in edges]
    ys = [deg[d] for s, d in edges]
    m = len(edges)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    row = QUERIES["graph_assortativity_knn"](spark, sf_dir).collect()[0]
    assert row["n_directed_edges"] == m
    assert row["cov_num"] == m * sxy - sx * sy


def test_embeddedness_bounds_and_bridge_flag(spark, sf_dir):
    rows = QUERIES["graph_edge_embeddedness_knn"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["a"] < r["b"]
        assert 0 <= r["embeddedness_bp"] <= 10000
        assert r["is_local_bridge"] == (r["common_neighbors"] == 0)
        assert r["common_neighbors"] <= min(r["deg_a"], r["deg_b"])


def test_embeddedness_exact_at_test_sf(spark, sf_dir):
    """At test SF no node exceeds the witness cap, so the wedge
    counts must equal brute-force common-neighbor counts computed
    from the materialized edge list."""
    out = {
        (r["a"], r["b"]): r["common_neighbors"]
        for r in QUERIES["graph_edge_embeddedness_knn"](
            spark, sf_dir
        ).collect()
    }
    nbrs: dict[int, set[int]] = {}
    for r in spark.sql("SELECT src, dst FROM knn_uedges_mat").collect():
        nbrs.setdefault(r["src"], set()).add(r["dst"])
    if max(len(v) for v in nbrs.values()) <= 64:
        for (a, b), c in out.items():
            assert c == len(nbrs[a] & nbrs[b]), (a, b)


def test_user_diversity_laws(spark, sf_dir):
    rows = QUERIES["events_user_type_diversity"](spark, sf_dir).collect()
    assert rows
    total = sum(r["n_events"] for r in rows)
    n_events = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .where("user_id IS NOT NULL")
        .count()
    )
    assert total == n_events
    for r in rows:
        assert 0 <= r["simpson_bp"] < 10000
        assert (r["simpson_bp"] == 0) == (r["n_types"] == 1)
        # dominant share floor: Sum c^2 >= max^2 => simpson <= 1 - pmax^2
        assert (
            r["simpson_bp"] * r["n_events"] * r["n_events"]
            <= 10000
            * (
                r["n_events"] * r["n_events"]
                - (r["dominant_share_bp"] * r["n_events"] // 10000) ** 2
            )
        )


def test_purchase_cadence_laws(spark, sf_dir):
    rows = QUERIES["orders_purchase_cadence"](spark, sf_dir).collect()
    assert rows
    n_repeat = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .groupBy("o_custkey")
        .count()
        .where("count >= 2")
        .count()
    )
    assert len(rows) == n_repeat
    for r in rows:
        assert r["n_orders"] >= 2
        assert r["median_gap_days"] >= 0
        assert r["recency_days"] >= 0
        assert r["churned"] == (
            r["recency_days"] > 2 * max(r["median_gap_days"], 1)
        )


def test_hot_key_report_laws(spark, sf_dir):
    rows = QUERIES["cdc_hot_key_report"](spark, sf_dir).collect()
    assert rows
    by_tbl: dict[str, list] = {}
    for r in rows:
        by_tbl.setdefault(r["tbl"], []).append(r)
        assert 1 <= r["rnk"] <= 8
        assert 0 <= r["share_bp"] <= 10000
        assert r["is_hot"] == (r["share_bp"] > 100)
        assert r["salt_buckets"] >= 1
        if not r["is_hot"]:
            assert r["salt_buckets"] == 1
    for tbl, rs in by_tbl.items():
        # top-K shares can't exceed the whole
        assert sum(r["share_bp"] for r in rs) <= 10000
        # ranks are dense from 1 and ordered by count desc
        rs.sort(key=lambda r: r["rnk"])
        assert [r["rnk"] for r in rs] == list(range(1, len(rs) + 1))
        counts = [r["n_events"] for r in rs]
        assert counts == sorted(counts, reverse=True)


def test_pca_normalization_and_share(spark, sf_dir):
    rows = QUERIES["embed_pca_top_direction"](spark, sf_dir).collect()
    assert len(rows) == 64
    comps = [r["pc1_e3"] for r in rows]
    # max-abs normalization pins the largest component to exactly
    # +/-1000; nothing exceeds it
    assert max(abs(c) for c in comps) == 1000
    share = rows[0]["eigen_share_bp"]
    assert all(r["eigen_share_bp"] == share for r in rows)
    # Rayleigh quotient of the iterated vector: positive, <= trace,
    # and at least ~trace/dims (power iteration started from ones
    # can only improve on the average eigenvalue, modulo floor slack)
    assert 0 < share <= 10000
    assert share >= 100
    assert rows[0]["cov_trace"] > 0


def test_pca_deterministic(spark, sf_dir):
    a = QUERIES["embed_pca_top_direction"](spark, sf_dir).collect()
    b = QUERIES["embed_pca_top_direction"](spark, sf_dir).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_pca_final_plan_materialized(spark, sf_dir):
    """The covariance/mean/v relations are checkpointed before the
    final select: no Generate (the corpus posexplode) and no parquet
    scan may survive into the composed plan (the embed_keep_list
    materialization lesson — the unmaterialized tree re-derived the
    corpus self-join per round reference)."""
    df = QUERIES["embed_pca_top_direction"](spark, sf_dir)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "Generate" not in plan
    assert "parquet" not in plan


def test_stl_conservation(spark, sf_dir):
    """n = trend + seasonal + residual EXACTLY, and per-dow residual
    mass sits in [0, dow_count) — the floor-mean remainder bound."""
    rows = QUERIES["events_stl_decomposition"](spark, sf_dir).collect()
    assert rows
    by_dow: dict[int, list] = {}
    for r in rows:
        assert (
            r["n_events"]
            == r["trend_ma7"] + r["seasonal_dow"] + r["residual"]
        )
        dow = (r["day"].toordinal() - 1) % 7
        by_dow.setdefault(dow, []).append(r["residual"])
    for dow, res in by_dow.items():
        assert 0 <= sum(res) < len(res) + 7  # floor-mean remainder


def test_stl_drops_partial_windows(spark, sf_dir):
    """Exactly 6 edge days (3 each side) lack a full centered 7-day
    window and must be absent."""
    n_days = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr("date_trunc('day', ts) AS d")
        .distinct()
        .count()
    )
    rows = QUERIES["events_stl_decomposition"](spark, sf_dir).collect()
    assert len(rows) == n_days - 6


def test_feature_adoption_laws(spark, sf_dir):
    rows = QUERIES["events_feature_adoption"](spark, sf_dir).collect()
    assert rows
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    per_type = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    for et, rs in by_type.items():
        rs.sort(key=lambda r: r["day"])
        cums = [r["cum_adopters"] for r in rs]
        assert cums == sorted(cums)  # non-decreasing
        assert cums[-1] == per_type[et]  # everyone eventually adopts
        assert cums[-1] == sum(r["new_adopters"] for r in rs)
        assert all(0 <= r["adoption_bp"] <= 10000 for r in rs)


def test_pca_top2_laws(spark, sf_dir):
    rows = QUERIES["embed_pca_top2"](spark, sf_dir).collect()
    assert len(rows) == 64
    s1 = rows[0]["share1_bp"]
    s2 = rows[0]["share2_bp"]
    # top direction matches the single-direction query exactly
    top = {
        r["pos"]: (r["pc1_e3"], r["eigen_share_bp"])
        for r in QUERIES["embed_pca_top_direction"](spark, sf_dir).collect()
    }
    for r in rows:
        assert top[r["pos"]][0] == r["pc1_e3"]
        assert top[r["pos"]][1] == s1
    # deflated direction can't beat the dominant one (slack for the
    # flat-spectrum / floor-deflation case)
    assert s2 <= s1 + 50
    assert 0 < s2 <= 10000
    assert s1 + s2 <= 10000
    # orthogonality defect of integer deflation stays bounded:
    # |v1.v2| <= 0.25 * ||v1|| * ||v2||
    dot = rows[0]["ortho_dot"]
    den1 = sum(r["pc1_e3"] ** 2 for r in rows)
    den2 = sum(r["pc2_e3"] ** 2 for r in rows)
    assert 16 * dot * dot <= den1 * den2
    # both vectors max-abs normalized
    assert max(abs(r["pc1_e3"]) for r in rows) == 1000
    assert max(abs(r["pc2_e3"]) for r in rows) == 1000


def test_method_agreement_partition(spark, sf_dir):
    """The four cells partition the candidate set: total n_pairs
    equals the LSH candidate-pair count; cell means respect the
    defining thresholds."""
    from aurora_cdc_demo_spark.operators import dedup as _dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_cand = _dedup.lsh_candidates(
        _dedup.minhash_signatures(_dedup.shingles(docs))
    ).count()
    rows = QUERIES["dedup_method_agreement"](spark, sf_dir).collect()
    assert sum(r["n_pairs"] for r in rows) == n_cand
    for r in rows:
        if r["sh_dup"]:
            assert r["mean_hamming"] <= 3
        assert 0 <= r["mean_exact_bp"] <= 10000


def test_power_user_curve_laws(spark, sf_dir):
    rows = sorted(
        QUERIES["events_power_user_curve"](spark, sf_dir).collect(),
        key=lambda r: r["decile"],
    )
    assert [r["decile"] for r in rows] == list(range(1, len(rows) + 1))
    assert rows[-1]["cum_share_bp"] == 10000
    cums = [r["cum_share_bp"] for r in rows]
    assert cums == sorted(cums)
    # Lorenz convexity: per-decile share non-decreasing in rank order
    shares = [r["share_bp"] / r["n_users"] for r in rows]
    assert all(b >= a * 0.99 for a, b in zip(shares, shares[1:]))
    n_users = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id")
        .distinct()
        .count()
    )
    assert sum(r["n_users"] for r in rows) == n_users


def test_token_lift_pairs_laws(spark, sf_dir):
    rows = QUERIES["text_token_lift_pairs"](spark, sf_dir).collect()
    assert rows
    n_docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    )
    for r in rows:
        assert r["tok_a"] < r["tok_b"]
        assert r["co_docs"] <= min(r["df_a"], r["df_b"])
        assert r["df_a"] <= n_docs and r["df_b"] <= n_docs
        # lift bound: co <= min(df) => lift <= 1e6 * n / max(df)
        assert r["lift_ppm"] <= 1000000 * n_docs // max(
            r["df_a"], r["df_b"]
        )


def test_growth_accounting_conservation(spark, sf_dir):
    rows = sorted(
        QUERIES["events_growth_accounting"](spark, sf_dir).collect(),
        key=lambda r: r["week_id"],
    )
    assert rows
    for r in rows:
        assert (
            r["n_active"]
            == r["n_new"] + r["n_retained"] + r["n_resurrected"]
        )
        assert min(
            r["n_new"], r["n_retained"], r["n_resurrected"], r["n_churned"]
        ) >= 0
    # churned(w) = active(w-1) - retained(w) on consecutive weeks
    for prev, cur in zip(rows, rows[1:]):
        if cur["week_id"] == prev["week_id"] + 1:
            assert cur["n_churned"] == prev["n_active"] - cur["n_retained"]
    # first week: everyone is new
    assert rows[0]["n_new"] == rows[0]["n_active"]
    assert rows[0]["n_churned"] == 0


def test_acf_laws(spark, sf_dir):
    rows = {
        r["lag"]: r for r in QUERIES["events_acf"](spark, sf_dir).collect()
    }
    assert set(rows) == {1, 24, 168}
    n_hours = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr("unix_micros(ts) div 3600000000 AS h")
        .distinct()
        .count()
    )
    for lag, r in rows.items():
        assert r["n_pairs"] <= n_hours - 1
        assert -1_000_000 <= r["acf_r2_signed_e6"] <= 1_000_000
        assert r["varx_num"] >= 0 and r["vary_num"] >= 0


def test_quant_distortion_laws(spark, sf_dir):
    rows = {
        r["method"]: r
        for r in QUERIES["embed_quantization_distortion"](
            spark, sf_dir
        ).collect()
    }
    assert set(rows) == {"pq", "sign"}
    n_vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    for r in rows.values():
        assert r["n_vecs"] == n_vecs
        assert 0 <= r["mean_sqerr_e9"] <= r["max_sqerr_e9"]
        # unit vector vs any reconstruction in these families: ||v-r||^2 < 4
        assert r["max_sqerr_e9"] < 4_000_000_000


# ---------------------------------------------------------------------------
# corpus_training_manifest: the testdata word-salad fails the quality
# gates wholesale (weight_ppm never materializes there), so the weight
# path is pinned here on a generated corpus that PASSES the twelve
# gates — unique compound content words per sentence (no shared
# 5-grams => no dup/contamination flags) with natural function-word
# density (under the 40% repeated-token gate).
# ---------------------------------------------------------------------------

_POOL = [
    "pine", "oak", "elm", "ash", "birch", "cedar", "maple", "willow",
    "alder", "hazel", "rowan", "linden", "aspen", "beech", "larch",
    "spruce", "holly", "juniper", "yew", "poplar", "ivy", "fern",
    "moss", "reed", "sedge", "clover", "thistle", "heather",
    "bramble", "gorse", "sorrel", "vetch", "flax", "rye", "barley",
    "oat", "millet", "spelt", "lentil", "bean",
]
_VERBS = ["rests", "drifts", "settles", "lingers", "waits", "turns",
          "leans", "stands"]
_PREPS = ["beside", "under", "near", "behind", "along", "above",
          "within", "around"]


def _clean_corpus_dir(tmp_path) -> str:
    import pandas as pd

    def w(u, salt):
        return (
            _POOL[(u + 7 * salt) % 40]
            + _POOL[((u // 40) + 11 * salt + 1) % 40]
        )

    rows = []
    langs = ["en"] * 30 + ["de"] * 20 + ["fr"] * 10
    for i in range(60):
        sents = []
        for j in range(8):
            u = i * 8 + j
            sents.append(
                f"The {w(u, 0)} {w(u, 1)} {_VERBS[(i + j) % 8]}"
                f" {_PREPS[(i + 3 * j) % 8]} the {w(u, 2)} {w(u, 3)}"
                f" during {w(u, 4)} {w(u, 5)} season."
            )
        text = " ".join(sents)
        rows.append(
            {
                "doc_id": i,
                "text": text,
                "lang": langs[i],
                "source": f"src{i % 3}",
                "n_chars": len(text),
            }
        )
    d = tmp_path / "clean_sf"
    d.mkdir()
    pd.DataFrame(rows).to_parquet(str(d / "documents.parquet"))
    return str(d)


def test_manifest_weights_on_clean_corpus(spark, tmp_path):
    """On a corpus with real survivors: weights exist exactly for
    keepers, sum to 1e6 * n_survivors (mean 1e6, modulo per-doc
    floor slack), and each language's total weight share equals its
    sqrt-temperature share."""
    import math

    d = _clean_corpus_dir(tmp_path)
    rows = QUERIES["corpus_training_manifest"](spark, d).collect()
    assert len(rows) == 60
    keep = [r for r in rows if r["keep"]]
    assert len(keep) >= 10
    assert all(r["weight_ppm"] is not None for r in keep)
    assert all(
        r["weight_ppm"] is None for r in rows if not r["keep"]
    )
    nk: dict[str, int] = {}
    for r in keep:
        nk[r["lang"]] = nk.get(r["lang"], 0) + 1
    tw = sum(int(math.isqrt(n)) for n in nk.values())
    tk = len(keep)
    total = sum(r["weight_ppm"] for r in keep)
    assert abs(total - 1_000_000 * tk) <= tk  # floor slack
    for lang, n in nk.items():
        w = int(math.isqrt(n))
        lang_total = sum(
            r["weight_ppm"] for r in keep if r["lang"] == lang
        )
        expect = 1_000_000 * w * tk * n // (tw * n)
        assert abs(lang_total - n * (1_000_000 * w * tk // (tw * n))) == 0
        assert expect  # non-degenerate


def test_manifest_matches_oracle_on_clean_corpus(spark, tmp_path):
    """Full driver-style oracle compare on the clean corpus — the
    one place the weight SQL is exercised end-to-end against
    DuckDB with non-null weights."""
    import duckdb
    import pandas as pd

    from aurora_cdc_demo_spark.registry import ORACLES
    from tests.helpers import normalize

    d = _clean_corpus_dir(tmp_path)
    sdf = QUERIES["corpus_training_manifest"](spark, d).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'"
    )
    ddf = con.execute(ORACLES["corpus_training_manifest"]).fetchdf()
    a, b = normalize(sdf), normalize(ddf)
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b) == 60
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    assert sdf["weight_ppm"].notna().sum() >= 10


def test_manifest_split_is_content_stable(spark, sf_dir):
    """Split must equal the md5-bucket rule recomputed in Python —
    membership is a pure function of doc_id."""
    import hashlib

    rows = QUERIES["corpus_training_manifest"](spark, sf_dir).collect()
    assert rows
    for r in rows[:200]:
        bkt = int(
            hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:8], 16
        ) % 100
        expect = (
            "train" if bkt < 80 else ("val" if bkt < 90 else "test")
        )
        assert r["split"] == expect, r["doc_id"]


def test_modularity_laws(spark, sf_dir):
    rows = QUERIES["graph_modularity_knn"](spark, sf_dir).collect()
    assert rows
    q = rows[0]["q_e6"]
    assert all(r["q_e6"] == q for r in rows)
    assert q == sum(r["contribution_e6"] for r in rows)
    assert q <= 1_000_000
    m2 = spark.sql("SELECT COUNT(*) AS c FROM knn_uedges_mat").collect()[
        0
    ]["c"]
    assert sum(r["degree_sum"] for r in rows) == m2
    assert sum(r["intra_directed"] for r in rows) <= m2
    for r in rows:
        assert r["intra_directed"] <= r["degree_sum"]


def test_best_of_cluster_laws(spark, sf_dir):
    rows = QUERIES["dedup_best_of_cluster"](spark, sf_dir).collect()
    assert rows
    by_cl: dict[int, list] = {}
    for r in rows:
        by_cl.setdefault(r["cluster_id"], []).append(r)
    for cl, rs in by_cl.items():
        keepers = [r for r in rs if r["is_keeper"]]
        assert len(keepers) == 1, cl
        kq = keepers[0]["quality_bp"]
        assert all(r["quality_bp"] <= kq for r in rs)
        ties = [r for r in rs if r["quality_bp"] == kq]
        assert keepers[0]["doc_id"] == min(t["doc_id"] for t in ties)


def test_forecast_backtest_laws(spark, sf_dir):
    rows = {
        r["model"]: r
        for r in QUERIES["events_forecast_backtest"](spark, sf_dir).collect()
    }
    assert set(rows) == {"ewma_half", "seasonal_168", "naive_1"}
    n = {r["n_hours"] for r in rows.values()}
    assert len(n) == 1  # identical evaluable set
    for r in rows.values():
        assert r["mae_e2"] >= 0
        assert 0 <= r["wape_bp"]


def test_value_drift_laws(spark, sf_dir):
    rows = sorted(
        QUERIES["events_value_drift_chi2"](spark, sf_dir).collect(),
        key=lambda r: r["band"],
    )
    assert [r["band"] for r in rows] == list(range(10))
    chi = rows[0]["chi2_e3"]
    assert chi == sum(r["contrib_e3"] for r in rows)
    assert chi >= 0
    t1 = sum(r["c1"] for r in rows)
    # equal-expected bands: each first-half cell within 1 of t1/10
    for r in rows:
        assert abs(r["c1"] - t1 // 10) <= 1 + t1 % 10
        assert r["contrib_e3"] >= 0


def test_user_audit_gates_on_constructed_bots(spark, tmp_path):
    """Constructed traffic: a metronomic bot (1 event/hour, zero
    variance), a burst bot (everything in one hour of a long span),
    a single-surface scraper, a volume whale, and normal users —
    each must land in its gate with the documented priority."""
    import datetime as dt

    import pandas as pd

    rows = []
    eid = 0
    base = dt.datetime(2024, 1, 1)

    def add(uid, ts, etype, value=1.0):
        nonlocal eid
        rows.append(
            {
                "event_id": eid,
                "ts": ts,
                "user_id": uid,
                "event_type": etype,
                "value": value,
                "props": "{}",
            }
        )
        eid += 1

    types = ["click", "view", "purchase", "signup"]
    # normal users: mixed types, mildly irregular hours (enough of
    # them that the whale below can clear 10x the mean volume)
    for uid in range(20):
        for k in range(40):
            add(
                uid,
                base + dt.timedelta(hours=k * 3 + (k * uid) % 5, minutes=k % 50),
                types[(k + uid) % 4],
            )
    # metronomic bot: exactly one event every hour, mixed types
    for k in range(100):
        add(30, base + dt.timedelta(hours=k), types[k % 4])
    # burst bot: 120 events inside one hour, then silence for a week
    for k in range(120):
        add(31, base + dt.timedelta(minutes=k % 60), types[k % 4])
    add(31, base + dt.timedelta(days=7), types[0])
    # single-surface scraper: one type only, spread out
    for k in range(50):
        add(32, base + dt.timedelta(hours=2 * k + k % 3), "click")
    # volume whale: huge count with MODERATE burstiness (alternating
    # 5/15 events per hour -> Fano = 2.5, inside the keep band) so
    # only the volume gate can fire
    eid_h = 0
    for h in range(300):
        for _ in range(5 if h % 2 == 0 else 15):
            add(33, base + dt.timedelta(hours=h, minutes=eid_h % 59), types[eid_h % 4])
            eid_h += 1

    d = tmp_path / "audit_sf"
    d.mkdir()
    pd.DataFrame(rows).to_parquet(str(d / "events.parquet"))
    out = {
        r["user_id"]: r
        for r in QUERIES["events_user_audit"](spark, str(d)).collect()
    }
    assert out[30]["decision"] == "metronomic"
    assert out[30]["fano_e3"] == 0
    assert out[31]["decision"] == "bursty"
    assert out[32]["decision"] == "single_surface"
    assert out[33]["decision"] == "extreme_volume"
    assert 200 < out[33]["fano_e3"] < 5000
    for uid in range(20):
        assert out[uid]["decision"] == "keep", (uid, dict(out[uid].asDict()))
        assert out[uid]["keep"]


def test_single_source_risk_laws(spark, sf_dir):
    rows = QUERIES["part_single_source_risk"](spark, sf_dir).collect()
    assert rows
    assert sum(r["risk_share_bp"] for r in rows) <= 10000
    for r in rows:
        assert 0 <= r["n_single_source"] <= r["n_parts"]
        assert r["revenue_at_risk_e4"] >= 0
        if r["n_single_source"] == 0:
            assert r["revenue_at_risk_e4"] == 0


def test_type_affinity_laws(spark, sf_dir):
    rows = QUERIES["events_type_affinity"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["type_a"] < r["type_b"]
        assert r["n_both"] <= min(r["users_a"], r["users_b"])
        assert 0 <= r["jaccard_bp"] <= 10000
        # both <= min(ua, ub) => lift <= 1e6 * U / max(ua, ub)
        n_users = spark.read.parquet(f"{sf_dir}/events.parquet").select(
            "user_id"
        ).distinct().count()
        assert (
            0
            <= r["lift_ppm"]
            <= 1_000_000 * n_users // max(r["users_a"], r["users_b"])
        )


def test_mahalanobis_null_calibration(spark, sf_dir):
    """Under the null, E[z-square] = 1 per dim, so the corpus mean
    score must sit at ~dims * 1e6 (within 10%); flags follow the
    2x-dims threshold exactly."""
    rows = QUERIES["embed_mahalanobis_outliers"](spark, sf_dir).collect()
    n_vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert len(rows) == n_vecs
    mean = sum(r["maha_e6"] for r in rows) // len(rows)
    assert 57_600_000 <= mean <= 70_400_000
    for r in rows:
        assert r["maha_e6"] >= 0
        assert r["is_outlier"] == (r["maha_e6"] > 128_000_000)


def test_two_nn_ratio_laws(spark, sf_dir):
    rows = QUERIES["embed_two_nn_ratio"](spark, sf_dir).collect()
    assert rows
    total = sum(r["n_vecs"] for r in rows)
    # every vector with >= 2 cell-mates contributes exactly once
    margins = QUERIES["ann_neighbor_margin"](spark, sf_dir).count()
    assert total == margins
    for r in rows:
        # mu^2 >= 1000 by construction (cos1 >= cos2)
        assert r["min_mu2_e3"] >= 1000
        assert r["min_mu2_e3"] <= r["mean_mu2_e3"] <= r["max_mu2_e3"]


def test_layout_pruning_story(spark, sf_dir):
    """Single-key layouts prune their own dimension and scan 100%
    of the other; z-order prunes at least one (both at balanced
    domains — at sf0.001 the 15-user domain starves the Morton x
    bits, documented in the docstring)."""
    rows = {
        (r["layout"], r["probe"]): r
        for r in QUERIES["layout_pruning_compare"](spark, sf_dir).collect()
    }
    assert len(rows) == 6
    assert rows[("ts", "user_band")]["rows_scanned_bp"] == 10000
    assert rows[("ts", "hour_band")]["rows_scanned_bp"] < 10000
    assert rows[("user", "hour_band")]["rows_scanned_bp"] == 10000
    assert rows[("user", "user_band")]["rows_scanned_bp"] < 10000
    z = min(
        rows[("zorder", "user_band")]["rows_scanned_bp"],
        rows[("zorder", "hour_band")]["rows_scanned_bp"],
    )
    assert z < 10000
    for r in rows.values():
        assert r["chunks_scanned"] <= r["n_chunks"]


def test_chain_artifact_laws(spark, sf_dir):
    rows = QUERIES["dedup_chain_artifact_report"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["cluster_size"] >= 2
        assert 0 < r["mean_density_bp"] <= 10000
        assert r["min_density_bp"] <= r["mean_density_bp"]
        assert 0 <= r["n_chained"] <= r["n_clusters"]
        if r["cluster_size"] == 2:
            # a 2-cluster's one pair IS the merging edge: density 10000
            assert r["mean_density_bp"] == 10000
            assert r["n_chained"] == 0


def test_revenue_bridge_conservation(spark, sf_dir):
    rows = QUERIES["revenue_bridge_mom"](spark, sf_dir).collect()
    assert rows
    n_months = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .selectExpr("date_trunc('month', o_orderdate) AS m")
        .distinct()
        .count()
    )
    assert len(rows) == n_months - 1  # first month has no bridge
    for r in rows:
        assert (
            r["volume_effect_e4"] + r["price_effect_e4"] == r["d_rev_e4"]
        )


def test_streaming_hot_key_state_maintenance(spark, sf_dir, tmp_path):
    """Hot-key detection on an endless stream: per-key counts are
    additive, so foreachBatch-appended per-batch counts merged by
    key must reproduce the BATCH top-8 hot-key table (ranks,
    shares, salt prescriptions) exactly — key-bounded state, the
    count-min maintenance discipline applied at the report level."""
    import shutil
    from pathlib import Path

    from pyspark.sql import Window

    from aurora_cdc_demo_spark.sources.cdc_log import cdc_operation_log
    from aurora_cdc_demo_spark.streaming.pipelines import read_cdc_stream

    # two time-split chunks flattened into one dir (the file-stream
    # source does not recurse), same shape as test_streaming.log_dir
    log = cdc_operation_log(spark, sf_dir)
    split = F.to_timestamp(F.lit("2024-01-16 00:00:00"))
    stage = tmp_path / "hk_stage"
    log.where(F.col("ts") < split).coalesce(1).write.parquet(
        str(stage / "b0")
    )
    log.where(F.col("ts") >= split).coalesce(1).write.parquet(
        str(stage / "b1")
    )
    src = tmp_path / "hk_stream_in"
    src.mkdir()
    for i, sub in enumerate(["b0", "b1"]):
        for j, f in enumerate(sorted((stage / sub).glob("*.parquet"))):
            shutil.copy(f, src / f"{i:02d}_{j:02d}.parquet")
    out = str(tmp_path / "hk_batches")

    def apply_batch(batch_df, batch_id):
        (
            batch_df.where(F.col("key_id").isNotNull())
            .groupBy("key_id")
            .agg(F.count(F.lit(1)).alias("c"))
            .write.mode("append")
            .parquet(out)
        )

    q = (
        read_cdc_stream(spark, str(src))
        .writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt_hk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    def report(counts):
        tot = counts.agg(F.sum("c").alias("t"))
        w = Window.orderBy(F.col("c").desc(), F.col("key_id").asc())
        return {
            tuple(r)
            for r in counts.crossJoin(F.broadcast(tot))
            .withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= 8)
            .selectExpr(
                "key_id",
                "rnk",
                "c",
                "(10000 * c) div t AS share_bp",
                "CASE WHEN (10000 * c) div t > 100"
                " THEN ((10000 * c) div t * 32) div 10000 + 1"
                " ELSE 1 END AS salt_buckets",
            )
            .collect()
        }

    streamed = report(
        spark.read.parquet(out).groupBy("key_id").agg(
            F.sum("c").alias("c")
        )
    )
    batch = report(
        cdc_operation_log(spark, sf_dir)
        .where(F.col("key_id").isNotNull())
        .groupBy("key_id")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    assert streamed == batch
    assert len(streamed) == 8


def test_gate_attribution_consistency_with_v6(spark, sf_dir):
    """The multi-label view must agree with the priority-coded
    keep-list: keep(v6_lsh) iff zero gates fired, and every
    priority reason's own flag is set in the attribution row."""
    attr = {
        r["doc_id"]: r
        for r in QUERIES["corpus_gate_attribution"](spark, sf_dir).collect()
    }
    flag_of = {
        "exact_dup": "g_exact_dup",
        "near_dup": "g_near_dup",
        "contaminated": "g_contaminated",
        "dup_heavy": "g_dup_heavy",
        "repetitive": "g_repetitive",
        "c4_filtered": "g_c4_filtered",
        "gopher_filtered": "g_gopher_filtered",
        "gopher_repetitive": "g_gopher_repetitive",
        "low_quality": "g_low_quality",
        "off_target": "g_off_target",
        "sampled_out": "g_sampled_out",
        "boilerplate": "g_boilerplate",
    }
    for r in QUERIES["corpus_keep_list_v6_lsh"](spark, sf_dir).collect():
        a = attr[r["doc_id"]]
        assert r["keep"] == (a["n_gates_fired"] == 0), r["doc_id"]
        if not r["keep"]:
            assert a[flag_of[r["decision"]]], (r["doc_id"], r["decision"])
        assert a["sole_blocker"] == (a["n_gates_fired"] == 1)


def test_cohort_retention_matrix_laws(spark, sf_dir):
    rows = QUERIES["events_cohort_retention_matrix"](
        spark, sf_dir
    ).collect()
    assert rows
    by_cohort: dict[int, list] = {}
    for r in rows:
        by_cohort.setdefault(r["cohort_week"], []).append(r)
        assert r["weeks_since"] >= 0
        assert 0 < r["retention_bp"] <= 10000
        assert r["n_active"] <= r["cohort_size"]
        if r["weeks_since"] == 0:
            assert r["retention_bp"] == 10000
    # cross-check vs growth accounting: week-w actives = sum over
    # cohorts of that week's cell
    ga = {
        r["week_id"]: r["n_active"]
        for r in QUERIES["events_growth_accounting"](spark, sf_dir).collect()
    }
    per_week: dict[int, int] = {}
    for r in rows:
        w = r["cohort_week"] + r["weeks_since"]
        per_week[w] = per_week.get(w, 0) + r["n_active"]
    assert per_week == ga


def test_purchase_attribution_laws(spark, sf_dir):
    rows = QUERIES["events_purchase_attribution"](spark, sf_dir).collect()
    assert rows
    n_purchases = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .where("event_type = 'purchase'")
        .count()
    )
    assert sum(r["n_purchases"] for r in rows) == n_purchases
    assert all(r["first_touch"] != "purchase" for r in rows)
    total_bp = sum(r["share_bp"] for r in rows)
    # floor shares: within len(rows) bp of the whole
    assert 10000 - len(rows) < total_bp <= 10000


def test_cc_adversarial_path_graph_converges(spark):
    """r9 regression: the pre-contraction Pregel CC crawled ~1
    merge/round on chain-shaped graphs and silently returned a
    SPLIT component once max_iter ran out (caught by the sf0.1
    mutual-KNN oracle after the banded-edge switch). Label-space
    contraction must collapse an adversarially-ordered 400-node
    path to one min-labeled component well inside max_iter — and a
    non-converged exit now raises instead of lying."""
    import random

    from aurora_cdc_demo_spark.operators.graph import (
        connected_components,
    )

    rng = random.Random(7)
    perm = list(range(400))
    rng.shuffle(perm)
    edges = [(perm[i], perm[i + 1]) for i in range(399)]
    e = spark.createDataFrame(edges, "doc_a long, doc_b long")
    n = spark.createDataFrame([(i,) for i in range(400)], "doc_id long")
    lab = connected_components(n, e, max_iter=20)
    assert {r.cluster_id for r in lab.collect()} == {0}
