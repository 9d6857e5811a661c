from __future__ import annotations

import os

from .p01_cdc_operation_log import (  # noqa: F401
    DataFrame,
    F,
    QUERIES,
    _DECON_BENCH_MAX_ID,
    _DECON_NGRAM,
    _debezium,
    _dedup,
    _sim,
    _sk,
    _with_log,
    cdc_apply,
    cdc_operation_log,
    ensure_utc,
    load_table,
    query,
)
from .p02_text_gopher_rules import (  # noqa: F401
    _graph_edges_map,
    ORACLES,
    _DEBEZIUM_SILVER_CTE,
    _gate_map,
    _knn_edges_view,
    _sampling,
)
from .p04_embed_dim_stats import (  # noqa: F401
    _pca_fd,
)
from .p05_corpus_keep_list_v7 import (  # noqa: F401
    _AB_ARMS,
)
from .p07_events_allen_relations import (  # noqa: F401
    _lifecycle_conformance_sql,
    _status_rule_sql,
)

# ---------------------------------------------------------------------------
# R14: rich-club coefficient, bloom FP-rate audit (SURVEY §2 #469-470)
# ---------------------------------------------------------------------------

_RICH_CLUB_GRID = (3, 4, 5, 6, 8, 10)


def _rich_club_sql(dialect: str, edges_rel: str | None = None) -> str:
    div = "div" if dialect == "spark" else "//"
    grid = ", ".join(f"({k})" for k in _RICH_CLUB_GRID)
    if edges_rel is None:
        mat = "MATERIALIZED " if dialect != "spark" else ""
        head = f"""
        WITH knn AS {mat}({_sim.graph_edges_sql(dialect)})
        , g AS (
            SELECT vec_id AS src, neighbor_id AS dst FROM knn)"""
    else:
        head = f"""
        WITH g AS (SELECT src, dst FROM {edges_rel})"""
    return f"""{head}
        , und AS (
            SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
            FROM g)
        , deg AS (
            SELECT v, CAST(COUNT(*) AS BIGINT) AS d
            FROM (SELECT a AS v FROM und
                  UNION ALL SELECT b AS v FROM und) u
            GROUP BY v)
        , within AS (
            SELECT t.k, CAST(COUNT(*) AS BIGINT) AS n_edges
            FROM und e
            JOIN deg da ON da.v = e.a
            JOIN deg db ON db.v = e.b
            CROSS JOIN (VALUES {grid}) AS t(k)
            WHERE da.d > t.k AND db.d > t.k
            GROUP BY t.k)
        , members AS (
            SELECT t.k, CAST(COUNT(*) AS BIGINT) AS n_nodes
            FROM deg CROSS JOIN (VALUES {grid}) AS t(k)
            WHERE deg.d > t.k GROUP BY t.k)
        SELECT m.k AS degree_threshold, m.n_nodes,
               CAST(COALESCE(w.n_edges, 0) AS BIGINT) AS n_edges,
               CAST(COALESCE((10000 * 2 * COALESCE(w.n_edges, 0))
                             {div} NULLIF(m.n_nodes * (m.n_nodes - 1),
                                          0), 0)
                    AS BIGINT) AS density_bp
        FROM members m LEFT JOIN within w ON w.k = m.k
    """


@query("graph_rich_club_knn", oracle=_rich_club_sql("duck"))
def q_graph_rich_club_knn(spark, sf_dir):
    """RICH-CLUB coefficient of the (undirected) KNN graph: for each
    degree threshold k, the edge density AMONG nodes of degree > k —
    'do the hubs preferentially connect to EACH OTHER' (rising
    density with k = a rich club), the hub-interconnection statistic
    the degree tail (#393 hubness) and reciprocity (#455) don't
    measure. In embedding spaces a rich club marks a dense core
    region that IVF cells over-sample and MMR-style diversification
    (#165) exists to escape.

    Scale: undirected dedup + degree table are node x K bounded; the
    threshold grid is a broadcast VALUES; per-k membership and
    within-club edge counts are joins on those bounded tables; the
    directed edge list comes from the shared `graph_knn_edges` gate
    map (r6)."""
    edges = _knn_edges_view(spark, sf_dir)
    return spark.sql(_rich_club_sql("spark", edges))


def _bloom_fp_audit_sql(dialect: str) -> str:
    div = "div" if dialect == "spark" else "//"
    n = _DECON_NGRAM
    if dialect == "spark":
        toks = "split(text, ' ')"
        gexpr = (
            f"explode(transform(sequence(1, size(t) - {n - 1}), "
            f"i -> array_join(slice(t, i, {n}), ' ')))"
        )
        sz = "size(t)"
        a = "CAST(conv(substring(md5(g), 1, 8), 16, 10) AS BIGINT)"
        b = "CAST(conv(substring(md5(g), 9, 8), 16, 10) AS BIGINT)"
        jgrid = f"explode(sequence(0, {_sk.BLOOM_K - 1}))"
    else:
        toks = "string_split(text, ' ')"
        gexpr = (
            f"unnest(list_transform(range(1, len(t) - {n - 2}), "
            f"i -> array_to_string(t[i:i+{n - 1}], ' ')))"
        )
        sz = "len(t)"
        a = "CAST('0x' || substr(md5(g), 1, 8) AS BIGINT)"
        b = "CAST('0x' || substr(md5(g), 9, 8) AS BIGINT)"
        jgrid = f"unnest(range({_sk.BLOOM_K}))"
    return f"""
        WITH toks AS (SELECT doc_id, {toks} AS t FROM documents)
        , grams AS (
            SELECT doc_id, {gexpr} AS g
            FROM toks WHERE {sz} >= {n})
        , bench AS (
            SELECT DISTINCT g FROM grams
            WHERE doc_id < {_DECON_BENCH_MAX_ID})
        , bits AS (
            SELECT DISTINCT ({a} + j.j * {b}) % {_sk.BLOOM_M} AS pos
            FROM bench CROSS JOIN (SELECT {jgrid} AS j) j)
        , probes AS (
            SELECT DISTINCT g FROM grams
            WHERE doc_id >= {_DECON_BENCH_MAX_ID})
        , ppos AS (
            SELECT g, ({a} + j.j * {b}) % {_sk.BLOOM_M} AS pos
            FROM probes CROSS JOIN (SELECT {jgrid} AS j) j)
        , verdict AS (
            SELECT p.g,
                   CASE WHEN COUNT(*) = COUNT(b.pos)
                        THEN 1 ELSE 0 END AS maybe
            FROM ppos p LEFT JOIN bits b ON b.pos = p.pos
            GROUP BY p.g)
        , truth AS (
            SELECT v.g, v.maybe,
                   CASE WHEN bn.g IS NOT NULL THEN 1 ELSE 0 END
                       AS is_true
            FROM verdict v LEFT JOIN bench bn ON bn.g = v.g)
        , nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_bench FROM bench)
        , sb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_bits FROM bits)
        SELECT CAST({_sk.BLOOM_M} AS BIGINT) AS m_bits,
               CAST({_sk.BLOOM_K} AS BIGINT) AS k_hashes,
               nb.n_bench AS n_bench_grams,
               sb.n_bits AS n_set_bits,
               CAST((10000 * sb.n_bits) {div} {_sk.BLOOM_M}
                    AS BIGINT) AS load_bp,
               CAST(COUNT(*) AS BIGINT) AS n_probe_grams,
               CAST(SUM(t.is_true) AS BIGINT) AS n_true_members,
               CAST(SUM(CASE WHEN t.maybe = 1 AND t.is_true = 0
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos,
               CAST(COALESCE((10000 * SUM(CASE WHEN t.maybe = 1
                                               AND t.is_true = 0
                                          THEN 1 ELSE 0 END))
                    {div} NULLIF(COUNT(*) - SUM(t.is_true), 0), 0)
                    AS BIGINT) AS fp_bp
        FROM truth t CROSS JOIN nb CROSS JOIN sb
        GROUP BY nb.n_bench, sb.n_bits
    """


@query("corpus_bloom_fp_audit", oracle=_bloom_fp_audit_sql("duck"))
def q_corpus_bloom_fp_audit(spark, sf_dir):
    """BLOOM-FILTER calibration audit for the decontamination filter
    (#115's {m}-bit / k={k} design): filter load (set bits, bp),
    and the OBSERVED gram-level false-positive rate over the
    non-member probe population — the number the theoretical
    (1-e^(-kn/m))^k curve promises, measured exactly. When the
    benchmark suite grows, load_bp is the early-warning gauge that
    says when m must double before the FP rate quietly starts
    deleting clean training docs; the calibration sibling of the
    recall/precision sweeps (#176/#190).

    Scale: bench-bounded bit table (broadcast), one distinct-gram
    probe aggregate; identical hash algebra to #115 so the audit
    measures the filter actually deployed.""".format(
        m=_sk.BLOOM_M, k=_sk.BLOOM_K
    )
    ensure_utc(spark)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents"
    )
    return spark.sql(_bloom_fp_audit_sql("spark"))


# ---------------------------------------------------------------------------
# R14: Spearman pre/post correlation, mean-excess tail curve
# (SURVEY §2 #471-472)
# ---------------------------------------------------------------------------


def _spearman_sql(dialect: str) -> str:
    div = "div" if dialect == "spark" else "//"
    us = "unix_micros" if dialect == "spark" else "epoch_us"
    wide = "DECIMAL(38,0)" if dialect == "spark" else "HUGEINT"
    return f"""
        WITH span AS (
            SELECT (MIN({us}(ts)) + MAX({us}(ts))) {div} 2 AS mid_us
            FROM events)
        , u AS (
            SELECT user_id,
                   CAST(SUM(CASE WHEN {us}(ts) < s.mid_us
                            THEN 1 ELSE 0 END) AS BIGINT) AS x,
                   CAST(SUM(CASE WHEN {us}(ts) >= s.mid_us
                            THEN 1 ELSE 0 END) AS BIGINT) AS y
            FROM events CROSS JOIN span s
            GROUP BY user_id, s.mid_us)
        , dx AS (
            SELECT x, CAST(COUNT(*) AS BIGINT) AS cnt,
                   CAST(COALESCE(SUM(COUNT(*)) OVER (
                        ORDER BY x ASC
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0) AS BIGINT) AS prefix
            FROM u GROUP BY x)
        , dy AS (
            SELECT y, CAST(COUNT(*) AS BIGINT) AS cnt,
                   CAST(COALESCE(SUM(COUNT(*)) OVER (
                        ORDER BY y ASC
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0) AS BIGINT) AS prefix
            FROM u GROUP BY y)
        , ranked AS (
            SELECT u.user_id,
                   2 * dx.prefix + dx.cnt + 1 AS rx,
                   2 * dy.prefix + dy.cnt + 1 AS ry
            FROM u JOIN dx ON dx.x = u.x JOIN dy ON dy.y = u.y)
        , s AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(rx) AS BIGINT) AS sx,
                   CAST(SUM(ry) AS BIGINT) AS sy,
                   CAST(SUM(rx * ry) AS BIGINT) AS sxy,
                   CAST(SUM(rx * rx) AS BIGINT) AS sx2,
                   CAST(SUM(ry * ry) AS BIGINT) AS sy2
            FROM ranked)
        SELECT n AS n_users,
               CAST(CASE WHEN n * sxy - sx * sy > 0 THEN 1
                         WHEN n * sxy - sx * sy < 0 THEN -1
                         ELSE 0 END AS BIGINT) AS rho_sign,
               CAST(COALESCE(
                    (10000 * CAST(n * sxy - sx * sy AS {wide})
                           * CAST(n * sxy - sx * sy AS {wide}))
                    {div} NULLIF(CAST(n * sx2 - sx * sx AS {wide})
                                 * CAST(n * sy2 - sy * sy AS {wide}),
                                 0), 0) AS BIGINT) AS rho2_bp
        FROM s
    """


@query("events_spearman_pre_post", oracle=_spearman_sql("duck"))
def q_events_spearman_pre_post(spark, sf_dir):
    """SPEARMAN rank correlation between each user's pre-midpoint
    and post-midpoint activity — 'do heavy users stay heavy',
    measured on MIDRANKS (tie-corrected, 2x-scaled exact — #449's
    algebra applied twice) so one whale cannot dominate the way it
    does the Pearson view; the rank-based member of the correlation
    family (#408 CUPED/Pearson, #464 load-coupling). Spearman IS
    Pearson on ranks, so the 38-digit signed-rho^2 discipline
    applies unchanged; the scale-invariance of rho under the 2x
    rank scaling is pinned in the pytest law.

    Scale: user aggregate -> two distinct-value prefix windows
    (user-bounded, the #233 discipline) -> scalar sufficient
    statistics."""
    ensure_utc(spark)
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_spearman_sql("spark"))


_MEF_GRID_PCT = (50, 75, 90, 95, 99)  # thresholds as % of value RANGE


def _mean_excess_sql(dialect: str) -> str:
    div = "div" if dialect == "spark" else "//"
    grid = ", ".join(f"({q})" for q in _MEF_GRID_PCT)
    return f"""
        WITH v AS (
            SELECT CAST(ROUND(value * 100) AS BIGINT) AS c
            FROM events)
        , mm AS (
            SELECT MIN(c) AS lo, MAX(c) AS hi,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM v)
        , thresholds AS (
            SELECT g.q, m.n,
                   m.lo + (g.q * (m.hi - m.lo)) {div} 100 AS u
            FROM (VALUES {grid}) AS g(q) CROSS JOIN mm m)
        SELECT t.q AS range_pct,
               t.u AS threshold_cents,
               CAST(COUNT(CASE WHEN v.c > t.u THEN 1 END) AS BIGINT)
                   AS n_exceed,
               CAST((10000 * COUNT(CASE WHEN v.c > t.u THEN 1 END))
                    {div} t.n AS BIGINT) AS exceed_share_bp,
               CAST(COALESCE((100 * SUM(CASE WHEN v.c > t.u
                                        THEN v.c - t.u ELSE 0 END))
                    {div} NULLIF(COUNT(CASE WHEN v.c > t.u THEN 1 END),
                                 0), 0) AS BIGINT)
                   AS mean_excess_centi
        FROM v CROSS JOIN thresholds t
        GROUP BY t.q, t.u, t.n
    """


@query("events_mean_excess_curve", oracle=_mean_excess_sql("duck"))
def q_events_mean_excess_curve(spark, sf_dir):
    """MEAN-EXCESS (mean residual life) curve — the extreme-value-
    theory tail diagnostic: at thresholds placed at
    {50,75,90,95,99}% of the
    value RANGE, the count above, its share, and the exact mean
    exceedance E[X-u | X>u] in centi-cents. The SHAPE is the
    readout (EVT: linear-rising = heavy Pareto tail, flat =
    exponential, falling = bounded) — the distributional statement
    behind the heavy-tail guards (#445 winsorization, #394 quantile
    effects) and the peaks-over-threshold view the quantile grids
    don't give. Range-anchored thresholds keep the grid exact with
    only min/max (no rank machinery on the hot path).

    Scale: one scan against a broadcast 5-row threshold table,
    map-side combined conditional sums."""
    ensure_utc(spark)
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_mean_excess_sql("spark"))


# ---------------------------------------------------------------------------
# R14: fold-contamination audit, DiD pre-trend check (SURVEY §2 #473-474)
# ---------------------------------------------------------------------------


def _fold_contamination_sql(dialect: str) -> str:
    div = "div" if dialect == "spark" else "//"
    n = _dedup.NGRAM_N
    if dialect == "spark":
        h = "CAST(conv(substring(md5(source), 1, 8), 16, 10) AS BIGINT)"
        shingle_ctes = f"""
    toks AS (SELECT doc_id, split(text, ' ') AS t FROM documents)
    , sh AS (
        SELECT DISTINCT doc_id,
               explode(transform(sequence(1, size(t) - {n - 1}),
                       i -> array_join(slice(t, i, {n}), ' '))) AS s
        FROM toks WHERE size(t) >= {n})
    , sc AS (SELECT doc_id, COUNT(*) AS c FROM sh GROUP BY doc_id)
"""
    else:
        h = "CAST('0x' || substr(md5(source), 1, 8) AS BIGINT)"
        shingle_ctes = _dedup._SHINGLES_SQL
    return f"""
        WITH {shingle_ctes}
        , inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(COUNT(*) AS BIGINT) AS i
            FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2)
        , pairs AS (
            SELECT doc_a, doc_b
            FROM inter p
            JOIN sc x ON p.doc_a = x.doc_id
            JOIN sc y ON p.doc_b = y.doc_id
            WHERE 10000 * p.i
                  >= {_dedup.JACCARD_THRESHOLD_BP} * (x.c + y.c - p.i))
        , folds AS (
            SELECT doc_id, source, ({h}) % 5 AS fold FROM documents)
        , marked AS (
            SELECT p.doc_a, p.doc_b,
                   CASE WHEN fa.source <> fb.source
                        THEN 1 ELSE 0 END AS cross_source,
                   CASE WHEN fa.fold <> fb.fold
                        THEN 1 ELSE 0 END AS cross_fold
            FROM pairs p
            JOIN folds fa ON fa.doc_id = p.doc_a
            JOIN folds fb ON fb.doc_id = p.doc_b)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_neardup_pairs,
               CAST(SUM(cross_source) AS BIGINT) AS n_cross_source,
               CAST(SUM(cross_fold) AS BIGINT) AS n_cross_fold,
               CAST(COALESCE((10000 * SUM(cross_fold))
                    {div} NULLIF(COUNT(*), 0), 0) AS BIGINT)
                   AS cross_fold_bp
        FROM marked
    """


@query(
    "dedup_fold_contamination",
    oracle=_fold_contamination_sql("duck"),
)
def q_dedup_fold_contamination(spark, sf_dir):
    """FOLD-CONTAMINATION audit of the grouped k-fold (#461): how
    many exact-Jaccard near-dup pairs (#26's threshold) STILL cross
    a fold boundary — grouped folds eliminate within-source leakage
    BY CONSTRUCTION (a within-source pair shares a fold; pinned as a
    law: cross_fold <= cross_source), so what remains is exactly the
    cross-SOURCE syndication the prefix-family screen (#436) and
    source-similarity matrix (#239) detect. This is the number an
    eval-split review quotes: 'k docs of the validation fold have a
    training-fold near-duplicate'.

    Scale: the pair population is the shingle-join near-dup set the
    dedup family already bounds (banded in deployment via #27's
    LSH); fold marking is two broadcast-able doc->fold joins."""
    ensure_utc(spark)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents"
    )
    return spark.sql(_fold_contamination_sql("spark"))


def _did_pretrend_sql(dialect: str) -> str:
    div = "div" if dialect == "spark" else "//"
    us = "unix_micros" if dialect == "spark" else "epoch_us"
    wide = "DECIMAL(38,0)" if dialect == "spark" else "HUGEINT"
    if dialect == "spark":
        h = (
            "CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 8),"
            " 16, 10) AS BIGINT)"
        )
    else:
        h = (
            "CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)"
            " AS BIGINT)"
        )
    return f"""
        WITH span AS (
            SELECT (MIN({us}(ts)) + MAX({us}(ts))) {div} 2 AS mid_us,
                   MIN({us}(ts)) {div} 86400000000 AS day0
            FROM events)
        , pre AS (
            SELECT ({h}) % 2 AS arm,
                   {us}(ts) {div} 86400000000 - s.day0 AS t
            FROM events CROSS JOIN span s
            WHERE {us}(ts) < s.mid_us)
        , days AS (SELECT DISTINCT t FROM pre)
        , grid AS (
            SELECT d.t, a.arm FROM days d
            CROSS JOIN (VALUES (0), (1)) AS a(arm))
        , counts AS (
            SELECT arm, t, CAST(COUNT(*) AS BIGINT) AS y
            FROM pre GROUP BY arm, t)
        , filled AS (
            SELECT g.t, g.arm, COALESCE(c.y, 0) AS y
            FROM grid g LEFT JOIN counts c
              ON c.arm = g.arm AND c.t = g.t)
        , stats AS (
            SELECT arm,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(t) AS BIGINT) AS st,
                   CAST(SUM(y) AS BIGINT) AS sy,
                   CAST(SUM(t * y) AS BIGINT) AS sty,
                   CAST(SUM(t * t) AS BIGINT) AS st2
            FROM filled GROUP BY arm)
        , nums AS (
            SELECT
                MAX(CASE WHEN arm = 1
                         THEN n * sty - st * sy END) AS num_treat,
                MAX(CASE WHEN arm = 0
                         THEN n * sty - st * sy END) AS num_control,
                MAX(n * st2 - st * st) AS den,
                MAX(n) AS n_days,
                MAX(CASE WHEN arm = 1 THEN sy END) AS y_treat,
                MAX(CASE WHEN arm = 0 THEN sy END) AS y_control
            FROM stats)
        SELECT CAST(n_days AS BIGINT) AS n_days,
               CAST(y_treat AS BIGINT) AS pre_events_treat,
               CAST(y_control AS BIGINT) AS pre_events_control,
               CAST(num_treat AS BIGINT) AS slope_num_treat,
               CAST(num_control AS BIGINT) AS slope_num_control,
               CAST(den AS BIGINT) AS slope_den,
               CAST(CASE WHEN num_treat > 0 THEN 1
                         WHEN num_treat < 0 THEN -1
                         ELSE 0 END AS BIGINT) AS slope_sign_treat,
               CAST(CASE WHEN num_treat - num_control > 0 THEN 1
                         WHEN num_treat - num_control < 0 THEN -1
                         ELSE 0 END AS BIGINT) AS pretrend_diff_sign,
               CAST((10000 * CAST(ABS(num_treat - num_control)
                                  AS {wide}))
                    {div} NULLIF(CAST(den AS {wide}), 0)
                    AS BIGINT) AS slope_diff_e4_abs
        FROM nums
    """


@query("events_did_pretrend_check", oracle=_did_pretrend_sql("duck"))
def q_events_did_pretrend_check(spark, sf_dir):
    """DIFFERENCE-IN-DIFFERENCES PRE-TREND check — the assumption
    the DiD estimate (#367) stands on, tested instead of assumed:
    daily pre-period volumes per hash arm over the COMMON day spine
    (zero-filled), each arm's OLS slope as an exact integer
    numerator over the SHARED denominator (same day grid => same
    denominator, so the slope comparison is one integer subtraction,
    no division), the sign of the treat-control slope gap and its
    magnitude in e4 units. A nonzero pre-trend gap is the red flag
    that parallel-trends fails and #367's estimate is biased.

    Scale: one filtered scan -> (arm x day)-bounded aggregate;
    sufficient statistics and the wide-type magnitude live on 2
    rows."""
    ensure_utc(spark)
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_did_pretrend_sql("spark"))


# ---------------------------------------------------------------------------
# R14: mixer-policy comparison, per-segment SRM (SURVEY §2 #475-476)
# ---------------------------------------------------------------------------


def _mixer_comparison_sql(dialect: str) -> str:
    div = "div" if dialect == "spark" else "//"
    # The unrolled waterfilling re-inlines MULTIPLICATIVELY when its
    # CTE is referenced twice (utot + join): observed 64 parquet
    # scans. The Spark side materializes the REGISTERED unimax query
    # (localCheckpoint view); DuckDB gets the dual-dialect SQL inline.
    uni = (
        "SELECT lang, n_docs, allocation, is_capped FROM mixer_uni"
        if dialect == "spark"
        else _sampling.unimax_sql(dialect)
    )
    return f"""
        WITH uni AS ({uni})
        , counts AS (
            SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs
            FROM documents GROUP BY lang)
        , weighted AS (
            SELECT lang, n_docs,
                   CAST(FLOOR(SQRT(CAST(n_docs AS DOUBLE))) AS BIGINT)
                       AS w
            FROM counts)
        , tot AS (
            SELECT CAST(SUM(w) AS BIGINT) AS tw,
                   CAST(SUM(n_docs) AS BIGINT) AS td
            FROM weighted)
        , temp AS (
            SELECT w.lang, w.n_docs,
                   CAST((10000 * w.n_docs) {div} t.td AS BIGINT)
                       AS natural_share_bp,
                   CAST((10000 * w.w) {div} t.tw AS BIGINT)
                       AS sampled_share_bp
            FROM weighted w CROSS JOIN tot t)
        , utot AS (SELECT CAST(SUM(allocation) AS BIGINT) AS s FROM uni)
        , joined AS (
            SELECT t.lang, t.n_docs,
                   t.natural_share_bp,
                   t.sampled_share_bp AS temperature_share_bp,
                   CAST((10000 * u.allocation) {div} ut.s AS BIGINT)
                       AS unimax_share_bp,
                   CAST(CASE WHEN u.is_capped THEN 1 ELSE 0 END
                        AS BIGINT) AS unimax_capped
            FROM temp t JOIN uni u ON u.lang = t.lang
            CROSS JOIN utot ut)
        SELECT lang, n_docs, natural_share_bp, temperature_share_bp,
               unimax_share_bp, unimax_capped,
               CAST(GREATEST(natural_share_bp, temperature_share_bp,
                             unimax_share_bp)
                    - LEAST(natural_share_bp, temperature_share_bp,
                            unimax_share_bp) AS BIGINT)
                   AS policy_spread_bp
        FROM joined
    """


@query("sample_mixer_comparison", oracle=_mixer_comparison_sql("duck"))
def q_sample_mixer_comparison(spark, sf_dir):
    """MIXER-POLICY comparison mart: per language, the natural
    corpus share vs what the TEMPERATURE mixer (#174) and the UNIMAX
    cap (#151) would each sample, side by side with the policy
    SPREAD (max-min share gap) — the one-table answer to 'how much
    do our mixing policies actually disagree, and on which
    languages'. Low-resource langs show temperature lifting and
    UniMax capping pulling in opposite directions; high-spread rows
    are where the data-recipe decision (#420) actually matters.

    Scale: the unimax waterfilling composes as a CTE via its
    dual-dialect generator; the temperature side re-derives the #174
    formula inline (pinned equal to the registered query in pytest);
    one |langs|-row join."""
    ensure_utc(spark)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents"
    )
    QUERIES["sample_unimax_budget"](
        spark, sf_dir
    ).localCheckpoint().createOrReplaceTempView("mixer_uni")
    return spark.sql(_mixer_comparison_sql("spark"))


def _srm_by_type_sql(dialect: str) -> str:
    div = "div" if dialect == "spark" else "//"
    if dialect == "spark":
        h = (
            "CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 8),"
            " 16, 10) AS BIGINT)"
        )
    else:
        h = (
            "CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)"
            " AS BIGINT)"
        )
    return f"""
        WITH ut AS (
            SELECT DISTINCT event_type, user_id, ({h}) % 2 AS arm
            FROM events)
        , per_type AS (
            SELECT event_type,
                   CAST(SUM(arm) AS BIGINT) AS n_treat,
                   CAST(SUM(1 - arm) AS BIGINT) AS n_control
            FROM ut GROUP BY event_type)
        SELECT event_type, n_treat, n_control,
               CAST((10000 * n_treat) {div} (n_treat + n_control)
                    AS BIGINT) AS treat_share_bp,
               CAST((1000000 * (n_treat - n_control)
                             * (n_treat - n_control))
                    {div} (n_treat + n_control) AS BIGINT)
                   AS chi2_e6,
               CAST(CASE WHEN (1000000 * (n_treat - n_control)
                                        * (n_treat - n_control))
                              {div} (n_treat + n_control)
                              > 3841459 THEN 1 ELSE 0 END AS BIGINT)
                   AS srm_flag
        FROM per_type
    """


@query("events_srm_by_type", oracle=_srm_by_type_sql("duck"))
def q_events_srm_by_type(spark, sf_dir):
    """SAMPLE-RATIO MISMATCH per SEGMENT: the #371 SRM chi-square
    run separately for each event type's exposed-user population —
    the global check passes while a single surface (say, purchases)
    quietly drops one arm's logging; per-type chi2 vs the expected
    50/50 ((t-c)^2/(t+c), e6, exact) with the alpha=5% flag
    (chi2_1 critical value 3.841459 as an integer-e6 literal — a
    data-independent constant in Python per the float-constant
    rule). The segment-wise guardrail every experiment readout
    (#325/#394/#449) should be gated on.

    Scale: one distinct (type,user) aggregate; the census is
    |types|-bounded."""
    ensure_utc(spark)
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_srm_by_type_sql("spark"))


# ---------------------------------------------------------------------------
# R14: IVF nlist cost curve, warehouse DQ scorecard (SURVEY §2 #477-478)
# ---------------------------------------------------------------------------

_NLIST_GRID = (4, 8, 16, 32)


def _nlist_cost_sql(dialect: str) -> str:
    div = "div" if dialect == "spark" else "//"
    grid = ", ".join(f"({c})" for c in _NLIST_GRID)
    max_l = max(_NLIST_GRID)
    return f"""
        WITH v AS (
            SELECT vec_id, embedding,
                   {_sim._norm('embedding', dialect)} AS nrm
            FROM embeddings)
        , seeds AS (
            SELECT vec_id AS seed_id, embedding AS se, nrm AS snrm
            FROM v WHERE vec_id < {max_l})
        , scores AS (
            SELECT v.vec_id, s.seed_id,
                   ({_sim._dot('v.embedding', 's.se', dialect)})
                       / (v.nrm * s.snrm) AS sc
            FROM v CROSS JOIN seeds s)
        , assign AS (
            SELECT r.l, vec_id, seed_id FROM (
                SELECT gg.l AS l, sc.vec_id, sc.seed_id,
                       row_number() OVER (
                           PARTITION BY gg.l, sc.vec_id
                           ORDER BY sc.sc DESC, sc.seed_id ASC) AS rn
                FROM scores sc
                JOIN (VALUES {grid}) AS gg(l) ON sc.seed_id < gg.l) r
            WHERE rn = 1)
        , cells AS (
            SELECT l, seed_id, CAST(COUNT(*) AS BIGINT) AS sz
            FROM assign GROUP BY l, seed_id)
        SELECT l AS nlist,
               CAST(COUNT(*) AS BIGINT) AS n_cells_used,
               CAST(SUM(sz) AS BIGINT) AS n_vectors,
               CAST((10000 * MAX(sz)) {div} SUM(sz) AS BIGINT)
                   AS max_cell_share_bp,
               CAST((100 * (l * SUM(sz) + SUM(sz * sz)))
                    {div} SUM(sz) AS BIGINT)
                   AS mean_scan_per_query_centi
        FROM cells GROUP BY l
    """


@query("ann_nlist_cost_curve", oracle=_nlist_cost_sql("duck"))
def q_ann_nlist_cost_curve(spark, sf_dir):
    """IVF NLIST design curve — the index-sizing trade the nprobe
    curves (#180/#437) take as given: for each candidate centroid
    count nlist in {g}, the cell balance (max share bp) and the
    expected nprobe=1 query cost = nlist centroid scans + the
    querying vector's OWN cell size in expectation (exactly
    Sum(sz^2)/n — big nlist pays more centroid compares, small nlist
    scans bigger cells; the minimum sits near sqrt(n), and this
    table shows it on THIS corpus instead of by folklore).

    Scale: ONE score table (corpus x max-nlist broadcast seeds),
    the per-nlist argmax reuses it via a grid join (prefix property:
    seeds < l); cells and the curve are centroid-bounded.""".format(
        g=list(_NLIST_GRID)
    )
    ensure_utc(spark)
    load_table(spark, sf_dir, "embeddings").createOrReplaceTempView(
        "embeddings"
    )
    return spark.sql(_nlist_cost_sql("spark"))


def _dq_scorecard_rollup_body() -> str:
    """Dialect-free rollup over the five component relations
    (ri / contracts / outliers / status / life — CTEs in the duck
    oracle, temp views of the REGISTERED queries on the Spark
    side). Returned WITHOUT a leading WITH so callers can splice."""
    return """
        s1 AS (
            SELECT CAST(SUM(n_orphans) AS BIGINT) AS fk_orphans,
                   CAST(SUM(n_null_fk) AS BIGINT) AS fk_nulls
            FROM ri)
        , s2 AS (
            SELECT CAST(SUM(n_violations) AS BIGINT)
                       AS contract_violations,
                   CAST(SUM(CASE WHEN passed THEN 0 ELSE 1 END)
                        AS BIGINT) AS contracts_failed
            FROM contracts)
        , s3 AS (
            SELECT CAST(SUM(n_outliers) AS BIGINT) AS price_outliers
            FROM outliers)
        , s4 AS (
            SELECT CAST(SUM(CASE WHEN is_consistent = 0
                            THEN n_orders ELSE 0 END) AS BIGINT)
                       AS status_violations
            FROM status)
        , s5 AS (
            SELECT CAST(SUM(CASE WHEN no_signup = 1
                                 OR multiple_signups = 1
                                 OR activity_before_signup = 1
                                 OR purchase_before_signup = 1
                            THEN n_users ELSE 0 END) AS BIGINT)
                       AS lifecycle_violators
            FROM life)
        SELECT s1.fk_orphans, s1.fk_nulls, s2.contract_violations,
               s2.contracts_failed, s3.price_outliers,
               s4.status_violations, s5.lifecycle_violators,
               CASE WHEN s1.fk_orphans + s2.contract_violations = 0
                    THEN 'green'
                    ELSE 'red' END AS hard_gate,
               CAST(s1.fk_orphans + s1.fk_nulls
                    + s2.contract_violations + s3.price_outliers
                    + s4.status_violations + s5.lifecycle_violators
                    AS BIGINT) AS total_findings
        FROM s1 CROSS JOIN s2 CROSS JOIN s3 CROSS JOIN s4 CROSS JOIN s5
    """


def _dq_scorecard_oracle() -> str:
    return f"""
        WITH ri AS ({ORACLES["dq_referential_integrity"]})
        , contracts AS ({ORACLES["dq_contract_checks"]})
        , outliers AS ({ORACLES["dq_outlier_price_iqr"]})
        , status AS ({_status_rule_sql("duck")})
        , life AS ({_lifecycle_conformance_sql("duck")})
        , {_dq_scorecard_rollup_body()}
    """


@query("dq_scorecard", oracle=_dq_scorecard_oracle())
def q_dq_scorecard(spark, sf_dir):
    """WAREHOUSE DQ SCORECARD — the one-row health rollup a release
    gate reads: FK orphans + null FKs (#203), declared-contract
    violations and failed rules (#352), IQR price outliers (#256),
    order/line status violations (#457) and lifecycle violators
    (#462), a hard gate (green iff the structural classes — orphans,
    contract breaks — are zero) and the total finding count. The
    Spark side registers the REGISTERED component queries as temp
    views (each referenced once, so no checkpoint is needed per the
    composition rule) and runs the same dialect-free rollup the
    DuckDB oracle wraps around the components' own oracle SQL — the
    scorecard inherits every component's exactness on both sides.

    Scale: the components each reduce to bounded censuses before
    this query touches them; the rollup is five scalar joins."""
    ensure_utc(spark)
    QUERIES["dq_referential_integrity"](spark, sf_dir)\
        .createOrReplaceTempView("ri")
    QUERIES["dq_contract_checks"](spark, sf_dir)\
        .createOrReplaceTempView("contracts")
    QUERIES["dq_outlier_price_iqr"](spark, sf_dir)\
        .createOrReplaceTempView("outliers")
    QUERIES["dq_order_line_status_rule"](spark, sf_dir)\
        .createOrReplaceTempView("status")
    QUERIES["events_lifecycle_conformance"](spark, sf_dir)\
        .createOrReplaceTempView("life")
    return spark.sql(f"WITH {_dq_scorecard_rollup_body()}")


# ---------------------------------------------------------------------------
# R14: Wilson CI per arm, SLO multi-window burn alerts (SURVEY §2 #479-480)
# ---------------------------------------------------------------------------


def _wilson_ci_sql(dialect: str) -> str:
    div = "div" if dialect == "spark" else "//"
    us = "unix_micros" if dialect == "spark" else "epoch_us"
    if dialect == "spark":
        h = (
            "CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 8),"
            " 16, 10) AS BIGINT)"
        )
    else:
        h = (
            "CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)"
            " AS BIGINT)"
        )
    return f"""
        WITH f AS (
            SELECT user_id, ({h}) % 2 AS arm,
                   MIN({us}(ts)) AS t0,
                   MIN(CASE WHEN event_type = 'purchase'
                            THEN {us}(ts) END) AS tp
            FROM events GROUP BY user_id)
        , u AS (
            SELECT arm,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN tp IS NOT NULL
                                 AND tp < t0 + 3600000000
                            THEN 1 ELSE 0 END) AS BIGINT) AS k
            FROM f GROUP BY arm)
        , s AS (
            SELECT arm, n, k,
                   CAST(FLOOR(SQRT(CAST(n * (k * (n - k) + n)
                                        AS DOUBLE))) AS BIGINT) AS sq
            FROM u)
        SELECT arm, n AS n_users, k AS n_converted,
               CAST((10000 * k) {div} n AS BIGINT) AS p_bp,
               CAST((10000 * n * (k + 2) - 20000 * sq)
                    {div} (n * (n + 4)) AS BIGINT) AS wilson_low_bp,
               CAST((10000 * n * (k + 2) + 20000 * sq)
                    {div} (n * (n + 4)) AS BIGINT) AS wilson_high_bp
        FROM s
    """


@query("events_conversion_wilson_ci", oracle=_wilson_ci_sql("duck"))
def q_events_conversion_wilson_ci(spark, sf_dir):
    """WILSON score interval (z=2, ~95%) for each arm's fast-
    purchase conversion — the uncertainty the point estimates
    (#325/#459) omit: center (k+2)/(n+4), half-width
    2*sqrt(k(n-k)/n + 1)/(n+4), both floor-scaled to bp with the
    single sqrt taken as FLOOR(SQRT(double)) (IEEE-deterministic on
    both engines, the #174 discipline; inner product n(k(n-k)+n)
    stays under 2^53 up to ~10^8 users — rescale k,n by a common
    factor beyond that). Wilson never leaves [0,1] and stays honest
    at small k, which the normal interval does not — the reason
    experimentation platforms quote it.

    Scale: one user aggregate; the interval algebra runs on 2
    rows."""
    ensure_utc(spark)
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_wilson_ci_sql("spark"))


_SLO_ALERT_POLICIES = (
    # (policy, factor_e1, short_hours, long_hours) — SRE workbook
    ("page", 144, 1, 6),
    ("ticket", 60, 6, 72),
)
_SLO_ALERT_BUDGET_BP = 100  # 1% allowed error share


def _slo_alerts_sql(dialect: str) -> str:
    div = "div" if dialect == "spark" else "//"
    us = "unix_micros" if dialect == "spark" else "epoch_us"
    if dialect == "spark":
        spine = "explode(sequence(b.h0, b.h1)) AS hr"
        mk = "timestamp_micros(s.hr * 3600000000)"
    else:
        spine = "unnest(range(b.h0, b.h1 + 1)) AS hr"
        mk = "make_timestamp(s.hr * 3600000000)"
    pol = ", ".join(
        f"('{p}', {f}, {s}, {lo})" for p, f, s, lo in _SLO_ALERT_POLICIES
    )
    winsum = (
        "SUM({c}) OVER (ORDER BY hr ASC ROWS BETWEEN {k} PRECEDING "
        "AND CURRENT ROW)"
    )
    arms = []
    for p, f, s, lo in _SLO_ALERT_POLICIES:
        arms.append(f"""
        SELECT '{p}' AS policy, CAST({f} AS BIGINT) AS factor_e1,
               CAST({s} AS BIGINT) AS short_hours,
               CAST({lo} AS BIGINT) AS long_hours,
               CAST(COUNT(CASE WHEN alert_{p} = 1 THEN 1 END)
                    AS BIGINT) AS n_alert_hours,
               MIN(CASE WHEN alert_{p} = 1 THEN hr_ts END)
                   AS first_alert_hour,
               CAST((10000 * COUNT(CASE WHEN alert_{p} = 1 THEN 1 END))
                    {div} COUNT(*) AS BIGINT) AS alert_share_bp
        FROM flagged""")
    flags = []
    for p, f, s, lo in _SLO_ALERT_POLICIES:
        # err_w * 1e4 * 10 > factor_e1 * budget_bp * n_w  (both windows)
        flags.append(
            f"""CASE WHEN {winsum.format(c='err', k=s - 1)} * 100000
                     > {f} * {_SLO_ALERT_BUDGET_BP}
                       * {winsum.format(c='n', k=s - 1)}
                 AND {winsum.format(c='err', k=lo - 1)} * 100000
                     > {f} * {_SLO_ALERT_BUDGET_BP}
                       * {winsum.format(c='n', k=lo - 1)}
                THEN 1 ELSE 0 END AS alert_{p}"""
        )
    return f"""
        WITH bounds AS (
            SELECT MIN({us}(ts)) {div} 3600000000 AS h0,
                   MAX({us}(ts)) {div} 3600000000 AS h1
            FROM events)
        , spine AS (SELECT {spine} FROM bounds b)
        , hourly AS (
            SELECT {us}(ts) {div} 3600000000 AS hr,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN event_type = 'error'
                            THEN 1 ELSE 0 END) AS BIGINT) AS err
            FROM events GROUP BY 1)
        , dense AS (
            SELECT s.hr AS hr, {mk} AS hr_ts,
                   COALESCE(h.n, 0) AS n, COALESCE(h.err, 0) AS err
            FROM spine s LEFT JOIN hourly h ON h.hr = s.hr)
        , flagged AS (
            SELECT hr, hr_ts, n, err,
                   {', '.join(flags)}
            FROM dense)
        {' UNION ALL '.join(arms)}
    """


@query("events_slo_multiwindow_alerts", oracle=_slo_alerts_sql("duck"))
def q_events_slo_multiwindow_alerts(spark, sf_dir):
    """MULTI-WINDOW MULTI-BURN-RATE SLO alerting (the SRE workbook
    policy, evaluated exactly): with a {b} bp error budget, a PAGE
    fires in hours where the trailing 1h AND 6h burn rates both
    exceed 14.4x budget; a TICKET where 6h AND 72h both exceed 6x —
    the two-window AND is what kills the flappy single-window alert
    (short window = fast detection, long window = sustained-burn
    confirmation). Rates never materialize: every comparison is an
    integer cross-multiplication over a DENSE hour spine
    (zero-traffic hours cannot alert — 0 > 0 is false). The
    alerting policy layer on top of the budget ledger (#398) and
    the outage census (#414).

    Scale: hour-grain aggregate + a calendar-bounded spine; the
    trailing windows are ROWS frames over |hours| rows.""".replace(
        "{b}", str(_SLO_ALERT_BUDGET_BP)
    )
    ensure_utc(spark)
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_slo_alerts_sql("spark"))


# ---------------------------------------------------------------------------
# R14: community conductance (SURVEY §2 #481)
# ---------------------------------------------------------------------------


def _community_conductance_sql(dialect: str) -> str:
    div = "div" if dialect == "spark" else "//"
    if dialect == "spark":
        # registered queries materialized as temp views
        lp = "SELECT vec_id, community_id FROM cond_lp_mat"
        kg = "SELECT vec_id, neighbor_id FROM cond_kg_mat"
    else:
        lp = ORACLES["graph_label_prop_knn"]
        kg = _sim.graph_edges_sql("duck")
    # duck MATERIALIZED on every multiply-referenced CTE: labels is
    # joined twice (la/lb) and und feeds three aggregates — inlined,
    # DuckDB re-instantiates the whole LPA+KNN chain per reference
    # and the buffer pool exhausts at sf0.1 mid-sweep (observed
    # 'Failed to allocate block' bad_allocs)
    mat = "MATERIALIZED " if dialect != "spark" else ""
    return f"""
        WITH lpq AS {mat}({lp})
        , kgq AS {mat}({kg})
        , und AS {mat}(
            SELECT DISTINCT LEAST(vec_id, neighbor_id) AS a,
                   GREATEST(vec_id, neighbor_id) AS b
            FROM kgq)
        , labels AS {mat}(SELECT vec_id, community_id FROM lpq)
        , marked AS {mat}(
            SELECT la.community_id AS ca, lb.community_id AS cb
            FROM und e
            JOIN labels la ON la.vec_id = e.a
            JOIN labels lb ON lb.vec_id = e.b)
        , internal AS (
            SELECT ca AS community_id,
                   CAST(COUNT(*) AS BIGINT) AS n_internal
            FROM marked WHERE ca = cb GROUP BY ca)
        , cut AS (
            SELECT community_id, CAST(SUM(c) AS BIGINT) AS n_cut
            FROM (
                SELECT ca AS community_id, COUNT(*) AS c
                FROM marked WHERE ca <> cb GROUP BY ca
                UNION ALL
                SELECT cb AS community_id, COUNT(*) AS c
                FROM marked WHERE ca <> cb GROUP BY cb) u
            GROUP BY community_id)
        , tot AS (SELECT CAST(2 * COUNT(*) AS BIGINT) AS vol_all
                  FROM und)
        , per AS (
            SELECT l.community_id,
                   CAST(COUNT(*) AS BIGINT) AS n_members,
                   CAST(COALESCE(MAX(i.n_internal), 0) AS BIGINT)
                       AS n_internal,
                   CAST(COALESCE(MAX(c.n_cut), 0) AS BIGINT) AS n_cut
            FROM labels l
            LEFT JOIN internal i ON i.community_id = l.community_id
            LEFT JOIN cut c ON c.community_id = l.community_id
            GROUP BY l.community_id)
        SELECT p.community_id, p.n_members, p.n_internal, p.n_cut,
               CAST(2 * p.n_internal + p.n_cut AS BIGINT) AS volume,
               CAST(COALESCE((10000 * p.n_cut)
                    {div} NULLIF(LEAST(2 * p.n_internal + p.n_cut,
                                       t.vol_all
                                       - (2 * p.n_internal + p.n_cut)),
                                 0), 0) AS BIGINT) AS conductance_bp
        FROM per p CROSS JOIN tot t
    """


@query(
    "graph_community_conductance",
    oracle=_community_conductance_sql("duck"),
)
def q_graph_community_conductance(spark, sf_dir):
    """COMMUNITY CONDUCTANCE over the label-propagation partition
    (#148): per community the internal edges, CUT edges, volume and
    conductance cut/min(vol, vol_rest) in bp — the boundary-quality
    measure the profile table (#187: sizes, degrees, triangles) and
    global modularity (#278) don't expose per community: a low-
    conductance community is a real cluster, a high-conductance one
    is an LPA artifact bleeding into its neighbors. Standard
    community-eval battery member (Leskovec's NCP plots are exactly
    this number vs size).

    Scale: undirected dedup of the node x K edge list, two
    label-join aggregates, community-bounded output; the LPA labels
    compose as a CTE (duck) / a _gate_map-materialized view (Spark,
    r5 verdict item 6: the LPA run and the KNN edge list are built
    once per session, not rebuilt inside every composition)."""
    ensure_utc(spark)
    load_table(spark, sf_dir, "embeddings").createOrReplaceTempView(
        "embeddings"
    )
    _gate_map(
        spark, sf_dir, "graph_lp_labels",
        lambda: QUERIES["graph_label_prop_knn"](spark, sf_dir),
    ).createOrReplaceTempView("cond_lp_mat")
    _graph_edges_map(spark, sf_dir).createOrReplaceTempView("cond_kg_mat")
    return spark.sql(_community_conductance_sql("spark"))


# ---------------------------------------------------------------------------
# R14: anomaly-detector agreement census (SURVEY §2 #482)
# ---------------------------------------------------------------------------


def _anomaly_agreement_sql(dialect: str) -> str:
    div = "div" if dialect == "spark" else "//"
    us = "unix_micros" if dialect == "spark" else "epoch_us"
    if dialect == "spark":
        mad = "SELECT day, is_anomaly FROM mad"
        ewma = "SELECT day_idx, anomaly FROM ewma"
        cusum = "SELECT changepoint_day FROM cusum"
    else:
        mad = ORACLES["events_daily_anomaly_mad"]
        ewma = ORACLES["events_ewma_control_chart"]
        cusum = ORACLES["events_cusum_changepoints"]
    return f"""
        WITH madq AS ({mad})
        , ewmaq AS ({ewma})
        , cusumq AS ({cusum})
        , d0 AS (
            SELECT MIN({us}(ts)) {div} 86400000000 AS day0 FROM events)
        , days AS (
            SELECT m.day,
                   {us}(m.day) {div} 86400000000 AS eday,
                   CAST(m.is_anomaly AS BIGINT) AS mad_flag
            FROM madq m)
        , joined AS (
            SELECT d.day, d.eday, d.mad_flag,
                   CAST(COALESCE(e.anomaly, 0) AS BIGINT) AS ewma_flag
            FROM days d
            CROSS JOIN d0
            LEFT JOIN ewmaq e ON e.day_idx = d.eday - d0.day0)
        , flagged AS (
            SELECT j.day, j.mad_flag, j.ewma_flag,
                   CAST(CASE WHEN EXISTS (
                            SELECT 1 FROM cusumq c
                            WHERE j.eday >= c.changepoint_day - 1
                              AND j.eday <= c.changepoint_day + 1)
                        THEN 1 ELSE 0 END AS BIGINT)
                       AS near_changepoint
            FROM joined j)
        SELECT mad_flag, ewma_flag, near_changepoint,
               CAST(COUNT(*) AS BIGINT) AS n_days
        FROM flagged
        GROUP BY mad_flag, ewma_flag, near_changepoint
    """


@query(
    "events_anomaly_method_agreement",
    oracle=_anomaly_agreement_sql("duck"),
)
def q_events_anomaly_method_agreement(spark, sf_dir):
    """ANOMALY-DETECTOR ENSEMBLE agreement (the #271 dedup-agreement
    discipline applied to the monitoring battery): every day flagged
    by the MAD detector (#244), the EWMA control chart (#433), and
    proximity (+-1 day) to any per-type CUSUM changepoint (#206),
    rolled into a 2^3 flag census — days all three mark are
    incidents, single-detector days show each method's
    characteristic blind spot (MAD: one-day spikes; EWMA: sustained
    small shifts; CUSUM: level changes). The composition runs the
    REGISTERED queries (temp views on Spark, their own oracle SQL as
    CTEs in DuckDB), so the census cannot drift from the detectors
    it summarizes.

    Scale: three day-grain-bounded component queries + a
    |days|-bounded join; the EXISTS probes a |types|-row table. The
    three detector results are _gate_map-materialized once per
    session (r5 verdict item 6) — day-grain-bounded maps, the
    monitoring analog of the keep-list gates."""
    ensure_utc(spark)
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    _gate_map(
        spark, sf_dir, "mon_mad",
        lambda: QUERIES["events_daily_anomaly_mad"](spark, sf_dir),
    ).createOrReplaceTempView("mad")
    _gate_map(
        spark, sf_dir, "mon_ewma",
        lambda: QUERIES["events_ewma_control_chart"](spark, sf_dir),
    ).createOrReplaceTempView("ewma")
    _gate_map(
        spark, sf_dir, "mon_cusum",
        lambda: QUERIES["events_cusum_changepoints"](spark, sf_dir),
    ).createOrReplaceTempView("cusum")
    return spark.sql(_anomaly_agreement_sql("spark"))


# ---------------------------------------------------------------------------
# R14: key resurrection stats, split-shipment census (SURVEY §2 #483-484)
# ---------------------------------------------------------------------------


def _key_resurrection_sql(dialect: str) -> str:
    div = "div" if dialect == "spark" else "//"
    us = "unix_micros" if dialect == "spark" else "epoch_us"
    return _with_log(
        f"""
        , ordered AS (
            SELECT key_id, ts, operation,
                   lag(operation) OVER w AS prev_op,
                   lag(ts) OVER w AS prev_ts
            FROM log
            WINDOW w AS (PARTITION BY key_id ORDER BY ts ASC, seq ASC))
        , res AS (
            SELECT key_id,
                   ({us}(ts) - {us}(prev_ts)) {div} 1000000
                       AS gap_seconds
            FROM ordered
            WHERE operation <> 'DELETE' AND prev_op = 'DELETE')
        , keys AS (SELECT CAST(COUNT(DISTINCT key_id) AS BIGINT) AS nk
                   FROM log)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_resurrections,
               CAST(COUNT(DISTINCT r.key_id) AS BIGINT)
                   AS n_keys_resurrected,
               CAST((10000 * COUNT(DISTINCT r.key_id)) {div} k.nk
                    AS BIGINT) AS resurrected_key_share_bp,
               CAST(MIN(r.gap_seconds) AS BIGINT) AS min_gap_seconds,
               CAST(SUM(r.gap_seconds) {div} COUNT(*) AS BIGINT)
                   AS mean_gap_seconds,
               CAST(MAX(r.gap_seconds) AS BIGINT) AS max_gap_seconds
        FROM res r CROSS JOIN keys k
        GROUP BY k.nk
    """
    )


@query("cdc_key_resurrection", oracle=_key_resurrection_sql("duck"))
def q_cdc_key_resurrection(spark, sf_dir):
    """KEY-RESURRECTION statistics: non-DELETE operations landing on
    a key whose PREVIOUS operation was a DELETE — the event class
    that makes tombstone GC (#150) dangerous: a tombstone collected
    before the resurrection arrives turns the re-insert into a
    phantom update on downstream replicas. Emits the resurrection
    count, affected-key share, and the dead-time gap (min/mean/max
    seconds) — the MINIMUM gap is the hard lower bound any safe
    tombstone-retention policy must exceed, read directly against
    #150's horizon parameter.

    Scale: one key-partitioned lag window + a scalar aggregate;
    gaps are nonnegative so plain floor division is exact."""
    ensure_utc(spark)
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_key_resurrection_sql("spark"))


def _split_shipments_sql(dialect: str) -> str:
    div = "div" if dialect == "spark" else "//"
    return f"""
        WITH per_order AS (
            SELECT o.o_orderkey,
                   CAST(COUNT(*) AS BIGINT) AS n_lines,
                   CAST(COUNT(DISTINCT date_trunc('day', l.l_shipdate))
                        AS BIGINT) AS n_ship_days
            FROM orders o JOIN lineitem l
              ON l.l_orderkey = o.o_orderkey
            GROUP BY o.o_orderkey)
        , tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM per_order)
        SELECT p.n_ship_days,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(p.n_lines) AS BIGINT) AS n_lines,
               CAST((10000 * COUNT(*)) {div} t.n AS BIGINT)
                   AS order_share_bp,
               CAST((100 * SUM(p.n_lines)) {div} COUNT(*) AS BIGINT)
                   AS mean_lines_centi
        FROM per_order p CROSS JOIN tot t
        GROUP BY p.n_ship_days, t.n
    """


@query("orders_split_shipments", oracle=_split_shipments_sql("duck"))
def q_orders_split_shipments(spark, sf_dir):
    """SPLIT-SHIPMENT census: orders histogrammed by the number of
    DISTINCT days their lines ship on — the fulfillment-
    fragmentation view: one-day orders ship consolidated, multi-day
    orders pay per-shipment cost and drive the SLA tail (#447 meets
    its worst cases here) and the critical-path supplier effect
    (#427 — more ship days, more chances one supplier gates the
    order). Mean lines per bucket separates 'big order, naturally
    split' from 'small order, needlessly split'.

    Scale: one order-keyed join-aggregate (distinct-day reduction),
    |ship-day-count|-bounded census."""
    ensure_utc(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "lineitem"
    )
    return spark.sql(_split_shipments_sql("spark"))


# ---------------------------------------------------------------------------
# R14: sampled distance summary (SURVEY §2 #485)
# ---------------------------------------------------------------------------


def _distance_summary_sql(dialect: str) -> str:
    div = "div" if dialect == "spark" else "//"
    if dialect == "spark":
        layers = "SELECT layer, n_nodes FROM reach_layers"
    else:
        layers = ORACLES["graph_seed_reach_layers"]
    return f"""
        WITH layersq AS ({layers})
        , reached AS (
            SELECT layer, n_nodes FROM layersq WHERE layer >= 0)
        , tot AS (
            SELECT CAST(SUM(n_nodes) AS BIGINT) AS n_reached,
                   CAST(SUM(layer * n_nodes) AS BIGINT) AS dist_mass
            FROM reached)
        , unreached AS (
            SELECT CAST(COALESCE(SUM(n_nodes), 0) AS BIGINT) AS n_un
            FROM layersq WHERE layer < 0)
        , cum AS (
            SELECT layer,
                   CAST(SUM(n_nodes) OVER (
                        ORDER BY layer ASC
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c
            FROM reached)
        , eff AS (
            SELECT CAST(MIN(layer) AS BIGINT) AS eff_diameter_90
            FROM cum CROSS JOIN tot t
            WHERE 10 * c >= 9 * t.n_reached)
        SELECT t.n_reached, u.n_un AS n_unreached,
               CAST((10000 * t.n_reached)
                    {div} (t.n_reached + u.n_un) AS BIGINT)
                   AS reach_share_bp,
               CAST((100 * t.dist_mass) {div} t.n_reached AS BIGINT)
                   AS mean_distance_centi,
               e.eff_diameter_90
        FROM tot t CROSS JOIN unreached u CROSS JOIN eff e
    """


@query("graph_distance_summary", oracle=_distance_summary_sql("duck"))
def q_graph_distance_summary(spark, sf_dir):
    """SAMPLED-BFS distance summary over the KNN graph: mean
    hop-distance from the seed set (centi), the reach share (the
    unreached mass is the disconnected periphery), and the
    EFFECTIVE DIAMETER (90th-percentile reached layer — Leskovec's
    small-world statistic) — the three scalars the per-layer reach
    table (#300) carries implicitly, rolled up for dashboards and
    round-over-round comparison. Composes the registered BFS
    (its own Pregel loop) as a CTE/view; the summary is
    |layers|-bounded.

    Scale: everything after #300's own bounded rounds runs on a
    handful of layer rows."""
    ensure_utc(spark)
    load_table(spark, sf_dir, "embeddings").createOrReplaceTempView(
        "embeddings"
    )
    QUERIES["graph_seed_reach_layers"](spark, sf_dir)\
        .createOrReplaceTempView("reach_layers")
    return spark.sql(_distance_summary_sql("spark"))


# ---------------------------------------------------------------------------
# R14: cadence-break churn risk census (SURVEY §2 #486)
# ---------------------------------------------------------------------------

_CADENCE_MIN_DAYS = 5  # users with >= 5 distinct active days


def _cadence_break_sql(dialect: str) -> str:
    div = "div" if dialect == "spark" else "//"
    us = "unix_micros" if dialect == "spark" else "epoch_us"
    return f"""
        WITH days AS (
            SELECT DISTINCT user_id,
                   {us}(ts) {div} 86400000000 AS d
            FROM events)
        , horizon AS (SELECT MAX(d) AS dmax FROM days)
        , gaps AS (
            SELECT user_id, d,
                   d - lag(d) OVER (
                       PARTITION BY user_id ORDER BY d ASC) AS gap
            FROM days)
        , per_user AS (
            SELECT user_id,
                   CAST(COUNT(*) AS BIGINT) AS n_days,
                   CAST(MAX(d) AS BIGINT) AS last_d
            FROM gaps GROUP BY user_id
            HAVING COUNT(*) >= {_CADENCE_MIN_DAYS})
        , ranked AS (
            SELECT user_id, gap,
                   row_number() OVER (
                       PARTITION BY user_id ORDER BY gap ASC) AS rn,
                   COUNT(*) OVER (PARTITION BY user_id) AS ng
            FROM gaps WHERE gap IS NOT NULL)
        , med AS (
            SELECT user_id, CAST(MAX(gap) AS BIGINT) AS median_gap
            FROM ranked WHERE rn = (ng + 1) {div} 2
            GROUP BY user_id)
        , scored AS (
            SELECT p.user_id,
                   h.dmax - p.last_d AS silence,
                   m.median_gap
            FROM per_user p
            JOIN med m ON m.user_id = p.user_id
            CROSS JOIN horizon h)
        , bucketed AS (
            SELECT CASE WHEN silence < 2 * median_gap THEN 'on_cadence'
                        WHEN silence < 4 * median_gap THEN 'lapsing'
                        ELSE 'at_risk' END AS risk_bucket
            FROM scored)
        , tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM bucketed)
        SELECT risk_bucket,
               CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST((10000 * COUNT(*)) {div} t.n AS BIGINT) AS share_bp
        FROM bucketed CROSS JOIN tot t
        GROUP BY risk_bucket, t.n
    """


@query("events_cadence_break", oracle=_cadence_break_sql("duck"))
def q_events_cadence_break(spark, sf_dir):
    """CADENCE-BREAK churn risk: each regular user (>= {m} distinct
    active days) is compared against their OWN rhythm — the lower
    median of their inter-active-day gaps — and bucketed by how long
    their current silence (last activity -> corpus horizon) has run
    against it: under 2x = on cadence, 2-4x = lapsing, 4x+ = at
    risk. The personalized-baseline view the population-level
    retention curves (#195/#291) and intersession gaps (#184)
    average away: a weekly user silent for 10 days is fine, a
    3-times-daily user silent for 2 days is churning.

    Scale: distinct (user, day) reduction, user-partitioned lag and
    median-rank windows (each user's window sees only their own
    days), 3-row census."""
    ensure_utc(spark)
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_cadence_break_sql("spark"))


# ---------------------------------------------------------------------------
# R15: bigram LM surprisal quality filter (SURVEY §2 #487)
# ---------------------------------------------------------------------------


def _lm_surprisal_sql(dialect: str) -> str:
    """Dual-dialect whole-bit bigram surprisal. The transcendental
    log is the cross-engine hazard here (last-ulp ln() differences
    would hash-mismatch), so surprisal is quantized to WHOLE BITS
    with an integer-exact identity: for integers c_ctx >= c >= 1,
    floor(log2(c_ctx / c)) = LENGTH(bin(c_ctx div c)) - 1
    (proof: q = c_ctx div c satisfies 2^(bitlen(q)-1) <= q <=
    c_ctx/c < q + 1 <= 2^bitlen(q)) — both engines drop leading
    zeros in bin(), so the bit count is the same BIGINT."""
    div = "div" if dialect == "spark" else "//"
    if dialect == "spark":
        toks = "split(text, ' ')"
        bgx = (
            "explode(transform(sequence(1, size(t) - 1), "
            "i -> concat(element_at(t, i), ' ', element_at(t, i + 1))))"
        )
        sz = "size(t)"
    else:
        toks = "string_split(text, ' ')"
        bgx = (
            "unnest(list_transform(range(1, len(t)), "
            "i -> array_to_string(t[i:i+1], ' ')))"
        )
        sz = "len(t)"
    return f"""
        WITH toks AS (SELECT doc_id, {toks} AS t FROM documents)
        , bg AS (
            SELECT doc_id,
                   split_part(bigram, ' ', 1) AS w1,
                   split_part(bigram, ' ', 2) AS w2
            FROM (SELECT doc_id, {bgx} AS bigram FROM toks
                  WHERE {sz} >= 2) e)
        , bgc AS (
            SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c
            FROM bg GROUP BY w1, w2)
        , ctx AS (
            SELECT w1, CAST(SUM(c) AS BIGINT) AS c_ctx
            FROM bgc GROUP BY w1)
        , scored AS (
            SELECT b.doc_id,
                   CAST(LENGTH(bin(x.c_ctx {div} m.c)) - 1
                        AS BIGINT) AS bits
            FROM bg b
            JOIN bgc m ON m.w1 = b.w1 AND m.w2 = b.w2
            JOIN ctx x ON x.w1 = b.w1)
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               CAST(SUM(bits) AS BIGINT) AS surprisal_bits,
               CAST((100 * SUM(bits)) {div} COUNT(*) AS BIGINT)
                   AS mean_centibits
        FROM scored GROUP BY doc_id
    """


@query("text_lm_surprisal", oracle=_lm_surprisal_sql("duck"))
def q_text_lm_surprisal(spark, sf_dir):
    """BIGRAM-LM SURPRISAL quality score per document — the
    perplexity-filter paradigm (CCNet/KenLM: score each doc under a
    corpus LM; unusually-high-perplexity docs are noise, unusually-
    low are boilerplate) the quality battery (#61 heuristics, #167
    familiarity, #257 classifier) lacked: per-token surprisal under
    the corpus's OWN bigram MLE p(w2|w1) = c(w1,w2)/c(w1,·) —
    self-scoring, so every doc bigram is observed and p > 0 without
    smoothing. Surprisal is quantized to WHOLE BITS via the
    integer-exact floor(log2) identity (see _lm_surprisal_sql:
    transcendental ln differs by last-ulp across engines and would
    break the hash gate; whole bits are engine-identical BIGINTs).
    Emits per doc the bigram count, total bits, and mean
    centibits-per-token — the score a curation pass bands (keep the
    middle, CCNet-style, via #190-style threshold sweeps).

    Scale: one corpus explode; counts + context totals are
    vocabulary-bounded aggregates (map-side combined, broadcastable
    to the scoring join); the scoring join shuffles the bigram
    stream on word keys — linear, no windows, no driver actions.
    Python recompute law in tests/test_round15.py."""
    ensure_utc(spark)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents"
    )
    return spark.sql(_lm_surprisal_sql("spark"))


# ---------------------------------------------------------------------------
# R16: deterministic quantile-summary sketch (Munro-Paterson halving)
# ---------------------------------------------------------------------------

_MRL_K = 128
_MRL_LEVELS = 12
_MRL_PCTS = (50, 90, 99)


def _mrl_sketch_sql(dialect: str) -> str:
    """Dual-dialect unrolled halving cascade. Every level is a
    window PARTITIONED BY event_type (one exchange, Catalyst reuses
    the partitioning across all {L} levels; per-partition sorts,
    never a global sort). Determinism: the within-type total order
    is (value_cents, event_id) with event_id unique, so both
    engines rank identically and the surviving set is
    engine-independent — the oracle is an exact hash match."""
    div = "div" if dialect == "spark" else "//"
    sql = f"""
        WITH w0 AS (
            SELECT event_type,
                   CAST(ROUND(value * 100) AS BIGINT) AS v,
                   CAST(1 AS BIGINT) AS w,
                   CAST(event_id AS BIGINT) AS id
            FROM events WHERE value IS NOT NULL)"""
    for lv in range(1, _MRL_LEVELS + 1):
        sql += f"""
        , r{lv} AS (
            SELECT event_type, v, w, id,
                   row_number() OVER (
                       PARTITION BY event_type
                       ORDER BY v ASC, id ASC) AS rnk,
                   COUNT(*) OVER (PARTITION BY event_type) AS cnt
            FROM w{lv - 1})
        , w{lv} AS (
            SELECT event_type, v,
                   CASE WHEN cnt > {_MRL_K} THEN w * 2 ELSE w END AS w,
                   id
            FROM r{lv}
            WHERE cnt <= {_MRL_K} OR rnk % 2 = 1)"""
    pct_rows = ", ".join(f"({p})" for p in _MRL_PCTS)
    pct_cols = ",\n               ".join(
        f"MAX(CASE WHEN q = {p} THEN v END) AS p{p}_cents"
        for p in _MRL_PCTS
    )
    return sql + f"""
        , sk AS (
            SELECT event_type, v, w,
                   row_number() OVER (
                       PARTITION BY event_type
                       ORDER BY v ASC, id ASC) AS rnk,
                   COUNT(*) OVER (PARTITION BY event_type) AS m
            FROM w{_MRL_LEVELS})
        , exact_n AS (
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_items
            FROM events WHERE value IS NOT NULL GROUP BY event_type)
        , picks AS (
            SELECT s.event_type, g.q, s.v, s.w, s.m
            FROM sk s
            JOIN (VALUES {pct_rows}) AS g(q)
              ON s.rnk = GREATEST(CAST(1 AS BIGINT),
                                  (g.q * s.m + 99) {div} 100))
        SELECT p.event_type,
               e.n_items,
               CAST(MAX(p.m) AS BIGINT) AS n_survivors,
               CAST(MAX(p.w) AS BIGINT) AS item_weight,
               {pct_cols}
        FROM picks p
        JOIN exact_n e ON e.event_type = p.event_type
        GROUP BY p.event_type, e.n_items
    """


@query("events_mrl_quantile_sketch", oracle=_mrl_sketch_sql("duck"))
def q_events_mrl_quantile_sketch(spark, sf_dir):
    """DETERMINISTIC QUANTILE-SUMMARY SKETCH — the Munro-Paterson
    rank-halving cascade (Munro & Paterson 1980; the collapse
    primitive inside MRL98 and the randomized KLL16): per event
    type, while the summary exceeds capacity k={k}, sort-rank it
    and keep the odd ranks with doubled weight. After c halvings
    the survivors are a uniform-weight (2^c) summary of <= k items
    whose rank error for ANY quantile is bounded by the item
    weight — n/k relative error, the glass-box mergeable state the
    black-box approx_percentile (#90) hides and the fixed-bin
    histogram (#365) can only approximate on skewed domains (its
    bins are value-space; this adapts to rank space). The quantile
    member of the explicit-state sketch family (#156 HLL registers,
    #114 count-min, #343 theta, #361 AMS, #406 KMV): state is
    (type, value, weight) rows, mergeable by concat + re-halve.
    Emits per type the exact count, survivor count, item weight
    (2^c), and the p50/p90/p99 estimates read at survivor rank
    ceil(q*m/100) — all BIGINT cents, engine-exact (the total order
    (value_cents, event_id) is unique, so both engines keep the
    same survivors; no float or RNG surface anywhere).

    Scale: {L} unrolled levels, all windows partitioned by
    event_type — ONE shuffle reused across every level (AQE sees
    identical partitioning), per-partition sorts only, each level
    at most half the previous level's rows past capacity. At 100 TB
    the same cascade runs per partition and merges: halving is
    associative over concatenation with one extra halving, the
    property the mergeability law pins. Rank-error + exactness-
    below-capacity laws in tests/test_round16.py.""".replace(
        "{k}", str(_MRL_K)
    ).replace("{L}", str(_MRL_LEVELS))
    ensure_utc(spark)
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_mrl_sketch_sql("spark"))


# ---------------------------------------------------------------------------
# R16: node2vec biased second-order walks over the KNN graph
# ---------------------------------------------------------------------------

_N2V_STEPS = 6
# integer bias weights ∝ (1/p, 1, 1/q) with p=4, q=1/4 — the
# exploratory (DFS-leaning) regime: revisiting the previous node
# weighs 1, a triadic-closure step (neighbor shared with prev) 4,
# an outward step 16.
_N2V_BACK, _N2V_COMMON, _N2V_FWD = 1, 4, 16


def _n2v_pick(step: int, dialect: str) -> str:
    expr = "start_id", "prev", "node"
    if dialect == "spark":
        cat = " , ':', ".join(f"CAST({c} AS STRING)" for c in expr)
        return (
            f"CAST(conv(substring(md5(concat({cat}, ':{step}')),"
            " 1, 8), 16, 10) AS BIGINT)"
        )
    cat = " || ':' || ".join(f"CAST({c} AS VARCHAR)" for c in expr)
    return (
        f"CAST('0x' || substr(md5({cat} || ':{step}'),"
        " 1, 8) AS BIGINT)"
    )


def _node2vec_oracle_sql() -> str:
    knn = _sim.graph_edges_sql("duck")
    sql = f"""
        WITH knn AS MATERIALIZED ({knn})
        , w0 AS (SELECT vec_id AS start_id, vec_id AS prev,
                        vec_id AS node
                 FROM embeddings)"""
    for s in range(1, _N2V_STEPS + 1):
        sql += f"""
        , c{s} AS MATERIALIZED (
            SELECT w.start_id, w.prev, w.node,
                   k.neighbor_id AS nb, k.nn_rank,
                   CAST(CASE WHEN k.neighbor_id = w.prev
                             THEN {_N2V_BACK}
                             WHEN pe.vec_id IS NOT NULL
                             THEN {_N2V_COMMON}
                             ELSE {_N2V_FWD} END AS BIGINT) AS wt
            FROM w{s - 1} w
            JOIN knn k ON k.vec_id = w.node
            LEFT JOIN knn pe ON pe.vec_id = w.prev
                            AND pe.neighbor_id = k.neighbor_id)
        , s{s} AS MATERIALIZED (
            SELECT start_id, prev, node, nb, wt,
                   CAST(SUM(wt) OVER (
                       PARTITION BY start_id
                       ORDER BY nn_rank ASC) AS BIGINT) AS cw,
                   CAST(SUM(wt) OVER (
                       PARTITION BY start_id) AS BIGINT) AS tot
            FROM c{s})
        , w{s} AS MATERIALIZED (
            SELECT start_id, node AS prev, nb AS node
            FROM s{s}
            WHERE ({_n2v_pick(s, 'duck')} % tot) >= cw - wt
              AND ({_n2v_pick(s, 'duck')} % tot) < cw)"""
    arms = " UNION ALL ".join(
        f"SELECT start_id, CAST({s} AS BIGINT) AS step,"
        f" CAST(node AS BIGINT) AS node_id FROM w{s}"
        for s in range(_N2V_STEPS + 1)
    )
    return sql + "\n        " + arms


@query("graph_node2vec_corpus", oracle=_node2vec_oracle_sql())
def q_graph_node2vec_corpus(spark, sf_dir):
    """NODE2VEC corpus generation (Grover & Leskovec 2016): one
    deterministic {L}-step SECOND-ORDER biased walk from every
    vector over the KNN graph — the return/in-out generalization of
    DeepWalk (#417, whose walks are first-order): the step out of
    node v remembers the previous node t and weighs each neighbor x
    by the integer triple (back x=t: {b}, triadic x∈N(t): {c},
    outward: {f}) ∝ (1/p, 1, 1/q) at p=4, q=1/4 — the DFS-leaning
    regime that explores community boundaries, which is where
    near-dup clusters bleed into each other. The pick is the
    hash-seeded point md5(start,prev,node,step) mod Σwt inside the
    nn_rank-ordered cumulative-weight intervals — RNG-free,
    engine-identical, restart-reproducible. Walks start with
    prev=self, making step 1 uniform (every candidate is trivially
    a neighbor of prev=node), and end at zero-degree nodes.

    Scale: the Pregel discipline — the KNN edge list comes from the
    SHARED `graph_knn_edges` gate map (one build per session,
    deg≤K edges per node), each of the {L} rounds is one bounded
    equi-join + one left membership probe + a walk-partitioned
    cumulative window (≤K candidate rows per walk), frontier
    localCheckpointed (constant plan depth). The DuckDB oracle is
    the unrolled MATERIALIZED-round twin. Python recompute law in
    tests/test_round16.py.""".replace("{L}", str(_N2V_STEPS)).replace(
        "{b}", str(_N2V_BACK)
    ).replace("{c}", str(_N2V_COMMON)).replace("{f}", str(_N2V_FWD))
    from pyspark.sql import Window

    ensure_utc(spark)
    load_table(spark, sf_dir, "embeddings").createOrReplaceTempView(
        "embeddings"
    )
    kg = _graph_edges_map(spark, sf_dir)
    e = kg.select(
        F.col("vec_id").alias("edge_vid"), "neighbor_id", "nn_rank"
    )
    pe = kg.select(
        F.col("vec_id").alias("pe_src"),
        F.col("neighbor_id").alias("pe_dst"),
    )
    cur = (
        load_table(spark, sf_dir, "embeddings")
        .select(
            F.col("vec_id").alias("start_id"),
            F.col("vec_id").alias("prev"),
            F.col("vec_id").alias("node"),
        )
        .localCheckpoint()
    )
    frontiers = [cur]
    wo = Window.partitionBy("start_id").orderBy(F.col("nn_rank").asc())
    wa = Window.partitionBy("start_id")
    for s in range(1, _N2V_STEPS + 1):
        cand = (
            cur.join(e, F.col("edge_vid") == F.col("node"))
            .join(
                pe,
                (F.col("pe_src") == F.col("prev"))
                & (F.col("pe_dst") == F.col("neighbor_id")),
                "left",
            )
            .withColumn(
                "wt",
                F.when(
                    F.col("neighbor_id") == F.col("prev"),
                    F.lit(_N2V_BACK),
                )
                .when(F.col("pe_src").isNotNull(), F.lit(_N2V_COMMON))
                .otherwise(F.lit(_N2V_FWD))
                .cast("long"),
            )
        )
        scored = cand.withColumn(
            "cw", F.sum("wt").over(wo).cast("long")
        ).withColumn("tot", F.sum("wt").over(wa).cast("long"))
        pick = F.expr(_n2v_pick(s, "spark")) % F.col("tot")
        cur = (
            scored.where(
                (pick >= F.col("cw") - F.col("wt"))
                & (pick < F.col("cw"))
            )
            .select(
                "start_id",
                F.col("node").alias("prev"),
                F.col("neighbor_id").alias("node"),
            )
            .localCheckpoint()
        )
        frontiers.append(cur)
    from functools import reduce as _reduce

    return _reduce(
        lambda a, b: a.unionByName(b),
        [
            f.select(
                "start_id",
                F.lit(s).cast("long").alias("step"),
                F.col("node").cast("long").alias("node_id"),
            )
            for s, f in enumerate(frontiers)
        ],
    )


# ---------------------------------------------------------------------------
# R16: top-k rank-view incremental maintenance
# ---------------------------------------------------------------------------

_TOPK_IVM_K = 3
_TOPK_IVM_SPLIT = "2024-01-24 00:00:00"


def _topk_rank_view(state: DataFrame) -> DataFrame:
    """Top-K live keys per event_type by current value (exact cents,
    key_id tie-break) — the rank view being maintained."""
    from pyspark.sql import Window

    w = Window.partitionBy("event_type").orderBy(
        F.expr("CAST(ROUND(value * 100) AS BIGINT)").desc(),
        F.col("key_id").asc(),
    )
    return (
        state.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= _TOPK_IVM_K)
        .select(
            "event_type",
            "rnk",
            "key_id",
            F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias(
                "value_cents"
            ),
        )
    )


def _topk_view_ivm(
    log: DataFrame, split_str: str, probe: dict | None = None
) -> DataFrame:
    """Incrementally maintain the top-K-per-group rank view: the
    materialized old half (state + view) absorbs the new half's net
    deltas; only AFFECTED groups re-rank, every other group's view
    rows are copied forward verbatim. Affected = groups that lost a
    member (old type of any changed key — covers DELETE and
    type-migration departures) ∪ groups that gained one (non-DELETE
    net-delta types). Deletion REFILL — the case that makes rank
    views harder than the aggregates of #117 (a departed top-row
    pulls rank K+1 into view, which no view-only state can supply)
    — is exact here because the affected group re-ranks from the
    merged STATE (key-bounded), never from the replayed log."""
    split = F.to_timestamp(F.lit(split_str))
    state1 = cdc_apply.latest_state(
        log.where(F.col("ts") <= split)
    ).localCheckpoint()
    view1 = _topk_rank_view(state1).localCheckpoint()
    net2 = cdc_apply.net_changes(
        log.where(F.col("ts") > split)
    ).localCheckpoint()
    merged = cdc_apply.upsert_merge(state1, net2)
    changed_keys = net2.select("key_id").distinct()
    affected = (
        state1.join(changed_keys, "key_id")
        .select("event_type")
        .unionByName(
            net2.where(F.col("operation") != "DELETE").select(
                "event_type"
            )
        )
        .distinct()
        .localCheckpoint()
    )
    if probe is not None:
        probe["affected"] = sorted(
            r["event_type"] for r in affected.collect()
        )
    copied = view1.join(
        F.broadcast(affected), "event_type", "left_anti"
    )
    recomputed = _topk_rank_view(
        merged.join(F.broadcast(affected), "event_type")
    )
    return copied.unionByName(
        recomputed.select(
            "event_type", "rnk", "key_id", "value_cents"
        )
    )


@query(
    "cdc_topk_view_ivm",
    oracle=_with_log(
        f"""
        , ranked AS (
            SELECT *, row_number() OVER (
                PARTITION BY key_id ORDER BY ts DESC, seq DESC) AS rn
            FROM log)
        , cur AS (
            SELECT key_id, event_type,
                   CAST(ROUND(value * 100) AS BIGINT) AS cents
            FROM ranked WHERE rn = 1 AND operation <> 'DELETE')
        , rk AS (
            SELECT event_type, key_id, cents,
                   row_number() OVER (
                       PARTITION BY event_type
                       ORDER BY cents DESC, key_id ASC) AS rnk
            FROM cur)
        SELECT event_type, CAST(rnk AS BIGINT) AS rnk, key_id,
               cents AS value_cents
        FROM rk WHERE rnk <= {_TOPK_IVM_K}
        """
    ),
)
def q_cdc_topk_view_ivm(spark, sf_dir):
    """TOP-K RANK-VIEW INCREMENTAL MAINTENANCE — the IVM class the
    existing incremental surfaces skip: #108 maintains a keyed
    STATE, #117 an additive AGGREGATE (retract/insert algebra), but
    a top-K-per-group leaderboard is neither — a DELETE of a
    top-row needs rank K+1 pulled in from OUTSIDE the view
    (deletion refill), the canonical reason rank views are 'hard'
    in the IVM literature (Gupta-Mumick taxonomy: non-distributive
    over deltas). The bounded production strategy implemented here:
    materialize old state + old view, net the new half's deltas,
    derive the AFFECTED groups (lost a member: old type of any
    changed key; gained one: non-DELETE delta types — the exact
    delta-group taxonomy, type migration hits both sides), re-rank
    only those groups from the MERGED KEY-BOUNDED STATE, copy every
    other group's view rows forward untouched. The old log is never
    re-scanned; the oracle is the from-scratch top-K, so the gate
    proves copy ∪ re-rank ≡ recompute(all).

    Scale: the delta scan is the only read past the split; the
    merge is one key-shuffle full-outer join of two key-bounded
    states (#108's shape); affected-group set is bounded by the
    group vocabulary and broadcast; re-ranking shuffles only the
    affected slice. Crafted-log refill/copy-forward laws in
    tests/test_round16.py."""
    ensure_utc(spark)
    return _topk_view_ivm(
        cdc_operation_log(spark, sf_dir), _TOPK_IVM_SPLIT
    )


# ---------------------------------------------------------------------------
# R16: interpolated Kneser-Ney surprisal over a train/held-out split
# ---------------------------------------------------------------------------


def _kn_surprisal_sql(dialect: str) -> str:
    """Interpolated-KN bigram surprisal in EXACT RATIONAL algebra,
    quantized to whole bits (the #487 floor(log2)=bitlen(div)-1
    identity). With D = dn/dd (Ney-Essen-Kneser, dn=n1,
    dd=n1+2*n2 < 1) and the +1-smoothed continuation
    P'cont(w2) = (N1+(.w2)+1)/(NT+V):

      seen bigram:  num = (c*dd - dn)*(NT+V) + dn*R*(ncont+1)
                    den = c1*dd*(NT+V)
      unseen, seen context:  num = dn*R*(ncont+1), same den
      unseen context:        num = ncont+1, den = NT+V

    P <= 1 in every branch so den >= num and
    bits = bitlen(den div num) - 1 is engine-identical BIGINT.
    Magnitudes: den <= c1*dd*(NT+V) ~ 1e16 at sf0.1 — BIGINT-safe;
    at production scale the discount moves to a fixed e6 literal
    and den drops two factors."""
    div = "div" if dialect == "spark" else "//"
    if dialect == "spark":
        toks = "split(text, ' ')"
        bgx = (
            "explode(transform(sequence(1, size(t) - 1), "
            "i -> concat(element_at(t, i), ' ', element_at(t, i + 1))))"
        )
        uni = "explode(t)"
        sz = "size(t)"
    else:
        toks = "string_split(text, ' ')"
        bgx = (
            "unnest(list_transform(range(1, len(t)), "
            "i -> array_to_string(t[i:i+1], ' ')))"
        )
        uni = "unnest(t)"
        sz = "len(t)"
    return f"""
        WITH toks AS (SELECT doc_id, {toks} AS t FROM documents)
        , train_bg AS (
            SELECT split_part(bigram, ' ', 1) AS w1,
                   split_part(bigram, ' ', 2) AS w2
            FROM (SELECT {bgx} AS bigram FROM toks
                  WHERE doc_id % 4 <> 0 AND {sz} >= 2) e)
        , bgc AS (
            SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c
            FROM train_bg GROUP BY w1, w2)
        , ctx AS (
            SELECT w1, CAST(SUM(c) AS BIGINT) AS c1,
                   CAST(COUNT(*) AS BIGINT) AS r
            FROM bgc GROUP BY w1)
        , cont AS (
            SELECT w2, CAST(COUNT(*) AS BIGINT) AS ncont
            FROM bgc GROUP BY w2)
        , nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_types FROM bgc)
        , voc AS (
            SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS v
            FROM (SELECT {uni} AS w FROM toks
                  WHERE doc_id % 4 <> 0) u)
        , disc AS (
            SELECT CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS dn,
                   CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END)
                        + 2 * SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END)
                        AS BIGINT) AS dd
            FROM bgc)
        , held AS (
            SELECT doc_id,
                   split_part(bigram, ' ', 1) AS w1,
                   split_part(bigram, ' ', 2) AS w2
            FROM (SELECT doc_id, {bgx} AS bigram FROM toks
                  WHERE doc_id % 4 = 0 AND {sz} >= 2) e)
        , scored AS (
            SELECT h.doc_id,
                   CASE WHEN m.c IS NULL AND x.w1 IS NULL THEN 1
                        ELSE 0 END AS oov_ctx,
                   CASE WHEN m.c IS NULL THEN 1 ELSE 0 END AS unseen,
                   CASE
                     WHEN x.w1 IS NULL
                       THEN COALESCE(cn.ncont, 0) + 1
                     WHEN m.c IS NULL
                       THEN d.dn * x.r * (COALESCE(cn.ncont, 0) + 1)
                     ELSE (m.c * d.dd - d.dn) * (t.n_types + vv.v)
                          + d.dn * x.r * (COALESCE(cn.ncont, 0) + 1)
                   END AS num,
                   CASE WHEN x.w1 IS NULL
                        THEN t.n_types + vv.v
                        ELSE x.c1 * d.dd * (t.n_types + vv.v)
                   END AS den
            FROM held h
            LEFT JOIN bgc m ON m.w1 = h.w1 AND m.w2 = h.w2
            LEFT JOIN ctx x ON x.w1 = h.w1
            LEFT JOIN cont cn ON cn.w2 = h.w2
            CROSS JOIN nt t CROSS JOIN voc vv CROSS JOIN disc d)
        , bits AS (
            SELECT doc_id, unseen,
                   CAST(LENGTH(bin(den {div} num)) - 1 AS BIGINT)
                       AS b
            FROM scored)
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               CAST(SUM(unseen) AS BIGINT) AS n_unseen,
               CAST(SUM(b) AS BIGINT) AS surprisal_bits,
               CAST((100 * SUM(b)) {div} COUNT(*) AS BIGINT)
                   AS mean_centibits
        FROM bits GROUP BY doc_id
    """


@query("text_kn_surprisal", oracle=_kn_surprisal_sql("duck"))
def q_text_kn_surprisal(spark, sf_dir):
    """INTERPOLATED KNESER-NEY SURPRISAL on a true train/held-out
    split — the generalizing half of the perplexity-filter pair:
    #487 scores docs under the corpus's own MLE (every bigram seen,
    p>0 by construction), which cannot rank a NEW document whose
    bigrams the model never saw; this trains on doc_id%4!=0,
    scores the held-out quarter, and handles the three KN cases —
    seen bigram (discounted MLE + interpolation), unseen bigram
    under a seen context (backoff mass * continuation), and
    fully-unseen context (+1-smoothed continuation alone) — the
    smoothing machinery whose sufficient statistics #441 tabulates,
    here actually APPLIED as a scorer. All probabilities are exact
    rationals (discount D = n1/(n1+2*n2) kept as a fraction, never
    a float), quantized to whole bits via bitlen(den div num)-1, so
    both engines emit identical BIGINTs. Per held-out doc: bigram
    count, unseen-bigram count (the mass MLE would zero out), total
    bits, mean centibits — the score a curation pass bands.

    Scale: count tables are vocabulary-bounded hash aggregates
    (map-side combined, broadcastable); scoring is the held-out
    bigram stream joined on word keys — linear, no windows. Python
    recompute + live-smoothing laws in tests/test_round16.py."""
    ensure_utc(spark)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents"
    )
    return spark.sql(_kn_surprisal_sql("spark"))


# ---------------------------------------------------------------------------
# R16: SAX symbolization of the per-type daily series
# ---------------------------------------------------------------------------

_SAX_WINDOW = 5  # days per PAA segment
_SAX_SYMBOLS = ("a", "b", "c", "d")  # quartile alphabet


def _sax_symbols_sql(dialect: str) -> str:
    div = "div" if dialect == "spark" else "//"
    return f"""
        WITH daily AS (
            SELECT event_type, date_trunc('day', ts) AS day,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY event_type, date_trunc('day', ts))
        , spine AS (
            SELECT t.event_type, d.day
            FROM (SELECT DISTINCT event_type FROM events) t
            CROSS JOIN (SELECT DISTINCT date_trunc('day', ts) AS day
                        FROM events) d)
        , filled AS (
            SELECT s.event_type, s.day,
                   COALESCE(dl.n, 0) AS n
            FROM spine s
            LEFT JOIN daily dl ON dl.event_type = s.event_type
                              AND dl.day = s.day)
        , seq AS (
            SELECT event_type, day, n,
                   CAST(row_number() OVER (
                       PARTITION BY event_type
                       ORDER BY day ASC) - 1 AS BIGINT) AS pos,
                   CAST(COUNT(*) OVER (
                       PARTITION BY event_type) AS BIGINT) AS len
            FROM filled)
        , brk AS (
            SELECT event_type,
                   MAX(CASE WHEN rnk = (25 * len + 99) {div} 100
                            THEN n END) AS b25,
                   MAX(CASE WHEN rnk = (50 * len + 99) {div} 100
                            THEN n END) AS b50,
                   MAX(CASE WHEN rnk = (75 * len + 99) {div} 100
                            THEN n END) AS b75
            FROM (SELECT event_type, n, len,
                         CAST(row_number() OVER (
                             PARTITION BY event_type
                             ORDER BY n ASC, day ASC) AS BIGINT)
                             AS rnk
                  FROM seq) r
            GROUP BY event_type)
        , paa AS (
            SELECT event_type,
                   pos {div} {_SAX_WINDOW} AS seg,
                   CAST((100 * SUM(n)) {div} COUNT(*) AS BIGINT)
                       AS paa_e2,
                   CAST(COUNT(*) AS BIGINT) AS seg_days
            FROM seq GROUP BY event_type, pos {div} {_SAX_WINDOW})
        SELECT p.event_type, p.seg, p.seg_days, p.paa_e2,
               b.b25 * 100 AS b25_e2,
               b.b50 * 100 AS b50_e2,
               b.b75 * 100 AS b75_e2,
               CASE WHEN p.paa_e2 < b.b25 * 100 THEN 'a'
                    WHEN p.paa_e2 < b.b50 * 100 THEN 'b'
                    WHEN p.paa_e2 < b.b75 * 100 THEN 'c'
                    ELSE 'd' END AS symbol
        FROM paa p
        JOIN brk b ON b.event_type = p.event_type
    """


@query("events_sax_symbols", oracle=_sax_symbols_sql("duck"))
def q_events_sax_symbols(spark, sf_dir):
    """SAX SYMBOLIZATION (Lin/Keogh et al. 2003) of the per-type
    daily event-count series — the symbolic representation motif
    mining, anomaly grammars, and series indexing consume, joining
    the numeric time-series family (STL #268, ACF #275, Haar
    #345/#358, changepoints #206/#244): the zero-filled daily
    series (global observed-day spine) is PAA-averaged over
    {w}-day segments (mean scaled e2, floor-div exact) and
    quantized against the type's OWN EMPIRICAL QUARTILES (rank
    ceil(q*len) order statistics of its daily counts) into the
    4-letter alphabet a<b<c<d. Classic SAX z-normalizes and uses
    Gaussian breakpoints — transcendental and float-fragile across
    engines; rank-based breakpoints are the standard equi-depth
    variant and make every emitted number a BIGINT both engines
    agree on bit-for-bit. Per (type, segment): segment day count,
    PAA value, the three breakpoints, and the symbol.

    Scale: one (type, day) hash aggregate over the corpus, a
    |types|x|days| bounded spine, two windows partitioned by
    event_type (the #488 shared-partitioning shape), a
    types-bounded breakpoint table broadcast back. Python recompute
    law in tests/test_round16.py."""
    ensure_utc(spark)
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_sax_symbols_sql("spark"))


# ---------------------------------------------------------------------------
# R16: macro-averaged multi-query retrieval evaluation across ANN arms
# ---------------------------------------------------------------------------


def _mrr_metric_sql(arms_rel: str, dialect: str) -> str:
    """Shared metric body over an `arms` relation of
    (arm, query_id, neighbor_id, nn_rank): label-match relevance,
    per-query first-relevant rank and hit counts, macro-averaged
    ppm metrics per arm — all integer."""
    div = "div" if dialect == "spark" else "//"
    return f"""
        WITH lab AS (SELECT vec_id, label FROM embeddings)
        , arms AS ({arms_rel})
        , hits AS (
            SELECT a.arm, a.query_id, a.nn_rank,
                   CASE WHEN ln.label = lq.label THEN 1 ELSE 0 END
                       AS rel
            FROM arms a
            JOIN lab ln ON ln.vec_id = a.neighbor_id
            JOIN lab lq ON lq.vec_id = a.query_id)
        , per_q AS (
            SELECT arm, query_id,
                   CAST(SUM(rel) AS BIGINT) AS n_rel_at_k,
                   MIN(CASE WHEN rel = 1 THEN nn_rank END)
                       AS first_rel
            FROM hits GROUP BY arm, query_id)
        , nrel AS (
            SELECT q.vec_id AS query_id,
                   CAST(COUNT(*) AS BIGINT) AS n_rel_total
            FROM lab q
            JOIN lab d ON d.label = q.label AND d.vec_id <> q.vec_id
            WHERE q.vec_id < {_sim.N_QUERIES}
            GROUP BY q.vec_id)
        , scored AS (
            SELECT p.arm,
                   CASE WHEN p.first_rel IS NULL THEN 0
                        ELSE 1000000 {div} p.first_rel END AS rr_ppm,
                   (1000000 * p.n_rel_at_k)
                       {div} LEAST({_sim.TOPK}, n.n_rel_total)
                       AS recall_ppm,
                   CASE WHEN p.n_rel_at_k > 0 THEN 1 ELSE 0 END
                       AS hit,
                   p.n_rel_at_k
            FROM per_q p JOIN nrel n ON n.query_id = p.query_id)
        SELECT arm,
               CAST(COUNT(*) AS BIGINT) AS n_queries,
               CAST(SUM(rr_ppm) {div} COUNT(*) AS BIGINT)
                   AS macro_mrr_ppm,
               CAST(SUM(recall_ppm) {div} COUNT(*) AS BIGINT)
                   AS macro_recall_ppm,
               CAST(SUM(hit) AS BIGINT) AS n_hit_queries,
               CAST(SUM(n_rel_at_k) AS BIGINT) AS n_rel_at_k_total
        FROM scored GROUP BY arm
    """


def _mrr_multiquery_oracle() -> str:
    arms = " UNION ALL ".join(
        f"SELECT '{name}' AS arm, query_id, neighbor_id,"
        f" nn_rank FROM ({sql}) {name}_t"
        for name, sql in (
            ("exact", _sim.topk_sql("duck")),
            ("ivf", _sim.ivf_multiprobe_sql("duck")),
            ("sign", _sim.sign_hamming_sql("duck")),
        )
    )
    return _mrr_metric_sql(arms, "duck")


@query("retrieval_mrr_multiquery", oracle=_mrr_multiquery_oracle())
def q_retrieval_mrr_multiquery(spark, sf_dir):
    """MACRO-AVERAGED MULTI-QUERY RETRIEVAL EVALUATION — MRR@5,
    recall@5, hit rate per SERVING ARM (exact cosine, IVF
    multiprobe #52, sign-Hamming rerank #147) against label-match
    relevance, averaged over ALL {q} query vectors. Completes the
    eval ladder: #172 measures index fidelity to exact cosine
    (recall OF the index), #337 end-task ranking for ONE query on
    the hybrid arms; this is the per-paradigm END-TASK macro view —
    the table that says whether the cheap index actually loses
    task quality, query-averaged the way IR evals report (macro,
    not micro). Reciprocal ranks and per-query recalls are
    floor-ppm integers averaged by floor division — engine-exact.

    Scale: each arm is its existing serving plan (broadcast LUTs /
    materialized codes); the evaluation joins |arms|x{q}x{k} rank
    rows against the vec->label projection — the corpus is scanned
    only by the arms themselves.""".replace(
        "{q}", str(_sim.N_QUERIES)
    ).replace("{k}", str(_sim.TOPK))
    ensure_utc(spark)
    load_table(spark, sf_dir, "embeddings").createOrReplaceTempView(
        "embeddings"
    )
    for name, key in (
        ("exact", "embed_cosine_topk"),
        ("ivf", "ann_ivf_multiprobe"),
        ("sign", "embed_sign_hamming_topk"),
    ):
        QUERIES[key](spark, sf_dir).createOrReplaceTempView(
            f"mrr_arm_{name}"
        )
    arms = " UNION ALL ".join(
        f"SELECT '{name}' AS arm, query_id, neighbor_id, nn_rank"
        f" FROM mrr_arm_{name}"
        for name in ("exact", "ivf", "sign")
    )
    return spark.sql(_mrr_metric_sql(arms, "spark"))


# ---------------------------------------------------------------------------
# R16: int8 symmetric ANN served by an Arrow/numpy GEMM
# ---------------------------------------------------------------------------


def _int8_codes_arr(spark, sf_dir):
    """The packed per-vector int8 code table (vec_id, codes[64]),
    gate-map-materialized once per session — the serving index of
    the GEMM arm, built by the SAME code CTEs the oracle inlines."""
    load_table(spark, sf_dir, "embeddings").createOrReplaceTempView(
        "embeddings"
    )
    return _gate_map(
        spark,
        sf_dir,
        "int8_codes_arr",
        lambda: spark.sql(
            f"""
            WITH {_sim.int8_codes_ctes('spark')}
            SELECT vec_id,
                   transform(
                       array_sort(collect_list(struct(dim, code))),
                       s -> CAST(s.code AS INT)) AS codes
            FROM codes GROUP BY vec_id
            """
        ),
    )


@query("ann_int8_gemm_topk", oracle=_sim.int8_gemm_sql("duck"))
def q_ann_int8_gemm_topk(spark, sf_dir):
    """INT8 SYMMETRIC-QUANTIZED ANN served by an ARROW GEMM — the
    missing serving rung between scalar quantization evidence (#96)
    and PQ-ADC (#139): both sides quantized to the #96 code grid,
    score = Σ(cq−128)(cv−128), the symmetric int8 dot every
    quantized vector store ships as its cheapest full-dim distance.
    The Spark side is the SEVENTH documented Python boundary, and
    the first COMPUTE-bound one: each Arrow batch of packed codes
    hits the broadcast query matrix as ONE numpy int64 GEMM
    ((C−128)@(Q−128)ᵀ — BLAS-shaped, the workload Python exists
    for; values ≤ 64·128², exact in int64, so the DuckDB SQL twin
    hash-matches bit-for-bit despite the engine boundary). Only the
    per-batch top-k per query crosses back to the JVM (the global
    top-k under (dot DESC, id ASC) is contained in the union of
    per-batch top-k), so the boundary emits O(batches·|Q|·k) rows
    at any corpus size; the JVM window takes the global top-k.

    Scale: the code table is 64 bytes/vector (gate-mapped, built
    once); queries are a 10×64 broadcast closure; the GEMM is
    embarrassingly partition-parallel with no shuffle before the
    k-bounded candidate set."""
    ensure_utc(spark)
    return _sim.int8_gemm_topk(
        spark, sf_dir, _int8_codes_arr(spark, sf_dir)
    )


# ---------------------------------------------------------------------------
# R16: exact prefix-filter set-similarity join (AllPairs/PPJoin)
# ---------------------------------------------------------------------------


def _ppjoin_head(dialect: str, tbp: int) -> str:
    """Prefix-filter candidate head over an `sh` (doc_id, s)
    relation with `sc` counts: global token order = (df ASC, s ASC);
    a doc of size c indexes its first c - ceil(tau*c) + 1 tokens;
    J >= tau forces overlap >= ceil(tau*c) on BOTH sides, so by
    pigeonhole every qualifying pair collides inside both prefixes —
    EXACT recall, no bands, no hashes. Length filter: tau*|x| <= |y|
    and tau*|y| <= |x| pruned inside the join."""
    div = "div" if dialect == "spark" else "//"
    mat = "" if dialect == "spark" else "MATERIALIZED "
    return f"""
        , dfreq AS {mat}(
            SELECT s, CAST(COUNT(*) AS BIGINT) AS df
            FROM sh GROUP BY s)
        , ranked AS {mat}(
            SELECT sh.doc_id, sh.s, c.c,
                   CAST(row_number() OVER (
                       PARTITION BY sh.doc_id
                       ORDER BY d.df ASC, sh.s ASC) AS BIGINT) AS pos
            FROM sh
            JOIN dfreq d ON d.s = sh.s
            JOIN sc c ON c.doc_id = sh.doc_id)
        , prefix AS {mat}(
            SELECT doc_id, s, c FROM ranked
            WHERE pos <= c - (({tbp} * c + 9999) {div} 10000) + 1)
        , cand AS {mat}(
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM prefix a
            JOIN prefix b
              ON a.s = b.s AND a.doc_id < b.doc_id
             AND 10000 * b.c >= {tbp} * a.c
             AND 10000 * a.c >= {tbp} * b.c)"""


def _ppjoin_body(dialect: str, tbp: int) -> str:
    """Candidate head + posting-intersection verify tail (the
    dual-dialect form the DuckDB oracle composes)."""
    div = "div" if dialect == "spark" else "//"
    return f"""{_ppjoin_head(dialect, tbp)}
        , ints AS (
            SELECT x.doc_a, x.doc_b, CAST(COUNT(*) AS BIGINT) AS inter
            FROM cand x
            JOIN sh a ON a.doc_id = x.doc_a
            JOIN sh b ON b.doc_id = x.doc_b AND b.s = a.s
            GROUP BY x.doc_a, x.doc_b)
        SELECT i.doc_a, i.doc_b,
               CAST((10000 * i.inter) {div}
                    CAST(x.c + y.c - i.inter AS BIGINT) AS BIGINT)
                   AS jaccard_bp
        FROM ints i
        JOIN sc x ON x.doc_id = i.doc_a
        JOIN sc y ON y.doc_id = i.doc_b
        WHERE 10000 * i.inter >= {tbp} * (x.c + y.c - i.inter)
    """


def _ppjoin_body_spark_arrays(tbp: int) -> str:
    """Spark-side verify tail over per-doc shingle ARRAYS (r9,
    guide §3.4): the posting-intersection `ints` join expanded every
    candidate pair to Σ|x| shingle rows and shuffled the shingle
    table twice; shingles are DISTINCT per doc (set semantics), so
    |x∩y| = size(array_intersect(xa, xb)) computed row-locally on a
    doc-keyed pair join against the `sharr` (doc_id, arr, c) view —
    two bounded joins, zero exploded intermediate. Same candidates,
    same integers; the oracle keeps the posting-join tail and the
    hash gate pins the equality."""
    return f"""{_ppjoin_head('spark', tbp)}
        , ints AS (
            SELECT x.doc_a, x.doc_b,
                   CAST(size(array_intersect(pa.arr, pb.arr))
                        AS BIGINT) AS inter,
                   pa.c AS ca, pb.c AS cb
            FROM cand x
            JOIN sharr pa ON pa.doc_id = x.doc_a
            JOIN sharr pb ON pb.doc_id = x.doc_b)
        SELECT doc_a, doc_b,
               CAST((10000 * inter) div
                    CAST(ca + cb - inter AS BIGINT) AS BIGINT)
                   AS jaccard_bp
        FROM ints
        WHERE 10000 * inter >= {tbp} * (ca + cb - inter)
    """


def _ppjoin_oracle_sql() -> str:
    return (
        "WITH "
        + _dedup._SHINGLES_SQL_MAT
        + _ppjoin_body("duck", _dedup.JACCARD_THRESHOLD_BP)
    )


@query("dedup_ppjoin_exact", oracle=_ppjoin_oracle_sql())
def q_dedup_ppjoin_exact(spark, sf_dir):
    """EXACT prefix-filter set-similarity join — AllPairs/PPJoin
    (Bayardo/Ma/Srikant 2007; Xiao et al. 2008), the
    exactness-guaranteed counterpart of the MinHash-LSH screen
    (#27): J(x,y) >= tau forces |x∩y| >= ceil(tau*|x|) on each
    side, so by pigeonhole every qualifying pair shares a token
    inside BOTH docs' (|x| - ceil(tau*|x|) + 1)-token prefixes
    under the global rarity order (df ASC) — candidates are a
    prefix-token equi-join + two-sided length-ratio prune, recall
    is a THEOREM (no banding probability, no signature width), and
    the emitted pair list provably equals the brute-force #26 list
    (pinned in pytest). The rarity order is what makes the prefix
    index sparse: common shingles fall outside prefixes, so the
    candidate join never touches stop-shingle postings.

    Scale: shingles/counts come from the shared `text_shingles`
    gate map; the rank is one doc-partitioned window; prefix index
    ~ half the shingle mass at tau=0.5 and shrinks as tau rises;
    verification (r9, guide §3.4) is a row-local
    array_intersect over the per-doc shingle-array view — the
    posting-expansion intermediate and the all-pairs join exist
    nowhere in the plan. The standard choice when a pipeline needs
    exact-recall dedup (legal/contractual dedup guarantees) at
    sub-LSH candidate volumes."""
    ensure_utc(spark)
    docs = load_table(spark, sf_dir, "documents")
    sh = _gate_map(
        spark, sf_dir, "text_shingles",
        lambda: _dedup.shingles(docs),
    )
    sh.createOrReplaceTempView("sh")
    sh.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    ).createOrReplaceTempView("sc")
    # r10 verify-path pick (the r9 verdict's watch item, measured):
    # the array_intersect tail wins at sf0.1 (interleaved A/B median
    # 3.63 vs 4.40 s) but LOSES at sf0.01 (1.86 vs 1.26 s median —
    # the r9 driver's +55% was real, not noise): below a few hundred
    # candidates the per-pair array materialization constant
    # outweighs the removed posting expansion. Pick by corpus size
    # (driver-side pruned count-star, the auto_r_bits idiom;
    # crossover measured between 500 and 5000 docs, threshold 2000);
    # env override kept for interleaved A/B.
    mode = os.environ.get("SPARK_GRAFT_PPJOIN_VERIFY", "auto")
    if mode == "auto":
        mode = "arrays" if docs.count() >= 2000 else "postings"
    if mode == "postings":
        return spark.sql(
            "WITH _noop AS (SELECT 1)"
            + _ppjoin_body("spark", _dedup.JACCARD_THRESHOLD_BP)
        )
    _gate_map(
        spark, sf_dir, "text_shingle_arrays",
        lambda: sh.groupBy("doc_id").agg(
            F.collect_list("s").alias("arr"),
            F.count(F.lit(1)).cast("long").alias("c"),
        ),
    ).createOrReplaceTempView("sharr")
    return spark.sql(
        "WITH _noop AS (SELECT 1)"
        + _ppjoin_body_spark_arrays(_dedup.JACCARD_THRESHOLD_BP)
    )


# ---------------------------------------------------------------------------
# R16: Chao1 species-richness extrapolation + Good's coverage
# ---------------------------------------------------------------------------


def _chao1_sql(dialect: str) -> str:
    div = "div" if dialect == "spark" else "//"
    return f"""
        WITH freq AS (
            SELECT event_type, user_id,
                   CAST(COUNT(*) AS BIGINT) AS k
            FROM events GROUP BY event_type, user_id)
        SELECT event_type,
               CAST(SUM(k) AS BIGINT) AS n_events,
               CAST(COUNT(*) AS BIGINT) AS d_observed,
               CAST(SUM(CASE WHEN k = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS f1,
               CAST(SUM(CASE WHEN k = 2 THEN 1 ELSE 0 END)
                    AS BIGINT) AS f2,
               CAST(COUNT(*)
                    + (SUM(CASE WHEN k = 1 THEN 1 ELSE 0 END)
                       * (SUM(CASE WHEN k = 1 THEN 1 ELSE 0 END) - 1))
                      {div} (2 * (SUM(CASE WHEN k = 2 THEN 1 ELSE 0 END)
                                  + 1))
                    AS BIGINT) AS chao1_est,
               CAST(10000 - (10000 * SUM(CASE WHEN k = 1 THEN 1
                                             ELSE 0 END))
                            {div} SUM(k) AS BIGINT) AS coverage_bp
        FROM freq GROUP BY event_type
    """


@query("events_chao1_richness", oracle=_chao1_sql("duck"))
def q_events_chao1_richness(spark, sf_dir):
    """CHAO1 SPECIES-RICHNESS EXTRAPOLATION per event type (Chao
    1984, bias-corrected form d + f1(f1-1)/(2(f2+1))) with GOOD'S
    SAMPLE COVERAGE (1 - f1/n, in bp) — the 'how many distinct
    users EXIST beyond what we sampled' estimator that answers the
    question HLL (#62/#156: distinct users we SAW) and Good-Turing
    (#314: unseen-mass probability) each answer differently: a type
    whose chao1_est >> d_observed with low coverage is still
    discovering its audience (capture-recapture logic on the
    singleton/doubleton abundance counts); one at coverage ~10000 bp
    has saturated. The capacity-planning and crawl-frontier-sizing
    number — 'is this source mined out?' — in exact integer algebra
    (floor div, +1-corrected denominator so doubleton-free types
    stay finite).

    Scale: one (type, user) hash aggregate (map-side combined) then
    a types-bounded rollup — two shuffles, no windows, no joins."""
    ensure_utc(spark)
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_chao1_sql("spark"))


# ---------------------------------------------------------------------------
# R16: Debezium gold SCD4 — volatile attribute as a mini-dimension
# ---------------------------------------------------------------------------

_SCD4_BAND_CENTS = 5000  # 50-unit value bands = the mini-dimension


def _scd4_body(dialect: str, rel: str) -> str:
    div = "div" if dialect == "spark" else "//"
    return f"""
        , b4 AS (
            SELECT key_id, pos, operation,
                   CASE WHEN operation = 'DELETE' THEN NULL
                        ELSE CAST(ROUND(value * 100) AS BIGINT)
                   END AS cents
            FROM {rel})
        , vers AS (
            SELECT key_id, pos,
                   cents {div} {_SCD4_BAND_CENTS} AS band
            FROM b4 WHERE operation <> 'DELETE')
        , runs AS (
            SELECT key_id, band,
                   CASE WHEN lag(band) OVER w IS NULL
                             OR lag(band) OVER w <> band
                        THEN 1 ELSE 0 END AS chg
            FROM vers
            WINDOW w AS (PARTITION BY key_id ORDER BY pos ASC))
        , agg AS (
            SELECT key_id,
                   CAST(COUNT(*) AS BIGINT) AS n_versions,
                   CAST(SUM(chg) AS BIGINT) AS n_band_runs
            FROM runs GROUP BY key_id)
        , last_all AS (
            SELECT key_id, operation, cents, pos,
                   row_number() OVER (
                       PARTITION BY key_id ORDER BY pos DESC) AS rn
            FROM b4)
        , cur AS (
            SELECT key_id, pos AS cur_pos,
                   cents {div} {_SCD4_BAND_CENTS} AS band_id
            FROM last_all WHERE rn = 1 AND operation <> 'DELETE')
        SELECT c.key_id, c.cur_pos, c.band_id,
               c.band_id * {_SCD4_BAND_CENTS} AS band_lo_cents,
               c.band_id * {_SCD4_BAND_CENTS} + {_SCD4_BAND_CENTS - 1}
                   AS band_hi_cents,
               a.n_versions, a.n_band_runs,
               CAST((10000 * a.n_band_runs) {div} a.n_versions
                    AS BIGINT) AS history_ratio_bp
        FROM cur c JOIN agg a ON a.key_id = c.key_id
    """


@query(
    "debezium_gold_scd4_minidim",
    oracle=_with_log(
        _DEBEZIUM_SILVER_CTE + _scd4_body("duck", "silver")
    ),
)
def q_debezium_gold_scd4_minidim(spark, sf_dir):
    """Debezium medallion GOLD, SCD4 — the MINI-DIMENSION shape
    (Kimball's type 4: split the rapidly-changing attribute out of
    the dimension into a banded mini-dimension the fact references)
    completing the SCD ladder beside types 1 (#134), 2 (#135),
    3 (#322) and 6 (#407): the volatile value is banded into the
    {b}-cent mini-dimension (band_id + [lo, hi] attributes — the
    bounded table a modeler would materialize), each live key
    carries its CURRENT band FK, and the payoff is MEASURED per
    key: n_versions (what SCD2 history stores) vs n_band_runs
    (what band-grain history would store — consecutive same-band
    versions collapse into one run), with the ratio in bp. Keys
    with history_ratio_bp << 10000 are exactly the churners SCD4
    exists for.

    Scale: the two windows (run-change lag, latest-wins rank) share
    ONE key_id partitioning; the mini-dimension is value-domain
    bounded; output one row per live key.""".replace(
        "{b}", str(_SCD4_BAND_CENTS)
    )
    silver = _debezium.parse_envelopes(
        _debezium.synth_envelopes(cdc_operation_log(spark, sf_dir))
    )
    silver.createOrReplaceTempView("silver4_view")
    return spark.sql(
        "WITH _noop AS (SELECT 1)"
        + _scd4_body("spark", "silver4_view")
    )


# ---------------------------------------------------------------------------
# R16: Markov transition entropy rate in whole bits
# ---------------------------------------------------------------------------


def _markov_entropy_sql(dialect: str) -> str:
    div = "div" if dialect == "spark" else "//"
    return f"""
        WITH seq AS (
            SELECT user_id, event_type,
                   lead(event_type) OVER (
                       PARTITION BY user_id
                       ORDER BY ts ASC, event_id ASC) AS next_type
            FROM events)
        , trans AS (
            SELECT event_type AS from_type, next_type AS to_type,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM seq WHERE next_type IS NOT NULL
            GROUP BY event_type, next_type)
        , rows_tot AS (
            SELECT from_type, CAST(SUM(c) AS BIGINT) AS c_row,
                   CAST(COUNT(*) AS BIGINT) AS n_dests
            FROM trans GROUP BY from_type)
        , bits AS (
            SELECT t.from_type, t.c, r.c_row, r.n_dests,
                   CAST(LENGTH(bin(r.c_row {div} t.c)) - 1
                        AS BIGINT) AS b
            FROM trans t JOIN rows_tot r
              ON r.from_type = t.from_type)
        , per_state AS (
            SELECT from_type,
                   MAX(c_row) AS c_row,
                   MAX(n_dests) AS n_dests,
                   CAST(SUM(c * b) AS BIGINT) AS bit_mass,
                   CAST((100 * SUM(c * b)) {div} MAX(c_row)
                        AS BIGINT) AS mean_centibits
            FROM bits GROUP BY from_type)
        SELECT from_type,
               CAST(c_row AS BIGINT) AS n_transitions,
               CAST(n_dests AS BIGINT) AS n_dests,
               bit_mass, mean_centibits,
               CAST((SELECT (100 * SUM(c * b)) {div} SUM(c)
                     FROM bits) AS BIGINT) AS corpus_rate_centibits
        FROM per_state
    """


@query("events_markov_entropy_rate", oracle=_markov_entropy_sql("duck"))
def q_events_markov_entropy_rate(spark, sf_dir):
    """TRANSITION ENTROPY of the behavioral Markov chain in WHOLE
    BITS — how predictable each state's next step is (navigation
    determinism: a state at ~0 centibits is a forced funnel step, a
    state near 100·log2(|dests|) is a uniform branch-point), and
    the empirically-weighted corpus entropy rate beside it — the
    compressibility/novelty number for behavioral streams that the
    transition MATRIX (#129), stationary mix (#158) and lift pairs
    (#253) tabulate but never score. Per-transition surprisal under
    the chain's own MLE p(to|from) = c/c_row, quantized by the
    integer-exact floor(log2) = bitlen(div)−1 identity (#487's
    trick — transcendental entropy is float-fragile cross-engine;
    whole-bit mass is a BIGINT both engines agree on), mass-weighted
    to mean centibits per state.

    Scale: the one user-partitioned lead window (#129's shape) then
    |types|²-bounded algebra; the corpus-rate subquery reads the
    same bounded bits table. Python recompute + branch-bound laws
    in tests/test_round16.py."""
    ensure_utc(spark)
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_markov_entropy_sql("spark"))


# ---------------------------------------------------------------------------
# R16: Wald SPRT sequential experiment monitor
# ---------------------------------------------------------------------------

# Pre-specified hypotheses on the purchase-event share: H0 p=0.18 vs
# H1 p=0.22 at alpha=beta=0.05. The two per-observation log-likelihood
# increments and the Wald boundaries ln(19)/-ln(19) are
# DATA-INDEPENDENT floats — computed once in Python (math.log),
# inlined as e6 literals (the JL-signs/ln-table discipline): never
# computed per-row in-engine.
_SPRT_C1_E6 = 200671  # round(ln(0.22/0.18) * 1e6)  — success term
_SPRT_C0_E6 = -50010  # round(ln(0.78/0.82) * 1e6)  — failure term
_SPRT_A_E6 = 2944439  # round(ln((1-b)/a) * 1e6) = ln(19) * 1e6


def _sprt_sql(dialect: str) -> str:
    if dialect == "spark":
        h = (
            "CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 8),"
            " 16, 10) AS BIGINT)"
        )
    else:
        h = (
            "CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)"
            " AS BIGINT)"
        )
    return f"""
        WITH assigned AS (
            SELECT ({h}) % {_AB_ARMS} AS arm,
                   date_trunc('day', ts) AS day,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                       AS success
            FROM events)
        , daily AS (
            SELECT arm, day,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(success) AS BIGINT) AS k
            FROM assigned GROUP BY arm, day)
        , cum AS (
            SELECT arm, day,
                   CAST(SUM(n) OVER w AS BIGINT) AS n_cum,
                   CAST(SUM(k) OVER w AS BIGINT) AS k_cum
            FROM daily
            WINDOW w AS (PARTITION BY arm ORDER BY day ASC
                         ROWS UNBOUNDED PRECEDING))
        , llr AS (
            SELECT arm, day, n_cum, k_cum,
                   {_SPRT_C1_E6} * k_cum
                   + {_SPRT_C0_E6} * (n_cum - k_cum) AS llr_e6
            FROM cum)
        , crossed AS (
            SELECT arm,
                   MIN(CASE WHEN llr_e6 >= {_SPRT_A_E6}
                             OR llr_e6 <= -{_SPRT_A_E6}
                        THEN day END) AS stop_day
            FROM llr GROUP BY arm)
        , stopv AS (
            SELECT l.arm, c.stop_day, l.llr_e6 AS stop_llr_e6
            FROM llr l JOIN crossed c
              ON c.arm = l.arm AND c.stop_day = l.day)
        SELECT l.arm, l.day, l.n_cum, l.k_cum, l.llr_e6,
               CASE
                 WHEN s.stop_day IS NULL OR l.day < s.stop_day
                   THEN 'continue'
                 WHEN s.stop_llr_e6 >= {_SPRT_A_E6} THEN 'accept_h1'
                 ELSE 'accept_h0'
               END AS state
        FROM llr l
        LEFT JOIN stopv s ON s.arm = l.arm
    """


@query("events_ab_sprt_monitor", oracle=_sprt_sql("duck"))
def q_events_ab_sprt_monitor(spark, sf_dir):
    """WALD SPRT SEQUENTIAL MONITOR — the sequential-testing shape
    the experimentation family (#325 moments, #371/#476 SRM, #408
    CUPED, #449 Mann-Whitney, #459 power, #479 Wilson) lacks: the
    fixed-horizon tests above answer 'significant at N?'; the SPRT
    (Wald 1945) answers 'can we STOP YET?' with guaranteed
    alpha/beta at pre-specified hypotheses (here H0 p=0.18 vs H1
    p=0.22 on the purchase share, alpha=beta=0.05). Per hash arm
    (#325's md5 split) and day: cumulative trials/successes, the
    cumulative log-likelihood ratio in e6 (increments are the TWO
    data-independent ln constants, Python-precomputed e6 literals —
    no transcendental in-engine), and the sticky sequential state
    (continue until the first ±ln(19) crossing, then the decision
    holds — peeking is the point, not a sin, because the boundaries
    price it in).

    Scale: one (arm, day) hash aggregate over the corpus, one
    arm-partitioned cumulative window on the |arms|x|days| bounded
    table, arms-bounded crossing lookup. Python recompute +
    sticky-decision laws in tests/test_round16.py."""
    ensure_utc(spark)
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_sprt_sql("spark"))


# ---------------------------------------------------------------------------
# R16: targeted hub-removal robustness of the KNN graph
# ---------------------------------------------------------------------------

_ROBUST_LEVELS = (0, 8, 16, 32)


def _robustness_oracle_sql() -> str:
    sql = f"""
        WITH RECURSIVE knn AS MATERIALIZED (
            {_sim.graph_edges_sql("duck")})
        , g AS (
            SELECT vec_id AS src, neighbor_id AS dst FROM knn)
        , ug AS (
            SELECT DISTINCT LEAST(src, dst) AS a,
                   GREATEST(src, dst) AS b
            FROM g)
        , degs AS (
            SELECT node, CAST(COUNT(*) AS BIGINT) AS deg
            FROM (SELECT a AS node FROM ug
                  UNION ALL SELECT b FROM ug) t
            GROUP BY node)
        , nodes_ranked AS (
            SELECT n.vec_id, COALESCE(d.deg, 0) AS deg,
                   row_number() OVER (
                       ORDER BY COALESCE(d.deg, 0) DESC,
                                n.vec_id ASC) AS rnk
            FROM embeddings n
            LEFT JOIN degs d ON d.node = n.vec_id)"""
    arms = []
    for h in _ROBUST_LEVELS:
        sql += f"""
        , keep{h} AS MATERIALIZED (
            SELECT vec_id FROM nodes_ranked WHERE rnk > {h})
        , e{h} AS MATERIALIZED (
            SELECT u.a, u.b FROM ug u
            JOIN keep{h} ka ON ka.vec_id = u.a
            JOIN keep{h} kb ON kb.vec_id = u.b)
        , es{h} AS MATERIALIZED (
            SELECT a AS s, b AS d FROM e{h}
            UNION ALL SELECT b, a FROM e{h})
        , reach{h}(node, r) AS (
            SELECT vec_id, vec_id FROM keep{h}
            UNION
            SELECT m.d, rr.r
            FROM reach{h} rr JOIN es{h} m ON m.s = rr.node)
        , lab{h} AS (
            SELECT node, MIN(r) AS c FROM reach{h} GROUP BY node)
        , stats{h} AS (
            SELECT CAST(MAX(cnt) AS BIGINT) AS largest
            FROM (SELECT COUNT(*) AS cnt FROM lab{h} GROUP BY c) s)"""
        arms.append(f"""
        SELECT CAST({h} AS BIGINT) AS n_removed,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM keep{h})
                   AS n_nodes,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM e{h})
                   AS n_edges,
               s.largest AS largest_cc,
               CAST((10000 * s.largest) //
                    (SELECT COUNT(*) FROM keep{h}) AS BIGINT)
                   AS lcc_share_bp
        FROM stats{h} s""")
    return sql + " UNION ALL ".join(arms)


@query("graph_robustness_knn", oracle=_robustness_oracle_sql())
def q_graph_robustness_knn(spark, sf_dir):
    """TARGETED-ATTACK ROBUSTNESS of the KNN graph (Albert, Jeong &
    Barabási 2000): remove the top-h degree hubs (h ∈ {lv}) from the
    undirected KNN graph and measure what survives — remaining
    edges, largest connected component, and its share of surviving
    nodes in bp. The attack-tolerance curve is the structural
    robustness number behind two pipeline decisions the per-node
    diagnostics (#393 hubness, #469 rich club, #249 k-core) inform
    but don't answer: does near-dup clustering FRAGMENT when the
    hub vectors are deduplicated away (a steep lcc drop means
    cluster connectivity rides on a few hubs — exactly the
    over-represented vectors curation removes first), and is the
    ANN graph's greedy-routing connectivity hub-dependent (#350's
    entry-point risk). A scale-free-ish KNN graph collapses under
    targeted removal while staying robust to random loss — the
    direction of the curve is the diagnosis.

    Scale: degree/rank tables are NODE-bounded (the one unpartitioned
    rank window runs on the embeddings-sized table, stated); each
    level's component labeling is the checkpointed path-halving
    Pregel (operators/graph.py) over the hub-filtered edge list —
    log-diameter rounds, never all-pairs; the oracle is the
    recursive-CTE closure per level. Python BFS recompute +
    monotonicity laws in tests/test_round16.py.""".replace(
        "{lv}", str(set(_ROBUST_LEVELS))
    )
    from pyspark.sql import Window

    from ..operators.graph import connected_components

    ensure_utc(spark)
    g = _graph_edges_map(spark, sf_dir).select(
        F.col("vec_id").alias("src"), F.col("neighbor_id").alias("dst")
    )
    ug = _gate_map(
        spark, sf_dir, "robust_uedges",
        lambda: g.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        ).distinct(),
    )
    nodes = load_table(spark, sf_dir, "embeddings").select("vec_id")
    deg = (
        ug.select(F.col("a").alias("node"))
        .unionAll(ug.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    ranked_nodes = _gate_map(
        spark, sf_dir, "robust_node_ranks",
        lambda: nodes.join(
            deg, nodes["vec_id"] == deg["node"], "left"
        )
        .select(
            "vec_id",
            F.coalesce("deg", F.lit(0)).alias("deg"),
        )
        .withColumn(
            "rnk",
            F.row_number()
            .over(
                Window.orderBy(
                    F.col("deg").desc(), F.col("vec_id").asc()
                )
            )
            .cast("long"),
        ),
    )
    arms = []
    for h in _ROBUST_LEVELS:
        keep = ranked_nodes.where(F.col("rnk") > h).select("vec_id")
        e = (
            ug.join(
                keep.select(F.col("vec_id").alias("a")), "a"
            ).join(keep.select(F.col("vec_id").alias("b")), "b")
        ).localCheckpoint()
        labels = connected_components(
            keep, e, id_col="vec_id", src="a", dst="b"
        )
        largest = (
            labels.groupBy("cluster_id")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .agg(F.max("cnt").cast("long").alias("largest_cc"))
        )
        n_nodes = keep.agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes")
        )
        n_edges = e.agg(
            F.count(F.lit(1)).cast("long").alias("n_edges")
        )
        arm = (
            n_nodes.crossJoin(n_edges)
            .crossJoin(largest)
            .select(
                F.lit(h).cast("long").alias("n_removed"),
                "n_nodes",
                "n_edges",
                "largest_cc",
                F.expr(
                    "CAST((10000 * largest_cc) div n_nodes AS BIGINT)"
                ).alias("lcc_share_bp"),
            )
        )
        arms.append(arm)
    from functools import reduce as _reduce

    return _reduce(lambda x, y: x.unionByName(y), arms)


# ---------------------------------------------------------------------------
# R16: held-out n-gram coverage vs train-prefix size (data-value curve)
# ---------------------------------------------------------------------------

_COVERAGE_GRID = (25, 50, 75, 100)


def _ngram_coverage_sql(dialect: str) -> str:
    div = "div" if dialect == "spark" else "//"
    if dialect == "spark":
        toks = "split(text, ' ')"
        bgx = (
            "explode(transform(sequence(1, size(t) - 1), "
            "i -> concat(element_at(t, i), ' ', element_at(t, i + 1))))"
        )
        sz = "size(t)"
        hp = (
            "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 8),"
            " 16, 10) AS BIGINT) % 10000"
        )
    else:
        toks = "string_split(text, ' ')"
        bgx = (
            "unnest(list_transform(range(1, len(t)), "
            "i -> array_to_string(t[i:i+1], ' ')))"
        )
        sz = "len(t)"
        hp = (
            "CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)"
            " AS BIGINT) % 10000"
        )
    grid = ", ".join(f"({p}, {p * 100})" for p in _COVERAGE_GRID)
    return f"""
        WITH toks AS (
            SELECT doc_id, {hp} AS hp, {toks} AS t FROM documents)
        , train_bg AS (
            SELECT hp, bigram FROM (
                SELECT hp, {bgx} AS bigram
                FROM toks WHERE doc_id % 4 <> 0 AND {sz} >= 2) e)
        , first_seen AS (
            SELECT bigram, CAST(MIN(hp) AS BIGINT) AS hp_min
            FROM train_bg GROUP BY bigram)
        , held AS (
            SELECT bigram FROM (
                SELECT {bgx} AS bigram
                FROM toks WHERE doc_id % 4 = 0 AND {sz} >= 2) e)
        , held_joined AS (
            SELECT h.bigram, f.hp_min
            FROM held h LEFT JOIN first_seen f
              ON f.bigram = h.bigram)
        , grid AS (SELECT * FROM (VALUES {grid}) AS g(pct, cut))
        , docs_per AS (
            SELECT g.pct,
                   CAST(SUM(CASE WHEN d.hp < g.cut THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_train_docs
            FROM grid g
            CROSS JOIN (SELECT DISTINCT doc_id, hp FROM toks
                        WHERE doc_id % 4 <> 0) d
            GROUP BY g.pct)
        , types_per AS (
            SELECT g.pct,
                   CAST(SUM(CASE WHEN f.hp_min < g.cut
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_train_types
            FROM grid g CROSS JOIN first_seen f
            GROUP BY g.pct)
        , cov_per AS (
            SELECT g.pct,
                   CAST(SUM(CASE WHEN h.hp_min IS NOT NULL
                                  AND h.hp_min < g.cut
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS covered_bg,
                   CAST(COUNT(*) AS BIGINT) AS total_bg
            FROM grid g CROSS JOIN held_joined h
            GROUP BY g.pct)
        SELECT d.pct AS prefix_pct, d.n_train_docs,
               t.n_train_types, c.covered_bg, c.total_bg,
               CAST((10000 * c.covered_bg) {div} c.total_bg
                    AS BIGINT) AS coverage_bp
        FROM docs_per d
        JOIN types_per t ON t.pct = d.pct
        JOIN cov_per c ON c.pct = d.pct
    """


@query("text_ngram_coverage_curve", oracle=_ngram_coverage_sql("duck"))
def q_text_ngram_coverage_curve(spark, sf_dir):
    """DATA-VALUE LEARNING CURVE — held-out bigram coverage vs
    train-prefix size: how much of an UNSEEN quarter's language
    does 25/50/75/100% of the training corpus already cover? The
    diminishing-returns curve behind 'do we need more data or
    different data' (flattening coverage says new docs repeat known
    language — go change the MIX, #86/#420, not the volume), and
    the held-out GENERALIZATION twin of the within-corpus Heaps
    curve (#202). Window-free prefix algebra: a doc's prefix
    membership is a hash THRESHOLD (md5(doc_id) % 1e4 < pct·100 —
    no global rank anywhere), each train bigram type carries only
    its FIRST prefix position (MIN hash — the #202 first-occurrence
    charge), and every grid point reads the same bounded
    (type, hp_min) table. Cross-operator law: covered at 100% =
    total − #491's unseen count (the KN scorer and this curve must
    agree on what 'unseen' means).

    Scale: two bigram explodes (train/held), one vocabulary-bounded
    MIN aggregate, grid × bounded tables — no windows, no joins
    wider than the vocabulary."""
    ensure_utc(spark)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents"
    )
    return spark.sql(_ngram_coverage_sql("spark"))


# ---------------------------------------------------------------------------
# R16: session census keyed by entry event type
# ---------------------------------------------------------------------------

_SESSION_GAP_MIN = 30


def _session_entry_sql(dialect: str) -> str:
    div = "div" if dialect == "spark" else "//"
    if dialect == "spark":
        gap_s = (
            "(unix_micros(ts) - unix_micros(lag(ts) OVER w))"
            " div 1000000"
        )
    else:
        gap_s = (
            "(epoch_us(ts) - epoch_us(lag(ts) OVER w)) // 1000000"
        )
    return f"""
        WITH marked AS (
            SELECT user_id, ts, event_id, event_type,
                   CASE WHEN lag(ts) OVER w IS NULL
                         OR {gap_s} > {_SESSION_GAP_MIN * 60}
                        THEN 1 ELSE 0 END AS is_start
            FROM events
            WINDOW w AS (PARTITION BY user_id
                         ORDER BY ts ASC, event_id ASC))
        , sess AS (
            SELECT user_id, ts, event_id, event_type,
                   CAST(SUM(is_start) OVER (
                       PARTITION BY user_id
                       ORDER BY ts ASC, event_id ASC
                       ROWS UNBOUNDED PRECEDING) AS BIGINT)
                       AS session_id
            FROM marked)
        , per_session AS (
            SELECT user_id, session_id,
                   MIN(event_type) FILTER (
                       WHERE rn = 1) AS entry_type,
                   CAST(COUNT(*) AS BIGINT) AS depth,
                   CAST(MAX(CASE WHEN event_type = 'purchase'
                            THEN 1 ELSE 0 END) AS BIGINT)
                       AS has_purchase
            FROM (SELECT *, row_number() OVER (
                      PARTITION BY user_id, session_id
                      ORDER BY ts ASC, event_id ASC) AS rn
                  FROM sess) r
            GROUP BY user_id, session_id)
        SELECT entry_type,
               CAST(COUNT(*) AS BIGINT) AS n_sessions,
               CAST((10000 * SUM(CASE WHEN depth = 1 THEN 1 ELSE 0
                                 END)) {div} COUNT(*) AS BIGINT)
                   AS bounce_bp,
               CAST((100 * SUM(depth)) {div} COUNT(*) AS BIGINT)
                   AS mean_depth_e2,
               CAST(MAX(depth) AS BIGINT) AS max_depth,
               CAST((10000 * SUM(has_purchase)) {div} COUNT(*)
                    AS BIGINT) AS purchase_rate_bp
        FROM per_session GROUP BY entry_type
    """


@query("events_session_entry_profile", oracle=_session_entry_sql("duck"))
def q_events_session_entry_profile(spark, sf_dir):
    """SESSION CENSUS BY ENTRY TYPE — the landing-page analytics
    staple (bounce rate, depth, in-session conversion, keyed by how
    the session STARTED) that the session family measures other
    grains of: #9/#111 build sessions, #401 their wall-clock
    coverage, #310 the gap-threshold sensitivity, #184 the gaps
    BETWEEN sessions — none answers 'do error-opened sessions
    bounce more and convert less than view-opened ones'. Sessions
    are the {g}-minute gap islands (the #111 boundary semantics:
    split strictly-greater); entry type is the first event by
    (ts, event_id); per entry type: session count, bounce share
    (depth 1) bp, mean depth e2, max depth, purchase-conversion bp.

    Scale: the lag mark, the island cumsum, and the first-event
    rank all share ONE user_id partitioning (one shuffle), then a
    (user, session) aggregate and a types-bounded rollup.""".replace(
        "{g}", str(_SESSION_GAP_MIN)
    )
    ensure_utc(spark)
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_session_entry_sql("spark"))


# ---------------------------------------------------------------------------
# R16: nearest-direction as-of join
# ---------------------------------------------------------------------------


@query(
    "asof_order_event_nearest",
    oracle="""
        WITH ev AS (
            SELECT user_id AS key_id, event_id AS seq, ts, value,
                   event_type
            FROM events)
        , purchases AS (
            SELECT key_id, seq AS purchase_seq, ts AS purchase_ts
            FROM ev WHERE event_type = 'purchase')
        , clicks AS (
            SELECT key_id, seq, ts, value FROM ev
            WHERE event_type = 'click')
        SELECT p.key_id, p.purchase_seq, p.purchase_ts,
               n.ts AS asof_ts, n.seq AS asof_seq,
               n.value AS asof_value
        FROM purchases p
        LEFT JOIN LATERAL (
            SELECT c.ts, c.seq, c.value FROM clicks c
            WHERE c.key_id = p.key_id
            ORDER BY ABS(epoch_us(c.ts) - epoch_us(p.purchase_ts))
                         ASC,
                     (c.ts > p.purchase_ts) ASC,
                     CASE WHEN c.ts > p.purchase_ts THEN c.seq
                          ELSE -c.seq END ASC
            LIMIT 1) n ON TRUE
    """,
)
def q_asof_order_event_nearest(spark, sf_dir):
    """NEAREST as-of — the fourth direction completing the as-of
    family (backward #20, forward #68, tolerance #91): the click
    closest IN EITHER DIRECTION to each purchase per user, ties on
    |delta| preferring the past (attribution never credits the
    future when the past is equally close; within a direction the
    directional seq tie rules hold). pandas merge_asof
    direction='nearest', re-expressed as two union+running-window
    passes and a per-row winner pick — two key shuffles, no range
    join, no O(n*m) expansion (operators/asof.py:asof_join_nearest).
    Oracle: LATERAL top-1 under the composite
    (|delta|, is_forward, signed seq) order."""
    from ..operators.asof import asof_join_nearest

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("key_id"),
        F.col("event_id").alias("purchase_seq"),
        F.col("ts").alias("purchase_ts"),
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("key_id"),
        F.col("event_id").alias("seq"),
        "ts",
        "value",
    )
    return asof_join_nearest(
        purchases,
        clicks,
        key="key_id",
        probe_ts="purchase_ts",
        build_seq="seq",
        build_payload=["seq", "value"],
        prefix="asof_",
    ).select(
        "key_id",
        "purchase_seq",
        "purchase_ts",
        "asof_ts",
        "asof_seq",
        "asof_value",
    )


# ---------------------------------------------------------------------------
# R16: histogram selectivity-error report (CBO stats quality)
# ---------------------------------------------------------------------------

_HIST_PROBES = ((0, 50), (5, 15), (40, 60), (70, 95))


def _hist_selectivity_body(dialect: str, deciles_rel: str) -> str:
    """Shared metric body: equi-width edges from (lo, hi), equi-depth
    edges from the registered decile boundaries, uniform-in-bucket
    interpolation per probe, exact counts beside. All (lower, upper]
    integer-edge algebra in floor division."""
    div = "div" if dialect == "spark" else "//"
    probes = ", ".join(f"({i}, {a}, {b})" for i, (a, b)
                       in enumerate(_HIST_PROBES))
    return f"""
        , vals AS (
            SELECT CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100
                        AS BIGINT) AS p
            FROM lineitem)
        , bounds AS (
            SELECT CAST(MIN(p) AS BIGINT) AS lo,
                   CAST(MAX(p) AS BIGINT) AS hi,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM vals)
        , wedges AS (
            SELECT g.b,
                   bo.lo - 1 + ((g.b - 1) * (bo.hi - bo.lo + 1))
                       {div} 10 AS lower_e,
                   bo.lo - 1 + (g.b * (bo.hi - bo.lo + 1))
                       {div} 10 AS upper_e
            FROM (SELECT CAST(unnest AS BIGINT) AS b FROM
                  (VALUES (1),(2),(3),(4),(5),(6),(7),(8),(9),(10))
                  AS t(unnest)) g
            CROSS JOIN bounds bo)
        , dedges AS (
            SELECT d.decile AS b,
                   COALESCE(LAG(d.price_centi) OVER (
                       ORDER BY d.decile ASC),
                       (SELECT lo - 1 FROM bounds)) AS lower_e,
                   d.price_centi AS upper_e
            FROM {deciles_rel} d)
        , buckets AS (
            SELECT 'equi_width' AS method, b, lower_e, upper_e
            FROM wedges
            UNION ALL
            SELECT 'equi_depth', b, lower_e, upper_e FROM dedges)
        , bcounts AS (
            SELECT k.method, k.b, k.lower_e, k.upper_e,
                   CAST(COUNT(v.p) AS BIGINT) AS cnt
            FROM buckets k
            LEFT JOIN vals v
              ON v.p > k.lower_e AND v.p <= k.upper_e
            GROUP BY k.method, k.b, k.lower_e, k.upper_e)
        , probes AS (
            SELECT pid, bo.lo + (pa * (bo.hi - bo.lo)) {div} 100
                       AS a,
                   bo.lo + (pb * (bo.hi - bo.lo)) {div} 100 AS bb
            FROM (VALUES {probes}) AS g(pid, pa, pb)
            CROSS JOIN bounds bo)
        , est AS (
            SELECT p.pid, p.a, p.bb, c.method,
                   CAST(SUM(
                       (c.cnt * GREATEST(CAST(0 AS BIGINT),
                            LEAST(c.upper_e, p.bb)
                            - GREATEST(c.lower_e + 1, p.a) + 1))
                       {div} GREATEST(c.upper_e - c.lower_e, 1)
                   ) AS BIGINT) AS est_rows
            FROM probes p CROSS JOIN bcounts c
            GROUP BY p.pid, p.a, p.bb, c.method)
        , exact AS (
            SELECT p.pid, CAST(COUNT(v.p) AS BIGINT) AS exact_rows
            FROM probes p
            LEFT JOIN vals v ON v.p >= p.a AND v.p <= p.bb
            GROUP BY p.pid)
        SELECT e.method, e.pid AS probe_id,
               e.a AS probe_lo_centi, e.bb AS probe_hi_centi,
               e.est_rows, x.exact_rows,
               CAST((10000 * ABS(e.est_rows - x.exact_rows))
                    {div} GREATEST(x.exact_rows, 1) AS BIGINT)
                   AS err_bp
        FROM est e JOIN exact x ON x.pid = e.pid
    """


@query(
    "ops_histogram_selectivity_error",
    oracle="""
        WITH deciles AS (
            SELECT CAST(d AS BIGINT) AS decile,
                   CAST(MAX(p) AS BIGINT) AS price_centi
            FROM (
                SELECT p, row_number() OVER (ORDER BY p ASC) AS rn,
                       COUNT(*) OVER () AS n
                FROM (SELECT CAST(CAST(l_extendedprice
                             AS DECIMAL(12,2)) * 100 AS BIGINT) AS p
                      FROM lineitem) v) r
            CROSS JOIN (VALUES (1),(2),(3),(4),(5),(6),(7),(8),(9),
                               (10)) AS g(d)
            WHERE rn = (d * n + 9) // 10
            GROUP BY d)
    """
    + _hist_selectivity_body("duck", "deciles"),
)
def q_ops_histogram_selectivity_error(spark, sf_dir):
    """HISTOGRAM SELECTIVITY-ERROR REPORT — the ANALYZE-stats
    quality question every cost-based optimizer lives on: for a
    grid of range predicates over l_extendedprice, the row-count
    estimate under a 10-bucket EQUI-WIDTH histogram vs a 10-bucket
    EQUI-DEPTH histogram (uniform-in-bucket interpolation, the
    standard estimator) against the exact count, with the error in
    bp. Equi-depth edges come from the REGISTERED #254 decile
    query — the band-prefix percentile machinery, so the Spark plan
    has no global sort anywhere (the oracle's global window is the
    duck-side twin only). The report is the empirical basis of the
    'equi-depth for skew' folklore: width buckets blow up exactly
    where the value mass clumps.

    Scale: bucket/probe tables are constant-bounded broadcasts; the
    two counting passes are broadcast range joins against them (the
    corpus is scanned twice, never shuffled on value); the decile
    source is #254's existing plan."""
    ensure_utc(spark)
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "lineitem"
    )
    li = load_table(spark, sf_dir, "lineitem")
    top = li.agg(
        F.lit(10).cast("long").alias("decile"),
        F.expr(
            "CAST(MAX(CAST(l_extendedprice AS DECIMAL(12,2)) * 100)"
            " AS BIGINT)"
        ).alias("price_centi"),
    )
    # #254 emits deciles 1..9 (interior boundaries); the histogram
    # needs the top edge too — append decile 10 = column max.
    QUERIES["lineitem_price_deciles"](spark, sf_dir).select(
        "decile", "price_centi"
    ).unionByName(top).localCheckpoint().createOrReplaceTempView(
        "hist_deciles"
    )
    return spark.sql(
        "WITH _noop AS (SELECT 1)"
        + _hist_selectivity_body("spark", "hist_deciles")
    )


# ---------------------------------------------------------------------------
# R16: Local Outlier Factor over the KNN graph
# ---------------------------------------------------------------------------

_LOF_TOPN = 20


def _lof_body(dialect: str, knn_rel: str) -> str:
    """Shared LOF algebra over a (vec_id, neighbor_id, nn_rank,
    cos_e6) KNN relation: cosine distance d_e6 = 1e6 - cos_e6,
    k-distance = distance at rank K, reachability
    reach(a,b) = max(kdist(b), d(a,b)), local reachability density
    lrd_e9 = K*1e9 div sum_reach, LOF_bp = 1e4 * sum(lrd(b)) div
    (K * lrd(a)) — every step a floor division at a declared scale,
    so both engines land on identical BIGINTs. Vectors with fewer
    than K neighbors (small cells) are excluded, stated."""
    div = "div" if dialect == "spark" else "//"
    k = _sim.KNN_K
    return f"""
        , e AS (
            SELECT vec_id, neighbor_id, nn_rank,
                   CAST(1000000 - cos_e6 AS BIGINT) AS d_e6
            FROM {knn_rel})
        , full_deg AS (
            SELECT vec_id FROM e GROUP BY vec_id
            HAVING COUNT(*) = {k})
        , kdist AS (
            SELECT e.vec_id, e.d_e6 AS kdist_e6
            FROM e JOIN full_deg f ON f.vec_id = e.vec_id
            WHERE e.nn_rank = {k})
        , reach AS (
            SELECT e.vec_id, e.neighbor_id,
                   GREATEST(kb.kdist_e6, e.d_e6) AS reach_e6
            FROM e
            JOIN full_deg f ON f.vec_id = e.vec_id
            JOIN kdist kb ON kb.vec_id = e.neighbor_id)
        , lrd AS (
            SELECT vec_id,
                   CAST(({k} * CAST(1000000000 AS BIGINT))
                        {div} SUM(reach_e6) AS BIGINT) AS lrd_e9
            FROM reach GROUP BY vec_id
            HAVING COUNT(*) = {k})
        , lof AS (
            SELECT r.vec_id,
                   CAST((10000 * SUM(ln.lrd_e9))
                        {div} ({k} * MAX(la.lrd_e9)) AS BIGINT)
                       AS lof_bp
            FROM reach r
            JOIN lrd ln ON ln.vec_id = r.neighbor_id
            JOIN lrd la ON la.vec_id = r.vec_id
            GROUP BY r.vec_id
            HAVING COUNT(*) = {k})
        , top AS (
            SELECT l.vec_id, kd.kdist_e6, ld.lrd_e9, l.lof_bp
            FROM lof l
            JOIN kdist kd ON kd.vec_id = l.vec_id
            JOIN lrd ld ON ld.vec_id = l.vec_id
            ORDER BY l.lof_bp DESC, l.vec_id ASC
            LIMIT {_LOF_TOPN})
    """


def _lof_rank_sql(rel: str) -> str:
    """Rank WITHIN the {N} TakeOrdered survivors by a bounded
    self-join count ((lof_bp, vec_id) is a total order, so
    COUNT(u >= t) == row_number) — NOT a window, so the plan
    carries no unpartitioned WindowExec at all (r6 verdict item 2:
    the old shape ranked the corpus-grain LOF table in one reducer
    BEFORE the limit)."""
    return f"""
        SELECT t.vec_id, t.kdist_e6, t.lrd_e9, t.lof_bp,
               CAST(COUNT(*) AS BIGINT) AS rnk
        FROM {rel} t
        JOIN {rel} u
          ON u.lof_bp > t.lof_bp
          OR (u.lof_bp = t.lof_bp AND u.vec_id <= t.vec_id)
        GROUP BY t.vec_id, t.kdist_e6, t.lrd_e9, t.lof_bp
    """


def _lof_oracle_sql() -> str:
    return (
        f"WITH knn AS MATERIALIZED ({_sim.graph_edges_sql('duck')})"
        + _lof_body("duck", "knn")
        + _lof_rank_sql("top")
    )


@query("embed_lof_outliers", oracle=_lof_oracle_sql())
def q_embed_lof_outliers(spark, sf_dir):
    """LOCAL OUTLIER FACTOR (Breunig et al. 2000) over the corpus
    KNN graph — the DENSITY-RELATIVE outlier detector the embedding
    audit battery lacked: Mahalanobis (#285) is global-covariance,
    two-NN (#286) is a raw-distance ratio, OOD (#205) needs a
    reference set; LOF flags a vector whose local density is low
    RELATIVE TO ITS OWN NEIGHBORS' densities (lof >> 1), which is
    what catches outliers at the edge of tight clusters that global
    detectors miss inside diffuse regions. Reachability smoothing
    (max with the neighbor's k-distance) and both density ratios
    run in floor-scaled integer algebra (e6 distances, e9
    densities, bp LOF) — engine-identical BIGINTs end to end. Top
    {n} by lof_bp; vectors in sub-K cells excluded (stated).

    Scale: edges come from the SHARED graph_knn_edges gate map;
    every step is a K-bounded equi-join or per-key aggregate; the
    top-{n} cut is ORDER BY + LIMIT (TakeOrderedAndProject —
    per-partition partial top-k, never a corpus-wide WindowExec),
    materialized once (localCheckpoint), and the rank is a {n}×{n}
    self-join count over the survivors — zero unpartitioned
    windows in the plan (r6 verdict item 2, pinned in
    tests/test_plans.py).""".replace("{n}", str(_LOF_TOPN))
    ensure_utc(spark)
    kg = _graph_edges_map(spark, sf_dir)
    kg.createOrReplaceTempView("lof_knn")
    top = spark.sql(
        "WITH _noop AS (SELECT 1)"
        + _lof_body("spark", "lof_knn")
        + " SELECT * FROM top"
    ).localCheckpoint()
    top.createOrReplaceTempView("lof_top")
    return spark.sql(_lof_rank_sql("lof_top"))


# ---------------------------------------------------------------------------
# R16: price-volume-mix revenue decomposition at brand grain
# ---------------------------------------------------------------------------

_PVM_Y0, _PVM_Y1 = 1996, 1997


def _pvm_sql(dialect: str) -> str:
    div = "div" if dialect == "spark" else "//"
    fd = _pca_fd  # posrem floor div (negative numerators)
    # widen the Δq·rev products: brand-grain (and total-grain)
    # quantity deltas × e4 revenue pass BIGINT range at ~sf1 —
    # caught by the r7 sf1 sweep (same class as the pareto fix)
    big = "DECIMAL(38,0)" if dialect == "spark" else "HUGEINT"
    return f"""
        WITH base AS (
            SELECT p.p_brand AS brand,
                   CASE WHEN l.l_shipdate >= DATE '{_PVM_Y0}-01-01'
                         AND l.l_shipdate < DATE '{_PVM_Y0 + 1}-01-01'
                        THEN 0 ELSE 1 END AS period,
                   CAST(ROUND(l.l_quantity) AS BIGINT) AS q,
                   CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(ROUND(l.l_discount * 100)
                                     AS BIGINT)) AS rev_e4
            FROM lineitem l
            JOIN part p ON p.p_partkey = l.l_partkey
            WHERE l.l_shipdate >= DATE '{_PVM_Y0}-01-01'
              AND l.l_shipdate < DATE '{_PVM_Y1 + 1}-01-01')
        , per AS (
            SELECT brand,
                   CAST(SUM(CASE WHEN period = 0 THEN q ELSE 0 END)
                        AS BIGINT) AS q0,
                   CAST(SUM(CASE WHEN period = 1 THEN q ELSE 0 END)
                        AS BIGINT) AS q1,
                   CAST(SUM(CASE WHEN period = 0 THEN rev_e4
                            ELSE 0 END) AS BIGINT) AS r0,
                   CAST(SUM(CASE WHEN period = 1 THEN rev_e4
                            ELSE 0 END) AS BIGINT) AS r1
            FROM base GROUP BY brand)
        , eff AS (
            SELECT brand, q0, q1, r0, r1,
                   CAST(CASE WHEN q0 > 0
                        THEN {fd(f'(CAST(q1 - q0 AS {big}) * r0)', 'q0', div)}
                        ELSE 0 END AS BIGINT) AS vol_e4
            FROM per)
        , tot AS (
            SELECT CAST(SUM(q0) AS BIGINT) AS tq0,
                   CAST(SUM(q1) AS BIGINT) AS tq1,
                   CAST(SUM(r0) AS BIGINT) AS tr0,
                   CAST(SUM(r1) AS BIGINT) AS tr1,
                   CAST(SUM(vol_e4) AS BIGINT) AS sum_vol
            FROM eff)
        SELECT brand, q0, q1, r0 AS rev0_e4, r1 AS rev1_e4,
               vol_e4 AS volume_effect_e4,
               r1 - r0 - vol_e4 AS price_effect_e4,
               CAST(0 AS BIGINT) AS mix_effect_e4
        FROM eff
        UNION ALL
        SELECT 'TOTAL', tq0, tq1, tr0, tr1,
               CAST({_pca_fd(f'(CAST(tq1 - tq0 AS {big}) * tr0)', 'tq0', '{d}')}
                    AS BIGINT) AS volume_effect_e4,
               tr1 - tr0 - sum_vol AS price_effect_e4,
               sum_vol
               - CAST({_pca_fd(f'(CAST(tq1 - tq0 AS {big}) * tr0)', 'tq0', '{d}')}
                      AS BIGINT) AS mix_effect_e4
        FROM tot
    """.replace("{d}", div)


@query("lineitem_pvm_brand_bridge", oracle=_pvm_sql("duck"))
def q_lineitem_pvm_brand_bridge(spark, sf_dir):
    """PRICE-VOLUME-MIX DECOMPOSITION at brand grain — the
    three-factor finance waterfall the total-grain bridge (#289)
    collapses: {y0} vs {y1} discounted revenue per brand split into
    the VOLUME effect ((q1-q0)·p0 at the brand's own prior average
    price, posrem floor division so both engines agree on negative
    deltas) and the PRICE effect (the per-brand exact residual —
    conservation vol+price = Δrev per brand BY CONSTRUCTION); the
    TOTAL row then splits aggregate volume from MIX: mix =
    Σ_brand vol_b − (ΔQ·P0_avg) — the share-shift term that is
    invisible at total grain and IS the answer to 'revenue flat,
    volume flat — what moved?' (customers shifted toward
    cheaper/richer brands). Conservation at both grains pinned in
    pytest.

    Scale: one broadcast part join, one (brand, period) aggregate,
    a 25-row effects table; the waterfall is free at any corpus
    size.""".replace("{y0}", str(_PVM_Y0)).replace(
        "{y1}", str(_PVM_Y1)
    )
    ensure_utc(spark)
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "lineitem"
    )
    load_table(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(_pvm_sql("spark"))


# ---------------------------------------------------------------------------
# R17: blocking-structure scaling dials (the measured SCALING_r7 rule
# as a sizing query)
# ---------------------------------------------------------------------------

# data-independent per-multiplier constants, precomputed in Python.
# Two published band-width rules:
#  - collision-constant: added bits = ceil(2*log2(mult)) holds
#    expected random band collisions n^2*bands/2^bits constant;
#  - occupancy-constant (THE RULE THE REGISTERED OPERATORS NOW
#    SELF-APPLY, r8): added bits = round(log2(mult)) holds bucket
#    occupancy n/2^bits constant, so collisions grow ~linearly with
#    n (bounded per-row work — the measured exp-0.73 arm), clamped
#    at R_MAX_ADD extension planes (see operators/similarity.py).
_DIAL_MULTS = [1, 10, 100, 1000]
_DIAL_ROWS = []
for _m in _DIAL_MULTS:
    _add = 0
    while (1 << _add) < _m * _m:
        _add += 1
    _reg = 0
    while _m * _m > (1 << (2 * (_reg + 1) - 1)):
        _reg += 1
    _DIAL_ROWS.append((_m, _add, min(_reg, _sim.R_MAX_ADD)))
del _m, _add, _reg


def _blocking_dial_sql(dialect: str) -> str:
    div = "div" if dialect == "spark" else "//"
    big = "DECIMAL(38,0)" if dialect == "spark" else "HUGEINT"
    rows = ", ".join(
        f"({m}, {_sim.R_BITS + add}, {1 << (_sim.R_BITS + add)},"
        f" {_sim.R_BITS + reg}, {1 << (_sim.R_BITS + reg)})"
        for m, add, reg in _DIAL_ROWS
    )
    return f"""
        WITH base AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_vec FROM embeddings)
        , dials AS (
            SELECT * FROM (VALUES {rows})
                AS d(mult, lsh_band_bits, pow2bits,
                     lsh_band_bits_registered, pow2bits_reg))
        SELECT d.mult,
               b.n_vec * d.mult AS n_vec_scaled,
               CAST(d.lsh_band_bits AS BIGINT) AS lsh_band_bits,
               CAST(d.lsh_band_bits_registered AS BIGINT)
                   AS lsh_band_bits_registered,
               CAST((CAST(b.n_vec * d.mult AS {big})
                     * (b.n_vec * d.mult) * {_sim.N_BANDS})
                    {div} (2 * d.pow2bits) AS BIGINT)
                   AS lsh_rand_pairs_scaled,
               CAST((CAST(b.n_vec * d.mult AS {big})
                     * (b.n_vec * d.mult) * {_sim.N_BANDS})
                    {div} (2 * d.pow2bits_reg) AS BIGINT)
                   AS lsh_rand_pairs_registered,
               CAST((CAST(b.n_vec * d.mult AS {big})
                     * (b.n_vec * d.mult) * {_sim.N_BANDS})
                    {div} (2 * {1 << _sim.R_BITS}) AS BIGINT)
                   AS lsh_rand_pairs_frozen,
               CAST({_sim._nlist_expr("b.n_vec * d.mult")}
                    AS BIGINT) AS ivf_nlist,
               CAST((b.n_vec * d.mult)
                    {div} {_sim._nlist_expr("b.n_vec * d.mult")}
                    AS BIGINT)
                   AS ivf_cell_rows,
               CAST((b.n_vec * d.mult) {div} {_sim.N_SEEDS} AS BIGINT)
                   AS ivf_cell_rows_frozen
        FROM base b CROSS JOIN dials d
    """


@query("ops_blocking_dial_plan", oracle=_blocking_dial_sql("duck"))
def q_ops_blocking_dial_plan(spark, sf_dir):
    """BLOCKING-STRUCTURE SCALING DIALS — the rule the sf1 scaling
    run (SCALING_r7.json) measured, as a sizing query beside
    ops_scale_sizing_plan (#321): per corpus multiplier
    {1,10,100,1000}, (a) two hyperplane-LSH band-width rules — the
    collision-constant width (bits += ceil(2·log2(mult)), holds
    n²·bands/2^bits flat) and the OCCUPANCY-CONSTANT width
    (bits += round(log2(mult)), holds bucket occupancy flat so
    collisions grow ~linearly) — with their collision estimates vs
    the frozen-constant contrast column, and (b) the IVF nlist
    under the √n rule — the flat-quantizer cost optimum (assign
    n·nlist + in-cell n²/nlist is Θ(n^1.5), minimized at
    nlist ∝ √n; the r7 nlist∝n twin looked linear over one decade
    because in-cell work dominated, but its assign stage is itself
    quadratic — caught at the r8 sf10 point; the truly-linear build
    is the banded-cell graph, #508). Since r8 the rules are NOT
    advisory: the registered embed_near_dup_lsh and the shared KNN
    chain SELF-APPLY them inside their SQL from a corpus count
    (operators/similarity.py:_lsh_band_ctes_auto / _knn_ctes /
    _nlist_expr) — this query remains the sizing forecast a
    capacity planner reads
    (bits_registered is clamped at R_BITS+R_MAX_ADD, the shipped
    extension-plane budget). Measured at sf1: frozen 4-bit bands
    exp 1.58, occupancy-scaled bits exp 0.73, 7.1× faster.
    Expected-collision algebra runs DECIMAL(38,0)/HUGEINT-widened
    (n² at mult 1000 passes BIGINT) — the same widening class the
    scaling run's pareto catch fixed.

    Scale: one 1-row corpus count broadcast × a 4-row literal dial
    grid; the plan is free at any corpus size."""
    ensure_utc(spark)
    load_table(spark, sf_dir, "embeddings").createOrReplaceTempView(
        "embeddings"
    )
    return spark.sql(_blocking_dial_sql("spark"))


# ---------------------------------------------------------------------------
# R18: LSH-celled KNN graph — the linear build path (the sf10 catch)
# ---------------------------------------------------------------------------


@query("ann_knn_graph_lsh", oracle=_sim.knn_graph_lsh_sql("duck"))
def q_ann_knn_graph_lsh(spark, sf_dir):
    """KNN graph built from LSH-band cells instead of the flat
    seed-nearest quantizer — the LINEAR-cost construction for a
    100 TB corpus graph. The r8 sf10 measurement showed the flat
    IVF build is Θ(n^1.5) at ANY nlist rule (assign n·nlist +
    in-cell n²/nlist, minimized at nlist ∝ √n); banded hyperplane
    cells with the self-sized width generate candidates ∝ n with no
    assign stage. Same output contract as ann_knn_graph
    (vec_id, neighbor_id, nn_rank, cos_e6); exact-cosine ranking of
    banded candidates; recall vs brute-force top-K pinned in
    tests/test_self_sizing_dials.py. The Spark side sizes the band
    width from a driver-side corpus count (auto_r_bits, exactly the
    embed_near_dup_lsh hybrid); the oracle keeps the in-SQL
    structural self-sizing form — same partition, same rows.

    Scale: one bits projection (linear, JVM codegen), one
    band-key equi self-join (shuffle on the band key, candidates ∝
    n·bands at constant occupancy), one vec_id-partitioned rank
    window. Zero corpus×seed cross joins anywhere."""
    ensure_utc(spark)
    return _sim.knn_graph_lsh(spark, sf_dir)
