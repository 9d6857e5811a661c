"""Text-analysis operators for a training-data pipeline over the
`documents` table: token stats, quality scoring, language-ID
heuristic, fingerprinting.

Everything is built-in-function only (JVM, whole-stage codegen) —
no Python UDFs — and every computation is expressible identically in
DuckDB SQL for the oracle gate. Texts are single-space tokenized;
the token split is a plain ' ' split on both engines.

Determinism: ratios are exact-integer divisions done in double
(identical IEEE ops on both engines) then rounded once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STOPWORDS = ["the", "a", "of", "and"]

# language-ID marker tokens (fixed priority order for argmax ties)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and"],
    "de": ["der", "die", "das", "und"],
    "es": ["el", "la", "los", "y"],
    "fr": ["le", "la", "les", "et"],
}


def _tokens():
    return F.split(F.col("text"), " ")


def _in_list(vals: list[str]):
    arr = F.array(*[F.lit(v) for v in vals])
    return lambda t: F.array_contains(arr, t)


def token_stats(docs: DataFrame) -> DataFrame:
    toks = _tokens()
    n_tok = F.size(toks).cast("long")
    n_chars = F.length("text").cast("long")
    return docs.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_unique_tokens"),
        n_chars.alias("n_chars_calc"),
        # single-space tokenization: token chars = chars - (n-1)
        # separators; centi-scaled integer floor division is exact on
        # both engines (double round() disagrees at half-boundaries,
        # which these low-entropy rationals hit in practice)
        F.expr("(100 * (length(text) - (size(split(text, ' ')) - 1))) div size(split(text, ' '))")
        .cast("long")
        .alias("avg_token_len_centi"),
    )


def quality_bp_col() -> F.Column:
    """The composite quality as a ROW-LOCAL column over `text` —
    the single scoring definition quality_score emits and the
    streaming admission gate applies inline (no score-table
    join-back inside a micro-batch; guide §2.1)."""
    n = "CAST(size(split(text, ' ')) AS BIGINT)"
    stop = (
        "CAST(size(filter(split(text, ' '), "
        "x -> array_contains(array('the','a','of','and'), x))) AS BIGINT)"
    )
    uniq = "CAST(size(array_distinct(split(text, ' '))) AS BIGINT)"
    return F.expr(
        f"(300000 * {uniq} + 300000 * ({n} - {stop})"
        f" + 4000 * {n} * least({n}, 100)) div (100 * {n})"
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Ratios and the composite quality are emitted as floor-scaled
    basis points (integer-exact cross-engine; see token_stats note).

    quality_bp = floor(10000 * (0.3*uniq/n + 0.3*(1-stop/n)
                                + 0.4*min(n,100)/100))
               = floor((300000*uniq + 300000*(n-stop)
                        + 4000*n*min(n,100)) / (100*n))
    """
    toks = _tokens()
    n_tok = F.size(toks).cast("long")
    # integer floor division (`div`) end to end — no doubles anywhere
    n = "CAST(size(split(text, ' ')) AS BIGINT)"
    stop = (
        "CAST(size(filter(split(text, ' '), "
        "x -> array_contains(array('the','a','of','and'), x))) AS BIGINT)"
    )
    uniq = "CAST(size(array_distinct(split(text, ' '))) AS BIGINT)"
    return docs.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.expr(f"(10000 * {stop}) div {n}").alias("stopword_bp"),
        F.expr(f"(10000 * {uniq}) div {n}").alias("unique_bp"),
        F.expr(f"100 * least({n}, 100)").alias("length_bp"),
        quality_bp_col().alias("quality_bp"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    toks = _tokens()
    scores = {
        lang: F.size(F.filter(toks, _in_list(markers))).cast("long")
        for lang, markers in LANG_MARKERS.items()
    }
    # CJK character count (zh detector) — RE2/Java compatible class
    scores["zh"] = F.regexp_count(F.col("text"), F.lit(r"[\x{4e00}-\x{9fff}]")).cast(
        "long"
    )
    top = F.greatest(*scores.values())
    pred = F.when(top == 0, F.lit("und"))
    for lang in ["en", "de", "es", "fr", "zh"]:  # fixed tie-break priority
        pred = pred.when(scores[lang] == top, F.lit(lang))
    out = docs.select(
        "doc_id",
        "lang",
        *[scores[lang].alias(f"score_{lang}") for lang in ["en", "de", "es", "fr", "zh"]],
        pred.alias("pred_lang"),
    )
    return out.withColumn("lang_match", F.col("pred_lang") == F.col("lang"))


def fingerprint(docs: DataFrame) -> DataFrame:
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    return docs.select(
        "doc_id",
        F.md5(F.col("text")).alias("content_md5"),
        F.md5(norm).alias("norm_md5"),
        F.length("text").cast("long").alias("n_chars_calc"),
        F.size(_tokens()).cast("long").alias("n_tokens"),
    )


TEXT_ORACLES: dict[str, str] = {
    "text_token_stats": """
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_tokens,
               len(list_distinct(string_split(text, ' '))) AS n_unique_tokens,
               length(text) AS n_chars_calc,
               (100 * (length(text) - (len(string_split(text, ' ')) - 1)))
                   // len(string_split(text, ' ')) AS avg_token_len_centi
        FROM documents
    """,
    "text_quality_score": """
        WITH t AS (
            SELECT doc_id,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
                   CAST(len(list_filter(string_split(text, ' '),
                        x -> x IN ('the', 'a', 'of', 'and'))) AS BIGINT) AS stop,
                   CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS uniq
            FROM documents)
        SELECT doc_id,
               n AS n_tokens,
               (10000 * stop) // n AS stopword_bp,
               (10000 * uniq) // n AS unique_bp,
               100 * LEAST(n, 100) AS length_bp,
               (300000 * uniq + 300000 * (n - stop)
                + 4000 * n * LEAST(n, 100)) // (100 * n) AS quality_bp
        FROM t
    """,
    "text_lang_id": r"""
        WITH t AS (
            SELECT doc_id, lang, string_split(text, ' ') AS toks, text
            FROM documents)
        , s AS (
            SELECT doc_id, lang,
                len(list_filter(toks, x -> x IN ('the', 'a', 'of', 'and'))) AS score_en,
                len(list_filter(toks, x -> x IN ('der', 'die', 'das', 'und'))) AS score_de,
                len(list_filter(toks, x -> x IN ('el', 'la', 'los', 'y'))) AS score_es,
                len(list_filter(toks, x -> x IN ('le', 'la', 'les', 'et'))) AS score_fr,
                CAST(len(regexp_extract_all(text, '[\x{4e00}-\x{9fff}]')) AS BIGINT)
                    AS score_zh
            FROM t)
        SELECT doc_id, lang, score_en, score_de, score_es, score_fr, score_zh,
               CASE WHEN GREATEST(score_en, score_de, score_es, score_fr, score_zh) = 0
                        THEN 'und'
                    WHEN score_en = GREATEST(score_en, score_de, score_es, score_fr, score_zh)
                        THEN 'en'
                    WHEN score_de = GREATEST(score_en, score_de, score_es, score_fr, score_zh)
                        THEN 'de'
                    WHEN score_es = GREATEST(score_en, score_de, score_es, score_fr, score_zh)
                        THEN 'es'
                    WHEN score_fr = GREATEST(score_en, score_de, score_es, score_fr, score_zh)
                        THEN 'fr'
                    ELSE 'zh' END AS pred_lang,
               (CASE WHEN GREATEST(score_en, score_de, score_es, score_fr, score_zh) = 0
                        THEN 'und'
                    WHEN score_en = GREATEST(score_en, score_de, score_es, score_fr, score_zh)
                        THEN 'en'
                    WHEN score_de = GREATEST(score_en, score_de, score_es, score_fr, score_zh)
                        THEN 'de'
                    WHEN score_es = GREATEST(score_en, score_de, score_es, score_fr, score_zh)
                        THEN 'es'
                    WHEN score_fr = GREATEST(score_en, score_de, score_es, score_fr, score_zh)
                        THEN 'fr'
                    ELSE 'zh' END) = lang AS lang_match
        FROM s
    """,
    "text_fingerprint": r"""
        SELECT doc_id,
               md5(text) AS content_md5,
               md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS norm_md5,
               length(text) AS n_chars_calc,
               len(string_split(text, ' ')) AS n_tokens
        FROM documents
    """,
}


# ---------------------------------------------------------------------------
# regex tokenization (BPE-ish pre-tokenizer) + rolling-hash fingerprint
# ---------------------------------------------------------------------------

ROLLING_MOD = 1_000_000_007
ROLLING_BASE = 31

_ROLLING_SPARK = (
    "aggregate(transform(split(text, ''), c -> CAST(ascii(c) AS BIGINT)), "
    f"CAST(0 AS BIGINT), (acc, x) -> (acc * {ROLLING_BASE} + x) % {ROLLING_MOD})"
)


def regex_tokens(docs: DataFrame) -> DataFrame:
    """Token counting with a BPE-ish regex pre-tokenizer (word runs
    vs punctuation runs) alongside the whitespace count."""
    return docs.select(
        "doc_id",
        F.size(_tokens()).cast("long").alias("n_ws_tokens"),
        F.regexp_count(F.col("text"), F.lit(r"\w+")).cast("long").alias(
            "n_word_runs"
        ),
        F.regexp_count(F.col("text"), F.lit(r"[a-z]")).cast("long").alias(
            "n_alpha_chars"
        ),
    )


def rolling_hash(docs: DataFrame) -> DataFrame:
    """Order-sensitive polynomial rolling-hash fingerprint
    (base-31 fold over character codes mod 1e9+7) — unlike md5 it is
    incrementally maintainable over appends; bit-equal on both
    engines (pure integer fold)."""
    return docs.select(
        "doc_id",
        F.expr(_ROLLING_SPARK).alias("rolling_hash"),
        F.length("text").cast("long").alias("n_chars_calc"),
    )


TEXT_ORACLES["text_regex_tokens"] = r"""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_ws_tokens,
           CAST(len(regexp_extract_all(text, '\w+')) AS BIGINT) AS n_word_runs,
           CAST(len(regexp_extract_all(text, '[a-z]')) AS BIGINT) AS n_alpha_chars
    FROM documents
"""

TEXT_ORACLES["text_rolling_hash"] = f"""
    SELECT doc_id,
           list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                   list_transform(regexp_extract_all(text, '.'),
                                  c -> CAST(ascii(c) AS BIGINT))),
               (acc, x) -> (acc * {ROLLING_BASE} + x) % {ROLLING_MOD})
               AS rolling_hash,
           length(text) AS n_chars_calc
    FROM documents
"""


# ---------------------------------------------------------------------------
# Log-free integer BM25 ranking (Robertson/Sparck-Jones BM25 with a
# RATIONAL idf — (2N-2df+1)/(2df+1) is the argument of BM25's log,
# used directly so the whole score stays in exact integer algebra
# across engines; the log is strictly monotone, so rare-vs-common
# ORDERING is preserved, only the scale differs from textbook BM25).
# k1 = 1.2, b = 0.75 exactly, via the scaled-integer identity
#   tf_norm = 22000*tf / (10000*tf + 3000 + 9*r),  r = (1000*dl) div avgdl.
# ---------------------------------------------------------------------------

BM25_TERMS = ("dup", "spark", "vector")
BM25_TOPN = 10


def bm25_sql(dialect: str) -> str:
    """Dual-dialect BM25 top-N. Overflow discipline (the 100 TB
    bound, per the r2 ADVICE lesson): idf at e2 scale (<= 2e2*N),
    tf_norm at e4 (<= 2.2e4), their product <= 4.4e6*N stays inside
    BIGINT to N ~ 2e12 docs, and the per-term contribution is divided
    back to e4 BEFORE the per-doc sum — divide-before-multiply
    everywhere a counter product could run away.

    Scale: one explode + hash agg for tf (map-side combined,
    filtered to the query terms BEFORE the shuffle — the exploded
    token stream never shuffles); df and corpus stats are
    term-/1-row-bounded broadcasts; the final top-N is ORDER BY +
    LIMIT — Spark executes TakeOrderedAndProject (per-partition
    partial top-k, no single-reducer window), and the rank window
    runs over N=10 rows."""
    div = "div" if dialect == "spark" else "//"
    terms = ", ".join(f"'{t}'" for t in BM25_TERMS)
    if dialect == "spark":
        tok = (
            "SELECT doc_id, explode(split(text, ' ')) AS t FROM documents"
        )
        base = (
            "SELECT doc_id, CAST(size(split(text, ' ')) AS BIGINT) AS dl "
            "FROM documents"
        )
    else:
        tok = (
            "SELECT doc_id, unnest(string_split(text, ' ')) AS t "
            "FROM documents"
        )
        base = (
            "SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) "
            "AS dl FROM documents"
        )
    return f"""
        WITH tok AS ({tok})
        , base AS ({base})
        , stats AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(dl) AS BIGINT) AS sumdl
            FROM base)
        , tf AS (
            SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS tf
            FROM tok WHERE t IN ({terms}) GROUP BY doc_id, t)
        , dft AS (
            SELECT t, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY t)
        , scored AS (
            SELECT f.doc_id,
                   ((100 * (2 * s.n - 2 * d.df + 1)) {div} (2 * d.df + 1))
                       AS idf_e2,
                   ((220000000 * f.tf) {div}
                    (10000 * f.tf + 3000
                     + 9 * ((1000 * b.dl) {div} (s.sumdl {div} s.n))))
                       AS tfn_e4
            FROM tf f
            JOIN dft d ON d.t = f.t
            JOIN base b ON b.doc_id = f.doc_id
            CROSS JOIN stats s)
        , agg AS (
            SELECT doc_id,
                   CAST(SUM((idf_e2 * tfn_e4) {div} 100) AS BIGINT)
                       AS score_e4,
                   CAST(COUNT(*) AS BIGINT) AS n_terms_hit
            FROM scored GROUP BY doc_id)
        , top AS (
            SELECT * FROM agg
            ORDER BY score_e4 DESC, doc_id ASC LIMIT {BM25_TOPN})
        SELECT doc_id, score_e4, n_terms_hit,
               CAST(row_number() OVER (
                   ORDER BY score_e4 DESC, doc_id ASC) AS BIGINT)
                   AS bm25_rank
        FROM top
    """


# ---------------------------------------------------------------------------
# Gopher duplicate-line/paragraph + duplicated-n-gram battery
# (Rae et al. 2021, Table A1 — the repetition half text_repetition
# stats/#84 doesn't cover). The synthetic corpus carries no newlines,
# so "line" / "paragraph" segmentation is PARAMETERIZED: production
# splits on '\n' / '\n\n'; here a line is a non-overlapping
# LINE_TOKENS-token window and a paragraph a PARA_TOKENS-token window
# (stated stand-in — the hashing/fraction algebra under test is
# segmentation-independent).
# ---------------------------------------------------------------------------

LINE_TOKENS = 10
PARA_TOKENS = 30

# Table A1 thresholds, floor-scaled to basis points. A doc is dropped
# when the metric EXCEEDS its threshold.
GOPHER_REP_THRESHOLDS_BP = {
    "dup_line_bp": 3000,        # duplicate line fraction > 0.30
    "dup_para_bp": 3000,        # duplicate paragraph fraction > 0.30
    "dup_line_char_bp": 2000,   # chars in duplicate lines > 0.20
    "dup_para_char_bp": 2000,   # chars in duplicate paragraphs > 0.20
    "top2_bp": 2000,            # top 2-gram char occupancy > 0.20
    "top3_bp": 1800,
    "top4_bp": 1600,
    "dup5_bp": 1500,            # chars in dup 5-grams > 0.15
    "dup6_bp": 1400,
    "dup7_bp": 1300,
    "dup8_bp": 1200,
    "dup9_bp": 1100,
    "dup10_bp": 1000,
}


def _gopher_gram_arms(dialect: str) -> str:
    """The combined (n, gram) struct list: word n-grams for n=2..10
    plus line windows (n=101) and paragraph windows (n=102), built
    with array functions so ONE Generate/unnest explodes everything
    (a per-n UNION of explodes would duplicate the corpus scan 11x —
    the r1 posexplode lesson)."""
    arms = []
    if dialect == "spark":
        for n in range(2, 11):
            arms.append(
                f"transform(filter(transform("
                f"sequence(1, greatest(size(w) - {n} + 1, 1)),"
                f" i -> slice(w, i, {n})), x -> size(x) = {n}),"
                f" x -> named_struct('n', {n}, 'g', array_join(x, ' ')))"
            )
        for n, width in ((101, LINE_TOKENS), (102, PARA_TOKENS)):
            arms.append(
                f"transform(sequence(0, (size(w) + {width - 1})"
                f" div {width} - 1),"
                f" j -> named_struct('n', {n},"
                f" 'g', array_join(slice(w, j * {width} + 1, {width}),"
                f" ' ')))"
            )
        return "concat(" + ", ".join(arms) + ")"
    for n in range(2, 11):
        arms.append(
            f"list_transform(list_filter(list_transform("
            f"range(1, greatest(len(w) - {n} + 2, 1)),"
            f" i -> w[i:i+{n}-1]), x -> len(x) = {n}),"
            f" x -> {{'n': {n}, 'g': array_to_string(x, ' ')}})"
        )
    for n, width in ((101, LINE_TOKENS), (102, PARA_TOKENS)):
        arms.append(
            f"list_transform(range(0, (len(w) + {width - 1})"
            f" // {width}),"
            f" j -> {{'n': {n}, 'g': array_to_string("
            f"w[j*{width}+1:j*{width}+{width}], ' ')}})"
        )
    return " || ".join(arms)


def gopher_repetition_sql(dialect: str, table: str = "documents") -> str:
    """Per-doc repetition report + keep flag.

    ``table`` parameterizes the source relation so the fused
    keep-list chain can score this (expensive: ~11x token-stream
    Generate) gate over earlier-gate SURVIVORS only — decision
    priority makes that answer-preserving (registry._fused_keep_list).

    Definitions (identical in both dialects, floor-bp integers):
    - dup_line_bp / dup_para_bp: repeat WINDOW occurrences beyond the
      first, over total windows (count basis).
    - dup_line_char_bp / dup_para_char_bp: char mass of those repeat
      occurrences over total window char mass.
    - top{2,3,4}_bp: char mass of the single most frequent n-gram
      (count x gram length) over total n-gram char mass.
    - dup{5..10}_bp: char mass of repeat occurrences (beyond first)
      of duplicated n-grams over total n-gram char mass — the
      count-basis convention (not positional coverage), stated here
      because published implementations vary.

    Scale: one Generate over ~11x the token stream, one map-side-
    combined (doc, n, gram) aggregate, one (doc) aggregate — two
    linear key-partitioned shuffles, no UDFs, no quadratic
    structure (same discipline as the gram-keyed dedup ops)."""
    div = "div" if dialect == "spark" else "//"
    arms = _gopher_gram_arms(dialect)
    if dialect == "spark":
        base = f"""
        WITH t AS (
            SELECT doc_id, split(text, ' ') AS w FROM {table})
        , gr AS (
            SELECT doc_id, u.n AS n, u.g AS g
            FROM t LATERAL VIEW explode({arms}) AS u)"""
    else:
        base = f"""
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS w FROM {table})
        , gr AS (
            SELECT doc_id, u.n AS n, u.g AS g
            FROM (SELECT doc_id, unnest({arms}) AS u FROM t) s)"""

    def agg(n: int, kind: str) -> str:
        if kind == "top":
            return (
                f"MAX(cnt * LENGTH(g)) FILTER (WHERE n = {n}) AS top{n}_m,"
                f" SUM(cnt * LENGTH(g)) FILTER (WHERE n = {n}) AS tot{n}_m"
            )
        return (
            f"SUM((cnt - 1) * LENGTH(g))"
            f" FILTER (WHERE n = {n} AND cnt >= 2) AS dup{n}_m,"
            f" SUM(cnt * LENGTH(g)) FILTER (WHERE n = {n}) AS tot{n}_m"
        )

    win_aggs = []
    for n, tag in ((101, "line"), (102, "para")):
        win_aggs.append(
            f"SUM(cnt) FILTER (WHERE n = {n}) AS {tag}_occ,"
            f" SUM(cnt - 1) FILTER (WHERE n = {n}) AS {tag}_dup,"
            f" SUM(cnt * LENGTH(g)) FILTER (WHERE n = {n}) AS {tag}_m,"
            f" SUM((cnt - 1) * LENGTH(g))"
            f" FILTER (WHERE n = {n} AND cnt >= 2) AS {tag}_dup_m"
        )
    gram_aggs = [agg(n, "top") for n in (2, 3, 4)]
    gram_aggs += [agg(n, "dup") for n in range(5, 11)]

    def bp(num: str, den: str) -> str:
        return (
            f"CAST(CASE WHEN {den} IS NULL OR {den} = 0 THEN 0"
            f" ELSE (10000 * COALESCE({num}, 0)) {div} {den} END"
            f" AS BIGINT)"
        )

    cols = {
        "dup_line_bp": bp("line_dup", "line_occ"),
        "dup_line_char_bp": bp("line_dup_m", "line_m"),
        "dup_para_bp": bp("para_dup", "para_occ"),
        "dup_para_char_bp": bp("para_dup_m", "para_m"),
    }
    for n in (2, 3, 4):
        cols[f"top{n}_bp"] = bp(f"top{n}_m", f"tot{n}_m")
    for n in range(5, 11):
        cols[f"dup{n}_bp"] = bp(f"dup{n}_m", f"tot{n}_m")
    out_cols = ",\n               ".join(
        f"{expr} AS {name}" for name, expr in cols.items()
    )
    keep_pred = " AND ".join(
        f"{cols[name]} <= {thr}"
        for name, thr in GOPHER_REP_THRESHOLDS_BP.items()
    )
    return f"""{base}
        , gc AS (
            SELECT doc_id, n, g, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM gr GROUP BY doc_id, n, g)
        , m AS (
            SELECT doc_id,
                   {", ".join(win_aggs)},
                   {", ".join(gram_aggs)}
            FROM gc GROUP BY doc_id)
        SELECT doc_id,
               CAST(line_occ AS BIGINT) AS n_lines,
               {out_cols},
               CAST(CASE WHEN {keep_pred} THEN 1 ELSE 0 END AS BIGINT)
                   AS keep
        FROM m
    """


# ---------------------------------------------------------------------------
# Line-level corpus dedup — CCNet's pre-step (Wenzek et al. 2020):
# dedup NORMALIZED lines across the whole corpus before LM scoring,
# charging every line to its FIRST occurrence (doc_id, line_no
# order). Complements doc-level (#25/#27), span-level (#113) and
# gram-level (#92) dedup: boilerplate that repeats across documents
# (headers, navigation, license blurbs) disappears corpus-wide while
# each unique line survives exactly once. Same parameterized
# segmentation as the Gopher battery above (prod: '\n' split).
# ---------------------------------------------------------------------------


def _line_cte(dialect: str) -> str:
    w = LINE_TOKENS
    if dialect == "spark":
        return f"""
        WITH t AS (
            SELECT doc_id, split(text, ' ') AS tok FROM documents)
        , ln AS (
            SELECT doc_id, CAST(j AS BIGINT) AS line_no,
                   array_join(slice(tok, j * {w} + 1, {w}), ' ') AS line
            FROM t LATERAL VIEW explode(
                sequence(0, (size(tok) + {w - 1}) div {w} - 1)) AS j)
        , ranked AS (
            SELECT doc_id, line_no, LENGTH(line) AS nchars,
                   row_number() OVER (
                       PARTITION BY md5(regexp_replace(
                           lower(trim(line)), '\\\\s+', ' '))
                       ORDER BY doc_id ASC, line_no ASC) AS rn
            FROM ln)"""
    return f"""
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS tok FROM documents)
        , ln AS (
            SELECT doc_id, CAST(j AS BIGINT) AS line_no,
                   array_to_string(tok[j*{w}+1:j*{w}+{w}], ' ') AS line
            FROM t, unnest(range(0, (len(tok) + {w - 1}) // {w}))
                 AS u(j))
        , ranked AS (
            SELECT doc_id, line_no, LENGTH(line) AS nchars,
                   row_number() OVER (
                       PARTITION BY md5(regexp_replace(
                           lower(trim(line)), '\\s+', ' ', 'g'))
                       ORDER BY doc_id ASC, line_no ASC) AS rn
            FROM ln)"""


def line_dedup_sql(dialect: str) -> str:
    """Keep-list at line grain: (doc_id, line_no, keep) — keep iff
    this is the corpus-first occurrence of the normalized line.

    Scale: one Generate over the token stream, one line-hash-keyed
    rank window (linear shuffle on the hash — duplicates of one line
    colocate; boilerplate-heavy corpora skew that key, and the
    window degrades gracefully because only rank-1 survives: a
    salted two-level pre-rank (the #131 pattern) drops in if one
    line dominates a corpus)."""
    return f"""{_line_cte(dialect)}
        SELECT doc_id, line_no, (rn = 1) AS keep
        FROM ranked
    """


def line_dedup_report_sql(dialect: str) -> str:
    """Per-doc removal report over the same chain: how many lines
    and what integer-bp share of the doc's char mass line-dedup
    removed — the per-doc cost a curation review reads before
    enabling corpus-wide line dedup (a doc losing most of its mass
    is boilerplate; composition with the span rewriter #113 is
    one-directional: run line dedup FIRST, spans second)."""
    div = "div" if dialect == "spark" else "//"
    return f"""{_line_cte(dialect)}
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_lines,
               CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_kept,
               CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_removed,
               CAST((10000 * SUM(CASE WHEN rn > 1 THEN nchars ELSE 0 END))
                    {div} SUM(nchars) AS BIGINT) AS removed_char_bp
        FROM ranked GROUP BY doc_id
    """


# ---------------------------------------------------------------------------
# Multi-round BPE merge training (Sennrich et al. 2016) — extends
# the first-merge pair count (#169) into a usable tokenizer-training
# primitive: K unrolled merge rounds, each counting adjacent-symbol
# pairs on the DISTINCT-WORD table (weighted by corpus word
# frequency), picking the top pair, and APPLYING it greedily
# left-to-right (non-overlapping — "aaa" + merge "aa" yields
# ["aa","a"], one merge, exactly like reference BPE trainers).
# ---------------------------------------------------------------------------

BPE_ROUNDS = 3


def _bpe_chain(dialect: str, k: int = BPE_ROUNDS) -> str:
    """The shared k-round merge-training CTE chain (wf/s0 …
    top{r}/s{r}), consumed by bpe_merge_rounds_sql (per-round merge
    report) and bpe_tokenize_sql (apply the learned vocab per doc).

    Greedy application is gaps-and-islands: positions matching the
    round's top pair form runs; within a run merges fire at offsets
    0, 2, 4, … from the run head (a merged position consumes its
    right neighbor, so the next candidate is two away). All string /
    integer algebra — engine-exact; ties break (count DESC, pair
    ASC).

    Scale: every per-round step runs on the VOCABULARY (distinct
    words × word length rows), never the corpus — the corpus is read
    once for word frequencies (map-side combined). Windows partition
    by word (tiny partitions); the top pair is a 1-row broadcast.
    The k round chains nest, so Spark re-evaluates round r's lineage
    in later rounds' arms — bounded by k × vocab, fine for the
    unrolled-training use; duck materializes shared rounds
    (CTE-inlining gotcha)."""
    mat = "MATERIALIZED " if dialect != "spark" else ""
    if dialect == "spark":
        sql = """
        WITH wf AS (
            SELECT w, CAST(COUNT(*) AS BIGINT) AS freq
            FROM (SELECT explode(split(text, ' ')) AS w FROM documents)
            WHERE LENGTH(w) >= 2 GROUP BY w)
        , s0 AS (
            SELECT w, freq, CAST(pos AS BIGINT) AS pos,
                   substr(w, pos, 1) AS sym
            FROM wf LATERAL VIEW explode(sequence(1, LENGTH(w))) AS pos)"""
    else:
        sql = """
        WITH wf AS (
            SELECT w, CAST(COUNT(*) AS BIGINT) AS freq
            FROM (SELECT unnest(string_split(text, ' ')) AS w
                  FROM documents)
            WHERE LENGTH(w) >= 2 GROUP BY w)
        , s0 AS (
            SELECT w, freq, CAST(pos AS BIGINT) AS pos,
                   substr(w, CAST(pos AS INTEGER), 1) AS sym
            FROM wf, unnest(range(1, LENGTH(w) + 1)) AS t(pos))"""
    for r in range(1, k + 1):
        prev = f"s{r - 1}"
        sql += f"""
        , d{r} AS (
            SELECT w, freq,
                   CAST(row_number() OVER (
                       PARTITION BY w ORDER BY pos ASC) AS BIGINT) AS pos,
                   sym
            FROM {prev})
        , p{r} AS (
            SELECT w, freq, pos, sym,
                   lead(sym) OVER (PARTITION BY w ORDER BY pos ASC) AS nxt
            FROM d{r})
        , pc{r} AS {mat}(
            SELECT sym || nxt AS pair,
                   CAST(SUM(freq) AS BIGINT) AS n_occurrences,
                   CAST(COUNT(*) AS BIGINT) AS n_word_types
            FROM p{r} WHERE nxt IS NOT NULL
            GROUP BY sym || nxt)
        , top{r} AS (
            SELECT pair, n_occurrences, n_word_types FROM pc{r}
            ORDER BY n_occurrences DESC, pair ASC LIMIT 1)
        , m{r} AS (
            SELECT p.w, p.freq, p.pos, p.sym, p.nxt,
                   COALESCE(p.sym || p.nxt = t.pair, FALSE) AS is_match
            FROM p{r} p CROSS JOIN top{r} t)
        , g{r} AS (
            SELECT *,
                   CASE WHEN is_match THEN pos - row_number() OVER (
                       PARTITION BY w, is_match ORDER BY pos ASC)
                   END AS isl
            FROM m{r})
        , a{r} AS (
            SELECT *,
                   CASE WHEN is_match AND (pos - MIN(pos) OVER (
                            PARTITION BY w, isl)) % 2 = 0
                        THEN 1 ELSE 0 END AS do_merge
            FROM g{r})
        , c{r} AS (
            SELECT *, lag(do_merge, 1, 0) OVER (
                       PARTITION BY w ORDER BY pos ASC) AS consumed
            FROM a{r})
        , s{r} AS {mat}(
            SELECT w, freq, pos,
                   CASE WHEN do_merge = 1 THEN sym || nxt ELSE sym END
                       AS sym
            FROM c{r} WHERE consumed = 0)"""
    return sql


def bpe_merge_rounds_sql(dialect: str, k: int = BPE_ROUNDS) -> str:
    """Learned vocab of the first k merges + the corpus token count
    after each round (see _bpe_chain for semantics and scale)."""
    arms = [
        f"""
        SELECT CAST({r} AS BIGINT) AS round, t.pair, t.n_occurrences,
               t.n_word_types,
               (SELECT CAST(SUM(freq) AS BIGINT) FROM s{r})
                   AS corpus_tokens_after
        FROM top{r} t"""
        for r in range(1, k + 1)
    ]
    return _bpe_chain(dialect, k) + "\n        " + " UNION ALL ".join(arms)


def bpe_tokenize_sql(dialect: str, k: int = BPE_ROUNDS) -> str:
    """APPLY the learned k-merge vocab per document: each word's
    post-merge symbol count comes from the word->n_sym map the
    training chain already produced (vocabulary-bounded), joined to
    one corpus-scale word explode — the per-doc BPE token count and
    chars-per-token compression a data-loader budget reads.
    Single-char words (excluded from training, nothing to merge)
    tokenize to 1.

    Scale: ONE corpus Generate + one join against the vocab dim
    (broadcast-able) + one doc-keyed aggregate."""
    div = "div" if dialect == "spark" else "//"
    if dialect == "spark":
        dw = """
        , dw AS (
            SELECT doc_id, w
            FROM (SELECT doc_id, explode(split(text, ' ')) AS w
                  FROM documents))"""
    else:
        dw = """
        , dw AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS w
            FROM documents)"""
    return f"""{_bpe_chain(dialect, k)}
        , wmap AS (
            SELECT w, CAST(COUNT(*) AS BIGINT) AS n_sym
            FROM s{k} GROUP BY w)
        {dw}
        SELECT d.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_words,
               CAST(SUM(LENGTH(d.w)) AS BIGINT) AS n_chars,
               CAST(SUM(CASE WHEN LENGTH(d.w) < 2 THEN 1
                        ELSE m.n_sym END) AS BIGINT) AS n_tokens_bpe,
               CAST((10000 * SUM(CASE WHEN LENGTH(d.w) < 2 THEN 1
                         ELSE m.n_sym END)) {div} SUM(LENGTH(d.w))
                    AS BIGINT) AS tokens_per_char_bp
        FROM dw d LEFT JOIN wmap m ON m.w = d.w
        GROUP BY d.doc_id
    """


# ---------------------------------------------------------------------------
# RAKE keyword extraction (Rose et al. 2010)
# ---------------------------------------------------------------------------

RAKE_TOP = 20


def rake_keywords_sql(dialect: str) -> str:
    """RAKE (Rapid Automatic Keyword Extraction, Rose et al. 2010)
    adapted to this corpus: candidate phrases are maximal runs of
    non-stopword tokens delimited by the STOPWORDS list (the corpus
    has no punctuation, so stopword boundaries are the only
    delimiters — exactly RAKE's degenerate case). Per word,
    freq = occurrences inside candidate phrases and deg = the sum
    of the lengths of the phrases each occurrence sits in (RAKE's
    co-occurrence degree: deg/freq is the mean phrase length the
    word appears in, so words that anchor long multi-word phrases
    outrank equally-frequent words that appear alone). Score is
    exact centi-integer floor((100*deg)/freq); top RAKE_TOP words
    by (score DESC, token ASC).

    The phrase split is STRING-level, not positional: spaces are
    doubled so each stopword occurrence owns a private space pair,
    every ' <stop> ' becomes a '|' delimiter (doubling makes the
    replacements overlap-free: 'a of' would otherwise lose the
    shared space to the first match), and one split produces the
    phrase runs — no gaps-and-islands window over token positions,
    so the whole extraction is two Generates and one hash
    aggregate, linear in corpus size with no per-doc sort.

    Scale: phrase rows ≈ stopword occurrences + docs; word rows =
    non-stop tokens — both linear; the only shuffle is the final
    token-keyed aggregate and the constant top-k."""
    s = "replace(concat(' ', text, ' '), ' ', '  ')"
    for w in STOPWORDS:
        s = f"replace({s}, ' {w} ', '|')"
    if dialect == "spark":
        split_phr = f"explode(split({s}, '[|]'))"
        toks = "filter(split(trim(p), ' '), x -> x <> '')"
        explode_tok = "explode(toks)"
        div = "div"
        return f"""
        WITH ph AS (
            SELECT doc_id, trim(p) AS p FROM (
                SELECT doc_id, {split_phr} AS p FROM documents) r
            WHERE trim(p) <> '')
        , pl AS (
            SELECT doc_id, {toks} AS toks FROM ph)
        , pw AS (
            SELECT doc_id, size(toks) AS n, tok
            FROM pl LATERAL VIEW explode(toks) ex AS tok)
        , stats AS (
            SELECT tok AS token,
                   CAST(COUNT(*) AS BIGINT) AS freq,
                   CAST(SUM(n) AS BIGINT) AS deg
            FROM pw GROUP BY tok)
        SELECT token, freq, deg,
               CAST((100 * deg) {div} freq AS BIGINT) AS score_centi,
               CAST(rn AS BIGINT) AS kw_rank
        FROM (
            SELECT *, row_number() OVER (
                ORDER BY (100 * deg) {div} freq DESC, token ASC) AS rn
            FROM stats) t
        WHERE rn <= {RAKE_TOP}
        """
    return f"""
        WITH ph AS (
            SELECT doc_id, trim(p) AS p FROM (
                SELECT doc_id, unnest(string_split({s}, '|')) AS p
                FROM documents) r
            WHERE trim(p) <> '')
        , pl AS (
            SELECT doc_id,
                   list_filter(string_split(trim(p), ' '),
                               x -> x <> '') AS toks
            FROM ph)
        , pw AS (
            SELECT doc_id, len(toks) AS n, unnest(toks) AS tok
            FROM pl)
        , stats AS (
            SELECT tok AS token,
                   CAST(COUNT(*) AS BIGINT) AS freq,
                   CAST(SUM(n) AS BIGINT) AS deg
            FROM pw GROUP BY tok)
        SELECT token, freq, deg,
               CAST((100 * deg) // freq AS BIGINT) AS score_centi,
               CAST(rn AS BIGINT) AS kw_rank
        FROM (
            SELECT *, row_number() OVER (
                ORDER BY (100 * deg) // freq DESC, token ASC) AS rn
            FROM stats) t
        WHERE rn <= {RAKE_TOP}
        """


RAKE_MAX_PHRASE = 6  # practical RAKE caps candidate length
RAKE_PHRASE_TOP = 15


def rake_phrases_sql(dialect: str) -> str:
    """Phrase-grain RAKE: candidate phrases (the same stopword-
    delimited runs as rake_keywords_sql, capped at RAKE_MAX_PHRASE
    words — the standard practical cap; uncapped runs in a
    punctuation-free corpus degenerate to whole-document spans)
    scored by the RAKE rule: phrase score = Σ member-word
    score (with multiplicity), where word score is the corpus-wide
    deg/freq from the word-grain pass. Top RAKE_PHRASE_TOP distinct
    phrases by (score DESC, phrase ASC) with occurrence counts.

    Scale: word stats are vocabulary-bounded; distinct phrases are
    corpus-linear with a constant-width cap; the phrase-token
    explode is ≤ RAKE_MAX_PHRASE rows per distinct phrase; one
    token-keyed broadcastable join against the (tiny) word-stat
    table; constant top-k."""
    s = "replace(concat(' ', text, ' '), ' ', '  ')"
    for w in STOPWORDS:
        s = f"replace({s}, ' {w} ', '|')"
    div = "div" if dialect == "spark" else "//"
    if dialect == "spark":
        split_phr = f"explode(split({s}, '[|]'))"
        toks = "filter(split(trim(p), ' '), x -> x <> '')"
        pl = f"""
        , pl AS (
            SELECT doc_id, {toks} AS toks FROM ph)
        , pw AS (
            SELECT doc_id, size(toks) AS n, tok
            FROM pl LATERAL VIEW explode(toks) ex AS tok)"""
        phr = """
        , phr AS (
            SELECT array_join(toks, ' ') AS phrase, size(toks) AS n_words
            FROM pl WHERE size(toks) <= {cap})
        , ph_occ AS (
            SELECT phrase, MIN(n_words) AS n_words,
                   CAST(COUNT(*) AS BIGINT) AS n_occurrences
            FROM phr GROUP BY phrase)
        , ph_tok AS (
            SELECT phrase, tok
            FROM (SELECT phrase FROM ph_occ)
            LATERAL VIEW explode(split(phrase, ' ')) ex2 AS tok)"""
    else:
        split_phr = f"unnest(string_split({s}, '|')) "
        pl = """
        , pl AS (
            SELECT doc_id,
                   list_filter(string_split(trim(p), ' '),
                               x -> x <> '') AS toks
            FROM ph)
        , pw AS (
            SELECT doc_id, len(toks) AS n, unnest(toks) AS tok
            FROM pl)"""
        phr = """
        , phr AS (
            SELECT array_to_string(toks, ' ') AS phrase,
                   len(toks) AS n_words
            FROM pl WHERE len(toks) <= {cap})
        , ph_occ AS (
            SELECT phrase, MIN(n_words) AS n_words,
                   CAST(COUNT(*) AS BIGINT) AS n_occurrences
            FROM phr GROUP BY phrase)
        , ph_tok AS (
            SELECT phrase, unnest(string_split(phrase, ' ')) AS tok
            FROM (SELECT phrase FROM ph_occ) po)"""
    return f"""
        WITH ph AS (
            SELECT doc_id, trim(p) AS p FROM (
                SELECT doc_id, {split_phr} AS p FROM documents) r
            WHERE trim(p) <> '')
        {pl}
        , stats AS (
            SELECT tok AS token,
                   CAST(COUNT(*) AS BIGINT) AS freq,
                   CAST(SUM(n) AS BIGINT) AS deg
            FROM pw GROUP BY tok)
        {phr.format(cap=RAKE_MAX_PHRASE)}
        , ps AS (
            SELECT t.phrase,
                   CAST(SUM((100 * s2.deg) {div} s2.freq) AS BIGINT)
                       AS score_centi
            FROM ph_tok t JOIN stats s2 ON s2.token = t.tok
            GROUP BY t.phrase)
        SELECT phrase, n_words, n_occurrences, score_centi,
               CAST(rn AS BIGINT) AS phrase_rank
        FROM (
            SELECT o.phrase, o.n_words, o.n_occurrences,
                   p2.score_centi,
                   row_number() OVER (
                       ORDER BY p2.score_centi DESC, o.phrase ASC) AS rn
            FROM ph_occ o JOIN ps p2 ON p2.phrase = o.phrase) t
        WHERE rn <= {RAKE_PHRASE_TOP}
        """


def bpe_fertility_sql(dialect: str, k: int = BPE_ROUNDS) -> str:
    """Tokenizer FERTILITY per language: subword tokens emitted per
    whitespace word under the learned k-merge vocab — the
    multilingual-equity metric (a language with fertility 2× pays
    2× the sequence length for the same text; the number behind
    vocab-allocation debates). Same vocabulary-bounded word→n_sym
    map as bpe_tokenize_sql, grouped by the documents' lang column
    instead of doc_id."""
    div = "div" if dialect == "spark" else "//"
    if dialect == "spark":
        dw = """
        , dw AS (
            SELECT lang, w
            FROM (SELECT lang, explode(split(text, ' ')) AS w
                  FROM documents))"""
    else:
        dw = """
        , dw AS (
            SELECT lang, unnest(string_split(text, ' ')) AS w
            FROM documents)"""
    return f"""{_bpe_chain(dialect, k)}
        , wmap AS (
            SELECT w, CAST(COUNT(*) AS BIGINT) AS n_sym
            FROM s{k} GROUP BY w)
        {dw}
        SELECT d.lang,
               CAST(COUNT(*) AS BIGINT) AS n_words,
               CAST(SUM(CASE WHEN LENGTH(d.w) < 2 THEN 1
                        ELSE m.n_sym END) AS BIGINT) AS n_tokens_bpe,
               CAST((10000 * SUM(CASE WHEN LENGTH(d.w) < 2 THEN 1
                         ELSE m.n_sym END)) {div} COUNT(*)
                    AS BIGINT) AS fertility_bp,
               CAST((100 * SUM(LENGTH(d.w)))
                    {div} SUM(CASE WHEN LENGTH(d.w) < 2 THEN 1
                          ELSE m.n_sym END) AS BIGINT)
                   AS chars_per_token_centi
        FROM dw d LEFT JOIN wmap m ON m.w = d.w
        GROUP BY d.lang
    """
