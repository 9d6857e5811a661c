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
        F.expr(
            f"(300000 * {uniq} + 300000 * ({n} - {stop})"
            f" + 4000 * {n} * least({n}, 100)) div (100 * {n})"
        ).alias("quality_bp"),
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
