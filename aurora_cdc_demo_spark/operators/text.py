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
        # single-space tokenization: token chars = chars - (n-1) separators
        F.round((n_chars - (n_tok - 1)).cast("double") / n_tok, 4).alias(
            "avg_token_len"
        ),
    )


def quality_score(docs: DataFrame) -> DataFrame:
    toks = _tokens()
    n_tok = F.size(toks).cast("long")
    n_stop = F.size(F.filter(toks, _in_list(STOPWORDS))).cast("long")
    n_uniq = F.size(F.array_distinct(toks)).cast("long")
    stop_ratio = n_stop.cast("double") / n_tok
    uniq_ratio = n_uniq.cast("double") / n_tok
    len_score = F.least(n_tok, F.lit(100)).cast("double") / F.lit(100.0)
    quality = F.lit(0.3) * uniq_ratio + F.lit(0.3) * (F.lit(1.0) - stop_ratio) + (
        F.lit(0.4) * len_score
    )
    return docs.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(uniq_ratio, 4).alias("unique_ratio"),
        F.round(len_score, 4).alias("length_score"),
        F.round(quality, 4).alias("quality"),
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
               ROUND(CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
                     / len(string_split(text, ' ')), 4) AS avg_token_len
        FROM documents
    """,
    "text_quality_score": """
        WITH t AS (
            SELECT doc_id,
                   string_split(text, ' ') AS toks,
                   len(string_split(text, ' ')) AS n_tok
            FROM documents)
        SELECT doc_id,
               n_tok AS n_tokens,
               ROUND(CAST(len(list_filter(toks,
                    x -> x IN ('the', 'a', 'of', 'and'))) AS DOUBLE) / n_tok, 4)
                   AS stopword_ratio,
               ROUND(CAST(len(list_distinct(toks)) AS DOUBLE) / n_tok, 4)
                   AS unique_ratio,
               ROUND(CAST(LEAST(n_tok, 100) AS DOUBLE) / 100.0, 4) AS length_score,
               ROUND(0.3 * (CAST(len(list_distinct(toks)) AS DOUBLE) / n_tok)
                     + 0.3 * (1.0 - CAST(len(list_filter(toks,
                          x -> x IN ('the', 'a', 'of', 'and'))) AS DOUBLE) / n_tok)
                     + 0.4 * (CAST(LEAST(n_tok, 100) AS DOUBLE) / 100.0), 4)
                   AS quality
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
