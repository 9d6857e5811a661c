"""Corpus sampling and sequence-packing operators for a
training-data pipeline over the `documents` table.

- ``sample_stratified``: deterministic hash-based stratified
  sampling — per-language keep rates applied via an md5-derived
  uniform, so the sample is reproducible run-to-run, engine-to-engine
  (no RNG state), and embarrassingly parallel: the keep decision is a
  pure per-row function, no shuffle at all at any scale.
- ``chunk_windows``: split each document into fixed-size token
  windows (non-overlapping sequence packing for LLM pre-training) —
  one generator explode per doc; work and output are proportional to
  corpus token count, shuffle-free.

Cross-engine determinism: the sampling uniform is the first 8 hex
chars of md5(doc_id) parsed as an integer (exact in both engines);
chunk identity is md5 of the space-joined window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# per-language keep rates in basis points: downsample the dominant
# language, keep the tail (the usual rebalancing move)
SAMPLE_RATES_BP: dict[str, int] = {
    "en": 2500,
    "de": 7500,
    "es": 7500,
    "fr": 7500,
    "zh": 7500,
}
DEFAULT_RATE_BP = 5000
CHUNK_TOKENS = 32


def _hash_bp(col: Column) -> Column:
    """Deterministic uniform in [0, 10000) from md5 — reference's
    workload generator uses seeded RNG weights
    (cdc_data_generator.py:92-512); hash-mod sampling is the
    distributed-safe equivalent (no RNG state per partition)."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast(
            "long"
        )
        % 10000
    )


def sample_stratified(docs: DataFrame) -> DataFrame:
    rate_map = F.create_map(
        *[F.lit(x) for kv in SAMPLE_RATES_BP.items() for x in kv]
    )
    rate = F.coalesce(rate_map[F.col("lang")], F.lit(DEFAULT_RATE_BP))
    return (
        docs.select(
            "doc_id",
            "lang",
            "source",
            _hash_bp(F.col("doc_id")).alias("sample_u"),
            rate.cast("long").alias("rate_bp"),
        )
        .where(F.col("sample_u") < F.col("rate_bp"))
    )


def _rate_case_sql() -> str:
    whens = " ".join(
        f"WHEN lang = '{k}' THEN {v}" for k, v in SAMPLE_RATES_BP.items()
    )
    return f"CASE {whens} ELSE {DEFAULT_RATE_BP} END"


SAMPLE_STRATIFIED_SQL = f"""
    WITH u AS (
        SELECT doc_id, lang, source,
               CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                    AS BIGINT) % 10000 AS sample_u,
               CAST({_rate_case_sql()} AS BIGINT) AS rate_bp
        FROM documents)
    SELECT doc_id, lang, source, sample_u, rate_bp
    FROM u WHERE sample_u < rate_bp
"""


def chunk_windows(docs: DataFrame) -> DataFrame:
    toks = F.split(F.col("text"), " ")
    n_chunks = F.expr(f"(size(split(text, ' ')) + {CHUNK_TOKENS - 1}) div {CHUNK_TOKENS}")
    exploded = docs.select(
        "doc_id",
        toks.alias("_toks"),
        F.explode(F.sequence(F.lit(0), (n_chunks - 1).cast("int"))).alias(
            "chunk_idx"
        ),
    )
    window = F.slice(
        F.col("_toks"), F.col("chunk_idx") * CHUNK_TOKENS + 1, CHUNK_TOKENS
    )
    return exploded.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.size(window).cast("long").alias("n_tokens"),
        F.md5(F.array_join(window, " ")).alias("chunk_md5"),
    )


CHUNK_WINDOWS_SQL = f"""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    , e AS (
        SELECT doc_id, toks,
               unnest(range(0, (len(toks) + {CHUNK_TOKENS - 1}) // {CHUNK_TOKENS}))
                   AS chunk_idx
        FROM t)
    SELECT doc_id, chunk_idx,
           CAST(len(toks[chunk_idx * {CHUNK_TOKENS} + 1 :
                         chunk_idx * {CHUNK_TOKENS} + {CHUNK_TOKENS}])
                AS BIGINT) AS n_tokens,
           md5(array_to_string(
               toks[chunk_idx * {CHUNK_TOKENS} + 1 :
                    chunk_idx * {CHUNK_TOKENS} + {CHUNK_TOKENS}], ' '))
               AS chunk_md5
    FROM e
"""


# ---------------------------------------------------------------------------
# UniMax budget allocation (Chung et al. 2023, "UniMax: Fairer and
# More Effective Language Sampling for Large-Scale Multilingual
# Pretraining"): waterfill a document budget across languages —
# repeatedly give every still-open language an equal share of the
# remaining budget; languages smaller than their share are taken
# WHOLE (capped) and the leftover re-waterfills across the rest.
# ---------------------------------------------------------------------------

UNIMAX_ROUNDS = 3  # fixpoint on this data in 3 rounds (law-pinned vs 4)


def unimax_sql(dialect: str, rounds: int = UNIMAX_ROUNDS) -> str:
    """Dual-dialect unrolled waterfilling. Budget = 80% of the corpus
    (floor), all algebra integer (floor division), so both engines
    agree bit-for-bit. Each round updates only the tiny per-language
    state table; the single corpus-scale operation is the initial
    GROUP BY lang count.

    Scale (100 TB): the per-language table is bounded by the number
    of languages (~100s), so every waterfilling round is a broadcast-
    sized computation regardless of corpus size; the allocation
    output then drives a hash-threshold sample (see
    sample_stratified) with no further shuffle. Convergence: capped
    languages only gain members per round, so n_rounds <= n_langs;
    the fixpoint certificate (rounds vs rounds+1 identical) is pinned
    in tests/test_round6.py."""
    div = "div" if dialect == "spark" else "//"
    ctes = f"""
        WITH sizes AS (
            SELECT lang, CAST(COUNT(*) AS BIGINT) AS n
            FROM documents GROUP BY lang)
        , budget AS (
            SELECT CAST((4 * SUM(n)) {div} 5 AS BIGINT) AS b FROM sizes)
        , c0 AS (
            SELECT lang, n, FALSE AS capped FROM sizes)"""
    prev = "c0"
    for i in range(1, rounds + 1):
        ctes += f"""
        , st{i} AS (
            SELECT CAST(b.b - COALESCE(SUM(CASE WHEN c.capped THEN c.n
                                          ELSE CAST(0 AS BIGINT) END), 0)
                   AS BIGINT) AS remb,
                   CAST(COALESCE(SUM(CASE WHEN c.capped THEN 0 ELSE 1 END), 0)
                   AS BIGINT) AS nrem
            FROM {prev} c CROSS JOIN budget b
            GROUP BY b.b)
        , c{i} AS (
            SELECT c.lang, c.n,
                   c.capped OR COALESCE(
                       c.n <= s.remb {div} NULLIF(s.nrem, 0), FALSE)
                       AS capped
            FROM {prev} c CROSS JOIN st{i} s)"""
        prev = f"c{i}"
    return f"""{ctes}
        , stf AS (
            SELECT CAST(b.b - COALESCE(SUM(CASE WHEN c.capped THEN c.n
                                          ELSE CAST(0 AS BIGINT) END), 0)
                   AS BIGINT) AS remb,
                   CAST(COALESCE(SUM(CASE WHEN c.capped THEN 0 ELSE 1 END), 0)
                   AS BIGINT) AS nrem
            FROM {prev} c CROSS JOIN budget b
            GROUP BY b.b)
        SELECT c.lang, c.n AS n_docs,
               CASE WHEN c.capped THEN c.n
                    ELSE s.remb {div} NULLIF(s.nrem, 0) END AS allocation,
               c.capped AS is_capped
        FROM {prev} c CROSS JOIN stf s
    """
