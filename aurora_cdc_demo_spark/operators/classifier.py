"""Hashed bag-of-words linear quality classifier (fasttext-style):
token → md5 hash bucket → fixed-point weight, mean-pooled + bias →
logit. The model-based gate paradigm beside the rule batteries (C4,
Gopher) and the LM-familiarity scores: vocabulary-free (the feature
map is a hash, so the plan is identical whatever the corpus) and
exact-integer end to end (e4 weights, posrem-floor mean — weight sums
go negative and Spark div truncates while DuckDB // floors).

Weights are data-independent constants generated once in Python from
a fixed seed and inlined (the JL-sign-matrix rule: model parameters
are artifacts shipped WITH the job, never computed in-engine). A real
deployment pastes its trained weights here unchanged.

Shared by the batch gate (registry: text_classifier_score, the v7
keep-list model gate) and the streaming admission gate
(streaming/curation.CurationStore(model_gate=True)) — ONE scoring
definition, so the stream-equals-batch law is a law about state
handling, not about two scorers drifting apart.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CLF_BUCKETS = 64
CLF_BIAS_E4 = 1500


def clf_weights() -> list[int]:
    import random

    rng = random.Random(4242)
    return [rng.randrange(-20000, 20001) for _ in range(CLF_BUCKETS)]


def clf_weight_table() -> str:
    rows = ", ".join(f"({b}, {w})" for b, w in enumerate(clf_weights()))
    return f"(VALUES {rows}) w(bucket, w_e4)"


def clf_score_sql(dialect: str) -> str:
    """Dual-dialect per-doc scoring over ``documents``."""
    div = "div" if dialect == "spark" else "//"
    if dialect == "spark":
        h = "CAST(conv(substring(md5(token), 1, 8), 16, 10) AS BIGINT)"
        tok = (
            "SELECT doc_id, token"
            " FROM documents"
            " LATERAL VIEW explode(split(text, ' ')) t AS token"
        )
    else:
        h = "CAST('0x' || substr(md5(token), 1, 8) AS BIGINT)"
        tok = (
            "SELECT doc_id, unnest(string_split(text, ' ')) AS token"
            " FROM documents"
        )
    mean = f"((s - (((s % n) + n) % n)) {div} n)"
    return f"""
        WITH toks AS ({tok})
        , feats AS (
            SELECT doc_id, ({h}) % {CLF_BUCKETS} AS bucket
            FROM toks)
        , scored AS (
            SELECT f.doc_id,
                   CAST(SUM(w.w_e4) AS BIGINT) AS s,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM feats f JOIN {clf_weight_table()}
              ON w.bucket = f.bucket
            GROUP BY f.doc_id)
        SELECT doc_id, n AS n_tokens,
               {mean} + {CLF_BIAS_E4} AS logit_e4,
               CASE WHEN {mean} + {CLF_BIAS_E4} > 0
                    THEN 1 ELSE 0 END AS keep_flag
        FROM scored
    """


def clf_score_df(docs: DataFrame) -> DataFrame:
    """DataFrame-API scorer (identical algebra to clf_score_sql) for
    callers without a temp-view context — e.g. the streaming
    admission gate inside foreachBatch. The weight map is a 64-entry
    element_at literal (pure codegen — no join, no Python UDF)."""
    wmap = F.create_map(
        *[
            F.lit(v)
            for b, w in enumerate(clf_weights())
            for v in (b, w)
        ]
    )
    tok = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
    )
    feats = tok.select(
        "doc_id",
        F.expr(
            "CAST(conv(substring(md5(token), 1, 8), 16, 10) AS BIGINT)"
            f" % {CLF_BUCKETS}"
        ).alias("bucket"),
    )
    scored = feats.select(
        "doc_id", wmap[F.col("bucket")].alias("w_e4")
    ).groupBy("doc_id").agg(
        F.sum("w_e4").cast("long").alias("s"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    mean = "((s - (((s % n) + n) % n)) div n)"
    return scored.select(
        "doc_id",
        F.col("n").alias("n_tokens"),
        F.expr(f"{mean} + {CLF_BIAS_E4}").alias("logit_e4"),
        F.expr(
            f"CASE WHEN {mean} + {CLF_BIAS_E4} > 0 THEN 1 ELSE 0 END"
        ).alias("keep_flag"),
    )
