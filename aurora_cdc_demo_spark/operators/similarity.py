"""Embedding similarity-search operators: brute-force cosine top-k
(the ANN baseline), near-dup pairs, per-label centroids, and an
IVF-style cell-probed ANN.

Cross-engine determinism: dot products / norms are generated as
explicit left-associated per-dimension expression chains in BOTH the
Spark SQL and DuckDB dialects — identical IEEE double operations in
identical order, so cosine values are bit-identical and rankings
match the oracle without tolerance hacks. (Float32 inputs are cast
to double element-wise; exact.)

Scale design (100 TB):
- brute-force top-k is the correctness baseline: a broadcast of the
  (small) query set against a partitioned scan of the corpus — no
  shuffle of the corpus, one partial top-k per partition (window
  over query_id after AQE-coalesced exchange of only
  |queries|*|corpus_partition_topk| rows).
- the IVF path is the scale answer: assign once to a coarse cell
  (seed vectors), then probe only the query's cell — candidate set
  shrinks by ~n_cells; the cell assignment is itself a broadcast
  join (seeds are tiny).
- near-dup at scale composes with dedup.lsh-style blocking; the
  all-pairs form here is the oracle twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DIMS = 64
TOPK = 5
N_QUERIES = 10  # vec_id < 10
N_SEEDS = 16  # IVF coarse cells: vec_id < 16 as seed vectors
NEAR_DUP_THRESHOLD = 0.4


def _elem(col: str, i: int, dialect: str) -> str:
    if dialect == "spark":
        return f"CAST(element_at({col}, {i}) AS DOUBLE)"
    return f"CAST({col}[{i}] AS DOUBLE)"


def _dot(a: str, b: str, dialect: str) -> str:
    """Left-associated double summation of elementwise products.

    Spark uses a sequential `aggregate` fold over `zip_with` —
    bit-identical to DuckDB's explicit left-associated `+` chain
    (0.0 + v1 is exact), but with O(1) codegen size instead of a
    64-term expression (cuts per-query compile time)."""
    if dialect == "spark":
        return (
            f"aggregate(zip_with({a}, {b}, "
            "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
            "CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
        )
    return " + ".join(
        f"({_elem(a, i, dialect)} * {_elem(b, i, dialect)})"
        for i in range(1, DIMS + 1)
    )


def _norm(a: str, dialect: str) -> str:
    return f"SQRT({_dot(a, a, dialect)})"


def topk_sql(dialect: str) -> str:
    return f"""
        WITH v AS (
            SELECT vec_id, embedding, {_norm('embedding', dialect)} AS nrm
            FROM embeddings)
        , q AS (
            SELECT vec_id AS query_id, embedding AS qe, nrm AS qn
            FROM v WHERE vec_id < {N_QUERIES})
        , scored AS (
            SELECT q.query_id, v.vec_id AS neighbor_id,
                   ({_dot('q.qe', 'v.embedding', dialect)}) / (q.qn * v.nrm) AS cos
            FROM q CROSS JOIN v WHERE v.vec_id <> q.query_id)
        , ranked AS (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rn
            FROM scored)
        SELECT query_id, neighbor_id, CAST(rn AS BIGINT) AS nn_rank,
               ROUND(cos, 6) AS cosine
        FROM ranked WHERE rn <= {TOPK}
    """


def near_dup_sql(dialect: str) -> str:
    return f"""
        WITH v AS (
            SELECT vec_id, embedding, {_norm('embedding', dialect)} AS nrm
            FROM embeddings)
        , scored AS (
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                   ({_dot('a.embedding', 'b.embedding', dialect)}) / (a.nrm * b.nrm)
                       AS cos
            FROM v a JOIN v b ON a.vec_id < b.vec_id)
        SELECT vec_a, vec_b, ROUND(cos, 6) AS cosine
        FROM scored WHERE cos >= {NEAR_DUP_THRESHOLD}
    """


def centroids_sql(dialect: str) -> str:
    sq_sum = " + ".join(
        f"(AVG({_elem('embedding', i, dialect)}) * AVG({_elem('embedding', i, dialect)}))"
        for i in range(1, DIMS + 1)
    )
    return f"""
        SELECT label, COUNT(*) AS n_vecs,
               ROUND(SQRT({sq_sum}), 4) AS centroid_norm
        FROM embeddings GROUP BY label
    """


def ivf_topk_sql(dialect: str) -> str:
    return f"""
        WITH v AS (
            SELECT vec_id, embedding, {_norm('embedding', dialect)} AS nrm
            FROM embeddings)
        , seeds AS (
            SELECT vec_id AS seed_id, embedding AS se, nrm AS snrm
            FROM v WHERE vec_id < {N_SEEDS})
        , assign AS (
            SELECT v.vec_id, v.embedding, v.nrm, s.seed_id,
                   row_number() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY ({_dot('v.embedding', 's.se', dialect)})
                                / (v.nrm * s.snrm) DESC,
                                s.seed_id ASC) AS rn
            FROM v CROSS JOIN seeds s)
        , cells AS (
            SELECT vec_id, embedding, nrm, seed_id AS cell
            FROM assign WHERE rn = 1)
        , q AS (
            SELECT vec_id AS query_id, embedding AS qe, nrm AS qn, cell
            FROM cells WHERE vec_id < {N_QUERIES})
        , cand AS (
            SELECT q.query_id, c.vec_id AS neighbor_id, q.cell,
                   ({_dot('q.qe', 'c.embedding', dialect)}) / (q.qn * c.nrm) AS cos
            FROM q JOIN cells c ON c.cell = q.cell AND c.vec_id <> q.query_id)
        , ranked AS (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rn
            FROM cand)
        SELECT query_id, neighbor_id, CAST(rn AS BIGINT) AS nn_rank,
               ROUND(cos, 6) AS cosine, cell
        FROM ranked WHERE rn <= {TOPK}
    """


N_PROBES = 2


def ivf_multiprobe_sql(dialect: str) -> str:
    """IVF with multi-probe: each query searches its N_PROBES nearest
    coarse cells instead of one — the standard recall/latency knob
    (e.g. FAISS nprobe).  Corpus vectors still live in exactly one
    cell, so the probe fan-out multiplies candidates by at most
    N_PROBES, not the corpus size."""
    return f"""
        WITH v AS (
            SELECT vec_id, embedding, {_norm('embedding', dialect)} AS nrm
            FROM embeddings)
        , seeds AS (
            SELECT vec_id AS seed_id, embedding AS se, nrm AS snrm
            FROM v WHERE vec_id < {N_SEEDS})
        , assign AS (
            SELECT v.vec_id, v.embedding, v.nrm, s.seed_id,
                   row_number() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY ({_dot('v.embedding', 's.se', dialect)})
                                / (v.nrm * s.snrm) DESC,
                                s.seed_id ASC) AS rn
            FROM v CROSS JOIN seeds s)
        , cells AS (
            SELECT vec_id, embedding, nrm, seed_id AS cell
            FROM assign WHERE rn = 1)
        , probes AS (
            SELECT vec_id AS query_id, seed_id AS cell
            FROM assign WHERE vec_id < {N_QUERIES} AND rn <= {N_PROBES})
        , q AS (
            SELECT vec_id AS query_id, embedding AS qe, nrm AS qn
            FROM v WHERE vec_id < {N_QUERIES})
        , cand AS (
            SELECT p.query_id, c.vec_id AS neighbor_id,
                   ({_dot('q.qe', 'c.embedding', dialect)}) / (q.qn * c.nrm) AS cos
            FROM probes p
            JOIN q ON q.query_id = p.query_id
            JOIN cells c ON c.cell = p.cell AND c.vec_id <> p.query_id)
        , ranked AS (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rn
            FROM cand)
        SELECT query_id, neighbor_id, CAST(rn AS BIGINT) AS nn_rank,
               ROUND(cos, 6) AS cosine
        FROM ranked WHERE rn <= {TOPK}
    """


def _run(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    # DIMS is fixed by the data contract (64); tests/test_similarity
    # validate it — no extra job here in the query path.
    from ..tables import load_table

    load_table(spark, sf_dir, "embeddings").createOrReplaceTempView("embeddings")
    return spark.sql(sql)


def cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run(spark, sf_dir, topk_sql("spark"))


def near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run(spark, sf_dir, near_dup_sql("spark"))


def centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run(spark, sf_dir, centroids_sql("spark"))


def ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run(spark, sf_dir, ivf_topk_sql("spark"))


def ivf_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run(spark, sf_dir, ivf_multiprobe_sql("spark"))
