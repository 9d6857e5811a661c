"""Sampling, sequence packing, cohort retention: oracle parity +
invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aurora_cdc_demo_spark.operators.sampling import CHUNK_TOKENS, SAMPLE_RATES_BP
from aurora_cdc_demo_spark.registry import QUERIES
from aurora_cdc_demo_spark.tables import load_table

from .helpers import assert_matches_oracle

NAMES = ["sample_stratified", "text_chunk_windows", "events_user_retention"]


@pytest.mark.parametrize("name", NAMES)
def test_oracle_parity(spark, sf_dir, name):
    assert_matches_oracle(spark, name, sf_dir)


def test_sample_is_deterministic_and_rate_bounded(spark, sf_dir):
    a = QUERIES["sample_stratified"](spark, sf_dir).toPandas()
    b = QUERIES["sample_stratified"](spark, sf_dir).toPandas()
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])
    # each stratum respects its keep rate in expectation; hard bound:
    # every kept row's uniform is under its stratum rate
    assert (a["sample_u"] < a["rate_bp"]).all()
    assert set(a["lang"]) <= set(SAMPLE_RATES_BP)


def test_chunks_reassemble_token_counts(spark, sf_dir):
    chunks = QUERIES["text_chunk_windows"](spark, sf_dir)
    per_doc = chunks.groupBy("doc_id").agg(
        F.sum("n_tokens").alias("total"),
        F.max("n_tokens").alias("biggest"),
        F.count(F.lit(1)).alias("n_chunks"),
    )
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tokens")
    )
    joined = per_doc.join(docs, "doc_id")
    assert joined.where(F.col("total") != F.col("n_tokens")).count() == 0
    assert joined.where(F.col("biggest") > CHUNK_TOKENS).count() == 0


def test_retention_week0_counts_every_user(spark, sf_dir):
    ret = QUERIES["events_user_retention"](spark, sf_dir)
    week0 = (
        ret.where(F.col("week_offset") == 0).agg(F.sum("n_users")).collect()[0][0]
    )
    n_users = (
        load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    assert week0 == n_users


def test_hll_within_rsd_of_exact(spark, sf_dir):
    got = QUERIES["events_distinct_users_hll"](spark, sf_dir).toPandas()
    exact = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("exact_users"))
        .toPandas()
    )
    m = got.merge(exact, on="event_type")
    rel_err = (m["approx_users"] - m["exact_users"]).abs() / m["exact_users"]
    assert (rel_err < 0.10).all()


def test_approx_quantiles_rank_error_bounded(spark, sf_dir):
    """percentile_approx with accuracy 10000 must land within 1% rank
    error of the exact per-group quantiles (GK sketch guarantee:
    rank error <= 1/accuracy; we allow 100x slack for tiny groups)."""
    from aurora_cdc_demo_spark.tables import load_table

    approx = {
        r["event_type"]: (r["p50_approx"], r["p95_approx"], r["p99_approx"])
        for r in QUERIES["events_value_quantiles_approx"](spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events").select("event_type", "value").toPandas()
    for etype, grp in ev.groupby("event_type"):
        vals = grp["value"].sort_values().reset_index(drop=True)
        n = len(vals)
        for got, p in zip(approx[etype], (0.5, 0.95, 0.99)):
            # rank of the approximate answer in the exact ordering
            rank = (vals <= got).sum()
            assert abs(rank - p * n) <= max(2, 0.01 * n), (etype, p, rank, n)
