"""Round-4 additions: deterministic sketches (count-min, Bloom),
plus their probabilistic-structure laws and plan shapes."""

from __future__ import annotations

import pytest

from aurora_cdc_demo_spark.registry import QUERIES

from .helpers import assert_matches_oracle
from .test_plans import plan_of

R4_QUERIES = [
    "events_count_min_users",
    "corpus_bloom_decontaminate",
]


@pytest.mark.parametrize("name", R4_QUERIES)
def test_oracle_parity(spark, sf_dir, name):
    assert_matches_oracle(spark, name, sf_dir)


def test_count_min_one_sided_error(spark, sf_dir):
    """The count-min guarantee: est >= exact for EVERY key (each
    occurrence incremented all depth counters; collisions only add).
    Also sanity-check the sketch carries signal: at this load factor
    (n_keys << width) most keys should be exact."""
    rows = QUERIES["events_count_min_users"](spark, sf_dir).collect()
    assert rows
    assert all(r["overestimate"] >= 0 for r in rows)
    assert all(r["est_count"] == r["exact_count"] + r["overestimate"] for r in rows)
    exact_frac = sum(r["overestimate"] == 0 for r in rows) / len(rows)
    assert exact_frac >= 0.5


def test_bloom_no_false_negatives(spark, sf_dir):
    """Every exact contamination hit must bloom-hit: per doc
    n_bloom_hits >= n_exact_hits, and the exact-decontaminate doc
    set is a subset of the bloom-flagged doc set."""
    bloom = {
        r["doc_id"]: r
        for r in QUERIES["corpus_bloom_decontaminate"](spark, sf_dir).collect()
    }
    exact = {
        r["doc_id"]: r["n_shared_ngrams"]
        for r in QUERIES["corpus_decontaminate"](spark, sf_dir).collect()
    }
    for doc_id, n_exact in exact.items():
        assert doc_id in bloom
        assert bloom[doc_id]["n_bloom_hits"] >= n_exact
    for r in bloom.values():
        assert r["n_false_pos"] >= 0
        assert r["n_bloom_hits"] == r["n_exact_hits"] + r["n_false_pos"]


def test_sketch_plans_broadcast_constant_sides(spark, sf_dir):
    """The sketch/bits tables are bounded by constants (depth*width
    counters; k*|bench| positions), so their probe joins must
    broadcast — the corpus-sized side never shuffles for scoring."""
    cm = plan_of(spark, sf_dir, "events_count_min_users")
    assert "BroadcastHashJoin" in cm
    bl = plan_of(spark, sf_dir, "corpus_bloom_decontaminate")
    assert "BroadcastHashJoin" in bl
