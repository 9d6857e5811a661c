"""Text analysis + dedup: oracle parity and algorithmic invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aurora_cdc_demo_spark.registry import QUERIES
from aurora_cdc_demo_spark.tables import load_table

from .helpers import assert_matches_oracle

TEXT_DEDUP_QUERIES = [
    "text_token_stats",
    "text_quality_score",
    "text_lang_id",
    "text_fingerprint",
    "text_regex_tokens",
    "text_rolling_hash",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "text_repetition_stats",
    "corpus_decontaminate",
    "sample_domain_mix",
]


@pytest.mark.parametrize("name", TEXT_DEDUP_QUERIES)
def test_oracle_parity(spark, sf_dir, name):
    assert_matches_oracle(spark, name, sf_dir)


def test_lsh_pairs_subset_of_exact(spark, sf_dir):
    """LSH output (candidates ∩ verified) can only miss pairs, never
    invent them: it must be a subset of the exact-Jaccard pairs."""
    exact = QUERIES["dedup_ngram_jaccard"](spark, sf_dir)
    lsh = QUERIES["dedup_minhash_lsh"](spark, sf_dir)
    assert lsh.exceptAll(exact).count() == 0


def test_jaccard_bounds(spark, sf_dir):
    exact = QUERIES["dedup_ngram_jaccard"](spark, sf_dir)
    bad = exact.where(
        (F.col("jaccard_bp") < 0) | (F.col("jaccard_bp") > 10000)
    ).count()
    assert bad == 0


def test_token_stats_cover_all_docs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    stats = QUERIES["text_token_stats"](spark, sf_dir)
    assert stats.count() == docs.count()
    assert stats.where(F.col("n_tokens") <= 0).count() == 0


def test_simhash_pairs_symmetric_free(spark, sf_dir):
    """doc_a < doc_b convention: no self or inverted duplicates."""
    pairs = QUERIES["dedup_simhash"](spark, sf_dir)
    assert pairs.where(F.col("doc_a") >= F.col("doc_b")).count() == 0


def test_clusters_consistent_with_pairs(spark, sf_dir):
    """Both endpoints of every near-dup pair share a cluster, and
    every cluster id is the min doc_id of its members."""
    labels = QUERIES["dedup_clusters"](spark, sf_dir)
    pairs = QUERIES["dedup_ngram_jaccard"](spark, sf_dir)
    la = labels.select(
        F.col("doc_id").alias("doc_a"), F.col("cluster_id").alias("ca")
    )
    lb = labels.select(
        F.col("doc_id").alias("doc_b"), F.col("cluster_id").alias("cb")
    )
    joined = pairs.join(la, "doc_a").join(lb, "doc_b")
    assert joined.where("ca <> cb").count() == 0
    mins = labels.groupBy("cluster_id").agg(F.min("doc_id").alias("m"))
    assert mins.where("cluster_id <> m").count() == 0


def test_keep_list_partitions_corpus(spark, sf_dir):
    """Every doc gets exactly one decision; keep implies every gate
    passed; decision counts are consistent with the flags."""
    kl = QUERIES["corpus_keep_list"](spark, sf_dir).toPandas()
    from aurora_cdc_demo_spark.tables import load_table

    assert len(kl) == load_table(spark, sf_dir, "documents").count()
    kept = kl[kl["keep"]]
    assert (
        kept["exact_canonical"]
        & kept["cluster_canonical"]
        & kept["quality_ok"]
        & kept["in_sample"]
    ).all()
    assert set(kl["decision"]) <= {
        "keep", "exact_dup", "near_dup", "low_quality", "sampled_out"
    }
    assert (kl["decision"].eq("keep") == kl["keep"]).all()


def test_connected_components_reliable_checkpoint(spark, sf_dir, tmp_path):
    """The production checkpoint path (reliable checkpoint() files,
    survives executor loss) must produce the identical clustering as
    the localCheckpoint test path."""
    from aurora_cdc_demo_spark.operators.graph import connected_components
    from aurora_cdc_demo_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (5, 5)], "doc_a long, doc_b long"
    )
    local = connected_components(docs, edges).orderBy("doc_id")
    reliable = connected_components(
        docs,
        edges,
        checkpoint_mode="reliable",
        checkpoint_dir=str(tmp_path / "ckpt"),
    ).orderBy("doc_id")
    assert [r.asDict() for r in local.collect()] == [
        r.asDict() for r in reliable.collect()
    ]
    import pytest

    with pytest.raises(ValueError):
        connected_components(docs, edges, checkpoint_mode="bogus")


def test_decontaminate_flags_real_overlaps_only(spark, sf_dir):
    """Every flagged doc truly shares a verbatim 8-gram with a
    benchmark doc, and benchmark docs are never flagged."""
    hits = QUERIES["corpus_decontaminate"](spark, sf_dir)
    assert hits.where("doc_id < 20").count() == 0
    assert hits.where("n_shared_ngrams < 1").count() == 0
    assert hits.count() > 0  # non-degenerate on this corpus


def test_domain_mix_rebalances_toward_quota(spark, sf_dir):
    """Per-source kept counts approach the smallest source's count:
    every source's keep rate is quota/n_src in expectation, so no
    kept source may exceed ~1.5x the smallest source's kept count
    (hash sampling variance bound at this corpus size)."""
    docs = load_table(spark, sf_dir, "documents")
    n_src = {r["source"]: r["n"] for r in
             docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    kept = {r["source"]: r["n"] for r in
            QUERIES["sample_domain_mix"](spark, sf_dir)
            .groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    quota = min(n_src.values())
    assert set(kept) == set(n_src)
    for s, k in kept.items():
        assert k <= 1.5 * quota, (s, k, quota)
        assert k >= 0.5 * quota, (s, k, quota)


def test_keep_list_v2_refines_v1(spark, sf_dir):
    """v2 can only DROP MORE than v1 (its two extra gates are
    restrictions): every v2 keep is a v1 keep, and any divergent
    decision is 'contaminated' or 'repetitive'."""
    v1 = {r["doc_id"]: (r["keep"], r["decision"])
          for r in QUERIES["corpus_keep_list"](spark, sf_dir)
          .select("doc_id", "keep", "decision").collect()}
    v2 = {r["doc_id"]: (r["keep"], r["decision"])
          for r in QUERIES["corpus_keep_list_v2"](spark, sf_dir).collect()}
    assert v1.keys() == v2.keys()
    for d, (keep2, dec2) in v2.items():
        keep1, dec1 = v1[d]
        if keep2:
            assert keep1
        if dec2 != dec1:
            assert dec2 in ("contaminated", "repetitive"), (d, dec1, dec2)
