"""Partitioned landing sink: partition layout + pruning."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import functions as F

from aurora_cdc_demo_spark.sinks.partitioned import write_partitioned
from aurora_cdc_demo_spark.sources.cdc_log import cdc_operation_log

from .helpers import assert_matches_oracle  # noqa: F401


def test_partitioned_write_roundtrip(spark, sf_dir, tmp_path):
    log = cdc_operation_log(spark, sf_dir)
    out = str(tmp_path / "landed")
    write_partitioned(log, out)

    dirs = [p.name for p in Path(out).iterdir() if p.is_dir()]
    assert any(d.startswith("event_year=") for d in dirs)

    back = spark.read.parquet(out)
    assert back.count() == log.count()

    # partition pruning: a day filter must prune the file listing
    pruned = back.where("event_year = 2024 AND event_month = 1 AND event_day = 5")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert pruned.count() > 0


def test_oracle_parity_replay_typed(spark, sf_dir):
    assert_matches_oracle(spark, "cdc_replay_typed", sf_dir)


def test_compaction_shrinks_files_preserves_data(spark, sf_dir, tmp_path):
    from aurora_cdc_demo_spark.sinks.partitioned import compact_partitions

    log = cdc_operation_log(spark, sf_dir)
    src = str(tmp_path / "landed_small")
    # force many small files: one per shuffle partition per day dir
    write_partitioned(log.repartition(16), src)

    dst = str(tmp_path / "landed_compact")
    stats = compact_partitions(spark, src, dst)
    assert stats["files_after"] < stats["files_before"]

    before = spark.read.parquet(src).drop("ingestion_timestamp")
    after = spark.read.parquet(dst).drop("ingestion_timestamp")
    assert after.count() == before.count()
    assert after.exceptAll(before).count() == 0

    # partition tree preserved -> pruning still works
    dirs = [p.name for p in Path(dst).iterdir() if p.is_dir()]
    assert any(d.startswith("event_year=") for d in dirs)


def test_bucketed_join_is_shuffle_free(spark, sf_dir, tmp_path):
    """orders and lineitem bucketed on the join key: the join reads
    bucket files pairwise — no Exchange on either side."""
    from aurora_cdc_demo_spark.sinks.bucketed import write_bucketed
    from aurora_cdc_demo_spark.tables import load_table

    spark.sql(
        f"CREATE DATABASE IF NOT EXISTS bdemo LOCATION '{tmp_path}/wh'"
    )
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        write_bucketed(
            load_table(spark, sf_dir, "orders"),
            "bdemo.orders_b",
            ("o_orderkey",),
            ("o_orderkey",),
        )
        write_bucketed(
            load_table(spark, sf_dir, "lineitem"),
            "bdemo.lineitem_b",
            ("l_orderkey",),
            ("l_orderkey",),
        )
        joined = (
            spark.table("bdemo.lineitem_b")
            .join(
                spark.table("bdemo.orders_b"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderpriority")
            .count()
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the only exchange allowed is the one for the final groupBy
        join_part = plan.split("SortMergeJoin")[-1]
        assert "Exchange" not in join_part
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql("DROP DATABASE IF EXISTS bdemo CASCADE")


def test_vacuum_retains_current_and_newest(tmp_path):
    """VACUUM analog: deletes old generations, never the newest
    `keep` nor the one `_CURRENT` points at (even if old)."""
    import os

    from aurora_cdc_demo_spark.sinks.partitioned import (
        current_generation,
        publish_generation,
        vacuum_generations,
    )

    root = str(tmp_path)
    for i in range(1, 5):
        os.makedirs(os.path.join(root, f"gen-{i:06d}"))
    # current deliberately points at an OLD generation
    publish_generation(root, os.path.join(root, "gen-000001"))
    out = vacuum_generations(root, keep=2)
    assert out["removed"] == ["gen-000002"]
    assert sorted(out["retained"]) == ["gen-000001", "gen-000003", "gen-000004"]
    assert os.path.isdir(current_generation(root))
    # republish to the newest, vacuum again: old current now eligible
    publish_generation(root, os.path.join(root, "gen-000004"))
    out2 = vacuum_generations(root, keep=1)
    assert out2["removed"] == ["gen-000001", "gen-000003"]
    assert os.path.basename(current_generation(root)) == "gen-000004"
