"""Partitioned landing sink: partition layout + pruning."""

from __future__ import annotations

from pathlib import Path

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
