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
