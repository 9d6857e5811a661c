"""TableManager (many-table scheduler) + multi-table CDC merge."""

from __future__ import annotations

from pyspark.sql import functions as F

from aurora_cdc_demo_spark.config.table_manager import TableManager, TableMetadata
from aurora_cdc_demo_spark.operators.cdc_apply import (
    latest_state,
    net_changes,
    upsert_merge,
)
from aurora_cdc_demo_spark.sources.cdc_log import cdc_operation_log


def _multi_table_log(spark, sf_dir):
    return cdc_operation_log(spark, sf_dir).withColumn(
        "table", F.concat(F.lit("users_"), (F.col("key_id") % 4).cast("string"))
    )


def test_register_from_log_and_batch_order(spark, sf_dir):
    log = _multi_table_log(spark, sf_dir)
    mgr = TableManager(batch_size=2)
    n = mgr.register_tables_from_log(log)
    assert n == 4
    batch = mgr.get_next_batch()
    assert len(batch) == 2
    # priority order, deterministic tie-break by name
    assert batch[0].priority >= batch[1].priority
    for meta in batch:
        mgr.mark_processed(meta.name)
    next_batch = mgr.get_next_batch()
    assert {m.name for m in next_batch}.isdisjoint({m.name for m in batch})


def test_priority_formula_matches_reference_semantics():
    mgr = TableManager()
    hot = TableMetadata(name="hot", row_count=500, last_update="2024-01-30T23:30:00")
    cold = TableMetadata(name="cold", row_count=10, last_update="2024-01-01T00:00:00")
    mgr.register_table(hot)
    mgr.register_table(cold)
    assert hot.priority == 100 + 50  # capped volume + recent bonus
    assert cold.priority == 10  # stale: no recency bonus


def test_save_load_roundtrip(spark, sf_dir, tmp_path):
    log = _multi_table_log(spark, sf_dir)
    mgr = TableManager()
    mgr.register_tables_from_log(log)
    mgr.mark_processed(next(iter(mgr.registry)), success=False, error="boom")
    path = str(tmp_path / "registry" / "tables.json")
    mgr.save(path)
    loaded = TableManager.load(path)
    assert loaded.get_statistics() == mgr.get_statistics()


def test_multi_table_composite_key_merge(spark, sf_dir):
    """One merge keyed by (table, key_id) == per-table replay."""
    log = _multi_table_log(spark, sf_dir)
    keys = ["table", "key_id"]
    split = F.to_timestamp(F.lit("2024-01-16 00:00:00"))
    snapshot = latest_state(log.where(F.col("ts") < split), key=keys)
    net = net_changes(log.where(F.col("ts") >= split), key=keys)
    merged = upsert_merge(snapshot, net, key=keys)
    replayed = latest_state(log, key=keys)
    assert merged.exceptAll(replayed).count() == 0
    assert replayed.exceptAll(merged).count() == 0
    # state is per (table, key): a key appears once per its table
    assert (
        merged.groupBy("table", "key_id").count().where("count > 1").count() == 0
    )
