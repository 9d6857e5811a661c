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


def test_table_groups_500_tables():
    """Reference get_table_groups surface: 500 registered tables
    partition into prefix, size-class, and frequency-class groups;
    every table lands in exactly one size group and one frequency
    group, and multi-token names join their prefix group."""
    mgr = TableManager()
    for i in range(500):
        domain = ["order", "customer", "inventory", "payment", "audit"][i % 5]
        mgr.register_table(
            TableMetadata(
                name=f"{domain}_t{i:03d}",
                row_count=i * 10,
                data_size=i * 5 * 1024 * 1024,  # 0 .. ~2.5 GB
                update_frequency=i % 80,
            )
        )
    groups = mgr.get_table_groups()

    for d in ["order", "customer", "inventory", "payment", "audit"]:
        assert len(groups[d]) == 100
    size_names = [n for k in ("size_large", "size_medium", "size_small")
                  for n in groups[k]]
    assert sorted(size_names) == sorted(mgr.registry)
    freq_names = [n for k in ("freq_high_frequency", "freq_medium_frequency",
                              "freq_low_frequency") for n in groups[k]]
    assert sorted(freq_names) == sorted(mgr.registry)
    # boundaries: >1GB large, >100MB medium
    assert "order_t410" in groups["size_large"]  # 410*5MB > 1GB
    assert "order_t015" in groups["size_small"]  # 75MB


def test_scheduler_round_consumes_a_group():
    """A scheduling round restricted to one group drains exactly that
    group, highest priority first, and leaves other groups pending."""
    mgr = TableManager(batch_size=1000)
    for i in range(60):
        domain = "order" if i % 2 == 0 else "customer"
        mgr.register_table(
            TableMetadata(name=f"{domain}_t{i:03d}", row_count=i)
        )
    batch = mgr.get_next_batch(group="order")
    names = [m.name for m in batch]
    assert len(names) == 30 and all(n.startswith("order_") for n in names)
    # priority-ordered (row_count caps priority here)
    prios = [m.priority for m in batch]
    assert prios == sorted(prios, reverse=True)
    for m in batch:
        mgr.mark_processed(m.name)
    # the group is drained; the next unrestricted batch is all customer
    assert mgr.get_next_batch(group="order") == []
    rest = mgr.get_next_batch()
    assert len(rest) == 30
    assert all(m.name.startswith("customer_") for m in rest)
