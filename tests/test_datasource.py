"""Custom DataSource V2 round-trip (mirrors the reference's CDC
round-trip suite, reference: tests/test_cdc_integration.py:283-419):
batch read, streaming read with offsets, exactly-once replay."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from aurora_cdc_demo_spark.sources.cdc_datasource import (
    CDCReplayDataSource,
    CDCReplayStreamReader,
    write_binlog_from_events,
)


@pytest.fixture(scope="module")
def binlog_dir(tmp_path_factory, sf_dir):
    out = tmp_path_factory.mktemp("binlog")
    n = write_binlog_from_events(f"{sf_dir}/events.parquet", str(out), rows_per_file=300)
    assert n > 0
    return str(out), n


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(CDCReplayDataSource)
    return spark


def test_batch_read_full_log(registered, binlog_dir):
    path, n = binlog_dir
    df = registered.read.format("cdc_replay").option("path", path).load()
    assert df.count() == n
    ops = {r["operation"] for r in df.select("operation").distinct().collect()}
    assert ops == {"INSERT", "UPDATE", "DELETE"}
    # DELETE events carry no after-image; others do
    assert df.where("operation = 'DELETE' AND after IS NOT NULL").count() == 0
    assert df.where("operation <> 'DELETE' AND after IS NULL").count() == 0
    # primary keys always present
    assert df.where("primary_keys IS NULL").count() == 0


def test_batch_matches_cdc_log_semantics(registered, binlog_dir, sf_dir):
    """The replayed operations must agree with the derived CDC log."""
    from aurora_cdc_demo_spark.sources.cdc_log import cdc_operation_log

    path, _ = binlog_dir
    replay = (
        registered.read.format("cdc_replay")
        .option("path", path)
        .load()
        .select(F.col("seq"), F.col("operation").alias("op_replay"))
    )
    log = cdc_operation_log(registered, sf_dir).select(
        "seq", F.col("operation").alias("op_log")
    )
    joined = replay.join(log, "seq")
    assert joined.count() == log.count()
    assert joined.where("op_replay <> op_log").count() == 0


def test_stream_offsets_progress(binlog_dir):
    path, n = binlog_dir
    reader = CDCReplayStreamReader({"path": path, "batch_size": "1234"})
    offset = reader.initialOffset()
    total = 0
    batches = 0
    while True:
        rows, end = reader.read(offset)
        rows = list(rows)
        if not rows:
            break
        total += len(rows)
        batches += 1
        assert len(rows) <= 1234
        offset = end
    assert total == n
    assert batches == -(-n // 1234)


def test_stream_replay_between_offsets(binlog_dir):
    """Exactly-once recovery: re-reading [start, end) returns the
    identical batch."""
    path, _ = binlog_dir
    reader = CDCReplayStreamReader({"path": path, "batch_size": "500"})
    start = reader.initialOffset()
    first, end = reader.read(start)
    first = list(first)
    replayed = list(reader.readBetweenOffsets(start, end))
    assert first == replayed


def test_stream_commit_checkpoint(binlog_dir, tmp_path):
    path, _ = binlog_dir
    reader = CDCReplayStreamReader({"path": path, "batch_size": "500"})
    _, end = reader.read(reader.initialOffset())
    reader.commit(end)
    with open(f"{path}/_committed_offset.json") as fh:
        assert json.load(fh) == end


def test_streaming_query_end_to_end(registered, binlog_dir, tmp_path):
    """readStream through the DataSource → availableNow → memory
    sink: all events delivered exactly once."""
    path, n = binlog_dir
    import time

    q = (
        registered.readStream.format("cdc_replay")
        .option("path", path)
        .option("batch_size", "3000")
        .load()
        .groupBy("operation")
        .count()
        .writeStream.format("memory")
        .queryName("cdc_replay_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    # micro-batches drain batch_size rows each; poll until delivered
    total = 0
    deadline = time.time() + 120
    while time.time() < deadline:
        rows = registered.sql(
            "SELECT CAST(SUM(count) AS BIGINT) AS n FROM cdc_replay_counts"
        ).collect()
        total = rows[0]["n"] or 0
        if total >= n:
            break
        time.sleep(1)
    q.stop()
    assert total == n


def test_debezium_dlq_partitions_the_stream(spark, sf_dir):
    """Silver rows + dead letters partition the bronze stream: every
    envelope lands in exactly one of the two."""
    from aurora_cdc_demo_spark.sources.cdc_log import cdc_operation_log
    from aurora_cdc_demo_spark.sources.debezium import (
        CORRUPT_EVERY,
        dead_letters,
        parse_envelopes,
        synth_envelopes,
    )

    log = cdc_operation_log(spark, sf_dir)
    bronze = synth_envelopes(log)
    n_total = bronze.count()
    n_silver = parse_envelopes(bronze).count()
    dlq = dead_letters(bronze)
    n_dlq = dlq.count()
    assert n_silver + n_dlq == n_total
    # the corrupted slice is exactly the DLQ
    assert n_dlq == log.where(f"seq % {CORRUPT_EVERY} = 0").count()
    assert dlq.where("error_type <> 'PARSE_ERROR'").count() == 0
