"""Structured Streaming pipelines: batch/stream agreement for the
windowed monitoring agg, foreachBatch upsert state maintenance, and
stateful sessionization."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aurora_cdc_demo_spark.operators.cdc_apply import latest_state, sessionize
from aurora_cdc_demo_spark.sources.cdc_log import cdc_operation_log
from aurora_cdc_demo_spark.streaming.pipelines import (
    ParquetStateStore,
    read_cdc_stream,
    windowed_event_counts,
)
from aurora_cdc_demo_spark.streaming.stateful import (
    HAS_TWS,
    sessionize_stream,
    sessionize_stream_tws,
)


@pytest.fixture(scope="module")
def log_dir(spark, sf_dir, tmp_path_factory):
    """CDC log written as two parquet chunks (two micro-batches),
    split by time — simulates arriving change files."""
    out = tmp_path_factory.mktemp("cdc_stream_in")
    log = cdc_operation_log(spark, sf_dir)
    split = F.to_timestamp(F.lit("2024-01-16 00:00:00"))
    log.where(F.col("ts") < split).coalesce(1).write.mode("overwrite").parquet(
        str(out / "batch0")
    )
    log.where(F.col("ts") >= split).coalesce(1).write.mode("overwrite").parquet(
        str(out / "batch1")
    )
    # flatten into one dir for the file stream (ordered file names)
    import shutil
    from pathlib import Path

    flat = tmp_path_factory.mktemp("cdc_stream_flat")
    for i, sub in enumerate(["batch0", "batch1"]):
        for j, f in enumerate(sorted(Path(out / sub).glob("*.parquet"))):
            shutil.copy(f, flat / f"{i:02d}_{j:02d}.parquet")
    return str(flat)


def test_windowed_counts_stream_equals_batch(spark, sf_dir, log_dir, tmp_path):
    stream = read_cdc_stream(spark, log_dir)
    q = (
        windowed_event_counts(stream)
        .writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql("SELECT * FROM win_counts").toPandas()

    from aurora_cdc_demo_spark.queries.monitoring import event_counts_windowed

    want = event_counts_windowed(cdc_operation_log(spark, sf_dir)).toPandas()
    got_s = got.sort_values(["window_start", "operation"]).reset_index(drop=True)
    want_s = want.sort_values(["window_start", "operation"]).reset_index(drop=True)
    assert len(got_s) == len(want_s)
    assert (got_s["event_count"].values == want_s["event_count"].values).all()
    assert abs(got_s["sum_value"] - want_s["sum_value"]).max() < 1e-6


def test_foreachbatch_upsert_matches_replay(spark, sf_dir, log_dir, tmp_path):
    """Incrementally merged state after streaming all change files ==
    batch latest-state over the full log (MERGE correctness)."""
    stream = spark.readStream.schema(
        "key_id long, seq long, operation string, event_type string, "
        "ts timestamp, value double"
    ).option("maxFilesPerTrigger", "1").parquet(log_dir)
    store = ParquetStateStore(spark, str(tmp_path / "state"))
    q = store.start(stream, str(tmp_path / "ckpt"))
    q.awaitTermination(300)

    got = spark.read.parquet(str(tmp_path / "state"))
    want = latest_state(cdc_operation_log(spark, sf_dir))
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0


def test_stateful_sessionize_closed_sessions(spark, sf_dir, log_dir, tmp_path):
    """Closed sessions emitted by the stateful operator must be a
    subset of (and consistent with) batch sessionization; open
    trailing sessions remain in state."""
    stream = spark.readStream.schema(
        "key_id long, seq long, operation string, event_type string, "
        "ts timestamp, value double"
    ).parquet(log_dir)
    q = (
        sessionize_stream(stream)
        .writeStream.format("memory")
        .queryName("sessions_closed")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.sql(
        "SELECT key_id, session_start, n_events FROM sessions_closed"
    ).toPandas()

    want = (
        sessionize(cdc_operation_log(spark, sf_dir))
        .select("key_id", "session_start", "n_events")
        .toPandas()
    )
    merged = got.merge(
        want, on=["key_id", "session_start"], how="left", suffixes=("_got", "_want")
    )
    # every emitted closed session exists in the batch result with
    # the same event count
    assert merged["n_events_want"].notna().all()
    assert (merged["n_events_got"] == merged["n_events_want"]).all()
    # and most sessions close during the stream (sanity: non-trivial)
    assert len(got) > 0.5 * len(want)


@pytest.mark.skipif(not HAS_TWS, reason="transformWithState needs pyspark>=4 + protobuf")
def test_transform_with_state_matches_legacy_sessionize(
    spark, sf_dir, log_dir, tmp_path
):
    """The transformWithStateInPandas processor must emit exactly the
    same closed sessions as the applyInPandasWithState one."""
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        stream = spark.readStream.schema(
            "key_id long, seq long, operation string, event_type string, "
            "ts timestamp, value double"
        ).parquet(log_dir)
        q = (
            sessionize_stream_tws(stream)
            .writeStream.format("memory")
            .queryName("sessions_tws")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt_tws"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    finally:
        if old is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, old)
    got = spark.sql("SELECT * FROM sessions_tws").toPandas()

    stream2 = spark.readStream.schema(
        "key_id long, seq long, operation string, event_type string, "
        "ts timestamp, value double"
    ).parquet(log_dir)
    q2 = (
        sessionize_stream(stream2)
        .writeStream.format("memory")
        .queryName("sessions_legacy")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_legacy"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(300)
    want = spark.sql("SELECT * FROM sessions_legacy").toPandas()

    key = ["key_id", "session_start", "session_end"]
    got_s = got.sort_values(key).reset_index(drop=True)
    want_s = want.sort_values(key).reset_index(drop=True)
    assert len(got_s) == len(want_s) > 0
    assert got_s[key + ["n_events"]].equals(want_s[key + ["n_events"]])


def test_stream_dedup_exactly_once(spark, sf_dir, log_dir, tmp_path):
    """Feeding every change file twice must produce each (key_id,
    seq) exactly once — the streaming exactly-once guarantee."""
    import shutil
    from pathlib import Path

    from aurora_cdc_demo_spark.streaming.pipelines import (
        dedup_stream_exactly_once,
    )

    doubled = tmp_path / "doubled"
    doubled.mkdir()
    for f in sorted(Path(log_dir).glob("*.parquet")):
        shutil.copy(f, doubled / f.name)
        shutil.copy(f, doubled / f"dup_{f.name}")

    stream = spark.readStream.schema(
        "key_id long, seq long, operation string, event_type string, "
        "ts timestamp, value double"
    ).parquet(str(doubled))
    q = (
        dedup_stream_exactly_once(stream)
        .writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_dedup"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.sql(
        "SELECT key_id, seq, COUNT(*) AS c FROM dedup_stream GROUP BY 1, 2"
    ).toPandas()
    assert (got["c"] == 1).all()
    want = cdc_operation_log(spark, sf_dir).count()
    assert len(got) == want
