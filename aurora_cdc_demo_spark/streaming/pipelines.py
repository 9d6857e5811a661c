"""Structured Streaming pipelines — the reference's streaming surface
(reference: src/notebooks/demo/cdc_500_tables_streaming.py:117-354)
re-expressed Spark-first:

- readStream → watermark → windowed aggregation (monitoring feed)
- foreachBatch incremental upsert maintaining a latest-state table

The batch queries in queries/monitoring.py share the same aggregation
logic; Structured Streaming's contract is exactly that batch/stream
plans coincide.

Where the reference loops tables on the driver and MERGEs per table
(reference: lines 151-217 — collect + ThreadPoolExecutor), we apply
ONE declarative merge over all keys per micro-batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.cdc_apply import net_changes, upsert_merge


def read_cdc_stream(spark: SparkSession, log_dir: str) -> DataFrame:
    """File-based change stream (parquet events dir) → typed CDC
    log with a 30-min watermark (reference: line 134)."""
    from ..tables import load_table  # schema template

    schema = (
        "key_id long, seq long, operation string, event_type string, "
        "ts timestamp, value double"
    )
    return (
        spark.readStream.schema(schema)
        .parquet(log_dir)
        .withWatermark("ts", "30 minutes")
    )


def windowed_event_counts(stream: DataFrame) -> DataFrame:
    """Streaming twin of monitoring.event_counts_windowed (reference
    monitoring query #1): tumbling 1-h window per operation."""
    return (
        stream.groupBy(F.window("ts", "1 hour").alias("w"), "operation")
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
            .cast("long")
            .alias("error_count"),
            F.max("ts").alias("last_event_time"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "operation",
            "event_count",
            "error_count",
            "last_event_time",
            "sum_value",
        )
    )


class ParquetStateStore:
    """foreachBatch sink maintaining a latest-state parquet table via
    the upsert_merge operator (MERGE INTO analog without Delta;
    reference: unity_catalog_cdc_demo.py:392-446).

    ``key`` may be composite (e.g. ["table", "key_id"]) — many-table
    CDC is ONE merge keyed by (table, pk), not the reference's
    per-table driver loop (reference:
    cdc_500_tables_streaming.py:151-217)."""

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        key: str | list[str] = "key_id",
    ):
        self.spark = spark
        self.state_dir = state_dir
        self.key = key

    def _read_state(self) -> DataFrame | None:
        from pathlib import Path

        # Crash recovery: the swap in apply_batch has a window between
        # rename(state_dir → .old) and rename(.staging → state_dir). If
        # we crashed there, state_dir is missing but .old holds the full
        # previous state — roll it back before reading, instead of
        # silently treating the replayed batch as the first batch.
        state, old = Path(self.state_dir), Path(self.state_dir + ".old")
        if not state.exists() and old.exists():
            old.rename(state)
        if not state.exists():
            return None  # genuinely the first batch
        return self.spark.read.parquet(self.state_dir)

    def apply_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """Idempotent, atomic batch apply. foreachBatch MAY re-deliver
        a batch id after a failure; the marker file short-circuits the
        replay (the merge itself is idempotent — pytest property — but
        skipping avoids re-paying the work and generalizes to
        non-idempotent sinks). The new state is staged to a side dir
        and swapped in, so a crash mid-write leaves the previous state
        intact (the no-Delta analog of transactional commit)."""
        import shutil
        from pathlib import Path

        marker = Path(self.state_dir + ".last_batch")
        if marker.exists() and marker.read_text() == str(batch_id):
            return  # replayed delivery — already applied
        net = net_changes(batch_df, key=self.key)
        state = self._read_state()
        if state is None:
            merged = net.where(F.col("operation") != "DELETE")
        else:
            merged = upsert_merge(state, net, key=self.key)
        staging = self.state_dir + ".staging"
        merged.write.mode("overwrite").parquet(staging)
        old = self.state_dir + ".old"
        shutil.rmtree(old, ignore_errors=True)
        if Path(self.state_dir).exists():
            Path(self.state_dir).rename(old)
        Path(staging).rename(self.state_dir)
        shutil.rmtree(old, ignore_errors=True)
        marker.write_text(str(batch_id))

    def start(self, stream: DataFrame, checkpoint_dir: str):
        return (
            stream.writeStream.foreachBatch(self.apply_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )


def dedup_stream_exactly_once(
    stream: DataFrame, watermark_delay: str = "30 minutes"
) -> DataFrame:
    """Streaming exactly-once delivery: dropDuplicatesWithinWatermark
    on the delivery identity (key_id, seq), so duplicate redeliveries
    across micro-batches are suppressed AND dedup state is actually
    evicted once the event time falls behind the watermark (plain
    dropDuplicates on a non-event-time subset keeps state forever —
    unbounded on a long-running stream). Eviction contract: a
    duplicate arriving more than ``watermark_delay`` after the
    original's event time may be re-emitted; redeliveries in real CDC
    replay are near-immediate, well inside the delay (reference: the
    v2 DataSource dedups redelivered binlog events the same way,
    aurora_cdc_datasource_v2.py:158). Batch twin:
    operators/cdc_apply.dedup_exactly_once."""
    return stream.withWatermark("ts", watermark_delay).dropDuplicatesWithinWatermark(
        ["key_id", "seq"]
    )
