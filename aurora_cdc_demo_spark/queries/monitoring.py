"""CDC monitoring aggregations — the reference's dashboard queries
(reference: src/notebooks/demo/cdc_500_tables_streaming.py:366-425)
re-expressed as batch DataFrame aggregations. The streaming versions
of the same plans live in streaming/pipelines.py; batch/stream share
the aggregation logic, which is how Structured Streaming is meant to
be used.

Scale: each is a single hash aggregate with map-side partial
aggregation; the windowed variant groups on a derived hour column so
the shuffle key is (hour, operation) — bounded cardinality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def event_counts_windowed(log: DataFrame) -> DataFrame:
    """1-hour tumbling window per operation: event count, error
    count, max ts (reference monitoring query #1, lines 373-392)."""
    return (
        log.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("window_start"),
            "operation",
        )
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
            .cast("long")
            .alias("error_count"),
            F.max("ts").alias("last_event_time"),
            F.round(F.sum(F.col("value").cast("decimal(12,2)")).cast("double"), 4)
            .alias("sum_value"),
        )
    )


def table_stats(log: DataFrame) -> DataFrame:
    """Per-operation totals, distinct keys, first/last event
    (reference monitoring query #2, lines 395-410)."""
    agg = log.groupBy("operation").agg(
        F.count(F.lit(1)).alias("total_events"),
        F.countDistinct("key_id").alias("unique_keys"),
        F.min("ts").alias("first_event"),
        F.max("ts").alias("last_event"),
        # exact cents so the average can be an integer floor division
        # (cross-engine deterministic; double round() is not)
        (F.sum(F.col("value").cast("decimal(12,2)")) * 100)
        .cast("long")
        .alias("_cents"),
    )
    return agg.select(
        "operation",
        "total_events",
        "unique_keys",
        "first_event",
        "last_event",
        F.expr("(10 * _cents) div total_events").alias("avg_value_milli"),
    )


def error_monitor(log: DataFrame) -> DataFrame:
    """Daily error feed (reference monitoring query #3, lines
    413-423): error events per day with affected-key counts."""
    return (
        log.where(F.col("event_type") == "error")
        .groupBy(F.date_trunc("day", F.col("ts")).alias("error_day"))
        .agg(
            F.count(F.lit(1)).alias("n_errors"),
            F.countDistinct("key_id").alias("n_keys"),
            F.max("ts").alias("last_error_ts"),
        )
    )
