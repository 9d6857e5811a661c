"""Partitioned landing sink — the reference enriches CDC events with
ingestion metadata and lands Delta tables partitioned by
year/month/day (reference: cdc_500_tables_streaming.py:127-134 and
283-287). Same surface on plain parquet: date-derived partition
columns so downstream scans get partition pruning.

Scale: partitionBy(year, month, day) keeps per-partition file counts
bounded and lets the 100 TB reader prune to the queried date range
before touching data; the enrichment is a narrow projection (no
shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_for_landing(log: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Add the reference's ingestion/partition columns."""
    t = F.col(ts_col)
    return (
        log.withColumn("ingestion_timestamp", F.current_timestamp())
        .withColumn("event_year", F.year(t))
        .withColumn("event_month", F.month(t))
        .withColumn("event_day", F.dayofmonth(t))
        .withColumn("event_hour", F.hour(t))
    )


def write_partitioned(log: DataFrame, path: str, ts_col: str = "ts") -> None:
    (
        enrich_for_landing(log, ts_col)
        .write.mode("overwrite")
        .partitionBy("event_year", "event_month", "event_day")
        .parquet(path)
    )
