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


def compact_partitions(
    spark,
    src_path: str,
    dst_path: str,
    sort_cols: tuple[str, ...] = ("key_id",),
    target_file_bytes: int = 128 << 20,
) -> dict:
    """Small-file compaction + clustering: the OPTIMIZE / ZORDER
    analog for the parquet landing zone (reference:
    unity_catalog_cdc_demo.py OPTIMIZE ... ZORDER BY; VACUUM is the
    caller deleting src after the swap).

    Rewrites the partition tree with file count sized to
    ``target_file_bytes`` and rows clustered on ``sort_cols`` inside
    each file so parquet row-group min/max stats prune key lookups.
    Writes to ``dst_path`` (atomic swap beats in-place rewrite: the
    source stays queryable during compaction and a failed run leaves
    it untouched)."""
    import os
    from urllib.parse import urlparse

    df = spark.read.parquet(src_path)
    files = df.inputFiles()
    local = [urlparse(f).path for f in files if urlparse(f).scheme in ("file", "")]
    total_bytes = sum(os.path.getsize(p) for p in local)
    n_out = max(1, -(-total_bytes // target_file_bytes))
    part_cols = [
        c for c in ("event_year", "event_month", "event_day") if c in df.columns
    ]
    writer = (
        df.repartition(n_out, *[F.col(c) for c in part_cols])
        .sortWithinPartitions(*sort_cols)
        .write.mode("overwrite")
    )
    if part_cols:
        writer = writer.partitionBy(*part_cols)
    writer.parquet(dst_path)
    after = spark.read.parquet(dst_path).inputFiles()
    return {
        "files_before": len(files),
        "files_after": len(after),
        "bytes_before": total_bytes,
    }
