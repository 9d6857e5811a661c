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


def publish_generation(root: str, gen_dir: str) -> None:
    """Atomically point the landing zone's `_CURRENT` marker at a
    generation directory (written beforehand, e.g. by
    compact_partitions). Readers resolve `_CURRENT` first, so the
    swap is a one-file rename — the parquet analog of a Delta commit.
    """
    import os

    tmp = os.path.join(root, "_CURRENT.tmp")
    with open(tmp, "w") as fh:
        fh.write(os.path.basename(gen_dir))
    os.replace(tmp, os.path.join(root, "_CURRENT"))


def current_generation(root: str) -> str | None:
    import os

    marker = os.path.join(root, "_CURRENT")
    if not os.path.exists(marker):
        return None
    with open(marker) as fh:
        return os.path.join(root, fh.read().strip())


def vacuum_generations(root: str, keep: int = 2) -> dict:
    """The VACUUM analog (reference: unity_catalog_cdc_demo.py
    VACUUM ... RETAIN): delete all but the newest ``keep`` compacted
    generations under ``root``, NEVER the one `_CURRENT` points at —
    old generations are what time-travel readers and in-flight
    queries may still hold open, so retention is a count, not a
    blind delete. Returns what was removed/retained.

    Scale note: this is pure file-system metadata work (bounded by
    generation count, not data volume) and runs on the driver by
    design — like Delta's VACUUM planning, the data files themselves
    are deleted without being read."""
    import os
    import shutil

    gens = sorted(
        d
        for d in os.listdir(root)
        if d.startswith("gen-") and os.path.isdir(os.path.join(root, d))
    )
    cur = current_generation(root)
    cur_name = os.path.basename(cur) if cur else None
    protect = set(gens[-keep:]) if keep > 0 else set()
    if cur_name:
        protect.add(cur_name)
    removed = []
    for g in gens:
        if g not in protect:
            shutil.rmtree(os.path.join(root, g))
            removed.append(g)
    return {"removed": removed, "retained": sorted(protect & set(gens))}


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
