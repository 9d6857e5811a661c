"""Range (interval-containment) join — the second custom join class
the reference's analytics surface implies but Spark lacks natively
(the first, as-of, lives in operators/asof.py).

Problem shape: match events to time windows with NO shared equi-key —
a naive theta-join (`ts BETWEEN start AND end`) is a broadcast
nested loop, O(|events| * |windows|), which dies at scale.

Scale pattern used here: quantize time into fixed buckets; explode
each window into the buckets it spans (windows are bounded, so this
is a small constant fan-out), keep each event in its single bucket,
then equi-join on the bucket and post-filter exact containment. One
hash shuffle on the bucket key, work O(|events| + |windows| * spam +
|true matches|). An event lives in exactly one bucket and a window
appears at most once per bucket, so the join emits no duplicates —
no distinct needed.

The DuckDB oracle runs the plain BETWEEN join (small-scale truth);
both sides must agree exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BUCKET_US = 3600 * 1_000_000  # 1 hour
WINDOW_US = 5 * 60 * 1_000_000  # ±5 minutes


def error_windows(log: DataFrame) -> DataFrame:
    """One ±5-minute window per DELETE (error) event."""
    err = log.where(F.col("operation") == "DELETE")
    ts_us = F.unix_micros(F.col("ts"))
    return err.select(
        F.col("seq").alias("window_seq"),
        (ts_us - WINDOW_US).alias("win_start_us"),
        (ts_us + WINDOW_US).alias("win_end_us"),
    )


def range_join_buckets(log: DataFrame) -> DataFrame:
    """Non-error events inside any error window, via the bucketed
    equi-join described in the module docstring."""
    windows = error_windows(log)
    w_bucketed = windows.select(
        "window_seq",
        "win_start_us",
        "win_end_us",
        F.explode(
            F.sequence(
                (F.col("win_start_us") / BUCKET_US).cast("long"),
                (F.col("win_end_us") / BUCKET_US).cast("long"),
            )
        ).alias("bucket"),
    )
    ev = log.where(F.col("operation") != "DELETE").select(
        F.col("seq").alias("event_seq"),
        F.col("event_type"),
        F.unix_micros(F.col("ts")).alias("ev_us"),
        (F.unix_micros(F.col("ts")) / BUCKET_US).cast("long").alias("bucket"),
    )
    return (
        ev.join(w_bucketed, "bucket")
        .where(
            (F.col("ev_us") >= F.col("win_start_us"))
            & (F.col("ev_us") <= F.col("win_end_us"))
        )
        .select("window_seq", "event_seq", "event_type")
    )


RANGE_JOIN_SQL_BODY = """
    , windows AS (
        SELECT seq AS window_seq,
               epoch_us(ts) - 300000000 AS win_start_us,
               epoch_us(ts) + 300000000 AS win_end_us
        FROM log WHERE operation = 'DELETE')
    , ev AS (
        SELECT seq AS event_seq, event_type, epoch_us(ts) AS ev_us
        FROM log WHERE operation <> 'DELETE')
    SELECT window_seq, event_seq, event_type
    FROM ev JOIN windows
      ON ev_us >= win_start_us AND ev_us <= win_end_us
"""
