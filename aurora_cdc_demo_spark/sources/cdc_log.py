"""Typed CDC change log derived from the `events` table.

The reference's workload generator (reference:
scripts/cdc_data_generator.py:92-512) emits weighted business
scenarios that land as INSERT / UPDATE / DELETE binlog events. We
re-express that surface deterministically over the driver's `events`
table: every row becomes one change-log record keyed by `user_id`,
with the operation derived from the event type:

    signup               -> INSERT
    click/view/purchase  -> UPDATE
    error                -> DELETE

`event_id` is the monotonic binlog sequence (reference:
aurora_cdc_datasource_v2.py:248-308 uses binlog file+position the
same way) and is the deterministic tie-break within a timestamp.

Scale note: this is a narrow projection + CASE over a parquet scan —
no shuffle; column pruning reaches the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table

CDC_LOG_COLUMNS = ["key_id", "seq", "operation", "event_type", "ts", "value"]

# Shared CASE expression — one definition used by every oracle query.
CDC_LOG_SQL = """
    SELECT
        user_id AS key_id,
        event_id AS seq,
        CASE
            WHEN event_type = 'signup' THEN 'INSERT'
            WHEN event_type = 'error' THEN 'DELETE'
            ELSE 'UPDATE'
        END AS operation,
        event_type,
        ts,
        value
    FROM events
"""


def cdc_operation_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    op = (
        F.when(F.col("event_type") == "signup", F.lit("INSERT"))
        .when(F.col("event_type") == "error", F.lit("DELETE"))
        .otherwise(F.lit("UPDATE"))
    )
    return ev.select(
        F.col("user_id").alias("key_id"),
        F.col("event_id").alias("seq"),
        op.alias("operation"),
        "event_type",
        "ts",
        "value",
    )
