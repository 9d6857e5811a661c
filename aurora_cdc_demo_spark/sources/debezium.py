"""Debezium-envelope CDC path — the reference's second ingestion
approach (reference: debezium-approach/notebooks/dlt_cdc_pipeline.py):
Kafka carries Debezium JSON envelopes; a DLT medallion pipeline
parses bronze -> silver -> gold with expectations and a dead-letter
queue.

Re-expressed Spark-first without DLT/Kafka:

- ``synth_envelopes``: wraps the typed CDC log into deterministic
  Debezium-style JSON envelopes (op codes c/u/d, before/after
  images, source block with binlog file/pos, transaction id) — the
  "bronze" payload a Kafka consumer would see. A fixed slice of rows
  (seq % 97 == 0) is corrupted to '{}' to exercise the DLQ path.
- ``parse_envelopes``: the silver parser (reference lines 163-207):
  from_json with an explicit envelope schema, op-code mapping
  (c/u/d/r -> INSERT/UPDATE/DELETE/SNAPSHOT, else UNKNOWN),
  event_timestamp from source.ts_ms, expectation filter (valid op).
- ``dead_letters``: rows failing the expectations (reference's
  cdc_errors dead-letter table).

The oracle gate checks losslessness end-to-end: build->parse on the
Spark side must reproduce exactly what plain SQL derives from the
events table (no JSON on the oracle side — any envelope or parse bug
breaks parity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CORRUPT_EVERY = 97  # seq % CORRUPT_EVERY == 0 -> malformed envelope

ENVELOPE_SCHEMA = (
    "op string, "
    "before struct<key_id:long, value:double>, "
    "after struct<key_id:long, value:double>, "
    "source struct<db:string, table:string, ts_ms:long, file:string, pos:long>, "
    "transaction struct<id:string>"
)


def synth_envelopes(log: DataFrame) -> DataFrame:
    """(seq, cdc_event JSON string) — deterministic bronze payloads."""
    op_code = (
        F.when(F.col("operation") == "INSERT", "c")
        .when(F.col("operation") == "UPDATE", "u")
        .otherwise("d")
    )
    image = F.struct(F.col("key_id"), F.col("value"))
    envelope = F.to_json(
        F.struct(
            op_code.alias("op"),
            F.when(F.col("operation") != "INSERT", image).alias("before"),
            F.when(F.col("operation") != "DELETE", image).alias("after"),
            F.struct(
                F.lit("aurora").alias("db"),
                F.lit("events").alias("table"),
                F.expr("unix_micros(ts) div 1000").alias("ts_ms"),
                F.concat(
                    F.lit("binlog."), F.lpad(F.expr("seq div 10000"), 6, "0")
                ).alias("file"),
                F.col("seq").alias("pos"),
            ).alias("source"),
            F.struct(F.expr("CAST(seq div 100 AS STRING)").alias("id")).alias(
                "transaction"
            ),
        )
    )
    return log.select(
        "seq",
        F.when(F.col("seq") % CORRUPT_EVERY == 0, F.lit("{}"))
        .otherwise(envelope)
        .alias("cdc_event"),
    )


def parse_envelopes(bronze: DataFrame) -> DataFrame:
    """Silver layer: parse + map + expectation-filter."""
    parsed = bronze.select(
        "seq", F.from_json(F.col("cdc_event"), ENVELOPE_SCHEMA).alias("p")
    )
    operation = (
        F.when(F.col("p.op") == "c", "INSERT")
        .when(F.col("p.op") == "u", "UPDATE")
        .when(F.col("p.op") == "d", "DELETE")
        .when(F.col("p.op") == "r", "SNAPSHOT")
        .otherwise("UNKNOWN")
    )
    silver = parsed.select(
        F.col("p.source.pos").alias("pos"),
        operation.alias("operation"),
        F.coalesce(F.col("p.after.key_id"), F.col("p.before.key_id")).alias(
            "key_id"
        ),
        F.col("p.after.value").alias("value"),
        F.expr("timestamp_millis(p.source.ts_ms)").alias("event_timestamp"),
        F.col("p.source.table").alias("table_name"),
        F.col("p.transaction.id").alias("transaction_id"),
    )
    # expectation: valid_operation (reference line 157) — drop others
    return silver.where(
        F.col("operation").isin("INSERT", "UPDATE", "DELETE", "SNAPSHOT")
    )


def dead_letters(bronze: DataFrame) -> DataFrame:
    """Rows failing the silver expectations (reference cdc_errors)."""
    parsed = bronze.select(
        "seq", F.from_json(F.col("cdc_event"), ENVELOPE_SCHEMA).alias("p")
    )
    return parsed.where(
        F.col("p.op").isNull()
        | ~F.col("p.op").isin("c", "u", "d", "r")
    ).select(
        "seq",
        F.lit("PARSE_ERROR").alias("error_type"),
        F.lit("invalid or missing op code").alias("error_message"),
    )


DEBEZIUM_SILVER_SQL_BODY = f"""
    SELECT seq AS pos,
           operation,
           key_id,
           CASE WHEN operation = 'DELETE' THEN NULL ELSE value END AS value,
           epoch_ms(epoch_us(ts) // 1000) AS event_timestamp,
           'events' AS table_name,
           CAST(seq // 100 AS VARCHAR) AS transaction_id
    FROM log
    WHERE seq % {CORRUPT_EVERY} <> 0
"""
