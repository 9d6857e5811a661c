"""Skew-mitigation aggregation: two-phase salted groupBy.

At 100 TB a handful of hot keys (here: 5 event types over billions
of rows) make a plain hash aggregate straggle on the reducers owning
those keys. The standard fix is salting: phase 1 aggregates on
(key, salt) spreading each hot key over N reducers; phase 2 merges
the N partials per key. Results are identical to the plain
aggregate — which is exactly what the DuckDB oracle checks.

(For SUM/COUNT Spark's map-side partial aggregation already gives
much of this; salting matters for high-cardinality-input aggs like
COUNT(DISTINCT) or collect-style states, and for AQE-less engines.
The operator demonstrates the pattern with deterministic salt =
seq % N so the oracle can ignore it entirely.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_SALTS = 16


def salted_agg(log: DataFrame, n_salts: int = N_SALTS) -> DataFrame:
    """Two-phase event-type aggregate with salt = seq % n_salts:
    per (event_type, salt) partials, then per event_type merge.
    Decimal value math keeps the sum exact → identical to the plain
    single-phase aggregate on any engine."""
    val = F.col("value").cast("decimal(12,2)")
    phase1 = (
        log.withColumn("_salt", F.col("seq") % n_salts)
        .groupBy("event_type", "_salt")
        .agg(
            F.count(F.lit(1)).alias("_cnt"),
            F.sum(val).alias("_sum"),
            F.max("ts").alias("_max_ts"),
        )
    )
    return (
        phase1.groupBy("event_type")
        .agg(
            F.sum("_cnt").cast("long").alias("n_events"),
            F.sum("_sum").cast("double").alias("sum_value"),
            F.max("_max_ts").alias("last_ts"),
        )
    )


SALTED_AGG_SQL = """
    WITH log AS (
        SELECT event_id AS seq, event_type, ts, value FROM events)
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value,
           MAX(ts) AS last_ts
    FROM log GROUP BY event_type
"""
