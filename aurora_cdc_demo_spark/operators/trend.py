"""Per-key trend fitting (feature engineering for the training-data
pipeline): OLS slope of `value` over time per user.

Two implementations with identical semantics:
- ``trend_sql``: closed-form slope from SUM aggregates (JVM-side,
  whole-stage codegen; the oracle twin) — the scale path.
- ``trend_pandas``: grouped ``applyInPandas`` (Arrow-batched numpy
  per group) — demonstrates the custom-operator escape hatch for
  logic SQL can't express; pytest asserts it agrees with the SQL
  form.

x is normalized to days-from-first-event per key, keeping the
moment sums small so double rounding is stable cross-engine at
round(4).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

DAY_US = 86_400_000_000.0


def trend_sql(log: DataFrame) -> DataFrame:
    """slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2), x in days since the
    key's first event. Keys with a single event or zero x-variance
    get NULL slope."""
    w_min = F.min(F.unix_micros(F.col("ts"))).over(Window.partitionBy("key_id"))
    x = (F.unix_micros(F.col("ts")) - w_min) / F.lit(DAY_US)
    prepared = log.select(
        "key_id", x.alias("x"), F.col("value").alias("y")
    )
    agg = prepared.groupBy("key_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    denom = agg["n"] * agg["sxx"] - agg["sx"] * agg["sx"]
    slope = (agg["n"] * agg["sxy"] - agg["sx"] * agg["sy"]) / denom
    return agg.select(
        "key_id",
        "n",
        F.round(F.when(denom > 1e-12, slope), 4).alias("slope_per_day"),
    )


TREND_SQL_ORACLE = """
    WITH log AS (
        SELECT user_id AS key_id, ts, value FROM events)
    , prepared AS (
        SELECT key_id,
               (epoch_us(ts) - MIN(epoch_us(ts)) OVER (PARTITION BY key_id))
                   / 86400000000.0 AS x,
               value AS y
        FROM log)
    , agg AS (
        SELECT key_id, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
               SUM(x * y) AS sxy, SUM(x * x) AS sxx
        FROM prepared GROUP BY key_id)
    SELECT key_id, n,
           ROUND(CASE WHEN (n * sxx - sx * sx) > 1e-12
                      THEN (n * sxy - sx * sy) / (n * sxx - sx * sx)
                 END, 4) AS slope_per_day
    FROM agg
"""

TREND_SCHEMA = StructType(
    [
        StructField("key_id", LongType()),
        StructField("n", LongType()),
        StructField("slope_per_day", DoubleType()),
    ]
)


def _fit_group(pdf: pd.DataFrame) -> pd.DataFrame:
    import numpy as np

    ts_us = pdf["ts"].astype("int64") // 1000
    x = (ts_us - ts_us.min()).to_numpy() / DAY_US
    y = pdf["value"].to_numpy()
    n = len(pdf)
    sx, sy = x.sum(), y.sum()
    sxy, sxx = float(np.dot(x, y)), float(np.dot(x, x))
    denom = n * sxx - sx * sx
    slope = round((n * sxy - sx * sy) / denom, 4) if denom > 1e-12 else None
    return pd.DataFrame(
        {"key_id": [pdf["key_id"].iloc[0]], "n": [n], "slope_per_day": [slope]}
    )


def trend_pandas(log: DataFrame) -> DataFrame:
    return (
        log.select("key_id", "ts", "value")
        .groupBy("key_id")
        .applyInPandas(_fit_group, schema=TREND_SCHEMA)
    )
