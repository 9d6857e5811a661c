"""Parquet table loaders for the driver-generated testdata.

The testdata writes TIMESTAMP(NANOS) parquet, which Spark's vectorized
reader rejects; we read nanos as longs
(``spark.sql.legacy.parquet.nanosAsLong``) and convert to
TimestampType with integer division (``ts div 1000``) — the same
ns→µs truncation DuckDB applies, so both engines see identical
microsecond timestamps.

At cluster scale these would be catalog tables (partitioned /
bucketed); here they are plain parquet reads — the queries stay
declarative so filter pushdown and column pruning reach the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Columns stored as TIMESTAMP(NANOS) in the testdata parquet.
_NANO_TS_COLUMNS: dict[str, list[str]] = {
    "events": ["ts"],
    "orders": ["o_orderdate"],
    "lineitem": ["l_shipdate"],
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col in _NANO_TS_COLUMNS.get(name, []):
        dtype = dict(df.dtypes).get(col)
        if dtype == "bigint":
            # TIMESTAMP(NANOS) encoding: ns-as-long → µs truncation
            df = df.withColumn(col, F.expr(f"timestamp_micros({col} div 1000)"))
        elif dtype == "timestamp_ntz":
            # defense-in-depth if the NTZ conf was not applied to the
            # session before this read (UTC session tz → same instant)
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df
