"""Driver contract for the spark-graft builder (PySpark target).

``queries()``/``oracle_sql()`` are backed by the package registry
(the aurora_cdc_demo_spark/registry package + modules it
imports); every
SURVEY.md §2 operator registers itself there with a matching DuckDB
oracle where SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from aurora_cdc_demo_spark.registry import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: CDC latest-state materialization on sf0.001 — the
    core capability of the reference pipeline (binlog events → merged
    current-state table)."""
    return QUERIES["cdc_latest_state"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
