"""Oracle-compare helper mirroring the driver's correctness gate:
row-count + column set + order-insensitive values vs DuckDB."""

from __future__ import annotations

import duckdb
import pandas as pd

from aurora_cdc_demo_spark.tables import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute("SET temp_directory='/tmp/duck_spill'")
    # Explicit cap + spill dir (the tools/check_oracle.py fix): the
    # default 80%-of-RAM limit is probed at CONNECT time, and a
    # fuller host mid-suite (Spark JVM + test session resident)
    # turns the heavy inlined oracles into 'Failed to allocate
    # block' bad_allocs instead of deterministic spills — observed
    # as a flaky ann_recall_report parity OOM in a full run.
    con.execute("SET memory_limit='24GB'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    out = df.astype(str)
    return out.sort_values(by=list(out.columns)).reset_index(drop=True)


def assert_matches_oracle(spark, name: str, sf_dir: str) -> None:
    from aurora_cdc_demo_spark.registry import ORACLES, QUERIES

    sdf = QUERIES[name](spark, sf_dir).toPandas()
    con = duck_connection(sf_dir)
    ddf = con.execute(ORACLES[name]).fetchdf()
    a, b = normalize(sdf), normalize(ddf)
    assert list(a.columns) == list(b.columns), f"{name}: column mismatch"
    assert len(a) == len(b), f"{name}: row count {len(a)} vs {len(b)}"
    pd.testing.assert_frame_equal(a, b, check_dtype=False), name
