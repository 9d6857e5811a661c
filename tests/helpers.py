"""Oracle-compare helper mirroring the driver's correctness gate:
row-count + column set + order-insensitive values vs DuckDB."""

from __future__ import annotations

import duckdb
import pandas as pd

from aurora_cdc_demo_spark.tables import TABLES


def _host_aware_duck_limit_gb() -> int:
    """DuckDB memory cap derived from MemAvailable at CONNECT time.

    r9's static 24GB cap still OOM'd in the driver's full run
    ('Failed to allocate block of 16384 bytes (bad allocation)' — an
    OS-level bad_alloc, not DuckDB's own limit firing): with the
    Spark JVM co-resident the host can have LESS free memory than
    the static cap, so DuckDB asks the OS for memory that is not
    there before its own eviction/spill machinery ever engages. Cap
    at half of what the OS reports available right now (floor 2GB so
    tiny-SF oracles still run, ceiling 24GB to keep the heavy
    inlined oracles spilling deterministically), so the buffer
    manager spills to temp_directory instead of malloc-failing."""
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemAvailable:"):
                    avail_gb = int(line.split()[1]) // (1024 * 1024)
                    return max(2, min(24, avail_gb // 2))
    except OSError:
        pass
    return 8


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute("SET temp_directory='/tmp/duck_spill'")
    con.execute(f"SET memory_limit='{_host_aware_duck_limit_gb()}GB'")
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
