"""Bucketed table materialization — the shuffle-elimination story
for repeated fact-fact joins at 100 TB.

The reference lands 500+ tables and re-joins them constantly from
notebooks; every orders⋈lineitem there pays a full shuffle of both
facts. Bucketing both tables on the join key at landing time
(`bucketBy(N, key)` + `sortBy(key)`) makes every later equi-join on
that key shuffle-free AND sort-free: Spark matches bucket files
pairwise per task. The write costs one shuffle — amortized over
every downstream join.

Sizing note for 100 TB: pick N_BUCKETS so one bucket of the BIGGER
fact fits an executor core's working set (e.g. 4 TB fact / 2048
buckets ≈ 2 GB); both join sides must use the same N.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

N_BUCKETS = 16


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: tuple[str, ...],
    sort_cols: tuple[str, ...] | None = None,
    n_buckets: int = N_BUCKETS,
) -> None:
    """Materialize ``df`` as a bucketed (and bucket-sorted) parquet
    table in the session catalog."""
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)
