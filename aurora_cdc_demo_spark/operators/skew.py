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


def row_salt(
    fact: DataFrame, row_id_col: str | None, n_salts: int
):
    """Deterministic per-ROW salt expression. The salt MUST vary
    within a join key — deriving it from the join key itself would
    give every row of a hot key the same salt, leaving the (key,
    salt) distribution identical to key alone and the mitigation a
    no-op. Salt from the row identity instead: md5 of `row_id_col`
    when the fact has one, else xxhash64 over all fact columns."""
    if row_id_col is not None:
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col(row_id_col).cast("string"), F.lit("#")
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % n_salts
        )
    return F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), n_salts)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    n_salts: int = N_SALTS,
    row_id_col: str | None = None,
) -> DataFrame:
    """Skew-safe equi-join: the FACT side gets a deterministic
    per-ROW salt (md5 of `row_id_col`, or xxhash64 of the whole row
    when no id column is given — never the join key, see row_salt)
    and the DIM side is replicated n_salts ways, so one hot key's
    fact rows spread over n_salts reducers instead of melting a
    single one. The join result is EXACTLY the plain join (each fact
    row meets precisely the one dim replica carrying its salt) —
    pinned by the oracle, which runs the unsalted join.

    This is the manual form of what AQE skew-join does adaptively
    (splitting oversized partitions at runtime); you write it by
    hand when the skew is known and stable (power-law user keys) or
    when the engine's threshold heuristics don't fire. Cost: dim is
    shuffled n_salts times larger — only worth it when dim is small
    relative to the hot key's volume but too big (or too
    churn-prone) to broadcast."""
    salted_fact = fact.withColumn(
        "_salt", row_salt(fact, row_id_col, n_salts)
    )
    replicated = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("long"))
    cond = (F.col(fact_key) == F.col(dim_key)) & (
        salted_fact["_salt"] == replicated["_salt"]
    )
    return salted_fact.join(replicated, cond).drop("_salt")
