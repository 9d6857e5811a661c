"""Deterministic CDC workload generator — the reference's
scenario-weighted business-event generator (reference:
scripts/cdc_data_generator.py:92-512: new_order / status_update /
inventory_adjust / payment / ship / cancel / customer_update /
review / return / price_update with fixed weights) re-expressed as a
distributed, seed-free Spark job.

The reference drives a Python RNG loop on one machine and INSERTs
row-by-row over a MySQL connection. Here the scenario choice, key
assignment and timestamps are pure functions of the row index
(md5-derived uniforms), so the generator:

- runs as `spark.range(n)` — embarrassingly parallel, no shuffle,
  any scale;
- is bit-reproducible across runs AND engines (no RNG state to
  seed per partition);
- emits the same typed change-log schema the rest of the pipeline
  consumes (key_id, seq, operation, event_type, ts, value).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# reference scenario mix (cdc_data_generator.py weights), collapsed
# onto the operations they produce: cumulative per-mille thresholds
SCENARIOS: list[tuple[str, str, int]] = [
    # (event_type, operation, weight ‰)
    ("new_order", "INSERT", 300),
    ("status_update", "UPDATE", 200),
    ("payment", "UPDATE", 150),
    ("ship", "UPDATE", 120),
    ("customer_update", "UPDATE", 80),
    ("inventory_adjust", "UPDATE", 60),
    ("review", "INSERT", 40),
    ("price_update", "UPDATE", 30),
    ("cancel", "DELETE", 15),
    ("return", "DELETE", 5),
]
N_KEYS_DEFAULT = 1000
BASE_TS = "2024-01-01 00:00:00"


def _u(col, salt: str, mod: int):
    """Deterministic uniform in [0, mod) from md5(salt|index)."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(salt + "|"), col.cast("string"))), 1, 8),
            16,
            10,
        ).cast("long")
        % mod
    )


def generate_workload(
    spark: SparkSession, n_events: int, n_keys: int = N_KEYS_DEFAULT
) -> DataFrame:
    """n_events scenario-weighted change-log rows, ~1 event/second
    of simulated time starting at BASE_TS."""
    total = sum(w for _, _, w in SCENARIOS)
    idx = F.col("id")
    pick = _u(idx, "scenario", total)
    etype, op = None, None
    acc = 0
    for name, operation, weight in SCENARIOS:
        acc += weight
        cond = pick < acc
        etype = F.when(cond, F.lit(name)) if etype is None else etype.when(cond, F.lit(name))
        op = F.when(cond, F.lit(operation)) if op is None else op.when(cond, F.lit(operation))
    return spark.range(n_events).select(
        _u(idx, "key", n_keys).alias("key_id"),
        idx.alias("seq"),
        op.alias("operation"),
        etype.alias("event_type"),
        (
            F.to_timestamp(F.lit(BASE_TS))
            + F.make_interval(secs=idx.cast("double"))
        ).alias("ts"),
        (_u(idx, "value", 100000) / F.lit(100.0)).alias("value"),
    )
