"""AS-OF join — an operator Spark lacks natively, built as a
composition of union + running last_value (no range join, no UDF).

For each probe row, find the most recent build row with
build.ts <= probe.ts for the same key. The union trick turns the
range lookup into ONE shuffle on (key) + a running window — linear,
skew-tolerant via AQE, and scales to 100 TB because no O(n*m)
expansion ever materializes (contrast: equality-join-then-filter
explodes on hot keys).

The DuckDB oracle uses its native ASOF JOIN; ties on ts are broken
by ordering build rows before probe rows at equal ts (inclusive <=).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    probe_ts: str = "ts",
    build_ts: str = "ts",
    build_seq: str | None = None,
    build_payload: list[str] | None = None,
    prefix: str = "asof_",
    direction: str = "backward",
    tolerance_us: int | None = None,
) -> DataFrame:
    """Left as-of join: probe columns + matched build payload columns
    (renamed ``{prefix}{col}``) per key —

    - ``direction="backward"`` (default): latest build row with
      build_ts <= probe_ts;
    - ``direction="forward"``: earliest build row with
      build_ts >= probe_ts (the scan runs in reverse time order,
      same single shuffle + running window).

    ``build_seq`` (unique within key+ts) makes equal-timestamp build
    rows deterministically ordered (min seq wins in forward mode).

    ``tolerance_us``: maximum |probe_ts - build_ts| in microseconds
    (pandas merge_asof's ``tolerance``) — a match farther away is
    nulled out, keeping the probe row (left semantics). Applied as a
    post-projection, so the plan is unchanged: still one shuffle +
    one running window, no range join.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction {direction!r}")
    payload = build_payload or [c for c in build.columns if c not in (key, build_ts)]
    b = build.select(
        F.col(key).alias("_k"),
        F.col(build_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        (F.col(build_seq) if build_seq else F.lit(0)).cast("long").alias("_ord"),
        F.struct(
            F.col(build_ts).alias(f"{prefix}{build_ts}"),
            *[F.col(c).alias(f"{prefix}{c}") for c in payload],
        ).alias("_payload"),
        *[F.lit(None).cast(probe.schema[c].dataType).alias(c) for c in probe.columns],
    )
    p = probe.select(
        F.col(key).alias("_k"),
        F.col(probe_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(0).cast("long").alias("_ord"),
        F.lit(None).cast(b.schema["_payload"].dataType).alias("_payload"),
        *probe.columns,
    )
    if direction == "backward":
        order = [F.col("_ts").asc(), F.col("_side").asc(), F.col("_ord").asc()]
    else:
        order = [F.col("_ts").desc(), F.col("_side").asc(), F.col("_ord").desc()]
    w = (
        Window.partitionBy("_k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = b.unionByName(p).withColumn(
        "_last", F.last("_payload", ignorenulls=True).over(w)
    )
    out = unioned.where(F.col("_side") == 1)
    if tolerance_us is None:
        return out.select(
            *probe.columns, F.col(f"_last.{prefix}{build_ts}"),
            *[F.col(f"_last.{prefix}{c}") for c in payload]
        )
    gap = F.abs(
        F.unix_micros(F.col("_ts"))
        - F.unix_micros(F.col(f"_last.{prefix}{build_ts}"))
    )
    in_tol = gap <= F.lit(tolerance_us)
    return out.select(
        *probe.columns,
        F.when(in_tol, F.col(f"_last.{prefix}{build_ts}"))
        .alias(f"{prefix}{build_ts}"),
        *[
            F.when(in_tol, F.col(f"_last.{prefix}{c}")).alias(f"{prefix}{c}")
            for c in payload
        ],
    )


def asof_join_nearest(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    probe_ts: str = "ts",
    build_ts: str = "ts",
    build_seq: str | None = None,
    build_payload: list[str] | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """NEAREST as-of (pandas merge_asof direction='nearest'): the
    build row minimizing |build_ts - probe_ts| per key, composed as
    one backward and one forward pass of :func:`asof_join` with a
    per-row winner pick. Tie on |delta| prefers the BACKWARD (past)
    match — attribution semantics: never credit the future when the
    past is equally close. Within each direction the directional
    tie rules hold (backward: max seq at equal ts; forward: min).

    Scale: exactly two union+running-window passes (two key
    shuffles) — still no range join, no O(n*m) expansion; the pick
    is a per-row projection."""
    payload = build_payload or [
        c for c in build.columns if c not in (key, build_ts)
    ]
    bwd = asof_join(
        probe, build, key, probe_ts, build_ts, build_seq,
        payload, prefix="_b_", direction="backward",
    )
    both = asof_join(
        bwd, build, key, probe_ts, build_ts, build_seq,
        payload, prefix="_f_", direction="forward",
    )
    pts = F.unix_micros(F.col(probe_ts))
    bd = F.abs(pts - F.unix_micros(F.col(f"_b_{build_ts}")))
    fd = F.abs(pts - F.unix_micros(F.col(f"_f_{build_ts}")))
    take_b = F.col(f"_b_{build_ts}").isNotNull() & (
        F.col(f"_f_{build_ts}").isNull() | (bd <= fd)
    )
    cols = [f"{build_ts}"] + payload
    return both.select(
        *probe.columns,
        *[
            F.when(take_b, F.col(f"_b_{c}"))
            .otherwise(F.col(f"_f_{c}"))
            .alias(f"{prefix}{c}")
            for c in cols
        ],
    )
