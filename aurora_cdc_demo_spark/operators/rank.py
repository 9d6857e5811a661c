"""Band-prefix global order statistics WITHOUT a global sort or an
unpartitioned window — the shared machinery behind the RFM marts
(#170/#342), both Gini queries (#233/#397), the exact fact-grain
price deciles (#254), and the Pareto cumulative share (#132). r7
verdict item 5: this was the same decomposition written twice
(_rfm_ranked, _gini_weighted_rank) plus two inline variants; one
implementation now serves all of them, with the plan law in
tests/test_plan_laws.py pinning zero unpartitioned windows in
everything it emits.

The decomposition (the #132 proof style, r5-r7):

  1. ONE 1-row bounds aggregate (min/max per ranked column) is
     broadcast onto the input; each row gets a BUCKET ID that is a
     monotone function of its value — equal values can never
     straddle a bucket, so bucket order + in-bucket order equals
     the global order exactly.
  2. Bucket populations (or bucket measure totals, for cumulative
     sums) aggregate to an N_BUCKETS-row table; each bucket's
     PREFIX comes from a bounded N_BUCKETS x N_BUCKETS self-join —
     no window even at bucket grain.
  3. In-bucket ranks / running sums run under windows PARTITIONED
     by bucket (~1/N_BUCKETS of the input per reducer, and
     N_BUCKETS is a knob); global = bucket prefix + in-bucket.

Overflow class (ADVICE r7): the bucket expression
(v - lo) * N_BUCKETS runs DECIMAL(38,0)-widened — BIGINT overflows
once the value RANGE exceeds ~2^58, and ANSI mode would fail the
query rather than degrade. Decimal widening keeps the bucket id
exact at any range and identical to the BIGINT result wherever
BIGINT sufficed, so oracle hashes are unchanged at every sf.

Oracles deliberately keep the single global window (small-scale
truth); the driver's hash match is the exactness proof of the
decomposition, query by query.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

BAND_BUCKETS = 32


@dataclass(frozen=True)
class RankSpec:
    """One global order statistic over an integral (LONG) column.

    value_col: the column ranked / accumulated (must be integral —
      callers pre-scale decimals to integer grain, the repo-wide
      exactness discipline).
    out_col: name of the produced column.
    ascending: global order direction on value_col.
    tiebreak: deterministic in-bucket tie-break columns AFTER the
      value (each (name, asc)); may be empty when the consumer's
      output is tie-order-independent (#254: the value at a rank
      position is unique whatever the tie order).
    cumsum_col: None -> out_col is the global 1-based RANK
      (row_number semantics). A column name -> out_col is the
      global RUNNING SUM of that column in the spec's order (the
      #132 Pareto shape); the default window frame (RANGE unbounded
      preceding .. current row) is kept, matching the oracles'
      plain `SUM(...) OVER (ORDER BY ...)`.
    """

    value_col: str
    out_col: str
    ascending: bool = True
    tiebreak: tuple = field(default_factory=tuple)
    cumsum_col: str | None = None


def _bucket_expr(spec: RankSpec, n_buckets: int) -> str:
    lo, hi = f"_lo_{spec.value_col}", f"_hi_{spec.value_col}"
    v = f"CAST({spec.value_col} AS DECIMAL(38,0))"
    h = f"CAST({hi} AS DECIMAL(38,0))"
    if spec.ascending:
        num = f"({v} - {lo}) * {n_buckets}"
    else:
        num = f"({h} - {spec.value_col}) * {n_buckets}"
    return f"CAST(({num}) div ({h} - {lo} + 1) AS BIGINT)"


def band_prefix(
    df: DataFrame,
    specs: list[RankSpec],
    n_buckets: int = BAND_BUCKETS,
    checkpoint: bool = True,
) -> DataFrame:
    """df + one output column per spec; all specs share one bounds
    broadcast and one (optionally checkpointed) bucketed table, so
    a three-metric mart costs one fact pass plus three bounded
    bucket passes. Zero unpartitioned windows, zero global sorts —
    pinned for every consumer by tests/test_plan_laws.py."""
    in_cols = list(df.columns)
    bounds = df.agg(
        *[
            a
            for s in specs
            for a in (
                F.min(s.value_col).alias(f"_lo_{s.value_col}"),
                F.max(s.value_col).alias(f"_hi_{s.value_col}"),
            )
        ]
    )
    b = df.crossJoin(F.broadcast(bounds)).select(
        *[F.col(c) for c in in_cols],
        *[
            F.expr(_bucket_expr(s, n_buckets)).alias(f"_bkt_{s.out_col}")
            for s in specs
        ],
    )
    if checkpoint:
        b = b.localCheckpoint()

    out = b
    for s in specs:
        bcol = f"_bkt_{s.out_col}"
        measure = (
            F.count(F.lit(1)).cast("long")
            if s.cumsum_col is None
            else F.sum(s.cumsum_col).cast("long")
        )
        cnt = b.groupBy(bcol).agg(measure.alias("_m"))
        lo2 = cnt.select(F.col(bcol).alias("_b2"), F.col("_m").alias("_m2"))
        pre = (
            cnt.join(lo2, F.col("_b2") < F.col(bcol), "left")
            .groupBy(bcol)
            .agg(
                F.coalesce(F.sum("_m2"), F.lit(0))
                .cast("long")
                .alias(f"_pre_{s.out_col}")
            )
        )
        order = [
            F.col(s.value_col).asc()
            if s.ascending
            else F.col(s.value_col).desc()
        ] + [
            F.col(c).asc() if asc else F.col(c).desc()
            for c, asc in s.tiebreak
        ]
        w_in = Window.partitionBy(bcol).orderBy(*order)
        inner = (
            F.row_number().over(w_in)
            if s.cumsum_col is None
            else F.sum(s.cumsum_col).over(w_in)
        )
        out = out.join(F.broadcast(pre), bcol).withColumn(
            s.out_col,
            (F.col(f"_pre_{s.out_col}") + inner).cast("long"),
        )
    drop = [f"_bkt_{s.out_col}" for s in specs] + [
        f"_pre_{s.out_col}" for s in specs
    ]
    return out.drop(*drop)


def band_prefix_rank(
    df: DataFrame,
    value_col: str,
    key_col: str,
    out_col: str = "global_rank",
    ascending: bool = True,
    n_buckets: int = BAND_BUCKETS,
) -> DataFrame:
    """Single-metric convenience form: global 1-based rank of
    value_col with key_col as the deterministic tie-break."""
    return band_prefix(
        df,
        [
            RankSpec(
                value_col=value_col,
                out_col=out_col,
                ascending=ascending,
                tiebreak=((key_col, True),),
            )
        ],
        n_buckets=n_buckets,
    )
