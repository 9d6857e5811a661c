"""Unit laws for operators/rank.band_prefix (r7 verdict item 5):
the shared band-prefix machinery must equal the plain global-window
form on arbitrary data — including tie groups, single-bucket
degenerate ranges, and value ranges wide enough to overflow BIGINT
bucket algebra (the ADVICE r7 class the DECIMAL(38,0) widening
exists for). The registered consumers' oracle hashes are the
end-to-end proof; these are the operator-local laws."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import Window
from pyspark.sql import functions as F

from aurora_cdc_demo_spark.operators.rank import (
    RankSpec,
    band_prefix,
    band_prefix_rank,
)


def _mkdf(spark, rows):
    return spark.createDataFrame(rows, "k long, v long, w long")


ROWS = [
    (1, 50, 2),
    (2, -3, 1),
    (3, 50, 5),  # tie with k=1
    (4, 7, 3),
    (5, 999, 1),
    (6, -3, 4),  # tie with k=2
    (7, 0, 2),
    (8, 7, 7),  # tie with k=4
]


def test_rank_asc_equals_global_window(spark):
    df = _mkdf(spark, ROWS)
    got = {
        r.k: r.rnk
        for r in band_prefix_rank(
            df, "v", "k", out_col="rnk", ascending=True
        ).collect()
    }
    w = Window.orderBy(F.col("v").asc(), F.col("k").asc())
    want = {
        r.k: r.rnk
        for r in df.withColumn(
            "rnk", F.row_number().over(w).cast("long")
        ).collect()
    }
    assert got == want


def test_rank_desc_equals_global_window(spark):
    df = _mkdf(spark, ROWS)
    got = {
        r.k: r.rnk
        for r in band_prefix_rank(
            df, "v", "k", out_col="rnk", ascending=False
        ).collect()
    }
    w = Window.orderBy(F.col("v").desc(), F.col("k").asc())
    want = {
        r.k: r.rnk
        for r in df.withColumn(
            "rnk", F.row_number().over(w).cast("long")
        ).collect()
    }
    assert got == want


def test_cumsum_equals_global_window(spark):
    df = _mkdf(spark, ROWS)
    got = {
        r.k: r.cum
        for r in band_prefix(
            df,
            [
                RankSpec(
                    "v",
                    "cum",
                    ascending=False,
                    tiebreak=(("k", True),),
                    cumsum_col="w",
                )
            ],
        ).collect()
    }
    w = Window.orderBy(F.col("v").desc(), F.col("k").asc())
    want = {
        r.k: r.cum
        for r in df.withColumn(
            "cum", F.sum("w").over(w).cast("long")
        ).collect()
    }
    assert got == want


def test_multi_spec_shares_one_pass(spark):
    df = _mkdf(spark, ROWS)
    out = band_prefix(
        df,
        [
            RankSpec("v", "r1", ascending=True, tiebreak=(("k", True),)),
            RankSpec("w", "r2", ascending=False, tiebreak=(("k", True),)),
        ],
    )
    w1 = Window.orderBy(F.col("v").asc(), F.col("k").asc())
    w2 = Window.orderBy(F.col("w").desc(), F.col("k").asc())
    want = {
        (r.k): (r.r1, r.r2)
        for r in df.withColumn("r1", F.row_number().over(w1).cast("long"))
        .withColumn("r2", F.row_number().over(w2).cast("long"))
        .collect()
    }
    got = {r.k: (r.r1, r.r2) for r in out.collect()}
    assert got == want


def test_degenerate_single_value_range(spark):
    df = _mkdf(spark, [(i, 5, 1) for i in range(1, 6)])
    got = {
        r.k: r.rnk
        for r in band_prefix_rank(df, "v", "k", out_col="rnk").collect()
    }
    assert got == {i: i for i in range(1, 6)}


def test_bigint_range_overflow_class(spark):
    """ADVICE r7: (v - lo) * 32 overflows BIGINT once the value
    range exceeds ~2^58; under ANSI mode the query would FAIL
    rather than degrade. The DECIMAL(38,0)-widened bucket algebra
    must rank extreme-range values exactly."""
    big = 2**62
    rows = [(1, -big, 1), (2, big, 1), (3, 0, 1), (4, big - 7, 1)]
    df = _mkdf(spark, rows)
    got = {
        r.k: r.rnk
        for r in band_prefix_rank(df, "v", "k", out_col="rnk").collect()
    }
    assert got == {1: 1, 3: 2, 4: 3, 2: 4}
