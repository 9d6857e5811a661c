"""Salted aggregation + trend operators."""

from __future__ import annotations

import pytest

from aurora_cdc_demo_spark.operators.trend import trend_pandas
from aurora_cdc_demo_spark.registry import QUERIES
from aurora_cdc_demo_spark.sources.cdc_log import cdc_operation_log

from .helpers import assert_matches_oracle


@pytest.mark.parametrize("name", ["skew_salted_agg", "user_value_trend"])
def test_oracle_parity(spark, sf_dir, name):
    assert_matches_oracle(spark, name, sf_dir)


def test_trend_pandas_agrees_with_sql(spark, sf_dir):
    """The applyInPandas implementation and the closed-form SQL
    implementation must agree (same formula, numpy vs codegen)."""
    log = cdc_operation_log(spark, sf_dir)
    a = trend_pandas(log).toPandas().set_index("key_id").sort_index()
    b = (
        QUERIES["user_value_trend"](spark, sf_dir)
        .toPandas()
        .set_index("key_id")
        .sort_index()
    )
    assert (a["n"] == b["n"]).all()
    both = a["slope_per_day"].notna() & b["slope_per_day"].notna()
    assert (a["slope_per_day"].isna() == b["slope_per_day"].isna()).all()
    assert (a["slope_per_day"][both] - b["slope_per_day"][both]).abs().max() < 1e-3
