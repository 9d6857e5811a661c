"""Analytics query suite: oracle parity + determinism invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aurora_cdc_demo_spark.registry import QUERIES

from .helpers import assert_matches_oracle

TPCH_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q4_order_priority",
    "q5_local_supplier",
    "q6_revenue_forecast",
    "q10_returned_items",
    "top_customers_per_segment",
    "monthly_revenue_rollup",
    "promo_part_share",
    "asof_order_event",
]


@pytest.mark.parametrize("name", TPCH_QUERIES)
def test_oracle_parity(spark, sf_dir, name):
    assert_matches_oracle(spark, name, sf_dir)


def test_q3_topn_is_deterministic(spark, sf_dir):
    a = QUERIES["q3_shipping_priority"](spark, sf_dir).toPandas()
    b = QUERIES["q3_shipping_priority"](spark, sf_dir).toPandas()
    assert a.sort_values("l_orderkey").reset_index(drop=True).equals(
        b.sort_values("l_orderkey").reset_index(drop=True)
    )


def test_rollup_grand_total_consistent(spark, sf_dir):
    roll = QUERIES["monthly_revenue_rollup"](spark, sf_dir)
    grand = roll.where("region_name = 'ALL'").agg(F.sum("revenue")).collect()[0][0]
    regions = (
        roll.where("region_name <> 'ALL' AND order_month = TIMESTAMP '1900-01-01'")
        .agg(F.sum("revenue"))
        .collect()[0][0]
    )
    assert abs(grand - regions) < 1e-6


def test_asof_event_not_after_purchase(spark, sf_dir):
    asof = QUERIES["asof_order_event"](spark, sf_dir)
    assert asof.where(F.col("asof_ts") > F.col("purchase_ts")).count() == 0
