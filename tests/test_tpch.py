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
    "asof_order_event_tolerance",
    "q7_nation_volume",
    "q8_market_share",
    "q12_late_lines",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q16_part_supplier_variety",
    "q17_small_qty_revenue",
    "q18_large_volume_customers",
    "q19_bracket_revenue",
    "q22_dormant_customers",
    "q9_product_profit",
    "q11_inventory_value",
    "q2_min_cost_supplier",
    "q20_excess_stock_suppliers",
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


def test_q13_distribution_covers_all_customers(spark, sf_dir):
    from aurora_cdc_demo_spark.tables import load_table

    dist = QUERIES["q13_customer_distribution"](spark, sf_dir)
    total = dist.agg(F.sum("custdist")).collect()[0][0]
    assert total == load_table(spark, sf_dir, "customer").count()


def test_q18_threshold_holds(spark, sf_dir):
    big = QUERIES["q18_large_volume_customers"](spark, sf_dir)
    assert big.where(F.col("sum_qty") <= 150).count() == 0


def test_asof_event_not_after_purchase(spark, sf_dir):
    asof = QUERIES["asof_order_event"](spark, sf_dir)
    assert asof.where(F.col("asof_ts") > F.col("purchase_ts")).count() == 0


def test_asof_tolerance_nulls_only_stale_matches(spark, sf_dir):
    """The tolerance variant equals the plain as-of wherever the
    match is within 24h, and nulls exactly the staler matches."""
    plain = QUERIES["asof_order_event"](spark, sf_dir).select(
        "purchase_seq", "asof_ts", "asof_seq"
    )
    tol = QUERIES["asof_order_event_tolerance"](spark, sf_dir).select(
        "purchase_seq",
        F.col("asof_ts").alias("t_ts"),
        F.col("asof_seq").alias("t_seq"),
        "purchase_ts",
    )
    j = plain.join(tol, "purchase_seq")
    in_tol = (
        F.unix_micros("purchase_ts") - F.unix_micros("asof_ts")
        <= 24 * 3600 * 1_000_000
    )
    assert j.where(in_tol & (F.col("t_seq") != F.col("asof_seq"))).count() == 0
    assert j.where(in_tol & F.col("t_ts").isNull()).count() == 0
    assert j.where(~in_tol & F.col("t_ts").isNotNull()).count() == 0
