"""Analytics queries over the CDC-landed warehouse tables — the
query surface a user of the reference pipeline runs on the Delta
tables it maintains (reference: notebooks query the landed tables,
e.g. unity_catalog_cdc_demo.py:554-663). TPC-H-shaped because the
reference's schema IS TPC-H (reference: scripts/setup_tpch_database.py).

Determinism policy (drives the DuckDB oracle gate): money columns are
2-decimal values stored as doubles, so all money arithmetic is cast
to DECIMAL first (exact, associative — immune to float summation
order differing between engines) and final aggregates are cast to
DOUBLE once. Ranking/top-N always tie-breaks on a unique key.

Scale notes: dimension joins (region/nation/part/supplier) broadcast;
fact-fact joins shuffle only on the join key with filters pushed
below; aggregations get map-side partial aggregation. Verified via
.explain in tests/test_plans.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load_table

# ---- decimal helpers: exact money math on both engines ----


def _money(col: str):  # 2-decimal money stored as double
    return F.col(col).cast("decimal(12,2)")


def _pct(col: str):  # discount/tax in [0,1), 2 decimals
    return F.col(col).cast("decimal(4,2)")


def _one_minus(col: str):
    return F.lit(1.00).cast("decimal(4,2)") - _pct(col)


def _one_plus(col: str):
    return F.lit(1.00).cast("decimal(4,2)") + _pct(col)


def _rev():  # l_extendedprice * (1 - l_discount), exact
    return _money("l_extendedprice") * _one_minus("l_discount")


Q1_CUTOFF = "2000-12-01 00:00:00"
Q3_DATE = "1998-01-01 00:00:00"
Q5_YEAR_START, Q5_YEAR_END = "1996-01-01 00:00:00", "1997-01-01 00:00:00"
Q6_START, Q6_END = "1996-01-01 00:00:00", "1997-01-01 00:00:00"


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    agg = (
        li.where(F.col("l_shipdate") <= F.to_timestamp(F.lit(Q1_CUTOFF)))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_money("l_quantity")).alias("_sum_qty"),
            F.sum(_money("l_extendedprice")).alias("_sum_base"),
            F.sum(_rev()).alias("_sum_disc"),
            F.sum(_rev() * _one_plus("l_tax")).alias("_sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        F.col("_sum_qty").cast("double").alias("sum_qty"),
        F.col("_sum_base").cast("double").alias("sum_base_price"),
        F.col("_sum_disc").cast("double").alias("sum_disc_price"),
        F.col("_sum_charge").cast("double").alias("sum_charge"),
        # exact centi-averages via integer floor division (double
        # round() flips at half-boundaries cross-engine)
        (F.col("_sum_qty") * 100)
        .cast("long")
        .alias("_qty_cents"),
        (F.col("_sum_base") * 100).cast("long").alias("_base_cents"),
        "count_order",
    ).selectExpr(
        "l_returnflag",
        "l_linestatus",
        "sum_qty",
        "sum_base_price",
        "sum_disc_price",
        "sum_charge",
        "_qty_cents div count_order AS avg_qty_centi",
        "_base_cents div count_order AS avg_price_centi",
        "count_order",
    )


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.to_timestamp(F.lit(Q3_DATE))
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.to_timestamp(F.lit(Q3_DATE))
    )
    joined = li.join(
        orders, F.col("l_orderkey") == F.col("o_orderkey")
    ).join(cust, F.col("o_custkey") == F.col("c_custkey"))
    agg = joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority").agg(
        F.sum(_rev()).alias("_revenue")
    )
    top = agg.orderBy(
        F.col("_revenue").desc(), F.col("o_orderdate").asc(), F.col("l_orderkey").asc()
    ).limit(10)
    return top.select(
        "l_orderkey",
        F.col("_revenue").cast("double").alias("revenue"),
        "o_orderdate",
        "o_orderpriority",
    )


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    returned = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        orders.join(
            returned, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi"
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit(Q5_YEAR_START)))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit(Q5_YEAR_END)))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    joined = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            cust,
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return (
        joined.groupBy("n_name")
        .agg(F.sum(_rev()).alias("_revenue"))
        .select("n_name", F.col("_revenue").cast("double").alias("revenue"))
    )


def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    filtered = li.where(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit(Q6_START)))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit(Q6_END)))
        & (F.col("l_discount") >= 0.02)
        & (F.col("l_discount") <= 0.06)
        & (F.col("l_quantity") < 24)
    )
    return filtered.agg(
        F.sum(_money("l_extendedprice") * _pct("l_discount"))
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation")
    joined = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    agg = joined.groupBy("c_custkey", "c_name", "n_name").agg(
        F.sum(_rev()).alias("_revenue")
    )
    top = agg.orderBy(F.col("_revenue").desc(), F.col("c_custkey").asc()).limit(20)
    return top.select(
        "c_custkey",
        "c_name",
        "n_name",
        F.col("_revenue").cast("double").alias("revenue"),
    )


def top_customers_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return (
        cust.withColumn("segment_rank", F.row_number().over(w).cast("long"))
        .where(F.col("segment_rank") <= 5)
        .select("c_mktsegment", "segment_rank", "c_custkey", "c_name", "c_acctbal")
    )


def monthly_revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = (
        orders.join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .withColumn("order_month", F.date_trunc("month", F.col("o_orderdate")))
    )
    agg = joined.rollup("r_name", "order_month").agg(
        F.sum(_money("o_totalprice")).alias("_revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    return agg.select(
        F.coalesce(F.col("r_name"), F.lit("ALL")).alias("region_name"),
        F.coalesce(
            F.col("order_month"), F.to_timestamp(F.lit("1900-01-01 00:00:00"))
        ).alias("order_month"),
        F.col("_revenue").cast("double").alias("revenue"),
        "n_orders",
    )


def promo_part_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    joined = li.join(part, F.col("l_partkey") == F.col("p_partkey"))
    monthly = joined.groupBy(
        F.date_trunc("month", F.col("l_shipdate")).alias("ship_month")
    ).agg(
        F.sum(
            F.when(F.col("p_type") == "PROMO", _rev()).otherwise(
                F.lit(0.00).cast("decimal(18,4)")
            )
        ).alias("_promo"),
        F.sum(_rev()).alias("_total"),
    )
    return monthly.select(
        "ship_month",
        F.col("_promo").cast("double").alias("promo_revenue"),
        F.col("_total").cast("double").alias("total_revenue"),
        # share in basis points via exact integer arithmetic on
        # ten-thousandths (the decimals have scale 4)
        (F.col("_promo") * 10000).cast("long").alias("_p"),
        (F.col("_total") * 10000).cast("long").alias("_t"),
    ).selectExpr(
        "ship_month",
        "promo_revenue",
        "total_revenue",
        "(10000 * _p) div _t AS promo_share_bp",
    )


# ---------------------------------------------------------------------------
# Extended TPC-H coverage (SURVEY §2 #42-51), adapted to the landed
# schema (no partsupp/shipmode/commit-receipt dates in the testdata).
# ---------------------------------------------------------------------------

Q15_START, Q15_END = "1996-01-01 00:00:00", "1996-04-01 00:00:00"
Q22_CUTOFF = "1999-01-01 00:00:00"


def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 volume shipping: revenue per (supplier nation -> customer
    nation) corridor within EUROPE, by ship year.  Both nation dims
    and region broadcast; the fact-fact join shuffles once on
    orderkey."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    eu_nation = nation.join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey", "n_name")
    n1 = eu_nation.select(
        F.col("n_nationkey").alias("_sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = eu_nation.select(
        F.col("n_nationkey").alias("_cn_key"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("_sn_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("_cn_key"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
    )
    return (
        joined.groupBy(
            "supp_nation",
            "cust_nation",
            F.date_trunc("year", F.col("l_shipdate")).alias("l_year"),
        )
        .agg(F.sum(_rev()).alias("_vol"))
        .select(
            "supp_nation",
            "cust_nation",
            "l_year",
            F.col("_vol").cast("double").alias("revenue"),
        )
    )


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 national market share: NATION_1 suppliers' share of
    STANDARD-part revenue sold to EUROPE customers, per order year.
    Share emitted in exact basis points (integer) — never
    round(double) cross-engine."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part").where(F.col("p_type") == "STANDARD")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    cust_nation = nation.join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select(F.col("n_nationkey").alias("_cn_key"))
    supp_nation = nation.select(
        F.col("n_nationkey").alias("_sn_key"), F.col("n_name").alias("supp_nation")
    )
    joined = (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cust_nation), F.col("c_nationkey") == F.col("_cn_key"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(supp_nation), F.col("s_nationkey") == F.col("_sn_key"))
    )
    yearly = joined.groupBy(
        F.date_trunc("year", F.col("o_orderdate")).alias("o_year")
    ).agg(
        F.sum(
            F.when(F.col("supp_nation") == "NATION_1", _rev()).otherwise(
                F.lit(0.00).cast("decimal(18,4)")
            )
        ).alias("_nat"),
        F.sum(_rev()).alias("_tot"),
    )
    return yearly.select(
        "o_year",
        F.col("_nat").cast("double").alias("nation_revenue"),
        F.col("_tot").cast("double").alias("total_revenue"),
        (F.col("_nat") * 10000).cast("long").alias("_n"),
        (F.col("_tot") * 10000).cast("long").alias("_t"),
    ).selectExpr(
        "o_year",
        "nation_revenue",
        "total_revenue",
        "(10000 * _n) div _t AS mkt_share_bp",
    )


def q12_late_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 analog (no shipmode/receiptdate in schema): lines shipped
    more than 90 days after their order date, split into
    high/low-priority counts per ship year."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    late = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).where(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        late.groupBy(F.date_trunc("year", F.col("l_shipdate")).alias("l_year"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
    )


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13: distribution of customers by order count (left join so
    zero-order customers land in bucket 0)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15: supplier(s) with max revenue in 1996Q1; the max is an
    exact DECIMAL so the equality join is cross-engine safe."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit(Q15_START)))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit(Q15_END)))
    )
    supp = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(F.sum(_rev()).alias("_rev"))
    top = rev.join(
        F.broadcast(rev.agg(F.max("_rev").alias("_max"))),
        F.col("_rev") == F.col("_max"),
    )
    return top.join(
        supp, F.col("l_suppkey") == F.col("s_suppkey")
    ).select(
        "s_suppkey", "s_name", F.col("_rev").cast("double").alias("total_revenue")
    )


def q16_part_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 analog (supplier links derived from lineitem, no
    partsupp): distinct supplier count per (brand, type, size) for
    selected sizes, excluding PROMO and Brand#1."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 14, 23, 45)
    )
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17: revenue of Brand#3 lines with quantity below 20% of the
    part's average quantity.  The threshold compare is
    cross-multiplied (5*qty*n < sum_qty) — exact integers/decimals,
    no division."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#3")
    joined = li.join(part, F.col("l_partkey") == F.col("p_partkey"))
    per_part = joined.groupBy(F.col("p_partkey").alias("_pk")).agg(
        F.sum(_money("l_quantity")).alias("_sum_qty"),
        F.count(F.lit(1)).alias("_n"),
    )
    # per_part is an aggregate over Brand#3 parts (~1/25 of the part
    # table) — it SCALES with SF, so no broadcast hint: both sides are
    # already hash-partitioned on partkey after the agg, the equi-join
    # reuses that exchange (AQE may still choose broadcast when small).
    small = joined.join(
        per_part, F.col("p_partkey") == F.col("_pk")
    ).where(
        _money("l_quantity") * 5 * F.col("_n") < F.col("_sum_qty")
    )
    return small.agg(
        F.sum(_money("l_extendedprice")).cast("double").alias("total_extendedprice"),
        F.count(F.lit(1)).alias("n_lines"),
    )


def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18: orders whose total quantity exceeds 150, with customer,
    top-100 by totalprice (ties broken by orderkey)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_money("l_quantity")).alias("_sum_qty"))
        .where(F.col("_sum_qty") > 150)
    )
    joined = orders.join(big, F.col("o_orderkey") == F.col("l_orderkey")).join(
        cust, F.col("o_custkey") == F.col("c_custkey")
    )
    return (
        joined.orderBy(
            F.col("o_totalprice").desc(),
            F.col("o_orderdate").asc(),
            F.col("o_orderkey").asc(),
        )
        .limit(100)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.col("_sum_qty").cast("double").alias("sum_qty"),
        )
    )


def q19_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19: revenue from three OR'd (brand, size-range, qty-range)
    brackets — a pushdown-friendly disjunctive filter join."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    joined = li.join(part, F.col("l_partkey") == F.col("p_partkey"))
    b1 = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    )
    b2 = (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    )
    b3 = (
        (F.col("p_brand") == "Brand#15")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    return joined.where(b1 | b2 | b3).agg(
        F.sum(_rev()).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22: above-average-balance customers with no orders since the
    cutoff, per nation.  The avg threshold is cross-multiplied
    (acctbal * n_pos > sum_pos) so the filter decision is exact on
    both engines."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.to_timestamp(F.lit(Q22_CUTOFF))
    )
    pos = cust.where(F.col("c_acctbal") > 0).agg(
        F.sum(_money("c_acctbal")).alias("_sum_pos"),
        F.count(F.lit(1)).alias("_n_pos"),
    )
    rich = cust.join(F.broadcast(pos)).where(
        _money("c_acctbal") * F.col("_n_pos") > F.col("_sum_pos")
    )
    dormant = rich.join(
        orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    )
    return dormant.groupBy(F.col("c_nationkey").cast("long").alias("nationkey")).agg(
        F.count(F.lit(1)).alias("numcust"),
        F.sum(_money("c_acctbal")).cast("double").alias("totacctbal"),
    )


# ---------------------------------------------------------------------------
# Q9 / Q11 on a DERIVED partsupp (testdata has no partsupp table; a
# deterministic hash-derived one runs identically in both engines, so
# the classic query shapes stay oracle-checkable)
# ---------------------------------------------------------------------------


def derived_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic partsupp: supplier s stocks part p iff
    (7*p_partkey + s_suppkey) % 250 == 0 (TPC-H-like ~4 suppliers
    per part with 1000 suppliers);
    ps_supplycost = ((p*31 + s*17) % 9000 + 1000) / 100  (10.00-99.99),
    ps_availqty  = (p*7 + s*13) % 1000 + 1.
    Pure integer arithmetic — bit-equal cross-engine."""
    part = load_table(spark, sf_dir, "part").select("p_partkey")
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", (F.col("s_suppkey") % 250).alias("_smod")
    )
    # (7p + s) % 250 == 0  <=>  s % 250 == (-7p) mod 250: an equi-join
    # on the residue (TPC-H-like ~4 suppliers per part with 1000
    # suppliers) instead of a |part|x|supplier| cross-join filter
    targets = part.select(
        "p_partkey",
        ((250 - (F.col("p_partkey") * 7) % 250) % 250).alias("_smod"),
    )
    joined = targets.join(supp, "_smod")
    return joined.select(
        F.col("p_partkey").alias("ps_partkey"),
        F.col("s_suppkey").alias("ps_suppkey"),
        (
            ((F.col("p_partkey") * 31 + F.col("s_suppkey") * 17) % 9000 + 1000)
            .cast("decimal(12,2)")
            / 100
        ).cast("decimal(12,2)").alias("ps_supplycost"),
        ((F.col("p_partkey") * 7 + F.col("s_suppkey") * 13) % 1000 + 1)
        .cast("long")
        .alias("ps_availqty"),
    )


PARTSUPP_SQL = """
    partsupp AS (
        SELECT p_partkey AS ps_partkey, s_suppkey AS ps_suppkey,
               CAST(CAST((p_partkey * 31 + s_suppkey * 17) % 9000 + 1000
                    AS DECIMAL(12,2)) / 100 AS DECIMAL(12,2)) AS ps_supplycost,
               CAST((p_partkey * 7 + s_suppkey * 13) % 1000 + 1 AS BIGINT)
                   AS ps_availqty
        FROM part CROSS JOIN supplier
        WHERE (7 * p_partkey + s_suppkey) % 250 = 0)
"""


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9: profit (revenue - supply cost) per supplier nation and
    order year, for STANDARD-type parts."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part").where(F.col("p_type") == "STANDARD")
    nation = load_table(spark, sf_dir, "nation")
    ps = derived_partsupp(spark, sf_dir)
    profit = _rev() - F.col("ps_supplycost") * _money("l_quantity")
    joined = (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(
            ps,
            (F.col("l_partkey") == F.col("ps_partkey"))
            & (F.col("l_suppkey") == F.col("ps_suppkey")),
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return (
        joined.groupBy(
            F.col("n_name").alias("nation"),
            F.date_trunc("year", F.col("o_orderdate")).alias("o_year"),
        )
        .agg(F.sum(profit).alias("_profit"), F.count(F.lit(1)).alias("n_lines"))
        .select(
            "nation",
            "o_year",
            F.col("_profit").cast("double").alias("sum_profit"),
            "n_lines",
        )
    )


def q11_inventory_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11: per-part inventory value (supplycost * availqty) for one
    nation's suppliers, keeping parts whose value exceeds 1/1000 of
    the nation total — the threshold compare is cross-multiplied
    decimals (exact)."""
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").where(
        F.col("n_name") == "NATION_1"
    )
    ps = derived_partsupp(spark, sf_dir)
    scoped = ps.join(
        F.broadcast(
            supp.join(
                F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
            ).select("s_suppkey")
        ),
        F.col("ps_suppkey") == F.col("s_suppkey"),
    )
    per_part = scoped.groupBy("ps_partkey").agg(
        F.sum(F.col("ps_supplycost") * F.col("ps_availqty")).alias("_val")
    )
    total = per_part.agg(F.sum("_val").alias("_total"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(F.col("_val") * 1000 > F.col("_total"))
        .select(
            "ps_partkey",
            F.col("_val").cast("double").alias("inventory_value"),
        )
    )


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2: for each size-15 STANDARD part, the EUROPE supplier(s)
    offering the minimum supply cost (exact decimal min equality),
    ranked by account balance, top-50."""
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    eu_supp = (
        supp.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    ps = derived_partsupp(spark, sf_dir)
    scoped = ps.join(
        part.select("p_partkey"),
        F.col("ps_partkey") == F.col("p_partkey"),
    ).join(eu_supp, F.col("ps_suppkey") == F.col("s_suppkey"))
    min_cost = scoped.groupBy(F.col("ps_partkey").alias("_pk")).agg(
        F.min("ps_supplycost").alias("_min_cost")
    )
    best = scoped.join(
        min_cost,
        (F.col("ps_partkey") == F.col("_pk"))
        & (F.col("ps_supplycost") == F.col("_min_cost")),
    )
    return (
        best.orderBy(
            F.col("s_acctbal").desc(),
            F.col("n_name").asc(),
            F.col("s_name").asc(),
            F.col("ps_partkey").asc(),
        )
        .limit(50)
        .select(
            "s_acctbal",
            "s_name",
            F.col("n_name").alias("nation"),
            F.col("ps_partkey").alias("p_partkey"),
            F.col("ps_supplycost").cast("double").alias("supplycost"),
        )
    )


def q20_excess_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20: suppliers whose available stock of some STANDARD part
    exceeds half that part's 1996 shipped quantity — the
    cross-multiplied (2*avail > sum_qty) form keeps it exact."""
    part = load_table(spark, sf_dir, "part").where(F.col("p_type") == "STANDARD")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01 00:00:00")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-01-01 00:00:00")))
    )
    supp = load_table(spark, sf_dir, "supplier")
    ps = derived_partsupp(spark, sf_dir)
    shipped = (
        li.join(part.select("p_partkey"),
                F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(_money("l_quantity")).alias("_qty"))
    )
    excess = ps.join(
        shipped,
        (F.col("ps_partkey") == F.col("l_partkey"))
        & (F.col("ps_suppkey") == F.col("l_suppkey")),
    ).where(
        F.col("ps_availqty").cast("decimal(12,2)") * 2 > F.col("_qty")
    )
    return (
        excess.select("ps_suppkey")
        .distinct()
        .join(supp, F.col("ps_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name")
    )
