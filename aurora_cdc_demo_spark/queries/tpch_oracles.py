"""DuckDB oracle SQL for the TPC-H-shaped analytics queries.

Mirrors the decimal-first determinism policy of queries/tpch.py:
money math in DECIMAL (exact on both engines), one final CAST to
DOUBLE, ties in top-N broken by unique keys.
"""

_REV = (
    "CAST(l_extendedprice AS DECIMAL(12,2)) * "
    "(CAST(1.00 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))"
)

TPCH_ORACLES: dict[str, str] = {
    "q1_pricing_summary": f"""
        WITH agg AS (
            SELECT l_returnflag, l_linestatus,
                SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sq,
                SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS sb,
                SUM({_REV}) AS sd,
                SUM({_REV} * (CAST(1.00 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS sc,
                COUNT(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
            GROUP BY l_returnflag, l_linestatus)
        SELECT l_returnflag, l_linestatus,
            CAST(sq AS DOUBLE) AS sum_qty,
            CAST(sb AS DOUBLE) AS sum_base_price,
            CAST(sd AS DOUBLE) AS sum_disc_price,
            CAST(sc AS DOUBLE) AS sum_charge,
            CAST(sq * 100 AS BIGINT) // count_order AS avg_qty_centi,
            CAST(sb * 100 AS BIGINT) // count_order AS avg_price_centi,
            count_order
        FROM agg
    """,
    "q3_shipping_priority": f"""
        WITH agg AS (
            SELECT l_orderkey, o_orderdate, o_orderpriority, SUM({_REV}) AS rev
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
              AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
            GROUP BY 1, 2, 3)
        SELECT l_orderkey, CAST(rev AS DOUBLE) AS revenue, o_orderdate, o_orderpriority
        FROM agg ORDER BY rev DESC, o_orderdate ASC, l_orderkey ASC LIMIT 10
    """,
    "q4_order_priority": """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        GROUP BY o_orderpriority
    """,
    "q5_local_supplier": f"""
        SELECT n_name, CAST(SUM({_REV}) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY n_name
    """,
    "q6_revenue_forecast": """
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                        * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
               COUNT(*) AS n_lines
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount >= 0.02 AND l_discount <= 0.06
          AND l_quantity < 24
    """,
    "q10_returned_items": f"""
        WITH agg AS (
            SELECT c_custkey, c_name, n_name, SUM({_REV}) AS rev
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            WHERE l_returnflag = 'R'
            GROUP BY 1, 2, 3)
        SELECT c_custkey, c_name, n_name, CAST(rev AS DOUBLE) AS revenue
        FROM agg ORDER BY rev DESC, c_custkey ASC LIMIT 20
    """,
    "top_customers_per_segment": """
        WITH ranked AS (
            SELECT c_mktsegment,
                   row_number() OVER (PARTITION BY c_mktsegment
                                      ORDER BY c_acctbal DESC, c_custkey ASC)
                       AS segment_rank,
                   c_custkey, c_name, c_acctbal
            FROM customer)
        SELECT c_mktsegment, CAST(segment_rank AS BIGINT) AS segment_rank,
               c_custkey, c_name, c_acctbal
        FROM ranked WHERE segment_rank <= 5
    """,
    "monthly_revenue_rollup": """
        WITH joined AS (
            SELECT r_name,
                   date_trunc('month', o_orderdate) AS order_month,
                   CAST(o_totalprice AS DECIMAL(12,2)) AS tp
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey)
        SELECT COALESCE(r_name, 'ALL') AS region_name,
               COALESCE(order_month, TIMESTAMP '1900-01-01 00:00:00') AS order_month,
               CAST(SUM(tp) AS DOUBLE) AS revenue,
               COUNT(*) AS n_orders
        FROM joined GROUP BY ROLLUP(r_name, order_month)
    """,
    "promo_part_share": f"""
        WITH j AS (
            SELECT date_trunc('month', l_shipdate) AS ship_month,
                   {_REV} AS rev, p_type
            FROM lineitem JOIN part ON l_partkey = p_partkey)
        , m AS (
            SELECT ship_month,
                   SUM(CASE WHEN p_type = 'PROMO' THEN rev
                            ELSE CAST(0.00 AS DECIMAL(18,4)) END) AS promo,
                   SUM(rev) AS total
            FROM j GROUP BY 1)
        SELECT ship_month,
               CAST(promo AS DOUBLE) AS promo_revenue,
               CAST(total AS DOUBLE) AS total_revenue,
               (10000 * CAST(promo * 10000 AS BIGINT))
                   // CAST(total * 10000 AS BIGINT) AS promo_share_bp
        FROM m
    """,
    "q7_nation_volume": f"""
        WITH eu AS (
            SELECT n_nationkey, n_name FROM nation
            JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'EUROPE')
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               date_trunc('year', l_shipdate) AS l_year,
               CAST(SUM({_REV}) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey
        JOIN eu n1 ON s_nationkey = n1.n_nationkey
        JOIN eu n2 ON c_nationkey = n2.n_nationkey
        WHERE n1.n_name <> n2.n_name
        GROUP BY 1, 2, 3
    """,
    "q8_market_share": f"""
        WITH eu AS (
            SELECT n_nationkey FROM nation
            JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'EUROPE')
        , yearly AS (
            SELECT date_trunc('year', o_orderdate) AS o_year,
                   SUM(CASE WHEN sn.n_name = 'NATION_1' THEN {_REV}
                            ELSE CAST(0.00 AS DECIMAL(18,4)) END) AS nat,
                   SUM({_REV}) AS tot
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN eu ON c_nationkey = eu.n_nationkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation sn ON s_nationkey = sn.n_nationkey
            WHERE p_type = 'STANDARD'
            GROUP BY 1)
        SELECT o_year,
               CAST(nat AS DOUBLE) AS nation_revenue,
               CAST(tot AS DOUBLE) AS total_revenue,
               (10000 * CAST(nat * 10000 AS BIGINT))
                   // CAST(tot * 10000 AS BIGINT) AS mkt_share_bp
        FROM yearly
    """,
    "q12_late_lines": """
        SELECT date_trunc('year', l_shipdate) AS l_year,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
        GROUP BY 1
    """,
    "q13_customer_distribution": """
        WITH per_cust AS (
            SELECT c_custkey, COUNT(o_orderkey) AS c_count
            FROM customer LEFT JOIN orders ON c_custkey = o_custkey
            GROUP BY c_custkey)
        SELECT c_count, COUNT(*) AS custdist FROM per_cust GROUP BY c_count
    """,
    "q15_top_supplier": f"""
        WITH rev AS (
            SELECT l_suppkey, SUM({_REV}) AS r
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
            GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, CAST(r AS DOUBLE) AS total_revenue
        FROM rev JOIN supplier ON l_suppkey = s_suppkey
        WHERE r = (SELECT MAX(r) FROM rev)
    """,
    "q16_part_supplier_variety": """
        SELECT p_brand, p_type, p_size,
               CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
          AND p_size IN (1, 14, 23, 45)
        GROUP BY 1, 2, 3
    """,
    "q17_small_qty_revenue": """
        WITH j AS (
            SELECT p_partkey, CAST(l_quantity AS DECIMAL(12,2)) AS qty,
                   CAST(l_extendedprice AS DECIMAL(12,2)) AS price
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_brand = 'Brand#3')
        , per_part AS (
            SELECT p_partkey AS pk, SUM(qty) AS sum_qty, COUNT(*) AS n
            FROM j GROUP BY 1)
        SELECT CAST(SUM(price) AS DOUBLE) AS total_extendedprice,
               COUNT(*) AS n_lines
        FROM j JOIN per_part ON p_partkey = pk
        WHERE qty * 5 * n < sum_qty
    """,
    "q18_large_volume_customers": """
        WITH big AS (
            SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sum_qty
            FROM lineitem GROUP BY 1
            HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 150)
        SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
               CAST(sum_qty AS DOUBLE) AS sum_qty
        FROM orders
        JOIN big ON o_orderkey = l_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY o_totalprice DESC, o_orderdate ASC, o_orderkey ASC
        LIMIT 100
    """,
    "q19_bracket_revenue": f"""
        SELECT CAST(SUM({_REV}) AS DOUBLE) AS revenue, COUNT(*) AS n_lines
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 10
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 20 AND 30)
    """,
    "q22_dormant_customers": """
        WITH pos AS (
            SELECT SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS sum_pos,
                   COUNT(*) AS n_pos
            FROM customer WHERE c_acctbal > 0)
        SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
               COUNT(*) AS numcust,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
        FROM customer, pos
        WHERE CAST(c_acctbal AS DECIMAL(12,2)) * n_pos > sum_pos
          AND c_custkey NOT IN (
              SELECT o_custkey FROM orders
              WHERE o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
        GROUP BY 1
    """,
    "asof_order_event": """
        WITH ev AS (
            SELECT user_id AS key_id, event_id AS seq, ts, value, event_type
            FROM events)
        , purchases AS (
            SELECT key_id, seq AS purchase_seq, ts AS purchase_ts
            FROM ev WHERE event_type = 'purchase')
        , clicks AS (
            SELECT key_id, seq, ts, value FROM ev WHERE event_type = 'click')
        SELECT p.key_id, p.purchase_seq, p.purchase_ts,
               c.ts AS asof_ts, c.seq AS asof_seq, c.value AS asof_value
        FROM purchases p
        ASOF LEFT JOIN clicks c
          ON p.key_id = c.key_id AND c.ts <= p.purchase_ts
    """,
}

from .tpch import PARTSUPP_SQL as _PS  # noqa: E402

TPCH_ORACLES["q9_product_profit"] = f"""
    WITH {_PS}
    SELECT n_name AS nation,
           date_trunc('year', o_orderdate) AS o_year,
           CAST(SUM({_REV} - ps_supplycost
                    * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
               AS sum_profit,
           COUNT(*) AS n_lines
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN partsupp ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
    JOIN orders ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE p_type = 'STANDARD'
    GROUP BY 1, 2
"""

TPCH_ORACLES["q11_inventory_value"] = f"""
    WITH {_PS}
    , scoped AS (
        SELECT ps_partkey, ps_supplycost, ps_availqty
        FROM partsupp
        JOIN supplier ON ps_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_1')
    , per_part AS (
        SELECT ps_partkey, SUM(ps_supplycost * ps_availqty) AS val
        FROM scoped GROUP BY 1)
    , tot AS (SELECT SUM(val) AS total FROM per_part)
    SELECT ps_partkey, CAST(val AS DOUBLE) AS inventory_value
    FROM per_part, tot WHERE val * 1000 > total
"""

TPCH_ORACLES["q2_min_cost_supplier"] = f"""
    WITH {_PS}
    , eu_supp AS (
        SELECT s_suppkey, s_name, s_acctbal, n_name
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE')
    , scoped AS (
        SELECT ps_partkey, ps_supplycost, s_suppkey, s_name, s_acctbal, n_name
        FROM partsupp
        JOIN part ON ps_partkey = p_partkey
        JOIN eu_supp ON ps_suppkey = s_suppkey
        WHERE p_size = 15 AND p_type = 'STANDARD')
    , mc AS (
        SELECT ps_partkey AS pk, MIN(ps_supplycost) AS min_cost
        FROM scoped GROUP BY 1)
    SELECT s_acctbal, s_name, n_name AS nation, ps_partkey AS p_partkey,
           CAST(ps_supplycost AS DOUBLE) AS supplycost
    FROM scoped JOIN mc ON ps_partkey = pk AND ps_supplycost = min_cost
    ORDER BY s_acctbal DESC, n_name ASC, s_name ASC, ps_partkey ASC
    LIMIT 50
"""

TPCH_ORACLES["q20_excess_stock_suppliers"] = f"""
    WITH {_PS}
    , shipped AS (
        SELECT l_partkey, l_suppkey,
               SUM(CAST(l_quantity AS DECIMAL(12,2))) AS qty
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE p_type = 'STANDARD'
          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY 1, 2)
    SELECT DISTINCT s_suppkey, s_name
    FROM partsupp
    JOIN shipped ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
    JOIN supplier ON ps_suppkey = s_suppkey
    WHERE CAST(ps_availqty AS DECIMAL(12,2)) * 2 > qty
"""
