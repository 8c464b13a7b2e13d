"""Relational core (SURVEY.md §7.2 step 3): scans, projections,
filters, equi/semi/anti joins, hash aggregations, distinct, sort/limit,
set operations — TPC-H-shaped queries over the driver tables, each with
a DuckDB oracle.

All are pure DataFrame compositions: Catalyst gets full freedom for
pushdown/pruning/join-reordering, AQE picks broadcast vs sort-merge at
runtime. The dimension chains (region→nation→customer/supplier) are
broadcast-sized at any scale factor; the fact-fact joins
(orders⋈lineitem) hash-partition on the join key.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ml_data_wrangler_spark.plans._util import (
    SQL_DISC_PRICE,
    charge,
    dbl,
    disc_price,
    money,
    rate,
    t,
)
from ml_data_wrangler_spark.plans.registry import query


@query(
    "q01_pricing_summary",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) AS sum_disc_price,
       CAST(SUM({SQL_DISC_PRICE} * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-02'
GROUP BY l_returnflag, l_linestatus
""",
)
def q01(spark, sf_dir):
    """TPC-H Q1 analog: full-scan groupBy with 8 aggregates — the
    map-side-combine workhorse. One shuffle of 6 tiny groups."""
    li = t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") <= F.lit("2001-09-02"))
    n = F.count("*")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dbl(F.sum(money("l_quantity"))).alias("sum_qty"),
        dbl(F.sum(money("l_extendedprice"))).alias("sum_base_price"),
        dbl(F.sum(disc_price())).alias("sum_disc_price"),
        dbl(F.sum(charge())).alias("sum_charge"),
        (dbl(F.sum(money("l_quantity"))) / n).alias("avg_qty"),
        (dbl(F.sum(money("l_extendedprice"))) / n).alias("avg_price"),
        (dbl(F.sum(rate("l_discount"))) / n).alias("avg_disc"),
        n.alias("count_order"),
    )


@query(
    "q02_revenue_by_month",
    oracle=f"""
SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
       CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) AS revenue,
       CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_orders
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY 1
""",
)
def q02(spark, sf_dir):
    """orders⋈lineitem revenue by month — written in the pre-aggregated
    shape: lineitem collapses to order grain FIRST (map-side combine
    shrinks the fact 4× before anything moves), the join then carries
    one row per order, and COUNT DISTINCT degenerates to COUNT(*).
    At 100 TB this replaces a wide fact-fact shuffle + distinct-expand
    with one keyed partial agg; decimal sums make the two-step sum
    exactly associative, so results are bit-identical to the oracle's
    single-pass form."""
    o = t(spark, sf_dir, "orders")
    per_order = (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum(disc_price()).alias("order_rev"))
    )
    return (
        o.join(per_order, o.o_orderkey == per_order.l_orderkey)
        .groupBy(F.date_trunc("month", "o_orderdate").alias("order_month"))
        .agg(
            dbl(F.sum("order_rev")).alias("revenue"),
            F.count("*").alias("n_orders"),
        )
    )


@query(
    "q03_shipping_priority",
    oracle=f"""
SELECT o_orderkey, CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) AS revenue,
       o_orderdate, o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON o_orderkey = l_orderkey
WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1999-01-01'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT 10
""",
)
def q03(spark, sf_dir):
    """TPC-H Q3 analog: selective dim filter → 3-way join → top-10 by
    aggregate. The filtered customer side is broadcast-sized; total
    order (revenue DESC, o_orderkey) makes LIMIT deterministic."""
    c = t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders").where(F.col("o_orderdate") < F.lit("1999-01-01"))
    li = t(spark, sf_dir, "lineitem")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dbl(F.sum(disc_price())).alias("revenue"))
        .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


@query(
    "q04_order_priority_count",
    oracle="""
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
""",
)
def q04(spark, sf_dir):
    """TPC-H Q4 analog: EXISTS as a left-semi join (no duplication of
    the probe side, no distinct needed)."""
    o = t(spark, sf_dir, "orders").where(F.col("o_orderdate") >= F.lit("1996-01-01"))
    li = t(spark, sf_dir, "lineitem")
    semi = o.join(
        li,
        (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return semi.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


@query(
    "q05_region_revenue",
    oracle=f"""
SELECT n_name, CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) AS revenue
FROM region JOIN nation ON r_regionkey = n_regionkey
            JOIN customer ON c_nationkey = n_nationkey
            JOIN orders ON o_custkey = c_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
WHERE r_name = 'ASIA'
GROUP BY n_name
""",
)
def q05(spark, sf_dir):
    """TPC-H Q5 analog: 6-way join with a local-supplier constraint.
    region/nation/supplier are broadcast dims; the only big shuffle is
    orders⋈lineitem."""
    r = t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n = t(spark, sf_dir, "nation")
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    return (
        F.broadcast(r.join(n, r.r_regionkey == n.n_regionkey))
        .join(c, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(o, F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .groupBy("n_name")
        .agg(dbl(F.sum(disc_price())).alias("revenue"))
    )


@query(
    "q06_forecast_revenue",
    oracle="""
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
""",
)
def q06(spark, sf_dir):
    """TPC-H Q6 analog: pure scan+filter+scalar agg — every predicate
    pushes to the parquet reader (verify PushedFilters in explain)."""
    li = t(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    ).agg(
        dbl(F.sum(money("l_extendedprice") * rate("l_discount"))).alias("revenue"),
        F.count("*").alias("n_lines"),
    )


@query(
    "q07_nation_balance",
    oracle="""
SELECT n_name, r_name,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_balance,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_balance
FROM customer JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
GROUP BY n_name, r_name
""",
)
def q07(spark, sf_dir):
    """Snowflake dim join (customer→nation→region) + per-nation
    balance aggregates; both dims broadcast."""
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name", "r_name")
        .agg(
            F.count("*").alias("n_customers"),
            dbl(F.sum(money("c_acctbal"))).alias("total_balance"),
            (dbl(F.sum(money("c_acctbal"))) / F.count("*")).alias("avg_balance"),
        )
    )


@query(
    "q08_market_share",
    oracle=f"""
WITH volumes AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         {SQL_DISC_PRICE} AS volume,
         s_nationkey
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                JOIN supplier ON l_suppkey = s_suppkey
                JOIN customer ON o_custkey = c_custkey
                JOIN nation cn ON c_nationkey = cn.n_nationkey
                JOIN region ON cn.n_regionkey = r_regionkey
  WHERE r_name = 'AMERICA'
)
SELECT o_year,
       CAST(SUM(CASE WHEN s_nationkey = 1 THEN volume ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
         / CAST(SUM(volume) AS DOUBLE) AS mkt_share
FROM volumes GROUP BY o_year
""",
)
def q08(spark, sf_dir):
    """TPC-H Q8 analog: nation-1 suppliers' share of AMERICA-customer
    revenue per year — conditional aggregation over a 6-way join."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    s = t(spark, sf_dir, "supplier")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    vol = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            disc_price().alias("volume"),
            "s_nationkey",
        )
    )
    zero = F.lit(0).cast("decimal(12,2)")
    return vol.groupBy("o_year").agg(
        (
            dbl(F.sum(F.when(F.col("s_nationkey") == 1, F.col("volume")).otherwise(zero)))
            / dbl(F.sum("volume"))
        ).alias("mkt_share")
    )


@query(
    "q09_profit_by_nation_year",
    oracle=f"""
SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM({SQL_DISC_PRICE}
                - CAST(p_retailprice AS DECIMAL(12,2)) * CAST(0.6 AS DECIMAL(4,2))
                  * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS profit
FROM lineitem JOIN part ON l_partkey = p_partkey
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN orders ON l_orderkey = o_orderkey
              JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name, o_year
""",
)
def q09(spark, sf_dir):
    """TPC-H Q9 analog (supply cost modeled as 60% of retail price —
    the schema has no partsupp): profit by supplier nation and year."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    s = t(spark, sf_dir, "supplier")
    o = t(spark, sf_dir, "orders")
    n = t(spark, sf_dir, "nation")
    cost = money("p_retailprice") * rate(F.lit(0.6)) * money("l_quantity")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy("n_name", F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(dbl(F.sum(disc_price() - cost)).alias("profit"))
    )


@query(
    "q10_returned_items",
    oracle=f"""
SELECT c_custkey, c_name, CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) AS revenue,
       n_name
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON o_orderkey = l_orderkey
              JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def q10(spark, sf_dir):
    """TPC-H Q10 analog: revenue lost to returns, top-20 customers."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = t(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dbl(F.sum(disc_price())).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "q13_customer_order_histogram",
    oracle="""
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
  GROUP BY c_custkey
)
GROUP BY c_count
""",
)
def q13(spark, sf_dir):
    """TPC-H Q13 analog: left-outer join with an extra join predicate +
    two-level aggregation (count-of-counts histogram)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").where(F.col("o_orderpriority") != "5-LOW")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@query(
    "q14_promo_revenue",
    oracle=f"""
SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {SQL_DISC_PRICE}
                     ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) * 100
         / CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
""",
)
def q14(spark, sf_dir):
    """TPC-H Q14 analog: promo revenue share — conditional agg over a
    broadcast join with part."""
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    p = t(spark, sf_dir, "part")
    zero = F.lit(0).cast("decimal(12,2)")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            (
                dbl(F.sum(F.when(F.col("p_type") == "PROMO", disc_price()).otherwise(zero)))
                * 100
                / dbl(F.sum(disc_price()))
            ).alias("promo_revenue_pct")
        )
    )


@query(
    "q15_top_supplier",
    oracle=f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no, CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
""",
)
def q15(spark, sf_dir):
    """TPC-H Q15 analog: aggregate view + scalar-subquery max filter.
    Exact decimal revenue makes the MAX tie-free across engines."""
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-04-01"))
    )
    s = t(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dbl(F.sum(disc_price())).alias("total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("m"))
    return (
        s.join(revenue, s.s_suppkey == revenue.supplier_no)
        .join(F.broadcast(max_rev), F.col("total_revenue") == F.col("m"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "q16_supplier_part_counts",
    oracle="""
SELECT p_brand, p_type, p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_size IN (10, 20, 30, 40)
GROUP BY p_brand, p_type, p_size
""",
)
def q16(spark, sf_dir):
    """TPC-H Q16 analog (via lineitem, schema has no partsupp):
    distinct-count aggregation with dim predicates."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1") & (F.col("p_size").isin(10, 20, 30, 40))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
WITH part_avg AS (
  SELECT l_partkey AS pk, 0.5 * (CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)) AS half_avg
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
              JOIN part_avg ON l_partkey = pk
WHERE p_brand = 'Brand#3' AND l_quantity < half_avg
""",
)
def q17(spark, sf_dir):
    """TPC-H Q17 analog: correlated scalar subquery decorrelated into a
    per-part aggregate join (the scalable plan — Spark would also
    decorrelate the subquery form)."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#3")
    part_avg = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (0.5 * (dbl(F.sum(money("l_quantity"))) / F.count("*"))).alias("half_avg")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(part_avg, li.l_partkey == part_avg.pk)
        .where(F.col("l_quantity") < F.col("half_avg"))
        .agg(
            (dbl(F.sum(money("l_extendedprice"))) / 7.0).alias("avg_yearly"),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "q18_large_orders",
    oracle="""
SELECT c_custkey, o_orderkey, o_orderdate,
       CAST(o_totalprice AS DOUBLE) AS o_totalprice,
       CAST(sum_qty AS DOUBLE) AS sum_qty
FROM orders
JOIN (SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sum_qty
      FROM lineitem GROUP BY l_orderkey HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 150
     ) big ON o_orderkey = big.l_orderkey
JOIN customer ON c_custkey = o_custkey
""",
)
def q18(spark, sf_dir):
    """TPC-H Q18 analog: HAVING on a grouped sum feeding a join."""
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    c = t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(money("l_quantity")).alias("sum_qty"))
        .where(F.col("sum_qty") > 150)
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            dbl(F.col("sum_qty")).alias("sum_qty"),
        )
    )


@query(
    "q19_bracketed_revenue",
    oracle=f"""
SELECT CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 21)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 40)
""",
)
def q19(spark, sf_dir):
    """TPC-H Q19 analog: disjunctive multi-bracket predicate across the
    join — Catalyst pushes the common parts below the join."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
    bracket = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 21)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return j.where(bracket).agg(
        dbl(F.sum(disc_price())).alias("revenue"), F.count("*").alias("n_lines")
    )


@query(
    "q22_idle_customers",
    oracle="""
SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
                   FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_nationkey
""",
)
def q22(spark, sf_dir):
    """TPC-H Q22 analog: scalar-aggregate threshold (broadcast) +
    NOT EXISTS as a left-anti join."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    avg_bal = c.where(F.col("c_acctbal") > 0.0).agg(
        (dbl(F.sum(money("c_acctbal"))) / F.count("*")).alias("threshold")
    )
    rich = c.join(F.broadcast(avg_bal), F.col("c_acctbal") > F.col("threshold"))
    idle = rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
    return idle.groupBy("c_nationkey").agg(
        F.count("*").alias("numcust"),
        dbl(F.sum(money("c_acctbal"))).alias("totacctbal"),
    )


@query(
    "q23_filter_project_pushdown",
    oracle="""
SELECT l_orderkey, l_linenumber, CAST(l_extendedprice AS DOUBLE) AS l_extendedprice
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1999-06-01' AND l_shipdate < TIMESTAMP '1999-06-08'
  AND l_discount > 0.08
""",
)
def q23(spark, sf_dir):
    """Bare scan+filter+project: the predicate and the 3-column
    projection both reach the parquet reader (PushedFilters/ReadSchema)."""
    return (
        t(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= F.lit("1999-06-01"))
            & (F.col("l_shipdate") < F.lit("1999-06-08"))
            & (F.col("l_discount") > 0.08)
        )
        .select("l_orderkey", "l_linenumber", F.col("l_extendedprice").cast("double").alias("l_extendedprice"))
    )


@query(
    "q24_top_orders_global",
    oracle="""
SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice, o_orderdate
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 15
""",
)
def q24(spark, sf_dir):
    """Global top-k: Spark plans TakeOrderedAndProject — per-partition
    heap + single tiny merge, never a full sort at scale."""
    return (
        t(spark, sf_dir, "orders")
        .select("o_orderkey", F.col("o_totalprice").cast("double").alias("o_totalprice"), "o_orderdate")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(15)
    )


@query(
    "q25_distinct_flags",
    oracle="""
SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
""",
)
def q25(spark, sf_dir):
    """DISTINCT = groupBy-all-columns; partial aggregation map-side."""
    return t(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@query(
    "q26_nations_union",
    oracle="""
SELECT n_nationkey AS nationkey FROM customer JOIN nation ON c_nationkey = n_nationkey
UNION
SELECT n_nationkey AS nationkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
""",
)
def q26(spark, sf_dir):
    """Set op: UNION (distinct) of two key sets."""
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    a = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).select(
        F.col("n_nationkey").alias("nationkey")
    )
    b = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        F.col("n_nationkey").alias("nationkey")
    )
    return a.union(b).distinct()


@query(
    "q27_nations_intersect",
    oracle="""
SELECT DISTINCT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT DISTINCT s_nationkey AS nationkey FROM supplier
""",
)
def q27(spark, sf_dir):
    """Set op: INTERSECT."""
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@query(
    "q28_nations_except",
    oracle="""
SELECT DISTINCT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT DISTINCT s_nationkey AS nationkey FROM supplier
""",
)
def q28(spark, sf_dir):
    """Set op: EXCEPT (nations with customers but no suppliers).
    subtract = EXCEPT DISTINCT; exceptAll would be multiset semantics
    (one removal per right-side occurrence — not what EXCEPT means)."""
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)


@query(
    "q29_nested_collect",
    oracle="""
SELECT o_orderkey,
       CAST(COUNT(l_orderkey) AS BIGINT) AS n_lines,
       COALESCE(string_agg(CAST(l_linenumber AS VARCHAR), ',' ORDER BY l_linenumber), '')
         AS line_list
FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderkey
""",
)
def q29(spark, sf_dir):
    """The J1 comment-binding SHAPE (SURVEY.md §2.3) on driver tables:
    left-outer join + group-into-sorted-list — rendered as a sorted
    string so the oracle can hash it. This is the oracle-checked dual
    of operators/wrangle.bind_comments."""
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left")
        .groupBy("o_orderkey")
        .agg(
            F.count("l_orderkey").alias("n_lines"),
            F.coalesce(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list("l_linenumber")),
                        lambda x: x.cast("string"),
                    ),
                    ",",
                ),
                F.lit(""),
            ).alias("line_list"),
        )
    )


@query(
    "q30_status_intersect_all",
    oracle="""
SELECT o_orderstatus AS status FROM orders WHERE o_totalprice > 100000
INTERSECT ALL
SELECT o_orderstatus AS status FROM orders WHERE o_orderpriority = '1-URGENT'
""",
)
def q30(spark, sf_dir):
    """Set op: INTERSECT ALL (multiset semantics — keeps min of the
    per-side multiplicities, unlike q27's set INTERSECT)."""
    o = t(spark, sf_dir, "orders")
    a = o.where(F.col("o_totalprice") > 100000).select(F.col("o_orderstatus").alias("status"))
    b = o.where(F.col("o_orderpriority") == "1-URGENT").select(F.col("o_orderstatus").alias("status"))
    return a.intersectAll(b)


@query(
    "q31_status_except_all",
    oracle="""
SELECT o_orderstatus AS status FROM orders WHERE o_totalprice > 100000
EXCEPT ALL
SELECT o_orderstatus AS status FROM orders WHERE o_orderpriority = '1-URGENT'
""",
)
def q31(spark, sf_dir):
    """Set op: EXCEPT ALL (multiset difference — the semantics q28
    deliberately does NOT use)."""
    o = t(spark, sf_dir, "orders")
    a = o.where(F.col("o_totalprice") > 100000).select(F.col("o_orderstatus").alias("status"))
    b = o.where(F.col("o_orderpriority") == "1-URGENT").select(F.col("o_orderstatus").alias("status"))
    return a.exceptAll(b)


@query(
    "q32_orders_above_customer_avg",
    oracle="""
SELECT o.o_orderkey, o.o_custkey,
       CAST(o.o_totalprice AS DOUBLE) AS o_totalprice
FROM orders o
WHERE o.o_totalprice >
      (SELECT 1.5 * (CAST(SUM(CAST(i.o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
                     / COUNT(*))
       FROM orders i WHERE i.o_custkey = o.o_custkey)
ORDER BY o.o_orderkey
""",
)
def q32(spark, sf_dir):
    """Correlated scalar subquery (each order vs 1.5× its customer's
    average) — expressed through spark.sql so Catalyst's subquery
    decorrelation rewrites it into the aggregate+join the DataFrame
    API would hand-build.

    Float discipline: the per-customer average is an exact DECIMAL sum
    divided by the count (q17/q22 pattern), not AVG(double) — a raw
    double AVG's summation order can differ by an ulp between engines
    and flip a knife-edge '>' row."""
    o = t(spark, sf_dir, "orders")
    o.createOrReplaceTempView("_q32_orders")
    return spark.sql(
        """
        SELECT o.o_orderkey, o.o_custkey,
               CAST(o.o_totalprice AS DOUBLE) AS o_totalprice
        FROM _q32_orders o
        WHERE o.o_totalprice >
              (SELECT 1.5 * (CAST(SUM(CAST(i.o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
                             / COUNT(*))
               FROM _q32_orders i
               WHERE i.o_custkey = o.o_custkey)
        ORDER BY o.o_orderkey
        """
    )


@query(
    "q11_important_parts",
    oracle=f"""
WITH pv AS (
  SELECT l_partkey, SUM({SQL_DISC_PRICE}) AS val
  FROM lineitem GROUP BY l_partkey
), tot AS (
  SELECT SUM({SQL_DISC_PRICE}) AS tot FROM lineitem
)
SELECT l_partkey, CAST(val AS DOUBLE) AS part_value
FROM pv, tot
WHERE val * 2000 > tot
""",
)
def q11(spark, sf_dir):
    """TPC-H q11 shape (no partsupp table in this star schema, so the
    'important stock' computation runs over lineitem revenue): per-part
    revenue vs a GLOBAL scalar aggregate — group-agg + broadcast
    one-row cross join + fraction HAVING.

    Float discipline: the threshold comparison is `val * 2000 > tot`
    entirely in DECIMAL (both sums exact), never `val > tot * 0.0005`
    through a double — so the cut is bit-identical on both engines.
    """
    li = t(spark, sf_dir, "lineitem")
    pv = li.groupBy("l_partkey").agg(F.sum(disc_price()).alias("val"))
    tot = li.agg(F.sum(disc_price()).alias("tot"))
    return (
        pv.crossJoin(F.broadcast(tot))
        .where(F.col("val") * 2000 > F.col("tot"))
        .select("l_partkey", dbl(F.col("val")).alias("part_value"))
    )


@query(
    "q12_late_shipment_priority",
    oracle="""
SELECT l.l_linestatus,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
GROUP BY l.l_linestatus
""",
)
def q12(spark, sf_dir):
    """TPC-H q12 shape (schema has no l_shipmode/commitdate, so 'late'
    is shipdate > orderdate + 90 days and the grouping key is
    l_linestatus): fact-fact join + conditional counts by priority
    class."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q20_promotion_suppliers",
    oracle="""
WITH red AS (
  SELECT p_partkey FROM part WHERE p_name LIKE '%red%'
), heavy AS (
  SELECT l_suppkey
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM red)
  GROUP BY l_suppkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 1900
)
SELECT s.s_name, CAST(s.s_acctbal AS DOUBLE) AS s_acctbal
FROM supplier s
WHERE s.s_suppkey IN (SELECT l_suppkey FROM heavy)
""",
)
def q20(spark, sf_dir):
    """TPC-H q20 shape (semi-join chain): suppliers who moved more
    than a threshold quantity of 'red' parts — part-name filter →
    broadcast semi-join into lineitem → decimal-exact HAVING →
    left-semi join back to supplier. Every membership test is a
    semi-join, never a distinct+inner-join."""
    part = t(spark, sf_dir, "part")
    li = t(spark, sf_dir, "lineitem")
    sup = t(spark, sf_dir, "supplier")
    red = part.where(F.col("p_name").like("%red%")).select("p_partkey")
    heavy = (
        li.join(
            F.broadcast(red), li.l_partkey == red.p_partkey, "left_semi"
        )
        .groupBy("l_suppkey")
        .agg(F.sum(money("l_quantity")).alias("qty"))
        .where(F.col("qty") > 1900)
        .select("l_suppkey")
    )
    return sup.join(
        F.broadcast(heavy), sup.s_suppkey == heavy.l_suppkey, "left_semi"
    ).select("s_name", dbl(F.col("s_acctbal")).alias("s_acctbal"))


@query(
    "q21_waiting_suppliers",
    oracle="""
WITH late AS (
  SELECT l.l_orderkey, l.l_suppkey
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderstatus = 'F'
    AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
)
SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM late l1
JOIN supplier s ON s.s_suppkey = l1.l_suppkey
WHERE EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM late l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey)
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 20
""",
)
def q21(spark, sf_dir):
    """TPC-H q21 shape (EXISTS + NOT EXISTS correlated subqueries):
    suppliers who were the ONLY late shipper on a finished multi-
    supplier order ('late' adapted to shipdate > orderdate + 90 days —
    the schema has no commit/receipt dates). Expressed through
    spark.sql so Catalyst rewrites the correlated EXISTS pair into
    left-semi and left-anti joins; LIMIT is total-ordered."""
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("_q21_lineitem")
    t(spark, sf_dir, "orders").createOrReplaceTempView("_q21_orders")
    t(spark, sf_dir, "supplier").createOrReplaceTempView("_q21_supplier")
    return spark.sql(
        """
        WITH late AS (
          SELECT l.l_orderkey, l.l_suppkey
          FROM _q21_lineitem l JOIN _q21_orders o ON l.l_orderkey = o.o_orderkey
          WHERE o.o_orderstatus = 'F'
            AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAYS
        )
        SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        FROM late l1
        JOIN _q21_supplier s ON s.s_suppkey = l1.l_suppkey
        WHERE EXISTS (SELECT 1 FROM _q21_lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM late l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey)
        GROUP BY s.s_name
        ORDER BY numwait DESC, s.s_name
        LIMIT 20
        """
    )


_Q33_SQL = """
WITH rev AS (
  SELECT o_custkey AS custkey,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                  * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY o_custkey
), ranked AS (
  SELECT n_name, c_name, revenue,
         ROW_NUMBER() OVER (PARTITION BY n_name
                            ORDER BY revenue DESC, c_name) AS rk
  FROM rev
  JOIN customer ON custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
)
SELECT n_name, c_name, ROUND(revenue, 2) AS revenue
FROM ranked WHERE rk = 1
"""


@query("q33_sql_front_door", oracle=_Q33_SQL)
def q33(spark, sf_dir):
    """The SQL front door: register every table as a temp view and run
    the SAME ANSI text through ``spark.sql`` that the DuckDB oracle
    runs — proving a reference user can bring raw SQL (CTEs, windows,
    decimal arithmetic) to this engine unchanged. Catalyst plans it
    identically to the DataFrame formulations (broadcast dims, one
    revenue shuffle); the decimal-sum-then-cast discipline keeps the
    value hash engine-portable."""
    from ml_data_wrangler_spark.sources.readers import register_views

    register_views(spark, sf_dir)
    return spark.sql(_Q33_SQL)


@query(
    "q34_merge_upsert",
    oracle="""
WITH delta AS (
  -- update branch: spend per existing customer; insert branch: a
  -- deterministic synthetic cohort keyed past the base id space
  SELECT o_custkey AS c_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(12,2))
           AS spend
  FROM orders WHERE o_orderdate >= DATE '2001-01-01' GROUP BY o_custkey
  UNION ALL
  SELECT c_custkey + 10000000, CAST(100.00 AS DECIMAL(12,2))
  FROM customer WHERE c_custkey % 100 = 0
),
merged AS (
  SELECT COALESCE(b.c_custkey, d.c_custkey) AS c_custkey,
         CAST(
           CASE WHEN b.c_custkey IS NULL THEN d.spend
                WHEN d.c_custkey IS NULL
                  THEN CAST(b.c_acctbal AS DECIMAL(12,2))
                ELSE CAST(b.c_acctbal AS DECIMAL(12,2)) + d.spend
           END AS DOUBLE) AS balance,
         CASE WHEN b.c_custkey IS NULL THEN 'inserted'
              WHEN d.c_custkey IS NULL THEN 'unchanged'
              ELSE 'updated' END AS action
  FROM customer b FULL JOIN delta d USING (c_custkey)
)
SELECT action, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(balance AS DECIMAL(18,2))) AS DOUBLE) AS total_balance,
       CAST(MIN(c_custkey) AS BIGINT) AS min_key,
       CAST(MAX(c_custkey) AS BIGINT) AS max_key
FROM merged GROUP BY action ORDER BY action
""",
)
def q34(spark, sf_dir):
    """MERGE / SCD1 upsert semantics without a table format: base
    (customer) FULL OUTER JOIN delta, with WHEN MATCHED → update,
    WHEN NOT MATCHED → insert, and not-matched-by-source rows carried
    through unchanged — the maintenance operation warehouses spell
    MERGE INTO, expressed as the pure relational dual so the merged
    state is oracle-checkable (the write itself would go through the
    parquet sinks in sources/sinks.py). The delta exercises all three
    branches: spend from the incremental order window (update), a
    synthetic cohort keyed past the base id space (insert), and
    customers with no orders in the window (unchanged) — the shape of
    a daily MERGE batch.

    Shape at scale: ONE full-outer hash join on the merge key — both
    sides pre-aggregated/pre-keyed on it, so co-partitioning is free;
    balances stay DECIMAL through the merge arithmetic (exact,
    order-independent) and only the report casts to double."""
    from ml_data_wrangler_spark.plans._util import dbl, money

    base = t(spark, sf_dir, "customer")
    delta = (
        t(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= F.lit("2001-01-01").cast("date"))
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(F.sum(money("o_totalprice")).cast("decimal(12,2)").alias("spend"))
        .unionByName(
            base.where(F.col("c_custkey") % 100 == 0).select(
                (F.col("c_custkey") + 10000000).alias("c_custkey"),
                F.lit(100.00).cast("decimal(12,2)").alias("spend"),
            )
        )
    )
    b = base.select("c_custkey", money("c_acctbal").alias("bal")).alias("b")
    d = delta.alias("d")
    merged = b.join(d, "c_custkey", "full_outer").select(
        F.col("c_custkey"),
        dbl(
            F.when(F.col("b.bal").isNull(), F.col("d.spend"))
            .when(F.col("d.spend").isNull(), F.col("b.bal"))
            .otherwise(F.col("b.bal") + F.col("d.spend"))
        ).alias("balance"),
        F.when(F.col("b.bal").isNull(), "inserted")
        .when(F.col("d.spend").isNull(), "unchanged")
        .otherwise("updated")
        .alias("action"),
    )
    return (
        merged.groupBy("action")
        .agg(
            F.count("*").alias("n_rows"),
            dbl(F.sum(F.col("balance").cast("decimal(18,2)"))).alias(
                "total_balance"
            ),
            F.min("c_custkey").alias("min_key"),
            F.max("c_custkey").alias("max_key"),
        )
        .orderBy("action")
    )
