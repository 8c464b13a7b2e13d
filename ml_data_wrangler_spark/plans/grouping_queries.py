"""Multi-dimensional aggregation: ROLLUP / CUBE / GROUPING SETS /
PIVOT. Spark expands these into a single shuffle over the expanded
grouping-id space (no N-pass re-scan).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ml_data_wrangler_spark.plans._util import SQL_DISC_PRICE, dbl, disc_price, money, t
from ml_data_wrangler_spark.plans.registry import query


@query(
    "qg01_rollup_returns",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
)
def qg01(spark, sf_dir):
    """ROLLUP hierarchy (flag → flag+status → grand total); NULL marks
    rolled-up levels identically in both engines."""
    return (
        t(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            dbl(F.sum(disc_price())).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "qg02_cube_status_priority",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
)
def qg02(spark, sf_dir):
    """CUBE over two dimensions — all 4 grouping sets in one pass."""
    return (
        t(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            dbl(F.sum(money("o_totalprice"))).alias("total"),
            F.count("*").alias("n_orders"),
        )
    )


@query(
    "qg03_grouping_sets",
    oracle="""
SELECT c_mktsegment, c_nationkey,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
FROM customer
GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey))
""",
)
def qg03(spark, sf_dir):
    """Explicit GROUPING SETS (segment-only and nation-only rollups in
    one shuffle) via the SQL API — same Catalyst Expand plan as the
    DataFrame rollup/cube."""
    t(spark, sf_dir, "customer").createOrReplaceTempView("customer_gs")
    return spark.sql(
        """
        SELECT c_mktsegment, c_nationkey,
               COUNT(*) AS n_customers,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
        FROM customer_gs
        GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey))
        """
    )


@query(
    "qg04_pivot_linestatus",
    oracle=f"""
SELECT l_returnflag,
       CAST(SUM(CASE WHEN l_linestatus = 'O' THEN {SQL_DISC_PRICE} END) AS DOUBLE) AS rev_open,
       CAST(SUM(CASE WHEN l_linestatus = 'F' THEN {SQL_DISC_PRICE} END) AS DOUBLE) AS rev_filled
FROM lineitem
GROUP BY l_returnflag
""",
)
def qg04(spark, sf_dir):
    """PIVOT on l_linestatus with an explicit value list (never let
    pivot infer values at scale — that's an extra distinct job)."""
    pivoted = (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(disc_price()))
    )
    return pivoted.select(
        "l_returnflag",
        dbl(F.col("O")).alias("rev_open"),
        dbl(F.col("F")).alias("rev_filled"),
    )


@query(
    "qg05_distinct_parts_per_flag",
    oracle="""
SELECT l_returnflag,
       CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers
FROM lineitem
GROUP BY l_returnflag
""",
)
def qg05(spark, sf_dir):
    """Multiple exact COUNT(DISTINCT) in one aggregation (Spark plans
    expand + two-phase agg). The approximate variant
    (approx_count_distinct/HLL) is the 100 TB path but is engine-
    specific, so the oracle checks the exact one."""
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_suppliers"),
        )
    )


@query(
    "qg06_rollup_grouping_id",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT)
         AS grouping_level,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY grouping_level, l_returnflag, l_linestatus
""",
)
def qg06(spark, sf_dir):
    """ROLLUP with the machine-readable GROUPING_ID: subtotal rows
    carry an integer level instead of ambiguous NULLs (a NULL key
    value and a rolled-up key are indistinguishable without it) — the
    way downstream consumers are supposed to dispatch on aggregation
    level. Bit order matches the grouping column order on both
    engines."""
    return (
        t(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("bigint").alias("grouping_level"),
            F.count("*").alias("n"),
        )
        .select("l_returnflag", "l_linestatus", "grouping_level", "n")
        .orderBy("grouping_level", "l_returnflag", "l_linestatus")
    )


@query(
    "qg07_grouping_sets",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT)
         AS grouping_level,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
ORDER BY grouping_level, l_returnflag, l_linestatus
""",
)
def qg07(spark, sf_dir):
    """Explicit NON-HIERARCHICAL grouping sets — ((flag, status),
    (status), ()) skips the (flag)-only level a ROLLUP would produce
    and adds the (status)-only level a rollup of (flag, status) never
    emits, so
    this is the GROUPING SETS operator proper, not rollup/cube
    (qg01-qg06) in disguise. Expressed through Spark SQL (the
    DataFrame API exposes only rollup/cube; GROUPING SETS is the SQL
    surface) over a temp view, with GROUPING_ID dispatch like qg06.

    Physical shape: Spark plans one Expand (3 replicas of each input
    row, one per set) into a single hash aggregation — the replicas
    carry only the grouped columns, so cost is |sets|×|rows| narrow
    tuples through ONE shuffle, not |sets| passes over the table."""
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT)
                 AS grouping_level,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
        ORDER BY grouping_level, l_returnflag, l_linestatus
        """
    )


@query(
    "qg08_cube_returns_by_year",
    oracle="""
SELECT l_returnflag, ship_year,
       CAST(GROUPING(l_returnflag) * 2 + GROUPING(ship_year) AS BIGINT)
         AS grouping_level,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
         AS revenue
FROM (SELECT l_returnflag, CAST(year(l_shipdate) AS BIGINT) AS ship_year,
             l_extendedprice, l_discount
      FROM lineitem)
GROUP BY CUBE (l_returnflag, ship_year)
ORDER BY grouping_level, l_returnflag, ship_year
""",
)
def qg08(spark, sf_dir):
    """CUBE — the remaining multi-level grouping operator (qg06 has
    ROLLUP, qg07 explicit GROUPING SETS): all four aggregation levels
    of (returnflag, ship-year) including the (ship_year)-only slice a
    rollup never emits, with GROUPING_ID dispatch so subtotal rows
    are machine-distinguishable from NULL keys.

    Physical shape: like qg07's Expand — each input row fans out to
    4 narrow replicas (grouped columns + exact decimal revenue only)
    through ONE hash aggregation / one shuffle; never 4 passes over
    the table. Revenue stays DECIMAL until the final cast, per the
    _util money discipline."""
    from ml_data_wrangler_spark.plans._util import dbl, disc_price

    return (
        t(spark, sf_dir, "lineitem")
        .withColumn("ship_year", F.year("l_shipdate").cast("bigint"))
        .cube("l_returnflag", "ship_year")
        .agg(
            F.grouping_id().cast("bigint").alias("grouping_level"),
            F.count("*").alias("n"),
            dbl(F.sum(disc_price())).alias("revenue"),
        )
        .select("l_returnflag", "ship_year", "grouping_level", "n", "revenue")
        .orderBy("grouping_level", "l_returnflag", "ship_year")
    )
