"""Window-function queries (SURVEY.md §7.2 step 3): ranking, frames,
lag/lead, running totals, top-k-per-group. Each window spec implies ONE
shuffle on its partition keys; queries share partitioning where
possible so Catalyst reuses the exchange.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ml_data_wrangler_spark.plans._util import dbl, money, t
from ml_data_wrangler_spark.plans.registry import query


@query(
    "qw01_top3_orders_per_customer",
    oracle="""
SELECT o_custkey, o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice, rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                                 ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
  FROM orders
)
WHERE rn <= 3
""",
)
def qw01(spark, sf_dir):
    """Top-k per group via row_number — the scalable alternative to a
    global sort; one shuffle on the group key."""
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        t(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .where(F.col("rn") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            "rn",
        )
    )


@query(
    "qw02_running_customer_revenue",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
              OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS running_total
FROM orders
""",
)
def qw02(spark, sf_dir):
    """Running total per customer (cumulative frame). Decimal inside
    the frame keeps the prefix sums exact and order-stable."""
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        dbl(F.sum(money("o_totalprice")).over(w)).alias("running_total"),
    )


@query(
    "qw03_customer_order_gaps",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(date_diff('day',
            lag(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
            o_orderdate) AS BIGINT) AS gap_days
FROM orders
""",
)
def qw03(spark, sf_dir):
    """lag() — days since the customer's previous order (NULL for the
    first)."""
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.datediff(
            F.col("o_orderdate"), F.lag("o_orderdate").over(w)
        ).cast("long").alias("gap_days"),
    )


@query(
    "qw04_part_price_rank_in_brand",
    oracle="""
SELECT p_brand, p_partkey, CAST(p_retailprice AS DOUBLE) AS p_retailprice,
       CAST(DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS BIGINT) AS price_rank
FROM part
""",
)
def qw04(spark, sf_dir):
    """dense_rank within brand (rank functions need no tiebreak — equal
    inputs get equal ranks deterministically)."""
    w = W.partitionBy("p_brand").orderBy(F.desc("p_retailprice"))
    return t(spark, sf_dir, "part").select(
        "p_brand",
        "p_partkey",
        F.col("p_retailprice").cast("double").alias("p_retailprice"),
        F.dense_rank().over(w).cast("long").alias("price_rank"),
    )


@query(
    "qw05_moving_avg_order_value",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
              OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
         / CAST(COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT)
         AS moving_avg
FROM orders
""",
)
def qw05(spark, sf_dir):
    """3-order moving average (bounded ROWS frame), computed as exact
    decimal sum / frame count for cross-engine stability."""
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, W.currentRow)
    )
    return t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        (dbl(F.sum(money("o_totalprice")).over(w)) / F.count("*").over(w)).alias(
            "moving_avg"
        ),
    )


@query(
    "qw06_nation_revenue_share",
    oracle="""
WITH cust_rev AS (
  SELECT c_custkey, c_nationkey,
         SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS rev
  FROM customer JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey, c_nationkey
)
SELECT c_custkey, c_nationkey,
       CAST(rev AS DOUBLE) AS customer_revenue,
       CAST(rev AS DOUBLE) / CAST(SUM(rev) OVER (PARTITION BY c_nationkey) AS DOUBLE)
         AS share_in_nation
FROM cust_rev
""",
)
def qw06(spark, sf_dir):
    """Aggregate + unpartitioned-frame window: each customer's share of
    their nation's revenue (classic ratio-to-report)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    cust_rev = (
        c.join(o, c.c_custkey == o.o_custkey)
        .groupBy("c_custkey", "c_nationkey")
        .agg(F.sum(money("o_totalprice")).alias("rev"))
    )
    w = W.partitionBy("c_nationkey")
    return cust_rev.select(
        "c_custkey",
        "c_nationkey",
        dbl(F.col("rev")).alias("customer_revenue"),
        (dbl(F.col("rev")) / dbl(F.sum("rev").over(w))).alias("share_in_nation"),
    )


@query(
    "qw07_order_percentile",
    oracle="""
SELECT o_orderkey,
       ROUND(PERCENT_RANK() OVER (ORDER BY o_totalprice, o_orderkey), 6) AS pct_rank,
       CAST(NTILE(4) OVER (ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS quartile
FROM orders
""",
)
def qw07(spark, sf_dir):
    """Global percent_rank + ntile WITHOUT a single-partition window.

    ``W.orderBy(...)`` with no partitionBy moves every row to one
    reducer (Spark itself warns) — the classic global-rank scale trap.
    This plans the two-pass distributed rank instead:

      1. range-partition by the sort key (Spark samples split points),
         row_number within each partition;
      2. per-partition counts (one row per partition) → running offset
         via a window over that TINY relation (#partitions rows — a
         single-partition window there is fine by construction);
      3. broadcast offsets back: global_rn = offset + local_rn.

    The sort key (o_totalprice, o_orderkey) is unique per row, so
    percent_rank = (rn−1)/(N−1) and ntile(4) follows the SQL bucket
    rule: with N = 4q + r, the first r buckets take q+1 rows. Results
    hash-match the oracle's PERCENT_RANK/NTILE exactly.

    (The two-pass rank itself lives in _util.global_row_number so
    every global rank in the registry — this one, qt13's Zipf rank —
    shares the audited implementation.)"""
    from ml_data_wrangler_spark.plans._util import global_row_number

    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    ranked = global_row_number(
        o, F.col("o_totalprice"), F.col("o_orderkey"), out="rn", n_out="n"
    ).select("o_orderkey", "rn", "n")
    # SQL NTILE(k): N = k*q + r → first r buckets hold q+1 rows
    k = F.lit(4)
    q = F.floor(F.col("n") / k)
    r = F.col("n") % k
    cut = r * (q + 1)
    quartile = (
        F.when(F.col("rn") <= cut, F.floor((F.col("rn") - 1) / (q + 1)))
        .otherwise(r + F.floor((F.col("rn") - cut - 1) / q))
        + 1
    )
    # SQL PERCENT_RANK defines 0.0 for a single-row partition; the
    # (rn-1)/(n-1) form would be NULL (0/0) there.
    pct = F.when(
        F.col("n") > 1, F.round((F.col("rn") - 1) / (F.col("n") - 1), 6)
    ).otherwise(F.lit(0.0))
    return ranked.select(
        "o_orderkey",
        pct.alias("pct_rank"),
        quartile.cast("long").alias("quartile"),
    )


@query(
    "qw08_trailing_30d_revenue",
    oracle="""
SELECT o_orderkey, o_custkey, o_orderdate,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate
            RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS trailing_30d
FROM orders
""",
)
def qw08(spark, sf_dir):
    """Time-RANGE window frame: each order's trailing-30-day revenue
    for its customer — a RANGE frame over event time, not a row-count
    frame (a 3-row window is meaningless when order spacing varies).
    The frame is defined on the epoch-day value so the ±30-day bound
    is exact arithmetic on both engines; ties on o_orderdate share the
    same frame (RANGE semantics — every peer row sees the same sum),
    so no tiebreak ordering is needed for determinism. Decimal sums
    keep the aggregate order-independent."""
    o = t(spark, sf_dir, "orders")
    days = F.datediff(F.col("o_orderdate"), F.lit("1970-01-01"))
    w = (
        W.partitionBy("o_custkey")
        .orderBy(days.cast("long"))
        .rangeBetween(-30, W.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        dbl(F.sum(money("o_totalprice")).over(w)).alias("trailing_30d"),
    )


@query(
    "qw09_order_position_profile",
    oracle="""
WITH w AS (
  SELECT o_custkey, o_orderkey, o_totalprice,
         FIRST_VALUE(o_orderdate) OVER cw AS first_order_date,
         NTH_VALUE(o_totalprice, 2) OVER cw AS second_order_price,
         ROUND(CUME_DIST() OVER (PARTITION BY o_custkey
                                 ORDER BY o_totalprice, o_orderkey), 6)
           AS price_cume_dist
  FROM orders
  WINDOW cw AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
)
SELECT o_custkey, o_orderkey,
       CAST(first_order_date AS TIMESTAMP) AS first_order_date,
       second_order_price, price_cume_dist
FROM w
""",
)
def qw09(spark, sf_dir):
    """Per-order position profile inside its customer's history:
    FIRST_VALUE (acquisition date), NTH_VALUE(…, 2) over the full
    frame (NULL for single-order customers — frame semantics, not a
    sentinel), and CUME_DIST of the order's price — the remaining
    value-window API surface (qw01-qw08 cover rank/lag/rolling). One
    shuffle on the customer key serves all three, with explicit
    orderkey tiebreaks so both engines see identical frames."""
    cw = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    pw = W.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderdate").over(cw).alias("first_order_date"),
        F.nth_value("o_totalprice", 2).over(cw).alias("second_order_price"),
        F.round(F.cume_dist().over(pw), 6).alias("price_cume_dist"),
    )


@query(
    "qw11_order_decile_profile",
    oracle="""
WITH ranked AS (
  SELECT o_totalprice,
         ROW_NUMBER() OVER (ORDER BY o_totalprice, o_orderkey) AS rn,
         COUNT(*) OVER () AS n
  FROM orders
)
SELECT CAST(floor((rn - 1) * 10 / n) + 1 AS BIGINT) AS decile,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(MIN(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS min_price,
       CAST(MAX(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS max_price,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
FROM ranked
GROUP BY decile ORDER BY decile
""",
)
def qw11(spark, sf_dir):
    """Global decile profile of order value — rank every order
    globally, split into 10 rank-equal buckets, report each bucket's
    count/min/max/sum (the revenue-concentration curve: compare
    decile 10's total to decile 1's).

    Shape at scale: the global rank comes from
    plans/_util.global_row_number — range-partition, local
    row_number, triangular broadcast offsets — so NO unpartitioned
    WindowExec exists anywhere in the plan (the registry-wide sweep
    enforces this); the oracle is free to use the single-node global
    window. The bucket formula floor((rn−1)·10/n)+1 is pure integer
    arithmetic on both engines (NTILE's remainder-spreading is
    deliberately avoided — this formula is scale-stable and
    engine-identical)."""
    from ml_data_wrangler_spark.plans._util import global_row_number, money

    ranked = global_row_number(
        t(spark, sf_dir, "orders").select("o_totalprice", "o_orderkey"),
        F.col("o_totalprice").asc(),
        F.col("o_orderkey").asc(),
        out="rn",
        n_out="n",
    )
    return (
        ranked.select(
            (F.floor((F.col("rn") - 1) * 10 / F.col("n")) + 1).alias("decile"),
            money("o_totalprice").alias("p"),
        )
        .groupBy("decile")
        .agg(
            F.count("*").alias("n_orders"),
            dbl(F.min("p")).alias("min_price"),
            dbl(F.max("p")).alias("max_price"),
            dbl(F.sum("p")).alias("total_price"),
        )
        .orderBy("decile")
    )
