"""Bucketed-join layout: same-bucketed fact tables join with ZERO
shuffle exchanges, and results equal the plain join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ml_data_wrangler_spark.sources.bucketing import (
    bucketed_join,
    count_shuffle_exchanges,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    # warehouse.dir is a static conf — tables land in ./spark-warehouse
    # (gitignored) and are dropped on teardown
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    write_bucketed(orders, "b_orders", "o_orderkey", n_buckets=8)
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem",
        "o_orderkey",
        n_buckets=8,
    )
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_no_shuffle(spark, bucketed_tables):
    lt, rt = bucketed_tables
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        joined = bucketed_join(spark, lt, rt, "o_orderkey")
        agg = joined.groupBy("o_orderstatus").agg(F.count("*").alias("n"))
        # join itself introduces no hash-partition exchange (the only
        # one allowed is the final aggregation's)
        assert count_shuffle_exchanges(joined) == 0
        assert count_shuffle_exchanges(agg) <= 1
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_join_matches_plain(spark, sf_dir, bucketed_tables):
    lt, rt = bucketed_tables
    bucketed_n = bucketed_join(spark, lt, rt, "o_orderkey").count()
    plain_n = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .join(
            spark.read.parquet(f"{sf_dir}/lineitem.parquet"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .count()
    )
    assert bucketed_n == plain_n
