"""Bucketed tables — the zero-shuffle-join layout for fact-fact joins.

At 100 TB the orders⋈lineitem shuffle IS the query cost; bucketing
both facts by the join key at write time co-locates matching rows, so
the sort-merge join reads pre-partitioned data with NO Exchange on
either side (asserted in tests/test_bucketing.py by inspecting the
physical plan). This is the at-rest analog of what AQE does at
runtime — pay the shuffle once at ingest, never again per query.

Bucketed writes require the session catalog (saveAsTable); bucket
pruning + shuffle-free joins need
``spark.sql.sources.bucketing.enabled`` (default true) and matching
bucket counts on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a parquet table bucketed (and optionally
    sorted) by the join key. ``n_buckets`` should be sized so one
    bucket ≈ one executor-core's worth of data at the target scale."""
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, bucket_col)
    )
    if sort_col is not None:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str,
) -> DataFrame:
    """Join two same-bucketed tables on the bucket key — planned as a
    shuffle-free sort-merge join when bucket counts match."""
    return spark.table(left_table).join(spark.table(right_table), on)


def count_shuffle_exchanges(df: DataFrame) -> int:
    """Number of ShuffleExchange operators in the physical plan (0 for
    a co-located bucketed join). Test/diagnostic helper."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange hashpartitioning")
