"""Skew-handling utilities for hot keys at scale.

AQE's skew-join splitting (on in session.py) handles most skew
automatically by splitting oversized partitions AFTER a shuffle
materializes. These utilities are for the cases AQE can't fix:

  * ``salted_join`` — a single key so hot that even a split partition
    overwhelms one task's build side: salt the big side, replicate the
    small side per salt, join on (key, salt). Replication factor =
    ``n_salts`` × |right|, so this is for dimension-sized right sides.
  * ``salted_aggregate`` — hot-key aggregation: pre-aggregate on
    (key, salt) so the map-side combine spreads the hot key over
    ``n_salts`` reducers, then finish on key. Only valid for
    decomposable aggregates (sum/count/min/max — anything with a
    merge step).

Both produce results identical to their unsalted duals — the salt only
changes the physical distribution, never the answer (asserted in
tests/test_skew.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    n_salts: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Equi-join with the LEFT (big, skewed) side salted and the RIGHT
    (small) side replicated once per salt. Result is identical to
    ``left.join(right, on, how)``; only the shuffle distribution
    changes — the hot key's rows land on ``n_salts`` reducers instead
    of one.

    ``how`` supports inner/left (the salted-side-preserving joins).
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    spark = left.sparkSession
    salt = F.floor(F.rand(seed) * n_salts).cast("int").alias("_salt")
    l_salted = left.withColumn("_salt", salt)
    salts = spark.range(n_salts).select(F.col("id").cast("int").alias("_salt"))
    r_replicated = right.crossJoin(F.broadcast(salts))
    return l_salted.join(r_replicated, [*on, "_salt"], how).drop("_salt")


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, Column],
    n_salts: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Two-phase aggregation for hot keys: groupBy(keys + salt) partial
    → groupBy(keys) merge.

    ``aggs`` maps output name → a SUM/COUNT/MIN/MAX-style aggregate
    Column over the input (e.g. ``{"n": F.count("*"), "total":
    F.sum("value")}``). count is merged with sum; sum/min/max merge
    with themselves. avg and distinct aggregates are NOT decomposable
    this way — compute them from (sum, count) pairs.
    """
    salt = F.floor(F.rand(seed) * n_salts).cast("int").alias("_salt")
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(*[c.alias(name) for name, c in aggs.items()])
    )

    def merge(name: str, col: Column) -> Column:
        # a partial COUNT merges by SUM; others by themselves
        expr = str(col._jc)  # e.g. "count(1) AS n" — inspect the fn name
        if expr.lower().startswith("count"):
            return F.sum(name).alias(name)
        if expr.lower().startswith("min"):
            return F.min(name).alias(name)
        if expr.lower().startswith("max"):
            return F.max(name).alias(name)
        return F.sum(name).alias(name)

    return partial.groupBy(*keys).agg(
        *[merge(name, col) for name, col in aggs.items()]
    )
