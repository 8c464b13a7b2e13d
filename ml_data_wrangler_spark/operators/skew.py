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
    n_salts: int | None = 16,
    seed: int = 42,
) -> DataFrame:
    """Equi-join with the LEFT (big, skewed) side salted and the RIGHT
    (small) side replicated once per salt. Result is identical to
    ``left.join(right, on, how)``; only the shuffle distribution
    changes — the hot key's rows land on ``n_salts`` reducers instead
    of one.

    ``n_salts=None`` sizes the salt adaptively from the join-key
    cardinality (one distinct-count job):
    ``adaptive_salt(parallelism, n_keys)`` = ceil(3P/keys), collapsing
    to 1 — replication off — once natural keys oversubscribe the
    cores 3× (operators/_partition.py; the hash-balance margin is
    measured in its docstring).

    ``how`` supports inner/left (the salted-side-preserving joins).
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    spark = left.sparkSession
    if n_salts is None:
        from ml_data_wrangler_spark.operators._partition import adaptive_salt

        n_keys = max(1, left.select(*on).distinct().count())
        n_salts = adaptive_salt(spark.sparkContext.defaultParallelism, n_keys)
    salt = F.floor(F.rand(seed) * n_salts).cast("int").alias("_salt")
    l_salted = left.withColumn("_salt", salt)
    salts = spark.range(n_salts).select(F.col("id").cast("int").alias("_salt"))
    r_replicated = right.crossJoin(F.broadcast(salts))
    return l_salted.join(r_replicated, [*on, "_salt"], how).drop("_salt")


_MERGE_FNS = {"sum": F.sum, "min": F.min, "max": F.max}


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[Column, str]],
    n_salts: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Two-phase aggregation for hot keys: groupBy(keys + salt) partial
    → groupBy(keys) merge.

    ``aggs`` maps output name → ``(partial_aggregate, merge)`` where
    ``merge`` ∈ {"sum", "min", "max"} names how the per-salt partials
    combine: ``{"n": (F.count("*"), "sum"), "total": (F.sum("value"),
    "sum"), "lo": (F.min("value"), "min")}``. The merge is EXPLICIT
    because it cannot be inferred safely: a partial COUNT merges by
    SUM, and non-decomposable aggregates (avg, countDistinct, first)
    have no valid merge at all — passing a bare Column or an unknown
    merge raises instead of silently producing wrong numbers. Compute
    an average from (sum, count) partials; use HLL sketches
    (approx_count_distinct) for distinct counts.
    """
    for name, spec in aggs.items():
        if not (isinstance(spec, tuple) and len(spec) == 2):
            raise TypeError(
                f"aggs[{name!r}] must be (Column, merge) — got {spec!r}. "
                "Non-decomposable aggregates (avg, countDistinct, first) "
                "cannot be salted; derive them from decomposable partials."
            )
        if spec[1] not in _MERGE_FNS:
            raise ValueError(
                f"aggs[{name!r}] merge must be one of {sorted(_MERGE_FNS)}, "
                f"got {spec[1]!r}"
            )
    salt = F.floor(F.rand(seed) * n_salts).cast("int").alias("_salt")
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(*[col.alias(name) for name, (col, _) in aggs.items()])
    )
    return partial.groupBy(*keys).agg(
        *[_MERGE_FNS[merge](name).alias(name) for name, (_, merge) in aggs.items()]
    )
