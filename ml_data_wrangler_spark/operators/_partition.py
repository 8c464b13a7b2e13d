"""Partitioning helpers shared by the fan-out-heavy operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(
    df: DataFrame, min_partitions: int | None = None
) -> DataFrame:
    """Repartition ``df`` to session parallelism ONLY if it currently
    has fewer partitions.

    Why repartition at all (optimizer trap #10): an expensive per-row
    stage — GEMM scoring, MinHash signature construction, a broadcast
    fan-out join — inherits its input's partitioning, and a small
    parquet scan is 1-2 splits, so the stage runs near-serial while
    the rest of the box idles (measured this round: 103-328 s single
    tasks inside qd03/qv06/qv08/qv20/qv22 at the 6× tier).

    Why the CONDITION matters as much as the repartition at cluster
    scale: a 100 TB scan already has orders of magnitude more
    partitions than cores, and an unconditional repartition(cores)
    would COALESCE it into multi-GB tasks and pay a full extra
    shuffle of the whole relation for nothing. Reading the partition
    count compiles the physical plan but runs no job; call sites pass
    near-scan relations where that is cheap.
    """
    spark = df.sparkSession
    target = (
        min_partitions
        if min_partitions is not None
        else spark.sparkContext.defaultParallelism
    )
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def adaptive_salt(parallelism: int, n_keys: int) -> int:
    """Salt factor for a shuffle join on a low-cardinality key:
    ``ceil(parallelism / n_keys)``, floored at 1.

    A bare equi-join on a key with fewer distinct values than cores
    caps its reduce side at that many tasks (trap #10's corollary —
    measured round 7: qv06's 6-value sub-block key ran the quadratic
    ground truth as two 5-task stages of 214 s max). Salting side a
    with one deterministic value in [0, salt) and exploding side b to
    all salt values restores parallelism; making the factor INVERSELY
    proportional to key cardinality means it collapses to exactly 1 —
    and the b-side replication vanishes — once natural keys saturate
    the cluster, which is precisely the regime where replication
    would be quadratic waste. Both directions are pinned by unit test
    and, since round 8, asserted on real multi-split scale data
    (tests/test_scale_deactivation.py)."""
    return max(1, -(-parallelism // max(1, n_keys)))
