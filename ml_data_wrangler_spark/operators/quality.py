"""Generic data-quality contract runner (the engine's "expectations"
surface): declare row-level constraints as Column predicates, get back
a one-row-per-constraint violation report from a SINGLE pass over the
data.

The reference logged individual wrangle failures (wrangler.py:448-449);
this generalizes that intent: any pipeline stage can publish its
contract as named predicates and emit countable, diffable violation
numbers instead of scattered log lines. qt11 (the per-source document
gate) is the hand-built instance of this shape; ``constraint_report``
is the reusable runner.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def constraint_report(df: DataFrame, constraints: dict[str, Column]) -> DataFrame:
    """Evaluate every named row-level constraint in ONE aggregation
    over ``df`` and return (constraint, n_rows, n_violations,
    violation_frac) per constraint, ordered by name.

    A row VIOLATES a constraint when the predicate is false OR null
    (SQL three-valued logic would otherwise let nulls sneak past a
    check like ``value >= 0``); write ``col.isNull() | (col >= 0)``
    when null is acceptable.

    Scale shape: all constraints are map-side boolean expressions
    folded into one partial-aggregated job — adding a constraint adds
    a column to the aggregate, never a pass over the data. The output
    is |constraints| rows regardless of input size: a metadata table
    to publish with every batch and diff between runs.
    """
    if not constraints:
        raise ValueError("constraints must be a non-empty dict")
    # coalesce each SUM: over zero rows SUM is NULL, and the empty
    # batch (a contract runner WILL eventually see one) must report a
    # consistent (n_rows=0, n_violations=0, violation_frac=0.0) row
    aggs = [F.count(F.lit(1)).alias("_n")] + [
        F.coalesce(
            F.sum((~F.coalesce(pred, F.lit(False))).cast("bigint")), F.lit(0)
        ).alias(f"_v_{i}")
        for i, pred in enumerate(constraints.values())
    ]
    row = df.agg(*aggs)
    reports = F.array(
        *[
            F.struct(
                F.lit(name).alias("constraint"),
                F.col("_n").alias("n_rows"),
                F.col(f"_v_{i}").alias("n_violations"),
                F.when(F.col("_n") > 0, F.round(F.col(f"_v_{i}") / F.col("_n"), 6))
                .otherwise(F.lit(0.0))
                .alias("violation_frac"),
            )
            for i, name in enumerate(constraints)
        ]
    )
    return (
        row.select(F.explode(reports).alias("r"))
        .select("r.constraint", "r.n_rows", "r.n_violations", "r.violation_frac")
        .orderBy("constraint")
    )
