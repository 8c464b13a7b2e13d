"""constraint_report: single-pass contract runner semantics —
null predicates count as violations, fractions are exact, empty
contract rejected."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from ml_data_wrangler_spark.operators.quality import constraint_report


def test_constraint_report_counts_and_null_handling(spark):
    df = spark.createDataFrame(
        [
            Row(x=1, y="a"),
            Row(x=-1, y="b"),
            Row(x=None, y="a"),  # null predicate → violation
            Row(x=5, y=None),
        ]
    )
    out = {
        r["constraint"]: r
        for r in constraint_report(
            df,
            {
                "x_non_negative": F.col("x") >= 0,
                "y_known": F.col("y").isin("a", "b"),
            },
        ).collect()
    }
    assert out["x_non_negative"]["n_rows"] == 4
    assert out["x_non_negative"]["n_violations"] == 2  # -1 and NULL
    assert out["x_non_negative"]["violation_frac"] == 0.5
    assert out["y_known"]["n_violations"] == 1  # NULL y
    assert out["y_known"]["violation_frac"] == 0.25


def test_constraint_report_single_job_plan(spark):
    df = spark.range(100).select(F.col("id").alias("x"))
    rep = constraint_report(df, {"pos": F.col("x") >= 0, "small": F.col("x") < 1000})
    plan = rep._jdf.queryExecution().executedPlan().toString()
    # one global aggregate (partial + final), no joins, no python
    assert "Join" not in plan
    assert "pythonUDF" not in plan.lower()


def test_constraint_report_empty_batch_consistent(spark):
    """Zero input rows → every constraint reports (0, 0, 0.0), never a
    NULL n_violations (SUM over zero rows is NULL without coalesce)."""
    df = spark.createDataFrame([], "value long")
    out = constraint_report(df.where(F.lit(False)), {"nonneg": F.col("value") >= 0}).collect()
    assert [(r["n_rows"], r["n_violations"], r["violation_frac"]) for r in out] == [
        (0, 0, 0.0)
    ]


def test_constraint_report_rejects_empty(spark):
    df = spark.range(3)
    with pytest.raises(ValueError):
        constraint_report(df, {})
