"""Vector math over array<float|double> columns — JVM-side only.

Used by the similarity-search operators. ``F.zip_with`` +
``F.aggregate`` keep the arithmetic in codegen; no Python, no UDF, no
shuffle. For 100 TB-scale ANN the per-row cost of these expressions is
the inner loop, so staying JVM-side matters more than anywhere else.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
