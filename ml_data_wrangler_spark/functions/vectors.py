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


def _jl_sign(k: int):
    """Deterministic ±1 for matrix cell (j, k), derived from
    md5(f"{j}_{k}") — a pure function of the indices, so the implicit
    projection matrix is identical on every executor, every run, and
    every ENGINE (the DuckDB oracle re-derives the same matrix) with
    nothing broadcast. Factory form because a two-arg lambda passed to
    F.transform would receive the element INDEX as its second arg."""

    def s(j: Column) -> Column:
        h = F.conv(
            F.substring(F.md5(F.concat(j.cast("string"), F.lit(f"_{k}"))), 1, 1),
            16,
            10,
        )
        return F.when(h.cast("int") % 2 == 0, F.lit(1.0)).otherwise(F.lit(-1.0))

    return s


def jl_project(vec: Column, in_dims: int, out_dims: int) -> Column:
    """Johnson–Lindenstrauss random projection to ``out_dims`` via a
    hash-derived ±1 (Achlioptas 2003) matrix: out[k] = Σ_j v[j]·s(j,k)
    / √out_dims, each component rounded to 6 digits. Map-only (no
    shuffle, no broadcast, no fitted state): the matrix exists only as
    an expression over (j, k). Components are computed with the same
    left-to-right fold as dot(), so the oracle's list_dot_product
    reproduces them bit-identically."""
    import math

    scale = F.lit(math.sqrt(float(out_dims)))
    comps = [
        F.round(
            dot(
                vec,
                F.transform(
                    F.sequence(F.lit(0), F.lit(in_dims - 1)), _jl_sign(k)
                ),
            )
            / scale,
            6,
        )
        for k in range(out_dims)
    ]
    return F.array(*comps)
