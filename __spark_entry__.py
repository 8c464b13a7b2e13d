"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship pipeline on sf0.001 (smoke check).
``queries()`` / ``oracle_sql()`` — the registered operator suite from
ml_data_wrangler_spark.plans (one entry per implemented SURVEY.md §2
operator / extension; oracle present wherever the op is
SQL-expressible).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ml_data_wrangler_spark.plans import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: text pipeline over sf0.001 documents — cleanse (F1) →
    PII scrub (F2) → tokenize → top-20 token counts (SURVEY.md §7.2
    step 2)."""
    from pyspark.sql import functions as F

    from ml_data_wrangler_spark.functions.text import cleanse_text, pii_scrub, tokenize

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    cleansed = docs.select(
        "doc_id", pii_scrub(cleanse_text(F.col("text"))).alias("clean")
    )
    return (
        cleansed.select(F.explode(tokenize(F.col("clean"))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "token")
        .limit(20)
    )


# Queries the driver's correctness gate already recorded (the driver
# snapshots ~50 queries per round in registration order). Listing them
# lets queries() order NEVER-YET-GATED queries first, so the union of
# per-round gate files converges on full coverage of the registry
# (144+ queries as of round 4). Union of CORRECTNESS_r01/r02/r03.
# Deliberately EXCLUDED so they re-gate under their round-4 forms:
# qm05 (array output crashed the driver canon — now a joined string),
# qd03/qd04/qv06 (rows-only in r03 — now oracle-pinned bounded-error
# forms).
_GATED_PASS = frozenset(
    # r01 ∪ r02
    [f"q{i:02d}" for i in range(1, 33)]
    + ["qe01", "qe02", "qg01", "qg02", "qg03", "qg04", "qg05"]
    + ["qj01", "qj02", "qj03"]
    + [f"qw{i:02d}" for i in range(1, 9)]
    # r03 (minus qm05 — see above)
    + [f"qc{i:02d}" for i in range(1, 7)]
    + ["qd01", "qd02", "qd06", "qd07", "qd08"]
    + ["qe03", "qe04", "qe05", "qe06", "qe07", "qg06", "qj04"]
    + ["qm01", "qm02", "qm03", "qm04", "qm07"]
    + [f"qs{i:02d}" for i in range(1, 7)]
    + [f"qt{i:02d}" for i in range(1, 8)]
    + ["qv01", "qv02", "qv03", "qv04", "qv05", "qv08"]
    + [f"qx{i:02d}" for i in range(1, 6)]
)


# Queries added AFTER the round-4 priority set was sized to exactly
# one ~50-query driver snapshot. They are never-gated too, but queue
# BEHIND the priority set so late additions can't displace a
# priority re-gate out of this round's snapshot; once the round-4
# correctness file folds into _GATED_PASS next round, these become
# the front of the line automatically.
_GATE_LATE = frozenset(
    [
        "qe21", "qs08", "qv13", "qd12", "qe22", "qd13", "qc15", "qg07",
        "qv14", "qt16", "qj05", "qd14", "qv15", "qs09", "qm13", "qm14",
        "qv16", "qt17", "qg08", "qe24", "qe25", "qj06", "q34", "qw11",
        "qe27", "qv17", "qs10", "qd15", "qm16", "qe28", "qe29", "qm17",
        "qc16", "qv18", "qt18", "qs11", "qm18", "qd16", "qc17", "qe30", "qe31", "qe32", "qv19",
        "qe33", "qe34", "qm19", "qc18", "qt19", "qv20", "qe35",
        "qd17", "qe36", "qc19", "qt20", "qe37", "qx06", "qc20",
        "qc21", "qe38", "qm20", "qv21", "qd18", "qm21", "qv22", "qx07",
        "qe39",
    ]
)


def _short(name: str) -> str:
    return name.split("_", 1)[0]


def _gate_order(names: list[str]) -> list[str]:
    """Never-gated queries first (family-interleaved by the registry),
    late additions after them, previously-gated ones last."""
    fresh = [
        n
        for n in names
        if _short(n) not in _GATED_PASS and _short(n) not in _GATE_LATE
    ]
    late = [n for n in names if _short(n) in _GATE_LATE]
    seen = [n for n in names if _short(n) in _GATED_PASS]
    return fresh + late + seen


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ the
    north-star extensions). Computed columns are aliased identically
    in the Spark plan and the oracle SQL."""
    q = registry.queries()
    return {n: q[n] for n in _gate_order(list(q))}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL mirrors. Missing keys (LDA topics +
    coherence sweeps, raw 64-bit SimHash pairs, raw IVF/GEMM result
    streams) are model-based/non-SQL ops → rows-only check by design;
    the approximate families additionally gate through oracle-pinned
    bounded-error duals (qd03/qd04/qv06/qv11/qv12, qe07/qe16/qs07)."""
    o = registry.oracle_sql()
    return {n: o[n] for n in _gate_order(list(registry.queries())) if n in o}
