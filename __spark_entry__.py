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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ the
    north-star extensions). Computed columns are aliased identically
    in the Spark plan and the oracle SQL."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL mirrors. Missing keys (LDA topics +
    coherence sweeps, lemmatize, MinHash, SimHash, IVF/LSH ANN,
    HLL/quantile sketches, multimodal stub features) are
    approximate/model-based ops → rows-only check by design."""
    return registry.oracle_sql()
