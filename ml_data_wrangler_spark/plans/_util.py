"""Shared helpers for the query suite.

Cross-engine determinism rules (Spark vs DuckDB oracle — see
registry.py docstring):

  * Money/ratio arithmetic is done in DECIMAL on BOTH engines
    (prices DECIMAL(12,2), rates DECIMAL(4,2)). Decimal sums are exact
    and associative, so partition order can't change the result; the
    final CAST to DOUBLE of the same exact decimal is bit-identical in
    both engines. Never hash a raw SUM(double).
  * DuckDB SUM(BIGINT) returns HUGEINT → oracle SQL wraps integer
    aggregates in CAST(... AS BIGINT).
  * Every LIMIT/top-k is preceded by a TOTAL order (explicit tiebreak
    columns) on both sides.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ml_data_wrangler_spark.sources.readers import read_table


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def money(c: Column | str) -> Column:
    """Price-like double → exact DECIMAL(12,2)."""
    return _col(c).cast("decimal(12,2)")


def rate(c: Column | str) -> Column:
    """Discount/tax-like double in [0,1] → exact DECIMAL(4,2)."""
    return _col(c).cast("decimal(4,2)")


def disc_price() -> Column:
    """l_extendedprice * (1 - l_discount), exact decimal."""
    return money("l_extendedprice") * (F.lit(1) - rate("l_discount"))


def charge() -> Column:
    """l_extendedprice * (1 - l_discount) * (1 + l_tax), exact decimal."""
    return disc_price() * (F.lit(1) + rate("l_tax"))


def dbl(c: Column) -> Column:
    return c.cast("double")


# The same expressions for the DuckDB side, as SQL fragments.
SQL_MONEY = "CAST({c} AS DECIMAL(12,2))"
SQL_DISC_PRICE = (
    "CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))"
)
SQL_CHARGE = SQL_DISC_PRICE + " * (1 + CAST(l_tax AS DECIMAL(4,2)))"
