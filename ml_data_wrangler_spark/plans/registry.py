"""Query registry — the driver-contract surface.

Every implemented operator from SURVEY.md §2 (plus the extension
operators) registers a named query here:

    @query("q01_pricing_summary", oracle=\"\"\"SELECT ...\"\"\")
    def q01(spark, sf_dir) -> DataFrame: ...

``queries()`` / ``oracle_sql()`` feed ``__spark_entry__.py``. Oracle
SQL must be DuckDB-runnable ANSI SQL over the pre-registered views and
produce IDENTICAL column names (the driver sorts columns by name and
hashes values). Non-SQL-expressible ops register with ``oracle=None``
(driver does a rows-only check).

Float discipline: every computed double is wrapped in round() with the
SAME precision on both sides, so double-summation order differences
between engines can't flip the value hash.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}
# scale-tier oracle surface: for queries whose SQL oracle has an
# inherently super-linear KEYSPACE (e.g. an O(n²) pair aggregate), a
# row engine cannot verify beyond a bound no matter how the SQL is
# phrased — the aggregate's output is the cost. Such queries may
# register (a) a bound (table, max_rows) above which the SQL oracle is
# declared infeasible, and (b) a Python scale-oracle fn(con) ->
# (cols, rows) that re-derives the SAME values with a feasible
# algorithm (typically: DuckDB for the linear relational prologue +
# numpy for the quadratic kernel). The driver gate (sf0.01) never
# consults these — it always runs the SQL oracle bit-exactly.
_SCALE_ORACLES: dict[str, Callable] = {}
_ORACLE_SCALE_BOUNDS: dict[str, tuple[str, int]] = {}

_QUERY_MODULES = (
    "ml_data_wrangler_spark.plans.relational_queries",
    "ml_data_wrangler_spark.plans.join_queries",
    "ml_data_wrangler_spark.plans.window_queries",
    "ml_data_wrangler_spark.plans.grouping_queries",
    "ml_data_wrangler_spark.plans.events_queries",
    "ml_data_wrangler_spark.plans.events_stats_queries",
    "ml_data_wrangler_spark.plans.events_advanced_queries",
    "ml_data_wrangler_spark.plans.text_queries",
    "ml_data_wrangler_spark.plans.dedup_queries",
    "ml_data_wrangler_spark.plans.vector_queries",
    "ml_data_wrangler_spark.plans.vector_ml_queries",
    "ml_data_wrangler_spark.plans.ml_queries",
    "ml_data_wrangler_spark.plans.multimodal_queries",
    "ml_data_wrangler_spark.plans.streaming_queries",
    "ml_data_wrangler_spark.plans.curation_queries",
)


def query(
    name: str,
    oracle: str | None = None,
    scale_oracle: Callable | None = None,
    oracle_scale_bound: tuple[str, int] | None = None,
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        if scale_oracle is not None:
            _SCALE_ORACLES[name] = scale_oracle
        if oracle_scale_bound is not None:
            _ORACLE_SCALE_BOUNDS[name] = oracle_scale_bound
        return fn

    return deco


def load_all_queries() -> None:
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)


def _family(name: str) -> str:
    """Family prefix of a query name: letters before the first digit
    ('q01_…' → 'q', 'qd02_…' → 'qd')."""
    for i, ch in enumerate(name):
        if ch.isdigit():
            return name[:i]
    return name


def _interleaved(names: list[str]) -> list[str]:
    """Round-robin the names across families (preserving in-family
    order) so a consumer that only processes a PREFIX of the registry
    — e.g. a correctness gate with a fixed query budget — still
    exercises every operator family. With ~12 families, the first 50
    entries cover every family ~4 queries deep instead of never
    reaching the later modules."""
    by_family: dict[str, list[str]] = {}
    for n in names:
        by_family.setdefault(_family(n), []).append(n)
    buckets = list(by_family.values())
    out: list[str] = []
    for i in range(max(len(b) for b in buckets)):
        out.extend(b[i] for b in buckets if i < len(b))
    return out


def queries() -> dict[str, QueryFn]:
    load_all_queries()
    return {n: _QUERIES[n] for n in _interleaved(list(_QUERIES))}


def oracle_sql() -> dict[str, str]:
    load_all_queries()
    order = _interleaved(list(_QUERIES))
    return {n: _ORACLES[n] for n in order if n in _ORACLES}


def scale_oracles() -> dict[str, Callable]:
    load_all_queries()
    return dict(_SCALE_ORACLES)


def oracle_scale_bounds() -> dict[str, tuple[str, int]]:
    load_all_queries()
    return dict(_ORACLE_SCALE_BOUNDS)
