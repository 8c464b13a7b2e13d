"""The correctness gate, locally: every oracle-backed query must match
DuckDB exactly; every rows-only query must at least run and return a
stable schema."""

from __future__ import annotations

import pytest

from ml_data_wrangler_spark.plans import registry
from tests.oracle_harness import (
    compare,
    duckdb_connection,
    run_oracle,
    run_spark_query,
)

QUERIES = registry.queries()
ORACLES = registry.oracle_sql()
ORACLE_NAMES = sorted(ORACLES)
ROWS_ONLY_NAMES = sorted(set(QUERIES) - set(ORACLES))


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_connection(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity(spark, sf_dir, con, name):
    cols, rows = run_spark_query(spark, QUERIES[name], sf_dir)
    o_cols, o_rows = run_oracle(con, ORACLES[name])
    problems = compare(name, cols, rows, o_cols, o_rows)
    assert not problems, f"{name}: " + " | ".join(problems)


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_runs(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    n = df.count()
    assert n >= 0
    assert len(df.columns) > 0
