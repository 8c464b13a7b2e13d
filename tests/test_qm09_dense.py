"""qm09's adaptive physical strategy: the dense-GEMM path and the
sparse postings path are two PHYSICAL plans for one logical query, and
the Python scale-oracle is a third independent implementation of the
same value definition. These tests pin all three to byte-identical
results on the real fixture, so the 6× scale tier (where only
GEMM + scale-oracle are feasible) is verified by transitivity against
the SQL oracle that the driver gate runs at sf0.01."""

from __future__ import annotations

import pytest

from ml_data_wrangler_spark.plans import registry
from tests.oracle_harness import (
    compare,
    duckdb_connection,
    run_oracle,
    run_spark_query,
)


@pytest.fixture(scope="module")
def qname():
    return "qm09_tfidf_doc_pairs"


def _run(spark, sf_dir, qname):
    qs = registry.queries()
    return run_spark_query(spark, qs[qname], sf_dir)


def test_gemm_path_is_active_on_fixture(spark, sf_dir, qname):
    """The fixture's vocab (~31 tokens) must resolve to the dense
    path — otherwise the driver gate verifies a plan that never runs
    at the scale tier."""
    import ml_data_wrangler_spark.plans.ml_queries as mq

    qs = registry.queries()
    plan = (
        qs[qname](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "MapInPandas" in plan
    assert mq.QM09_DENSE_VOCAB_CAP >= 31


def test_gemm_equals_postings_path(spark, sf_dir, qname, monkeypatch):
    """Force the sparse postings plan by shrinking the dense caps and
    assert the two physical strategies return identical rows."""
    import ml_data_wrangler_spark.plans.ml_queries as mq

    cols_g, rows_g = _run(spark, sf_dir, qname)
    monkeypatch.setattr(mq, "QM09_DENSE_VOCAB_CAP", 0)
    cols_p, rows_p = _run(spark, sf_dir, qname)
    assert cols_g == cols_p
    assert compare(qname, cols_g, rows_g, cols_p, rows_p) == []


def test_scale_oracle_equals_sql_oracle(sf_dir, qname):
    """The Python scale-oracle (DuckDB prologue + numpy GEMM kernel)
    must reproduce the SQL oracle bit-for-bit where both are
    feasible."""
    con = duckdb_connection(sf_dir)
    sql = registry.oracle_sql()[qname]
    py = registry.scale_oracles()[qname]
    o_cols, o_rows = run_oracle(con, sql)
    p_cols, p_rows = py(con)
    assert compare(qname, p_cols, p_rows, o_cols, o_rows) == []


def test_scale_bound_registered(qname):
    """The feasibility bound must exist and sit ABOVE the driver-gate
    tiers (sf0.1 = 5k documents) so the SQL oracle still gates them,
    and BELOW the 6× tier (30k documents) so the sweep switches — the
    round-6 sweep originally registered 50k from a misread table size
    and the SQL oracle then ran (and spilled 80 GB) at the scale
    tier."""
    bounds = registry.oracle_scale_bounds()
    tbl, max_rows = bounds[qname]
    assert tbl == "documents"
    assert 5_000 < max_rows < 30_000
