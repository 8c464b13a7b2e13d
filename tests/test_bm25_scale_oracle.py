"""qt19's and qv20's Python scale-oracles (DuckDB tf/embedding
prologue + numpy GEMM BM25 kernel and sequential-fold cosine) are
independent implementations of their SQL oracles' value definitions.
Pinning them byte-identical on the real fixture verifies the 6× scale
tier (where the SQL scoring fan-out spills 40-80 GB of aggregate input
and died twice in full sweeps) by transitivity against the SQL oracle
the driver gate runs at sf0.01."""

from __future__ import annotations

import pytest

from ml_data_wrangler_spark.plans import registry
from tests.oracle_harness import compare, duckdb_connection, run_oracle


@pytest.mark.parametrize(
    "qname", ["qt19_bm25_retrieval", "qv20_hybrid_rrf_fusion"]
)
def test_scale_oracle_equals_sql_oracle(sf_dir, qname):
    con = duckdb_connection(sf_dir)
    sql = registry.oracle_sql()[qname]
    py = registry.scale_oracles()[qname]
    o_cols, o_rows = run_oracle(con, sql)
    p_cols, p_rows = py(con)
    assert len(p_rows) > 0  # fixture must exercise the kernel
    assert compare(qname, p_cols, p_rows, o_cols, o_rows) == []


@pytest.mark.parametrize(
    "qname", ["qt19_bm25_retrieval", "qv20_hybrid_rrf_fusion"]
)
def test_scale_bound_registered(qname):
    """Bound must sit ABOVE the driver-gate tiers (sf0.1 = 5k
    documents) so the SQL oracle still gates them, and BELOW the 6×
    tier (30k documents) so the sweep switches."""
    bounds = registry.oracle_scale_bounds()
    tbl, max_rows = bounds[qname]
    assert tbl == "documents"
    assert 5_000 < max_rows < 30_000
