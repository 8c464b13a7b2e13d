"""qv01's Python scale-oracle (round 11): the SQL oracle's
MATERIALIZED |Q|×|C| scored stream spilled past the box's disk at the
64× tier (128k vectors — SCALE_SWEEP_r11_64x_vectors.log), so above
the registered bound the oracle changes ALGORITHM, not semantics:
numpy chunk-local top-5 with the engine kernels' exact fold/rounding/
tie discipline, merged exactly. Pinning it byte-identical to the SQL
oracle on the fixture licenses the 64× tier by transitivity."""

from __future__ import annotations

import pytest

from ml_data_wrangler_spark.plans import registry
from tests.oracle_harness import compare, duckdb_connection, run_oracle


@pytest.fixture(scope="module")
def qname():
    return "qv01_knn_bruteforce"


def test_scale_oracle_equals_sql_oracle(sf_dir, qname):
    con = duckdb_connection(sf_dir)
    o_cols, o_rows = run_oracle(con, registry.oracle_sql()[qname])
    p_cols, p_rows = registry.scale_oracles()[qname](con)
    assert len(p_rows) > 0
    assert compare(qname, p_cols, p_rows, o_cols, o_rows) == []


def test_scale_oracle_chunk_boundary_independent(sf_dir, qname, monkeypatch):
    """The chunk-local-top-5 + global-merge decomposition must be
    invariant to where chunk boundaries fall (a 3-row chunk forces
    many partial top-k merges on the fixture)."""
    import ml_data_wrangler_spark.plans.vector_queries as vq

    con = duckdb_connection(sf_dir)
    base_cols, base_rows = vq._qv01_scale_oracle(con)
    # a 3-row chunk forces every corpus block through a partial top-5
    # and exercises the global merge on real ties
    monkeypatch.setattr(vq, "_QV01_ORACLE_CHUNK", 3)
    tiny_cols, tiny_rows = vq._qv01_scale_oracle(con)
    assert base_cols == tiny_cols
    assert compare(qname, tiny_cols, tiny_rows, base_cols, base_rows) == []


def test_scale_bound_registered(qname):
    """Bound must sit above the 32× tier (64k vectors, SQL oracle ran
    green) and at/below the 64× tier (128k vectors, SQL oracle filled
    the disk)."""
    bounds = registry.oracle_scale_bounds()
    tbl, max_rows = bounds[qname]
    assert tbl == "embeddings"
    assert 64_000 < max_rows < 128_000
