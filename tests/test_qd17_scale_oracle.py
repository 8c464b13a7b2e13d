"""qd17's Python scale-oracle (DuckDB edge-list prologue + numpy
degree-ordered wedge-closure kernel) is an independent implementation
of the SQL oracle's value definition. Pinning the two byte-identical
on the real fixture verifies the 6× scale tier (where the SQL wedge
kernel exhausts temp disk and only the Python oracle is feasible) by
transitivity against the SQL oracle the driver gate runs at sf0.01."""

from __future__ import annotations

import pytest

from ml_data_wrangler_spark.plans import registry
from tests.oracle_harness import compare, duckdb_connection, run_oracle


@pytest.fixture(scope="module")
def qname():
    return "qd17_similarity_triangles"


def test_scale_oracle_equals_sql_oracle(sf_dir, qname):
    """numpy wedge-closure kernel must reproduce the SQL oracle
    bit-for-bit where both are feasible."""
    con = duckdb_connection(sf_dir)
    sql = registry.oracle_sql()[qname]
    py = registry.scale_oracles()[qname]
    o_cols, o_rows = run_oracle(con, sql)
    p_cols, p_rows = py(con)
    assert len(p_rows) > 0  # fixture must exercise the kernel
    assert compare(qname, p_cols, p_rows, o_cols, o_rows) == []


def test_scale_oracle_small_buffer_flush(sf_dir, qname, monkeypatch):
    """The chunked wedge buffer must produce identical results when it
    flushes on every source node (exercises the accumulate path that
    only multi-flush scale runs hit)."""
    import ml_data_wrangler_spark.plans.dedup_queries as dq

    con = duckdb_connection(sf_dir)
    py = registry.scale_oracles()[qname]
    base_cols, base_rows = py(con)
    # re-run with a tiny flush threshold by patching the module-level
    # constant the kernel reads
    monkeypatch.setattr(dq, "_QD17_FLUSH_ROWS", 1)
    small_cols, small_rows = py(con)
    assert base_cols == small_cols
    assert compare(qname, small_cols, small_rows, base_cols, base_rows) == []


def test_scale_oracle_proc_count_independent(sf_dir, qname, monkeypatch):
    """SPARK_GRAFT_QD17_ORACLE_PROCS forks the wedge closure across
    source-node residue classes (round 10, what makes 32×
    oracle-feasible) — partials are int64 bincounts, so any process
    count must reproduce the single-process result byte-for-byte."""
    con = duckdb_connection(sf_dir)
    py = registry.scale_oracles()[qname]
    monkeypatch.delenv("SPARK_GRAFT_QD17_ORACLE_PROCS", raising=False)
    base_cols, base_rows = py(con)
    monkeypatch.setenv("SPARK_GRAFT_QD17_ORACLE_PROCS", "3")
    par_cols, par_rows = py(con)
    assert base_cols == par_cols
    assert compare(qname, par_cols, par_rows, base_cols, base_rows) == []


def test_wedge_blocks_cover_all_pairs_bounded(monkeypatch):
    """Block-sliced wedge enumeration (the 32× OOM fix: a 15k-degree
    hub's one-shot triu was a 2.7 GB append) must emit exactly the
    naive triu pair set, each block within the cell budget."""
    import numpy as np

    import ml_data_wrangler_spark.plans.dedup_queries as dq

    monkeypatch.setattr(dq, "_QD17_NODE_BLOCK_CELLS", 7)
    for k in (0, 1, 2, 3, 5, 17):
        neigh = np.arange(100, 100 + k)
        got = set()
        for v, w in dq._qd17_wedge_blocks(neigh):
            assert len(v) <= max(7 // max(k, 1), 1) * k  # bounded-ish
            got.update(zip(v.tolist(), w.tolist()))
        ii, jj = np.triu_indices(k, 1)
        assert got == set(zip(neigh[ii].tolist(), neigh[jj].tolist()))


def test_scale_bound_registered(qname):
    """The feasibility bound must sit ABOVE the driver-gate tiers
    (sf0.1 = 5k documents) so the SQL oracle still gates them, and
    BELOW the 6× tier (30k documents) so the sweep switches — the
    round-6 sweep originally registered 50k from a misread table size
    and the SQL oracle then ran (and spilled 80 GB) at the scale
    tier."""
    bounds = registry.oracle_scale_bounds()
    tbl, max_rows = bounds[qname]
    assert tbl == "documents"
    assert 5_000 < max_rows < 30_000
