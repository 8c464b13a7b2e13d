"""qd07's Python scale-oracle (DuckDB edge-list prologue + union-find)
is an independent implementation of the SQL oracle's value definition
(component minimum doc_id). Pinning the two byte-identical on the real
fixture verifies the 16× step-up tier (where the SQL recursive closure
materializes Σ|component|² reachability rows — measured 843 s of pure
oracle cost against a 61 s Spark side) by transitivity against the SQL
oracle the driver gate runs at sf0.01."""

from __future__ import annotations

import pytest

from ml_data_wrangler_spark.plans import registry
from tests.oracle_harness import compare, duckdb_connection, run_oracle


@pytest.fixture(scope="module")
def qname():
    return "qd07_neardup_clusters"


def test_scale_oracle_equals_sql_oracle(sf_dir, qname):
    """Union-find labeling must reproduce the recursive-closure SQL
    oracle bit-for-bit where both are feasible."""
    con = duckdb_connection(sf_dir)
    sql = registry.oracle_sql()[qname]
    py = registry.scale_oracles()[qname]
    o_cols, o_rows = run_oracle(con, sql)
    p_cols, p_rows = py(con)
    assert len(p_rows) > 0
    # the fixture must exercise real merges, not just singletons
    assert any(d != c for d, c in p_rows), "no non-trivial clusters in fixture"
    assert compare(qname, p_cols, p_rows, o_cols, o_rows) == []


def test_union_find_transitivity_on_synthetic_chain(qname, monkeypatch):
    """A chain a-b, b-c, plus disjoint d-e must collapse to min-id
    labels {a,b,c}→a, {d,e}→d regardless of edge order — the property
    the recursive SQL computes via full closure."""
    import ml_data_wrangler_spark.plans.dedup_queries as dq

    class FakeCon:
        def execute(self, sql):
            self._sql = sql
            return self

        def fetchall(self):
            if "SELECT doc_a, doc_b FROM jac" in self._sql:
                return [(30, 20), (10, 20), (50, 40)]
            return [(10,), (20,), (30,), (40,), (50,), (60,)]

    cols, rows = dq._qd07_scale_oracle(FakeCon())
    assert cols == ["doc_id", "cluster_id"]
    assert dict(rows) == {10: 10, 20: 10, 30: 10, 40: 40, 50: 40, 60: 60}


def test_scale_bound_registered(qname):
    """The bound must sit ABOVE the 6× tier (30k documents — the SQL
    closure was still fine there, 27 s) and BELOW the 16× step-up tier
    (80k documents, where it took 843 s), so each tier runs the
    cheapest oracle that is exact."""
    bounds = registry.oracle_scale_bounds()
    tbl, max_rows = bounds[qname]
    assert tbl == "documents"
    assert 30_000 <= max_rows < 80_000
