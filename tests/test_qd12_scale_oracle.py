"""qd12's sliced scale-oracle (the directed containment aggregate run
as _QD12_SLICES src-partitioned slices) must be row-identical to the
plain SQL oracle wherever both are feasible. The plain oracle's
directed posting join exhausted DuckDB's disk spill at the 32× tier
(SCALE_SWEEP_r09_32x_batch2.log: "No space left on device" past
~60 GB of temp) while each src-slice bounds the join intermediate and
aggregate keyspace at ~1/K — same SQL text, partitioned output
keyspace, zero semantic change. Pinning slice-union == plain on the
real fixture verifies the 32× tier by transitivity against the SQL
oracle the driver gate runs at sf0.01."""

from __future__ import annotations

import pytest

from ml_data_wrangler_spark.plans import registry
from tests.oracle_harness import compare, duckdb_connection, run_oracle


@pytest.fixture(scope="module")
def qname():
    return "qd12_containment_pairs"


def test_scale_oracle_equals_sql_oracle(sf_dir, qname):
    """Slice-union must reproduce the plain oracle bit-for-bit."""
    con = duckdb_connection(sf_dir)
    sql = registry.oracle_sql()[qname]
    py = registry.scale_oracles()[qname]
    o_cols, o_rows = run_oracle(con, sql)
    p_cols, p_rows = py(con)
    assert len(p_rows) > 0
    assert compare(qname, p_cols, p_rows, o_cols, o_rows) == []


def test_slice_count_irrelevant(sf_dir, qname, monkeypatch):
    """The output must not depend on K — any complete set of
    `src % K = i` predicates partitions the keyspace. Run with a
    deliberately odd K that cannot align with the fixture's doc_id
    layout."""
    import ml_data_wrangler_spark.plans.dedup_queries as dq

    con = duckdb_connection(sf_dir)
    o_cols, o_rows = run_oracle(con, registry.oracle_sql()[qname])
    monkeypatch.setattr(dq, "_QD12_SLICES", 3)
    p_cols, p_rows = dq._qd12_scale_oracle(con)
    assert compare(qname, p_cols, p_rows, o_cols, o_rows) == []


def test_slices_complete_under_negative_ids(qname):
    """DuckDB `%` returns negative remainders, so a naive
    `doc_id % K = i` partition silently drops every negative-id row
    (r09 ADVICE) — the sign-safe residue must keep slice-union ==
    plain on a corpus with negative doc_ids."""
    import duckdb

    import ml_data_wrangler_spark.plans.dedup_queries as dq

    con = duckdb.connect()
    base = "alpha beta gamma delta epsilon zeta eta theta"
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        f"(-7, '{base} one'), (-3, '{base} one'), "
        f"(2, '{base} two'), (5, '{base} two'), (9, 'unrelated text entirely')"
        ") AS t(doc_id, text)"
    )
    o_cols, o_rows = run_oracle(con, registry.oracle_sql()[qname])
    assert any(r[0] < 0 for r in o_rows), "fixture must emit negative-src pairs"
    p_cols, p_rows = dq._qd12_scale_oracle(con)
    assert compare(qname, p_cols, p_rows, o_cols, o_rows) == []


def test_scale_bound_registered(qname):
    """The bound must sit ABOVE the 16× step-up tier (80k documents —
    the plain oracle still completed there in 109 s) and AT/BELOW the
    32× tier (160k documents, where it died on disk), so each tier
    runs the cheapest oracle that is exact."""
    bounds = registry.oracle_scale_bounds()
    tbl, max_rows = bounds[qname]
    assert tbl == "documents"
    assert 80_000 <= max_rows < 160_000
