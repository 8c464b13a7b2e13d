"""The generalized sliced exact-pair oracle (round 10, r09 verdict
item 5): qd02/qd03/qd06 share one Jaccard-pair SQL via
_jaccard_pairs_oracle_sql, and beyond the registered bound (the 64×
tier — 320k documents, where the plain join's aggregate state is the
oracle-side bottleneck) the SAME SQL runs as _PAIR_SLICES sign-safe
residue slices on a.doc_id. Slices partition the output keyspace by
doc_a, so the concatenation is the plain result exactly — pinned here
on the real fixture, which verifies the scale tiers by transitivity
against the SQL oracle the driver gate runs at sf0.01."""

from __future__ import annotations

import pytest

from ml_data_wrangler_spark.plans import registry
from tests.oracle_harness import compare, duckdb_connection, run_oracle

SLICED = [
    "qd02_ngram_jaccard_pairs",
    "qd03_minhash_near_dups",
    "qd06_prefix_jaccard_pairs",
]


@pytest.mark.parametrize("qname", SLICED)
def test_slice_union_equals_plain(sf_dir, qname):
    con = duckdb_connection(sf_dir)
    o_cols, o_rows = run_oracle(con, registry.oracle_sql()[qname])
    py = registry.scale_oracles()[qname]
    p_cols, p_rows = py(con)
    assert len(p_rows) > 0
    assert compare(qname, p_cols, p_rows, o_cols, o_rows) == []


def test_slice_count_irrelevant(sf_dir, monkeypatch):
    """Any K partitions the keyspace — run with an odd K that cannot
    align with the fixture's doc_id layout."""
    import ml_data_wrangler_spark.plans.dedup_queries as dq

    con = duckdb_connection(sf_dir)
    qname = SLICED[0]
    o_cols, o_rows = run_oracle(con, registry.oracle_sql()[qname])
    monkeypatch.setattr(dq, "_PAIR_SLICES", 5)
    p_cols, p_rows = registry.scale_oracles()[qname](con)
    assert compare(qname, p_cols, p_rows, o_cols, o_rows) == []


def test_slices_complete_under_negative_ids():
    """Sign-safe residues keep the partition complete on negative
    doc_ids (DuckDB `%` returns negative remainders — r09 ADVICE)."""
    import duckdb

    qname = SLICED[0]
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
    p_cols, p_rows = registry.scale_oracles()[qname](con)
    assert compare(qname, p_cols, p_rows, o_cols, o_rows) == []


def test_scale_bounds_above_gate_and_32x():
    """The plain SQL oracle stayed green (1042 s) at the 32× tier
    (160k documents) — the bound must keep it authoritative there and
    switch only at 64× (320k)."""
    bounds = registry.oracle_scale_bounds()
    for qname in SLICED:
        tbl, max_rows = bounds[qname]
        assert tbl == "documents"
        assert 160_000 <= max_rows < 320_000
