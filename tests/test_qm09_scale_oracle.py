"""qm09's Python scale-oracle fork (round 11): the chunked-GEMM pair
kernel decomposes exactly by 512-row chunk, so forking the chunk loop
across SPARK_GRAFT_QM09_ORACLE_PROCS workers (what makes the oracle
64×-eligible — it measured 1345.9 s single-process at 32× because the
image's OpenBLAS is built MAX_THREADS=2) must reproduce the
single-process result byte-for-byte for any worker count: each chunk's
GEMM/rounding/pruning touches only its own rows, and the parent's
merge re-applies the same deterministic (-cosine, doc_a, doc_b) sort
over the union of partials."""

from __future__ import annotations

import pytest

from ml_data_wrangler_spark.plans import registry
from tests.oracle_harness import compare, duckdb_connection, run_oracle


@pytest.fixture(scope="module")
def qname():
    return "qm09_tfidf_doc_pairs"


def test_scale_oracle_equals_sql_oracle(sf_dir, qname):
    """The numpy GEMM kernel must reproduce the SQL oracle bit-for-bit
    where both are feasible (transitivity licenses it above the
    feasibility bound)."""
    con = duckdb_connection(sf_dir)
    o_cols, o_rows = run_oracle(con, registry.oracle_sql()[qname])
    p_cols, p_rows = registry.scale_oracles()[qname](con)
    assert len(p_rows) > 0
    assert compare(qname, p_cols, p_rows, o_cols, o_rows) == []


def test_scale_oracle_proc_count_independent(sf_dir, qname, monkeypatch):
    """Any SPARK_GRAFT_QM09_ORACLE_PROCS must be bit-equal to the
    single-process run. 3 workers over the fixture's chunk count also
    exercises an idle-worker residue class (fixture docs < 1024 → ≤2
    chunks), pinning the empty-partial merge path."""
    con = duckdb_connection(sf_dir)
    py = registry.scale_oracles()[qname]
    monkeypatch.delenv("SPARK_GRAFT_QM09_ORACLE_PROCS", raising=False)
    base_cols, base_rows = py(con)
    monkeypatch.setenv("SPARK_GRAFT_QM09_ORACLE_PROCS", "3")
    par_cols, par_rows = py(con)
    assert base_cols == par_cols
    assert compare(qname, par_cols, par_rows, base_cols, base_rows) == []


def test_chunk_decomposition_is_exact(sf_dir, qname, monkeypatch):
    """Force multiple chunks through the residue dispatch on the small
    fixture by shrinking nothing — instead run procs > 1 with the
    worker invoked directly per residue and assert the union of
    partials equals the single-process winner list BEFORE the top-20
    cut (the merge invariant the fork relies on)."""
    import ml_data_wrangler_spark.plans.ml_queries as mq

    con = duckdb_connection(sf_dir)
    monkeypatch.delenv("SPARK_GRAFT_QM09_ORACLE_PROCS", raising=False)
    # run the prologue by calling the oracle once, then replay the
    # worker decomposition on the arrays it staged
    mq._qm09_scale_oracle(con)  # sanity: runs clean
    # stage arrays manually (the oracle clears _QM09_WORK on exit)
    import numpy as np

    w_rows = con.execute(
        mq._QM09_W_SQL + "\nSELECT doc_id, token, df, wu FROM w"
    ).fetchall()
    vocab = sorted({tok for _, tok, dfv, _ in w_rows if dfv >= 2})
    idx = {tok: i for i, tok in enumerate(vocab)}
    by_doc: dict[int, list] = {}
    norm_u2: dict[int, int] = {}
    for doc, tok, dfv, wu in w_rows:
        norm_u2[doc] = norm_u2.get(doc, 0) + wu * wu
        if dfv >= 2:
            by_doc.setdefault(doc, []).append((idx[tok], wu))
    ids = np.array(sorted(by_doc), dtype=np.int64)
    mat = np.zeros((len(ids), len(vocab)), dtype=np.float64)
    bin_mat = np.zeros((len(ids), len(vocab)), dtype=np.float32)
    for i, doc in enumerate(ids):
        for j, wu in by_doc[int(doc)]:
            mat[i, j] = float(wu)
            bin_mat[i, j] = 1.0
    nrm = np.sqrt(np.array([float(norm_u2[int(d)]) for d in ids]))
    mq._QM09_WORK.update(mat=mat, bin_mat=bin_mat, nrm=nrm, ids=ids)
    try:
        single = mq._qm09_gemm_worker((0, 1))
        parts = [mq._qm09_gemm_worker((i, 4)) for i in range(4)]
    finally:
        mq._QM09_WORK.clear()
    union = [w for part in parts for w in part]
    assert sorted(single) == sorted(union)
    assert len(single) > 0
