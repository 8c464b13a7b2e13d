"""Driver-contract smoke tests: entry() returns rows with a stable
schema; every queries() key with an oracle_sql() entry is consistent."""

from __future__ import annotations

import __spark_entry__ as entry_mod


def test_entry_runs(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["token", "n"]


def test_contract_consistency():
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 60
    # the non-oracle set is exactly the model-based/approximate ops
    rows_only = set(q) - set(o)
    # qe07/qe08 graduated to oracle-checked in round 2 (exact value +
    # bounded-error boolean the oracle pins TRUE)
    assert rows_only == {
        "qd03_minhash_near_dups",
        "qd04_simhash_buckets",
        "qd08_simhash_pairs",
        "qm03_lda_topics",
        "qm04_lda_coherence_sweep",
        "qm07_cv_coherence_sweep",
        "qv05_ivf_ann",
        "qv06_lsh_ann_pairs",
        "qv07_knn_vectorized",
        "qv08_tiered_cosine_pairs",
    }
