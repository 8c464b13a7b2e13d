"""Pin bm25_rankings' round-13 GEMM scoring kernel bit-identical to
the broadcast-join path it replaced (kept verbatim as the over-budget
fallback), on real fixture data AND on tie/edge fixtures.

The kernel computes S = W_postings @ Q_presence in float64 — exact for
integer micro-quantized weights under 2^53 — and emits chunk-local
top-k under the final (s DESC, cand_id ASC) total order. The fallback
is forced through the max_query_rows / max_query_cells caps, so both
physical strategies run the same query over the same data and must
agree row-for-row.
"""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("top", [3, 20])
def test_bm25_kernel_matches_join_path_on_fixture(spark, top):
    from ml_data_wrangler_spark.plans.text_queries import bm25_rankings

    kernel = _rows(bm25_rankings(spark, SF_DIR, top))
    joined = _rows(bm25_rankings(spark, SF_DIR, top, max_query_rows=0))
    assert kernel == joined
    assert len(kernel) > 0  # the fixture genuinely exercises both


def test_bm25_kernel_cell_cap_falls_back(spark):
    """The tokens×queries presence-cell budget independently forces
    the fallback (a tall-but-narrow query set can pass the row cap and
    still blow the dense matrix)."""
    from ml_data_wrangler_spark.plans.text_queries import bm25_rankings

    kernel = _rows(bm25_rankings(spark, SF_DIR, 3))
    celled = _rows(bm25_rankings(spark, SF_DIR, 3, max_query_cells=1))
    assert kernel == celled


def test_bm25_kernel_chunking_is_boundary_exact(spark, tmp_path):
    """Tie-heavy micro-corpus, scored with chunk_cells=1 so every
    candidate chunk holds ONE candidate — chunk-local top-k must still
    merge to the identical global ranking (score ties broken by
    cand_id ASC across chunk boundaries).

    Construction: doc 0 is the only query (id % 20 == 0); docs 1/2/21
    repeat the same two tokens so several candidates tie on s, and doc
    40 shares a token with nothing (no candidacy for it vs some).
    """
    import pandas as pd

    from ml_data_wrangler_spark.plans.text_queries import bm25_rankings

    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 21, 40],
            "text": [
                "alpha beta gamma",
                "alpha beta",
                "alpha beta",
                "beta alpha",
                "delta epsilon",
            ],
            "lang": ["en"] * 5,
            "n_chars": [16, 10, 10, 10, 13],
        }
    )
    sf = tmp_path / "bm25_ties"
    sf.mkdir()
    spark.createDataFrame(docs).write.parquet(str(sf / "documents.parquet"))

    joined = _rows(bm25_rankings(spark, str(sf), 3, max_query_rows=0))
    for cc in (1, 4_000_000):  # one-candidate chunks and one big chunk
        kernel = _rows(bm25_rankings(spark, str(sf), 3, chunk_cells=cc))
        assert kernel == joined
    # sanity: the query doc ranks tied candidates by cand_id ASC
    by_query = [r for r in joined if r[0] == 0]
    assert [r[1] for r in sorted(by_query, key=lambda r: r[2])][:2] == [1, 2]
    # also pin the fixture-scale chunked form
    full = _rows(bm25_rankings(spark, SF_DIR, 3, chunk_cells=64))
    assert full == _rows(bm25_rankings(spark, SF_DIR, 3))


def test_bm25_kernel_empty_query_side(spark, tmp_path):
    """No doc_id % 20 == 0 → empty result with the full schema (the
    old join-with-empty behavior)."""
    import pandas as pd

    from ml_data_wrangler_spark.plans.text_queries import bm25_rankings

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["alpha beta", "alpha", "beta"],
            "lang": ["en"] * 3,
            "n_chars": [10, 5, 4],
        }
    )
    sf = tmp_path / "bm25_noq"
    sf.mkdir()
    spark.createDataFrame(docs).write.parquet(str(sf / "documents.parquet"))

    out = bm25_rankings(spark, str(sf), 3)
    assert out.columns == ["query_id", "cand_id", "rnk", "s"]
    assert out.count() == 0
