"""qd17's color-triple graph partitioning (Suri & Vassilvitskii,
WWW 2011) must be p-independent: the corner-color-multiset rule keys
every triangle to exactly one reducer for ANY color count, so forcing
p=1 (one reducer, the whole graph), an odd p=3, and the p=16 cap must
all reproduce the SQL oracle's rows — this is what licenses the
adaptive _qd17_pick_colors (gate tiers run p=1; the 16× and 32× tiers
both land the p=16 cap now that the single-long replica pack keeps
the _QD17_FANOUT_ROWS byte budget satisfied at 32×) while keeping one
kernel at every tier (the qm09 dispatch principle)."""

from __future__ import annotations

import pytest

from ml_data_wrangler_spark.plans import registry
from tests.oracle_harness import (
    compare,
    duckdb_connection,
    run_oracle,
    run_spark_query,
)


@pytest.mark.parametrize("p", [1, 3, 16])
def test_color_count_independent(spark, sf_dir, p, monkeypatch):
    import ml_data_wrangler_spark.plans.dedup_queries as dq

    monkeypatch.setattr(dq, "_qd17_pick_colors", lambda n: p)
    qname = "qd17_similarity_triangles"
    cols, rows = run_spark_query(spark, registry.queries()[qname], sf_dir)
    con = duckdb_connection(sf_dir)
    o_cols, o_rows = run_oracle(con, registry.oracle_sql()[qname])
    assert len(rows) > 0
    assert compare(qname, cols, rows, o_cols, o_rows) == []


def test_pick_colors_shape():
    from ml_data_wrangler_spark.plans.dedup_queries import (
        _QD17_COLORS_CAP,
        _qd17_pick_colors,
    )

    assert _qd17_pick_colors(0) == 1
    assert _qd17_pick_colors(112_000) == 2          # sf0.1 (measured |E|)
    assert _qd17_pick_colors(29_600_000) == _QD17_COLORS_CAP   # 16x
    # 32x: the single-long pack keeps the byte budget satisfied at the
    # full cap (r10's four-long rows clamped this tier to p=6)
    assert _qd17_pick_colors(118_500_000) == _QD17_COLORS_CAP
    assert _qd17_pick_colors(10**12) == 4            # parallelism floor
