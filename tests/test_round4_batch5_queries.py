"""Unit tests for the round-4 batch-5 additions (qe33 PageRank, qe34
EWMA trending, qm19 closed-form OLS, qc18 Z-order layout) — semantics
pinned on hand-built fixtures and structural invariants the oracle
parity harness can't express (mass conservation, convexity, layout
dominance).
"""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from ml_data_wrangler_spark.plans import registry


@pytest.fixture(scope="module")
def queries():
    return registry.queries()


def _write_events(spark, out_dir, rows):
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out_dir, "events.parquet")
    )


def test_qe33_mass_conserved_and_positive(spark, sf_dir, queries):
    rows = queries["qe33_event_type_pagerank"](spark, sf_dir).collect()
    assert rows, "no event types"
    total = sum(r.pagerank for r in rows)
    # damped PageRank with dangling redistribution conserves rank mass
    assert abs(total - 1.0) < 1e-4, total
    assert all(r.pagerank > 0 for r in rows)


def test_qe33_symmetric_chain_is_uniform(spark, tmp_path, queries):
    """A strictly alternating A→B→A→… stream from two users gives a
    symmetric 2-state chain: stationary ranks must both be 0.5."""
    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for user in (1, 2):
        for i in range(10):
            rows.append(
                (
                    eid,
                    base + dt.timedelta(minutes=eid),
                    user,
                    "A" if i % 2 == 0 else "B",
                    1.0,
                    "{}",
                )
            )
            eid += 1
    _write_events(spark, str(tmp_path), rows)
    out = {
        r.event_type: r.pagerank
        for r in queries["qe33_event_type_pagerank"](
            spark, str(tmp_path)
        ).collect()
    }
    assert out == {"A": 0.5, "B": 0.5}, out


def test_qe34_ewma_is_convex_and_ratio_consistent(spark, sf_dir, queries):
    """The normalized decayed average must lie within [min, max] of
    the trailing 14-day observed values, and trend_ratio must equal
    n_events / ewma (up to the two independent roundings)."""
    rows = queries["qe34_ewma_trending"](spark, sf_dir).collect()
    assert rows
    series: dict[str, dict[dt.date, int]] = {}
    for r in rows:
        series.setdefault(r.event_type, {})[r.day] = r.n_events
    for r in rows:
        window = [
            n
            for d, n in series[r.event_type].items()
            if 0 <= (r.day - d).days <= 13
        ]
        assert min(window) - 1e-3 <= r.ewma <= max(window) + 1e-3, r
        assert abs(r.trend_ratio - r.n_events / r.ewma) < 1e-4, r


def test_qm19_recovers_exact_linear_series(spark, tmp_path, queries):
    """Daily counts following y = 3 + 2x exactly must fit slope 2,
    intercept 3, R² = 1; a single-day series reports the 0.0 guards."""
    base = dt.datetime(2024, 3, 1, 12, 0)
    rows = []
    eid = 0
    for i in range(6):  # type "lin": 3 + 2i events on day i
        for _ in range(3 + 2 * i):
            rows.append(
                (eid, base + dt.timedelta(days=i), 10, "lin", 1.0, "{}")
            )
            eid += 1
    for _ in range(4):  # type "one": a single day → varx = 0 guards
        rows.append((eid, base, 11, "one", 1.0, "{}"))
        eid += 1
    _write_events(spark, str(tmp_path), rows)
    out = {
        r.event_type: r
        for r in queries["qm19_ols_daily_trend"](spark, str(tmp_path)).collect()
    }
    lin = out["lin"]
    assert (lin.n_days, lin.slope, lin.intercept, lin.r2) == (6, 2.0, 3.0, 1.0)
    one = out["one"]
    assert (one.n_days, one.slope, one.intercept, one.r2) == (1, 0.0, 0.0, 0.0)


def test_qc18_zorder_bounds_both_dimensions(spark, sf_dir, queries):
    rows = {
        r.layout: r for r in queries["qc18_zorder_layout"](spark, sf_dir).collect()
    }
    lin, zo = rows["linear"], rows["zorder"]
    # both layouts shard the same rows
    from ml_data_wrangler_spark.plans._util import t

    n = t(spark, sf_dir, "lineitem").count()
    assert lin.n_rows == zo.n_rows == n
    # linear layout prunes perfectly on its own sort key …
    assert lin.files_per_price_probe == 1.0
    # … but a probe on the other dimension scans every file
    assert lin.files_per_qty_probe == lin.n_files
    # Z-order strictly beats linear on the non-sort dimension and
    # keeps both probe costs below full scan
    assert zo.files_per_qty_probe < lin.files_per_qty_probe
    assert zo.files_per_qty_probe < zo.n_files
    assert zo.files_per_price_probe < zo.n_files
