"""Sketch-based scale-path queries: qe07/qe08 carry their own
bounded-error contract in-row (the ``approx_ok`` boolean the oracle
pins TRUE) — these tests assert the contract holds and the exact side
agrees with independently computed duals."""

from __future__ import annotations

from pyspark.sql import functions as F

from ml_data_wrangler_spark.plans.registry import queries


def test_approx_dau_contract_and_exact_side(spark, sf_dir):
    q = queries()
    exact = {r["day"]: r["dau"] for r in q["qe02_daily_active_users"](spark, sf_dir).collect()}
    rows = q["qe07_approx_distinct_users"](spark, sf_dir).collect()
    assert {r["day"] for r in rows} == set(exact)
    for r in rows:
        # exact side must equal the exact dual; sketch must sit inside
        # its own 3-sigma band (the hash-checked boolean)
        assert r["dau"] == exact[r["day"]]
        assert r["approx_ok"] is True


def test_approx_quantiles_contract_and_exact_side(spark, sf_dir):
    q = queries()
    got = {r["event_type"]: r for r in q["qe08_approx_value_quantiles"](spark, sf_dir).collect()}
    from ml_data_wrangler_spark.sources.readers import read_table

    events = read_table(spark, sf_dir, "events")
    expected = {
        r["event_type"]: r["b"]
        for r in events.groupBy("event_type")
        .agg(F.expr("percentile(value, array(0.5D, 0.9D, 0.99D))").alias("b"))
        .collect()
    }
    assert set(got) == set(expected)
    for et, r in got.items():
        for i, name in enumerate(["p50", "p90", "p99"]):
            assert abs(r[name] - expected[et][i]) < 1e-3, (et, name)
        # the sketch's rank-error contract (|measured rank − p| ≤ 0.05)
        assert r["approx_ok"] is True
