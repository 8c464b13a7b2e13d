"""Sketch-based scale-path queries: approximate answers must track
their exact duals within the sketch's accuracy contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from ml_data_wrangler_spark.plans.registry import queries


def test_approx_dau_tracks_exact(spark, sf_dir):
    q = queries()
    exact = {r["day"]: r["dau"] for r in q["qe02_daily_active_users"](spark, sf_dir).collect()}
    approx = {
        r["day"]: r["approx_dau"]
        for r in q["qe07_approx_distinct_users"](spark, sf_dir).collect()
    }
    assert set(exact) == set(approx)
    for day, dau in exact.items():
        # rsd=0.01 → generous 5% acceptance band
        assert abs(approx[day] - dau) <= max(2, 0.05 * dau)


def test_approx_quantiles_bracket_exact(spark, sf_dir):
    q = queries()
    approx = {r["event_type"]: r for r in q["qe08_approx_value_quantiles"](spark, sf_dir).collect()}
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    from ml_data_wrangler_spark.sources.readers import read_table
    events = read_table(spark, sf_dir, "events")
    # percentile_approx guarantees RANK accuracy (returns a real
    # element within ±1/accuracy of the target rank), so assert each
    # approx value falls inside the exact value bracket around the
    # target rank — not value-space distance (meaningless in the tail).
    brackets = (
        events.groupBy("event_type")
        .agg(
            F.expr(
                "percentile(value, array(0.49, 0.51, 0.89, 0.91, 0.985, 0.995))"
            ).alias("b")
        )
        .collect()
    )
    for r in brackets:
        a = approx[r["event_type"]]
        lo_hi = [(r["b"][0], r["b"][1]), (r["b"][2], r["b"][3]), (r["b"][4], r["b"][5])]
        for name, (lo, hi) in zip(["p50", "p90", "p99"], lo_hi):
            assert lo - 1e-4 <= a[name] <= hi + 1e-4, (name, lo, a[name], hi)
