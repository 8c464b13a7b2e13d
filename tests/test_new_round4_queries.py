"""Unit tests for the round-4 continuation additions (qe24 rewrite
algebra, q34 merge branches, qv16 centroid assignment, qt17 novelty,
qe25 TWAP, qe27 growth classes, qj06 band join, qw11 deciles) on
hand-built fixtures — the oracle parity harness checks these against
DuckDB at the gate; these tests pin the SEMANTICS on inputs small
enough to verify by hand.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def test_qe24_integer_rewrite_matches_float_zscore():
    """(n·x − S)² > 4(nQ − S²) must agree with |z| > 2 computed in
    floats whenever z² is not razor-close to 4 (the rewrite is exact;
    the float path is the approximation)."""
    import random

    rng = random.Random(7)
    for _ in range(200):
        xs = [rng.randint(1, 10_000) for _ in range(rng.randint(3, 40))]
        n, s, q = len(xs), sum(xs), sum(x * x for x in xs)
        var_n2 = n * q - s * s
        if var_n2 == 0:
            continue
        mu = s / n
        sd = math.sqrt(var_n2) / n
        for x in xs:
            z = (x - mu) / sd
            exact = (n * x - s) ** 2 > 4 * var_n2
            if abs(z * z - 4.0) > 1e-9:
                assert exact == (abs(z) > 2.0), (xs, x, z)


def test_q34_merge_branches(spark):
    base = spark.createDataFrame(
        [(1, 100.0), (2, 50.0), (3, 7.5)], "c_custkey long, bal double"
    )
    delta = spark.createDataFrame(
        [(1, 25.0), (9, 10.0)], "c_custkey long, spend double"
    )
    b = base.select("c_custkey", F.col("bal").cast("decimal(12,2)").alias("bal")).alias("b")
    d = delta.select(
        "c_custkey", F.col("spend").cast("decimal(12,2)").alias("spend")
    ).alias("d")
    merged = (
        b.join(d, "c_custkey", "full_outer")
        .select(
            "c_custkey",
            F.when(F.col("b.bal").isNull(), F.col("d.spend"))
            .when(F.col("d.spend").isNull(), F.col("b.bal"))
            .otherwise(F.col("b.bal") + F.col("d.spend"))
            .cast("double")
            .alias("balance"),
            F.when(F.col("b.bal").isNull(), "inserted")
            .when(F.col("d.spend").isNull(), "unchanged")
            .otherwise("updated")
            .alias("action"),
        )
    )
    rows = {r["c_custkey"]: (r["balance"], r["action"]) for r in merged.collect()}
    assert rows[1] == (125.0, "updated")
    assert rows[2] == (50.0, "unchanged")
    assert rows[3] == (7.5, "unchanged")
    assert rows[9] == (10.0, "inserted")


def test_qv16_separable_labels_diagonal(spark):
    """Two orthogonal label clusters → confusion matrix is purely
    diagonal and mean_sim ≈ 1 within each cluster."""
    rows = [(i, [1.0, 0.0, 0.0, 0.0], 0) for i in range(5)] + [
        (i + 10, [0.0, 1.0, 0.0, 0.0], 1) for i in range(5)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    emb.createOrReplaceTempView("_qv16_fixture")
    from ml_data_wrangler_spark.functions.vectors import cosine_similarity

    dims = (
        emb.select("label", F.posexplode("embedding").alias("i", "x"))
        .groupBy("label", "i")
        .agg(F.avg("x").alias("dv"))
    )
    cent = (
        dims.groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "dv"))),
                lambda s: s["dv"],
            ).alias("cv")
        )
        .select(F.col("label").alias("cand"), "cv")
    )
    from pyspark.sql import Window as W

    scored = emb.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        "label",
        "cand",
        F.round(cosine_similarity(F.col("embedding"), F.col("cv")), 6).alias("sim"),
    )
    w = W.partitionBy("vec_id").orderBy(F.desc("sim"), "cand")
    pred = (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .groupBy("label", "cand")
        .count()
        .collect()
    )
    assert {(r["label"], r["cand"]): r["count"] for r in pred} == {
        (0, 0): 5,
        (1, 1): 5,
    }


def test_qt17_duplicate_pair_scores_one(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon zeta"),
            (3, "one two three four five six seven"),
        ],
        "doc_id long, text string",
    )
    from ml_data_wrangler_spark.functions.text import tokenize
    from ml_data_wrangler_spark.operators.dedup import _shingles_from_tokens

    sh = (
        docs.select("doc_id", tokenize(F.col("text")).alias("l"))
        .where(F.size("l") >= 5)
        .select(
            "doc_id",
            F.explode(F.array_distinct(_shingles_from_tokens(F.col("l"), 5))).alias("s"),
        )
    )
    dfreq = sh.groupBy("s").agg(F.count("*").alias("nd"))
    out = (
        sh.join(dfreq, "s")
        .groupBy("doc_id")
        .agg(
            (
                F.sum(F.when(F.col("nd") >= 2, 1).otherwise(0))
                / F.count("*")
            ).alias("frac")
        )
        .collect()
    )
    fracs = {r["doc_id"]: r["frac"] for r in out}
    assert fracs[1] == 1.0 and fracs[2] == 1.0 and fracs[3] == 0.0


def test_qe25_twap_weights_by_duration(spark):
    """value 10 held for 3s then value 0 held for 1s → TWAP 7.5,
    while the naive mean of observed values would be 5."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, t0, 10.0, 1),
        (1, t0 + dt.timedelta(seconds=3), 0.0, 2),
        (1, t0 + dt.timedelta(seconds=4), 99.0, 3),  # terminal: no interval
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, value double, event_id long"
    )
    from pyspark.sql import Window as W

    seq = (
        ev.select(
            "user_id",
            "value",
            "ts",
            F.lead("ts")
            .over(W.partitionBy("user_id").orderBy("ts", "event_id"))
            .alias("next_ts"),
        )
        .where(F.col("next_ts").isNotNull())
        .select(
            "user_id",
            F.col("value").cast("decimal(12,2)").alias("v"),
            (F.unix_micros("next_ts") - F.unix_micros("ts")).alias("dur_us"),
        )
    )
    out = (
        seq.groupBy("user_id")
        .agg(
            (
                F.sum(F.col("v") * F.col("dur_us")).cast("double")
                / F.sum("dur_us").cast("double")
            ).alias("twav")
        )
        .collect()
    )
    assert abs(out[0]["twav"] - 7.5) < 1e-9


def test_qe27_growth_classes(spark):
    """u1: day1 new, day2 retained, day9 resurrected (gap 7 > 3)."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base),
        (1, base + dt.timedelta(days=1)),
        (1, base + dt.timedelta(days=8)),
        (2, base + dt.timedelta(days=1)),
    ]
    ev = spark.createDataFrame(
        [(u, ts, i) for i, (u, ts) in enumerate(rows)],
        "user_id long, ts timestamp, event_id long",
    )
    from pyspark.sql import Window as W

    ud = ev.select(
        "user_id", F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).distinct()
    seq = ud.select(
        "user_id",
        "day",
        F.lag("day").over(W.partitionBy("user_id").orderBy("day")).alias("prev_day"),
    )
    gap = F.datediff("day", "prev_day")
    got = {
        (r["user_id"], str(r["day"])): r["cls"]
        for r in seq.select(
            "user_id",
            "day",
            F.when(F.col("prev_day").isNull(), "new")
            .when(gap <= 3, "retained")
            .otherwise("resurrected")
            .alias("cls"),
        ).collect()
    }
    assert got[(1, "2024-01-01")] == "new"
    assert got[(1, "2024-01-02")] == "retained"
    assert got[(1, "2024-01-09")] == "resurrected"
    assert got[(2, "2024-01-02")] == "new"


def test_qj06_each_event_matches_exactly_one_tier(spark, sf_dir):
    from ml_data_wrangler_spark.plans.registry import queries

    out = queries()["qj06_value_tier_band_join"](spark, sf_dir)
    total = out.agg(F.sum("n_events")).collect()[0][0]
    n_events = (
        spark.read.parquet(f"{sf_dir}/events.parquet").count()
    )
    assert total == n_events  # non-overlapping tiers cover the domain


def test_qw11_deciles_are_rank_equal(spark, sf_dir):
    from ml_data_wrangler_spark.plans.registry import queries

    rows = queries()["qw11_order_decile_profile"](spark, sf_dir).collect()
    assert [r["decile"] for r in rows] == list(range(1, 11))
    sizes = [r["n_orders"] for r in rows]
    assert max(sizes) - min(sizes) <= 1  # rank-equal buckets
    # value ranges must be non-overlapping and increasing
    for a, b in zip(rows, rows[1:]):
        assert a["max_price"] <= b["min_price"]


def test_qv17_lloyd_sse_nonincreasing(spark, sf_dir):
    """Lloyd's algorithm provably never increases SSE: total
    micro-quantized SSE after the update+reassign step must be <= the
    SSE of the initial assignment (up to quantization slack of one
    micro-unit per vector)."""
    from pyspark.sql import functions as F

    from ml_data_wrangler_spark.plans._util import t as _t
    from ml_data_wrangler_spark.plans.vector_queries import (
        _kmeans_assign,
        _kmeans_update,
    )

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    cent0 = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cand"), F.col("v").alias("cv")
    )
    a0 = _kmeans_assign(emb, cent0)
    sse0 = a0.agg(F.sum("d_micro")).collect()[0][0]
    a1 = _kmeans_assign(emb, _kmeans_update(a0))
    sse1 = a1.agg(F.sum("d_micro")).collect()[0][0]
    n = emb.count()
    assert sse1 <= sse0 + n  # one micro-unit rounding slack per vector


def test_qm16_gd_loss_decreases(spark, sf_dir):
    """Three GD steps from zero init must beat the zero-weight loss
    (which is exactly n·ln 2 in micronats up to rounding)."""
    import math

    from ml_data_wrangler_spark.plans.registry import queries

    row = queries()["qm16_logreg_gd"](spark, sf_dir).collect()[0]
    zero_loss = row["n_docs"] * round(math.log(2) * 1e6)
    assert row["loss_micronats"] < zero_loss
    assert row["n_docs"] > 0
