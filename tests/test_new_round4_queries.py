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
    from ml_data_wrangler_spark.plans.vector_ml_queries import (
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


def test_qe28_psi_zero_on_identical_distributions(spark):
    """Two periods with identical binned value histograms → every PSI
    term is ln(1) · 0 = 0 exactly, so psi_nano = 0 and no drift."""
    import datetime as dt

    ref = dt.datetime(2024, 1, 5)
    new = dt.datetime(2024, 1, 20)
    rows = []
    for i, v in enumerate([10.0, 60.0, 110.0, 260.0] * 5):
        rows.append((2 * i, ref, 1, "click", v, "{}"))
        rows.append((2 * i + 1, new, 1, "click", v, "{}"))
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    cut = F.lit("2024-01-16 00:00:00").cast("timestamp")
    e = ev.select(
        "event_type",
        (F.col("ts") >= cut).alias("recent"),
        F.least(F.floor(F.col("value") / 50.0).cast("long"), F.lit(9)).alias("bin"),
    )
    counts = e.groupBy("event_type", "bin").agg(
        F.sum(F.when(~F.col("recent"), 1).otherwise(0)).alias("c_ref"),
        F.sum(F.when(F.col("recent"), 1).otherwise(0)).alias("c_new"),
    )
    tot = counts.groupBy("event_type").agg(
        F.sum("c_ref").alias("n_ref"), F.sum("c_new").alias("n_new")
    )
    p = (F.col("c_ref") + 1.0) / (F.col("n_ref") + 10.0)
    q = (F.col("c_new") + 1.0) / (F.col("n_new") + 10.0)
    term = F.round((p - q) * F.log(p / q) * 1e9).cast("long")
    psi = (
        counts.join(tot, "event_type")
        .select(term.alias("t"))
        .agg(F.sum("t"))
        .collect()[0][0]
    )
    assert psi == 0


def test_qe29_path_construction(spark):
    """Events 40 min apart split sessions; within-session order is by
    (ts, event_id)."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, 1, t0, "view"),
        (2, 1, t0 + dt.timedelta(minutes=5), "click"),
        (3, 1, t0 + dt.timedelta(minutes=50), "purchase"),  # new session
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    prev_ts = F.lag("ts").over(w)
    boundary = F.when(
        prev_ts.isNull()
        | (F.unix_micros("ts") - F.unix_micros(prev_ts) > 30 * 60 * 1_000_000),
        1,
    ).otherwise(0)
    paths = (
        ev.withColumn("boundary", boundary)
        .withColumn("session_no", F.sum("boundary").over(run))
        .groupBy("user_id", "session_no")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type"))),
                    lambda s: s["event_type"],
                ),
                ">",
            ).alias("path")
        )
        .collect()
    )
    assert sorted(r["path"] for r in paths) == ["purchase", "view>click"]


def test_qm17_splits_are_disjoint_and_exhaustive(spark, sf_dir):
    from ml_data_wrangler_spark.operators.curation import hash_split
    from ml_data_wrangler_spark.plans._util import t as _t

    docs = _t(spark, sf_dir, "documents")
    d = hash_split(
        docs, id_col="doc_id", fractions={"train": 0.8, "val": 0.1, "test": 0.1}
    )
    counts = {r["split"]: r["n"] for r in d.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == docs.count()
    assert set(counts) <= {"train", "val", "test"}
    assert counts["train"] > counts.get("val", 0)  # 80/10/10 shape


def test_qd15_refinement_on_crafted_signatures(spark):
    """Two docs agreeing on exactly hashes 0..7 (one full (16,8) band)
    must collide at (16,8) AND therefore at (32,4); agreeing only on
    hashes 0..3 collides at (32,4) but NOT (16,8)."""
    sig_base = list(range(1000, 1128))

    def variant(agree_n):
        out = list(sig_base)
        for i in range(agree_n, 128):
            out[i] = -out[i]
        return out

    rows = [
        (1, sig_base),
        (2, variant(8)),   # agrees on first 8 components
        (3, variant(4)),   # agrees on first 4 components
    ]
    sigs = spark.createDataFrame(rows, "doc_id long, sig array<bigint>")
    sa = sigs.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"))
    pairs = spark.createDataFrame([(1, 2), (1, 3)], "doc_a long, doc_b long")

    def caught(bands, r):
        return F.exists(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda i: F.slice("sig_a", i * r + 1, r) == F.slice("sig_b", i * r + 1, r),
        )

    got = {
        (r["doc_a"], r["doc_b"]): (r["c32"], r["c16"])
        for r in pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", caught(32, 4).alias("c32"), caught(16, 8).alias("c16"))
        .collect()
    }
    assert got[(1, 2)] == (True, True)
    assert got[(1, 3)] == (True, False)  # refinement: c16 ⟹ c32, not vice versa


def test_qm18_calibration_spreads_on_separable_fixture(spark):
    """With a feature that separates the classes, a longer GD run
    (25 steps — eta 0.1 needs ~12 to push sigma past the 0.4/0.6 bin
    edges) produces predictions in more than one calibration bin,
    and each populated bin's observed rate tracks its predicted
    mass."""
    rows = [(1.0, 1.0, 0.0, 0.0)] * 30 + [(0.0, -1.0, 0.0, 0.0)] * 30
    feats = spark.createDataFrame(
        rows, "y double, x1 double, x2 double, x3 double"
    )
    from ml_data_wrangler_spark.plans.ml_queries import (
        _logreg_weights,
        _logreg_z,
    )

    w, _ = _logreg_weights(spark, feats, steps=25)
    p = F.round(1.0 / (1.0 + F.exp(-_logreg_z())), 6) + F.lit(0.0)
    scored = feats.crossJoin(F.broadcast(w)).select(
        "y", F.least(F.floor(p * 5).cast("long"), F.lit(4)).alias("bin")
    )
    bins = {
        r["bin"]: (r["n"], r["pos"])
        for r in scored.groupBy("bin")
        .agg(F.count("*").alias("n"), F.sum("y").alias("pos"))
        .collect()
    }
    assert len(bins) >= 2  # separable signal → spread
    hi, lo = max(bins), min(bins)
    assert bins[hi][1] / bins[hi][0] > bins[lo][1] / bins[lo][0]


def test_qe24_qe30_constant_series_yield_zero_not_nan(spark, tmp_path):
    """A constant daily series has zero variance — the z-score and
    ACF guards must emit 0.0, never NaN/Infinity (the 100 TB
    discrete-value reality the synthetic fixture can't produce)."""
    import datetime as dt
    import math
    import os

    base = dt.datetime(2024, 1, 1)
    rows = [
        (d * 10 + i, base + dt.timedelta(days=d, minutes=i), 1, "ping", 1.0, "{}")
        for d in range(5)
        for i in range(3)  # exactly 3 events every day
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    ev.write.parquet(os.path.join(sf, "events.parquet"))
    from ml_data_wrangler_spark.plans.registry import queries

    z = queries()["qe24_global_volume_outliers"](spark, sf).collect()
    assert z and all(r["z_score"] == 0.0 and not r["is_anomaly"] for r in z)
    acf = queries()["qe30_daily_autocorrelation"](spark, sf).collect()
    assert acf and all(
        r["acf"] == 0.0 and not math.isnan(r["acf"]) for r in acf
    )
