"""Event/time-series queries over the `events` table: tumbling and
sliding windows, sessionization, JSON extraction, distinct users.

These are the BATCH duals of the Structured Streaming operators in
ml_data_wrangler_spark/streaming/ — same window semantics, so the
oracle that checks these also validates the streaming windowing logic
(tests/test_streaming.py asserts streaming == batch on the same input).
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ml_data_wrangler_spark.plans._util import dbl, money, t
from ml_data_wrangler_spark.plans.registry import query


@query(
    "qe01_hourly_by_type",
    oracle="""
SELECT date_trunc('hour', ts) AS win_start, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
""",
)
def qe01(spark, sf_dir):
    """Tumbling 1-hour window per event type — F.window() (the same
    operator Structured Streaming uses) with epoch-aligned buckets."""
    return (
        t(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            dbl(F.sum(money("value"))).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("win_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@query(
    "qe02_daily_active_users",
    oracle="""
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events
GROUP BY 1
""",
)
def qe02(spark, sf_dir):
    """Daily active users — exact distinct per day (HLL sketch is the
    100 TB variant; exact is the oracle-checkable one)."""
    return (
        t(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.countDistinct("user_id").alias("dau"),
            F.count("*").alias("n_events"),
        )
    )


@query(
    "qe03_json_props",
    oracle="""
SELECT event_type,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events
GROUP BY event_type
""",
)
def qe03(spark, sf_dir):
    """Semi-structured extraction: pull an int out of the JSON props
    column (schema-on-read over a string column, no UDF)."""
    return (
        t(spark, sf_dir, "events")
        .select(
            "event_type",
            F.get_json_object("props", "$.k").cast("long").alias("k"),
        )
        .groupBy("event_type")
        .agg(F.sum("k").alias("sum_k"), F.count("*").alias("n"))
    )


@query(
    "qe04_sessionize",
    oracle="""
WITH e AS (
  -- µs TIMESTAMP, matching the Spark side's unix_micros comparison
  -- (parquet ts may read as TIMESTAMP_NS in DuckDB).
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id FROM events
), flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_session
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessions AS (
  SELECT user_id,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_id
  FROM flagged
)
SELECT user_id, CAST(COUNT(DISTINCT session_id) AS BIGINT) AS n_sessions,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM sessions GROUP BY user_id
""",
)
def qe04(spark, sf_dir):
    """Batch sessionization (30-min inactivity gap): lag + gap-flag +
    prefix-sum session ids — the classic one-shuffle formulation. The
    streaming dual is session_window() (streaming/windows.py)."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    cum = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    flagged = t(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                # Microsecond-exact gap comparison: unix_timestamp()
                # truncates to whole seconds, which would disagree with
                # the oracle's full-precision `ts - lag(ts) > INTERVAL
                # 30 MINUTE` for gaps in (1800, 1801)s.
                F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
                > 1800 * 1_000_000
            ),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    sessions = flagged.select(
        "user_id", F.sum("new_session").over(cum).alias("session_id")
    )
    return sessions.groupBy("user_id").agg(
        F.countDistinct("session_id").alias("n_sessions"),
        F.count("*").alias("n_events"),
    )


@query(
    "qe05_sliding_window",
    oracle="""
SELECT win_start, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
FROM (
  SELECT unnest([date_trunc('hour', ts), date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS win_start,
         value
  FROM events
)
GROUP BY win_start
""",
)
def qe05(spark, sf_dir):
    """Sliding window (2-hour size, 1-hour slide) via F.window — each
    event lands in exactly two windows; the oracle expands the window
    assignment explicitly."""
    return (
        t(spark, sf_dir, "events")
        .groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            dbl(F.sum(money("value"))).alias("total_value"),
        )
        .select(F.col("w.start").alias("win_start"), "n_events", "total_value")
    )


@query(
    "qe06_user_event_matrix",
    oracle="""
SELECT user_id,
       CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS clicks,
       CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS views,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchases,
       CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS errors,
       CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signups
FROM events GROUP BY user_id
""",
)
def qe06(spark, sf_dir):
    """Per-user behavior matrix — pivot with explicit values, rendered
    as conditional counts."""
    e = t(spark, sf_dir, "events")
    aggs = [
        F.sum(F.when(F.col("event_type") == v, 1).otherwise(0)).alias(name)
        for v, name in [
            ("click", "clicks"),
            ("view", "views"),
            ("purchase", "purchases"),
            ("error", "errors"),
            ("signup", "signups"),
        ]
    ]
    return e.groupBy("user_id").agg(*aggs)


@query(
    "qe07_approx_distinct_users",
    oracle="""
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       TRUE AS approx_ok
FROM events
GROUP BY 1
""",
)
def qe07(spark, sf_dir):
    """The 100 TB variant of qe02: HyperLogLog++ approximate distinct
    users per day (rsd=0.01). Constant-memory sketch per group instead
    of the exact distinct's expand+dedup shuffle — at scale DAU over
    billions of ids is only feasible this way.

    Oracle-checkable by construction: the query emits the exact DAU
    (which the DuckDB oracle reproduces) plus a deterministic
    bounded-error boolean ``approx_ok = |approx - dau| <= max(1, 3*rsd*dau)``
    that the oracle asserts as literal TRUE — if the sketch ever drifts
    past 3 sigma, the value hash flips and the gate catches it. The
    exact side exists only to make the gate deterministic; the sketch
    alone is the serving path at scale."""
    return (
        t(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.countDistinct("user_id").alias("dau"),
            F.count("*").alias("n_events"),
            F.approx_count_distinct("user_id", rsd=0.01).alias("approx_dau"),
        )
        .select(
            "day",
            "dau",
            "n_events",
            (
                F.abs(F.col("approx_dau").cast("double") - F.col("dau"))
                <= F.greatest(F.lit(1.0), F.lit(3 * 0.01) * F.col("dau"))
            ).alias("approx_ok"),
        )
    )


@query(
    "qe08_approx_value_quantiles",
    oracle="""
SELECT event_type,
       ROUND(quantile_cont(value, 0.5), 4) AS p50,
       ROUND(quantile_cont(value, 0.9), 4) AS p90,
       ROUND(quantile_cont(value, 0.99), 4) AS p99,
       TRUE AS approx_ok
FROM events
GROUP BY event_type
""",
)
def qe08(spark, sf_dir):
    """Value quantiles per event type: exact interpolated percentiles
    (the oracle-checkable side — Spark ``percentile`` and DuckDB
    ``quantile_cont`` share the p*(n-1) linear-interpolation definition)
    plus the percentile_approx mergeable-sketch path that is the 100 TB
    variant.

    Oracle-checkable by construction (same pattern as qe07): exact
    quantiles hash-match the oracle; ``approx_ok`` asserts the
    sketch's ACTUAL contract — percentile_approx returns a real data
    value whose RANK is within ε·n of the target (it never
    interpolates, so a value-space bound breaks on thin tails): the
    fraction of values ≤ the approximate quantile must sit within
    0.05 of the requested percentile. The oracle pins it TRUE."""
    exact = F.expr("percentile(value, array(0.5D, 0.9D, 0.99D))")
    approx = F.percentile_approx("value", [0.5, 0.9, 0.99], 10_000)
    events = t(spark, sf_dir, "events")
    agg = events.groupBy("event_type").agg(exact.alias("ex"), approx.alias("ap"))
    # second pass: measured rank of each approximate quantile
    ps = [0.5, 0.9, 0.99]
    j = events.select("event_type", "value").join(F.broadcast(agg), "event_type")
    frac = [
        (
            F.sum(F.when(F.col("value") <= F.col("ap")[i], 1).otherwise(0))
            / F.count("*")
        )
        for i in range(3)
    ]
    checked = j.groupBy("event_type").agg(
        F.first("ex").alias("ex"),
        *[
            (F.abs(f - F.lit(p)) <= F.lit(0.05)).alias(f"ok{i}")
            for i, (f, p) in enumerate(zip(frac, ps))
        ],
    )
    return checked.select(
        "event_type",
        F.round(F.col("ex")[0], 4).alias("p50"),
        F.round(F.col("ex")[1], 4).alias("p90"),
        F.round(F.col("ex")[2], 4).alias("p99"),
        (F.col("ok0") & F.col("ok1") & F.col("ok2")).alias("approx_ok"),
    )


@query(
    "qe09_sketch_merge_rollup",
    oracle="""
WITH daily AS (
  SELECT date_trunc('day', ts) AS day, event_type, user_id FROM events
)
SELECT event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
       CAST(COUNT(DISTINCT day) AS BIGINT) AS n_days,
       TRUE AS approx_ok
FROM daily
GROUP BY event_type
""",
)
def qe09(spark, sf_dir):
    """Mergeable-sketch rollup — the INCREMENTAL pattern at 100 TB:
    build one Datasketches HLL sketch per (day, event_type) partition
    (the shape a daily ingest job persists), then MERGE the daily
    sketches per event_type and estimate. Nothing ever re-reads the
    raw ids: a new day folds in by unioning one more sketch, which is
    how distinct-user rollups stay O(sketch) instead of O(history) as
    history grows.

    Oracle pattern per qe07: the exact distinct + a bounded-error
    boolean the oracle pins TRUE (HLL lgK=14 ⇒ rsd ≈ 0.8%; gate at
    3σ). The two-level sketch path itself is the serving artifact."""
    daily = (
        t(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", "ts").alias("day"),
                 "event_type")
        .agg(F.hll_sketch_agg("user_id", F.lit(14)).alias("sketch"))
    )
    merged = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("approx_users"),
        F.count("*").alias("n_days"),
    )
    exact = (
        t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact_users"))
    )
    return (
        merged.join(F.broadcast(exact), "event_type")
        .select(
            "event_type",
            "exact_users",
            "n_days",
            (
                F.abs(F.col("approx_users").cast("double") - F.col("exact_users"))
                <= F.greatest(F.lit(1.0), F.lit(3 * 0.008) * F.col("exact_users"))
            ).alias("approx_ok"),
        )
    )


@query(
    "qe10_latest_state_per_user",
    oracle="""
WITH ranked AS (
  SELECT user_id, event_id, ts, event_type, value,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rk
  FROM events
)
SELECT user_id,
       event_id AS last_event_id,
       CAST(ts AS TIMESTAMP) AS last_ts,
       event_type AS last_event_type,
       ROUND(value, 4) AS last_value
FROM ranked WHERE rk = 1
""",
)
def qe10(spark, sf_dir):
    """Latest-state-per-key compaction (the SCD-1 / CDC snapshot
    pattern): collapse each user's event history to the most recent
    row, deterministic under the (ts, event_id) total order.

    Physical shape: ONE shuffle on the key with map-side partial
    max_by — no window sort, no secondary shuffle, no row_number over
    full partitions. At 100 TB this is how a changelog compacts into a
    current-state table; the max_by struct comparator keeps the whole
    reduction inside whole-stage codegen."""
    e = t(spark, sf_dir, "events")
    ord_key = F.struct(F.col("ts"), F.col("event_id"))
    latest = e.groupBy("user_id").agg(
        F.max_by("event_id", ord_key).alias("last_event_id"),
        F.max_by("ts", ord_key).alias("last_ts"),
        F.max_by("event_type", ord_key).alias("last_event_type"),
        F.round(F.max_by("value", ord_key), 4).alias("last_value"),
    )
    return latest.select(
        "user_id", "last_event_id", "last_ts", "last_event_type", "last_value"
    )


@query(
    "qe11_funnel_conversion",
    oracle="""
WITH e AS (
  -- µs TIMESTAMP, matching the Spark side's ns→µs read conversion
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events
), s1 AS (
  SELECT user_id, ts, event_type,
         MIN(CASE WHEN event_type = 'view' THEN ts END)
           OVER (PARTITION BY user_id) AS t_view
  FROM e
), s2 AS (
  SELECT *, MIN(CASE WHEN event_type = 'click' AND ts >= t_view THEN ts END)
              OVER (PARTITION BY user_id) AS t_click
  FROM s1
), s3 AS (
  SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts >= t_click THEN ts END)
              OVER (PARTITION BY user_id) AS t_purchase
  FROM s2
), per_user AS (
  SELECT user_id, MAX(t_view) AS t_view, MAX(t_click) AS t_click,
         MAX(t_purchase) AS t_purchase
  FROM s3 GROUP BY user_id
)
SELECT CAST(COUNT(t_view) AS BIGINT) AS n_viewed,
       CAST(COUNT(t_click) AS BIGINT) AS n_clicked,
       CAST(COUNT(t_purchase) AS BIGINT) AS n_purchased,
       CAST(COALESCE(SUM(CASE WHEN t_purchase IS NOT NULL
                 THEN date_diff('microsecond', t_view, t_purchase) END), 0)
            AS BIGINT) AS sum_view_to_purchase_us
FROM per_user
""",
)
def qe11(spark, sf_dir):
    """Ordered-sequence funnel (view → click → purchase per user): the
    product-analytics sequence-match operator. Each stage's timestamp
    is the earliest event of that type AT OR AFTER the previous
    stage's timestamp — a chain of conditional-min windows over ONE
    hash partitioning on user_id (the three Window operators share the
    partition key, so Catalyst plans a single exchange, no joins, no
    self-join blowup). The per-user funnel collapses to one row, then
    a scalar summary.

    At 100 TB: funnel state per user is three timestamps — this is the
    shape you'd feed applyInPandasWithState for the streaming variant
    (qs02); the batch plan here shuffles the events table exactly
    once."""
    w = W.partitionBy("user_id")
    ev = t(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    s = (
        ev.withColumn(
            "t_view",
            F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w),
        )
        .withColumn(
            "t_click",
            F.min(
                F.when(
                    (F.col("event_type") == "click") & (F.col("ts") >= F.col("t_view")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "t_purchase",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") >= F.col("t_click")),
                    F.col("ts"),
                )
            ).over(w),
        )
    )
    per_user = s.groupBy("user_id").agg(
        F.max("t_view").alias("t_view"),
        F.max("t_click").alias("t_click"),
        F.max("t_purchase").alias("t_purchase"),
    )
    gap = F.when(
        F.col("t_purchase").isNotNull(),
        F.unix_micros("t_purchase") - F.unix_micros("t_view"),
    )
    return per_user.agg(
        F.count("t_view").alias("n_viewed"),
        F.count("t_click").alias("n_clicked"),
        F.count("t_purchase").alias("n_purchased"),
        F.coalesce(F.sum(gap), F.lit(0)).cast("bigint").alias("sum_view_to_purchase_us"),
    )


@query(
    "qe12_cumulative_new_users",
    oracle="""
WITH first_seen AS (
  SELECT user_id, CAST(MIN(CAST(ts AS TIMESTAMP)) AS DATE) AS first_day
  FROM events GROUP BY user_id
), per_day AS (
  SELECT first_day AS day, CAST(COUNT(*) AS BIGINT) AS new_users
  FROM first_seen GROUP BY first_day
)
SELECT day, new_users,
       CAST(SUM(new_users) OVER (ORDER BY day
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS BIGINT)
         AS cumulative_users
FROM per_day
""",
)
def qe12(spark, sf_dir):
    """User-growth curve: each user's first-seen day → new users per
    day → running cumulative total. The cumulative-distinct-count
    problem done right: COUNT(DISTINCT) OVER a growing frame would
    rescan every prefix; reducing each user to ONE first-seen row
    first makes the running total a prefix sum over ~days rows.

    Physical shape: one shuffle on user_id (min-ts reduce), one on day
    (tiny), then the prefix sum over the |days|-row relation runs as a
    triangular broadcast self-join (the global_row_number offset
    trick) — |days|² comparisons on a tiny table, and NO WindowExec in
    the registry ever runs unpartitioned (audited)."""
    ev = t(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.min("ts").cast("date").alias("first_day")
    )
    per_day = first_seen.groupBy(F.col("first_day").alias("day")).agg(
        F.count("*").alias("new_users")
    )
    x, y = per_day.alias("x"), per_day.alias("y")
    return (
        x.join(F.broadcast(y), F.lit(True))
        .groupBy(F.col("x.day").alias("day"), F.col("x.new_users").alias("new_users"))
        .agg(
            F.sum(
                F.when(F.col("y.day") <= F.col("x.day"), F.col("y.new_users")).otherwise(0)
            ).alias("cumulative_users"),
        )
        .select("day", "new_users", "cumulative_users")
    )


@query(
    "qe13_retention_cohorts",
    oracle="""
WITH e AS (
  SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d FROM events
), first_seen AS (
  SELECT user_id, MIN(d) AS cohort_day FROM e GROUP BY user_id
)
SELECT f.cohort_day,
       CAST(floor(date_diff('day', f.cohort_day, e.d) / 7.0) AS BIGINT) AS week_offset,
       CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_active
FROM e JOIN first_seen f ON e.user_id = f.user_id
GROUP BY f.cohort_day, week_offset
""",
)
def qe13(spark, sf_dir):
    """Retention cohort matrix: users grouped by first-seen day, the
    count still active N weeks later — the product-analytics retention
    triangle. Two aggregations and a join, ALL keyed on user_id until
    the final rollup: the first-seen reduce, the events join, and the
    distinct-user dedup share one hash partitioning, so the events
    table shuffles once; only the (cohort, offset) rollup — cardinality
    |days|×|weeks| — reshuffles, and it's tiny."""
    ev = t(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("d")
    )
    first_seen = ev.groupBy("user_id").agg(F.min("d").alias("cohort_day"))
    joined = ev.join(first_seen, "user_id").select(
        "user_id",
        "cohort_day",
        F.floor(F.datediff(F.col("d"), F.col("cohort_day")) / 7).alias("week_offset"),
    )
    return joined.groupBy("cohort_day", "week_offset").agg(
        F.count_distinct("user_id").alias("n_active")
    )


@query(
    "qe14_daily_anomaly_zscore",
    oracle="""
WITH daily AS (
  SELECT event_type,
         CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
         CAST(date_diff('day', DATE '1970-01-01',
                        CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE))
              AS BIGINT) AS day_num,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2, 3
), hist AS (
  SELECT event_type, day, n,
         COUNT(*) OVER w AS n_hist,
         AVG(CAST(n AS DOUBLE)) OVER w AS mu,
         STDDEV_SAMP(CAST(n AS DOUBLE)) OVER w AS sd
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day_num
               RANGE BETWEEN 30 PRECEDING AND 1 PRECEDING)
)
SELECT event_type, day, n,
       CAST(n_hist AS BIGINT) AS n_hist,
       CASE WHEN n_hist >= 5 AND sd > 0
            THEN ROUND((n - mu) / sd, 4) END AS z,
       COALESCE(n_hist >= 5 AND sd > 0
                AND abs((n - mu) / sd) > 3.0, FALSE) AS is_anomaly
FROM hist
ORDER BY event_type, day
""",
)
def qe14(spark, sf_dir):
    """Trailing-window anomaly detection: each (event_type, day)'s
    event count scored as a z-score against that type's OWN previous
    30 days (RANGE frame on the epoch-day value, so calendar gaps
    widen the window rather than silently shrinking it; the current
    day is excluded from its own baseline). Days with fewer than 5
    history points or zero variance score NULL — observability
    pipelines alert on `is_anomaly`, not on raw counts.

    Shape at scale: the raw stream collapses to |types|×|days| rows in
    one aggregation; the window then runs over that tiny frame — the
    monitoring pattern that works identically on 100 TB because
    everything after the first groupBy is per-type-days-sized. Float
    discipline: mean/stddev assembled identically on both engines and
    the z-score rounded to 4 decimals; the anomaly flag thresholds the
    UNROUNDED score identically on both sides."""
    day = F.date_trunc("day", "ts")
    daily = (
        t(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            day.cast("date").alias("day"),
            F.datediff(day.cast("date"), F.lit("1970-01-01").cast("date"))
            .cast("bigint")
            .alias("day_num"),
        )
        .agg(F.count("*").alias("n"))
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("day_num")
        .rangeBetween(-30, -1)
    )
    nd = F.col("n").cast("double")
    hist = daily.select(
        "event_type",
        "day",
        "n",
        F.count("*").over(w).alias("n_hist"),
        F.avg(nd).over(w).alias("mu"),
        F.stddev_samp(nd).over(w).alias("sd"),
    )
    usable = (F.col("n_hist") >= 5) & (F.col("sd") > 0)
    z_raw = (F.col("n") - F.col("mu")) / F.col("sd")
    return hist.select(
        "event_type",
        "day",
        "n",
        F.col("n_hist").cast("bigint").alias("n_hist"),
        F.when(usable, F.round(z_raw, 4)).alias("z"),
        F.coalesce(usable & (F.abs(z_raw) > 3.0), F.lit(False)).alias("is_anomaly"),
    ).orderBy("event_type", "day")


@query(
    "qe15_event_transitions",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY CAST(ts AS TIMESTAMP), event_id)
           AS prev_type
  FROM events
), pairs AS (
  SELECT prev_type, event_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY prev_type, event_type
), tot AS (
  SELECT prev_type, CAST(SUM(n) AS BIGINT) AS tn FROM pairs GROUP BY prev_type
)
SELECT p.prev_type, p.event_type, n,
       ROUND(CAST(n AS DOUBLE) / tn, 6) AS prob
FROM pairs p JOIN tot USING (prev_type)
ORDER BY prev_type, event_type
""",
)
def qe15(spark, sf_dir):
    """First-order event-transition matrix: P(next event type | current
    type) from each user's time-ordered stream — the Markov summary
    behind next-action prediction, funnel-leak hunting, and bot
    detection (impossible transitions light up).

    Shape at scale: ONE shuffle on user_id for the lag window, then
    the pair counts collapse to |types|² rows; the probability
    normalization joins two tiny aggregates of the SAME pair table
    (broadcast). The (ts, event_id) tiebreak makes the sequence — and
    therefore the matrix — a total order both engines reproduce
    exactly."""
    seq = t(spark, sf_dir, "events").select(
        "event_type",
        F.lag("event_type")
        .over(W.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("prev_type"),
    )
    pairs = (
        seq.where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "event_type")
        .agg(F.count("*").alias("n"))
    )
    tot = pairs.groupBy("prev_type").agg(F.sum("n").alias("tn"))
    return (
        pairs.join(F.broadcast(tot), "prev_type")
        .select(
            "prev_type",
            "event_type",
            "n",
            F.round(F.col("n").cast("double") / F.col("tn"), 6).alias("prob"),
        )
        .orderBy("prev_type", "event_type")
    )


@query(
    "qe16_cms_heavy_hitters",
    oracle="""
WITH exact AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY user_id
)
SELECT user_id, n_events,
       TRUE AS est_ge_exact, TRUE AS est_within_bound
FROM exact
ORDER BY n_events DESC, user_id
LIMIT 20
""",
)
def qe16(spark, sf_dir):
    """Count-min sketch, oracle-pinned like qe07/qe08/qd10: build a
    d=4 × w=256 CMS over user event counts (pmod(xxhash64(key, row),
    w) bucketing — pure JVM expressions), read back each heavy
    hitter's estimate as the min across rows, and emit the two CMS
    guarantees as booleans the oracle pins TRUE: the estimate never
    undercounts, and it overshoots by at most ⌈(e/w)·N⌉ (deterministic
    here — fixed hashes, fixed data). The sketch is 1024 mergeable
    counters regardless of key cardinality — the 100 TB shape for
    frequency estimation where exact per-key counts don't fit;
    exactness of the top-20 themselves is checked against the exact
    aggregation in the same oracle.

    Shape: one map-side explode (4 rows per event) into a 1024-row
    aggregation, broadcast back onto the heavy-hitter lookups; the
    exact side is one groupBy. No UDF, no driver loops."""
    import math

    ev = t(spark, sf_dir, "events").select("user_id")
    d_rows, w = 4, 256
    cms = (
        ev.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(r).alias("r"),
                            F.pmod(F.xxhash64(F.col("user_id"), F.lit(r)), w).alias(
                                "bucket"
                            ),
                        )
                        for r in range(d_rows)
                    ]
                )
            ).alias("cell")
        )
        .groupBy(F.col("cell.r").alias("r"), F.col("cell.bucket").alias("bucket"))
        .agg(F.count("*").alias("cnt"))
    )
    exact = ev.groupBy("user_id").agg(F.count("*").alias("n_events"))
    total = ev.agg(F.count("*").alias("n_total"))
    est_cols = []
    joined = exact.crossJoin(F.broadcast(total))
    for r in range(d_rows):
        cms_r = cms.where(F.col("r") == r).select(
            F.col("bucket").alias(f"b{r}"), F.col("cnt").alias(f"c{r}")
        )
        joined = joined.withColumn(
            f"b{r}", F.pmod(F.xxhash64(F.col("user_id"), F.lit(r)), w)
        ).join(F.broadcast(cms_r), f"b{r}")
        est_cols.append(F.col(f"c{r}"))
    est = F.least(*est_cols)
    # 3× the textbook ⌈(e/w)·N⌉ slack: the CMS overshoot bound is a
    # per-row Markov bound (≥1−1/e per row, min over d rows), i.e.
    # high-probability, NOT hard — and the driver regenerates testdata
    # between rounds. At 3× the per-key flip probability is ≤(1/3e)⁴
    # ≈ 2e-4 (negligible across the top-20), while a real bug (wrong
    # bucketing, dropped rows) still trips it by orders of magnitude.
    slack = F.ceil(F.lit(3.0 * math.e / w) * F.col("n_total"))
    return (
        joined.select(
            "user_id",
            "n_events",
            (est >= F.col("n_events")).alias("est_ge_exact"),
            (est <= F.col("n_events") + slack).alias("est_within_bound"),
        )
        .orderBy(F.desc("n_events"), "user_id")
        .limit(20)
    )


@query(
    "qe17_salted_type_stats",
    oracle="""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value,
       ROUND(MAX(value), 4) AS max_value
FROM events GROUP BY event_type
""",
)
def qe17(spark, sf_dir):
    """The SKEW-SAFE aggregation, gate-verified: per-type event stats
    computed through salted_aggregate — groupBy(key, salt) partials
    merged by an EXPLICIT decomposition (count→sum, sum→sum, max→max)
    — with the oracle running the plain GROUP BY. event_type is
    exactly the hot-key shape (a handful of values covering every
    row); at 100 TB the plain aggregation sends each type to ONE
    reducer while the salted one spreads it across 16, and this query
    pins that the rewrite changes the shuffle distribution WITHOUT
    changing a single output value (decimal-exact money, so even
    summation regrouping is identity)."""
    from ml_data_wrangler_spark.operators.skew import salted_aggregate

    ev = t(spark, sf_dir, "events")
    out = salted_aggregate(
        ev,
        keys=["event_type"],
        aggs={
            "n_events": (F.count("*"), "sum"),
            "total_value": (F.sum(F.col("value").cast("decimal(12,2)")), "sum"),
            "max_value": (F.max("value"), "max"),
        },
    )
    return out.select(
        "event_type",
        "n_events",
        F.col("total_value").cast("double").alias("total_value"),
        F.round("max_value", 4).alias("max_value"),
    )


@query(
    "qe18_event_contract",
    oracle="""
WITH flags AS (
  SELECT CASE WHEN event_id IS NOT NULL THEN 0 ELSE 1 END AS v_event_id_present,
         CASE WHEN event_type IN ('view','click','purchase','signup','error')
              THEN 0 ELSE 1 END AS v_known_event_type,
         CASE WHEN ts IS NOT NULL
                   AND CAST(ts AS TIMESTAMP) >= TIMESTAMP '2020-01-01'
              THEN 0 ELSE 1 END AS v_ts_in_range,
         CASE WHEN user_id IS NOT NULL AND user_id > 0 THEN 0 ELSE 1 END
           AS v_user_id_positive,
         CASE WHEN value IS NOT NULL AND value >= 0 THEN 0 ELSE 1 END
           AS v_value_non_negative
  FROM events
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(SUM(v_event_id_present) AS BIGINT) AS c1,
         CAST(SUM(v_known_event_type) AS BIGINT) AS c2,
         CAST(SUM(v_ts_in_range) AS BIGINT) AS c3,
         CAST(SUM(v_user_id_positive) AS BIGINT) AS c4,
         CAST(SUM(v_value_non_negative) AS BIGINT) AS c5
  FROM flags
)
SELECT u.constraint, n_rows, u.n_violations,
       ROUND(CAST(u.n_violations AS DOUBLE) / n_rows, 6) AS violation_frac
FROM tot,
     (SELECT 'event_id_present' AS "constraint", c1 AS n_violations FROM tot
      UNION ALL SELECT 'known_event_type', c2 FROM tot
      UNION ALL SELECT 'ts_in_range', c3 FROM tot
      UNION ALL SELECT 'user_id_positive', c4 FROM tot
      UNION ALL SELECT 'value_non_negative', c5 FROM tot) u
ORDER BY u.constraint
""",
)
def qe18(spark, sf_dir):
    """The generic data-contract runner, gate-verified: five named
    row-level constraints over the event stream evaluated in ONE
    partial-aggregated pass (operators/quality.constraint_report),
    emitting the per-constraint violation report a pipeline publishes
    with every batch. Violation counting treats null predicates as
    violations (three-valued logic can't let nulls sneak past a range
    check); the oracle mirrors each predicate and the single-pass
    roll-up."""
    from ml_data_wrangler_spark.operators.quality import constraint_report

    ev = t(spark, sf_dir, "events")
    return constraint_report(
        ev,
        {
            "event_id_present": F.col("event_id").isNotNull(),
            "known_event_type": F.col("event_type").isin(
                "view", "click", "purchase", "signup", "error"
            ),
            "ts_in_range": F.col("ts") >= F.lit("2020-01-01").cast("timestamp"),
            "user_id_positive": F.col("user_id") > 0,
            "value_non_negative": F.col("value") >= 0,
        },
    )


@query(
    "qe19_hour_of_week_profile",
    oracle="""
WITH cells AS (
  SELECT CAST(dayofweek(CAST(ts AS TIMESTAMP)) + 1 AS BIGINT) AS dow,
         CAST(hour(CAST(ts AS TIMESTAMP)) AS BIGINT) AS hour,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
), tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM cells)
SELECT dow, hour, n,
       ROUND(CAST(n AS DOUBLE) * 168 / total, 4) AS load_factor
FROM cells CROSS JOIN tot
ORDER BY dow, hour
""",
)
def qe19(spark, sf_dir):
    """Hour-of-week seasonality profile: event volume per (day-of-week,
    hour) cell with a load factor normalized so a perfectly flat week
    scores 1.0 everywhere — the traffic-shape fingerprint capacity
    planning and the qe14 anomaly baseline both read (a 3× Friday-noon
    factor is signal; the same count at 4am Sunday is an incident).
    One 168-cell aggregation; day-of-week numbering aligned across
    engines (Sunday=1)."""
    ev = t(spark, sf_dir, "events").select(
        F.dayofweek("ts").cast("bigint").alias("dow"),
        F.hour("ts").cast("bigint").alias("hour"),
    )
    cells = ev.groupBy("dow", "hour").agg(F.count("*").alias("n"))
    tot = cells.agg(F.sum("n").alias("total"))
    return (
        cells.crossJoin(F.broadcast(tot))
        .select(
            "dow",
            "hour",
            "n",
            F.round(F.col("n").cast("double") * 168 / F.col("total"), 4).alias(
                "load_factor"
            ),
        )
        .orderBy("dow", "hour")
    )


@query(
    "qe20_event_debounce",
    oracle="""
WITH seq AS (
  SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
         LAG(CAST(ts AS TIMESTAMP)) OVER (
             PARTITION BY user_id, event_type
             ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_ts
  FROM events
)
SELECT event_id, user_id, event_type, ts
FROM seq
WHERE prev_ts IS NULL
   OR date_diff('microsecond', prev_ts, ts) >= 600000000
ORDER BY event_id
""",
)
def qe20(spark, sf_dir):
    """Event debounce: suppress an event when the SAME (user, type)
    fired less than 10 minutes earlier — the telemetry de-noising rule
    for double-clicks, retry storms, and duplicate beacons. Lag-based
    (each event compares to its immediate predecessor), which is the
    deterministic, one-window-pass semantics; the greedy
    keep-first-then-drop-all-within-T variant is inherently sequential
    and belongs to the streaming dedup (qs04) with its watermark
    state. One shuffle on (user, type); the gap test is µs-exact
    integer arithmetic on both engines."""
    w = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    seq = t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        "ts",
        F.lag("ts").over(w).alias("prev_ts"),
    )
    return (
        seq.where(
            F.col("prev_ts").isNull()
            | (F.unix_micros("ts") - F.unix_micros("prev_ts") >= 600_000_000)
        )
        .select("event_id", "user_id", "event_type", "ts")
        .orderBy("event_id")
    )


@query(
    "qe21_bloom_membership",
    oracle="""
SELECT c_custkey AS probe_id,
       c_custkey IN (SELECT DISTINCT user_id FROM events) AS is_member,
       TRUE AS no_false_negative,
       TRUE AS fpr_ok
FROM customer
""",
)
def qe21(spark, sf_dir):
    """Bloom-filter membership sketch, oracle-pinned (qe16's CMS
    pattern): build a Bloom filter (m=2^16 bits, k=4 xxhash64 probes,
    represented relationally as the bounded table of SET bit
    positions — ≤ m rows, mergeable by union) over the distinct
    event-log users, probe EVERY customer key, and emit per probe:
    the exact membership (oracle recomputes it), the hard Bloom
    guarantee — a true member can NEVER be bloom-negative, pinned
    TRUE per row — and the aggregate false-positive-rate bound
    (measured FPR among true non-members ≤ 0.05; expected ≈ 6e-5 at
    sf0.1 with n=1500 — the 0.05 ceiling leaves orders-of-magnitude
    regeneration margin, while a broken hash family saturates to
    FPR≈1). This is the decontamination/stop-list shape at 100 TB:
    the filter is O(m) bounded state broadcast to the probe side; in
    production m scales with n (m ≈ 16n keeps FPR < 1e-3) — fixed
    here because the gate corpus is fixed.

    Shape: one distinct over members, one bounded bit table
    (broadcast), k map-side probe rows per key, one aggregation. No
    UDF, no unbounded state."""
    m, k = 1 << 16, 4
    ev = t(spark, sf_dir, "events")
    cust = t(spark, sf_dir, "customer")
    members = ev.select(F.col("user_id").cast("long").alias("uid")).distinct()
    bits = (
        members.select(
            F.explode(
                F.array(
                    *[
                        F.pmod(F.xxhash64(F.col("uid"), F.lit(i)), F.lit(m))
                        for i in range(k)
                    ]
                )
            ).alias("bit")
        )
        .distinct()
        .withColumn("_set", F.lit(1))
    )
    probes = cust.select(F.col("c_custkey").cast("long").alias("probe_id"))
    probe_bits = probes.select(
        "probe_id",
        F.explode(
            F.array(
                *[
                    F.pmod(F.xxhash64(F.col("probe_id"), F.lit(i)), F.lit(m))
                    for i in range(k)
                ]
            )
        ).alias("bit"),
    )
    hit_counts = (
        probe_bits.join(F.broadcast(bits), "bit", "left")
        .groupBy("probe_id")
        .agg((F.coalesce(F.sum("_set"), F.lit(0)) == k).alias("bloom_pos"))
    )
    flagged = (
        hit_counts.join(
            members.withColumn("_m", F.lit(1)),
            hit_counts["probe_id"] == members["uid"],
            "left",
        )
        .select(
            "probe_id",
            F.col("_m").isNotNull().alias("is_member"),
            "bloom_pos",
        )
    )
    stats = flagged.agg(
        (
            F.coalesce(
                F.avg(
                    F.when(~F.col("is_member"), F.col("bloom_pos").cast("double"))
                ),
                F.lit(0.0),
            )
            <= 0.05
        ).alias("fpr_ok")
    )
    return flagged.crossJoin(F.broadcast(stats)).select(
        "probe_id",
        "is_member",
        (F.col("bloom_pos") | ~F.col("is_member")).alias("no_false_negative"),
        "fpr_ok",
    )


@query(
    "qe22_scd2_intervals",
    oracle="""
WITH e AS (
  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id
  FROM events
), dedup AS (
  SELECT user_id, event_type, ts, event_id,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM e
), changes AS (
  SELECT user_id, event_type AS state, ts AS valid_from, event_id
  FROM dedup
  WHERE prev_type IS NULL OR prev_type <> event_type
)
SELECT user_id, state, valid_from,
       LEAD(valid_from) OVER (PARTITION BY user_id
                              ORDER BY valid_from, event_id) AS valid_to,
       (LEAD(valid_from) OVER (PARTITION BY user_id
                               ORDER BY valid_from, event_id) IS NULL)
         AS is_current
FROM changes
""",
)
def qe22(spark, sf_dir):
    """SCD Type-2 history build from a change-event stream: collapse
    consecutive same-state events per user (lag), then assign each
    surviving state a half-open validity interval [valid_from,
    valid_to) via lead — the standard warehouse dimension-history
    operator (current row: valid_to NULL, is_current TRUE).

    Shape at scale: ONE shuffle on user_id feeds both windows (lag
    for change detection, lead for interval close) — same-partitioning
    windows share the exchange; no join, no second pass over the
    events. The (ts, event_id) tiebreak makes interval boundaries a
    total order both engines reproduce exactly."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        t(spark, sf_dir, "events")
        .select(
            "user_id",
            "event_type",
            "ts",
            "event_id",
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .where(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
        .select(
            "user_id",
            F.col("event_type").alias("state"),
            F.col("ts").alias("valid_from"),
            "event_id",
        )
    )
    w2 = W.partitionBy("user_id").orderBy("valid_from", "event_id")
    lead_to = F.lead("valid_from").over(w2)
    return changes.select(
        "user_id",
        "state",
        "valid_from",
        lead_to.alias("valid_to"),
        lead_to.isNull().alias("is_current"),
    )


@query(
    "qe24_global_volume_outliers",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2
),
stats AS (
  SELECT event_type,
         CAST(COUNT(*) AS DECIMAL(38,0)) AS cnt,
         CAST(SUM(n_events) AS DECIMAL(38,0)) AS s,
         CAST(SUM(n_events * n_events) AS DECIMAL(38,0)) AS q
  FROM daily GROUP BY event_type
)
SELECT d.event_type, d.day, d.n_events,
       CASE WHEN st.cnt * st.q - st.s * st.s = 0 THEN 0.0
            ELSE ROUND(CAST(st.cnt * d.n_events - st.s AS DOUBLE)
                 / sqrt(CAST(st.cnt * st.q - st.s * st.s AS DOUBLE)), 3) + 0
       END AS z_score,
       (st.cnt * d.n_events - st.s) * (st.cnt * d.n_events - st.s)
         > 4 * (st.cnt * st.q - st.s * st.s) AS is_anomaly
FROM daily d JOIN stats st USING (event_type)
ORDER BY d.event_type, d.day
""",
)
def qe24(spark, sf_dir):
    """GLOBAL-baseline volume outliers per event type: flag days whose
    count sits more than 2 population standard deviations from the
    type's whole-period mean — the complement of qe14's TRAILING-
    window detector (qe14 catches local level shifts against the
    recent past; this catches days atypical for the series as a
    whole, and its threshold can be made exactly deterministic).

    Cross-engine exactness: the threshold test is a PURE INTEGER
    comparison — |z| > 2 rewrites to (n·x − S)² > 4(nQ − S²) with
    S = Σx, Q = Σx² — carried in DECIMAL(38,0) on both engines (day
    counts at 100 TB square past int64), so the boolean can never
    flip on float summation order. The displayed z itself is derived
    from the same exact decimals through one identical double
    expression, rounded for display only.

    Shape at scale: one hash aggregation onto the (type, day) grid,
    then per-type moment aggregation over a days-bounded relation
    that BROADCASTS back onto the grid. Nothing scales with raw event
    volume past the first aggregation."""
    daily = (
        t(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
        )
        .agg(F.count("*").alias("n_events"))
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    stats = daily.groupBy("event_type").agg(
        dec(F.count("*")).alias("cnt"),
        dec(F.sum("n_events")).alias("s"),
        dec(F.sum(F.col("n_events") * F.col("n_events"))).alias("q"),
    )
    dev = F.col("cnt") * F.col("n_events") - F.col("s")
    var_n2 = F.col("cnt") * F.col("q") - F.col("s") * F.col("s")
    return (
        daily.join(F.broadcast(stats), "event_type")
        .select(
            "event_type",
            "day",
            "n_events",
            F.when(var_n2 == 0, F.lit(0.0))
            .otherwise(
                F.round(
                    dev.cast("double") / F.sqrt(var_n2.cast("double")), 3
                )
                + F.lit(0.0)
            )
            .alias("z_score"),
            (dev * dev > 4 * var_n2).alias("is_anomaly"),
        )
        .orderBy("event_type", "day")
    )


@query(
    "qe25_time_weighted_value",
    oracle="""
WITH seq AS (
  SELECT user_id, value, ts, event_id,
         LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts
  FROM events
),
iv AS (
  SELECT user_id,
         CAST(value AS DECIMAL(12,2)) AS v,
         epoch_us(next_ts) - epoch_us(ts) AS dur_us
  FROM seq WHERE next_ts IS NOT NULL
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_intervals,
       CAST(SUM(dur_us) AS BIGINT) AS total_us,
       ROUND(CAST(SUM(v * dur_us) AS DOUBLE) / CAST(SUM(dur_us) AS DOUBLE), 4)
         + 0 AS twav
FROM iv GROUP BY user_id
ORDER BY user_id
""",
)
def qe25(spark, sf_dir):
    """Time-weighted average value per user (the TWAP operator of
    financial/sensor pipelines): each event's value holds until the
    user's next event, so the mean weights values by how LONG they
    were in force, not how often they were sampled — the correct
    summary for irregularly-sampled series, where a plain AVG
    overweights bursts.

    Cross-engine exactness: durations are exact integer microseconds
    and values exact DECIMAL(12,2), so both weighted-sum aggregates
    are exact (decimal×int products, associative); the final ratio is
    one identical double expression on both engines. Shape at scale:
    one shuffle on user_id serves the lead() window AND the final
    aggregation (same key — exchange reused)."""
    seq = (
        t(spark, sf_dir, "events")
        .select(
            "user_id",
            "value",
            "ts",
            "event_id",
            F.lead("ts")
            .over(W.partitionBy("user_id").orderBy("ts", "event_id"))
            .alias("next_ts"),
        )
        .where(F.col("next_ts").isNotNull())
        .select(
            "user_id",
            money("value").alias("v"),
            (F.unix_micros("next_ts") - F.unix_micros("ts")).alias("dur_us"),
        )
    )
    return (
        seq.groupBy("user_id")
        .agg(
            F.count("*").alias("n_intervals"),
            F.sum("dur_us").alias("total_us"),
            (
                F.round(
                    dbl(F.sum(F.col("v") * F.col("dur_us")))
                    / dbl(F.sum("dur_us")),
                    4,
                )
                + F.lit(0.0)
            ).alias("twav"),
        )
        .orderBy("user_id")
    )


@query(
    "qe27_growth_accounting",
    oracle="""
WITH ud AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
  FROM events
),
seq AS (
  SELECT user_id, day,
         LAG(day) OVER (PARTITION BY user_id ORDER BY day) AS prev_day
  FROM ud
)
SELECT day,
       CAST(SUM(CASE WHEN prev_day IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_new,
       CAST(SUM(CASE WHEN prev_day IS NOT NULL
                      AND date_diff('day', prev_day, day) <= 3
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
       CAST(SUM(CASE WHEN prev_day IS NOT NULL
                      AND date_diff('day', prev_day, day) > 3
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected
FROM seq GROUP BY day ORDER BY day
""",
)
def qe27(spark, sf_dir):
    """Daily growth accounting: every active user-day is classified
    NEW (first activity ever), RETAINED (active within the last 3
    days), or RESURRECTED (returning after a >3-day gap) — the
    standard DAU decomposition that qw10's cohort matrix aggregates
    away, and the batch dual of churn alerting.

    Shape at scale: one distinct projection onto (user, day) —
    collapsing raw event volume immediately — then one lag() window
    on the user partitioning and a re-key onto the days-bounded
    grid. All classification is integer date arithmetic; no floats
    anywhere."""
    ud = (
        t(spark, sf_dir, "events")
        .select(
            "user_id",
            F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
        )
        .distinct()
    )
    seq = ud.select(
        "user_id",
        "day",
        F.lag("day").over(W.partitionBy("user_id").orderBy("day")).alias(
            "prev_day"
        ),
    )
    gap = F.datediff("day", "prev_day")
    return (
        seq.groupBy("day")
        .agg(
            F.sum(F.when(F.col("prev_day").isNull(), 1).otherwise(0)).alias(
                "n_new"
            ),
            F.sum(
                F.when(F.col("prev_day").isNotNull() & (gap <= 3), 1).otherwise(0)
            ).alias("n_retained"),
            F.sum(
                F.when(F.col("prev_day").isNotNull() & (gap > 3), 1).otherwise(0)
            ).alias("n_resurrected"),
        )
        .orderBy("day")
    )


@query(
    "qe28_psi_value_drift",
    oracle="""
WITH e AS (
  SELECT event_type, value,
         CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-16 00:00:00' AS recent,
         least(CAST(floor(value / 50.0) AS BIGINT), 9) AS bin
  FROM events
),
counts AS (
  SELECT event_type, bin,
         CAST(SUM(CASE WHEN NOT recent THEN 1 ELSE 0 END) AS BIGINT) AS c_ref,
         CAST(SUM(CASE WHEN recent THEN 1 ELSE 0 END) AS BIGINT) AS c_new
  FROM e GROUP BY event_type, bin
),
tot AS (
  SELECT event_type, CAST(SUM(c_ref) AS BIGINT) AS n_ref,
         CAST(SUM(c_new) AS BIGINT) AS n_new
  FROM counts GROUP BY event_type
),
terms AS (
  SELECT c.event_type,
         CAST(ROUND(
           ((c_ref + 1.0) / (n_ref + 10.0) - (c_new + 1.0) / (n_new + 10.0))
           * ln(((c_ref + 1.0) / (n_ref + 10.0))
                / ((c_new + 1.0) / (n_new + 10.0))) * 1e9) AS BIGINT) AS t
  FROM counts c JOIN tot USING (event_type)
)
SELECT event_type, CAST(SUM(t) AS BIGINT) AS psi_nano,
       CAST(SUM(t) AS BIGINT) > 100000000 AS drifted
FROM terms GROUP BY event_type ORDER BY event_type
""",
)
def qe28(spark, sf_dir):
    """Population Stability Index between the first and second half of
    the month, per event type — the standard distribution-drift
    monitor (PSI > 0.1 = investigate) that complements qe24/qe14:
    those flag VOLUME shifts, this flags shape shifts in the value
    distribution even at constant volume. Values bin into 10
    fixed-width buckets; both histograms are add-1 smoothed so empty
    bins are well-defined.

    Cross-engine exactness: bin counts are exact integers; each
    bin's PSI term (one identical double expression over those
    integers) quantizes to integer NANO-units before the per-type
    sum, so the aggregate and the 0.1 threshold comparison are exact
    integer operations (the qm14 micronat pattern at 1e9 because PSI
    terms are small).

    Shape at scale: one pass bins and splits both windows with
    conditional aggregation (no self-join of the two periods), onto
    a |types|×10 grid; everything after is bounded."""
    e = t(spark, sf_dir, "events").select(
        "event_type",
        (F.col("ts") >= F.lit("2024-01-16 00:00:00").cast("timestamp")).alias(
            "recent"
        ),
        F.least(F.floor(F.col("value") / 50.0).cast("long"), F.lit(9)).alias(
            "bin"
        ),
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
    return (
        counts.join(F.broadcast(tot), "event_type")
        .select("event_type", term.alias("t"))
        .groupBy("event_type")
        .agg(F.sum("t").alias("psi_nano"))
        .select(
            "event_type",
            "psi_nano",
            (F.col("psi_nano") > 100_000_000).alias("drifted"),
        )
        .orderBy("event_type")
    )


@query(
    "qe29_session_paths",
    oracle="""
WITH seq AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE
               OR LAG(ts) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS boundary
  FROM events
),
sess AS (
  SELECT user_id, ts, event_id, event_type,
         SUM(boundary) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_no
  FROM seq
),
paths AS (
  SELECT user_id, session_no,
         string_agg(event_type, '>' ORDER BY ts, event_id) AS path
  FROM sess GROUP BY user_id, session_no
)
SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
FROM paths GROUP BY path
HAVING COUNT(*) >= 5
ORDER BY n_sessions DESC, path
LIMIT 25
""",
)
def qe29(spark, sf_dir):
    """Session path analysis: the top event-type SEQUENCES users
    follow within a 30-minute-gap session — what qe04 (sessionize)
    and qe15 (one-step transitions) can't show: full ordered journeys
    and their frequencies, the input to any funnel-discovery or
    bot-pattern tool.

    Shape at scale: sessionization reuses qe04's boundary-flag +
    running-sum idiom (two stacked windows on ONE user_id
    partitioning); the path string is built by an ordered in-group
    concat (sort key mirrored exactly in the oracle's string_agg
    ORDER BY), and only the bounded path-frequency table shuffles
    again. Rare paths are floored at 5 sessions so the output is the
    head of the distribution, not a long tail of singletons."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    run = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    prev_ts = F.lag("ts").over(w)
    boundary = F.when(
        prev_ts.isNull()
        | (
            F.unix_micros("ts") - F.unix_micros(prev_ts)
            > 30 * 60 * 1_000_000
        ),
        1,
    ).otherwise(0)
    sess = (
        t(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .withColumn("boundary", boundary)
        .withColumn("session_no", F.sum("boundary").over(run))
    )
    paths = (
        sess.groupBy("user_id", "session_no")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("ts", "event_id", "event_type"))
                    ),
                    lambda s: s["event_type"],
                ),
                ">",
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").alias("n_sessions"))
        .where(F.col("n_sessions") >= 5)
        .orderBy(F.desc("n_sessions"), "path")
        .limit(25)
    )


@query(
    "qe30_daily_autocorrelation",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
),
stats AS (
  SELECT event_type,
         CAST(COUNT(*) AS DECIMAL(38,0)) AS n,
         CAST(SUM(x) AS DECIMAL(38,0)) AS s
  FROM daily GROUP BY event_type
),
dev AS (
  SELECT d.event_type, d.day,
         st.n * d.x - st.s AS e,
         st.n
  FROM daily d JOIN stats st USING (event_type)
),
den AS (
  SELECT event_type, SUM(e * e) AS ss FROM dev GROUP BY event_type
),
num AS (
  SELECT a.event_type, k.lag, SUM(a.e * b.e) AS cp
  FROM dev a
  JOIN (SELECT unnest([1, 2, 3, 7]) AS lag) k ON TRUE
  JOIN dev b ON b.event_type = a.event_type
            AND b.day = a.day + CAST(k.lag AS INTEGER)
  GROUP BY a.event_type, k.lag
)
SELECT n.event_type, CAST(n.lag AS BIGINT) AS lag,
       CASE WHEN d.ss = 0 THEN 0.0
            ELSE ROUND(CAST(n.cp AS DOUBLE) / CAST(d.ss AS DOUBLE), 6) + 0
       END AS acf
FROM num n JOIN den d USING (event_type)
ORDER BY n.event_type, lag
""",
)
def qe30(spark, sf_dir):
    """Sample autocorrelation of the daily volume series at lags
    1/2/3/7 per event type — the serial-dependence diagnostic behind
    seasonality detection (a strong lag-7 spike = weekly cycle, which
    qe19's hour-of-week profile shows as a shape; this measures its
    strength as one number) and behind whether qe14's trailing
    z-scores can assume independence at all.

    Cross-engine exactness: deviations are carried n-scaled as exact
    DECIMAL(38,0) integers (e_t = n·x_t − S, so no division until
    the end); numerator and denominator are exact integer sums and
    the ACF is ONE final IEEE division. Shape at scale: everything
    after the (type, day) aggregation operates on the days-bounded
    grid; the lag join is an equi-join on (type, day+k)."""
    daily = (
        t(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
        )
        .agg(F.count("*").alias("x"))
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    stats = daily.groupBy("event_type").agg(
        dec(F.count("*")).alias("n"), dec(F.sum("x")).alias("s")
    )
    dev = daily.join(F.broadcast(stats), "event_type").select(
        "event_type",
        "day",
        (F.col("n") * F.col("x") - F.col("s")).alias("e"),
    )
    den = dev.groupBy("event_type").agg(
        F.sum(F.col("e") * F.col("e")).alias("ss")
    )
    lags = F.explode(F.array(*[F.lit(k) for k in (1, 2, 3, 7)])).alias("lag")
    a = dev.select("event_type", "day", "e", lags)
    b = dev.select(
        F.col("event_type").alias("event_type"),
        F.col("day").alias("b_day"),
        F.col("e").alias("b_e"),
    )
    num = (
        a.join(
            b,
            (a["event_type"] == b["event_type"])
            & (b["b_day"] == F.date_add(a["day"], a["lag"])),
        )
        .select(a["event_type"], "lag", (F.col("e") * F.col("b_e")).alias("cp"))
        .groupBy("event_type", "lag")
        .agg(F.sum("cp").alias("cp"))
    )
    return (
        num.join(F.broadcast(den), "event_type")
        .select(
            "event_type",
            F.col("lag").cast("long").alias("lag"),
            F.when(F.col("ss") == 0, F.lit(0.0))
            .otherwise(
                F.round(
                    F.col("cp").cast("double") / F.col("ss").cast("double"), 6
                )
                + F.lit(0.0)
            )
            .alias("acf"),
        )
        .orderBy("event_type", "lag")
    )


@query(
    "qe31_robust_value_outliers",
    oracle="""
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS m
  FROM events GROUP BY event_type
),
mad AS (
  SELECT e.event_type,
         quantile_cont(abs(e.value - med.m), 0.5) AS mad_raw,
         MAX(med.m) AS m
  FROM events e JOIN med USING (event_type)
  GROUP BY e.event_type
)
SELECT e.event_type,
       ROUND(mad.m, 4) + 0 AS median_value,
       ROUND(mad.mad_raw * 1.4826, 4) + 0 AS mad_sigma,
       CAST(SUM(CASE WHEN abs(e.value - mad.m)
                          > 3.0 * mad.mad_raw * 1.4826
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events e JOIN mad USING (event_type)
GROUP BY e.event_type, mad.m, mad.mad_raw
ORDER BY e.event_type
""",
)
def qe31(spark, sf_dir):
    """Robust outlier detection on event values: per-type median and
    MAD (scaled by 1.4826 to be σ-consistent under normality), then
    the count of events beyond 3 robust sigmas — the
    breakdown-point-0.5 complement of qe14/qe24's moment-based
    z-scores, which a single huge outlier can silently inflate until
    it masks itself (MAD can't be dragged by what it's measuring).

    Exactness: both quantile passes use the exact interpolated
    percentile (Spark ``percentile`` ≡ DuckDB ``quantile_cont``, the
    qm06-proven pairing); the outlier test compares each value
    against the UNROUNDED median/MAD derived identically on both
    engines, so the boolean never depends on display rounding.
    Shape at scale: two grouped percomputations over the type key
    (at 100 TB you'd swap in percentile_approx's mergeable sketch —
    qe08 gates that path), one broadcast join back, one count."""
    ev = t(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("m")
    )
    mad = (
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            F.percentile(F.abs(F.col("value") - F.col("m")), F.lit(0.5)).alias(
                "mad_raw"
            ),
            F.max("m").alias("m"),
        )
    )
    out = (
        ev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "m", "mad_raw")
        .agg(
            F.sum(
                F.when(
                    F.abs(F.col("value") - F.col("m"))
                    > 3.0 * F.col("mad_raw") * 1.4826,
                    1,
                ).otherwise(0)
            ).alias("n_outliers"),
            F.count("*").alias("n_events"),
        )
    )
    return out.select(
        "event_type",
        (F.round(F.col("m"), 4) + F.lit(0.0)).alias("median_value"),
        (F.round(F.col("mad_raw") * 1.4826, 4) + F.lit(0.0)).alias(
            "mad_sigma"
        ),
        "n_outliers",
        "n_events",
    ).orderBy("event_type")


@query(
    "qe32_activity_streaks",
    oracle="""
WITH ud AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
  FROM events
),
grp AS (
  SELECT user_id, day,
         day - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day)
                    AS INTEGER) AS anchor
  FROM ud
),
streaks AS (
  SELECT user_id, anchor,
         CAST(COUNT(*) AS BIGINT) AS len,
         MAX(day) AS streak_end
  FROM grp GROUP BY user_id, anchor
),
corpus_max AS (SELECT MAX(day) AS last_day FROM ud)
SELECT s.user_id,
       CAST(MAX(s.len) AS BIGINT) AS longest_streak,
       CAST(COUNT(*) AS BIGINT) AS n_streaks,
       CAST(COALESCE(MAX(CASE WHEN s.streak_end = cm.last_day
                              THEN s.len END), 0) AS BIGINT)
         AS current_streak
FROM streaks s CROSS JOIN corpus_max cm
GROUP BY s.user_id
ORDER BY s.user_id
""",
)
def qe32(spark, sf_dir):
    """Consecutive-day activity streaks per user — longest run, total
    number of runs, and the streak still alive on the corpus's last
    day (the engagement metric product teams call 'current streak').
    Built on the date-minus-row-number idiom: consecutive days share
    the constant anchor day − rn, so one GROUP BY collapses each run
    — the classic gaps-and-islands formulation on the DATE axis
    (qd14's islands are token positions; qe04's sessions are
    event-time gaps — this is the calendar-grain member of the
    family, and the rn-difference trick appears nowhere else in the
    registry).

    Shape at scale: distinct user-days first (collapses raw volume),
    then ONE user-partitioned window and two bounded aggregations;
    the corpus-max scalar broadcasts."""
    ud = (
        t(spark, sf_dir, "events")
        .select(
            "user_id",
            F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
        )
        .distinct()
    )
    w = W.partitionBy("user_id").orderBy("day")
    grp = ud.select(
        "user_id",
        "day",
        F.date_sub(F.col("day"), F.row_number().over(w)).alias("anchor"),
    )
    streaks = grp.groupBy("user_id", "anchor").agg(
        F.count("*").alias("len"), F.max("day").alias("streak_end")
    )
    corpus_max = ud.agg(F.max("day").alias("last_day"))
    return (
        streaks.crossJoin(F.broadcast(corpus_max))
        .groupBy("user_id")
        .agg(
            F.max("len").alias("longest_streak"),
            F.count("*").alias("n_streaks"),
            F.coalesce(
                F.max(
                    F.when(
                        F.col("streak_end") == F.col("last_day"), F.col("len")
                    )
                ),
                F.lit(0),
            ).alias("current_streak"),
        )
        .orderBy("user_id")
    )


def _qe33_sql_step(k: int) -> str:
    """One unrolled PageRank iteration (dangling-aware), quantized to
    pico-units so both engines sum exact integers."""
    prev = f"r{k - 1}"
    return f"""
d{k} AS (
  SELECT COALESCE(SUM(CAST(ROUND(r.r * 1e12) AS BIGINT)), 0) AS dm
  FROM {prev} r WHERE r.node NOT IN (SELECT prev_type FROM tot)
),
s{k} AS (
  SELECT p.dst AS node,
         SUM(CAST(ROUND(r.r * p.pij * 1e12) AS BIGINT)) AS s
  FROM p JOIN {prev} r ON r.node = p.src GROUP BY p.dst
),
r{k} AS (
  SELECT nodes.node,
         ROUND(0.15 / nn.n
               + 0.85 * (COALESCE(s.s, 0) / 1e12
                         + d.dm / 1e12 / nn.n), 9) + 0 AS r
  FROM nodes LEFT JOIN s{k} s USING (node), d{k} d, nn
)"""


@query(
    "qe33_event_type_pagerank",
    oracle=f"""
WITH nodes AS (SELECT DISTINCT event_type AS node FROM events),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
seq AS (
  SELECT event_type,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY CAST(ts AS TIMESTAMP), event_id)
           AS prev_type
  FROM events
),
pairs AS (
  SELECT prev_type, event_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY prev_type, event_type
),
tot AS (
  SELECT prev_type, CAST(SUM(n) AS BIGINT) AS tn FROM pairs GROUP BY prev_type
),
p AS (
  SELECT pr.prev_type AS src, pr.event_type AS dst,
         ROUND(CAST(pr.n AS DOUBLE) / tot.tn, 9) + 0 AS pij
  FROM pairs pr JOIN tot USING (prev_type)
),
r0 AS (SELECT node, ROUND(1.0 / nn.n, 9) + 0 AS r FROM nodes, nn),
{",".join(_qe33_sql_step(k) for k in (1, 2, 3))}
SELECT node AS event_type, ROUND(r, 6) + 0 AS pagerank
FROM r3 ORDER BY event_type
""",
)
def qe33(spark, sf_dir):
    """Damped PageRank (d = 0.85, dangling-aware, three iterations)
    over the event-type transition graph — eigenvector centrality of
    the behavioral Markov chain qe15 only tabulates. The stationary
    mass answers "where does a random session actually spend its
    time", which ranks hub states more honestly than raw counts
    (a type reached FROM many distinct states outranks one reached
    often from a single loop). Fourth member of the iterative trio:
    qv17 argmin loop, qm16 gradient loop, qv18 matvec loop — this is
    the Markov fixed-point loop, on a GRAPH rather than a matrix of
    features.

    Cross-engine exactness: edge probabilities round to 1e-9; each
    iteration sums pico-quantized BIGINT terms (rank mass and
    dangling mass), applies the damping arithmetic as one per-row
    scalar IEEE expression, and re-rounds to 1e-9 — both engines walk
    the identical trajectory from the uniform start.

    Shape at scale: the 100-TB work is the ONE user-partitioned lag
    window + pair count (same shuffle as qe15); the graph itself
    collapses to |types|² edges and is ``localCheckpoint``-ed before
    the iterations (qd07's discipline — iterative lineage otherwise
    branches the plan exponentially and re-runs the raw-event pass
    per iteration; materializing the bounded edge relation once is
    exactly what a 100-TB run must do). Each iteration is then a
    bounded-relation broadcast join over the materialized leaf — no
    collect. With a billion-node graph (user-user edges) the
    identical plan shape shuffles on dst instead of broadcasting;
    the quantization trick is partitioning-proof either way."""
    ev = t(spark, sf_dir, "events")
    nodes = (
        ev.select(F.col("event_type").alias("node"))
        .distinct()
        .localCheckpoint()
    )
    nn = nodes.agg(F.count("*").alias("n"))
    seq = ev.select(
        "event_type",
        F.lag("event_type")
        .over(W.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("prev_type"),
    )
    pairs = (
        seq.where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "event_type")
        .agg(F.count("*").alias("n"))
    )
    tot = pairs.groupBy("prev_type").agg(F.sum("n").alias("tn"))
    p = (
        pairs.join(F.broadcast(tot), "prev_type")
        .select(
            F.col("prev_type").alias("src"),
            F.col("event_type").alias("dst"),
            (
                F.round(F.col("n").cast("double") / F.col("tn"), 9)
                + F.lit(0.0)
            ).alias("pij"),
        )
        .localCheckpoint()
    )
    r = nodes.crossJoin(F.broadcast(nn)).select(
        "node", (F.round(F.lit(1.0) / F.col("n"), 9) + F.lit(0.0)).alias("r")
    )
    srcs = p.select(F.col("src").alias("node")).distinct()
    for _ in range(3):
        dang = (
            r.join(F.broadcast(srcs), "node", "left_anti")
            .agg(
                F.coalesce(
                    F.sum(F.round(F.col("r") * 1e12).cast("long")), F.lit(0)
                ).alias("dm")
            )
        )
        inflow = (
            p.join(
                F.broadcast(r.select(F.col("node").alias("src"), "r")), "src"
            )
            .select(
                F.col("dst").alias("node"),
                F.round(F.col("r") * F.col("pij") * 1e12)
                .cast("long")
                .alias("tq"),
            )
            .groupBy("node")
            .agg(F.sum("tq").alias("s"))
        )
        r = (
            nodes.join(F.broadcast(inflow), "node", "left")
            .crossJoin(F.broadcast(dang))
            .crossJoin(F.broadcast(nn))
            .select(
                "node",
                (
                    F.round(
                        F.lit(0.15) / F.col("n")
                        + F.lit(0.85)
                        * (
                            F.coalesce(F.col("s"), F.lit(0)) / F.lit(1e12)
                            + F.col("dm") / F.lit(1e12) / F.col("n")
                        ),
                        9,
                    )
                    + F.lit(0.0)
                ).alias("r"),
            )
            # per-round checkpoint of the |types|-row rank vector —
            # dang + inflow both reference r, so without it the plan
            # branches ~3× per iteration (qd07's per-round rule)
            .localCheckpoint()
        )
    return r.select(
        F.col("node").alias("event_type"),
        (F.round(F.col("r"), 6) + F.lit(0.0)).alias("pagerank"),
    ).orderBy("event_type")


@query(
    "qe34_ewma_trending",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2
),
decayed AS (
  SELECT a.event_type, a.day, a.n_events,
         SUM(CAST(ROUND(b.n_events * power(0.5, a.day - b.day) * 1e6)
                  AS BIGINT)) AS num,
         SUM(CAST(ROUND(power(0.5, a.day - b.day) * 1e6)
                  AS BIGINT)) AS den
  FROM daily a JOIN daily b
    ON b.event_type = a.event_type
   AND a.day - b.day BETWEEN 0 AND 13
  GROUP BY a.event_type, a.day, a.n_events
)
SELECT event_type, day, n_events,
       ROUND(CAST(num AS DOUBLE) / den, 6) + 0 AS ewma,
       ROUND(n_events * CAST(den AS DOUBLE) / num, 6) + 0 AS trend_ratio
FROM decayed
ORDER BY event_type, day
""",
)
def qe34(spark, sf_dir):
    """Exponentially-decayed daily volume (half-life = 1 day, 14-day
    horizon, weights normalized over the days actually present) plus
    the trending ratio today/EWMA — the decayed-count primitive
    behind every "trending now" ranker and the recency weighting
    feature stores apply to engagement counters. Distinct decay
    semantics from the registry's other smoothers: qw05 weights a
    trailing window uniformly, qe25 weights by interval duration —
    this weights by 2^-age, the only memoryless decay (what a
    streaming decayed counter maintains incrementally).

    Cross-engine exactness: each term n_j * 2^-age is an exact
    dyadic double (mantissa shift), micro-quantized to BIGINT before
    the sum, so partition order can't move the total; numerator and
    denominator divide once at the end. Shape at scale: the raw
    volume collapses to the (type, day) grid FIRST; the decay join
    is an equi-join on event_type over that days-bounded grid with a
    14-day band predicate — at 100 TB the grid is |types|x|days|
    rows, so this never touches raw events twice."""
    daily = (
        t(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
        )
        .agg(F.count("*").alias("n_events"))
    )
    a = daily.alias("a")
    b = daily.alias("b")
    age = F.datediff(F.col("a.day"), F.col("b.day"))
    decayed = (
        a.join(
            b,
            (F.col("b.event_type") == F.col("a.event_type"))
            & age.between(0, 13),
        )
        .groupBy(
            F.col("a.event_type").alias("event_type"),
            F.col("a.day").alias("day"),
            F.col("a.n_events").alias("n_events"),
        )
        .agg(
            F.sum(
                F.round(
                    F.col("b.n_events") * F.pow(F.lit(0.5), age) * 1e6
                ).cast("long")
            ).alias("num"),
            F.sum(
                F.round(F.pow(F.lit(0.5), age) * 1e6).cast("long")
            ).alias("den"),
        )
    )
    return decayed.select(
        "event_type",
        "day",
        "n_events",
        (
            F.round(F.col("num").cast("double") / F.col("den"), 6)
            + F.lit(0.0)
        ).alias("ewma"),
        (
            F.round(
                F.col("n_events") * F.col("den").cast("double") / F.col("num"),
                6,
            )
            + F.lit(0.0)
        ).alias("trend_ratio"),
    ).orderBy("event_type", "day")


@query(
    "qe35_cusum_changepoints",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2
),
stats AS (
  SELECT event_type,
         CAST(COUNT(*) AS DECIMAL(38,0)) AS cnt,
         CAST(SUM(n_events) AS DECIMAL(38,0)) AS s,
         CAST(SUM(n_events * n_events) AS DECIMAL(38,0)) AS q
  FROM daily GROUP BY event_type
),
dev AS (
  SELECT d.event_type, d.day, d.n_events,
         st.cnt * d.n_events - st.s AS e,
         st.cnt * st.q - st.s * st.s AS var_n2
  FROM daily d JOIN stats st USING (event_type)
),
pre1 AS (
  SELECT event_type, day, n_events, var_n2,
         SUM(e) OVER (PARTITION BY event_type ORDER BY day
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
  FROM dev
),
pre AS (
  SELECT event_type, day, n_events, var_n2, p,
         LEAST(CAST(0 AS DECIMAL(38,0)),
               MIN(p) OVER (PARTITION BY event_type ORDER BY day
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW)) AS m
  FROM pre1
)
SELECT event_type, day, n_events,
       CASE WHEN var_n2 = 0 THEN 0.0
            ELSE ROUND(CAST(p - m AS DOUBLE)
                       / sqrt(CAST(var_n2 AS DOUBLE)), 3) + 0
       END AS cusum_sigma,
       (p - m) * (p - m) > 16 * var_n2 AS shifted
FROM pre
ORDER BY event_type, day
""",
)
def qe35(spark, sf_dir):
    """One-sided CUSUM change-point detection on the daily volume
    series per event type: accumulate deviations from the whole-
    period mean and flag when the cumulative sum exceeds 4σ — the
    control-chart statistic that catches SUSTAINED small level shifts
    qe24's pointwise test is blind to (ten consecutive +1σ days never
    trip a 2σ pointwise flag but accumulate to +10σ here; the
    complement of qe24 global outliers and qe14 trailing z-scores).

    Mechanism (new to the registry): the CUSUM recursion
    C_t = max(0, C_{t-1} + e_t) is NON-associative and so not
    directly window-expressible — it is eliminated via the prefix-sum
    identity C_t = P_t − min(0, min_{j≤t} P_j), turning the recursion
    into two stacked per-type running windows. Cross-engine
    exactness: e_t = n·x_t − S is carried n-scaled in DECIMAL(38,0)
    (qe24's trick), prefix sums and running minima of exact decimals
    stay exact, and the 4σ flag is the pure integer comparison
    (P−m)² > 16·(nQ − S²) — no float can flip it; cusum_sigma is one
    identical scalar double expression rounded for display.

    Shape at scale: one hash aggregation onto the (type, day) grid,
    per-type moments broadcast back, then two type-partitioned
    windows over the days-bounded grid. Nothing scales with raw
    event volume past the first aggregation."""
    daily = (
        t(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
        )
        .agg(F.count("*").alias("n_events"))
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    stats = daily.groupBy("event_type").agg(
        dec(F.count("*")).alias("cnt"),
        dec(F.sum("n_events")).alias("s"),
        dec(F.sum(F.col("n_events") * F.col("n_events"))).alias("q"),
    )
    dev = daily.join(F.broadcast(stats), "event_type").select(
        "event_type",
        "day",
        "n_events",
        (F.col("cnt") * F.col("n_events") - F.col("s")).alias("e"),
        (F.col("cnt") * F.col("q") - F.col("s") * F.col("s")).alias(
            "var_n2"
        ),
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    pre = dev.select(
        "event_type",
        "day",
        "n_events",
        "var_n2",
        F.sum("e").over(w).alias("p"),
    ).select(
        "event_type",
        "day",
        "n_events",
        "var_n2",
        "p",
        F.least(
            F.lit(0).cast("decimal(38,0)"), F.min("p").over(w)
        ).alias("m"),
    )
    c = F.col("p") - F.col("m")
    return pre.select(
        "event_type",
        "day",
        "n_events",
        F.when(F.col("var_n2") == 0, F.lit(0.0))
        .otherwise(
            F.round(
                c.cast("double") / F.sqrt(F.col("var_n2").cast("double")), 3
            )
            + F.lit(0.0)
        )
        .alias("cusum_sigma"),
        (c * c > 16 * F.col("var_n2")).alias("shifted"),
    ).orderBy("event_type", "day")


@query(
    "qe36_variance_decomposition",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
),
mm AS (SELECT event_type, MIN(day) AS d0 FROM daily GROUP BY 1),
idx AS (
  SELECT d.event_type, d.day, d.y,
         CAST(d.day - mm.d0 AS BIGINT) AS x,
         dayofweek(d.day) AS wd
  FROM daily d JOIN mm USING (event_type)
),
st AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx
  FROM idx GROUP BY 1
),
mom AS (
  SELECT event_type, n, sy,
         n * sxy - sx * sy AS cov_n,
         n * sxx - sx * sx AS varx_n,
         sy * sxx - sx * sxy AS int_n
  FROM st
),
dq AS (
  SELECT i.event_type, i.wd,
         CASE WHEN m.varx_n = 0 THEN 0.0
              ELSE ROUND(CAST(m.varx_n * i.y - m.int_n - m.cov_n * i.x
                              AS DOUBLE) / m.varx_n, 6) + 0
         END AS d_q,
         ROUND(CAST(m.n * i.y - m.sy AS DOUBLE) / m.n, 6) + 0 AS dev_tot
  FROM idx i JOIN mom m USING (event_type)
),
sw AS (
  SELECT event_type, wd,
         SUM(CAST(ROUND(d_q * 1e6) AS BIGINT)) AS sdq,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM dq GROUP BY 1, 2
),
res AS (
  SELECT d.event_type, d.d_q, d.dev_tot,
         ROUND(d.d_q - (ROUND(sw.sdq / 1e6 / sw.c, 6) + 0), 6) + 0 AS r
  FROM dq d JOIN sw USING (event_type, wd)
),
ss AS (
  SELECT event_type,
         SUM(CAST(ROUND(dev_tot * dev_tot * 1e6) AS BIGINT)) AS ss_tot,
         SUM(CAST(ROUND(d_q * d_q * 1e6) AS BIGINT)) AS ss_det,
         SUM(CAST(ROUND(r * r * 1e6) AS BIGINT)) AS ss_res,
         CAST(COUNT(*) AS BIGINT) AS n_days
  FROM res GROUP BY 1
)
SELECT event_type, n_days,
       CASE WHEN ss_tot = 0 THEN 0.0
            ELSE ROUND(1 - CAST(ss_det AS DOUBLE) / ss_tot, 6) + 0
       END AS trend_share,
       CASE WHEN ss_tot = 0 THEN 0.0
            ELSE ROUND(CAST(ss_det - ss_res AS DOUBLE) / ss_tot, 6) + 0
       END AS seasonal_share,
       CASE WHEN ss_tot = 0 THEN 0.0
            ELSE ROUND(CAST(ss_res AS DOUBLE) / ss_tot, 6) + 0
       END AS residual_share
FROM ss ORDER BY event_type
""",
)
def qe36(spark, sf_dir):
    """Additive variance decomposition of the daily volume series:
    linear trend (qm19's OLS), then day-of-week seasonality on the
    detrended series, then residual — reporting what share of total
    variance each layer explains. The classical trend/seasonal/
    remainder decomposition (STL's additive skeleton) as ONE
    relational pass per layer; it turns qe19's hour-of-week SHAPE and
    qm19's slope into a single attribution ("volume is 60% weekly
    rhythm, 25% growth, 15% noise") — the triage number behind
    forecasting and anomaly-budget decisions.

    Cross-engine exactness: detrended deviations have the exact
    integer numerator varx_n·y − int_n − cov_n·x (one rounded scalar
    division); weekday means micro-quantize before summing; every sum
    of squares is a BIGINT micro-unit aggregation, so no share can
    flip on partition order. The weekday key uses each engine's
    native dayofweek — any bijection of the true weekday induces the
    SAME partition of days, so the grouping needs no cross-engine
    alignment. OLS guarantees ss_det ≤ ss_tot and within-group means
    guarantee ss_res ≤ ss_det, so all shares land in [0, 1] up to
    quantization. Shape at scale: raw events collapse to the
    (type, day) grid first; everything after is bounded-grid joins
    and aggregations, broadcast-sized."""
    daily = (
        t(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
        )
        .agg(F.count("*").alias("y"))
    )
    mm = daily.groupBy("event_type").agg(F.min("day").alias("d0"))
    idx = daily.join(F.broadcast(mm), "event_type").select(
        "event_type",
        "y",
        F.datediff(F.col("day"), F.col("d0")).cast("long").alias("x"),
        F.dayofweek("day").alias("wd"),
    )
    st = idx.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    mom = st.select(
        "event_type",
        "n",
        "sy",
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).alias(
            "cov_n"
        ),
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).alias(
            "varx_n"
        ),
        (F.col("sy") * F.col("sxx") - F.col("sx") * F.col("sxy")).alias(
            "int_n"
        ),
    )
    dq = idx.join(F.broadcast(mom), "event_type").select(
        "event_type",
        "wd",
        F.when(F.col("varx_n") == 0, F.lit(0.0))
        .otherwise(
            F.round(
                (
                    F.col("varx_n") * F.col("y")
                    - F.col("int_n")
                    - F.col("cov_n") * F.col("x")
                ).cast("double")
                / F.col("varx_n"),
                6,
            )
            + F.lit(0.0)
        )
        .alias("d_q"),
        (
            F.round(
                (F.col("n") * F.col("y") - F.col("sy")).cast("double")
                / F.col("n"),
                6,
            )
            + F.lit(0.0)
        ).alias("dev_tot"),
    )
    sw = dq.groupBy("event_type", "wd").agg(
        F.sum(F.round(F.col("d_q") * 1e6).cast("long")).alias("sdq"),
        F.count("*").alias("c"),
    )
    res = dq.join(F.broadcast(sw), ["event_type", "wd"]).select(
        "event_type",
        "d_q",
        "dev_tot",
        (
            F.round(
                F.col("d_q")
                - (
                    F.round(
                        F.col("sdq") / F.lit(1e6) / F.col("c"), 6
                    )
                    + F.lit(0.0)
                ),
                6,
            )
            + F.lit(0.0)
        ).alias("r"),
    )
    ss = res.groupBy("event_type").agg(
        F.sum(
            F.round(F.col("dev_tot") * F.col("dev_tot") * 1e6).cast("long")
        ).alias("ss_tot"),
        F.sum(
            F.round(F.col("d_q") * F.col("d_q") * 1e6).cast("long")
        ).alias("ss_det"),
        F.sum(F.round(F.col("r") * F.col("r") * 1e6).cast("long")).alias(
            "ss_res"
        ),
        F.count("*").alias("n_days"),
    )
    zero = F.lit(0.0)
    return ss.select(
        "event_type",
        "n_days",
        F.when(F.col("ss_tot") == 0, zero)
        .otherwise(
            F.round(
                1 - F.col("ss_det").cast("double") / F.col("ss_tot"), 6
            )
            + zero
        )
        .alias("trend_share"),
        F.when(F.col("ss_tot") == 0, zero)
        .otherwise(
            F.round(
                (F.col("ss_det") - F.col("ss_res")).cast("double")
                / F.col("ss_tot"),
                6,
            )
            + zero
        )
        .alias("seasonal_share"),
        F.when(F.col("ss_tot") == 0, zero)
        .otherwise(
            F.round(
                F.col("ss_res").cast("double") / F.col("ss_tot"), 6
            )
            + zero
        )
        .alias("residual_share"),
    ).orderBy("event_type")


# Cumulative Poisson(1) probabilities P(K <= k) as shared literals —
# identical decimal text on both engines → identical doubles.
_POIS1_CDF = (
    "0.36787944117144233",
    "0.7357588823428847",
    "0.9196986029286058",
    "0.9810118431238462",
    "0.9963401531726563",
    "0.9994058151824183",
)


def _qe37_sql_k(u: str) -> str:
    branches = " ".join(
        f"WHEN {u} < {p} THEN {k}" for k, p in enumerate(_POIS1_CDF)
    )
    return f"CASE {branches} ELSE 6 END"


@query(
    "qe37_bootstrap_ci",
    oracle=f"""
WITH reps AS (
  SELECT e.event_type, e.value,
         CAST(e.event_id AS VARCHAR) || ':' || CAST(g.r AS VARCHAR) AS seed
  FROM events e CROSS JOIN unnest(generate_series(0, 31)) AS g(r)
),
drawn AS (
  SELECT event_type, value, seed,
         {_qe37_sql_k("greatest(CAST(CAST(('0x' || substr(md5(seed), 1, 15)) AS BIGINT) AS DOUBLE) / POWER(2.0, 60), POWER(2.0, -60))")} AS k,
         CAST(split_part(seed, ':', 2) AS BIGINT) AS r
  FROM reps
),
rmeans AS (
  SELECT event_type, r,
         ROUND(CAST(SUM(k * CAST(value AS DECIMAL(12,2))) AS DOUBLE)
               / CAST(SUM(k) AS BIGINT), 6) + 0 AS mean_r
  FROM drawn GROUP BY event_type, r
  HAVING SUM(k) > 0
),
ranked AS (
  SELECT event_type, mean_r,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY mean_r, r) AS rn,
         CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n_reps
  FROM rmeans
),
ci AS (
  SELECT event_type, n_reps,
         MAX(CASE WHEN rn = 2 THEN mean_r END) AS ci_lo,
         MAX(CASE WHEN rn = n_reps - 1 THEN mean_r END) AS ci_hi
  FROM ranked GROUP BY event_type, n_reps
),
pt AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
         ROUND(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE)
               / COUNT(*), 6) + 0 AS mean_value
  FROM events GROUP BY event_type
)
SELECT pt.event_type, pt.n_events, pt.mean_value,
       ci.ci_lo, ci.ci_hi, ci.n_reps
FROM pt JOIN ci USING (event_type)
ORDER BY pt.event_type
""",
)
def qe37(spark, sf_dir):
    """Poisson-bootstrap confidence interval for the per-type mean
    event value: 32 resampling replicas where each row's multiplicity
    in replica r is an independent Poisson(1) draw — the bootstrap
    formulation that needs NO global resample (each row decides its
    own counts locally, so it distributes over any partitioning;
    the classic streaming/bootstrap-at-scale recipe). The interval is
    the 2nd/(n−1)th order statistics of the replica means (≈94%
    trimmed interval) — the registry's first RESAMPLING-based
    uncertainty estimate (qe08/qe16 bound sketch error; this bounds
    estimator error).

    Determinism/cross-engine: the Poisson draw is content-addressed —
    u = md5₆₀(event_id ':' replica)/2⁶⁰ (qc15's bit-identical uniform)
    pushed through a CASE ladder of shared CDF literals — so both
    engines draw the SAME counts; replica sums are exact
    (BIGINT count × DECIMAL value), each mean divides once, and the
    order statistics rank rounded means with the replica id as
    tiebreak. Shape at scale: one fan-out map (×32 rows — or a
    grouped k-vector per row to avoid it), one aggregation to
    (type, replica), then bounded windows over 32-row groups."""
    ev = t(spark, sf_dir, "events")
    reps = ev.select(
        "event_type",
        "value",
        F.col("event_id"),
        F.explode(F.sequence(F.lit(0), F.lit(31))).alias("r"),
    ).select(
        "event_type",
        "value",
        "r",
        F.concat_ws(":", F.col("event_id"), F.col("r")).alias("seed"),
    )
    u = F.greatest(
        F.conv(F.substring(F.md5(F.col("seed")), 1, 15), 16, 10)
        .cast("double")
        / F.lit(float(2**60)),
        F.lit(2.0 ** -60),
    )
    k = F.lit(6)
    for kk in range(len(_POIS1_CDF) - 1, -1, -1):
        k = F.when(u < float(_POIS1_CDF[kk]), F.lit(kk)).otherwise(k)
    drawn = reps.select("event_type", "r", k.alias("k"), money("value").alias("v"))
    rmeans = (
        drawn.groupBy("event_type", "r")
        .agg(
            F.sum(F.col("k") * F.col("v")).alias("s"),
            F.sum("k").alias("n"),
        )
        .where(F.col("n") > 0)
        .select(
            "event_type",
            "r",
            (
                F.round(F.col("s").cast("double") / F.col("n"), 6)
                + F.lit(0.0)
            ).alias("mean_r"),
        )
    )
    wr = W.partitionBy("event_type").orderBy("mean_r", "r")
    wc = W.partitionBy("event_type")
    ranked = rmeans.select(
        "event_type",
        "mean_r",
        F.row_number().over(wr).alias("rn"),
        F.count("*").over(wc).alias("n_reps"),
    )
    ci = ranked.groupBy("event_type", "n_reps").agg(
        F.max(F.when(F.col("rn") == 2, F.col("mean_r"))).alias("ci_lo"),
        F.max(
            F.when(F.col("rn") == F.col("n_reps") - 1, F.col("mean_r"))
        ).alias("ci_hi"),
    )
    pt = ev.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        (
            F.round(
                F.sum(money("value")).cast("double") / F.count("*"), 6
            )
            + F.lit(0.0)
        ).alias("mean_value"),
    )
    return (
        pt.join(F.broadcast(ci), "event_type")
        .select(
            "event_type", "n_events", "mean_value", "ci_lo", "ci_hi", "n_reps"
        )
        .orderBy("event_type")
    )


@query(
    "qe38_churn_hazard",
    oracle="""
WITH u AS (
  SELECT user_id,
         CAST(date_trunc('day', MIN(ts)) AS TIMESTAMP) AS first_day,
         CAST(date_trunc('day', MAX(ts)) AS TIMESTAMP) AS last_day
  FROM events GROUP BY user_id
),
g AS (
  SELECT first_day, last_day, CAST(COUNT(*) AS BIGINT) AS n
  FROM u GROUP BY first_day, last_day
),
d AS (SELECT DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day FROM events),
sums AS (
  SELECT d.day,
         CAST(SUM(CASE WHEN g.first_day <= d.day AND g.last_day >= d.day
                       THEN g.n ELSE 0 END) AS BIGINT) AS n_at_risk,
         CAST(SUM(CASE WHEN g.last_day = d.day THEN g.n ELSE 0 END)
              AS BIGINT) AS n_churned
  FROM d CROSS JOIN g
  GROUP BY d.day
)
SELECT day, n_at_risk, n_churned,
       ROUND(CAST(n_churned AS DOUBLE) / n_at_risk, 6) + 0 AS hazard
FROM sums
ORDER BY day
""",
)
def qe38(spark, sf_dir):
    """Discrete-time churn hazard (survival analysis over the event
    log): for each observed day d, the risk set is every user whose
    activity span covers d (first_day <= d <= last_day) and the
    hazard is the share of that risk set whose LAST event falls on d.
    qe27's growth accounting counts day-over-day state transitions;
    this is the survival-curve view a retention model is trained on
    — per-day conditional churn probability with its exact risk-set
    denominator.

    Scale shape: the naive formulation explodes events x days; here
    users collapse to an activity-span grid grouped by (first_day,
    last_day) — at most |days|^2 rows no matter how many users — and
    the day table (bounded by the calendar) cross-joins the
    BROADCAST grid, so after the two groupBys nothing large moves.
    Every day observed in the log has >= 1 user at risk (the user
    who produced the day's events), so the hazard division is safe.
    Integer counts end to end; the single double is rounded and
    signed-zero-guarded on both engines."""
    ev = t(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("first_day"),
        F.date_trunc("day", F.max("ts")).alias("last_day"),
    )
    g = u.groupBy("first_day", "last_day").agg(F.count("*").alias("n"))
    d = ev.select(F.date_trunc("day", "ts").alias("day")).distinct()
    sums = (
        d.crossJoin(F.broadcast(g))
        .groupBy("day")
        .agg(
            F.sum(
                F.when(
                    (F.col("first_day") <= F.col("day"))
                    & (F.col("last_day") >= F.col("day")),
                    F.col("n"),
                ).otherwise(F.lit(0))
            ).alias("n_at_risk"),
            F.sum(
                F.when(F.col("last_day") == F.col("day"), F.col("n")).otherwise(
                    F.lit(0)
                )
            ).alias("n_churned"),
        )
    )
    return sums.select(
        "day",
        "n_at_risk",
        "n_churned",
        (
            F.round(F.col("n_churned").cast("double") / F.col("n_at_risk"), 6)
            + F.lit(0.0)
        ).alias("hazard"),
    ).orderBy("day")


@query(
    "qe39_seasonal_backtest",
    oracle="""
WITH d AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS vol
  FROM events GROUP BY event_type, day
),
scored AS (
  SELECT cur.event_type, cur.vol AS actual, prev.vol AS forecast,
         ABS(cur.vol - prev.vol) AS abs_err
  FROM d cur JOIN d prev
    ON cur.event_type = prev.event_type AND cur.day = prev.day + 7
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_scored,
       CAST(SUM(actual) AS BIGINT) AS total_actual,
       CAST(SUM(abs_err) AS BIGINT) AS total_abs_err,
       ROUND(CAST(SUM(abs_err) AS DOUBLE) / COUNT(*), 6) + 0 AS mae,
       ROUND(CAST(SUM(abs_err) AS DOUBLE) / SUM(actual), 6) + 0 AS wape
FROM scored
GROUP BY event_type
ORDER BY event_type
""",
)
def qe39(spark, sf_dir):
    """Seasonal-naive forecast backtest — the evaluation loop a volume
    forecasting model is judged against: predict each day's per-type
    event volume with the same weekday one week earlier (the
    seasonal-naive baseline every published forecast must beat) and
    score MAE and WAPE per event type over every day that has a
    7-day-back observation. qm19 FITS a trend and qe34 ranks trending
    types; this closes the loop with the error measurement itself,
    and the seasonal-naive errors it reports are the denominators a
    MASE computation would feed on.

    Scale shape: one groupBy to the (type, day) grid — bounded by
    |types|·|days| regardless of event volume — then a self equi
    join ON day = prev_day + 7 (exact calendar semantics; a lag-7
    ROW window would silently misalign across gaps) and a rollup to
    |types| rows. Numerators are exact integer |error| sums; the two
    divisions are round-6 with the signed-zero guard, and actual > 0
    by construction (a scored day has >= 1 event)."""
    ev = t(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count("*").alias("vol"))
    cur = d.select(
        "event_type", "day", F.col("vol").alias("actual")
    )
    prev = d.select(
        "event_type",
        F.date_add("day", 7).alias("day"),
        F.col("vol").alias("forecast"),
    )
    scored = cur.join(prev, ["event_type", "day"]).select(
        "event_type",
        "actual",
        F.abs(F.col("actual") - F.col("forecast")).alias("abs_err"),
    )
    return (
        scored.groupBy("event_type")
        .agg(
            F.count("*").alias("n_scored"),
            F.sum("actual").alias("total_actual"),
            F.sum("abs_err").alias("total_abs_err"),
            (
                F.round(F.sum("abs_err").cast("double") / F.count("*"), 6)
                + F.lit(0.0)
            ).alias("mae"),
            (
                F.round(
                    F.sum("abs_err").cast("double") / F.sum("actual"), 6
                )
                + F.lit(0.0)
            ).alias("wape"),
        )
        .orderBy("event_type")
    )
