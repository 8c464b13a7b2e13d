"""asof_join_backward semantics: backward match, equal-ts tie rule
(right row at t matches left row at t), no-match nulls, per-key
isolation."""

from __future__ import annotations

import datetime

from pyspark.sql import Row

from ml_data_wrangler_spark.operators.asof import asof_join_backward


def _ts(s: str) -> datetime.datetime:
    return datetime.datetime.fromisoformat(s)


def test_asof_backward_semantics(spark):
    left = spark.createDataFrame(
        [
            Row(k=1, lts=_ts("2024-01-01 10:00:00"), lid=100),  # after r1, r2
            Row(k=1, lts=_ts("2024-01-01 08:00:00"), lid=101),  # tie with r1
            Row(k=1, lts=_ts("2024-01-01 07:00:00"), lid=102),  # before all
            Row(k=2, lts=_ts("2024-01-01 10:00:00"), lid=103),  # other key
        ]
    ).select("k", "lts", "lid")
    right = spark.createDataFrame(
        [
            Row(k=1, ts=_ts("2024-01-01 08:00:00"), rid=200),
            Row(k=1, ts=_ts("2024-01-01 09:00:00"), rid=201),
            Row(k=2, ts=_ts("2024-01-01 09:30:00"), rid=202),
        ]
    ).select("k", "ts", "rid")

    out = {
        r["lid"]: (r["rid"], r["matched_ts"])
        for r in asof_join_backward(
            left, right, key="k", left_ts="lts", right_ts="ts",
            right_payload={"rid": "rid"},
        ).collect()
    }
    assert out[100] == (201, _ts("2024-01-01 09:00:00"))  # latest ≤ 10:00
    assert out[101] == (200, _ts("2024-01-01 08:00:00"))  # equal ts matches
    assert out[102] == (None, None)  # nothing before 07:00
    assert out[103] == (202, _ts("2024-01-01 09:30:00"))  # key-2 isolated


def test_interval_overlap_pairs_edges(spark):
    """Binned interval join: inclusive-end touching, cross-bin spans,
    and disjoint intervals — results must equal the naive predicate."""
    import datetime as dt

    from pyspark.sql import Row

    from ml_data_wrangler_spark.operators.asof import interval_overlap_pairs

    T0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def iv(i, s_min, e_min):
        return Row(
            id=i,
            start=T0 + dt.timedelta(minutes=s_min),
            end=T0 + dt.timedelta(minutes=e_min),
        )

    rows = [
        iv(1, 0, 50),      # overlaps 2 (cross-bin), touches 3 at its end
        iv(2, 55, 70),     # crosses the 60-min bin boundary; overlaps 3
        iv(3, 50, 120),    # touches 1 endpoint-inclusive; spans 3 bins
        iv(4, 300, 310),   # disjoint from everything
    ]
    df = spark.createDataFrame(rows)
    got = {
        (r["a_id"], r["b_id"])
        for r in interval_overlap_pairs(
            df, id_cols=["id"], start_col="start", end_col="end", bin_seconds=3600
        ).collect()
    }
    # naive ground truth: a.start <= b.end AND b.start <= a.end
    naive = set()
    for a in rows:
        for b in rows:
            if (a.id < b.id) and a.start <= b.end and b.start <= a.end:
                naive.add((a.id, b.id))
    assert got == naive
    assert (1, 3) in got  # endpoint-inclusive touch at minute 50
    assert (1, 2) not in got  # 50 < 55: disjoint
    assert not any(4 in p for p in got)


def test_asof_forward_matches_naive(spark):
    """Forward as-of on a crafted fixture: first right at-or-after each
    left ts, exact-ts ties match, later-than-tolerance matches null."""
    from pyspark.sql import Row

    from ml_data_wrangler_spark.operators.asof import asof_join_forward

    import datetime as dt

    def ts(s):
        return dt.datetime(2024, 1, 1, 0, 0, s)

    left = spark.createDataFrame(
        [Row(id=1, k=1, ts=ts(10)), Row(id=2, k=1, ts=ts(25)), Row(id=3, k=2, ts=ts(5))]
    )
    right = spark.createDataFrame(
        [Row(k=1, ts=ts(10), v="a"), Row(k=1, ts=ts(30), v="b"), Row(k=2, ts=ts(50), v="c")]
    )
    out = {
        r["id"]: (r["val"], r["matched_ts"])
        for r in asof_join_forward(
            left, right, key="k", right_payload={"v": "val"}
        ).collect()
    }
    assert out[1] == ("a", ts(10))   # exact-ts tie matches
    assert out[2] == ("b", ts(30))   # next following
    assert out[3] == ("c", ts(50))
    bounded = {
        r["id"]: r["val"]
        for r in asof_join_forward(
            left, right, key="k", right_payload={"v": "val"}, tolerance_seconds=10
        ).collect()
    }
    assert bounded[1] == "a" and bounded[2] == "b"
    assert bounded[3] is None        # 45s ahead > 10s tolerance
