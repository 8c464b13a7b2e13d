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
