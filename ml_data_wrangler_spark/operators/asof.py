"""As-of (point-in-time) join — an operator the reference lacks and
Spark has no built-in for (north-star extension; the standard
time-series primitive in kdb/QuestDB/DuckDB ASOF JOIN).

Spark-first formulation: tag both sides, UNION them, and carry the
most recent right-side payload forward with ``last(..., ignorenulls)``
over a (key, time)-ordered window. ONE shuffle on the key, linear
work, no per-pair explosion — this is the 100 TB-safe shape (a naive
range self-join is O(left × right-per-key)).

Tie rule: a right row at exactly t matches a left row at t
(``left.ts >= right.ts``) — right rows sort before left rows at equal
timestamps via the side tag.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: dict[str, str] | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.ts <= left.ts`` for the same key (left outer: unmatched
    left rows keep nulls).

    ``right_payload`` maps right column → output alias. Right side must
    be unique per (key, ts) — dedupe upstream for deterministic output.

    Returns the left DataFrame's columns + aliased right payload +
    ``matched_ts`` (the right timestamp that matched).
    """
    right_payload = right_payload or {}
    lcols = [c for c in left.columns]

    l_tagged = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),  # left sorts after right at equal ts
        *[F.col(c).alias(f"_l_{c}") for c in lcols],
        *[F.lit(None).cast(right.schema[rc].dataType).alias(f"_r_{rc}") for rc in right_payload],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("_r_ts"),
    )
    r_tagged = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}") for c in lcols],
        *[F.col(rc).alias(f"_r_{rc}") for rc in right_payload],
        F.col(right_ts).alias("_r_ts"),
    )
    w = (
        W.partitionBy("_k")
        .orderBy("_t", "_side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = l_tagged.unionByName(r_tagged).select(
        "*",
        *[
            F.last(f"_r_{rc}", ignorenulls=True).over(w).alias(f"_c_{rc}")
            for rc in right_payload
        ],
        F.last("_r_ts", ignorenulls=True).over(w).alias("_c_ts"),
    )
    return carried.where(F.col("_side") == 1).select(
        *[F.col(f"_l_{c}").alias(c) for c in lcols],
        *[F.col(f"_c_{rc}").alias(alias) for rc, alias in right_payload.items()],
        F.col("_c_ts").alias("matched_ts"),
    )
