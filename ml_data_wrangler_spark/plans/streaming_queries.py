"""Streaming queries registered in the driver gate: each runs a REAL
Structured Streaming job (file source → windowed aggregation → memory
sink, availableNow trigger) and returns the materialized result, which
must hash-match the same SQL the batch dual (events_queries) uses —
proving the streaming operators compute the batch-equivalent answer.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ml_data_wrangler_spark.plans._util import dbl, money
from ml_data_wrangler_spark.plans.registry import query
from ml_data_wrangler_spark.streaming.windows import (
    read_events_stream,
    run_to_memory,
    tumbling_counts,
)


@query(
    "qs01_stream_tumbling_hourly",
    oracle="""
SELECT date_trunc('hour', ts) AS win_start, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
""",
)
def qs01(spark, sf_dir):
    """Structured Streaming tumbling-window aggregation, checked
    against the batch SQL oracle (complete output mode over a bounded
    file source ⇒ exactly the batch answer)."""
    stream = read_events_stream(spark, sf_dir)
    agg = tumbling_counts(stream, window="1 hour", watermark="2 hours")
    return run_to_memory(agg, "qs01_sink", output_mode="complete")
