"""Bench harness: runs the headline query suite at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line:
  {"metric": "suite_sec", "value": <total>, "unit": "sec",
   "queries": {"q01_pricing_summary": sec, ...}, "sf": 0.1}

Per-query time = wall time of plan construction + full materialization
(count-style action that forces every row). A JVM warm-up query runs
first so JIT/codegen overhead isn't attributed to the first query.
"""

from __future__ import annotations

import json
import os
import sys
import time

# Headline set: one per operator family, weighted toward the ops that
# dominate real pipelines (scan-agg, fact-fact join, window, text,
# dedup, ANN, vocabulary).
HEADLINE = [
    "q01_pricing_summary",
    "q02_revenue_by_month",
    "q03_shipping_priority",
    "q05_region_revenue",
    "q09_profit_by_nation_year",
    "q13_customer_order_histogram",
    "q18_large_orders",
    "qw01_top3_orders_per_customer",
    "qw06_nation_revenue_share",
    "qg01_rollup_returns",
    "qe01_hourly_by_type",
    "qe04_sessionize",
    "qj01_asof_purchase_click",
    "qj03_session_overlap_pairs",
    "qc01_dataset_splits",
    "qt01_top_tokens",
    "qt04_quality_scores",
    "qd01_exact_dedup",
    "qd02_ngram_jaccard_pairs",
    "qv01_knn_bruteforce",
    "qv05_ivf_ann",
    "qm01_vocabulary",
    "qm04_lda_coherence_sweep",
    "qs01_stream_tumbling_hourly",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    from ml_data_wrangler_spark.plans import registry
    from ml_data_wrangler_spark.session import get_spark

    spark = get_spark(app_name="mdw-bench")
    queries = registry.queries()

    # warm-up: exercise parquet reader, shuffle, codegen paths once
    warm = queries["q01_pricing_summary"]
    warm(spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries[name]
        t0 = time.time()
        df = fn(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {timings[name]}s ({n} rows)", file=sys.stderr, flush=True)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "suite_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
