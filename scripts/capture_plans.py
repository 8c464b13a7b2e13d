"""Capture .explain("formatted") for bench queries into plans/<dir>/.

Usage:
    python scripts/capture_plans.py <tag> [name1,name2,...]

Writes plans/$SPARK_GRAFT_PLANS_DIR/<query>_<tag>.txt for each query
(default dir r13; default set: the full bench tier-1 + tier-2 set plus
the PRE-CHECKPOINT component probes below). Plan-only for most
queries — but queries that probe/collect during build (qd17's stats
probe, qv18/qe33's driver loops, qt20's argmax) EXECUTE those parts,
so expect real Spark jobs while this runs. With AQE on these are the
initial plans (isFinalPlan=false), the judge-checkable artifact the
round asks for.

Pre-checkpoint probes (round 13, r12 verdict item 8): a query whose
intermediates are localCheckpoint-ed explains as ExistingRDD leaves,
hiding the subtree the optimization claims are about. For those, the
builder of the pre-checkpoint DataFrame is exposed module-level and
captured here under a component pseudo-name.
"""

from __future__ import annotations

import os
import sys

BENCH_SET = [
    "q01_pricing_summary", "q02_revenue_by_month", "q03_shipping_priority",
    "q05_region_revenue", "q09_profit_by_nation_year",
    "q13_customer_order_histogram", "q18_large_orders",
    "qw01_top3_orders_per_customer", "qw06_nation_revenue_share",
    "qg01_rollup_returns", "qe01_hourly_by_type", "qe04_sessionize",
    "qj01_asof_purchase_click", "qj03_session_overlap_pairs",
    "qc01_dataset_splits", "qt01_top_tokens", "qt04_quality_scores",
    "qd01_exact_dedup", "qd02_ngram_jaccard_pairs", "qv01_knn_bruteforce",
    "qv05_ivf_ann", "qm01_vocabulary", "qm04_lda_coherence_sweep",
    "qs01_stream_tumbling_hourly",
    "qe33_event_type_pagerank", "qv17_lloyd_kmeans",
    "qv18_pca_power_iteration", "qd17_similarity_triangles",
    "qt19_bm25_retrieval", "qt20_bpe_merges", "qv20_hybrid_rrf_fusion",
]


def _component_builders():
    """Pseudo-name → builder(spark, sf_dir) for pre-checkpoint
    subtrees the final query plans truncate."""
    from ml_data_wrangler_spark.plans.dedup_queries import _qd17_edges

    return {
        # the r12 edge-build rework: single tokenize subtree feeding a
        # ShuffledHashJoin that reuses one exchange on shingle
        "qd17_edge_build": _qd17_edges,
    }


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    plans_dir = os.environ.get("SPARK_GRAFT_PLANS_DIR", "r13")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                           "plans", plans_dir)
    os.makedirs(out_dir, exist_ok=True)

    from ml_data_wrangler_spark.plans import registry
    from ml_data_wrangler_spark.session import get_spark

    spark = get_spark(app_name="mdw-capture-plans")
    queries = registry.queries()
    components = _component_builders()
    if names is None:
        names = BENCH_SET + sorted(components)
    for name in names:
        fn = components.get(name) or queries[name]
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # capture the failure as evidence too
            plan = f"PLAN CAPTURE FAILED: {type(exc).__name__}: {exc}\n"
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)", flush=True)


if __name__ == "__main__":
    main()
