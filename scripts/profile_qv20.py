"""qv20 decomposition profile (round 13, verdict item 1).

Runs qv20's two retrieval sides and the full fusion separately,
repeated and interleaved, with the UI REST API pulled for per-stage
task metrics (spill, peak memory, shuffle bytes) so the 6.72 s driver
wall can be attributed: bm25 side vs fold-kernel side vs fusion.

Usage: PYTHONPATH=/root/repo python scripts/profile_qv20.py [reps]
Honors $SPARK_GRAFT_CPUS / $SPARK_GRAFT_SF_DIR like bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from ml_data_wrangler_spark.operators.similarity import (
        brute_force_topk_fold,
    )
    from ml_data_wrangler_spark.plans import registry
    from ml_data_wrangler_spark.plans._util import t
    from ml_data_wrangler_spark.plans.text_queries import bm25_rankings
    from ml_data_wrangler_spark.session import get_spark

    spark = get_spark(
        app_name="mdw-profile-qv20",
        extra_conf={"spark.ui.enabled": "true",
                    "spark.ui.showConsoleProgress": "false"},
    )
    sc = spark.sparkContext
    queries = registry.queries()

    # warm-up identical to bench.py (parquet reader, shuffle, codegen,
    # plus one Arrow python-worker spin-up so the fold side isn't
    # charged for it)
    queries["q01_pricing_summary"](spark, sf_dir).count()
    queries["qv01_knn_bruteforce"](spark, sf_dir).count()

    def probe() -> float:
        samples = []
        for _ in range(6):
            t0 = time.time()
            sc.parallelize(range(32), 32).count()
            samples.append((time.time() - t0) * 1000)
        samples.sort()
        return samples[len(samples) // 2]

    def btop_only():
        return bm25_rankings(spark, sf_dir, 20).select(
            "query_id", "cand_id", F.col("rnk").alias("text_rank")
        )

    def vtop_only():
        emb_raw = t(spark, sf_dir, "embeddings")
        return brute_force_topk_fold(
            emb_raw, emb_raw.where(F.col("vec_id") % 20 == 0), k=20
        ).select(
            "query_id",
            F.col("neighbor_id").alias("cand_id"),
            F.col("rank").cast("int").alias("vec_rank"),
        )

    def full():
        return queries["qv20_hybrid_rrf_fusion"](spark, sf_dir)

    parts = [("btop", btop_only), ("vtop", vtop_only), ("full", full)]
    walls: dict[str, list[float]] = {n: [] for n, _ in parts}
    p0 = probe()
    for rep in range(reps):
        for pname, builder in parts:
            group = f"qv20:{pname}:{rep}"
            sc.setJobGroup(group, group)
            t0 = time.time()
            builder().count()
            walls[pname].append(round(time.time() - t0, 3))
            sc.setJobGroup(None, None)
    p1 = probe()

    base = "http://127.0.0.1:4040/api/v1/applications"
    app_id = sc.applicationId
    with urllib.request.urlopen(f"{base}/{app_id}/jobs") as r:
        jobs = json.loads(r.read())
    agg: dict[str, dict] = {}
    stage_ids: dict[str, list[int]] = {}
    for j in jobs:
        g = j.get("jobGroup") or ""
        if not g.startswith("qv20:"):
            continue
        part = g.split(":")[1]
        a = agg.setdefault(part, {"jobs": 0, "tasks": 0})
        a["jobs"] += 1
        a["tasks"] += j.get("numCompletedTasks", 0)
        stage_ids.setdefault(part, []).extend(j.get("stageIds", []))

    # per-stage metrics for the heavy stages of each part
    detail: dict[str, list] = {}
    for part, sids in stage_ids.items():
        rows = []
        for sid in sorted(set(sids)):
            try:
                with urllib.request.urlopen(
                    f"{base}/{app_id}/stages/{sid}"
                ) as r:
                    sinfos = json.loads(r.read())
            except Exception:
                continue
            for si in sinfos:
                if si.get("status") != "COMPLETE":
                    continue
                rows.append(
                    {
                        "stage": sid,
                        "name": (si.get("name") or "")[:60],
                        "tasks": si.get("numCompleteTasks"),
                        "run_ms": si.get("executorRunTime"),
                        "cpu_ms": (si.get("executorCpuTime") or 0) // 1_000_000,
                        "spill_mem": si.get("memoryBytesSpilled"),
                        "spill_disk": si.get("diskBytesSpilled"),
                        "peak_mem": si.get("peakExecutorMetrics", {}).get(
                            "JVMHeapMemory"
                        ),
                        "sh_read": si.get("shuffleReadBytes"),
                        "sh_write": si.get("shuffleWriteBytes"),
                        "in_bytes": si.get("inputBytes"),
                    }
                )
        rows.sort(key=lambda d: -(d["run_ms"] or 0))
        detail[part] = rows[:8]

    out = {
        "cpus": sc.defaultParallelism,
        "probe_ms_before": round(p0),
        "probe_ms_after": round(p1),
        "walls": walls,
        "agg": agg,
        "top_stages": detail,
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
