"""Per-query job/stage/task profile of the bench set (guide §1).

Runs each bench query once (same methodology as bench.py: build + count)
with the UI enabled, then pulls the REST API to attribute jobs, stages,
tasks, and executor-cpu seconds to each query via job groups. Output is
one line per query:

    name  wall_s  n_jobs  n_stages  n_tasks  task_time_s

High n_jobs with low task_time ⇒ the query is paying fixed per-job
scheduling latency (checkpoints, .first() probes, iterative loops), the
dominant overhead regime on this box (~0.1-0.2 s per job measured);
high task_time ⇒ real compute.

Usage: PYTHONPATH=/root/repo python scripts/profile_bench.py [names...]
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request

from scripts.capture_plans import BENCH_SET


def main() -> None:
    names = sys.argv[1:] or BENCH_SET
    sf_dir = "/root/testdata/sf0.1"

    from ml_data_wrangler_spark.plans import registry
    from ml_data_wrangler_spark.session import get_spark

    spark = get_spark(
        app_name="mdw-profile",
        extra_conf={"spark.ui.enabled": "true",
                    "spark.ui.showConsoleProgress": "false"},
    )
    sc = spark.sparkContext
    queries = registry.queries()

    # warm-up identical to bench.py
    queries["q01_pricing_summary"](spark, sf_dir).count()
    from bench import _warm_mllib

    _warm_mllib(spark)

    base = "http://127.0.0.1:4040/api/v1/applications"
    app_id = sc.applicationId

    def jobs() -> list[dict]:
        with urllib.request.urlopen(f"{base}/{app_id}/jobs?status=succeeded") as r:
            return json.loads(r.read())

    results = {}
    for name in names:
        fn = queries[name]
        sc.setJobGroup(name, name)
        t0 = time.time()
        df = fn(spark, sf_dir)
        n = df.count()
        wall = time.time() - t0
        sc.setJobGroup(None, None)
        results[name] = {"wall": round(wall, 2), "rows": n}

    time.sleep(2)
    agg: dict[str, dict] = {}
    for j in jobs():
        g = j.get("jobGroup")
        if g not in results:
            continue
        a = agg.setdefault(g, {"jobs": 0, "stages": 0, "tasks": 0})
        a["jobs"] += 1
        a["stages"] += len(j.get("stageIds", []))
        a["tasks"] += j.get("numCompletedTasks", 0)

    print(f"{'query':36s}{'wall_s':>8s}{'jobs':>6s}{'stages':>8s}{'tasks':>7s}")
    for name in names:
        r = results[name]
        a = agg.get(name, {"jobs": 0, "stages": 0, "tasks": 0})
        print(f"{name:36s}{r['wall']:8.2f}{a['jobs']:6d}{a['stages']:8d}"
              f"{a['tasks']:7d}")
    print(json.dumps({n: {**results[n], **agg.get(n, {})} for n in names}))


if __name__ == "__main__":
    main()
