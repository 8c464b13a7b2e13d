"""Stage-level parallelism audit for registry queries.

Round-6 lesson: a 6×-tier Spark line that is "explained" by duplicate
density can still hide a near-serial stage (qd09 read as explained and
was an 8.7× parallelism defect). This script executes queries with the
Spark event log on and prints, per query, every stage's task count and
total executor run time, so heavy lines are pinned with MEASURED task
histograms instead of narrative.

Since round 8 the event-log parsing lives in tests/stage_audit.py and
the parity sweep itself (tests/run_parity.py) prints a per-query
parallelism verdict for heavy lines; this script remains the
full-histogram drill-down for investigating a flagged query.

Usage:
    PYTHONPATH=/root/repo python scripts/audit_stage_parallelism.py \
        SF_DIR --only q1,q2 [--min-task-sec 1.0]

Output per query: wall seconds, then one line per stage
    stage <id> tasks=<n> run=<executor-seconds> max_task=<s> <name head>
sorted by executor run time; stages whose total run time exceeds
--min-task-sec and whose task count is below half the session
parallelism are flagged SERIAL.
"""

from __future__ import annotations

import os
import shutil
import sys
import time


def main() -> int:
    argv = list(sys.argv[1:])

    def _flag_arg(flag: str) -> str | None:
        if flag not in argv:
            return None
        i = argv.index(flag)
        if i + 1 >= len(argv) or argv[i + 1].startswith("--"):
            sys.exit(f"usage: {flag} requires an argument")
        value = argv[i + 1]
        del argv[i : i + 2]
        return value

    only_arg = _flag_arg("--only")
    only = set(only_arg.split(",")) if only_arg else None
    min_task_sec = float(_flag_arg("--min-task-sec") or "1.0")
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"

    from ml_data_wrangler_spark.plans import registry
    from tests.stage_audit import event_log_conf, serial_stages, stages_by_group

    queries = registry.queries()
    if only:
        unknown = sorted(only - set(queries))
        if unknown:
            sys.exit(f"unknown --only names: {', '.join(unknown)}")

    event_dir = "/tmp/spark-events-audit"
    shutil.rmtree(event_dir, ignore_errors=True)

    from ml_data_wrangler_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 8))
    spark = get_spark(
        app_name="stage-audit",
        cpus=cpus,
        shuffle_partitions=max(cpus, 8),
        driver_memory=os.environ.get("SPARK_DRIVER_MEMORY", "8g"),
        extra_conf=event_log_conf(event_dir),
    )
    sc = spark.sparkContext

    # run each query under its own job group so the event log's jobs
    # (which carry spark.jobGroup.id) can be attributed back
    walls: dict[str, float] = {}
    for name in sorted(queries):
        if only is not None and name not in only:
            continue
        sc.setJobGroup(name, name)
        t0 = time.time()
        n = queries[name](spark, sf_dir).count()
        walls[name] = time.time() - t0
        print(f"ran {name}: {walls[name]:.1f}s wall, {n} rows", flush=True)
    sc.setJobGroup("", "")
    app_id = sc.applicationId
    spark.stop()

    by_group = stages_by_group(event_dir, app_id)
    for group in sorted(by_group):
        if only is not None and group not in only:
            continue
        print(f"\n=== {group} (wall {walls.get(group, float('nan')):.1f}s) ===")
        flagged = {s.stage_id for s in serial_stages(by_group[group], cpus, min_task_sec)}
        for s in by_group[group]:
            if s.run_sec < 0.05:
                continue
            flag = "  <-- SERIAL" if s.stage_id in flagged else ""
            print(
                f"  stage {s.stage_id:4d} tasks={s.n_tasks:3d} "
                f"run={s.run_sec:8.1f}s max_task={s.max_task_sec:7.1f}s "
                f"{s.name[:70]}{flag}",
                flush=True,
            )
    return 0


if __name__ == "__main__":
    sys.exit(main())
