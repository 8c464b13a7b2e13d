"""Stage-level parallelism audit for registry queries.

Round-6 lesson: a 6×-tier Spark line that is "explained" by duplicate
density can still hide a near-serial stage (qd09 read as explained and
was an 8.7× parallelism defect). This script executes queries with the
Spark event log on and prints, per query, every stage's task count and
total executor run time, so heavy lines are pinned with MEASURED task
histograms instead of narrative.

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

import json
import os
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

    queries = registry.queries()
    if only:
        unknown = sorted(only - set(queries))
        if unknown:
            sys.exit(f"unknown --only names: {', '.join(unknown)}")

    import shutil

    event_dir = "/tmp/spark-events-audit"
    shutil.rmtree(event_dir, ignore_errors=True)
    os.makedirs(event_dir, exist_ok=True)

    from ml_data_wrangler_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 8))
    spark = get_spark(
        app_name="stage-audit",
        cpus=cpus,
        shuffle_partitions=max(cpus, 8),
        driver_memory=os.environ.get("SPARK_DRIVER_MEMORY", "8g"),
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{event_dir}",
        },
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

    # parse the event log: job -> group, job -> stage ids, stage
    # metrics. Spark 4 writes a rolling v2 DIRECTORY
    # (eventlog_v2_<app>/events_*_<app>); older versions a flat file.
    flat = os.path.join(event_dir, app_id)
    if os.path.isfile(flat):
        log_files = [flat]
    else:
        v2 = os.path.join(event_dir, f"eventlog_v2_{app_id}")
        log_files = sorted(
            os.path.join(v2, f)
            for f in os.listdir(v2)
            if f.startswith("events_")
        )
    job_group: dict[int, str] = {}
    job_stages: dict[int, list[int]] = {}
    stage_info: dict[int, dict] = {}
    task_time: dict[int, float] = {}
    task_max: dict[int, float] = {}
    task_n: dict[int, int] = {}

    def _events():
        import io
        import subprocess

        for path in log_files:
            if path.endswith(".zstd"):
                # Spark compresses rolling event logs with zstd
                proc = subprocess.Popen(
                    ["zstd", "-dc", path], stdout=subprocess.PIPE
                )
                yield from io.TextIOWrapper(proc.stdout)
                proc.wait()
            else:
                with open(path) as fh:
                    yield from fh

    for line in _events():
            ev = json.loads(line)
            kind = ev.get("Event")
            if kind == "SparkListenerJobStart":
                jid = ev["Job ID"]
                job_group[jid] = (ev.get("Properties") or {}).get(
                    "spark.jobGroup.id", ""
                )
                job_stages[jid] = [
                    s["Stage ID"] for s in ev.get("Stage Infos", [])
                ]
            elif kind == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                stage_info[si["Stage ID"]] = si
            elif kind == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                run = (ev.get("Task Metrics") or {}).get(
                    "Executor Run Time", 0
                ) / 1000.0
                task_time[sid] = task_time.get(sid, 0.0) + run
                task_max[sid] = max(task_max.get(sid, 0.0), run)
                task_n[sid] = task_n.get(sid, 0) + 1

    stage_to_group: dict[int, str] = {}
    for jid, stages in job_stages.items():
        for sid in stages:
            stage_to_group.setdefault(sid, job_group.get(jid, ""))

    by_group: dict[str, list[int]] = {}
    for sid in stage_info:
        by_group.setdefault(stage_to_group.get(sid, "?"), []).append(sid)

    for group in sorted(by_group):
        if only is not None and group not in only:
            continue
        print(f"\n=== {group} (wall {walls.get(group, float('nan')):.1f}s) ===")
        sids = sorted(
            by_group[group], key=lambda s: -task_time.get(s, 0.0)
        )
        for sid in sids:
            si = stage_info[sid]
            n_tasks = task_n.get(sid, si.get("Number of Tasks", 0))
            run = task_time.get(sid, 0.0)
            if run < 0.05:
                continue
            flag = ""
            if run >= min_task_sec and n_tasks < max(2, cpus // 2):
                flag = "  <-- SERIAL"
            name_head = si.get("Stage Name", "")[:70]
            print(
                f"  stage {sid:4d} tasks={n_tasks:3d} "
                f"run={run:8.1f}s max_task={task_max.get(sid, 0.0):7.1f}s "
                f"{name_head}{flag}",
                flush=True,
            )
    return 0


if __name__ == "__main__":
    sys.exit(main())
