"""tests/stage_audit.py — the parity sweep's parallelism verdict.

Two layers: a synthetic event-log unit test (flag logic + v1 parse),
and one real-Spark subprocess run proving a deliberately serial stage
is flagged from an actual Spark 4 event log (the round-7 verdict's
"one synthetic serial-stage fixture proves the flag fires")."""

from __future__ import annotations

import json
import os
import subprocess
import sys

from tests.stage_audit import (
    StageStats,
    serial_stages,
    stages_by_group,
    verdict_lines,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _v1_log(tmp_path, app_id: str, events: list[dict]) -> str:
    event_dir = str(tmp_path)
    with open(os.path.join(event_dir, app_id), "w") as fh:
        for ev in events:
            fh.write(json.dumps(ev) + "\n")
    return event_dir


def _job_start(jid, group, stage_ids):
    return {
        "Event": "SparkListenerJobStart",
        "Job ID": jid,
        "Properties": {"spark.jobGroup.id": group},
        "Stage Infos": [{"Stage ID": s} for s in stage_ids],
    }


def _stage_done(sid, name="scan parquet"):
    return {
        "Event": "SparkListenerStageCompleted",
        "Stage Info": {"Stage ID": sid, "Stage Name": name},
    }


def _task_end(sid, run_ms):
    return {
        "Event": "SparkListenerTaskEnd",
        "Stage ID": sid,
        "Task Metrics": {"Executor Run Time": run_ms},
    }


def test_serial_flag_fires_on_synthetic_log(tmp_path):
    """A 1-task 6-executor-sec stage flags SERIAL at cpus=8; a 16-task
    balanced stage of the same total run time does not; a 1-task stage
    under the threshold does not."""
    events = (
        [_job_start(0, "q_serial", [0]), _stage_done(0, "mapInPandas")]
        + [_task_end(0, 6000)]
        + [_job_start(1, "q_parallel", [1]), _stage_done(1, "hashagg")]
        + [_task_end(1, 400) for _ in range(16)]
        + [_job_start(2, "q_smallserial", [2]), _stage_done(2, "collect")]
        + [_task_end(2, 300)]
    )
    event_dir = _v1_log(tmp_path, "app-x", events)
    by_group = stages_by_group(event_dir, "app-x")
    assert set(by_group) == {"q_serial", "q_parallel", "q_smallserial"}

    assert [s.stage_id for s in serial_stages(by_group["q_serial"], 8, 5.0)] == [0]
    assert serial_stages(by_group["q_parallel"], 8, 5.0) == []
    assert serial_stages(by_group["q_smallserial"], 8, 5.0) == []

    # a stage whose TOTAL is small but whose single task is long still
    # flags (one 6 s task among fast siblings is serial wall time)
    lone = [StageStats(9, "sort", n_tasks=2, run_sec=6.5, max_task_sec=6.2)]
    assert serial_stages(lone, 8, 5.0) == lone

    walls = {"q_serial": 12.0, "q_parallel": 12.0, "q_smallserial": 12.0,
             "q_light": 0.5}
    lines = verdict_lines(by_group, walls, cpus=8, min_wall_sec=10.0,
                          min_stage_sec=5.0)
    flat = "\n".join(lines)
    assert "audit q_serial: SERIAL stage 0" in flat
    assert "audit q_parallel: parallel-ok" in flat
    assert "audit q_smallserial: parallel-ok" in flat
    assert "q_light" not in flat  # under the wall threshold → silent


def test_serial_flag_fires_from_real_event_log(tmp_path):
    """End-to-end on a REAL Spark event log: a job-grouped workload
    whose heavy stage is forced to 1 partition must flag SERIAL; the
    same workload at 8 partitions must not. Runs in a subprocess (the
    event log needs its own session + stop-to-flush)."""
    script = r"""
import sys, time
event_dir = sys.argv[1]
sys.path.insert(0, sys.argv[2])
from tests.stage_audit import event_log_conf, stages_by_group, verdict_lines
from ml_data_wrangler_spark.session import get_spark

# compressed rolling logs: the layout long sweeps actually produce
# (the box has no zstd CLI — decompression must work in-process)
conf = event_log_conf(event_dir) | {
    "spark.eventLog.rolling.enabled": "true",
    "spark.eventLog.compress": "true",
    "spark.eventLog.compression.codec": "zstd",
}
spark = get_spark(app_name="audit-fixture", cpus=4, shuffle_partitions=4,
                  driver_memory="2g", extra_conf=conf)
sc = spark.sparkContext
from pyspark.sql import functions as F

df = spark.range(0, 3_000_000)
heavy = F.aggregate(F.sequence(F.lit(1), F.lit(60)),
                    F.lit(0.0), lambda a, x: a + F.sqrt(x * F.col("id")))
walls = {}
sc.setJobGroup("q_serial", "q_serial")
t0 = time.time()
df.repartition(1).select(F.sum(heavy)).collect()
walls["q_serial"] = time.time() - t0
sc.setJobGroup("q_parallel", "q_parallel")
t0 = time.time()
df.repartition(8).select(F.sum(heavy)).collect()
walls["q_parallel"] = time.time() - t0
app_id = sc.applicationId
spark.stop()
for ln in verdict_lines(stages_by_group(event_dir, app_id), walls, cpus=4,
                        min_wall_sec=0.0, min_stage_sec=1.0):
    print(ln)
"""
    out = subprocess.run(
        [sys.executable, "-c", script, str(tmp_path), REPO],
        capture_output=True, text=True, timeout=300,
        env={**os.environ, "PYTHONPATH": REPO},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("audit ")]
    flat = "\n".join(lines)
    assert "audit q_serial: SERIAL stage" in flat, flat or out.stdout
    assert "audit q_parallel: parallel-ok" in flat, flat
