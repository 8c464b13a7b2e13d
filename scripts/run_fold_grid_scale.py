"""Scale-tier exercise of brute_force_topk_fold's grid-cogroup tier
(round 12, r11 verdict item 4): the grid path is the designated
>executor-storage dispatch — above ``max_executor_cells`` the sliced
path's per-slice broadcasts (Q×D cells resident on EVERY executor,
slices collected sequentially through the driver) stop being a scale
design — but until this runner it had only the sf0.001 fixture pin
(tests/test_fold_knn_grid.py). Here it runs on a real tier's
embeddings (e.g. .scale/docs64x: 128k vectors × 64 dims, 6,400
queries) by lowering the dispatch knobs exactly as the verdict
prescribes, and must return BIT-IDENTICAL rows to the default-dispatch
qv01 result on the same tier — the result the r11 driver evidence
hash-PASSed against the py-oracle (SCALE_SWEEP_r11_64x_qv01_qm09.log),
so grid == default transitively re-verifies grid against the oracle.

Usage:
    SPARK_GRAFT_CPUS=16 SPARK_DRIVER_MEMORY=24g PYTHONPATH=/root/repo \
        python scripts/run_fold_grid_scale.py /root/repo/.scale/docs64x

Prints one `ok/FAIL` line per branch plus the run_parity-style
parallelism verdicts from the event log.
"""

from __future__ import annotations

import hashlib
import os
import sys
import tempfile
import time


def _value_hash(rows) -> str:
    h = hashlib.sha256()
    for row in sorted(map(tuple, rows)):
        h.update(repr(row).encode())
    return h.hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/docs64x"

    from pyspark.sql import functions as F

    from ml_data_wrangler_spark.operators.similarity import brute_force_topk_fold
    from ml_data_wrangler_spark.plans._util import t
    from ml_data_wrangler_spark.session import get_spark
    from tests.stage_audit import event_log_conf, stages_by_group, verdict_lines

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 8))
    event_dir = tempfile.mkdtemp(prefix="grid-events-")
    spark = get_spark(
        app_name="fold-grid-scale",
        cpus=cpus,
        shuffle_partitions=max(cpus, 8),
        driver_memory=os.environ.get("SPARK_DRIVER_MEMORY", "8g"),
        extra_conf=event_log_conf(event_dir),
    )

    emb = t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 20 == 0)
    n_q = queries.count()
    dim = emb.select(F.max(F.size("embedding"))).first()[0]
    cells = n_q * dim
    print(f"tier {sf_dir}: {n_q} queries × {dim} dims = {cells} Q·D cells",
          flush=True)

    sel = ["query_id", "neighbor_id", "sim", "rank"]
    walls: dict[str, float] = {}

    # branch A: default dispatch — the exact qv01 plan the r11 64×
    # evidence hash-PASSed against the py-oracle
    spark.sparkContext.setJobGroup("fold_default", "fold_default")
    t0 = time.time()
    base = brute_force_topk_fold(emb, queries, k=5).select(*sel).collect()
    walls["fold_default"] = time.time() - t0
    h_base = _value_hash(base)
    print(f"ok   fold_default ({walls['fold_default']:.1f}s, "
          f"{len(base)} rows, hash {h_base})", flush=True)

    # branch B: grid cogroup, forced by lowering BOTH dispatch knobs so
    # Q·D exceeds max_executor_cells (the >executor-storage regime this
    # tier stands in for). Knobs scale off the measured Q·D so the
    # forcing holds on any tier: broadcast cap Q·D/2 (rules out the
    # single-broadcast branch), executor budget Q·D/4 (rules out the
    # sliced branch) → quarter-budget slices of Q·D/8 cells, ~8 slices.
    spark.sparkContext.setJobGroup("fold_grid", "fold_grid")
    t0 = time.time()
    grid_df = brute_force_topk_fold(
        emb,
        queries,
        k=5,
        max_broadcast_cells=max(cells // 2, 4),
        max_executor_cells=max(cells // 4, 1),
    ).select(*sel)
    plan = grid_df._jdf.queryExecution().toString()
    if "FlatMapCoGroupsInPandas" not in plan:
        print("FAIL fold_grid: dispatch did NOT land on the grid-cogroup "
              "tier (no FlatMapCoGroupsInPandas in the executed plan)",
              flush=True)
        spark.stop()
        return 1
    grid = grid_df.collect()
    walls["fold_grid"] = time.time() - t0
    h_grid = _value_hash(grid)
    status = "ok  " if h_grid == h_base and len(grid) == len(base) else "FAIL"
    print(f"{status} fold_grid ({walls['fold_grid']:.1f}s, {len(grid)} rows, "
          f"hash {h_grid}, grid-branch-confirmed, "
          f"{'BIT-IDENTICAL to default' if status == 'ok  ' else 'MISMATCH'})",
          flush=True)

    app_id = spark.sparkContext.applicationId
    spark.stop()
    try:
        lines = verdict_lines(
            stages_by_group(event_dir, app_id), walls, cpus,
            min_wall_sec=10.0, min_stage_sec=5.0,
        )
        for ln in lines:
            print(ln, flush=True)
    finally:
        import shutil

        shutil.rmtree(event_dir, ignore_errors=True)
    return 0 if status == "ok  " else 1


if __name__ == "__main__":
    sys.exit(main())
