"""Spark-only per-query timing — no DuckDB oracle, no compare.

The parity runner's per-query seconds conflate the engine with the
DuckDB oracle (which runs all-pairs SQL for the dedup family and
dominates at the duplicate-heavy 6x scale tier).  This script times
ONLY the engine: build the DataFrame, execute, count rows.  Use it to
attribute a slow parity line before blaming the Spark plan.

Usage:
    PYTHONPATH=/root/repo python scripts/time_queries.py SF_DIR \
        [--only q1,q2] [--repeat N]

Prints one `name seconds rows` line per query plus a JSON summary
line, so output can be diffed across tiers (sf0.1 vs .scale/sf0.6).
"""

from __future__ import annotations

import json
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
    repeat = int(_flag_arg("--repeat") or "1")
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"

    from ml_data_wrangler_spark.plans import registry
    from ml_data_wrangler_spark.session import get_spark

    spark = get_spark(app_name="time-queries")
    timings: dict[str, float] = {}
    for name, fn in registry.queries().items():
        if only is not None and name not in only:
            continue
        best = None
        rows = 0
        for _ in range(repeat):
            t0 = time.time()
            rows = len(fn(spark, sf_dir).collect())
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        print(f"{name} {best:.2f}s {rows} rows", flush=True)
    print(json.dumps({"sf_dir": sf_dir, "timings": timings}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
