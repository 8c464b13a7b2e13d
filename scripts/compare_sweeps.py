"""Compare two parity-sweep logs per query: spark/oracle seconds and
the ratio, to separate engine scaling from oracle (DuckDB/numpy) cost.

Usage: python scripts/compare_sweeps.py OLD.log NEW.log [--label 6x,16x]

Sweep logs contain progress-bar \r frames; lines are normalized first.
The ratio column is NEW_spark / OLD_spark — at a data step-up this is
the engine's measured scaling factor for the query (compare it to the
data ratio: linear ops should sit near rows_ratio, pair ops near
rows_ratio²-ish in duplicate-heavy tiers)."""

from __future__ import annotations

import re
import sys

_LINE = re.compile(
    r"^(ok|FAIL)\s+(\S+)\s+\((\d+\.\d+)s = spark (\d+\.\d+) \+ "
    r"oracle (-?\d+\.\d+), (\d+) rows, (\S+)\)"
)


def parse(path: str) -> dict[str, dict]:
    out: dict[str, dict] = {}
    with open(path, errors="replace") as fh:
        text = fh.read().replace("\r", "\n")
    for line in text.splitlines():
        m = _LINE.match(line.strip())
        if m:
            status, name, total, spark, oracle, rows, kind = m.groups()
            out[name] = {
                "status": status,
                "total": float(total),
                "spark": float(spark),
                "oracle": float(oracle),
                "rows": int(rows),
                "kind": kind,
            }
    return out


def main() -> int:
    argv = list(sys.argv[1:])
    labels = ["old", "new"]
    if "--label" in argv:
        i = argv.index("--label")
        labels = argv[i + 1].split(",")
        del argv[i : i + 2]
    old, new = parse(argv[0]), parse(argv[1])
    names = sorted(set(old) | set(new))
    print(
        f"{'query':38s} {labels[0]+'_spark':>10s} {labels[1]+'_spark':>10s} "
        f"{'ratio':>6s} {labels[1]+'_oracle':>11s} {'rows':>9s} kind"
    )
    for n in names:
        o, w = old.get(n), new.get(n)
        if o and w:
            ratio = w["spark"] / o["spark"] if o["spark"] > 0.05 else float("nan")
            print(
                f"{n:38s} {o['spark']:10.1f} {w['spark']:10.1f} {ratio:6.1f} "
                f"{w['oracle']:11.1f} {w['rows']:9d} {w['kind']}"
            )
        elif w:
            print(f"{n:38s} {'-':>10s} {w['spark']:10.1f} {'-':>6s} "
                  f"{w['oracle']:11.1f} {w['rows']:9d} {w['kind']}")
        else:
            print(f"{n:38s} {o['spark']:10.1f} {'-':>10s}   (only {labels[0]})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
