"""Local mirror of the driver's DuckDB-oracle differential check
(SURVEY.md §5.2): run each registered query on Spark AND its oracle SQL
on DuckDB over the same parquet, compare row count + column names +
order-insensitive values.

Values are normalized (Decimal→float, datetime→isoformat, arrays→
tuples, floats→repr) and compared EXACTLY — the engine's queries are
written so cross-engine float divergence cannot occur (decimal
aggregation / rounded outputs); any mismatch is a bug, not noise.

One measured exception, for scale smokes only: once a decimal sum
carries ≥16 significant digits (observed at the synthetic 6× tier,
e.g. q01's sum_charge ≈ 3.06e10 at scale 6), DuckDB's
``CAST(decimal AS DOUBLE)`` can land 1 ulp away from the correctly
rounded conversion that both Spark (BigDecimal.doubleValue) and
Python (float(Decimal)) produce — verified by diffing the exact
decimal sums (identical) against both casts. ``sig=`` rounds floats
to that many significant digits before hashing to absorb it; the
sf0.01 driver-gate mirror never passes it, so gate behavior stays
bit-exact.
"""

from __future__ import annotations

import datetime
import decimal
import math
from typing import Any

import duckdb

from ml_data_wrangler_spark.schemas import TESTDATA_TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    # Explicit memory budget: the oracle shares its process with a
    # multi-GB Spark driver JVM, and DuckDB's default limit (80% of
    # PHYSICAL RAM) doesn't know that. At the 6× scale tier the big
    # windowed-join oracles then die on a raw malloc failure ("bad
    # allocation") instead of spilling — observed on qv21, whose
    # 2.6e8-row cosine window is perfectly spillable. A fixed limit
    # makes DuckDB switch to its out-of-core operators early and
    # predictably. Override via DUCKDB_MEMORY_LIMIT for small boxes.
    import os

    con.execute(
        f"SET memory_limit = '{os.environ.get('DUCKDB_MEMORY_LIMIT', '24GB')}'"
    )
    for name in TESTDATA_TABLES:
        # scale tiers write big tables as DIRECTORIES of part files
        # (multi-split scans — the realistic cluster layout); Spark
        # reads those natively, DuckDB needs the glob form
        path = f"{sf_dir}/{name}.parquet"
        src = f"'{path}/*.parquet'" if os.path.isdir(path) else f"'{path}'"
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM {src}")
    return con


def _round_sig(f: float, sig: int) -> float:
    if f == 0.0 or not math.isfinite(f):
        return f
    return round(f, sig - 1 - math.floor(math.log10(abs(f))))


def _norm_value(v: Any, sig: int | None = None) -> str:
    if v is None:
        return "␀"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if sig is not None:
            v = _round_sig(v, sig)
        return repr(v)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_value(x, sig) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_norm_value(v[k], sig)}" for k in sorted(v)) + "}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def normalize(
    col_names: list[str], rows: list[tuple], sig: int | None = None
) -> list[tuple[str, ...]]:
    order = sorted(range(len(col_names)), key=lambda i: col_names[i])
    out = [tuple(_norm_value(r[i], sig) for i in order) for r in rows]
    out.sort()
    return out


def run_spark_query(spark, fn, sf_dir: str):
    df = fn(spark, sf_dir)
    cols = list(df.columns)
    rows = [tuple(r) for r in df.collect()]
    return cols, rows


def run_oracle(con, sql: str):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    return cols, rows


def compare(
    name: str, spark_cols, spark_rows, o_cols, o_rows, sig: int | None = None
) -> list[str]:
    """Returns a list of human-readable problems (empty = match)."""
    problems: list[str] = []
    if sorted(spark_cols) != sorted(o_cols):
        problems.append(f"columns differ: spark={sorted(spark_cols)} oracle={sorted(o_cols)}")
        return problems
    if len(spark_rows) != len(o_rows):
        problems.append(f"row count differs: spark={len(spark_rows)} oracle={len(o_rows)}")
    a = normalize(spark_cols, spark_rows, sig)
    b = normalize(o_cols, o_rows, sig)
    if a != b:
        sa, sb = set(a), set(b)
        only_a = list(sa - sb)[:3]
        only_b = list(sb - sa)[:3]
        problems.append(
            f"values differ: {len(sa - sb)} spark-only, {len(sb - sa)} oracle-only; "
            f"examples spark-only={only_a} oracle-only={only_b} "
            f"(cols sorted: {sorted(spark_cols)})"
        )
    return problems
