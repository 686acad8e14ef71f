"""Local replica of the driver's Spark-vs-DuckDB comparison.

Mirrors the documented gate: per query, run the Spark DataFrame and the
oracle SQL on the same parquet tables; compare row count, column-name
set, and order-insensitive values (columns sorted by name, rows sorted,
cell-wise exact equality with a tiny float tolerance for
display-rounding differences).
"""

from __future__ import annotations

import datetime as _dt
import math
from decimal import Decimal

import duckdb

from etl_spark.schema import TESTDATA_TABLES

FLOAT_RTOL = 1e-9


def run_oracle(sf_dir: str, sql: str):
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    con.close()
    return cols, rows


def _norm(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return v


def _sort_key(row):
    return tuple(
        (v is None, str(type(v).__name__), str(v)) for v in row
    )


def compare(spark_df, sf_dir: str, oracle: str) -> list[str]:
    """Returns a list of mismatch descriptions (empty == pass)."""
    problems: list[str] = []
    s_cols = sorted(spark_df.columns)
    s_rows = [
        tuple(_norm(r[c]) for c in s_cols) for r in spark_df.collect()
    ]
    o_cols_raw, o_rows_raw = run_oracle(sf_dir, oracle)
    o_order = sorted(range(len(o_cols_raw)), key=lambda i: o_cols_raw[i])
    o_cols = [o_cols_raw[i] for i in o_order]
    o_rows = [tuple(_norm(row[i]) for i in o_order) for row in o_rows_raw]

    if s_cols != o_cols:
        problems.append(f"schema mismatch: spark={s_cols} oracle={o_cols}")
        return problems
    if len(s_rows) != len(o_rows):
        problems.append(f"row count: spark={len(s_rows)} oracle={len(o_rows)}")
    s_rows.sort(key=_sort_key)
    o_rows.sort(key=_sort_key)
    n_bad = 0
    for i, (a, b) in enumerate(zip(s_rows, o_rows)):
        if not _rows_equal(a, b):
            n_bad += 1
            if n_bad <= 3:
                problems.append(f"row {i}: spark={a!r} oracle={b!r}")
    if n_bad > 3:
        problems.append(f"... {n_bad} mismatched rows total")
    return problems


def _rows_equal(a, b) -> bool:
    if len(a) != len(b):
        return False
    for x, y in zip(a, b):
        if x is None or y is None:
            if x is not y:
                return False
            continue
        if isinstance(x, float) and isinstance(y, float):
            if math.isnan(x) and math.isnan(y):
                continue
            if x != y and not math.isclose(x, y, rel_tol=FLOAT_RTOL, abs_tol=1e-9):
                return False
            continue
        if x != y:
            return False
    return True
