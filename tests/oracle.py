"""Reimplementation of the driver's DuckDB-oracle comparison, used by tests.

Runs a registry query on Spark and its SQL twin on DuckDB over the same
parquet tables, then compares row count, column names, and values
(order-insensitive, near-exact). If this passes with exact equality the
driver's value-hash comparison should too.
"""

from __future__ import annotations

import math

import duckdb

from cdc_local_data_pipeline_docker_spark.catalog import TESTDATA_TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if hasattr(v, "isoformat"):  # datetime/date (date's isoformat takes no sep)
        return v.isoformat(sep=" ") if hasattr(v, "hour") else v.isoformat()
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    # Decimal → float-comparable string
    return v


def _sorted_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in idx) for r in rows]
    return sorted(out, key=repr)


def compare(spark_df, con, sql: str, rel_tol: float = 0.0):
    """Return (ok, message). rel_tol=0 → exact equality (the bar the
    driver's hash comparison sets)."""
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = list(spark_df.columns)
    d = con.execute(sql)
    d_cols = [c[0] for c in d.description]
    d_rows = d.fetchall()

    if sorted(s_cols) != sorted(d_cols):
        return False, f"columns differ: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row count differs: spark={len(s_rows)} duckdb={len(d_rows)}"

    ss = _sorted_rows(s_cols, s_rows)
    dd = _sorted_rows(d_cols, d_rows)
    for i, (a, b) in enumerate(zip(ss, dd)):
        if a == b:
            continue
        if len(a) == len(b) and all(_cell_eq(x, y, rel_tol) for x, y in zip(a, b)):
            continue
        return False, f"row {i} differs:\n  spark : {a}\n  duckdb: {b}"
    return True, "ok"


def _cell_eq(x, y, rel_tol):
    if x == y:
        return True
    try:
        fx, fy = float(x), float(y)
    except (TypeError, ValueError):
        return False
    if math.isnan(fx) and math.isnan(fy):
        return True
    if rel_tol == 0.0:
        return fx == fy
    return math.isclose(fx, fy, rel_tol=rel_tol, abs_tol=1e-12)
