"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs each registered query's Spark impl and DuckDB oracle SQL on the
same parquet tables, then compares row count, column names, and values
(columns sorted by name, rows sorted, floats to 1e-9 relative
tolerance — the driver hashes exact values, so registry conventions
round aggregates on BOTH sides before we ever get here).
"""

from __future__ import annotations

import datetime as _dt
import math

import duckdb

from fiware_cosmos_orion_flink_connector_examples_spark.sources.tables import TABLE_NAMES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm(v):
    if isinstance(v, _dt.datetime):
        return v.isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def _sorted_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in idx) for r in rows]
    return sorted(cols), sorted(out, key=lambda t: tuple(str(x) for x in t))


def _values_close(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, (float, int)):
        if math.isnan(a):
            return isinstance(b, float) and math.isnan(b)
        return math.isclose(a, float(b), rel_tol=1e-9, abs_tol=1e-9)
    return _norm(a) == _norm(b)


def compare(spark_df, con, sql: str, max_report: int = 5) -> list[str]:
    """Returns a list of mismatch descriptions (empty == parity)."""
    problems: list[str] = []
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = con.sql(sql)
    d_cols = rel.columns
    d_rows = rel.fetchall()

    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"columns differ: spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
        return problems
    if len(s_rows) != len(d_rows):
        problems.append(f"row count differs: spark={len(s_rows)} duckdb={len(d_rows)}")
    _, s_sorted = _sorted_rows(s_cols, s_rows)
    _, d_sorted = _sorted_rows(d_cols, d_rows)
    n_bad = 0
    for i, (sr, dr) in enumerate(zip(s_sorted, d_sorted)):
        if len(sr) != len(dr) or not all(_values_close(a, b) for a, b in zip(sr, dr)):
            n_bad += 1
            if n_bad <= max_report:
                problems.append(f"row {i}: spark={sr!r} duckdb={dr!r}")
    if n_bad > max_report:
        problems.append(f"... {n_bad} mismatched rows total")
    return problems
