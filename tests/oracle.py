"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs each registered query's Spark impl and DuckDB oracle SQL on the
same parquet tables, then compares row count, column names, value-TYPE
FAMILIES, and values (columns sorted by name, rows sorted, floats to
1e-9 relative tolerance — the driver hashes exact values, so registry
conventions round aggregates on BOTH sides before we ever get here).

Type families: the driver hashes TYPED values, so a DuckDB HUGEINT
(arrow decimal128 — what an uncast ``sum(BIGINT)`` returns) against a
Spark int64 is a driver hash FAIL even when every numeric value is
equal.  ``fetchall()`` degrades HUGEINT to Python int and is
structurally blind to that class (the round-12 `snapshot_upsert_capstone`
failure), so the DuckDB side is fetched via Arrow and each column's
type family (int / decimal / float / bool / str / date / timestamp /
list) must match Spark's before values are even looked at.
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
import math

import duckdb
import pyarrow as pa

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
    if isinstance(v, _decimal.Decimal):
        # only reachable when BOTH sides are decimal-family (the family
        # gate rejects decimal-vs-int before values are compared)
        return int(v) if v == v.to_integral_value() else float(v)
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


# -- type families -----------------------------------------------------
# The driver's hash is typed: int64 vs decimal128 vs float64 diverge even
# at equal numeric values.  We bucket both sides into coarse families and
# require equality per (sorted) column.

_SPARK_INT = {"tinyint", "smallint", "int", "bigint"}


def _spark_family(dtype: str) -> str:
    if dtype in _SPARK_INT:
        return "int"
    if dtype.startswith("decimal"):
        return "decimal"
    if dtype in ("float", "double"):
        return "float"
    if dtype == "boolean":
        return "bool"
    if dtype == "string":
        return "str"
    if dtype == "date":
        return "date"
    if dtype.startswith("timestamp"):
        return "timestamp"
    if dtype.startswith("array"):
        return "list"
    return dtype


def _arrow_family(t: "pa.DataType") -> str:
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return "list"
    if pa.types.is_null(t):
        return "null"  # untyped NULL literal — wildcard
    return str(t)


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
    # Arrow fetch (NOT fetchall): preserves HUGEINT/decimal so the
    # family gate sees what the driver's typed hash sees.
    tbl = con.sql(sql).fetch_arrow_table()
    d_cols = list(tbl.schema.names)
    d_rows = list(zip(*[c.to_pylist() for c in tbl.columns])) if tbl.num_columns else []

    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"columns differ: spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
        return problems

    s_fam = {name: _spark_family(dt) for name, dt in spark_df.dtypes}
    for field in tbl.schema:
        df_fam = _arrow_family(field.type)
        if df_fam == "null":
            continue
        if s_fam.get(field.name) != df_fam:
            problems.append(
                f"type family differs on {field.name!r}: "
                f"spark={s_fam.get(field.name)} duckdb={df_fam} "
                f"(arrow {field.type}) — driver's typed hash would FAIL; "
                f"CAST the oracle's final projection"
            )
    if problems:
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
