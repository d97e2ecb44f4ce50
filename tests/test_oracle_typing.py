"""The round-12 driver failure class: DuckDB's uncast ``sum(BIGINT)``
returns HUGEINT (arrow decimal128) where Spark returns int64; the
driver's TYPED hash diverges even though every numeric value is equal.
The old local mirror compared via ``fetchall()`` (HUGEINT degrades to
Python int) and was structurally blind to it.  These tests pin that the
arrow-based family gate in tests/oracle.py now catches exactly that
class — an uncast final-projection sum FAILS the mirror the same way it
failed the driver, and the repo's CAST convention passes."""

from __future__ import annotations

import pyspark.sql.functions as F

from tests.oracle import compare, duckdb_connection

SF_DIR = "/root/testdata/sf0.001"


def test_uncast_sum_oracle_fails_family_gate(spark):
    con = duckdb_connection(SF_DIR)
    try:
        sdf = (
            spark.read.parquet(f"{SF_DIR}/orders.parquet")
            .agg(F.sum(F.col("o_orderkey").cast("bigint")).alias("s"))
        )
        # numerically identical, but HUGEINT on the DuckDB side
        problems = compare(sdf, con, "SELECT sum(o_orderkey) AS s FROM orders")
        assert problems, "uncast sum must fail the typed mirror"
        assert any("type family" in p and "decimal" in p for p in problems), problems

        # the repo convention: CAST in the final projection — green
        ok = compare(sdf, con, "SELECT CAST(sum(o_orderkey) AS BIGINT) AS s FROM orders")
        assert not ok, ok
    finally:
        con.close()


def test_float_vs_int_family_mismatch_detected(spark):
    con = duckdb_connection(SF_DIR)
    try:
        sdf = spark.range(1).select(F.lit(42).cast("bigint").alias("v"))
        problems = compare(sdf, con, "SELECT 42.0 AS v")
        assert any("type family" in p for p in problems), problems
    finally:
        con.close()
