"""Batch parquet scans over the driver's testdata tables.

The reference has no file formats at all (its only source is the NGSI
HTTP feed, Example1.scala:17); parquet scans are the batch twin this
engine adds so every operator runs on the driver's TPC-H-ish tables
(TESTDATA.md).  Reads stay fully declarative so Catalyst gets column
pruning + predicate pushdown into the scan — at 100 TB that is the
difference between reading 2 columns and reading 11.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at ANY scale factor (TPC-H
# region/nation are fixed-cardinality; supplier/part grow slowly).  Used
# by query plans to force broadcast joins instead of shuffles.
BROADCAST_DIMS = {"region", "nation"}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table.  ``events.ts`` is TIMESTAMP(NANOS)
    parquet which Spark only reads with nanosAsLong (→ LongType ns);
    we normalize it back to a microsecond TimestampType column so all
    window/time logic is uniform.  Truncation ns→µs matches DuckDB's
    read of the same file (it surfaces TIMESTAMP µs), keeping the
    oracle comparable.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, names=TABLE_NAMES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}
