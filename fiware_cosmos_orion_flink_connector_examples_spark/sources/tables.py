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
    """Load one testdata table, normalizing timestamp physical types.

    The driver's parquet has shipped with two different timestamp
    encodings across rounds: TIMESTAMP(NANOS) (readable only via
    nanosAsLong → LongType ns) and timezone-naive TIMESTAMP(MICROS)
    (isAdjustedToUTC=false), which Spark 4 infers as TIMESTAMP_NTZ.
    Every downstream operator (window(), unix_micros(), unions with
    cast TIMESTAMP columns) expects session-local TimestampType, so we
    normalize both shapes here — the single choke point every batch
    plan loads through.  The session timezone is pinned to UTC first so
    the NTZ→LTZ cast preserves the wall clock as a UTC instant exactly
    like DuckDB's epoch() on the same naive parquet values, keeping the
    oracle hash-comparable.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    ntz_cols = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    if ntz_cols:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        df = df.withColumns({c: F.col(c).cast("timestamp") for c in ntz_cols})
    return df


def load_tables(spark: SparkSession, sf_dir: str, names=TABLE_NAMES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


# Testdata tables are immutable for the life of a session, so exact
# rowcounts (used e.g. to size the IVF quantizer) are safe to memoize —
# one count() job per (app, sf_dir, table) instead of one per query run.
_ROWCOUNT_CACHE: dict[tuple[str, str, str], int] = {}


def table_rowcount(spark: SparkSession, sf_dir: str, name: str) -> int:
    key = (spark.sparkContext.applicationId, sf_dir, name)
    if key not in _ROWCOUNT_CACHE:
        _ROWCOUNT_CACHE[key] = load_table(spark, sf_dir, name).count()
    return _ROWCOUNT_CACHE[key]
