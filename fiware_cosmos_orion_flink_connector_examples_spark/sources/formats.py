"""Generic batch source/sink formats.

The reference has no file formats at all (its only I/O is the NGSI
HTTP pair) — an engine users can switch to needs the standard ones.
Thin, declarative wrappers: every reader keeps Catalyst's pushdown
path; the writer exposes the two layout levers that matter at 100 TB
(partition columns for pruning, bucket columns for co-located joins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_READERS = {
    "parquet": lambda r: r.parquet,
    "json": lambda r: r.json,
    "csv": lambda r: lambda path: r.csv(path, header=True, inferSchema=True),
    "orc": lambda r: r.orc,
}


def read_any(spark: SparkSession, path: str, fmt: str | None = None, schema=None) -> DataFrame:
    """Read a table by format (inferred from the extension if omitted).
    Explicit ``schema`` skips inference — ALWAYS pass one in production:
    schema inference is an extra full scan for csv/json."""
    fmt = fmt or path.rsplit(".", 1)[-1].lower()
    if fmt not in _READERS:
        raise ValueError(f"unsupported format {fmt!r}; one of {sorted(_READERS)}")
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
        if fmt == "csv":
            return reader.csv(path, header=True)
    return _READERS[fmt](reader)(path)


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    max_records_per_file: int | None = None,
) -> None:
    """Write with the scale-relevant layout options.  ``partition_by``
    columns become directory partitions → partition pruning on read
    (PartitionFilters in the scan, zero I/O for filtered-out values).
    ``max_records_per_file`` bounds file sizes against skewed output
    partitions."""
    w = df.write.mode(mode)
    if fmt == "csv":
        w = w.option("header", True)  # readers assume header row
    if partition_by:
        w = w.partitionBy(*partition_by)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    getattr(w, fmt)(path)
