"""Source/sink formats: csv/json/parquet roundtrips and partitioned
writes with partition pruning."""

from __future__ import annotations

from pyspark.sql import functions as F

from fiware_cosmos_orion_flink_connector_examples_spark.sources.formats import (
    read_any,
    write_table,
)
from fiware_cosmos_orion_flink_connector_examples_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_csv_json_roundtrip(spark, tmp_path):
    nation = load_table(spark, SF, "nation")
    for fmt in ("csv", "json", "parquet", "orc"):
        path = str(tmp_path / f"nation_{fmt}")
        write_table(nation, path, fmt=fmt)
        back = read_any(spark, path, fmt=fmt, schema=nation.schema)
        assert sorted(map(tuple, back.collect())) == sorted(map(tuple, nation.collect()))


def test_partitioned_write_prunes(spark, tmp_path):
    ev = load_table(spark, SF, "events")
    path = str(tmp_path / "events_parted")
    write_table(ev, path, partition_by=["event_type"])
    back = spark.read.parquet(path).filter(F.col("event_type") == "purchase")
    plan = back._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PartitionFilters: [isnotnull(event_type" in plan
    # pruning is real: only the purchase partition is read
    assert back.count() == ev.filter(F.col("event_type") == "purchase").count()
    files = {r[0] for r in back.select(F.input_file_name()).distinct().collect()}
    assert files and all("event_type=purchase" in f for f in files)


def test_read_any_rejects_unknown_format(spark):
    try:
        read_any(spark, "/tmp/x.xyz")
        raise AssertionError("should have raised")
    except ValueError as e:
        assert "unsupported format" in str(e)


def test_parquet_schema_evolution_mergeschema(spark, tmp_path):
    """Lake reality: files written months apart carry different
    schemas.  mergeSchema must unify old (3-col) and new (4-col)
    parquet into one DataFrame with NULLs for the missing column —
    the append-only evolution path a 100 TB table lives by."""
    from pyspark.sql import functions as F

    base = str(tmp_path / "evolving")
    old = spark.createDataFrame([(1, "a", 10.0)], ["id", "name", "score"])
    old.write.parquet(base + "/batch=1")
    new = spark.createDataFrame(
        [(2, "b", 20.0, "en")], ["id", "name", "score", "lang"]
    )
    new.write.parquet(base + "/batch=2")

    merged = spark.read.option("mergeSchema", "true").parquet(base)
    assert set(merged.columns) == {"id", "name", "score", "lang", "batch"}
    rows = {r.id: r for r in merged.collect()}
    assert rows[1].lang is None and rows[2].lang == "en"
    # filters on the evolved column still push down / evaluate
    assert merged.filter(F.col("lang") == "en").count() == 1
