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
