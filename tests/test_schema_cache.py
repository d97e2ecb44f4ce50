"""load_table schema cache (tables._SCHEMA_CACHE, round 17, guide §1/§5).

Every `spark.read.parquet(path)` pays driver-side datasource resolution
plus footer schema inference (~100 ms/call measured); a bench run calls
load_table hundreds of times over the same immutable files.  The cache
memoizes the inferred StructType keyed on FILE IDENTITY (path + size +
mtime_ns; directory-style parquet folds every entry's (name, size,
mtime_ns)) — metadata only, the row data is planned and read from
parquet on every invocation.  These tests pin:

  1. cache on/off produce identical schemas AND identical row content;
  2. rewriting a file (new identity) invalidates — the new schema is
     picked up, never the stale one;
  3. directory-style parquet (Spark-written fixtures) participates and
     invalidates on overwrite;
  4. SPARK_GRAFT_SCHEMA_CACHE=0 bypasses the cache entirely.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import Row

from fiware_cosmos_orion_flink_connector_examples_spark.sources import tables

SF = "/root/testdata/sf0.001"


def test_cache_on_off_identical(spark, monkeypatch):
    for name in ("orders", "events", "documents"):
        monkeypatch.setenv("SPARK_GRAFT_SCHEMA_CACHE", "0")
        off = tables.load_table(spark, SF, name)
        monkeypatch.setenv("SPARK_GRAFT_SCHEMA_CACHE", "1")
        tables.load_table(spark, SF, name)  # populate
        on = tables.load_table(spark, SF, name)  # hit
        assert off.schema == on.schema
        key_col = off.columns[0]
        assert (
            off.orderBy(key_col).limit(5).collect()
            == on.orderBy(key_col).limit(5).collect()
        )


def test_rewritten_file_invalidates(spark, tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_SCHEMA_CACHE", "1")
    sf_dir = str(tmp_path)
    path = os.path.join(sf_dir, "documents.parquet")

    spark.createDataFrame([Row(doc_id=1, text="a")]).toPandas().to_parquet(path)
    first = tables.load_table(spark, sf_dir, "documents")
    assert set(first.columns) == {"doc_id", "text"}

    # rewrite with a DIFFERENT schema; ensure mtime_ns moves even on
    # coarse-grained filesystems
    time.sleep(0.01)
    spark.createDataFrame(
        [Row(doc_id=1, text="a", source="web")]
    ).toPandas().to_parquet(path)
    second = tables.load_table(spark, sf_dir, "documents")
    assert set(second.columns) == {"doc_id", "text", "source"}
    assert second.collect() == [Row(doc_id=1, text="a", source="web")]


def test_directory_parquet_invalidates_on_overwrite(spark, tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_SCHEMA_CACHE", "1")
    sf_dir = str(tmp_path)
    path = os.path.join(sf_dir, "orders.parquet")

    spark.createDataFrame([Row(o_orderkey=1)]).write.mode("overwrite").parquet(path)
    first = tables.load_table(spark, sf_dir, "orders")
    assert first.columns == ["o_orderkey"]

    time.sleep(0.01)
    spark.createDataFrame(
        [Row(o_orderkey=2, o_totalprice=1.5)]
    ).write.mode("overwrite").parquet(path)
    second = tables.load_table(spark, sf_dir, "orders")
    assert set(second.columns) == {"o_orderkey", "o_totalprice"}
    assert second.count() == 1


def test_kill_switch_bypasses_cache(spark, tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_SCHEMA_CACHE", "0")
    sf_dir = str(tmp_path)
    path = os.path.join(sf_dir, "part.parquet")
    spark.createDataFrame([Row(p_partkey=7)]).toPandas().to_parquet(path)
    before = len(tables._SCHEMA_CACHE)
    df = tables.load_table(spark, sf_dir, "part")
    assert df.collect() == [Row(p_partkey=7)]
    assert len(tables._SCHEMA_CACHE) == before
