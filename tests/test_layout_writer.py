"""Writer-layout discipline: bounded files per partition value, rows
sorted within each file (row-group pruning depends on it), and the
written table prunes on read."""

from __future__ import annotations

import collections

from pyspark.sql import functions as F

from fiware_cosmos_orion_flink_connector_examples_spark.sources.layout import (
    write_clustered,
)
from fiware_cosmos_orion_flink_connector_examples_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_write_clustered_layout_and_order(spark, tmp_path):
    out = str(tmp_path / "events_by_type")
    ev = load_table(spark, SF, "events")
    write_clustered(ev, out, ["event_type"], ["ts"], files_per_value=1)

    back = spark.read.parquet(out)
    assert back.count() == ev.count()

    # exactly one data file per partition value
    tagged = back.select("event_type", F.input_file_name().alias("f"))
    per_value = (
        tagged.groupBy("event_type").agg(F.countDistinct("f").alias("nf")).collect()
    )
    assert per_value and all(r.nf == 1 for r in per_value)

    # rows inside each file are sorted by ts
    rows = back.select(
        "event_type", "ts", F.input_file_name().alias("f")
    ).collect()
    by_file = collections.defaultdict(list)
    for r in rows:
        by_file[r.f].append(r.ts)
    # collect() preserves within-file row order for a simple scan
    for f, ts_list in by_file.items():
        assert ts_list == sorted(ts_list), f

    # partition pruning fires on the written layout
    plan = (
        back.filter(F.col("event_type") == "click")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters: [" in plan


def test_write_clustered_salted_bounds_files(spark, tmp_path):
    out = str(tmp_path / "events_salted")
    ev = load_table(spark, SF, "events")
    write_clustered(ev, out, ["event_type"], ["ts"], files_per_value=3)
    back = spark.read.parquet(out)
    assert back.count() == ev.count()
    per_value = (
        back.select("event_type", F.input_file_name().alias("f"))
        .groupBy("event_type")
        .agg(F.countDistinct("f").alias("nf"))
        .collect()
    )
    assert all(1 <= r.nf <= 3 for r in per_value)
