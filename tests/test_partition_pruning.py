"""Partition-layout scale features: dynamic partition pruning (DPP)
over a hive-partitioned copy of the testdata, and static partition
pruning from a literal predicate.  At 100 TB the date/tenant partition
column is the first line of defense — a join that scans every
partition because pruning didn't fire is a 100× regression the plan
must prove it avoids."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def part_orders(spark, tmp_path_factory):
    """Orders written partitioned by status — the layout a 100 TB fact
    table would use (date/tenant in production)."""
    from fiware_cosmos_orion_flink_connector_examples_spark.sources.tables import (
        load_table,
    )

    out = str(tmp_path_factory.mktemp("part") / "orders_by_status")
    load_table(spark, SF, "orders").write.partitionBy("o_orderstatus").parquet(out)
    return out


def test_static_partition_pruning(spark, part_orders):
    df = spark.read.parquet(part_orders).filter(F.col("o_orderstatus") == "P")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the partition filter must be a PartitionFilters entry on the scan,
    # not a post-scan Filter over all partitions
    assert "PartitionFilters: [isnotnull(o_orderstatus" in plan or "PartitionFilters: [" in plan
    assert df.count() == spark.read.parquet(part_orders).filter("o_orderstatus = 'P'").count()


def test_dynamic_partition_pruning_fires_on_dim_join(spark, part_orders):
    """Join the partitioned fact to a filtered tiny dim on the
    partition column: Spark must inject a dynamicpruning subquery so
    only the dim's partitions are read."""
    facts = spark.read.parquet(part_orders)
    dim = spark.createDataFrame(
        [("P", "partial"), ("X", "unused")], ["o_orderstatus", "label"]
    ).filter(F.col("label") == "partial")
    # broadcast the DIM side explicitly: at sf0.001 the fact side is
    # small enough that Spark would otherwise broadcast IT, and DPP
    # only fires when the filtered dim broadcasts into the fact scan
    joined = facts.join(F.broadcast(dim), "o_orderstatus")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    only_p = facts.filter("o_orderstatus = 'P'").count()
    assert joined.count() == only_p


def test_runtime_bloom_filter_on_selective_shuffle_join(spark):
    """When the selective side is too big to broadcast (the 100 TB
    case: a filtered dimension in a shuffle join), Spark's runtime
    bloom filter must inject a row-level pre-filter on the fact scan —
    rows that can't join are dropped before the shuffle.  Thresholds
    are lowered to make the optimization observable at test scale."""
    from fiware_cosmos_orion_flink_connector_examples_spark.sources.tables import (
        load_table,
    )

    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10MB"
        )
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "1KB",
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        li = load_table(spark, SF, "lineitem")
        o = load_table(spark, SF, "orders").filter(F.col("o_totalprice") > 400000)
        j = li.join(o, li.l_orderkey == o.o_orderkey).groupBy("o_orderstatus").count()
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom" in plan.lower()
        # correctness unaffected by the injected filter
        expected = (
            load_table(spark, SF, "lineitem")
            .join(
                load_table(spark, SF, "orders").filter("o_totalprice > 400000"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .count()
        )
        assert sum(r["count"] for r in j.collect()) == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold")
        spark.conf.unset(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
        )
