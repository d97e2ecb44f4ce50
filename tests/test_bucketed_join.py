"""Bucketing demo: pre-bucketing both fact tables on the join key
removes the shuffle entirely — the storage-layout lever SCALING.md
prescribes for repeated lineitem↔orders joins at 100 TB."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from fiware_cosmos_orion_flink_connector_examples_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def bucketed_tables(spark):
    for t in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    load_table(spark, SF, "orders").write.bucketBy(8, "o_orderkey").sortBy(
        "o_orderkey"
    ).mode("overwrite").saveAsTable("b_orders")
    load_table(spark, SF, "lineitem").write.bucketBy(8, "l_orderkey").sortBy(
        "l_orderkey"
    ).mode("overwrite").saveAsTable("b_lineitem")
    yield
    for t in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    shutil.rmtree("spark-warehouse", ignore_errors=True)


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    o = spark.table("b_orders")
    li = spark.table("b_lineitem")
    joined = li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).groupBy(
        "o_orderstatus"
    ).agg(F.count(F.lit(1)).alias("n"))
    plan = joined._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    # the join itself must not re-shuffle either bucketed side: the only
    # Exchange allowed is the 3-row aggregation after the join
    join_section = plan.split("HashAggregate")[0]
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning(l_orderkey" not in plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan
    # correctness unchanged vs the unbucketed join
    plain = (
        load_table(spark, SF, "lineitem")
        .join(
            load_table(spark, SF, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, plain.collect()))
