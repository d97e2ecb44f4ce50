"""NULL-payload hardening: every registered query must run against
tables carrying a row whose NON-KEY columns are all NULL (keys kept
valid but shifted out of the real id range) — the malformed-record
case real feeds produce.  Convention under test: operators DROP rows
with NULL payloads (text / embedding / media bytes) at the boundary —
nothing to score, chunk, or decode — rather than crash an Arrow
kernel mid-pipeline."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from fiware_cosmos_orion_flink_connector_examples_spark.plans.registry import QUERIES

KEYS = {
    "region": ["r_regionkey"],
    "nation": ["n_nationkey", "n_regionkey"],
    "customer": ["c_custkey", "c_nationkey"],
    "supplier": ["s_suppkey", "s_nationkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


@pytest.fixture(scope="module")
def null_sf_dir(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("null_sf")
    for t, keys in KEYS.items():
        df = spark.read.parquet(f"/root/testdata/sf0.001/{t}.parquet")
        one = df.limit(1)
        sel = []
        for f in df.schema.fields:
            if f.name in keys:
                sel.append(
                    (F.col(f.name) + F.lit(10**9)).cast(f.dataType).alias(f.name)
                    if f.dataType.simpleString() in ("bigint", "int")
                    else F.col(f.name)
                )
            else:
                sel.append(F.lit(None).cast(f.dataType).alias(f.name))
        df.unionByName(one.select(*sel)).write.mode("overwrite").parquet(
            os.path.join(str(tmp), f"{t}.parquet")
        )
    return str(tmp)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_survives_null_rows(spark, null_sf_dir, name):
    df = QUERIES[name].fn(spark, null_sf_dir)
    assert df.count() >= 0
