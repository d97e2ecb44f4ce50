"""File-level join-side pruning for sides NOT co-keyed by the join
column (round 16): ``layout.snapshot_prune_files_for_values`` decides
per file from min/max stats + bloom sidecars which files might hold
any of a bounded probe-key set, and ``ivm._pruned_join_side`` uses it
as tier 2 (bucket pruning stays tier 1, full read the honest tier 3).
The 100 TB case this closes: a fact table keyed by its own PK with
stats/bloom declared on the FK no longer reads FULL when a dimension
delta syncs a join view."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from fiware_cosmos_orion_flink_connector_examples_spark.operators import ivm
from fiware_cosmos_orion_flink_connector_examples_spark.sources import layout


def _facts(spark, n=400):
    # j is k // 50: values 0..7, contiguous runs → disjoint per-file
    # ranges after a sort_by compaction
    return spark.createDataFrame(
        [(i, i // 50, i * 10) for i in range(n)], "k long, j long, v long"
    )


@pytest.fixture()
def fact_table(spark, tmp_path):
    """Keyed by k (NOT the join column), compacted sorted-by-j with
    stats + bloom on j → many files with tight j metadata."""
    path = str(tmp_path / "facts")
    layout.snapshot_write_keyed(spark, _facts(spark), path, "k", n_buckets=2)
    layout.compact_files(
        spark, path, sort_by="j", stats_cols=["j"], bloom_cols=["j"],
        max_records_per_file=50,
    )
    return path


def test_prune_files_for_values_stats_and_bloom(spark, fact_table):
    manifest = layout.snapshot_manifest(spark, fact_table)
    n_total = len(manifest["files"])
    assert n_total >= 6  # the compaction actually split files

    files, total = layout.snapshot_prune_files_for_values(
        spark, fact_table, "j", [0, 7]
    )
    assert total == n_total
    assert 0 < len(files) < n_total
    # pruning is conservative: kept files + exact predicate == truth
    import json

    from pyspark.sql.types import StructType

    schema = StructType.fromJson(json.loads(manifest["schema"]))
    got = {
        r["k"]
        for r in spark.read.schema(schema)
        .parquet(*files)
        .filter(F.col("j").isin(0, 7))
        .collect()
    }
    expect = {
        r["k"]
        for r in layout.snapshot_read(spark, fact_table)
        .filter(F.col("j").isin(0, 7))
        .collect()
    }
    assert got == expect

    # NULL probes never match anything; absent values keep nothing
    assert layout.snapshot_prune_files_for_values(
        spark, fact_table, "j", [None]
    ) == ([], n_total)
    files_none, _ = layout.snapshot_prune_files_for_values(
        spark, fact_table, "j", [99999]
    )
    # a value outside every range AND every bitmap keeps zero files
    assert files_none == []


def test_pruned_join_side_uses_stats_tier(spark, fact_table):
    n_total = len(layout.snapshot_manifest(spark, fact_table)["files"])
    delta = spark.createDataFrame([(3,), (4,)], "j long")
    side = ivm._pruned_join_side(spark, fact_table, 2, "j", delta)
    read = side.inputFiles()
    assert 0 < len(read) < n_total
    got = {r["k"] for r in side.filter(F.col("j").isin(3, 4)).collect()}
    assert got == set(range(150, 250))

    # above the key cap the side honestly reads full
    import fiware_cosmos_orion_flink_connector_examples_spark.operators.ivm as ivm_mod

    old = ivm_mod._JOIN_PRUNE_KEY_CAP
    try:
        ivm_mod._JOIN_PRUNE_KEY_CAP = 1
        side_full = ivm._pruned_join_side(spark, fact_table, 2, "j", delta)
        assert len(side_full.inputFiles()) == n_total
    finally:
        ivm_mod._JOIN_PRUNE_KEY_CAP = old

    # an all-NULL delta key set joins nothing: empty side, zero files
    null_delta = spark.createDataFrame([(None,)], "j long")
    assert ivm._pruned_join_side(spark, fact_table, 2, "j", null_delta).count() == 0


def test_join_view_sync_correct_over_stats_pruned_fact_side(
    spark, fact_table, tmp_path
):
    """End-to-end: dims-side churn drives A_old reads through the
    stats/bloom tier (facts are keyed by k, join is on j) and the view
    still equals the recompute."""
    dims_path = str(tmp_path / "dims")
    view = str(tmp_path / "view")
    layout.snapshot_write_keyed(
        spark,
        spark.createDataFrame(
            [(j, f"g{j % 3}") for j in range(8)], "j long, g string"
        ),
        dims_path, "j", n_buckets=2,
    )
    ivm.join_view_create(spark, fact_table, dims_path, view, "j", ["g"], ["v"])

    def recompute():
        return {
            (r["g"], r["_n"], r["sum_v"])
            for r in layout.snapshot_read(spark, fact_table)
            .join(layout.snapshot_read(spark, dims_path), "j")
            .groupBy("g")
            .agg(
                F.count(F.lit(1)).alias("_n"),
                F.sum(F.coalesce(F.col("v"), F.lit(0))).alias("sum_v"),
            )
            .collect()
        }

    # dim churn only → the A_old × dB term reads facts via the pruned tier
    layout.snapshot_merge(
        spark, dims_path,
        spark.createDataFrame(
            [(0, "moved", False), (7, None, True), (9, "g9", False)],
            "j long, g string, _del boolean",
        ),
        "j", delete_col="_del",
    )
    v, _ = ivm.join_view_sync(spark, fact_table, dims_path, view, "j", ["g"], ["v"])
    assert v is not None
    served = {
        (r["g"], r["_n"], r["sum_v"])
        for r in ivm.agg_view_read(spark, view).collect()
    }
    assert served == recompute()

    # fact churn too (merges keep stats/bloom alive on rewritten buckets)
    layout.snapshot_merge(
        spark, fact_table,
        spark.createDataFrame(
            [(0, 7, 999, False), (399, None, None, True), (500, 3, 1, False)],
            "k long, j long, v long, _del boolean",
        ),
        "k", delete_col="_del",
    )
    ivm.join_view_sync(spark, fact_table, dims_path, view, "j", ["g"], ["v"])
    served = {
        (r["g"], r["_n"], r["sum_v"])
        for r in ivm.agg_view_read(spark, view).collect()
    }
    assert served == recompute()


def test_compact_files_keyed_table_honors_stats_cols(spark, tmp_path):
    """Round 16: compact_files(stats_cols=...) used to apply only to
    plain tables (silently ignored on keyed ones) — a keyed compaction
    can now DECLARE new skipping stats, and later merges keep them
    alive on rewritten buckets."""
    path = str(tmp_path / "t")
    layout.snapshot_write_keyed(spark, _facts(spark, 200), path, "k", n_buckets=2)
    assert layout.snapshot_manifest(spark, path)["stats_types"] == {}
    layout.compact_files(
        spark, path, sort_by="j", stats_cols=["j"], max_records_per_file=25
    )
    m = layout.snapshot_manifest(spark, path)
    assert "j" in m["stats_types"]
    assert all(m["stats"].get(f, {}).get("j") for f in m["files"])
    # a merge rewrites buckets and the new files still carry j stats
    layout.snapshot_merge(
        spark, path,
        spark.createDataFrame([(0, 3, 1, False)], "k long, j long, v long, _del boolean"),
        "k", delete_col="_del",
    )
    m2 = layout.snapshot_manifest(spark, path)
    assert "j" in m2["stats_types"]
    assert all(m2["stats"].get(f, {}).get("j") for f in m2["files"])


def test_pruned_join_side_composite_key_tiers_compose(spark, tmp_path):
    """COMPOSITE join keys (round 17): a side keyed by one component
    bucket-prunes on it AND stats/bloom-prunes on the others — the
    kept file set is the intersection, strictly smaller than either
    tier alone here; rows stay exactly correct."""
    path = str(tmp_path / "t")
    # keyed by j (a join component), second component m has stats+bloom
    rows = spark.createDataFrame(
        [(i, i % 8, i // 50, i) for i in range(400)],
        "k long, j long, m long, x long",
    )
    layout.snapshot_write_keyed(spark, rows, path, "j", n_buckets=8)
    layout.compact_files(
        spark, path, sort_by="m", stats_cols=["m"], bloom_cols=["m"],
        max_records_per_file=25,
    )
    manifest = layout.snapshot_manifest(spark, path)
    n_total = len(manifest["files"])
    assert n_total >= 8

    delta = spark.createDataFrame([(3, 0), (3, 7)], "j long, m long")
    v = manifest["version"]
    both = ivm._pruned_join_side(spark, path, v, ["j", "m"], delta)
    j_only = ivm._pruned_join_side(spark, path, v, ["j"], delta)
    m_only = ivm._pruned_join_side(spark, path, v, ["m"], delta)
    nb, nj, nm = (
        len(both.inputFiles()), len(j_only.inputFiles()),
        len(m_only.inputFiles()),
    )
    assert 0 < nb <= min(nj, nm) < n_total
    assert nb < max(nj, nm)  # the intersection genuinely composed
    got = {
        r["k"]
        for r in both.filter(
            (F.col("j") == 3) & F.col("m").isin(0, 7)
        ).collect()
    }
    expect = {
        r["k"]
        for r in layout.snapshot_read(spark, path)
        .filter((F.col("j") == 3) & F.col("m").isin(0, 7))
        .collect()
    }
    assert got == expect and got

    # a component whose delta keys are ALL NULL joins nothing
    null_delta = spark.createDataFrame([(3, None)], "j long, m long")
    assert (
        ivm._pruned_join_side(spark, path, v, ["j", "m"], null_delta).count()
        == 0
    )
