"""Z-order clustering on SNAPSHOT tables (compact_files(zorder_by=...))
and the multi-column stats-pruned scan (snapshot_scan_multi).

The claims pinned here:
  1. snapshot_scan_multi is CORRECT regardless of layout — output
     equals filtering a full snapshot_read with the same conjunctive
     box predicate (pruning may only skip files that cannot match).
  2. After zorder_by compaction, a box predicate on a NON-LEADING
     dimension prunes files; under linear sort_by compaction the same
     predicate reads every file (the write_zordered claim, re-proven
     through the snapshot manifest stats path end-to-end).
  3. On a KEYED table, zorder_by compaction preserves the bucket map
     (later merges stay bucket-pruned and key-correct) while scans
     prune files within buckets.
  4. Z-ordered columns ALWAYS get manifest stats, even when the table
     had none before — clustering without the stats that exploit it
     would be a silent no-op (the round-13 compact_files lesson).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from fiware_cosmos_orion_flink_connector_examples_spark.sources import layout


def _grid(spark, n=128):
    # n x n integer grid appended in row-major order: a linear x-sort
    # clusters x stripes; y is maximally scattered across files
    return spark.range(n * n).select(
        F.col("id").alias("k"),
        (F.col("id") % n).alias("x"),
        (F.col("id") / n).cast("long").alias("y"),
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_scan_multi_correct_and_prunes_after_zorder(spark, tmp_path):
    base = str(tmp_path / "t")
    grid = _grid(spark)
    # unordered multi-commit history: interleave thirds so every
    # pre-compaction file spans most of both dimensions
    layout.snapshot_commit(spark, grid.filter(F.col("k") % 3 == 0), base,
                           stats_cols=["x", "y"])
    layout.snapshot_commit(spark, grid.filter(F.col("k") % 3 == 1), base,
                           mode="append", stats_cols=["x", "y"])
    layout.snapshot_commit(spark, grid.filter(F.col("k") % 3 == 2), base,
                           mode="append", stats_cols=["x", "y"])

    box = {"x": (10, 25), "y": (40, 55)}
    expected = _rows(
        layout.snapshot_read(spark, base)
        .filter(F.col("x").between(10, 25) & F.col("y").between(40, 55))
    )
    df0, read0, total0 = layout.snapshot_scan_multi(spark, base, box)
    assert _rows(df0) == expected  # correct on the blurred layout too

    v = layout.compact_files(spark, base, target_files=16, zorder_by=["x", "y"])
    assert layout.snapshot_latest_version(spark, base) == v
    df1, read1, total1 = layout.snapshot_scan_multi(spark, base, box)
    assert _rows(df1) == expected
    assert total1 == 16 or total1 > 0
    # a 16/128 x 16/128 box is ~1.6% of the curve; half the files is a
    # loose bound that still proves real pruning
    assert read1 < total1, f"no pruning after zorder: {read1}/{total1}"
    assert read1 <= total1 // 2, f"weak pruning: {read1}/{total1}"


def test_zorder_prunes_nonleading_dim_where_linear_sort_cannot(spark, tmp_path):
    zbase = str(tmp_path / "z")
    lbase = str(tmp_path / "l")
    grid = _grid(spark)
    for b in (zbase, lbase):
        layout.snapshot_commit(spark, grid, b, stats_cols=["x", "y"])
    layout.compact_files(spark, zbase, target_files=16, zorder_by=["x", "y"])
    layout.compact_files(spark, lbase, target_files=16, sort_by="x")

    ybox = {"y": (40, 55)}  # y-only: the non-leading dimension
    zdf, zread, ztotal = layout.snapshot_scan_multi(spark, zbase, ybox)
    ldf, lread, ltotal = layout.snapshot_scan_multi(spark, lbase, ybox)
    assert _rows(zdf) == _rows(ldf)
    # linear x-sort: every file spans all of y -> zero pruning
    assert lread == ltotal
    assert zread < lread, f"zorder not better: {zread} vs {lread}"


def test_sort_by_and_zorder_by_are_exclusive(spark, tmp_path):
    import pytest

    base = str(tmp_path / "t")
    layout.snapshot_commit(spark, _grid(spark, 8), base)
    with pytest.raises(ValueError, match="exclusive"):
        layout.compact_files(spark, base, sort_by="x", zorder_by=["x", "y"])


def test_zorder_records_stats_on_statless_table(spark, tmp_path):
    base = str(tmp_path / "t")
    layout.snapshot_commit(spark, _grid(spark, 64), base)  # no stats_cols
    assert layout.snapshot_manifest(spark, base)["stats_types"] == {}
    layout.compact_files(spark, base, target_files=8, zorder_by=["x", "y"])
    m = layout.snapshot_manifest(spark, base)
    assert set(m["stats_types"]) == {"x", "y"}
    _, read, total = layout.snapshot_scan_multi(spark, base, {"y": (0, 7)})
    assert read < total


def test_keyed_zorder_preserves_buckets_and_merge(spark, tmp_path):
    base = str(tmp_path / "t")
    grid = _grid(spark, 64)
    layout.snapshot_write_keyed(spark, grid, base, "k", n_buckets=4,
                                stats_cols=["x", "y"])
    layout.compact_files(
        spark, base, zorder_by=["x", "y"], max_records_per_file=256
    )
    m = layout.snapshot_manifest(spark, base)
    assert m["keyed"] and int(m["keyed"]["n_buckets"]) == 4
    assert len(m["files"]) > 4  # chunked: >1 file per bucket
    # within-bucket clustering: a small box reads a minority of files
    _, read, total = layout.snapshot_scan_multi(
        spark, base, {"x": (0, 7), "y": (0, 7)}
    )
    assert read < total
    # merge after compaction stays key-correct
    upd = spark.range(10).select(
        F.col("id").alias("k"),
        F.lit(999).cast("long").alias("x"),
        F.lit(999).cast("long").alias("y"),
    )
    layout.snapshot_merge(spark, base, upd, "k")
    got = layout.snapshot_read(spark, base)
    assert got.count() == 64 * 64
    assert got.filter(F.col("x") == 999).count() == 10


def test_zorder_compaction_is_cdc_silent_and_time_travels(spark, tmp_path):
    base = str(tmp_path / "t")
    grid = _grid(spark, 32)
    layout.snapshot_commit(spark, grid, base, stats_cols=["x", "y"])
    v = layout.compact_files(spark, base, target_files=4, zorder_by=["x", "y"])
    # no logical change: the CDC feed over the compaction span is empty
    feed = layout.snapshot_changes_feed(spark, base, v - 1, key_col="k")
    assert feed.count() == 0
    # pre-compaction version still readable
    assert layout.snapshot_read(spark, base, v - 1).count() == 32 * 32


def test_compact_files_max_records_applies_to_plain_tables(spark, tmp_path):
    """ADVICE r14: max_records_per_file was silently ignored on
    non-keyed tables — a caller capping file sizes on a plain
    z-ordered table got no chunking.  Now each range/Z partition
    splits into contiguous files under the cap."""
    base = str(tmp_path / "t")
    df = spark.range(0, 1000).select(
        F.col("id").alias("a"), (F.col("id") % 7).alias("b")
    )
    layout.snapshot_commit(spark, df, base, stats_cols=["a"])
    layout.compact_files(
        spark, base, target_files=2, sort_by="a", max_records_per_file=100
    )
    m = layout.snapshot_manifest(spark, base)
    assert len(m["files"]) >= 10  # 1000 rows / 100-row cap
    got = layout.snapshot_read(spark, base).count()
    assert got == 1000
    # chunking preserved the clustering contract: per-file [min,max]
    # ranges stay disjoint along the sort column
    spans = sorted(
        (m["stats"][f]["a"][0], m["stats"][f]["a"][1]) for f in m["files"]
    )
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2
