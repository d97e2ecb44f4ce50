"""Round-16 snapshot-layer fixes.

* ADVICE r15 (medium): ``_file_version_expr`` used SQL ``url_decode``
  unguarded — form decoding turns '+' into a space, unlike
  ``_normalize_file_uri``'s ``unquote`` — so any table path containing
  '+' made the file→commit map miss and ``snapshot_changes_feed``
  silently returned ``_version=NULL`` for every row.  '+' is now
  percent-escaped before decoding; pinned here with '+' AND space in
  the table path.
* VERDICT r15 #5: ``_file_version_expr`` put two literals per delta
  file into ONE ``create_map`` — a ~10k-file span meant ~20k literals
  in a single expression.  The map is now chunked into ≤1000-entry
  pieces under ``coalesce``; pinned here at a 5000-file padded span
  with a wall bound on analysis+execution.

Reference scope note: the reference repo has no storage layer (its
only sink is HTTP, Example2.scala:42); [ext] engine infrastructure.
"""

import time

from pyspark.sql import functions as F

from fiware_cosmos_orion_flink_connector_examples_spark.operators import ivm
from fiware_cosmos_orion_flink_connector_examples_spark.sources import layout


def _kv(spark, pairs):
    return spark.createDataFrame(list(pairs), "k long, v long")


def test_changes_feed_version_map_survives_plus_and_space_in_path(
    spark, tmp_path
):
    """A table path containing '+' (and a space) still resolves every
    feed row's _version — the form-decoding mismatch returned NULL for
    all of them (verified broken on the old expression)."""
    path = str(tmp_path / "dir+with plus" / "snap+tbl")
    layout.snapshot_write_keyed(spark, _kv(spark, [(1, 10), (2, 20)]), path, "k")
    layout.snapshot_merge(spark, path, _kv(spark, [(2, 21), (3, 30)]), "k")
    layout.snapshot_merge(spark, path, _kv(spark, [(1, 11)]), "k")

    feed = layout.snapshot_changes_feed(spark, path, 1).collect()
    assert feed, "feed must not be empty"
    vers = {r["_version"] for r in feed}
    assert None not in vers, "'+' in path must not null out _version"
    assert vers == {2, 3}
    by_key = {(r["_version"], r["k"], r["_change"]) for r in feed}
    assert (2, 3, "insert") in by_key
    assert (3, 1, "update") in by_key


def test_ivm_sync_on_plus_path(spark, tmp_path):
    """The pre-image guard groups by _version off the same map — an
    all-NULL _version would degrade its per-version check.  End-to-end
    agg view over a '+' path must stay exact."""
    src = str(tmp_path / "a+b" / "src")
    view = str(tmp_path / "a+b" / "view")
    layout.snapshot_write_keyed(
        spark,
        spark.createDataFrame([(1, "x", 5), (2, "y", 7)], "k long, g string, x long"),
        src,
        "k",
    )
    ivm.agg_view_create(spark, src, view, ["g"], ["x"])
    layout.snapshot_merge(
        spark,
        src,
        spark.createDataFrame([(1, "y", 9), (3, "x", 1)], "k long, g string, x long"),
        "k",
    )
    ivm.agg_view_sync(spark, src, view, ["g"], ["x"])
    got = {
        r["g"]: (r["_n"], r["sum_x"])
        for r in ivm.agg_view_read(spark, view).collect()
    }
    assert got == {"x": (1, 1), "y": (2, 16)}


def test_file_version_expr_chunks_large_span(spark, tmp_path):
    """A padded 5000-file span builds chunked ≤1000-entry maps under
    coalesce — versions stay exact for the real files and the whole
    analyze+execute pass stays bounded (the old single create_map put
    10k literals in one expression)."""
    path = str(tmp_path / "snap")
    layout.snapshot_write_keyed(spark, _kv(spark, [(1, 10), (2, 20)]), path, "k")
    layout.snapshot_merge(spark, path, _kv(spark, [(2, 21), (3, 30)]), "k")
    layout.snapshot_merge(spark, path, _kv(spark, [(3, 31)]), "k")
    span = layout.snapshot_span_delta_files(spark, path, 1, 3)
    padded = {
        v: list(files) for v, files in span["log_files"].items()
    }
    # 5000 fake files across 50 fake versions — never matched by any
    # input row, but all present in the lookup expression
    for fv in range(1000, 1050):
        padded[fv] = [f"file:/nonexistent/pad-{fv}-{i}.parquet" for i in range(100)]
    n_files = sum(len(fl) for fl in padded.values())
    assert n_files >= 5000

    all_logs = [f for fl in span["log_files"].values() for f in fl]
    t0 = time.perf_counter()
    rows = (
        spark.read.parquet(*all_logs)
        .select(layout._file_version_expr(padded).alias("_version"), "k")
        .collect()
    )
    wall = time.perf_counter() - t0
    got = {(r["_version"], r["k"]) for r in rows}
    assert {v for v, _ in got} == {2, 3}
    assert (3, 3) in got
    assert wall < 60.0, f"5000-file span expression took {wall:.1f}s"


def test_span_error_prefix_names_the_function(spark, tmp_path):
    """ADVICE r15: snapshot_span_delta_files raised errors prefixed
    'snapshot_changes_feed:', misattributing the failing function for
    direct callers like ivm._span_signed_rows."""
    import pytest

    path = str(tmp_path / "snap")
    layout.snapshot_write_keyed(spark, _kv(spark, [(1, 10)]), path, "k")
    with pytest.raises(ValueError, match="snapshot_span_delta_files"):
        layout.snapshot_span_delta_files(spark, path, 1, 1)
