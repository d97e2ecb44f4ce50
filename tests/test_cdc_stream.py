"""The snapshot CDC feed as a native Structured Streaming source
(round 16, ``sources/cdc_stream.py``): version-offset checkpointing,
executor-side per-file partitions, feed parity with
``layout.snapshot_changes_feed``, and exactly-once across a
checkpointed restart."""

from __future__ import annotations

import pytest

from fiware_cosmos_orion_flink_connector_examples_spark.sources import (
    cdc_stream,
    layout,
)


def _kv(spark, rows, schema="k long, g string, x long"):
    return spark.createDataFrame(rows, schema)


UPD = "k long, g string, x long, _del boolean"


@pytest.fixture()
def table(spark, tmp_path):
    p = str(tmp_path / "t")
    layout.snapshot_write_keyed(
        spark, _kv(spark, [(1, "a", 5), (2, "b", 7), (3, "c", 2)]), p, "k",
        n_buckets=2,
    )
    layout.snapshot_merge(
        spark, p,
        _kv(spark, [(2, "b", 9, False), (3, None, None, True),
                    (4, "d", 1, False)], UPD),
        "k", delete_col="_del",
    )
    return p


def _drain(spark, path, ckpt, name, start=0):
    """Drain everything unconsumed into a set via foreachBatch (the
    memory sink cannot recover from a checkpoint; foreachBatch can)."""
    cdc_stream.register(spark)
    got: set = set()

    def sink(batch, batch_id):
        got.update(tuple(r) for r in batch.collect())

    q = (
        spark.readStream.format("snapshot_cdc")
        .option("startVersion", start)
        .load(path)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return got


def test_stream_matches_changes_feed_plus_bootstrap(spark, tmp_path, table):
    got = _drain(spark, table, str(tmp_path / "ck"), "cdc_t1")
    # bootstrap: v1's rows as inserts
    boot = {(1, "insert", r["k"], r["g"], r["x"])
            for r in layout.snapshot_read(spark, table, 1).collect()}
    feed = {
        (r["_version"], r["_change"], r["k"], r["g"], r["x"])
        for r in layout.snapshot_changes_feed(spark, table, 1).collect()
    }
    assert got == boot | feed
    assert (2, "delete", 3, "c", 2) in got  # deletes carry the OLD row
    assert not any(c == "update_pre" for _, c, *_ in got)


def test_checkpointed_restart_is_exactly_once(spark, tmp_path, table):
    ckpt = str(tmp_path / "ck")
    got1 = _drain(spark, table, ckpt, "cdc_r1")
    assert {v for v, *_ in got1} == {1, 2}

    # restart with NO new commits: nothing re-delivered
    got2 = _drain(spark, table, ckpt, "cdc_r2")
    assert got2 == set()

    # one new commit: ONLY its changes arrive on the next restart
    layout.snapshot_merge(
        spark, table,
        _kv(spark, [(1, "a", 50, False), (4, None, None, True)], UPD),
        "k", delete_col="_del",
    )
    got3 = _drain(spark, table, ckpt, "cdc_r3")
    assert got3 == {(3, "update", 1, "a", 50), (3, "delete", 4, "d", 1)}


def test_start_version_skips_bootstrap(spark, tmp_path, table):
    got = _drain(spark, table, str(tmp_path / "ck"), "cdc_s1", start=1)
    assert {v for v, *_ in got} == {2}


def test_feed_drives_downstream_aggregate(spark, tmp_path, table):
    """The point of the source: ANY streaming query can consume the
    commit log — a foreachBatch aggregate over the feed reconstructs
    the table's current per-group totals from changes alone."""
    import pyspark.sql.functions as F

    state: dict = {}

    def apply_batch(batch, batch_id):
        for r in batch.collect():
            if r["_change"] == "delete":
                state.pop(r["k"], None)
            else:
                state[r["k"]] = (r["g"], r["x"])

    cdc_stream.register(spark)
    q = (
        spark.readStream.format("snapshot_cdc")
        .load(table)
        .writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    expect = {
        r["k"]: (r["g"], r["x"])
        for r in layout.snapshot_read(spark, table).collect()
    }
    assert state == expect


def test_vacuumed_version_raises_rebootstrap_hint(spark, tmp_path):
    p = str(tmp_path / "t")
    layout.snapshot_write_keyed(spark, _kv(spark, [(1, "a", 5)]), p, "k")
    for i in range(3):
        layout.snapshot_merge(
            spark, p, _kv(spark, [(1, "a", 10 + i, False)], UPD), "k",
            delete_col="_del",
        )
    layout.vacuum_snapshots(spark, p, keep_last=1)
    cdc_stream.register(spark)
    q = (
        spark.readStream.format("snapshot_cdc")
        .option("startVersion", 0)
        .load(p)
        .writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="vacuum|missing"):
        q.awaitTermination(120)
        if q.exception():
            raise q.exception()


def test_include_pre_images_enables_external_signed_ivm(spark, tmp_path, table):
    """includePreImages=true emits update_pre rows — an EXTERNAL
    consumer can then maintain its own aggregate with the signed
    algebra (insert/update +1, delete/update_pre -1) and land exactly
    on the table's current totals."""
    cdc_stream.register(spark)
    totals: dict = {}

    def apply_batch(batch, batch_id):
        for r in batch.collect():
            sign = 1 if r["_change"] in ("insert", "update") else -1
            n, s = totals.get(r["g"], (0, 0))
            n, s = n + sign, s + sign * (r["x"] or 0)
            if n == 0:
                totals.pop(r["g"], None)
            else:
                totals[r["g"]] = (n, s)

    q = (
        spark.readStream.format("snapshot_cdc")
        .option("includePreImages", "true")
        .load(table)
        .writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    import pyspark.sql.functions as F

    expect = {
        r["g"]: (r["n"], r["s"])
        for r in layout.snapshot_read(spark, table)
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("x").alias("s"))
        .collect()
    }
    assert totals == expect


def test_hostile_table_path_space_plus_percent(spark, tmp_path):
    """Manifests record RAW Hadoop paths (never percent-encoded): a
    table under a directory containing a space, '+', AND a literal
    '%20' must stream correctly — percent-decoding the recorded file
    paths would resolve the wrong file (round-16 fix)."""
    import os

    base = str(tmp_path / "dir with+plus%20pct")
    os.makedirs(base)
    p = f"{base}/t"
    layout.snapshot_write_keyed(spark, _kv(spark, [(1, "a", 5)]), p, "k")
    layout.snapshot_merge(
        spark, p, _kv(spark, [(1, "a", 9, False), (2, "b", 3, False)], UPD),
        "k", delete_col="_del",
    )
    got = _drain(spark, p, str(tmp_path / "ck"), "cdc_hostile")
    assert got == {(1, "insert", 1, "a", 5), (2, "update", 1, "a", 9),
                   (2, "insert", 2, "b", 3)}
