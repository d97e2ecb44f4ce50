"""Incremental view maintenance (operators/ivm.py): a count/sum GROUP
BY view follows its source snapshot table commit-by-commit via CDC
post-images + update pre-images — never recomputing a group — and the
delta merge + consumed-source watermark are one atomic view commit
(exactly-once, the search_index_sync contract applied to aggregates).
"""

from __future__ import annotations

import random

import pyspark.sql.functions as F

from fiware_cosmos_orion_flink_connector_examples_spark.operators import ivm
from fiware_cosmos_orion_flink_connector_examples_spark.sources import layout


def _src(spark, rows):
    return spark.createDataFrame(rows, "k long, g string, x long")


def _recompute(spark, source, version=None):
    return {
        (r["g"], r["_n"], r["sum_x"])
        for r in layout.snapshot_read(spark, source, version)
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(F.coalesce(F.col("x"), F.lit(0))).alias("sum_x"),
        )
        .collect()
    }


def _view(spark, view):
    return {
        (r["g"], r["_n"], r["sum_x"])
        for r in ivm.agg_view_read(spark, view).collect()
    }


def test_view_follows_inserts_updates_moves_deletes(spark, tmp_path):
    source, view = str(tmp_path / "src"), str(tmp_path / "view")
    base = [(i, "abc"[i % 3], i * 10) for i in range(30)]
    layout.snapshot_write_keyed(spark, _src(spark, base), source, "k")
    ivm.agg_view_create(spark, source, view, ["g"], ["x"], n_buckets=4)
    assert _view(spark, view) == _recompute(spark, source)

    # value update, GROUP-MOVING update, insert, delete — one commit
    upd = spark.createDataFrame(
        [
            (0, "a", 999, False),   # value update within group a
            (1, "c", 11, False),    # moves from b to c
            (100, "d", 7, False),   # insert, NEW group
            (2, None, None, True),  # delete
        ],
        "k long, g string, x long, _del boolean",
    )
    layout.snapshot_merge(spark, source, upd, "k", delete_col="_del")
    v, consumed = ivm.agg_view_sync(spark, source, view, ["g"], ["x"])
    assert v == 2 and consumed == 2
    assert _view(spark, view) == _recompute(spark, source)

    # replayed sync: nothing new — watermark absorbs it
    assert ivm.agg_view_sync(spark, source, view, ["g"], ["x"]) == (None, 2)


def test_group_reaching_zero_rows_is_deleted(spark, tmp_path):
    source, view = str(tmp_path / "src"), str(tmp_path / "view")
    layout.snapshot_write_keyed(
        spark, _src(spark, [(1, "solo", 5), (2, "big", 1), (3, "big", 2)]),
        source, "k",
    )
    ivm.agg_view_create(spark, source, view, ["g"], ["x"])
    dele = spark.createDataFrame(
        [(1, None, None, True)], "k long, g string, x long, _del boolean"
    )
    layout.snapshot_merge(spark, source, dele, "k", delete_col="_del")
    ivm.agg_view_sync(spark, source, view, ["g"], ["x"])
    got = _view(spark, view)
    assert got == {("big", 2, 3)}  # 'solo' is GONE, not a zero ghost


def test_multi_commit_span_one_sync(spark, tmp_path):
    source, view = str(tmp_path / "src"), str(tmp_path / "view")
    layout.snapshot_write_keyed(
        spark, _src(spark, [(i, "ab"[i % 2], i) for i in range(10)]), source, "k"
    )
    ivm.agg_view_create(spark, source, view, ["g"], ["x"])
    for j in range(3):  # three commits before one sync
        upd = spark.createDataFrame(
            [(j, "b", 1000 + j, False), (50 + j, "a", j, False)],
            "k long, g string, x long, _del boolean",
        )
        layout.snapshot_merge(spark, source, upd, "k", delete_col="_del")
    v, consumed = ivm.agg_view_sync(spark, source, view, ["g"], ["x"])
    assert consumed == 4
    assert _view(spark, view) == _recompute(spark, source)


def test_preimages_api_and_default_feed_shape(spark, tmp_path):
    source = str(tmp_path / "src")
    layout.snapshot_write_keyed(
        spark, _src(spark, [(1, "a", 10), (2, "b", 20)]), source, "k"
    )
    upd = spark.createDataFrame(
        [(1, "a", 11, False), (2, None, None, True), (3, "c", 30, False)],
        "k long, g string, x long, _del boolean",
    )
    layout.snapshot_merge(spark, source, upd, "k", delete_col="_del")
    pre = layout.snapshot_update_preimages(spark, source, 2)
    assert [(r["k"], r["g"], r["x"]) for r in pre.collect()] == [(1, "a", 10)]
    # the default feed stays the Delta CDF post-image shape: no
    # update_pre rows leak into consumers
    feed = layout.snapshot_changes_feed(spark, source, 1)
    kinds = {r["_change"] for r in feed.collect()}
    assert kinds == {"insert", "update", "delete"}
    # a no-op update records NO pre-image (same filter as the log)
    noop = spark.createDataFrame(
        [(3, "c", 30, False)], "k long, g string, x long, _del boolean"
    )
    layout.snapshot_merge(spark, source, noop, "k", delete_col="_del")
    assert layout.snapshot_update_preimages(spark, source, 3).count() == 0


def test_randomized_view_equals_recompute(spark, tmp_path):
    """Model-based: a seeded random op stream (inserts, value updates,
    group moves, deletes, multi-commit gaps) — after every sync the
    view equals a from-scratch recompute of the source."""
    rng = random.Random(20260816)
    source, view = str(tmp_path / "src"), str(tmp_path / "view")
    rows = {i: ("abcd"[i % 4], i) for i in range(40)}
    layout.snapshot_write_keyed(
        spark, _src(spark, [(k, g, x) for k, (g, x) in rows.items()]), source, "k"
    )
    ivm.agg_view_create(spark, source, view, ["g"], ["x"], n_buckets=4)
    next_key = 1000
    for _ in range(6):
        for _ in range(rng.randint(1, 2)):  # commits per sync
            batch = []
            for _ in range(rng.randint(1, 6)):
                op = rng.random()
                if op < 0.3 or not rows:  # insert
                    batch.append((next_key, rng.choice("abcde"), rng.randint(0, 99), False))
                    rows[next_key] = (batch[-1][1], batch[-1][2])
                    next_key += 1
                elif op < 0.7:  # update (possibly group-moving)
                    k = rng.choice(list(rows))
                    g, x = rng.choice("abcde"), rng.randint(0, 99)
                    batch.append((k, g, x, False))
                    rows[k] = (g, x)
                else:  # delete
                    k = rng.choice(list(rows))
                    batch.append((k, None, None, True))
                    del rows[k]
            dedup = {}
            for b in batch:  # merge rejects duplicate keys in one batch
                dedup[b[0]] = b
            layout.snapshot_merge(
                spark,
                source,
                spark.createDataFrame(
                    list(dedup.values()), "k long, g string, x long, _del boolean"
                ),
                "k",
                delete_col="_del",
            )
            # replay model state for keys both updated and deleted etc.
            for k, g, x, d in dedup.values():
                if d:
                    rows.pop(k, None)
                else:
                    rows[k] = (g, x)
        ivm.agg_view_sync(spark, source, view, ["g"], ["x"])
        assert _view(spark, view) == _recompute(spark, source)
    # final model cross-check: source matches the python model too
    got = {
        (r["k"], r["g"], r["x"])
        for r in layout.snapshot_read(spark, source).collect()
    }
    assert got == {(k, g, x) for k, (g, x) in rows.items()}


def test_maintain_agg_view_streaming_sink_exactly_once(spark, tmp_path):
    """maintain_agg_view: each micro-batch merges into the source
    (batch-id watermark) and the view follows the commit log — replays
    of either leg are absorbed, the final view equals a recompute."""
    from fiware_cosmos_orion_flink_connector_examples_spark.streaming import jobs

    source, view = str(tmp_path / "src"), str(tmp_path / "view")
    layout.snapshot_write_keyed(
        spark, _src(spark, [(i, "ab"[i % 2], i) for i in range(20)]), source, "k"
    )
    ivm.agg_view_create(spark, source, view, ["g"], ["x"], txn_app="s")
    sink = jobs.maintain_agg_view(source, view, "k", ["g"], ["x"], txn_app="s")

    b0 = spark.createDataFrame(
        [(0, "b", 100, False), (1, None, None, True), (50, "c", 7, False)],
        "k long, g string, x long, _del boolean",
    )
    b1 = spark.createDataFrame(
        [(2, "c", 5, False)], "k long, g string, x long, _del boolean"
    )
    sink(b0, 0)
    sink(b0, 0)  # immediate replay: source absorbed, view sync no-op
    sink(b1, 1)
    sink(b0, 0)  # stale replay after a later batch
    sink(spark.createDataFrame([], b0.schema), 2)  # empty: nothing moves
    assert layout.snapshot_latest_version(spark, source) == 3  # v1 + 2 merges
    assert _view(spark, view) == _recompute(spark, source)
    # replay left no double-applied deltas: totals for the moved keys
    got = {r["g"]: (r["_n"], r["sum_x"]) for r in ivm.agg_view_read(spark, view).collect()}
    assert got["c"] == (2, 12)


def test_distinct_view_follows_moves_and_deletes(spark, tmp_path):
    """Exact COUNT(DISTINCT) via the pair-view reduction: value moves
    and deletes adjust the count exactly (the case HLL sketches cannot
    handle), reads equal a from-scratch countDistinct."""
    source, view = str(tmp_path / "src"), str(tmp_path / "view")
    # g in {a,b}; x values deliberately shared across keys
    base = [(i, "ab"[i % 2], i % 5) for i in range(20)]
    layout.snapshot_write_keyed(spark, _src(spark, base), source, "k")
    ivm.distinct_view_create(spark, source, view, ["g"], "x")

    def recompute():
        return {
            (r["g"], r["nd"])
            for r in layout.snapshot_read(spark, source)
            .groupBy("g")
            .agg(F.countDistinct("x").alias("nd"))
            .collect()
        }

    def view_counts():
        return {
            (r["g"], r["n_distinct_x"])
            for r in ivm.distinct_view_read(spark, view, ["g"], "x").collect()
        }

    assert view_counts() == recompute()
    upd = spark.createDataFrame(
        [
            (0, "a", 99, False),    # value move: may retire a's only 0? (k=0 had x=0; k=10 also x=0 in a) — count logic decides
            (2, "a", 99, False),    # duplicate new value: distinct +0 beyond first
            (1, None, None, True),  # delete
            (100, "c", 7, False),   # new group
        ],
        "k long, g string, x long, _del boolean",
    )
    layout.snapshot_merge(spark, source, upd, "k", delete_col="_del")
    ivm.distinct_view_sync(spark, source, view, ["g"], "x")
    assert view_counts() == recompute()
    # delete the last row carrying a value: the pair row disappears,
    # the distinct count drops — sketch-impossible, exact here
    dele = spark.createDataFrame(
        [(100, None, None, True)], "k long, g string, x long, _del boolean"
    )
    layout.snapshot_merge(spark, source, dele, "k", delete_col="_del")
    ivm.distinct_view_sync(spark, source, view, ["g"], "x")
    assert view_counts() == recompute()
    assert ("c", 1) not in view_counts()  # group c is gone entirely


def test_extremes_view_survives_extremum_deletion(spark, tmp_path):
    """MIN/MAX off the pair view: deleting the rows that carry a
    group's current max retires its pair row, and the next value takes
    over — the case plain delta-IVM cannot maintain."""
    source, view = str(tmp_path / "src"), str(tmp_path / "view")
    base = [(1, "a", 10), (2, "a", 99), (3, "a", 99), (4, "b", 5)]
    layout.snapshot_write_keyed(spark, _src(spark, base), source, "k")
    ivm.distinct_view_create(spark, source, view, ["g"], "x")

    def extremes():
        return {
            (r["g"], r["min_x"], r["max_x"])
            for r in ivm.extremes_view_read(spark, view, ["g"], "x").collect()
        }

    assert extremes() == {("a", 10, 99), ("b", 5, 5)}
    # delete ONE of the two rows carrying 99: max must stay 99
    d1 = spark.createDataFrame(
        [(2, None, None, True)], "k long, g string, x long, _del boolean"
    )
    layout.snapshot_merge(spark, source, d1, "k", delete_col="_del")
    ivm.distinct_view_sync(spark, source, view, ["g"], "x")
    assert extremes() == {("a", 10, 99), ("b", 5, 5)}
    # delete the LAST 99: the pair dies, max falls back to 10
    d2 = spark.createDataFrame(
        [(3, None, None, True)], "k long, g string, x long, _del boolean"
    )
    layout.snapshot_merge(spark, source, d2, "k", delete_col="_del")
    ivm.distinct_view_sync(spark, source, view, ["g"], "x")
    assert extremes() == {("a", 10, 10), ("b", 5, 5)}
