"""Unit tests for the temporal join operators (as-of, bounded range):
boundary semantics that the oracle equality alone wouldn't pinpoint."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from fiware_cosmos_orion_flink_connector_examples_spark.operators.temporal import (
    asof_join,
    range_pairs,
)


def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def test_asof_backward_picks_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [(1, "u", _ts(10)), (2, "u", _ts(20)), (3, "u", _ts(5))],
        "id long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("u", _ts(10), "at10"), ("u", _ts(15), "at15"), ("u", _ts(1), "at1")],
        "k string, rts timestamp, tag string",
    )
    got = {
        r.id: r.tag
        for r in asof_join(left, right, "k", "ts", "rts", ["tag"]).collect()
    }
    # equal timestamp matches (inclusive); otherwise latest earlier row
    assert got == {1: "at10", 2: "at15", 3: "at1"}


def test_asof_inner_drops_unmatched_left_keeps_with_left(spark):
    left = spark.createDataFrame(
        [(1, "u", _ts(0)), (2, "v", _ts(9))], "id long, k string, ts timestamp"
    )
    right = spark.createDataFrame(
        [("u", _ts(5), "late")], "k string, rts timestamp, tag string"
    )
    inner = asof_join(left, right, "k", "ts", "rts", ["tag"]).collect()
    assert inner == []  # t=0 precedes the only right row; key v has none
    outer = asof_join(left, right, "k", "ts", "rts", ["tag"], how="left").collect()
    assert {r.id: r.tag for r in outer} == {1: None, 2: None}


def test_range_pairs_horizon_boundary_and_cells(spark):
    # gaps: 1-2 =3600s (inclusive boundary, crosses a cell edge),
    # 2-3 =1s (same cell), 1-3 =3601s (> horizon, dropped), w isolated
    df = spark.createDataFrame(
        [
            (1, "u", _ts(0)),
            (2, "u", dt.datetime(2024, 1, 1, 1, 0, 0)),
            (3, "u", dt.datetime(2024, 1, 1, 1, 0, 1)),
            (4, "w", _ts(30)),
        ],
        "event_id long, user_id string, ts timestamp",
    )
    got = {
        (r.id1, r.id2): r.gap_us
        for r in range_pairs(df, "user_id", "ts", 3600, "event_id").collect()
    }
    assert got == {(1, 2): 3_600_000_000, (2, 3): 1_000_000}


def test_range_pairs_equal_timestamps_tiebreak(spark):
    df = spark.createDataFrame(
        [(1, "u", _ts(0)), (2, "u", _ts(0))], "event_id long, user_id string, ts timestamp"
    )
    got = [(r.id1, r.id2) for r in range_pairs(df, "user_id", "ts", 60, "event_id").collect()]
    assert got == [(1, 2)]  # once, lower id first
