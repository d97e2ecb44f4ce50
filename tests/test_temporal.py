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


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_key = st.integers(min_value=0, max_value=3)
_sec = st.integers(min_value=0, max_value=50)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    left=st.lists(st.tuples(_key, _sec), min_size=1, max_size=25),
    right=st.lists(st.tuples(_key, _sec), min_size=1, max_size=25, unique=True),
)
def test_asof_join_matches_pandas_merge_asof(spark, left, right):
    """Distributed as-of == pandas.merge_asof (backward, inclusive,
    by-key) on arbitrary generated data — the independent reference
    implementation, not our own oracle SQL."""
    import pandas as pd

    ldf = spark.createDataFrame(
        [(k, i, _ts(s)) for i, (k, s) in enumerate(left)], ["k", "lid", "lts"]
    )
    # right must be unique per (key, ts) — the operator's documented contract
    rseen, rrows = set(), []
    for k, s in right:
        if (k, s) not in rseen:
            rseen.add((k, s))
            rrows.append((k, s * 1000 + k, _ts(s)))
    rdf = spark.createDataFrame(rrows, ["k", "payload", "rts"])

    got = {
        (r.lid, r.payload)
        for r in asof_join(
            ldf, rdf, on="k", left_ts="lts", right_ts="rts",
            payload_cols=["payload"], how="left",
        ).collect()
    }

    lp = pd.DataFrame(
        [(k, i, _ts(s)) for i, (k, s) in enumerate(left)],
        columns=["k", "lid", "lts"],
    ).sort_values("lts", kind="mergesort")
    rp = pd.DataFrame(rrows, columns=["k", "payload", "rts"]).sort_values(
        "rts", kind="mergesort"
    )
    merged = pd.merge_asof(
        lp, rp, left_on="lts", right_on="rts", by="k", direction="backward",
        allow_exact_matches=True,
    )
    want = {
        (int(r.lid), None if pd.isna(r.payload) else int(r.payload))
        for r in merged.itertuples()
    }
    assert got == want


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(st.tuples(_key, _sec), min_size=1, max_size=30))
def test_range_pairs_matches_bruteforce(spark, rows):
    """Cell-bucketed range join == O(n²) reference on generated data:
    every same-key pair within the horizon appears exactly once,
    earlier id first, none outside the horizon."""
    horizon = 7
    data = [(k, i, _ts(s)) for i, (k, s) in enumerate(rows)]
    df = spark.createDataFrame(data, ["k", "id", "ts"])
    got = {
        (r.k, r.id1, r.id2, r.gap_us)
        for r in range_pairs(df, "k", "ts", horizon_secs=horizon, id_col="id").collect()
    }
    want = set()
    for k1, i1, t1 in data:
        for k2, i2, t2 in data:
            if k1 != k2 or i1 == i2:
                continue
            d = (t2 - t1).total_seconds()
            if 0 <= d <= horizon and (d > 0 or i1 < i2):
                want.add((k1, i1, i2, int(d * 1_000_000)))
    assert got == want
