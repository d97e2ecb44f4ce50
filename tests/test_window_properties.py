"""Property-based check of the sliding-window semantics: Spark's
epoch-aligned window expansion must agree with the independent Python
oracle for arbitrary microsecond timestamps (incl. exact slide
boundaries — the SURVEY §5 edge case)."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings
from hypothesis import strategies as st

from fiware_cosmos_orion_flink_connector_examples_spark.operators.windows import (
    sliding_window_agg,
)
from pyspark.sql import functions as F

from tests.fixtures import expected_sliding_windows

BASE = dt.datetime(2024, 1, 1)


@st.composite
def timestamp_batches(draw):
    n = draw(st.integers(min_value=1, max_value=25))
    # offsets in µs over a ~30 s span; includes exact 2 s boundaries
    offs = draw(
        st.lists(
            st.one_of(
                st.integers(min_value=0, max_value=30_000_000),
                st.sampled_from([0, 2_000_000, 4_000_000, 10_000_000]),
            ),
            min_size=n,
            max_size=n,
        )
    )
    return [BASE + dt.timedelta(microseconds=o) for o in offs]


@given(timestamp_batches())
@settings(max_examples=12, deadline=None)
def test_window_expansion_matches_python_oracle(spark, timestamps):
    rows = [(ts, "k", float(i)) for i, ts in enumerate(timestamps)]
    df = spark.createDataFrame(rows, "ts timestamp, id string, v double")
    got = {
        (r.window_start, r.id): r.mn
        for r in sliding_window_agg(
            df, "ts", ["id"], [F.min("v").alias("mn")]
        ).collect()
    }
    exp = {
        k: min(vs)
        for k, vs in expected_sliding_windows(
            [(ts, "k", float(i)) for i, ts in enumerate(timestamps)]
        ).items()
    }
    assert got == exp
