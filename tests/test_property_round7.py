"""Round-7 regression pins — one test per ADVICE r6 item, plus the
properties for the new round-7 operators as they land.

ADVICE r6 coverage:
  1 (medium) covariance_moments probes dim from the NULL-filtered
    frame — a NULL embedding in the arbitrary limit(1) row must not
    corrupt the flattened-index arithmetic.
  2 (low) topk_mmr derives its applyInPandas id type from the id
    column — string ids must not Arrow-crash.
  3 (low) the remove_* span entry points drop NULL-text docs at the
    boundary instead of emitting n_tokens=-1 rows.
  4 (low) streaming CEP resolves a same-timestamp error/purchase tie
    purchase-first, matching batch's strictly-inside error window.
"""

from __future__ import annotations

import json

import pandas as pd
import pytest
from pyspark.sql import functions as F


def test_covariance_dim_probe_skips_null_first_row(spark):
    """NULL embedding sorted FIRST: the dim probe must still find 3."""
    from fiware_cosmos_orion_flink_connector_examples_spark.operators.similarity import (
        covariance_moments,
    )

    df = spark.createDataFrame(
        [(0, None), (1, [1.0, 2.0, 3.0]), (2, [4.0, 5.0, 6.0])],
        "vec_id long, embedding array<double>",
    ).orderBy("vec_id")  # NULL row physically first
    rows = {(r.i, r.j): r for r in covariance_moments(df).collect()}
    assert len(rows) == 6  # 3*(3+1)/2 upper-triangle cells
    r00 = rows[(0, 0)]
    assert r00.n == 2
    assert r00.s_i == pytest.approx(5.0)  # 1 + 4
    assert r00.sxx == pytest.approx(17.0)  # 1 + 16


def test_topk_mmr_string_ids(spark):
    """String id column round-trips through the MMR kernel (ADVICE #2)."""
    from fiware_cosmos_orion_flink_connector_examples_spark.operators.similarity import (
        topk_mmr,
    )

    corpus = spark.createDataFrame(
        [("a", [1.0, 0.0]), ("b", [0.9, 0.1]), ("c", [0.0, 1.0])],
        "doc string, embedding array<double>",
    )
    queries = spark.createDataFrame(
        [("q1", [1.0, 0.0])], "doc string, embedding array<double>"
    )
    got = topk_mmr(
        corpus, queries, k=2, shortlist=3, lam=0.3,
        id_col="doc", vec_col="embedding",
    ).collect()
    assert [r.q_id for r in got] == ["q1", "q1"]
    assert got[0].n_id == "a"  # most relevant first
    assert got[1].n_id == "c"  # diversification beats the near-dup 'b'


@pytest.mark.parametrize("which", ["cross", "intra", "decon"])
def test_span_removal_drops_null_text(spark, which):
    """A NULL-text doc neither crashes nor emits n_tokens=-1 (ADVICE #3)."""
    from fiware_cosmos_orion_flink_connector_examples_spark.operators import dedup

    df = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j"),
            (2, "a b c d e f g h i j"),
            (3, None),
        ],
        "doc_id long, text string",
    )
    if which == "cross":
        out = dedup.remove_repeated_spans(df, "doc_id", n=8)
    elif which == "intra":
        out = dedup.remove_intra_doc_repeats(df, "doc_id", n=4)
    else:
        ev = spark.createDataFrame(
            [(100, "a b c d e f g h")], "doc_id long, text string"
        )
        out = dedup.remove_contaminated_spans(df, ev, "doc_id", n=8)
    rows = {r.doc_id: r for r in out.collect()}
    assert 3 not in rows  # NULL payload dropped at the boundary
    assert all(r.n_tokens >= 0 and r.n_removed >= 0 for r in rows.values())
    if which in ("cross", "decon"):
        assert rows[2].n_removed > 0  # the dup/contaminated doc is cut


def test_streaming_cep_purchase_error_timestamp_tie(spark, tmp_path):
    """error and matching purchase share a timestamp: batch keeps the
    match (error not strictly inside (t0, t1)) — the stream must too,
    regardless of event_id order (ADVICE #4)."""
    from fiware_cosmos_orion_flink_connector_examples_spark.streaming import jobs

    base = 1_700_000_000.0
    evs = [
        # user 1: error's event_id sorts BEFORE the tied purchase
        {"ts": base, "event_id": 0, "user_id": 1, "event_type": "signup"},
        {"ts": base + 60, "event_id": 1, "user_id": 1, "event_type": "error"},
        {"ts": base + 60, "event_id": 2, "user_id": 1, "event_type": "purchase"},
        # user 2: error strictly inside (t0, t1) still kills the pattern
        {"ts": base, "event_id": 3, "user_id": 2, "event_type": "signup"},
        {"ts": base + 30, "event_id": 4, "user_id": 2, "event_type": "error"},
        {"ts": base + 60, "event_id": 5, "user_id": 2, "event_type": "purchase"},
    ]
    spool = tmp_path / "spool"
    spool.mkdir()
    with open(spool / "b1.jsonl", "w") as f:
        for e in evs:
            f.write(json.dumps(e) + "\n")
    stream = (
        spark.readStream.schema(
            "ts double, event_id long, user_id long, event_type string"
        )
        .json(str(spool))
        .selectExpr(
            "user_id", "timestamp_seconds(ts) AS ts", "event_id", "event_type"
        )
    )
    out_dir = str(tmp_path / "out")
    q = (
        jobs.streaming_cep_signup_purchase(stream)
        .writeStream.format("json")
        .option("path", out_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.user_id: (r.latency_us,)
        for r in spark.read.schema(
            "user_id long, signup_ts long, purchase_ts long, latency_us long"
        ).json(out_dir).collect()
    }
    assert set(got) == {1}
    assert got[1] == (60_000_000,)
