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


# --- image perceptual-hash dedup (round-7 headline operator) ---------------


def test_encoders_round_trip_pixel_arrays():
    """encode_bmp_gray / encode_png_gray -> decode array: bit-exact,
    including BMP's bottom-up row order and row padding."""
    import numpy as np

    from fiware_cosmos_orion_flink_connector_examples_spark.operators import multimodal

    rng = np.random.default_rng(7)
    for h, w in [(8, 8), (16, 16), (13, 21), (9, 8)]:
        a = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        bmp = multimodal.decode_bmp_array(multimodal.encode_bmp_gray(a))
        assert bmp.shape == (h, w, 3)
        assert (bmp == a[:, :, None]).all()
        png = multimodal.decode_png_array(multimodal.encode_png_gray(a))
        assert png.shape == (h, w, 1)
        assert (png[:, :, 0] == a).all()


def test_ahash64_matches_brute_force():
    """ahash64 == the definition computed independently: block means
    via explicit slicing, bit = cell >= mean, MSB-first packing, signed
    two's-complement wrap."""
    import numpy as np

    from fiware_cosmos_orion_flink_connector_examples_spark.operators.multimodal import (
        ahash64,
    )

    rng = np.random.default_rng(11)
    for h, w in [(8, 8), (16, 16), (64, 48), (17, 23)]:
        a = rng.integers(0, 256, size=(h, w)).astype("float64")
        cells = np.empty((8, 8))
        for R in range(8):
            for C in range(8):
                r0, r1 = (R * h) // 8, ((R + 1) * h) // 8 if R < 7 else h
                c0, c1 = (C * w) // 8, ((C + 1) * w) // 8 if C < 7 else w
                cells[R, C] = a[r0:r1, c0:c1].mean()
        bits = (cells >= cells.mean()).ravel()
        want = 0
        for i, b in enumerate(bits):
            if b:
                want |= 1 << (63 - i)
        if want >= 1 << 63:
            want -= 1 << 64
        assert ahash64(a) == want


def test_ahash_small_perturbation_small_hamming():
    """The perceptual property: a few edited pixels move the hash a few
    bits; an unrelated image moves it far."""
    import numpy as np

    from fiware_cosmos_orion_flink_connector_examples_spark.operators.multimodal import (
        ahash64,
    )

    rng = np.random.default_rng(3)
    base = rng.integers(0, 256, size=(64, 64)).astype("float64")
    edited = base.copy()
    edited[:4, :4] = 255  # one corner patch
    other = rng.integers(0, 256, size=(64, 64)).astype("float64")

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert ham(ahash64(base), ahash64(edited)) <= 4
    assert ham(ahash64(base), ahash64(other)) >= 16


def test_hash_dup_pairs_exact_recall_vs_brute_force(spark):
    """Banding is a prune, not an approximation: pairs == the O(n^2)
    brute-force Hamming filter, including hashes with the sign bit set
    (shiftrightunsigned regression guard)."""
    import random

    from fiware_cosmos_orion_flink_connector_examples_spark.operators.dedup import (
        hash_dup_pairs,
    )

    rng = random.Random(5)
    hashes = []
    for i in range(40):
        h = rng.getrandbits(64)
        hashes.append((i, h - (1 << 64) if h >= 1 << 63 else h))
    # inject near-dups: flip <=6 bits of earlier hashes
    for i in range(40, 60):
        src = hashes[i - 40][1] & ((1 << 64) - 1)
        for _ in range(rng.randint(0, 6)):
            src ^= 1 << rng.randrange(64)
        hashes.append((i, src - (1 << 64) if src >= 1 << 63 else src))
    df = spark.createDataFrame(hashes, "media_id long, phash long")
    got = sorted(
        (r.d1, r.d2, r.hamming)
        for r in hash_dup_pairs(df, "media_id", max_hamming=6).collect()
    )
    want = []
    for i in range(60):
        for j in range(i + 1, 60):
            d = bin((hashes[i][1] ^ hashes[j][1]) & ((1 << 64) - 1)).count("1")
            if d <= 6:
                want.append((i, j, d))
    assert got == sorted(want)


def test_hash_dup_pairs_plan_banded_no_cartesian(spark):
    """The candidate join is a banded equi-join — no CartesianProduct /
    BroadcastNestedLoopJoin anywhere in the plan."""
    from fiware_cosmos_orion_flink_connector_examples_spark.operators.dedup import (
        hash_dup_pairs,
    )

    df = spark.createDataFrame(
        [(i, i * 1_000_003) for i in range(20)], "media_id long, phash long"
    )
    # materialize=False: inspect the live join plan (the default eagerly
    # path would show only the checkpoint scan, r8)
    lazy = hash_dup_pairs(df, "media_id", materialize=False)
    plan = lazy._jdf.queryExecution().executedPlan().toString()
    spark.catalog.clearCache()  # caller-owned bands cache in lazy mode
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


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
