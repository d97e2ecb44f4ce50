"""Round-10 property pins: SemDeDup keep rule, fuzzy MinHash
decontamination, curriculum shard ordering, and the release capstone's
decontamination guarantee."""

from __future__ import annotations

from pyspark.sql import functions as F

from fiware_cosmos_orion_flink_connector_examples_spark.operators import dedup
from fiware_cosmos_orion_flink_connector_examples_spark.plans.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_semdedup_keeps_lowest_centroid_cosine(spark):
    """The SemDeDup keep rule on a hand-built block where the argmin is
    provable: v0=[1,0] and v1=[0.96,0.28] (both unit) form a duplicate
    pair at cos 0.96 ≥ 0.95; v2=[0,1] is a singleton.  The block
    centroid leans toward v1 (it averages in v2's y-mass), so the
    edge-of-cluster exemplar — the member SemDeDup keeps — is v0."""
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0], 0), (1, [0.96, 0.28], 0), (2, [0.0, 1.0], 0)],
        "vec_id long, embedding array<double>, label int",
    )
    pairs = dedup.embedding_dup_pairs(emb, threshold=0.95)
    got = {
        r["vec_id"]: (r["cluster_id"], r["is_kept"])
        for r in dedup.semdedup_keep(emb, pairs).collect()
    }
    assert got == {0: (0, True), 1: (0, False), 2: (2, True)}


def test_semdedup_one_keeper_per_cluster_on_fixture(spark):
    """Structural invariants on the real fixture: every cluster keeps
    EXACTLY one member, every singleton keeps itself, and survivors =
    n_vectors - (dup-group members - dup groups)."""
    out = QUERIES["dedup_semantic_semdedup"].fn(spark, SF)
    rows = out.collect()
    by_cluster: dict = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    assert len(rows) > 0
    for cid, members in by_cluster.items():
        assert sum(1 for m in members if m["is_kept"]) == 1, cid
        if len(members) == 1:
            assert members[0]["is_kept"] and members[0]["vec_id"] == cid
    n_kept = sum(1 for r in rows if r["is_kept"])
    assert n_kept == len(rows) - sum(
        len(m) - 1 for m in by_cluster.values() if len(m) > 1
    )


def test_minhash_contamination_equals_bruteforce(spark):
    """The banded train×eval pair set must equal the brute-force
    jaccard cross join at threshold 0.8 (the recall-argument pin that
    lets the oracle be exact SQL), and must contain ONLY cross-split
    orientations."""
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .filter(F.col("text").isNotNull())
    )
    ev = docs.filter(F.col("doc_id") % 10 == 0)
    tr = docs.filter(F.col("doc_id") % 10 != 0)
    got = {
        (r["train_id"], r["eval_id"], r["jaccard"])
        for r in dedup.minhash_contamination(tr, ev, "doc_id", threshold=0.8).collect()
    }
    # brute force: every straddling pair from the exact jaccard join
    brute = {
        (r["d1"] if r["d1"] % 10 != 0 else r["d2"],
         r["d2"] if r["d1"] % 10 != 0 else r["d1"],
         r["jaccard"])
        for r in dedup.ngram_jaccard_pairs(docs, "doc_id", threshold=0.8).collect()
        if (r["d1"] % 10 == 0) != (r["d2"] % 10 == 0)
    }
    assert got == brute and len(got) > 0
    for train_id, eval_id, _ in got:
        assert train_id % 10 != 0 and eval_id % 10 == 0


def test_curriculum_two_pass_equals_single_window(spark):
    """The (prefix + within-tier rank) position must equal the naive
    whole-shard ordering: per shard, positions are exactly 1..n when
    rows are sorted by (quality desc, doc_id)."""
    rows = QUERIES["curriculum_shard_order"].fn(spark, SF).collect()
    by_shard: dict = {}
    for r in rows:
        by_shard.setdefault(r["shard_id"], []).append(r)
    assert len(by_shard) == 8
    for shard, members in by_shard.items():
        members.sort(key=lambda r: (-r["quality"], r["doc_id"]))
        assert [r["position"] for r in members] == list(
            range(1, len(members) + 1)
        ), shard


def test_release_pipeline_no_eval_gram_survives(spark):
    """Rebuild the capstone's released-doc set from its public stages
    and assert the release CONTRACT exhaustively: no released doc
    shares any whole-word 8-gram with the benchmark slice, released
    texts are exact-dup-free, and the registered aggregate table
    equals a re-aggregation of the rebuilt set."""
    from fiware_cosmos_orion_flink_connector_examples_spark.functions.hashing import (
        md5int64,
    )
    from fiware_cosmos_orion_flink_connector_examples_spark.operators import text

    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .filter(F.col("text").isNotNull())
    )
    ev = docs.filter(F.col("doc_id") % 10 == 0)
    tr = docs.filter(F.col("doc_id") % 10 != 0)
    keep = dedup.exact_dedup(tr, ["text"], "doc_id").select(
        F.col("keep_id").alias("doc_id")
    )
    sur = tr.join(keep, "doc_id")
    gated = sur.withColumn(
        "n_words", text.token_count("text").cast("long")
    ).withColumn("_q", text.quality_score("text"))
    ok = gated.filter(
        (F.col("n_words") >= 50)
        & (F.col("n_words") <= 100_000)
        & (F.col("_q") >= 0.8)
    )
    cont = dedup.ngram_contamination(ev, ok, "doc_id", n=8)
    rel = ok.join(cont.select("doc_id"), "doc_id", "left_anti")

    # contract 1: zero shared 8-grams remain (re-running the checker
    # on the released set must return empty)
    assert dedup.ngram_contamination(ev, rel, "doc_id", n=8).count() == 0
    # contract 2: released texts are exact-dup-free
    texts = [r["text"] for r in rel.select("text").collect()]
    assert len(texts) == len(set(texts))
    # contract 3: the registered aggregate equals the rebuilt set
    bucket = F.pmod(md5int64(F.col("doc_id").cast("string")), F.lit(100))
    split = F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    expected = {
        (r["lang"], r["source"], r["split"]): (r["n_docs"], r["n_tokens"])
        for r in rel.select("lang", "source", split.alias("split"), "n_words")
        .groupBy("lang", "source", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").cast("long").alias("n_tokens"),
        )
        .collect()
    }
    got = {
        (r["lang"], r["source"], r["split"]): (r["n_docs"], r["n_tokens"])
        for r in QUERIES["corpus_release_pipeline"].fn(spark, SF).collect()
    }
    assert got == expected and len(got) > 0


def test_nb_calibration_scores_track_labels(spark):
    """The reliability claim: the positive-label rate must RISE from
    the bottom to the top score decile (the classifier orders by the
    very labels it distilled), the decile populations must be
    equi-depth (within interpolation ties), and counts must add up."""
    rows = QUERIES["quality_nb_calibration"].fn(spark, SF).collect()
    by_dec = {r["decile"]: r for r in rows}
    total = sum(r["n_docs"] for r in rows)
    assert total == 500
    for r in rows:
        assert r["n_pos"] + r["n_neg"] + r["n_unlabeled"] == r["n_docs"]
    lo = min(by_dec)
    hi = max(by_dec)
    assert by_dec[hi].pos_rate is not None and by_dec[lo].pos_rate is not None
    assert by_dec[hi].pos_rate > by_dec[lo].pos_rate


def test_mixture_epoch_plan_budget_and_identity(spark):
    """Target tokens must not exceed the 1M budget in total (floor
    never rounds up), every epoch must equal target/available, and a
    source with more tokens must never get a smaller target."""
    rows = QUERIES["mixture_epoch_plan"].fn(spark, SF).collect()
    assert sum(r["target_tokens"] for r in rows) <= 1_000_000
    for r in rows:
        assert abs(r["epochs"] - round(r["target_tokens"] / r["n_tokens"], 6)) < 1e-9
    by_tokens = sorted(rows, key=lambda r: r["n_tokens"])
    for a, b in zip(by_tokens, by_tokens[1:]):
        assert a["target_tokens"] <= b["target_tokens"]


def test_pca_fit_orthonormal_and_matches_numpy(spark):
    """pca_fit must return an orthonormal, sign-stabilized basis whose
    span equals numpy's top-k eigenvectors of the same covariance, and
    pca_project must equal the (X - mean) @ C.T reference."""
    import numpy as np

    from fiware_cosmos_orion_flink_connector_examples_spark.operators import (
        similarity,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    mean, comps, vals = similarity.pca_fit(emb, k=8)
    C = np.asarray(comps)
    assert np.abs(C @ C.T - np.eye(8)).max() < 1e-9
    assert all(a >= b - 1e-12 for a, b in zip(vals, vals[1:]))  # descending
    # numpy reference on the collected corpus
    X = np.asarray(
        [r["embedding"] for r in emb.filter("embedding is not null").collect()],
        dtype="float64",
    )
    mu = X.mean(axis=0)
    assert np.abs(np.asarray(mean) - mu).max() < 1e-9
    cov = np.cov(X, rowvar=False)
    w, v = np.linalg.eigh(cov)
    top = v[:, np.argsort(w)[::-1][:8]]
    # same subspace: projector equality (basis is sign/rotation-free)
    P_fit = C.T @ C
    P_ref = top @ top.T
    assert np.abs(P_fit - P_ref).max() < 1e-6
    # projection pass equals the reference
    got = {
        r["vec_id"]: np.asarray(r["proj"])
        for r in similarity.pca_project(emb, mean, comps).collect()
    }
    ids = [r["vec_id"] for r in emb.filter("embedding is not null").collect()]
    ref = (X - mu) @ C.T
    for i, vid in enumerate(ids):
        assert np.abs(got[vid] - ref[i]).max() < 1e-9


def test_pca_refit_is_deterministic(spark):
    """Two independent fits (no cache) must return bit-identical
    components — the sign convention removes eigh's ambiguity."""
    from fiware_cosmos_orion_flink_connector_examples_spark.operators import (
        similarity,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    a = similarity.pca_fit(emb, k=4)
    b = similarity.pca_fit(emb, k=4)
    assert a == b


def test_minhash_contamination_flagged_equals_two_frame(spark):
    """Round-17 optimization pin: the one-pass flagged variant must be
    row-identical to the two-frame path on the same split — same
    seeded hash family, same banding, same exact-jaccard verify."""
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .filter(F.col("text").isNotNull())
    )
    ev = docs.filter(F.col("doc_id") % 10 == 0)
    tr = docs.filter(F.col("doc_id") % 10 != 0)
    two = {
        tuple(r)
        for r in dedup.minhash_contamination(
            tr, ev, "doc_id", threshold=0.8, num_hashes=36
        ).collect()
    }
    one = {
        tuple(r)
        for r in dedup.minhash_contamination_flagged(
            docs, F.col("doc_id") % 10 == 0, "doc_id",
            threshold=0.8, num_hashes=36,
        ).collect()
    }
    assert one == two and len(one) > 0
