"""Round-9 property pins: hashed-bigram NB features (VERDICT r8 #4),
Kneser-Ney bigram LM, and the de-skewed temperature draw."""

from __future__ import annotations

from pyspark.sql import functions as F

from fiware_cosmos_orion_flink_connector_examples_spark.operators import text


def _doc_frame(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_bigram_nb_separates_collocation_anomaly(spark):
    """The fastText-fidelity claim, pinned: two docs with IDENTICAL
    token multisets tie under unigram NB (provably — same unigram sum)
    but separate under hashed-bigram features the moment their
    adjacent pairs differ, with the doc carrying the positively-
    trained collocation scoring higher."""
    # positive extremes: >=30 tokens, sane word lengths, stopwords,
    # distinct enough — and the collocation "alpha beta" 3x each
    pos = (
        "the quick alpha beta stream flows alpha beta near the old "
        "mill and alpha beta turns the wheel while clear water runs "
        "down the long valley path toward the open sea shore line"
    )
    # negative extremes: 2 tokens (fails len) of 2 chars (fails word)
    negs = ["zz qq", "ww ee", "rr tt"]
    # probes: same multiset, only "alpha beta" vs "beta alpha" order;
    # 9 tokens -> fails ONLY pass_len -> label NULL (excluded from
    # training, scored via the unlabeled-middle path)
    probe_a = "the alpha beta calm river flows gently toward shore"
    probe_b = "the beta alpha calm river flows gently toward shore"
    docs = _doc_frame(spark, [pos, pos + " today", *negs, probe_a, probe_b])
    a_id, b_id = 5, 6

    uni = {
        r["doc_id"]: (r["label"], r["nb_score"])
        for r in text.nb_quality_scores(docs).collect()
    }
    assert uni[a_id][0] is None and uni[b_id][0] is None
    assert uni[a_id][1] == uni[b_id][1]  # unigram model ties exactly

    big = {
        r["doc_id"]: (r["n_features"], r["nb_score"])
        for r in text.nb_quality_scores_hashed_bigrams(docs).collect()
    }
    # feature count = tokens + adjacent pairs
    assert big[a_id][0] == 9 + 8
    # "alpha beta" trained positive (pc=6, nc=0); "beta alpha" is OOV:
    # the anomalous collocation scores strictly lower
    assert big[a_id][1] > big[b_id][1]


def test_bigram_nb_feature_array_matches_manual_hash(spark):
    """Bucket ids are the cross-engine md5int64 % 2^20 — recompute one
    bigram's bucket in python-side md5 and assert the feature string
    matches (the oracle-reproducibility contract)."""
    import hashlib

    df = spark.createDataFrame([(1, "alpha beta")], "doc_id long, text string")
    feats = df.select(
        text.nb_feature_array("text", 1 << 20).alias("f")
    ).collect()[0]["f"]
    h = int(hashlib.md5(b"alpha beta").hexdigest()[:15], 16) % (1 << 20)
    assert feats == ["alpha", "beta", f"b#{h}"]


def test_temperature_draw_prefix_rank_equals_single_window(spark):
    """The de-skewed two-pass draw (VERDICT r8 #1) must be row-
    identical to the naive single-window formulation it replaced,
    including at a range count that forces multi-range sources."""
    from pyspark.sql.window import Window

    from fiware_cosmos_orion_flink_connector_examples_spark.functions.hashing import (
        md5int64,
    )
    from fiware_cosmos_orion_flink_connector_examples_spark.plans.extensions import (
        _temperature_draw,
    )

    rows = [(i, ["web", "books", "code"][i % 3], f"l{i % 2}") for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, source string, lang string")

    got = {
        tuple(r)
        for r in _temperature_draw(df, 30.0, ["lang"], n_ranges_log2=3).collect()
    }

    counts = df.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    den = counts.agg(
        F.aggregate(
            F.sort_array(F.collect_list(F.sqrt(F.col("n").cast("double")))),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("d")
    )
    quota = counts.crossJoin(den).select(
        "source",
        F.greatest(
            F.lit(1).cast("long"),
            F.floor(F.lit(30.0) * F.sqrt(F.col("n").cast("double")) / F.col("d")),
        ).alias("q"),
    )
    w = Window.partitionBy("source").orderBy(
        md5int64(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    want = {
        tuple(r)
        for r in df.join(quota, "source")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= F.col("q"))
        .select("source", "doc_id", "lang")
        .collect()
    }
    assert got == want and len(got) > 0


def test_kn_continuation_beats_context_bound_word(spark):
    """The Kneser-Ney point, pinned: two target words with EQUAL
    unigram frequency — one seen after many distinct contexts (glue),
    one always after the same context — must score differently in an
    UNSEEN context: the glue word's continuation count N1+(.w) is
    higher, so its backoff term wins.  Absolute interpolation
    (bigram_logprob) scores both identically there."""
    # "of" follows 4 distinct contexts; "bound" always follows "tightly"
    docs = _doc_frame(
        spark,
        [
            "north of south of east of west of",
            "tightly bound tightly bound tightly bound tightly bound",
            # probe: both targets after the SAME unseen context "probe"
            "probe of",
            "probe bound",
        ],
    )
    kn = {
        r["doc_id"]: r["avg_logprob"]
        for r in text.kn_bigram_logprob(docs).collect()
    }
    # doc 2 = "probe of", doc 3 = "probe bound": first tokens equal
    # ("probe" both), pair term differs only via N1+(.w2)
    assert kn[2] > kn[3]

    base = {
        r["doc_id"]: r["avg_logprob"]
        for r in text.bigram_logprob(docs).collect()
    }
    # interpolated-absolute ties: c("of") == c("bound") == 4 and both
    # probe bigrams are unseen... (cb missing -> pair drops from the
    # join, so equal sums either way)
    assert base[2] == base[3]
