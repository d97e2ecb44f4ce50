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


def _py_kn_trigram(texts, d=0.75):
    """Pure-python interpolated-KN trigram reference (Chen & Goodman
    single-discount, middle order on continuation counts)."""
    import math
    from collections import Counter

    toks = [t.split() for t in texts]
    uni = Counter(w for t in toks for w in t)
    n = sum(uni.values())
    bi = Counter((t[i - 1], t[i]) for t in toks for i in range(1, len(t)))
    tri = Counter(
        (t[i - 2], t[i - 1], t[i]) for t in toks for i in range(2, len(t))
    )
    nf = Counter(w1 for (w1, _w2) in bi)
    np_ = Counter(w2 for (_w1, w2) in bi)
    bt = len(bi)
    nf3 = Counter((w1, w2) for (w1, w2, _w3) in tri)
    ctx = Counter((w2, w3) for (_w1, w2, w3) in tri)
    mid = Counter(w2 for (_w1, w2, _w3) in tri)
    lam = Counter(w2 for (w2, _w3) in ctx)
    out = {}
    for i, t in enumerate(toks):
        if not t:
            continue
        q = round(math.log(uni[t[0]] / n) * 1e12)
        if len(t) >= 2:
            w1, w2 = t[0], t[1]
            q += round(
                math.log(
                    max(bi[(w1, w2)] - d, 0.0) / uni[w1]
                    + d * (nf[w1] / uni[w1]) * (np_[w2] / bt)
                )
                * 1e12
            )
        for j in range(2, len(t)):
            w1, w2, w3 = t[j - 2], t[j - 1], t[j]
            pmid = max(ctx[(w2, w3)] - d, 0.0) / mid[w2] + d * (
                lam[w2] / mid[w2]
            ) * (np_[w3] / bt)
            q += round(
                math.log(
                    max(tri[(w1, w2, w3)] - d, 0.0) / bi[(w1, w2)]
                    + d * (nf3[(w1, w2)] / bi[(w1, w2)]) * pmid
                )
                * 1e12
            )
        out[i] = (len(t), round(q / len(t) / 1e12, 6))
    return out


def test_kn_trigram_matches_python_reference(spark):
    """Full-formula equality vs an independent pure-python KN trigram
    on a mixed corpus (0/1/2/many-token docs, repeated collocations,
    singletons)."""
    texts = [
        "the cat sat on the mat",
        "the cat ran on the mat",
        "a dog sat on a log",
        "solo",
        "two tokens",
        "",
        "the the the the",
        "cat sat cat sat cat",
    ]
    docs = _doc_frame(spark, texts)
    got = {
        r["doc_id"]: (r["n_tokens"], r["avg_logprob"])
        for r in text.kn_trigram_logprob(docs).collect()
    }
    assert got == _py_kn_trigram(texts)


def test_kn_trigram_nests_bigram_rung(spark):
    """Order nesting, pinned: a corpus of <=2-token docs generates no
    trigrams, and the trigram model's token-1/token-2 formulas ARE the
    bigram model's — identical rows."""
    texts = ["alpha beta", "alpha gamma", "beta alpha", "solo", "alpha beta"]
    docs = _doc_frame(spark, texts)
    tri = {
        r["doc_id"]: (r["n_tokens"], r["avg_logprob"])
        for r in text.kn_trigram_logprob(docs).collect()
    }
    bi = {
        r["doc_id"]: (r["n_tokens"], r["avg_logprob"])
        for r in text.kn_bigram_logprob(docs).collect()
    }
    assert tri == bi


def test_kn_trigram_rewards_seen_collocation_chain(spark):
    """A doc whose trigrams were all observed repeatedly scores higher
    than a same-length shuffle whose trigrams are singletons — the
    LM-filter discrimination the perplexity ladder exists for."""
    common = "the quick brown fox jumps over the lazy dog"
    texts = [common] * 5 + ["dog the over quick lazy jumps fox brown the"]
    docs = _doc_frame(spark, texts)
    got = {
        r["doc_id"]: r["avg_logprob"]
        for r in text.kn_trigram_logprob(docs).collect()
    }
    assert got[0] > got[5]


def test_ccnet_buckets_are_ordered_tertiles(spark):
    """corpus_curate_ccnet invariants on the fixture corpus: (a) only
    the lowest-id doc of each duplicated text survives, (b) within
    every language the bucket score ranges are ordered tail <= middle
    <= head, (c) kept_ccnet is exactly bucket != tail, (d) the head
    bucket holds at most half the lang's docs (tertiles, modulo
    boundary ties)."""
    from fiware_cosmos_orion_flink_connector_examples_spark.plans.registry import (
        QUERIES,
    )

    rows = QUERIES["corpus_curate_ccnet"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    expect_keep = {
        r["k"]
        for r in docs.groupBy("text").agg(F.min("doc_id").alias("k")).collect()
    }
    assert {r.doc_id for r in rows} == expect_keep

    by_lang: dict = {}
    for r in rows:
        assert r.kept_ccnet == (r.ppl_bucket != "tail")
        by_lang.setdefault(r.lang, {}).setdefault(r.ppl_bucket, []).append(
            r.avg_logprob
        )
    for lang, bk in by_lang.items():
        n = sum(len(v) for v in bk.values())
        if "tail" in bk and "middle" in bk:
            assert max(bk["tail"]) <= min(bk["middle"]), lang
        if "middle" in bk and "head" in bk:
            assert max(bk["middle"]) <= min(bk["head"]), lang
        if n >= 6 and "head" in bk:
            assert len(bk["head"]) <= n / 2, (lang, n, len(bk["head"]))


def test_dsir_target_domain_ranks_highest(spark):
    """sample_dsir invariant on the fixture corpus: the target-domain
    (English) docs carry the highest mean importance log-weight — the
    DSIR selection criterion working as published — and the top of
    the ranking is target-dominated."""
    from fiware_cosmos_orion_flink_connector_examples_spark.plans.registry import (
        QUERIES,
    )

    rows = QUERIES["sample_dsir"].fn(spark, "/root/testdata/sf0.001").collect()
    assert rows
    by_lang: dict = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r.dsir_logw)
    means = {k: sum(v) / len(v) for k, v in by_lang.items()}
    assert all(means["en"] > m for k, m in means.items() if k != "en"), means
    top20 = sorted(rows, key=lambda r: (-r.dsir_logw, r.doc_id))[:20]
    assert sum(1 for r in top20 if r.lang == "en") >= 15


def _write_docs(spark, tmp_path, texts, name="docs_fixture"):
    import os

    d = str(tmp_path / name)
    spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    return d


def test_gopher_repetition_flags_repeated_content(spark, tmp_path):
    """Directional pins for the repetition card: a two-token loop doc
    fails the top-2-gram and dup-5-gram screens, a repeated line
    yields the exact (nl-dl)/nl duplicate-line fraction, and a
    60-distinct-word doc passes everything."""
    from fiware_cosmos_orion_flink_connector_examples_spark.plans.registry import (
        QUERIES,
    )

    loop = "ab cd " * 30  # "ab cd" x30 / "cd ab" x29
    lines = "\n".join(["same line here", "same line here", "same line here",
                       "another line", "third line"])
    diverse = " ".join(f"w{i}" for i in range(60))
    sf = _write_docs(spark, tmp_path, [loop, lines, diverse])
    rows = {
        r.doc_id: r
        for r in QUERIES["text_gopher_repetition"].fn(spark, sf).collect()
    }
    assert not rows[0].pass_top2gram and not rows[0].pass_dup5gram
    assert rows[1].dup_line_frac == 0.4  # (5-3)/5
    assert not rows[1].pass_dup_lines
    r2 = rows[2]
    assert r2.repetition_pass and r2.dup5gram_char_frac == 0.0


def test_c4_line_filter_counts(spark, tmp_path):
    """The C4 card's line verdicts, pinned per line: terminal-punct
    5-word lines survive, short / unterminated / javascript lines
    die, and 'lorem ipsum' or '{' kill the page."""
    from fiware_cosmos_orion_flink_connector_examples_spark.plans.registry import (
        QUERIES,
    )

    good = "\n".join(
        [
            "this sentence has five good words.",   # kept (1 sentence)
            "short line.",                          # < 5 words -> dies
            "the javascript menu needs enabling please.",  # dies
            "no terminal punctuation on this line",        # dies
            "another proper sentence arrives here today!", # kept
            "and one more full sentence lands here?",      # kept
        ]
    )
    lorem = "a fine page. but lorem ipsum appears. so it dies here. ok."
    sf = _write_docs(spark, tmp_path, [good, lorem])
    rows = {
        r.doc_id: r for r in QUERIES["text_c4_rules"].fn(spark, sf).collect()
    }
    g = rows[0]
    assert g.n_lines == 6 and g.n_lines_kept == 3
    assert g.n_sentences == 3 and g.c4_keep
    l = rows[1]
    assert l.has_lorem_ipsum and not l.c4_keep


def test_line_dedup_first_occurrence_wins_and_idempotent(spark):
    """Corpus-wide line dedup keeps exactly the first (doc_id, pos)
    occurrence — intra-doc repeats included — and is idempotent: a
    second pass over the cleaned output changes nothing."""
    from fiware_cosmos_orion_flink_connector_examples_spark.operators import dedup

    docs = spark.createDataFrame(
        [
            (0, "banner line\nunique alpha\nbanner line"),
            (1, "banner line\nunique beta"),
            (2, "unique gamma\nbanner line"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in dedup.remove_duplicate_lines(docs, "doc_id").collect()
    }
    assert out[0].text_clean == "banner line\nunique alpha"  # intra-doc repeat cut
    assert out[1].text_clean == "unique beta"
    assert out[2].text_clean == "unique gamma"
    assert (out[0].n_removed, out[1].n_removed, out[2].n_removed) == (1, 1, 1)

    cleaned = spark.createDataFrame(
        [(k, v.text_clean) for k, v in out.items()],
        "doc_id long, text string",
    )
    again = {
        r.doc_id: r
        for r in dedup.remove_duplicate_lines(cleaned, "doc_id").collect()
    }
    assert all(r.n_removed == 0 for r in again.values())
    assert {k: r.text_clean for k, r in again.items()} == {
        k: r.text_clean for k, r in out.items()
    }


def test_hard_negatives_matches_numpy_reference(spark):
    """similarity.hard_negatives == a numpy brute force over the same
    vectors: per anchor, top-k cross-label by (rounded cosine desc,
    id asc), never a same-label row."""
    import numpy as np

    from fiware_cosmos_orion_flink_connector_examples_spark.operators import (
        similarity,
    )

    rng = np.random.RandomState(9)
    n, d, k = 40, 8, 3
    M = rng.randn(n, d).astype("float64")
    labels = [i % 4 for i in range(n)]
    emb = spark.createDataFrame(
        [(i, [float(x) for x in M[i]], labels[i]) for i in range(n)],
        "vec_id long, embedding array<double>, label int",
    )
    qs = emb.filter(F.col("vec_id") < 5)
    got = [
        (r.q_id, r.rank, r.n_id, r.n_label, r.cos)
        for r in similarity.hard_negatives(emb, qs, k=k)
        .orderBy("q_id", "rank")
        .collect()
    ]
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    expected = []
    for q in range(5):
        cand = [
            (round(float(Mn[q] @ Mn[j]), 6), j)
            for j in range(n)
            if labels[j] != labels[q]
        ]
        cand.sort(key=lambda t: (-t[0], t[1]))
        for rank, (cos, j) in enumerate(cand[:k], 1):
            expected.append((q, rank, j, labels[j], cos))
    assert len(got) == len(expected)
    for g, e in zip(got, expected):
        assert g[:4] == e[:4] and abs(g[4] - e[4]) < 1e-9, (g, e)
    assert all(labels[g[2]] != labels[g[0]] for g in got)


def test_incremental_line_dedup_composes_to_full_pass(spark):
    """When every old id sorts below every new id, the incremental
    path (index anti-join + within-batch firsts) must equal the full
    remove_duplicate_lines over old ∪ new, restricted to the new
    docs — the re-ingest correctness contract."""
    from fiware_cosmos_orion_flink_connector_examples_spark.operators import dedup

    old = spark.createDataFrame(
        [(0, "banner line\nold alpha"), (1, "old beta\nbanner line")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (10, "banner line\nnew gamma\nshared new line"),
            (11, "shared new line\nnew delta"),
        ],
        "doc_id long, text string",
    )
    inc = {
        r.doc_id: (r.n_lines, r.n_removed, r.text_clean)
        for r in dedup.remove_duplicate_lines_incremental(
            new, old, "doc_id"
        ).collect()
    }
    full = {
        r.doc_id: (r.n_lines, r.n_removed, r.text_clean)
        for r in dedup.remove_duplicate_lines(
            old.union(new), "doc_id"
        ).collect()
        if r.doc_id >= 10
    }
    assert inc == full
    # and the specifics: banner dies (history), shared line survives
    # only in doc 10 (within-batch first)
    assert inc[10][2] == "new gamma\nshared new line"
    assert inc[11][2] == "new delta"


def test_kn_derived_model_tables_on_randomized_corpus(spark):
    """Round-17 optimization pin: the KN model tables are now DERIVED
    (uni from the bigram table + doc-tail counts, and for the trigram
    model the bigram table from trigram prefixes + last-pair counts)
    instead of re-scanned.  A randomized corpus with hostile tail
    shapes — unique last tokens/pairs, docs of every length 0..5,
    heavy repetition — must still match the independent pure-python
    reference exactly."""
    import random

    rng = random.Random(1709)
    vocab = ["a", "bb", "ccc", "dd", "e", "tailonly", "pairx", "pairy"]
    texts = []
    for _ in range(40):
        n = rng.randint(0, 5)
        texts.append(" ".join(rng.choice(vocab) for _ in range(n)))
    # force the tail edge cases the derivations depend on
    texts += ["solo2", "pairx pairy", "a bb tailonly", ""]
    docs = _doc_frame(spark, texts)
    got = {
        r["doc_id"]: (r["n_tokens"], r["avg_logprob"])
        for r in text.kn_trigram_logprob(docs).collect()
    }
    assert got == _py_kn_trigram(texts)
