"""Scale smoke: drive representative operators on SYNTHETIC data ~100×
the sf0.1 row counts (generated via spark.range — no disk, no testdata
dependency) to show the plan shapes hold well past the bench SF.
Run: python tools/scale_smoke.py [rows_millions]
Records wall-clock; numbers land in SCALING.md."""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F

from fiware_cosmos_orion_flink_connector_examples_spark.session import get_spark


def main() -> None:
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 25
    n = m * 1_000_000
    spark = get_spark(app_name="scale-smoke")

    # synthetic events: n rows, 100k users, 2-day span, skewed type
    ev = spark.range(n).select(
        F.col("id").alias("event_id"),
        F.pmod(F.xxhash64("id"), F.lit(100_000)).alias("user_id"),
        F.timestamp_micros(
            (F.lit(1_700_000_000_000_000) + F.pmod(F.xxhash64("id", F.lit(1)), F.lit(172_800_000_000)))
        ).alias("ts"),
        (F.pmod(F.xxhash64("id", F.lit(2)), F.lit(1000)) / 10.0).alias("value"),
    )

    def run(tag, fn):
        t = time.time()
        out = fn()
        el = time.time() - t
        print(f"{tag:30s} rows={out} {el:.1f}s", flush=True)
        return el

    run(f"sliding-window min ({m}M)", lambda: ev.groupBy(
        F.window("ts", "5 seconds", "2 seconds"), "user_id"
    ).agg(F.min("value")).count())

    run(f"exact dedup ({m}M)", lambda: ev.groupBy("user_id", "value").agg(
        F.min("event_id").alias("keep")
    ).count())

    run(f"hourly rollup + moments ({m}M)", lambda: ev.groupBy(
        F.date_trunc("hour", "ts"), (F.pmod(F.col("event_id"), F.lit(5)))
    ).agg(
        F.count(F.lit(1)),
        F.sum(F.round(F.col("value") * 1_000_000).cast("long").cast("decimal(38,0)")),
    ).count())

    run(f"top-3 per user window ({m}M)", lambda: ev.select(
        "user_id", "event_id", "value",
        F.row_number().over(
            __import__("pyspark").sql.window.Window.partitionBy("user_id")
            .orderBy(F.desc("value"), F.asc("event_id"))
        ).alias("rn"),
    ).filter(F.col("rn") <= 3).count())

    skewed_dedup_smoke(spark)
    span_dedup_smoke(spark)
    round6_smoke(spark, m)
    round8b_smoke(spark)
    round9_smoke(spark)
    round10_smoke(spark)


def skewed_dedup_smoke(spark, n_docs: int = 20_000, hot_frac: int = 10) -> None:
    """VERDICT r2 #4: exercise the n-gram df-cap where it matters.

    The bench corpus's max shingle-df is 7, so the cap never bites
    there.  Here 1/``hot_frac`` of ``n_docs`` synthetic docs share one
    boilerplate sentence, giving 3 shingles df = n_docs/hot_frac each —
    the posting self-join's cost is Σ df(s)², so those three alone
    contribute 3·(n_docs/hot_frac)² candidate rows (1.2e7 at the
    defaults) against ~1 per clean shingle.  The capped run drops them
    from the candidate index (cost ≤ cap² per shingle) and must return
    the IDENTICAL pair set: a pair whose entire overlap is boilerplate
    sits at jaccard ≈ 3/29 ≪ 0.8, so the cap costs zero recall at the
    dedup threshold — which the equality check proves, not assumes."""
    from fiware_cosmos_orion_flink_connector_examples_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    hot_df = n_docs // hot_frac
    # 12 doc-unique tokens (hash-derived), plus the boilerplate sentence
    # on every hot_frac-th doc
    uniq = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(11)),
            lambda i: F.concat(F.lit("t"), F.xxhash64(F.col("id"), i)),
        ),
        " ",
    )
    boiler = F.lit("click here to accept all cookies")
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % hot_frac == 0, F.concat(uniq, F.lit(" "), boiler))
        .otherwise(uniq)
        .alias("text"),
    )

    def run(tag, fn):
        t = time.time()
        out = fn()
        print(f"{tag:30s} rows={out} {time.time() - t:.1f}s", flush=True)

    print(f"skewed dedup: {n_docs} docs, 3 boilerplate shingles at df={hot_df}")
    run("jaccard UNCAPPED (df² blowup)", lambda: ngram_jaccard_pairs(
        docs, "doc_id", threshold=0.8
    ).count())
    run("jaccard capped df<=64", lambda: ngram_jaccard_pairs(
        docs, "doc_id", threshold=0.8, max_shingle_df=64
    ).count())
    uncapped = set(map(tuple, ngram_jaccard_pairs(docs, "doc_id", threshold=0.8).collect()))
    capped = set(map(tuple, ngram_jaccard_pairs(
        docs, "doc_id", threshold=0.8, max_shingle_df=64
    ).collect()))
    print(f"pair sets equal: {uncapped == capped} ({len(capped)} pairs)")


def span_dedup_smoke(spark, n_docs: int = 2_000_000, hot_frac: int = 10) -> None:
    """Round-5 span dedup at 100× the bench corpus: 2M synthetic docs
    (~13 tokens each → ~12M positional 4-gram occurrences), with the
    boilerplate sentence on every ``hot_frac``-th doc so the hot grams'
    posting lists hold n_docs/hot_frac entries — the window-min
    partition the operator docstring flags as its skew exposure.  The
    smoke proves the narrow (gram, id, cnt) rows keep even a 200k-row
    posting partition cheap; corpora with broader boilerplate use the
    df-cap pre-filter first."""
    from fiware_cosmos_orion_flink_connector_examples_spark.operators.dedup import (
        repeated_span_report,
    )

    uniq = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(8)),
            lambda i: F.concat(F.lit("t"), F.xxhash64(F.col("id"), i)),
        ),
        " ",
    )
    boiler = F.lit("click here to accept all cookies")
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % hot_frac == 0, F.concat(uniq, F.lit(" "), boiler))
        .otherwise(uniq)
        .alias("text"),
    )
    t = time.time()
    out = repeated_span_report(docs, "doc_id", "text", n=4).count()
    print(
        f"span dedup ({n_docs // 1_000_000}M docs, hot df={n_docs // hot_frac})"
        f" rows={out} {time.time() - t:.1f}s",
        flush=True,
    )


def round6_smoke(spark, m: int = 25, n_docs: int = 2_000_000) -> None:
    """VERDICT r5 #6: run the round-5/6 REGISTERED queries (not inline
    replicas — the real `QUERIES[...]` callables) on synthetic parquet
    at ~100× the bench SF, to back their one-exchange / broadcast-stats
    / two-pass claims with measured wall-clocks.

    Synthetic `events` (m·10⁶ rows, 100k users, funnel-compatible
    type mix) and `documents` (2M docs, 16 sources incl. one 10×-hot
    source — the single-task-sort killer the two-pass budget path
    exists for) are written to a temp dir with the testdata schemas, so
    the queries run their actual parquet-scan plans."""
    import shutil
    import tempfile

    from fiware_cosmos_orion_flink_connector_examples_spark.plans.registry import (
        QUERIES,
    )

    n = m * 1_000_000
    tmp = tempfile.mkdtemp(prefix="scale_smoke_r6_")
    try:
        types = F.array(
            *[F.lit(t) for t in ("view", "view", "click", "signup", "purchase", "scroll")]
        )
        ev = spark.range(n).select(
            F.col("id").alias("event_id"),
            F.timestamp_micros(
                F.lit(1_700_000_000_000_000)
                + F.pmod(F.xxhash64("id", F.lit(1)), F.lit(172_800_000_000))
            ).alias("ts"),
            F.pmod(F.xxhash64("id"), F.lit(100_000)).alias("user_id"),
            F.element_at(
                types, (F.pmod(F.xxhash64("id", F.lit(2)), F.lit(6)) + 1).cast("int")
            ).alias("event_type"),
            (F.pmod(F.xxhash64("id", F.lit(3)), F.lit(1000)) / 10.0).alias("value"),
            F.lit('{"k":"v"}').alias("props"),
        )
        ev.write.mode("overwrite").parquet(f"{tmp}/events.parquet")
        # 16 sources, source 0 holding ~10/25 of all docs (hot source);
        # ~10 hash-derived tokens per doc
        words = F.array_join(
            F.transform(
                F.sequence(F.lit(0), F.pmod(F.xxhash64("id", F.lit(9)), F.lit(9)) + 1),
                lambda i: F.concat(F.lit("w"), F.pmod(F.xxhash64(F.col("id"), i), F.lit(50_000))),
            ),
            " ",
        )
        src = F.when(
            F.pmod(F.xxhash64("id", F.lit(4)), F.lit(25)) < 10, F.lit(0)
        ).otherwise(F.pmod(F.xxhash64("id", F.lit(4)), F.lit(16)))
        # every 10th doc carries a shared 8-token boilerplate sentence,
        # so span_dedup_removed's dup stages run against a 200k-entry
        # hot posting list (same skew shape as span_dedup_smoke)
        boiler = F.lit("b1 b2 b3 b4 b5 b6 b7 b8")
        text = F.when(
            F.col("id") % 10 == 0, F.concat(words, F.lit(" "), boiler)
        ).otherwise(words)
        docs = spark.range(n_docs).select(
            F.col("id").alias("doc_id"),
            text.alias("text"),
            F.lit("en").alias("lang"),
            F.concat(F.lit("src"), src).alias("source"),
            F.length(text).alias("n_chars"),
        )
        docs.write.mode("overwrite").parquet(f"{tmp}/documents.parquet")

        def run(tag, name):
            # noop-sink materialization (bench.py's method), NOT count():
            # count() over span_dedup_removed's final unique-keyed left
            # join lets Catalyst prune the whole removal pipeline — the
            # first run of this smoke reported a fictitious 0.5 s for
            # 2M docs that way.
            t = time.time()
            QUERIES[name].fn(spark, tmp).write.format("noop").mode(
                "overwrite"
            ).save()
            print(f"{tag:34s} {time.time() - t:.1f}s", flush=True)

        print(f"round-6 registered-query smoke: events={m}M docs={n_docs // 1_000_000}M")
        run(f"events_funnel_conversion ({m}M)", "events_funnel_conversion")
        run(f"outliers_mad_by_type ({m}M)", "outliers_mad_by_type")
        run(f"events_type_islands ({m}M)", "events_type_islands")
        run("sample_token_budget (2M, hot src)", "sample_token_budget")
        run("span_dedup_removed (2M docs)", "span_dedup_removed")
        run("decontaminate_spans (2M docs)", "decontaminate_spans_8gram")
        run("corpus_prep_pipeline (2M docs)", "corpus_prep_pipeline")
        run("span_dedup_intra_doc (2M docs)", "span_dedup_intra_doc")
        run(f"events_resample_locf ({m}M)", "events_resample_locf")
        run(f"events_transition_matrix ({m}M)", "events_transition_matrix")
        run(f"events_user_trend ({m}M)", "events_user_trend")
        run("bpe_pair_stats (2M docs)", "bpe_pair_stats")
        run("ngram_diversity_by_source (2M docs)", "ngram_diversity_by_source")
        run("quality_decile_counts (2M docs)", "quality_decile_counts")
        run(f"events_dau_wau ({m}M)", "events_dau_wau")
        run(f"events_cep_signup_purchase ({m}M)", "events_cep_signup_purchase")
        run(f"events_user_360 ({m}M)", "events_user_360")
        # dup_matrix_by_source is NOT smoked here: it reuses the UNCAPPED
        # ngram_jaccard_pairs posting join, and this fixture's 200k-doc
        # boilerplate gives 6 shingles df=200k — Σdf² ≈ 1.2e11 candidate
        # pairs by construction.  On skewed corpora the capped pair
        # source (skewed_dedup_smoke above) is the demonstrated shape;
        # the matrix agg itself is |pairs|-sized either way.
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def round8b_smoke(spark, n_docs: int = 2_000_000) -> None:
    """Round-8 depth additions at ~100× the bench corpus: the
    model-based quality filter (two corpus passes + one doc-keyed
    shuffle) and temperature mixture sampling (one source-keyed window
    shuffle) on 2M synthetic docs.

    The fixture makes BOTH label extremes real so the classifier's
    training slice is non-degenerate: even doc_ids are long (40+
    tokens) and stopword-rich (all-rules-pass → +1), odd doc_ids are
    short hash-word salad (≥2 fails → -1).  16 sources with one
    ~10/25-hot source exercise the quota window's skew bound."""
    import shutil
    import tempfile

    from fiware_cosmos_orion_flink_connector_examples_spark.plans.registry import (
        QUERIES,
    )

    tmp = tempfile.mkdtemp(prefix="scale_smoke_r8b_")
    try:
        # even ids: 20 "the wN of" trigrams (60 tokens, stop ratio 2/3
        # ≥ 0.02, avg word len in [3,9], distinct ratio > 0.3 via
        # hash-varied wN) — all four rules pass.  odd ids: ~6 hash
        # words — fails len + stop.
        rich = F.array_join(
            F.transform(
                F.sequence(F.lit(0), F.lit(19)),
                lambda i: F.concat(
                    F.lit("the w"),
                    F.pmod(F.xxhash64(F.col("id"), i), F.lit(50_000)),
                    F.lit(" of"),
                ),
            ),
            " ",
        )
        salad = F.array_join(
            F.transform(
                F.sequence(F.lit(0), F.pmod(F.xxhash64("id", F.lit(9)), F.lit(5)) + 1),
                lambda i: F.concat(
                    F.lit("w"), F.pmod(F.xxhash64(F.col("id"), i), F.lit(50_000))
                ),
            ),
            " ",
        )
        text = F.when(F.col("id") % 2 == 0, rich).otherwise(salad)
        src = F.when(
            F.pmod(F.xxhash64("id", F.lit(4)), F.lit(25)) < 10, F.lit(0)
        ).otherwise(F.pmod(F.xxhash64("id", F.lit(4)), F.lit(16)))
        docs = spark.range(n_docs).select(
            F.col("id").alias("doc_id"),
            text.alias("text"),
            F.lit("en").alias("lang"),
            F.concat(F.lit("src"), src).alias("source"),
            F.length(text).alias("n_chars"),
        )
        docs.write.mode("overwrite").parquet(f"{tmp}/documents.parquet")

        def run(tag, name):
            t = time.time()
            QUERIES[name].fn(spark, tmp).write.format("noop").mode(
                "overwrite"
            ).save()
            print(f"{tag:34s} {time.time() - t:.1f}s", flush=True)
            spark.catalog.clearCache()

        print(f"round-8b registered-query smoke: docs={n_docs // 1_000_000}M")
        run("quality_nb_classifier (2M docs)", "quality_nb_classifier")
        run("sample_temperature_mixture (2M)", "sample_temperature_mixture")
        run("corpus_curate_nb (2M docs)", "corpus_curate_nb")
        run("text_bigram_logprob (2M docs)", "text_bigram_logprob")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def round9_smoke(spark, n_docs: int = 2_000_000) -> None:
    """Round-9 depth additions at ~100x the bench corpus: the KN LM
    ladder (bigram + trigram), the hashed-bigram NB classifier, the
    CCNet tertile capstone, and DSIR selection on 2M synthetic docs.

    Same rich/salad fixture as round8b (both label extremes real) but
    with a 2:1 en/de language split so the per-lang percentile
    bucketing and the DSIR target/raw split both exercise their
    grouping for real."""
    import shutil
    import tempfile

    from fiware_cosmos_orion_flink_connector_examples_spark.plans.registry import (
        QUERIES,
    )

    tmp = tempfile.mkdtemp(prefix="scale_smoke_r9_")
    try:
        rich = F.array_join(
            F.transform(
                F.sequence(F.lit(0), F.lit(19)),
                lambda i: F.concat(
                    F.lit("the w"),
                    F.pmod(F.xxhash64(F.col("id"), i), F.lit(50_000)),
                    F.lit(" of"),
                ),
            ),
            " ",
        )
        salad = F.array_join(
            F.transform(
                F.sequence(F.lit(0), F.pmod(F.xxhash64("id", F.lit(9)), F.lit(5)) + 1),
                lambda i: F.concat(
                    F.lit("w"), F.pmod(F.xxhash64(F.col("id"), i), F.lit(50_000))
                ),
            ),
            " ",
        )
        body = F.when(F.col("id") % 2 == 0, rich).otherwise(salad)
        # even docs carry an IDENTICAL boilerplate first line — 1M
        # copies of one line is exactly line_dedup_removed's skew
        # case (the map-side-collapse claim under test) and gives the
        # repetition card a multi-line doc to chew on
        text = F.when(
            F.col("id") % 2 == 0,
            F.concat(
                F.lit("accept all cookies to continue reading\n"), body
            ),
        ).otherwise(body)
        src = F.when(
            F.pmod(F.xxhash64("id", F.lit(4)), F.lit(25)) < 10, F.lit(0)
        ).otherwise(F.pmod(F.xxhash64("id", F.lit(4)), F.lit(16)))
        lang = F.when(F.col("id") % 3 < 2, F.lit("en")).otherwise(F.lit("de"))
        docs = spark.range(n_docs).select(
            F.col("id").alias("doc_id"),
            text.alias("text"),
            lang.alias("lang"),
            F.concat(F.lit("src"), src).alias("source"),
            F.length(text).alias("n_chars"),
        )
        docs.write.mode("overwrite").parquet(f"{tmp}/documents.parquet")

        def run(tag, name):
            t = time.time()
            QUERIES[name].fn(spark, tmp).write.format("noop").mode(
                "overwrite"
            ).save()
            print(f"{tag:34s} {time.time() - t:.1f}s", flush=True)
            spark.catalog.clearCache()

        print(f"round-9 registered-query smoke: docs={n_docs // 1_000_000}M")
        run("text_bigram_logprob_kn (2M)", "text_bigram_logprob_kn")
        run("text_trigram_logprob_kn (2M)", "text_trigram_logprob_kn")
        run("quality_nb_classifier_bigram (2M)", "quality_nb_classifier_bigram")
        run("corpus_curate_ccnet (2M)", "corpus_curate_ccnet")
        run("sample_dsir (2M)", "sample_dsir")
        run("text_gopher_rules (2M)", "text_gopher_rules")
        run("text_gopher_repetition (2M)", "text_gopher_repetition")
        run("text_c4_rules (2M)", "text_c4_rules")
        run("line_dedup_removed (2M, 1M-hot line)", "line_dedup_removed")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def round10_smoke(spark, n_docs: int = 2_000_000) -> None:
    """Round-10 additions at ~100x the bench corpus: the release
    capstone and curriculum sharding on 2M synthetic docs (the round-9
    rich/salad fixture), fuzzy MinHash decontamination with a
    REALISTIC benchmark size (20k eval docs — published benchmarks are
    10^3-10^5 docs; the registered %10 split is fixture-fit, the
    operator is what scales), and SemDeDup over 1M synthetic vectors
    in ~64-vector blocks (the cell-size discipline the IVF dedup smoke
    established — block count grows with the corpus)."""
    import shutil
    import tempfile

    from fiware_cosmos_orion_flink_connector_examples_spark.operators import dedup
    from fiware_cosmos_orion_flink_connector_examples_spark.plans.registry import (
        QUERIES,
    )

    tmp = tempfile.mkdtemp(prefix="scale_smoke_r10_")
    try:
        rich = F.array_join(
            F.transform(
                F.sequence(F.lit(0), F.lit(59)),
                lambda i: F.concat(
                    F.lit("the w"),
                    F.pmod(F.xxhash64(F.col("id"), i), F.lit(50_000)),
                    F.lit(" of"),
                ),
            ),
            " ",
        )
        salad = F.array_join(
            F.transform(
                F.sequence(F.lit(0), F.pmod(F.xxhash64("id", F.lit(9)), F.lit(5)) + 1),
                lambda i: F.concat(
                    F.lit("w"), F.pmod(F.xxhash64(F.col("id"), i), F.lit(50_000))
                ),
            ),
            " ",
        )
        text = F.when(F.col("id") % 2 == 0, rich).otherwise(salad)
        src_col = F.pmod(F.xxhash64("id", F.lit(4)), F.lit(16))
        lang = F.when(F.col("id") % 3 < 2, F.lit("en")).otherwise(F.lit("de"))
        docs = spark.range(n_docs).select(
            F.col("id").alias("doc_id"),
            text.alias("text"),
            lang.alias("lang"),
            F.concat(F.lit("src"), src_col).alias("source"),
            F.length(text).alias("n_chars"),
        )
        docs.write.mode("overwrite").parquet(f"{tmp}/documents.parquet")

        def run(tag, fn):
            t = time.time()
            fn()
            print(f"{tag:40s} {time.time() - t:.1f}s", flush=True)
            spark.catalog.clearCache()

        def run_query(tag, name):
            run(tag, lambda: QUERIES[name].fn(spark, tmp).write.format("noop").mode(
                "overwrite"
            ).save())

        print(f"round-10 registered-query smoke: docs={n_docs // 1_000_000}M")
        run_query("corpus_release_pipeline (2M)", "corpus_release_pipeline")
        run_query("curriculum_shard_order (2M)", "curriculum_shard_order")

        d = spark.read.parquet(f"{tmp}/documents.parquet")
        ev = d.filter(F.col("doc_id") % 100 == 0)  # 20k-doc benchmark
        tr = d.filter(F.col("doc_id") % 100 != 0)
        run(
            "minhash_contamination (2M vs 20k)",
            lambda: dedup.minhash_contamination(tr, ev, "doc_id", threshold=0.8)
            .write.format("noop")
            .mode("overwrite")
            .save(),
        )

        # SemDeDup at 1M vectors, 16 dims, ~64-vector blocks: half the
        # corpus is pairwise-duplicated (id and id+1 share a vector
        # direction), so components and keep-selection do real work
        n_vec = 1_000_000
        emb = spark.range(n_vec).select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(15)),
                lambda i: (
                    F.pmod(F.xxhash64((F.col("id") / 2).cast("long"), i), F.lit(1000))
                    / 1000.0
                    + 0.001
                ),
            ).alias("embedding"),
            F.pmod(F.xxhash64((F.col("id") / 2).cast("long"), F.lit(99)), F.lit(16_384))
            .cast("int")
            .alias("label"),
        )
        emb.write.mode("overwrite").parquet(f"{tmp}/emb.parquet")
        e = spark.read.parquet(f"{tmp}/emb.parquet")

        def semdedup():
            pairs = dedup.embedding_dup_pairs(e, threshold=0.999999)
            out = dedup.semdedup_keep(e, pairs)
            n_kept = out.filter("is_kept").count()
            print(f"  semdedup kept {n_kept} of {n_vec}", flush=True)

        run("semdedup_keep (1M vecs, 16k blocks)", semdedup)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def round11_smoke(spark, n_docs: int = 2_000_000, n_events: int = 25_000_000) -> None:
    """Round-11 additions at ~100x the bench corpus: BM25 retrieval
    with a HOT query term (df = half the corpus — the worst posting
    list a query can hit), the count-min sketch over the full token
    stream (~60M tokens -> 250M (d, bucket) rows partial-agged to
    4096 cells), its merge proof, and decayed engagement over 25M
    events / 100k users."""
    import shutil
    import tempfile

    from fiware_cosmos_orion_flink_connector_examples_spark.operators import text
    from fiware_cosmos_orion_flink_connector_examples_spark.plans.registry import (
        QUERIES,
    )

    tmp = tempfile.mkdtemp(prefix="scale_smoke_r11_")
    try:
        rich = F.array_join(
            F.transform(
                F.sequence(F.lit(0), F.lit(59)),
                lambda i: F.concat(
                    F.lit("the w"),
                    F.pmod(F.xxhash64(F.col("id"), i), F.lit(50_000)),
                    F.lit(" of"),
                ),
            ),
            " ",
        )
        salad = F.array_join(
            F.transform(
                F.sequence(F.lit(0), F.pmod(F.xxhash64("id", F.lit(9)), F.lit(5)) + 1),
                lambda i: F.concat(
                    F.lit("w"), F.pmod(F.xxhash64(F.col("id"), i), F.lit(50_000))
                ),
            ),
            " ",
        )
        txt = F.when(F.col("id") % 2 == 0, rich).otherwise(salad)
        docs = spark.range(n_docs).select(
            F.col("id").alias("doc_id"),
            txt.alias("text"),
            F.when(F.col("id") % 3 < 2, F.lit("en")).otherwise(F.lit("de")).alias("lang"),
            F.concat(F.lit("src"), F.pmod(F.xxhash64("id", F.lit(4)), F.lit(16))).alias("source"),
            F.length(txt).alias("n_chars"),
        )
        docs.write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
        ev = spark.range(n_events).select(
            F.col("id").alias("event_id"),
            F.timestamp_micros(
                F.lit(1_700_000_000_000_000)
                + F.pmod(F.xxhash64("id", F.lit(1)), F.lit(2_592_000_000_000))
            ).alias("ts"),
            F.pmod(F.xxhash64("id"), F.lit(100_000)).alias("user_id"),
            F.lit("click").alias("event_type"),
            (F.pmod(F.xxhash64("id", F.lit(2)), F.lit(1000)) / 10.0).alias("value"),
            F.lit("{}").alias("props"),
        )
        ev.write.mode("overwrite").parquet(f"{tmp}/events.parquet")

        def run(tag, fn):
            t = time.time()
            fn()
            print(f"{tag:44s} {time.time() - t:.1f}s", flush=True)
            spark.catalog.clearCache()

        def run_query(tag, name):
            run(tag, lambda: QUERIES[name].fn(spark, tmp).write.format("noop").mode(
                "overwrite"
            ).save())

        print(f"round-11 smoke: docs={n_docs // 1_000_000}M events={n_events // 1_000_000}M")
        d = spark.read.parquet(f"{tmp}/documents.parquet")
        q = spark.createDataFrame(
            [(0, "of"), (0, "w100"), (1, "w200"), (1, "the")],
            "query_id int, term string",
        )
        run(
            "bm25_scores (2M docs, df=1M hot term)",
            lambda: text.bm25_scores(d, q).write.format("noop").mode("overwrite").save(),
        )
        run_query("heavy_hitters_cms (2M docs)", "heavy_hitters_cms")
        run_query("cms_merge_equals_oneshot (2M docs)", "cms_merge_equals_oneshot")
        run_query("events_decayed_engagement (25M ev)", "events_decayed_engagement")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
