"""Round-6 property tests: span-removal semantics (the ExactSubstr
cut path) and the two-pass range-partitioned token-budget prefix sum.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from fiware_cosmos_orion_flink_connector_examples_spark.operators import dedup


# --- span removal ------------------------------------------------------------


def _brute_remove(docs: list[tuple[int, str]], n: int = 8):
    """Reference implementation: first-occurrence-wins positional
    n-gram span removal, O(corpus²) Python."""
    toks = {i: t.split() for i, t in docs}
    first: dict[str, int] = {}
    for i in sorted(toks):
        ts = toks[i]
        for p in range(len(ts) - n + 1):
            first.setdefault(" ".join(ts[p : p + n]), i)
    out = {}
    for i, ts in toks.items():
        removed: set[int] = set()
        for p in range(len(ts) - n + 1):
            if first[" ".join(ts[p : p + n])] < i:
                removed.update(range(p, p + n))
        kept = [t for j, t in enumerate(ts) if j not in removed]
        out[i] = (len(ts), len(ts) - len(kept), " ".join(kept))
    return out


def _span_fixture(seed: int = 0):
    """Docs with per-doc-unique filler tokens plus shared spans copied
    from earlier docs — duplication is guaranteed, while coincidental
    new-adjacency gram matches are impossible (filler tokens never
    collide across docs)."""
    rng = random.Random(seed)
    shared = [f"s{j}" for j in range(40)]
    docs = []
    for i in range(30):
        words: list[str] = []
        for b in range(rng.randint(1, 4)):
            words += [f"d{i}f{b}w{j}" for j in range(rng.randint(0, 12))]
            if rng.random() < 0.8:
                start = rng.randint(0, 25)
                words += shared[start : start + rng.randint(4, 14)]
        docs.append((i, " ".join(words)))
    # one doc fully made of a shared span, one empty, one short
    docs.append((30, " ".join(shared[0:12])))
    docs.append((31, ""))
    docs.append((32, "tiny doc"))
    return docs


def test_remove_repeated_spans_matches_bruteforce(spark):
    docs = _span_fixture()
    df = spark.createDataFrame(docs, "doc_id int, text string")
    got = {
        r.doc_id: (r.n_tokens, r.n_removed, r.text_clean)
        for r in dedup.remove_repeated_spans(df, "doc_id", "text", n=8).collect()
    }
    want = _brute_remove(docs)
    assert set(got) == set(want), "every input doc must emit a row"
    for i in sorted(want):
        assert got[i] == want[i], (i, got[i], want[i])


def test_removed_docs_hold_no_lower_id_gram(spark):
    """VERDICT r5 #2's done-bar: after removal, no cleaned doc contains
    an 8-gram already present in a lower-id ORIGINAL doc (the fixture's
    per-doc-unique fillers rule out coincidental new-adjacency grams,
    so the check can run on the cleaned string directly)."""
    docs = _span_fixture(seed=7)
    df = spark.createDataFrame(docs, "doc_id int, text string")
    cleaned = {
        r.doc_id: r.text_clean
        for r in dedup.remove_repeated_spans(df, "doc_id", "text", n=8).collect()
    }
    seen: set[str] = set()
    for i, original in docs:
        ts = cleaned[i].split()
        for p in range(len(ts) - 7):
            g = " ".join(ts[p : p + 8])
            assert g not in seen, (i, g)
        ots = original.split()
        seen.update(
            " ".join(ots[p : p + 8]) for p in range(len(ots) - 7)
        )


def test_remove_keeps_first_occurrence_intact(spark):
    """The lowest-id holder of every duplicated span keeps its text
    verbatim when it contains no spans from even-lower docs."""
    docs = [
        (1, "a b c d e f g h i j"),
        (2, "x1 x2 a b c d e f g h x3"),
        (3, "y1 a b c d e f g h i j y2"),
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    got = {
        r.doc_id: (r.n_removed, r.text_clean)
        for r in dedup.remove_repeated_spans(df, "doc_id", "text", n=8).collect()
    }
    assert got[1] == (0, "a b c d e f g h i j")
    assert got[2] == (8, "x1 x2 x3")
    assert got[3] == (10, "y1 y2")


def _brute_remove_minrun(docs, n: int = 8, min_run: int = 50):
    """Reference for the length-gated variant: covered positions as in
    _brute_remove, then only maximal consecutive runs >= min_run cut."""
    toks = {i: t.split() for i, t in docs}
    first: dict[str, int] = {}
    for i in sorted(toks):
        ts = toks[i]
        for p in range(len(ts) - n + 1):
            first.setdefault(" ".join(ts[p : p + n]), i)
    out = {}
    for i, ts in toks.items():
        covered: set[int] = set()
        for p in range(len(ts) - n + 1):
            if first[" ".join(ts[p : p + n])] < i:
                covered.update(range(p, p + n))
        removed: set[int] = set()
        run: list[int] = []
        for j in sorted(covered) + [-2]:
            if run and j != run[-1] + 1:
                if len(run) >= min_run:
                    removed.update(run)
                run = []
            run.append(j)
        kept = [t for j, t in enumerate(ts) if j not in removed]
        out[i] = (len(ts), len(ts) - len(kept), " ".join(kept))
    return out


def test_remove_min_run_gate_matches_bruteforce(spark):
    """min_run cuts only maximal covered runs >= the threshold: a doc
    with one short (8-token) and one long (20-token) duplicated span
    loses only the long one at min_run=12; the brute-force reference
    pins the whole fixture."""
    shared_long = [f"L{j}" for j in range(20)]
    shared_short = [f"S{j}" for j in range(8)]
    docs = [
        (1, " ".join(shared_long + ["u1"] + shared_short)),
        (2, " ".join(["a1", "a2"] + shared_short + ["a3"] + shared_long)),
        (3, " ".join(["b1"] + shared_long[:10] + ["b2"])),  # partial: no full run
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    got = {
        r.doc_id: (r.n_tokens, r.n_removed, r.text_clean)
        for r in dedup.remove_repeated_spans(
            df, "doc_id", "text", n=8, min_run=12
        ).collect()
    }
    want = _brute_remove_minrun(docs, n=8, min_run=12)
    assert got == want
    # doc 2: the 20-token run goes, the 8-token short overlap stays
    assert got[2][1] == 20
    assert "S0" in got[2][2] and "L0" not in got[2][2]


def test_remove_min_run_random_fixture(spark):
    docs = _span_fixture(seed=11)
    df = spark.createDataFrame(docs, "doc_id int, text string")
    got = {
        r.doc_id: (r.n_tokens, r.n_removed, r.text_clean)
        for r in dedup.remove_repeated_spans(
            df, "doc_id", "text", n=8, min_run=10
        ).collect()
    }
    want = _brute_remove_minrun(docs, n=8, min_run=10)
    assert got == want


# --- intra-doc repetition removal --------------------------------------------


def _brute_intra(docs, n: int = 4):
    out = {}
    for i, t in docs:
        ts = t.split()
        seen: dict[str, int] = {}
        removed: set[int] = set()
        for p in range(len(ts) - n + 1):
            gram = " ".join(ts[p : p + n])
            if gram in seen:
                removed.update(range(p, p + n))
            else:
                seen[gram] = p
        kept = [tok for j, tok in enumerate(ts) if j not in removed]
        out[i] = (len(ts), len(ts) - len(kept), " ".join(kept))
    return out


def test_remove_intra_doc_repeats_matches_bruteforce(spark):
    """Chat-log shape: the same phrase loops within one doc; later
    occurrences are cut, the first survives, and OTHER docs sharing the
    phrase are untouched (cross-doc repetition is exempt by design)."""
    loop = "ha he hi ho"
    docs = [
        (1, f"u1 {loop} u2 {loop} u3 {loop}"),
        (2, f"v1 v2 {loop} v3"),  # cross-doc only: untouched
        (3, " ".join(f"w{j}" for j in range(10))),
        (4, f"{loop} {loop}"),
        (5, ""),
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    got = {
        r.doc_id: (r.n_tokens, r.n_removed, r.text_clean)
        for r in dedup.remove_intra_doc_repeats(df, "doc_id", n=4).collect()
    }
    want = _brute_intra(docs, n=4)
    assert got == want
    assert got[2] == (7, 0, f"v1 v2 {loop} v3")
    assert got[1][1] > 0 and got[4] == (8, 4, loop)


def test_remove_intra_doc_repeats_random(spark):
    rng = random.Random(5)
    docs = []
    vocab = [f"t{j}" for j in range(12)]  # tiny vocab forces self-repeats
    for i in range(40):
        docs.append((i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 40)))))
    df = spark.createDataFrame(docs, "doc_id int, text string")
    got = {
        r.doc_id: (r.n_tokens, r.n_removed, r.text_clean)
        for r in dedup.remove_intra_doc_repeats(df, "doc_id", n=4).collect()
    }
    assert got == _brute_intra(docs, n=4)


# --- span-level decontamination ----------------------------------------------


def test_remove_contaminated_spans_cuts_all_eval_grams(spark):
    """After the cut, no train doc contains any 8-gram present in the
    eval corpus (checked exhaustively on original-adjacency runs via
    the unique-filler fixture), and uncontaminated docs are untouched."""
    eval_docs = [(100, "q1 q2 q3 q4 q5 q6 q7 q8 q9 q10")]
    train_docs = [
        (1, "a1 a2 q1 q2 q3 q4 q5 q6 q7 q8 a3 a4"),  # quotes the benchmark
        (2, "b1 b2 b3 b4 b5 b6 b7 b8 b9"),  # clean
        (3, " ".join(f"c{j}" for j in range(4)) + " q3 q4 q5 q6 q7 q8 q9 q10"),
    ]
    tr = spark.createDataFrame(train_docs, "doc_id int, text string")
    ev = spark.createDataFrame(eval_docs, "doc_id int, text string")
    got = {
        r.doc_id: (r.n_tokens, r.n_removed, r.text_clean)
        for r in dedup.remove_contaminated_spans(tr, ev, "doc_id", n=8).collect()
    }
    eval_grams = set()
    for _, t in eval_docs:
        ts = t.split()
        eval_grams.update(" ".join(ts[p : p + 8]) for p in range(len(ts) - 7))
    for i, _ in train_docs:
        ts = got[i][2].split()
        for p in range(len(ts) - 7):
            assert " ".join(ts[p : p + 8]) not in eval_grams, (i, p)
    assert got[1] == (12, 8, "a1 a2 a3 a4")
    assert got[2] == (9, 0, "b1 b2 b3 b4 b5 b6 b7 b8 b9")
    assert got[3][1] == 8 and got[3][2] == "c0 c1 c2 c3"


# --- dedup-safe split --------------------------------------------------------


def test_split_dedup_safe_no_group_straddles_splits(spark):
    """The leakage guard itself: identical texts always land in one
    split, while the id-keyed assignment provably leaks on the same
    fixture (200 duplicated texts × 5 copies with adversarial ids)."""
    from fiware_cosmos_orion_flink_connector_examples_spark.functions.hashing import (
        md5int64,
        md5int64_seeded,
    )

    rows = [
        (g * 1000 + c, f"duplicated text body number {g}")
        for g in range(200)
        for c in range(5)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    bucket = F.pmod(md5int64_seeded(F.md5("text"), "splitsafe"), F.lit(100))
    safe = df.select(
        "text",
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test").alias("split"),
    )
    n_leaky_groups = (
        safe.groupBy("text")
        .agg(F.countDistinct("split").alias("k"))
        .filter(F.col("k") > 1)
        .count()
    )
    assert n_leaky_groups == 0
    id_bucket = F.pmod(md5int64(F.col("doc_id").cast("string")), F.lit(100))
    leaky = df.select(
        "text",
        F.when(id_bucket < 80, "train").when(id_bucket < 90, "val").otherwise("test").alias("split"),
    )
    n_id_leaks = (
        leaky.groupBy("text")
        .agg(F.countDistinct("split").alias("k"))
        .filter(F.col("k") > 1)
        .count()
    )
    assert n_id_leaks > 0, "fixture must demonstrate the id-keyed leak"


# --- two-pass token-budget prefix sum ---------------------------------------


def _single_window_reference(df, budget: int):
    """The original one-window-per-source formulation, as the semantic
    reference for the two-pass path."""
    from pyspark.sql.window import Window

    from fiware_cosmos_orion_flink_connector_examples_spark.functions.hashing import (
        md5int64_seeded,
    )
    from fiware_cosmos_orion_flink_connector_examples_spark.operators import text

    base = df.select(
        "source",
        "doc_id",
        text.token_count("text").cast("long").alias("n_tokens"),
        md5int64_seeded(F.col("doc_id").cast("string"), "budget").alias("_h"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.asc("_h"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        base.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") <= budget)
        .select("source", "doc_id", "n_tokens", "cum_tokens")
    )


def _budget_fixture(spark, n_big: int = 4000, seed: int = 3):
    rng = random.Random(seed)
    rows = []
    for i in range(n_big):
        # zero-token docs included: the boundary-equality prune case
        k = rng.choice([0, 0, 1, 2, 3, 5, 8, 13])
        rows.append(("big", i, " ".join(["w"] * k)))
    for i in range(50):
        rows.append(("smallA", 100_000 + i, "a b c"))
        rows.append(("smallB", 200_000 + i, "x y"))
    return spark.createDataFrame(rows, "source string, doc_id int, text string")


def test_token_budget_two_pass_matches_single_window(spark):
    """One deliberately huge source (VERDICT r5 #3's done-bar): the
    range-partitioned two-pass result is row-identical to the global
    single-window formulation, zero-token boundary docs included."""
    from fiware_cosmos_orion_flink_connector_examples_spark.plans.extensions import (
        _token_budget_two_pass,
    )

    df = _budget_fixture(spark)
    got = sorted(
        tuple(r) for r in _token_budget_two_pass(df, budget=200).collect()
    )
    want = sorted(tuple(r) for r in _single_window_reference(df, 200).collect())
    assert got == want
    assert len(got) > 0


def test_token_budget_plan_has_no_per_source_sort(spark):
    """The expensive window (the one ordering by the hash) must
    partition by (source, _rng), never by source alone — no single
    task ever sorts a whole source."""
    from fiware_cosmos_orion_flink_connector_examples_spark.plans.registry import (
        QUERIES,
    )

    df = QUERIES["sample_token_budget"].fn(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    specs = [l for l in plan.splitlines() if "windowspecdefinition" in l]
    assert specs, "plan must contain window specs"
    heavy = [l for l in specs if "_h" in l]
    assert heavy, "hash-ordered window missing"
    for l in heavy:
        assert "_rng" in l, f"hash-ordered window not range-partitioned: {l}"


# --- temporal: LOCF resample + transition matrix -----------------------------


def test_resample_locf_matches_bruteforce(spark):
    """Grid covers [first, last] bin per key, empty bins carry the
    latest observed value forward, within-bin last wins by (ts, id)."""
    from fiware_cosmos_orion_flink_connector_examples_spark.operators.temporal import (
        resample_locf,
    )

    rows = [
        # key 1: obs in bins 0, 0 (tie ts -> id wins), 3
        (1, 5.0, 10.0, 100),
        (2, 5.0, 11.0, 100),   # same bin+ts, higher id -> wins bin 0
        (3, 35.0, 7.0, 100),
        # key 2: single obs
        (4, 12.0, 3.5, 200),
    ]
    df = spark.createDataFrame(
        [(i, float(s), v, k) for i, s, v, k in rows],
        "event_id int, sec double, value double, user_id int",
    ).select(
        "event_id", "user_id", "value",
        F.timestamp_seconds(F.col("sec")).alias("ts"),
    )
    got = {
        (r.user_id, r.bin_ts): (r.value_locf, r.is_observed)
        for r in resample_locf(
            df, "user_id", "ts", "value", id_col="event_id", step_secs=10
        ).collect()
    }
    want = {
        (100, 0): (11.0, True),
        (100, 10): (11.0, False),
        (100, 20): (11.0, False),
        (100, 30): (7.0, True),
        (200, 10): (3.5, True),
    }
    assert got == want


def test_transition_counts_matches_bruteforce(spark):
    from collections import Counter, defaultdict

    from fiware_cosmos_orion_flink_connector_examples_spark.operators.temporal import (
        transition_counts,
    )

    rng = random.Random(11)
    rows = []
    for i in range(300):
        rows.append((i, rng.randint(0, 9), float(rng.randint(0, 50)),
                     rng.choice("abcd")))
    df = spark.createDataFrame(
        rows, "event_id int, user_id int, sec double, state string"
    ).select(
        "event_id", "user_id", "state",
        F.timestamp_seconds(F.col("sec")).alias("ts"),
    )
    seqs = defaultdict(list)
    for i, u, s, st in rows:
        seqs[u].append((s, i, st))
    c: Counter = Counter()
    for u, evs in seqs.items():
        evs.sort()
        for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
            c[(a, b)] += 1
    rowsum: Counter = Counter()
    for (a, _), n in c.items():
        rowsum[a] += n
    got = {
        (r.prev_state, r.next_state): (r.n, r.p)
        for r in transition_counts(df, "user_id", "ts", "state", "event_id").collect()
    }
    want = {
        (a, b): (n, round(n / rowsum[a], 6)) for (a, b), n in c.items()
    }
    assert got == want


# --- MMR diversified top-k ---------------------------------------------------


def _brute_mmr(vecs, qids, k, shortlist, lam):
    """Pure-python MMR reference: cosine shortlist then greedy
    lam*rel - (1-lam)*max-sim-to-picked, ties by ascending id."""
    import math

    def norm(v):
        s = math.sqrt(sum(x * x for x in v))
        return [x / s for x in v] if s else v

    nv = {i: norm(v) for i, v in vecs.items()}

    def cos(a, b):
        return sum(x * y for x, y in zip(nv[a], nv[b]))

    out = {}
    for q in qids:
        scored = sorted(
            ((round(cos(q, n), 6), n) for n in nv if n != q),
            key=lambda t: (-t[0], t[1]),
        )[:shortlist]
        rel = {n: c for c, n in scored}
        cand = [n for _, n in scored]
        picked = []
        while cand and len(picked) < k:
            best = None
            for n in cand:  # cand is (score-desc, id-asc) stable order
                div = max((cos(n, s) for s in picked), default=0.0)
                sc = lam * rel[n] - (1 - lam) * div if picked else lam * rel[n]
                if best is None or sc > best[0] + 1e-12:
                    best = (sc, n)
            picked.append(best[1])
            cand.remove(best[1])
            out[(q, len(picked))] = best[1]
    return out


def test_mmr_matches_pure_python_reference(spark):
    from fiware_cosmos_orion_flink_connector_examples_spark.operators import similarity

    rng = random.Random(7)
    vecs = {
        i: [rng.uniform(-1, 1) for _ in range(8)] for i in range(60)
    }
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    qs = df.filter(F.col("vec_id") < 3)
    got = {
        (r.q_id, r.rank): r.n_id
        for r in similarity.topk_mmr(df, qs, k=5, shortlist=20, lam=0.5).collect()
    }
    assert got == _brute_mmr(vecs, [0, 1, 2], k=5, shortlist=20, lam=0.5)


def test_mmr_lambda_one_is_exact_topk(spark):
    from fiware_cosmos_orion_flink_connector_examples_spark.operators import similarity
    from fiware_cosmos_orion_flink_connector_examples_spark.sources.tables import (
        load_table,
    )

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    qs = emb.filter(F.col("vec_id") < 4)
    mmr = {
        (r.q_id, r.rank): r.n_id
        for r in similarity.topk_mmr(emb, qs, k=5, shortlist=50, lam=1.0).collect()
    }
    bf = {
        (r.q_id, r.rank): r.n_id
        for r in similarity.topk_cosine_bruteforce(emb, qs, k=5).collect()
    }
    assert mmr == bf


def test_mmr_diversifies_clustered_corpus(spark):
    """Two tight clusters: plain top-k returns only the near cluster;
    MMR at lam=0.5 must reach into the far cluster."""
    from fiware_cosmos_orion_flink_connector_examples_spark.operators import similarity

    rng = random.Random(3)
    rows = [(0, [1.0, 0.0, 0.0, 0.0])]  # query
    # A and B are equally q-aligned on axis 0 but OPPOSED on axis 1, so
    # cross-cluster sim (0.6) sits well below within-cluster sim (~1.0)
    # while B stays relevant — the regime where MMR must cross over.
    for i in range(1, 9):  # cluster A: [1, +0.4] direction, rel ~0.93
        rows.append((i, [1.0 + rng.uniform(-0.005, 0.005),
                         0.4 + rng.uniform(-0.005, 0.005), 0.0, 0.0]))
    for i in range(9, 17):  # cluster B: [1, -0.5] direction, rel ~0.89
        rows.append((i, [1.0 + rng.uniform(-0.005, 0.005),
                         -0.5 + rng.uniform(-0.005, 0.005), 0.0, 0.0]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qs = df.filter(F.col("vec_id") == 0)
    plain = {r.n_id for r in
             similarity.topk_cosine_bruteforce(df, qs, k=5).collect()}
    mmr = {r.n_id for r in
           similarity.topk_mmr(df, qs, k=5, shortlist=16, lam=0.5).collect()}
    assert plain <= set(range(1, 9))           # top-k stays in cluster A
    assert mmr & set(range(9, 17))             # MMR reaches cluster B


# --- OLS trend / BPE stats / covariance --------------------------------------


def test_events_user_trend_matches_numpy(spark):
    import numpy as np

    rng = random.Random(13)
    rows = []
    for u in range(6):
        for i in range(rng.randint(0, 8)):
            rows.append((len(rows), u, float(rng.randint(0, 10**6)),
                         float(rng.uniform(-50, 50))))
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, sec double, value double"
    ).selectExpr("event_id", "user_id", "value",
                 "timestamp_seconds(sec) AS ts")
    # mirror the registered query's moment form on this frame
    from fiware_cosmos_orion_flink_connector_examples_spark.plans.extensions import (
        events_user_trend,
    )
    import tempfile, shutil, os
    tmp = tempfile.mkdtemp()
    try:
        df.write.mode("overwrite").parquet(os.path.join(tmp, "events.parquet"))
        got = {
            r.user_id: (r.n, r.slope, r.intercept)
            for r in events_user_trend(spark, tmp).collect()
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    by_user = {}
    for _, u, sec, v in rows:
        by_user.setdefault(u, []).append(((sec * 1e6 - 1.7e15) / 86400e6, v))
    for u, pts in by_user.items():
        xs = np.array([p[0] for p in pts]); ys = np.array([p[1] for p in pts])
        if len(pts) < 2 or np.allclose(xs, xs[0]):
            assert u not in got
            continue
        slope, intercept = np.polyfit(xs, ys, 1)
        n, g_slope, g_intercept = got[u]
        assert n == len(pts)
        assert abs(g_slope - slope) < 1e-4, (u, g_slope, slope)
        # intercept extrapolates to x=0 far outside the data window, so
        # compare at relative precision (polyfit is SVD, ours closed-form)
        assert abs(g_intercept - intercept) < 1e-7 * abs(intercept) + 1e-4


def test_bpe_pair_stats_matches_bruteforce(spark):
    import collections
    import os, shutil, tempfile

    from fiware_cosmos_orion_flink_connector_examples_spark.plans.extensions import (
        bpe_pair_stats,
    )

    docs = [(0, "low lower lowest"), (1, "new newer newest low"), (2, "a bb")]
    df = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    tmp = tempfile.mkdtemp()
    try:
        df.write.mode("overwrite").parquet(os.path.join(tmp, "documents.parquet"))
        got = {(r.pair): (r.n, r.rank) for r in bpe_pair_stats(spark, tmp).collect()}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    c: collections.Counter = collections.Counter()
    for _, t in docs:
        for w in t.lower().split():
            for i in range(len(w) - 1):
                c[w[i : i + 2]] += 1
    ranked = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:30]
    want = {p: (n, i + 1) for i, (p, n) in enumerate(ranked)}
    assert got == want
    assert got["lo"][0] == 4  # low/lower/lowest + low


def test_embedding_covariance_matches_numpy(spark):
    import numpy as np

    from fiware_cosmos_orion_flink_connector_examples_spark.operators import similarity

    rng = np.random.RandomState(5)
    X = rng.randn(37, 6)
    df = spark.createDataFrame(
        [(i, X[i].tolist()) for i in range(len(X))],
        "vec_id long, embedding array<double>",
    ).repartition(4)  # multiple Arrow batches: the partial X^T X must combine
    m = similarity.covariance_moments(df, "embedding")
    rows = m.collect()
    want = np.cov(X, rowvar=False)
    assert len(rows) == 6 * 7 // 2
    for r in rows:
        cov = (r.sxx - r.s_i * r.s_j / r.n) / (r.n - 1)
        assert abs(cov - want[r.i, r.j]) < 1e-9, (r.i, r.j)
        assert r.n == 37


# --- CEP sequence pattern ----------------------------------------------------


def test_cep_negation_and_bound(spark):
    """Pattern semantics on a constructed fixture: (a) in-window
    sequence matches, (b) an intervening error rejects, (c) an error
    outside [t0, t1] does NOT reject, (d) purchase past the bound
    fails, (e) purchase before signup fails."""
    import datetime as dt
    import os, shutil, tempfile

    from fiware_cosmos_orion_flink_connector_examples_spark.plans.extensions import (
        events_cep_signup_purchase,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows, eid = [], 0

    def ev(user, hours, etype):
        nonlocal eid
        rows.append((eid, user, etype, t0 + dt.timedelta(hours=hours)))
        eid += 1

    ev(1, 0, "signup"); ev(1, 2, "purchase")                    # match
    ev(2, 0, "signup"); ev(2, 1, "error"); ev(2, 2, "purchase") # rejected
    ev(3, 0, "error"); ev(3, 1, "signup"); ev(3, 2, "purchase"); ev(3, 3, "error")  # errors outside
    ev(4, 0, "signup"); ev(4, 30, "purchase")                   # past 24h bound
    ev(5, 2, "signup"); ev(5, 1, "purchase")                    # wrong order
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    tmp = tempfile.mkdtemp()
    try:
        df.select(
            "event_id", "ts", "user_id", "event_type",
            F.lit(1.0).alias("value"), F.lit("{}").alias("props"),
        ).write.mode("overwrite").parquet(os.path.join(tmp, "events.parquet"))
        got = {
            r.user_id: r.latency_us
            for r in events_cep_signup_purchase(spark, tmp).collect()
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    assert got == {1: 2 * 3600 * 1_000_000, 3: 1 * 3600 * 1_000_000}


def test_ivf_empty_quantizer_falls_back_exact(spark):
    """centroids=[] (empty training corpus) must fall back to exact
    scoring with identical contracts — pinned on a small NON-empty
    frame so the fallback semantics are visible, not just non-crashing."""
    from fiware_cosmos_orion_flink_connector_examples_spark.operators import (
        dedup,
        similarity,
    )

    rng = random.Random(2)
    df = spark.createDataFrame(
        [(i, [rng.uniform(-1, 1) for _ in range(6)]) for i in range(20)],
        "vec_id long, embedding array<double>",
    )
    qs = df.filter(F.col("vec_id") < 3)
    bf = {(r.q_id, r.rank): r.n_id
          for r in similarity.topk_cosine_bruteforce(df, qs, k=4).collect()}
    ivf = {(r.q_id, r.rank): r.n_id
           for r in similarity.topk_cosine_ivf(df, qs, [], k=4).collect()}
    assert ivf == bf
    pairs_single_block = {
        (r.d1, r.d2)
        for r in dedup.embedding_dup_pairs(
            df.withColumn("_b", F.lit(0)), "vec_id", "embedding", "_b", 0.4
        ).collect()
    }
    pairs_fallback = {
        (r.d1, r.d2)
        for r in dedup.embedding_dup_pairs_ivf(
            df, [], "vec_id", "embedding", threshold=0.4
        ).collect()
    }
    assert pairs_fallback == pairs_single_block


def test_hll_mergeable_union_equals_oneshot(spark):
    """Union of per-day sketches must estimate EXACTLY like a one-shot
    whole-table sketch (same lgConfigK => same registers), and both
    land within 5% of the exact distinct count."""
    from fiware_cosmos_orion_flink_connector_examples_spark.plans.extensions import (
        events_hll_mergeable_daily,
    )
    from fiware_cosmos_orion_flink_connector_examples_spark.sources.tables import (
        load_table,
    )

    sf = "/root/testdata/sf0.01"
    rows = {r.day: r.distinct_est
            for r in events_hll_mergeable_daily(spark, sf).collect()}
    ev = load_table(spark, sf, "events")
    oneshot = ev.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id", 12))
    ).collect()[0][0]
    exact = ev.select("user_id").distinct().count()
    assert rows["ALL"] == oneshot
    assert abs(rows["ALL"] - exact) <= 0.05 * exact
    day_ests = [v for k, v in rows.items() if k != "ALL"]
    assert all(0 < v <= rows["ALL"] * 1.05 for v in day_ests)
