"""Property-based checks for round-5 operators: the span-dedup report
against a brute-force positional-n-gram reference, and quality_rules
against a plain-Python re-implementation of the same rational
arithmetic."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from fiware_cosmos_orion_flink_connector_examples_spark.operators import dedup, text

# Tiny vocabulary forces cross-doc gram collisions (the interesting
# case); doc length straddles the n-gram boundary so empty-span docs
# are exercised too.
_VOCAB = ("alpha", "beta", "gamma", "delta")
_DOC = st.lists(st.sampled_from(_VOCAB), min_size=0, max_size=10).map(" ".join)


def _brute_force(docs: list[str], n: int) -> dict[int, tuple[int, int]]:
    """doc_id -> (n_spans, n_dup_spans) by literal first-occurrence-wins."""
    grams: dict[int, list[str]] = {}
    for i, d in enumerate(docs):
        toks = re.findall(r"\S+", d)
        grams[i] = [" ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)]
    first: dict[str, int] = {}
    for i in sorted(grams):
        for g in grams[i]:
            first.setdefault(g, min(first.get(g, i), i))
    return {
        i: (len(gs), sum(1 for g in gs if first[g] < i))
        for i, gs in grams.items()
        if gs
    }


@given(st.lists(_DOC, min_size=1, max_size=8), st.integers(min_value=2, max_value=4))
@settings(max_examples=15, deadline=None)
def test_repeated_span_report_matches_brute_force(spark, docs, n):
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_spans, r.n_dup_spans)
        for r in dedup.repeated_span_report(df, "doc_id", "text", n=n).collect()
    }
    assert got == _brute_force(docs, n)


# ASCII only: the regex dialects diverge outside it — Java/RE2 class
# \s is ASCII (NBSP is a "word" char) while Python's is Unicode, and
# \b boundaries next to Latin-Extended letters differ between RE2 and
# Java/Python.  The oracle contract (Spark↔DuckDB) holds because the
# corpus is ASCII; this cross-check against Python inherits the same
# domain.  Hypothesis found both divergences with a 0x2FF alphabet.
_FUNNEL_DOC = st.text(
    alphabet=st.characters(
        whitelist_categories=("Lu", "Ll", "Nd"),
        whitelist_characters=" ",
        max_codepoint=0x7F,
    ),
    max_size=120,
)


def _python_rules(d: str) -> dict[str, bool]:
    toks = re.findall(r"\S+", d)
    n_tok = float(len(toks))
    safe = max(n_tok, 1.0)
    stop_pat = r"\b(" + "|".join(text.STOPWORDS) + r")\b"
    n_stop = float(len(re.findall(stop_pat, d)))
    return {
        "pass_len": n_tok >= 30.0,
        "pass_word": 3.0 <= len(d) / safe <= 9.0,
        "pass_stop": n_stop / safe > 0.02,
        "pass_distinct": len(set(toks)) / safe >= 0.3,
    }


@given(st.lists(_FUNNEL_DOC, min_size=1, max_size=8))
@settings(max_examples=15, deadline=None)
def test_quality_rules_match_python(spark, docs):
    """Java-regex token/stopword counts and the rational rule
    arithmetic must agree with an independent Python re-implementation
    (same dialect-intersection argument as the PII property test)."""
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "i long, text string"
    )
    rules = text.quality_rules("text")
    got = {
        r.i: {k: bool(r[k]) for k in rules}
        for r in df.select("i", *(c.alias(nm) for nm, c in rules.items())).collect()
    }
    for i, d in enumerate(docs):
        assert got[i] == _python_rules(d), (i, d)


# --- token-budget sampling invariants ---------------------------------------


def test_token_budget_invariants(spark):
    """Per-source cumulative tokens never exceed the budget, the
    selection is the md5-rank prefix (no doc after the first over-budget
    doc), and the result is invariant under input partitioning."""
    from fiware_cosmos_orion_flink_connector_examples_spark.plans.registry import (
        QUERIES,
    )

    sf = "/root/testdata/sf0.001"
    out = QUERIES["sample_token_budget"].fn(spark, sf)
    rows = out.collect()
    assert rows, "sample must be non-empty at sf0.001"
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    for src, rs in by_src.items():
        assert max(x.cum_tokens for x in rs) <= 1000, src
        # cum_tokens is a prefix sum: sorted order reconstructs exactly
        rs = sorted(rs, key=lambda x: x.cum_tokens)
        acc = 0
        for x in rs:
            acc += x.n_tokens
            assert x.cum_tokens == acc, (src, x)
    # partitioning invariance: same result from a repartitioned scan
    from fiware_cosmos_orion_flink_connector_examples_spark.operators import text
    from fiware_cosmos_orion_flink_connector_examples_spark.sources.tables import (
        load_table,
    )
    from fiware_cosmos_orion_flink_connector_examples_spark.functions.hashing import (
        md5int64_seeded,
    )
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    docs = load_table(spark, sf, "documents").repartition(7)
    base = docs.select(
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
    re_rows = (
        base.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") <= 1000)
        .select("source", "doc_id", "n_tokens", "cum_tokens")
        .collect()
    )
    assert {tuple(r) for r in re_rows} == {tuple(r) for r in rows}


# --- gaps-and-islands vs brute force -----------------------------------------

_TYPES = ("a", "b", "c")


@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.sampled_from(_TYPES), st.integers(0, 50)),
        min_size=1,
        max_size=25,
    )
)
@settings(max_examples=15, deadline=None)
def test_islands_match_brute_force(spark, evs):
    """The window-chain islands formulation vs a literal scan: collapse
    per-user ts-ordered runs of equal type, compare extents and sizes.
    event_id breaks ts ties exactly like the query's ORDER BY."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    rows = [(i, u, t, sec) for i, (u, t, sec) in enumerate(evs)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, sec long"
    ).select(
        "user_id", "event_type", F.timestamp_seconds("sec").alias("ts"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = df.withColumn(
        "is_start",
        F.when(
            F.lag("event_type").over(w).isNull()
            | (F.lag("event_type").over(w) != F.col("event_type")),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    got = {
        (r.user_id, r.island_id, r.event_type, r.n, r.lo, r.hi)
        for r in flagged.withColumn(
            "island_id",
            F.sum("is_start").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy("user_id", "island_id", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.unix_seconds(F.min("ts")).alias("lo"),
            F.unix_seconds(F.max("ts")).alias("hi"),
        )
        .collect()
    }
    exp = set()
    by_user = {}
    for i, (u, t, sec) in enumerate(evs):
        by_user.setdefault(u, []).append((sec, i, t))
    for u, es in by_user.items():
        es.sort()
        island, run = 0, []
        for sec, i, t in es:
            if not run or run[-1][2] != t:
                if run:
                    exp.add((u, island, run[0][2], len(run), run[0][0], run[-1][0]))
                island += 1
                run = []
            run.append((sec, i, t))
        exp.add((u, island, run[0][2], len(run), run[0][0], max(s for s, _, _ in run)))
    assert got == exp


# --- MAD outliers vs numpy reference -----------------------------------------


@given(
    st.lists(
        st.tuples(st.sampled_from(("x", "y")), st.integers(-10_000, 10_000)),
        min_size=2,
        max_size=40,
    )
)
@settings(max_examples=15, deadline=None)
def test_mad_outliers_match_numpy(spark, vals):
    """F.median-based MAD flagging vs numpy.median on the same halves —
    both exact interpolated medians, so counts must agree exactly."""
    import numpy as np
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(t, float(v) / 100.0) for t, v in vals], "event_type string, value double"
    )
    med = df.groupBy("event_type").agg(F.median("value").alias("m"))
    dev = df.join(F.broadcast(med), "event_type").select(
        "event_type", "m", F.abs(F.col("value") - F.col("m")).alias("d")
    )
    mad = dev.groupBy("event_type").agg(F.median("d").alias("mad_v"))
    got = {
        r.event_type: r.n
        for r in dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.sum(
                (F.col("d") > F.lit(4.4478) * F.col("mad_v")).cast("int")
            ).alias("n")
        )
        .collect()
    }
    by_t = {}
    for t, v in vals:
        by_t.setdefault(t, []).append(float(v) / 100.0)
    for t, xs in by_t.items():
        a = np.array(xs)
        d = np.abs(a - np.median(a))
        exp = int((d > 4.4478 * np.median(d)).sum())
        assert got[t] == exp, (t, xs)
