"""Text-analysis operators over the documents table ([ext] X4 +
BASELINE.json's training-data-pipeline mandate).

Everything is built from JVM-side column expressions (regexp counts,
array transforms, md5 hashing) — no Python UDFs anywhere in this
module, so the whole pipeline stays inside whole-stage codegen and
scales linearly with input splits.  Every formula is chosen to be
reproducible in ANSI SQL so the DuckDB oracle can verify it.

Paper anchor: Twitter sentiment on Spark (EDBT'16) for the
tokenize→explode→count pattern (PAPERS.md).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fiware_cosmos_orion_flink_connector_examples_spark.functions.hashing import md5int64
from fiware_cosmos_orion_flink_connector_examples_spark.operators.caching import eagerly

# Dialect caveat (hypothesis-found): outside ASCII the regex engines
# diverge — Java/RE2 class \s is ASCII (NBSP counts as a word char)
# while Python's is Unicode, and \b next to Latin-Extended letters
# differs between RE2 and Java.  The oracle contract (Spark↔DuckDB)
# holds on this corpus because the text is ASCII; non-ASCII corpora
# should tokenize with explicit character classes instead of \S/\b.
TOKEN_RE = r"\S+"
# BPE-ish subword split: runs of letters, runs of digits, or single
# punctuation — approximates byte-pair pre-tokenization.
BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it")


def tokens(col: Column | str = "text") -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(TOKEN_RE), 0)


def token_count(col: Column | str = "text") -> Column:
    """Whitespace token count via regexp_count — identical semantics in
    Spark and DuckDB (number of \\S+ runs)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(TOKEN_RE))


def bpe_token_count(col: Column | str = "text") -> Column:
    """BPE-ish subword count (letter runs + digit runs + punct chars)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(BPE_RE))


def stopword_count(col: Column | str = "text") -> Column:
    c = F.col(col) if isinstance(col, str) else col
    pat = r"\b(" + "|".join(STOPWORDS) + r")\b"
    return F.regexp_count(c, F.lit(pat))


def quality_score(col: Column | str = "text") -> Column:
    """Heuristic quality ∈ [0,1]: rewards mid-length docs and a sane
    stopword ratio, penalizes very short docs.  Deterministic rational
    arithmetic only (SQL-reproducible)."""
    c = F.col(col) if isinstance(col, str) else col
    n_tok = token_count(c).cast("double")
    n_chars = F.length(c).cast("double")
    stop_ratio = stopword_count(c).cast("double") / F.greatest(n_tok, F.lit(1.0))
    len_score = F.least(n_tok / F.lit(50.0), F.lit(1.0))
    avg_word = n_chars / F.greatest(n_tok, F.lit(1.0))
    word_score = F.when((avg_word >= 3.0) & (avg_word <= 9.0), F.lit(1.0)).otherwise(F.lit(0.5))
    stop_score = F.when(stop_ratio > 0.02, F.lit(1.0)).otherwise(F.lit(0.6))
    return F.round(0.5 * len_score + 0.25 * word_score + 0.25 * stop_score, 4)


def quality_rules(col: Column | str = "text") -> dict[str, Column]:
    """The quality filter as individual boolean RULES (the C4/Gopher
    reporting shape: each rule's pass rate is tracked separately so a
    threshold change can be simulated from the report without a corpus
    re-scan).  Same deterministic rational arithmetic as
    quality_score; one extra rule (distinct-token ratio ≥ 0.3 — the
    repetition screen) that the blended score does not include.
    Returns name → BooleanType column; all four are computed from one
    pass over the text column (no shuffle, codegen-friendly)."""
    c = F.col(col) if isinstance(col, str) else col
    n_tok = token_count(c).cast("double")
    safe_tok = F.greatest(n_tok, F.lit(1.0))
    avg_word = F.length(c).cast("double") / safe_tok
    stop_ratio = stopword_count(c).cast("double") / safe_tok
    distinct_ratio = (
        F.size(F.array_distinct(tokens(c))).cast("double") / safe_tok
    )
    return {
        "pass_len": n_tok >= 30.0,
        "pass_word": (avg_word >= 3.0) & (avg_word <= 9.0),
        "pass_stop": stop_ratio > 0.02,
        "pass_distinct": distinct_ratio >= 0.3,
    }


GOPHER_RULE_COLS = (
    "n_words",
    "pass_word_count",
    "pass_mean_word_len",
    "pass_symbol_ratio",
    "pass_bullets",
    "pass_ellipsis",
    "pass_alpha_words",
    "pass_stopwords",
    "gopher_pass",
)

C4_RULE_COLS = (
    "n_lines",
    "n_lines_kept",
    "n_sentences",
    "kept_char_frac",
    "has_lorem_ipsum",
    "has_curly_brace",
    "c4_keep",
)


def with_gopher_rules(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append the Gopher quality rule card (Rae et al. 2021, Appendix
    A5) to ``df``: per-doc pass booleans for word count in [50, 100k],
    mean word length in [3, 10], symbol-to-word ratio < 0.1,
    bullet-started lines < 90%, ellipsis-ended lines < 30%, >= 80%
    words containing an alphabetic char, >= 2 distinct required
    stopwords — plus ``n_words`` and the conjunctive ``gopher_pass``
    (``GOPHER_RULE_COLS``).  Zero shuffle; one transformer serves the
    batch queries AND the stateless streaming gate.

    ONE flat projection, measured: the structurally-repeated subtrees
    here (toks, the ratios re-appearing in gopher_pass) are evaluated
    UNconditionally, so interpreted-mode subexpression elimination
    already collapses the big duplications.  A same-session alternating
    A/B at 2M docs put a layered variant (token/line arrays
    materialized between Projects) at 4.1–4.6 s vs 4.9–5.0 s flat —
    a ~10% edge, within the session-to-session swing (5.9–11.2 s
    observed for identical code), not worth the extra plumbing.
    Contrast text_gopher_repetition, whose duplicated trees sit under
    CASE WHEN branches — conditionals are excluded from subexpr
    elimination, so THAT card layers on purpose and measured a real
    win."""
    c = F.col(text_col)
    toks = F.regexp_extract_all(c, F.lit(r"\S+"), 0)
    lines = F.split(c, "\n")
    n_words = F.size(toks)
    nw = F.greatest(n_words, F.lit(1)).cast("double")
    mwl = F.length(F.regexp_replace(c, r"\s", "")).cast("double") / nw
    sym_ratio = (
        F.size(F.regexp_extract_all(c, F.lit(r"#|\.\.\."), 0)).cast("double")
        / nw
    )
    n_lines = F.size(lines).cast("double")
    bullet_ratio = (
        F.size(F.filter(lines, lambda l: l.rlike("^[-*•]"))).cast("double")
        / n_lines
    )
    ellipsis_ratio = (
        F.size(F.filter(lines, lambda l: l.rlike(r"\.\.\.$"))).cast("double")
        / n_lines
    )
    alpha_ratio = (
        F.size(F.filter(toks, lambda w: w.rlike("[A-Za-z]"))).cast("double")
        / nw
    )
    n_stop_kinds = F.size(
        F.array_distinct(
            F.regexp_extract_all(
                F.lower(c),
                F.lit(r"\b(the|be|to|of|and|that|have|with)\b"),
                0,
            )
        )
    )
    p_wc = (n_words >= 50) & (n_words <= 100_000)
    p_mwl = (mwl >= 3.0) & (mwl <= 10.0)
    p_sym = sym_ratio < 0.1
    p_bul = bullet_ratio < 0.9
    p_ell = ellipsis_ratio < 0.3
    p_alpha = alpha_ratio > 0.8
    p_stop = n_stop_kinds >= 2
    return df.select(
        "*",
        n_words.cast("long").alias("n_words"),
        p_wc.alias("pass_word_count"),
        p_mwl.alias("pass_mean_word_len"),
        p_sym.alias("pass_symbol_ratio"),
        p_bul.alias("pass_bullets"),
        p_ell.alias("pass_ellipsis"),
        p_alpha.alias("pass_alpha_words"),
        p_stop.alias("pass_stopwords"),
        (p_wc & p_mwl & p_sym & p_bul & p_ell & p_alpha & p_stop).alias(
            "gopher_pass"
        ),
    )


def with_c4_rules(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append the C4 cleaning rule card (Raffel et al. 2020 §2.2) to
    ``df``: a line survives iff it ends in terminal punctuation
    ([.!?\"] after rtrim), has >= 5 words, and does not mention
    'javascript'; the page verdict ``c4_keep`` requires >= 3
    sentence-final marks among kept lines, no 'lorem ipsum', no curly
    brace (``C4_RULE_COLS``).  One flat projection like
    ``with_gopher_rules`` (see its measured note): the repeated
    ``kept`` tree is unconditional, so interpreted-mode subexpression
    elimination evaluates it once."""
    c = F.col(text_col)
    lines = F.split(c, "\n")
    kept = F.filter(
        lines,
        lambda l: F.rtrim(l).rlike('[.!?"]$')
        & (F.size(F.regexp_extract_all(l, F.lit(r"\S+"), 0)) >= 5)
        & ~F.lower(l).contains("javascript"),
    )
    line_chars = F.coalesce(
        F.aggregate(lines, F.lit(0), lambda acc, l: acc + F.length(l)),
        F.lit(0),
    )
    n_sent = F.coalesce(
        F.aggregate(
            kept,
            F.lit(0),
            lambda acc, l: acc
            + F.size(F.regexp_extract_all(l, F.lit("[.!?]"), 0)),
        ),
        F.lit(0),
    )
    kept_chars = F.coalesce(
        F.aggregate(kept, F.lit(0), lambda acc, l: acc + F.length(l)),
        F.lit(0),
    )
    has_lorem = F.lower(c).contains("lorem ipsum")
    has_brace = c.contains("{")
    return df.select(
        "*",
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_lines_kept"),
        n_sent.cast("long").alias("n_sentences"),
        F.round(
            F.when(
                line_chars > 0,
                kept_chars.cast("double") / line_chars.cast("double"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("kept_char_frac"),
        has_lorem.alias("has_lorem_ipsum"),
        has_brace.alias("has_curly_brace"),
        ((n_sent >= 3) & ~has_lorem & ~has_brace).alias("c4_keep"),
    )


# Marker words per language for the n-gram/keyword language-ID
# heuristic.  The corpus is synthetic word salad, so markers are drawn
# from its own vocabulary — the POINT is the deterministic scoring
# machinery, not linguistic accuracy.
LANG_MARKERS = {
    "en": ("the", "a", "fast", "slow"),
    "db": ("table", "scan", "join", "query", "hash"),
    "st": ("stream", "window", "batch", "row"),
}


def lang_scores(col: Column | str = "text") -> dict[str, Column]:
    c = F.col(col) if isinstance(col, str) else col
    out = {}
    for lang, markers in LANG_MARKERS.items():
        pat = r"\b(" + "|".join(markers) + r")\b"
        out[lang] = F.regexp_count(c, F.lit(pat))
    return out


def predicted_lang(col: Column | str = "text") -> Column:
    """argmax over marker-count scores, deterministic tie-break by
    lexicographic language code (greatest-score-first CASE chain)."""
    s = lang_scores(col)
    # tie-break: en > db > st by >= ordering in this chain
    return (
        F.when((s["en"] >= s["db"]) & (s["en"] >= s["st"]), F.lit("en"))
        .when(s["db"] >= s["st"], F.lit("db"))
        .otherwise(F.lit("st"))
    )


def doc_fingerprint(col: Column | str = "text") -> Column:
    """Position-sensitive 60-bit document fingerprint: XOR-fold of
    md5int64(position:token) over all tokens.  Pure array fold inside
    one projection — no explode, no shuffle (the rolling-hash
    capability from BASELINE.json, engineered commutative-overflow-free
    so DuckDB's unnest+bit_xor reproduces it exactly)."""
    toks = tokens(col)
    indexed = F.transform(toks, lambda t, i: F.concat(i.cast("string"), F.lit(":"), t))
    hashed = F.transform(indexed, md5int64)
    return F.aggregate(hashed, F.lit(0).cast("long"), lambda acc, x: acc.bitwiseXOR(x))


def simhash64(col: Column | str = "text", bits: int = 60) -> Column:
    """SimHash over whitespace tokens: for each of ``bits`` bit
    positions, sum +1/-1 votes of each distinct token's md5int64 bit;
    bit set iff vote > 0.  Expressed as one nested array fold —
    per-row, shuffle-free, codegen'd.

    60 bits (not 64) so the result stays a positive BIGINT in both
    engines (md5int64 yields 60-bit hashes)."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.array_distinct(F.regexp_extract_all(c, F.lit(TOKEN_RE), 0))
    hashed = F.transform(toks, md5int64)
    # column-valued shift amounts need the SQL shiftleft/shiftright
    # (the Python wrappers only take int shifts).  ``hashed`` must be
    # bound through array_repeat, NOT captured in the per-bit lambda —
    # a captured outer expression is inlined per element, re-running
    # every md5 ``bits`` times per row (the l2_normalize lesson,
    # SCALING.md).
    bit_votes = F.zip_with(
        F.sequence(F.lit(0), F.lit(bits - 1)),
        F.array_repeat(hashed, bits),
        lambda b, hs: F.aggregate(
            hs,
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + F.when(
                F.call_function("shiftright", h, b).bitwiseAND(F.lit(1)) == 1, F.lit(1)
            ).otherwise(F.lit(-1)),
        ),
    )
    return F.aggregate(
        F.zip_with(
            bit_votes,
            F.sequence(F.lit(0), F.lit(bits - 1)),
            lambda v, b: F.when(
                v > 0, F.call_function("shiftleft", F.lit(1).cast("long"), b)
            ).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc.bitwiseOR(x),
    )


POSITIVE_WORDS = ("fast", "small", "good", "best")
NEGATIVE_WORDS = ("slow", "bad", "worst", "error")


def sentiment_score(col: Column | str = "text") -> Column:
    """Naive lexicon sentiment ∈ [-1, 1]: (pos - neg) / tokens — the
    tokenize→count pattern of the EDBT'16 Twitter-sentiment-on-Spark
    paper (PAPERS.md), as pure regexp_count arithmetic."""
    c = F.col(col) if isinstance(col, str) else col
    pos = F.regexp_count(c, F.lit(r"\b(" + "|".join(POSITIVE_WORDS) + r")\b"))
    neg = F.regexp_count(c, F.lit(r"\b(" + "|".join(NEGATIVE_WORDS) + r")\b"))
    n = F.greatest(token_count(c), F.lit(1)).cast("double")
    return F.round((pos - neg) / n, 6)


def simhash_table(
    df: DataFrame, id_col: str, text_col: str = "text", bits: int = 60
) -> DataFrame:
    """DataFrame-level simhash: (id, sim).  Same values as
    ``simhash64`` but computed by explode → codegen'd hash column →
    one hash-aggregate with ``bits`` sum(CASE) votes → bit assembly.
    The array-fold form (simhash64) evaluates interpreted and costs
    ~10× more; this form also gets map-side partial aggregation, so
    shuffle volume is one row per doc at any scale.

    The per-bit vote and assembly expressions are built as SQL strings
    (``F.expr``), not Column-object chains: the Column form issued
    ~800 py4j round trips per CALL (60 bits × ~13 ops), measured
    1.31 s of pure driver-side plan construction per invocation vs
    0.15 s for the string form — the ANALYZED PLAN is identical
    (row-equality pinned in tests/test_ext_operators.py), only the
    Python→JVM construction path changes (round 17, guide §1.2
    step 2 / §5 driver work)."""
    toks = F.array_distinct(F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_RE), 0))
    ex = df.select(F.col(id_col), F.explode(toks).alias("tk"))
    hv = ex.select(F.col(id_col), md5int64(F.col("tk")).alias("hv"))
    votes = hv.groupBy(id_col).agg(
        *[
            F.expr(
                f"sum(CASE WHEN (shiftright(hv, {b}) & 1) = 1"
                f" THEN 1 ELSE -1 END) AS v{b}"
            )
            for b in range(bits)
        ]
    )
    sim = " | ".join(
        f"(CASE WHEN v{b} > 0 THEN CAST({1 << b} AS BIGINT)"
        f" ELSE CAST(0 AS BIGINT) END)"
        for b in range(bits)
    )
    return votes.select(F.col(id_col), F.expr(sim).alias("sim"))


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document stats projection used by the registry queries."""
    return df.select(
        "*",
        token_count(text_col).alias("n_tokens"),
        bpe_token_count(text_col).alias("n_bpe_tokens"),
        stopword_count(text_col).alias("n_stopwords"),
        quality_score(text_col).alias("quality"),
        predicted_lang(text_col).alias("pred_lang"),
    )


# PII patterns chosen to behave identically under Java regex (Spark)
# and RE2 (DuckDB oracle): character classes + bounded repetition only,
# no backreferences or lookaround.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+[0-9]+ \([0-9]{3}\) [0-9]{3}-[0-9]{1,4}"


def redact_pii(col: Column | str = "text") -> Column:
    """Mask emails then phone numbers — the pre-training PII scrub.
    Pure regexp_replace chain: JVM-side, codegen-fused, linear scan per
    row; at 100 TB this is a map-only stage with zero shuffle."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.regexp_replace(c, EMAIL_RE, "<EMAIL>")
    return F.regexp_replace(out, PHONE_RE, "<PHONE>")


def unigram_logprob(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    literal_vocab_max: int = 10_000,
) -> DataFrame:
    """Per-doc mean ln p(token) under the corpus unigram model (the
    CCNet/KenLM-style perplexity-proxy quality filter).

    Two physical strategies, auto-selected by vocabulary size, both
    producing byte-identical results (same left-to-right summation
    order over the document's tokens):

    * **literal path** (|vocab| <= ``literal_vocab_max``): the model is
      collected driver-side and inlined as a ``create_map`` literal;
      scoring is a sequential ``F.aggregate`` fold over the token
      array — one job, no second shuffle.
    * **join path** (open vocab): tokens are posexploded, the
      token→count model DataFrame is joined (broadcast below Spark's
      autoBroadcastJoinThreshold, shuffle hash/SMJ above — Catalyst
      decides, so a million-term vocab is just a bigger join, never a
      planner-killing literal), and per-doc scores are re-folded in
      token order via ``sort_array(collect_list(struct(pos, lp)))`` —
      the explicit ORDER BY pos re-fold keeps float summation order
      identical to the literal path and to DuckDB's list_aggregate.

    Returns (id, n_tokens BIGINT, avg_logprob DOUBLE).
    """
    toks = tokens(text_col)
    ex = docs.select(F.col(id_col), F.posexplode(toks).alias("pos", "tok"))
    # persisted: the probe agg, and then either collect() or the scoring
    # join, all read it (bench.py clearCache()s between queries).  The
    # cache is intentionally session-lived — the returned frame is
    # lazy, so unpersisting here would defeat it; long-lived sessions
    # should clearCache() after consumption (ADVICE r5).
    freq = ex.groupBy("tok").agg(F.count(F.lit(1)).alias("c")).persist()
    totals = freq.agg(F.count(F.lit(1)).alias("v"), F.sum("c").alias("n")).collect()[0]
    n_vocab, n_total = totals["v"], float(totals["n"] or 0.0)

    if n_vocab <= literal_vocab_max:
        rows = freq.collect()  # bounded by literal_vocab_max
        # the literal plan below references only `mapping` — the vocab
        # cache has no further consumer, release it now (r7 #6)
        freq.unpersist()
        mapping = F.create_map(
            *[x for r in rows for x in (F.lit(r["tok"]), F.lit(float(r["c"])))]
        )
        lp = F.transform(
            toks,
            lambda tok: F.log(F.element_at(mapping, tok) / F.lit(n_total)),
        )
        return docs.filter(F.size(toks) > 0).select(
            F.col(id_col),
            F.size(toks).cast("long").alias("n_tokens"),
            F.round(
                F.aggregate(lp, F.lit(0.0), lambda a, x: a + x) / F.size(toks), 6
            ).alias("avg_logprob"),
        )

    scored = ex.join(
        freq.select("tok", (F.log(F.col("c") / F.lit(n_total))).alias("lp")),
        "tok",
    )
    plist = F.sort_array(F.collect_list(F.struct("pos", "lp")))
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.transform(plist, lambda s: s["lp"]).alias("lps"),
    )
    return per_doc.select(
        F.col(id_col),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round(
            F.aggregate(F.col("lps"), F.lit(0.0), lambda a, x: a + x)
            / F.col("n_tokens"),
            6,
        ).alias("avg_logprob"),
    )


def chunk_documents(
    df, id_col: str = "doc_id", text_col: str = "text", size: int = 32, stride: int = 24
):
    """Split documents into overlapping token-window chunks — the LLM
    training-data chunking op (context-window packing's precursor).
    Chunk starts at token offsets 0, stride, 2·stride, …; the last
    window may be shorter; docs shorter than one window yield one
    chunk.  Pure column expressions: sequence → posexplode → slice —
    per-row work, no Python, chunk rows shuffle-free until whatever
    the caller aggregates.

    Returns (id, chunk_idx INT, chunk_text, n_tokens INT).  Rows with
    NULL text are dropped at the boundary (nothing to chunk).
    """
    from pyspark.sql import functions as F

    df = df.filter(F.col(text_col).isNotNull())
    # tokenization is PRE-PROJECTED below the explode: a computed
    # sibling in the same select as posexplode lands in the Project
    # ABOVE the Generate and is re-evaluated once per CHUNK — for a
    # doc with c chunks that is c tokenization passes over the full
    # text, O(n²) on long docs (the nb_quality_scores lesson,
    # SCALING.md round 8).  Two-step projection pins it per-doc;
    # CollapseProject cannot merge through a Generate.
    pre = df.select(F.col(id_col), tokens(text_col).alias("_toks"))
    n = F.size(F.col("_toks"))
    # number of stride steps: 1 + max(0, ceil((n - size) / stride));
    # integer form works for n <= size too (single chunk)
    n_chunks = F.greatest(
        F.lit(1),
        (F.lit(1) + F.ceil((n - F.lit(size)).cast("double") / F.lit(stride))).cast("int"),
    )
    base = pre.select(
        F.col(id_col),
        F.col("_toks"),
        F.posexplode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx", "_step"),
    )
    piece = F.slice(F.col("_toks"), F.col("_step") * stride + 1, size)
    return base.select(
        F.col(id_col),
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.array_join(piece, " ").alias("chunk_text"),
        F.size(piece).cast("int").alias("n_tokens"),
    )


def pack_chunks(
    chunks: DataFrame,
    order_cols: list[str],
    n_tokens_col: str = "n_tokens",
    budget: int = 256,
    shards: int = 64,
):
    """Greedy sequence packing (context-window packing): assign chunks
    to packs so each pack's token sum stays ≤ ``budget``; a chunk
    larger than the budget gets a pack of its own.  The step LLM
    training pipelines run right before batch assembly.

    Greedy fill-with-reset is inherently sequential, so it cannot be a
    window function; the distributed form shards chunks by a
    deterministic hash of the first order column into ``shards``
    independent groups, and each group packs sequentially (ordered by
    ``order_cols``) inside ONE Arrow-batched applyInPandas pass.
    Packing quality is per-shard (waste stays < one chunk per pack on
    average); global pack ids are (shard, local) composites, so no
    coordination between shards is ever needed — at 100 TB raise
    ``shards`` to keep groups executor-sized and the operator stays a
    single shuffle.

    Returns the input columns + ``pack_id`` (BIGINT, globally unique),
    ``pack_offset`` (INT position within the pack).  Deterministic for
    any input partitioning: shard hash, order, and fill are all
    data-defined.
    """
    from pyspark.sql.types import IntegerType, LongType, StructField, StructType

    from fiware_cosmos_orion_flink_connector_examples_spark.functions.hashing import (
        md5int64,
    )

    out_schema = StructType(
        chunks.schema.fields
        + [
            StructField("pack_id", LongType()),
            StructField("pack_offset", IntegerType()),
        ]
    )
    order_idx = [f.name for f in chunks.schema.fields]

    def pack_one(pdf):
        pdf = pdf.sort_values(order_cols, kind="mergesort").reset_index(drop=True)
        shard = int(pdf["_shard"].iloc[0])
        pack_local, used, ids, offs = 0, 0, [], []
        first = True
        for n in pdf[n_tokens_col]:
            n = int(n)
            if not first and used + n > budget:
                pack_local += 1
                used = 0
            ids.append(shard * 1_000_000_000 + pack_local)
            offs.append(int(used))
            used += n
            first = False
        out = pdf[order_idx].copy()
        out["pack_id"] = ids
        out["pack_offset"] = offs
        return out

    sharded = chunks.withColumn(
        "_shard",
        F.pmod(md5int64(F.col(order_cols[0]).cast("string")), F.lit(shards)),
    )
    return sharded.groupBy("_shard").applyInPandas(pack_one, schema=out_schema)


def source_unigram_kl(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-group unigram distribution drift: KL(P_group ‖ P_corpus) =
    Σ_t p_g(t)·ln(p_g(t)/p(t)) over whole-word tokens — the mixture
    monitor run per source/shard/snapshot to catch a slice whose token
    distribution is drifting from the corpus before it skews training.

    Shape: one token explode → (group, tok) counts (map-side partial),
    then the marginals are REUSED from that table (per-tok counts,
    per-group totals, grand total — three shrinking aggs, never a
    second corpus scan).  The vocab-sized tok-marginal joins back
    broadcast-or-shuffle at Catalyst's discretion, the group marginal
    is group-cardinality (broadcast), the grand total a 1-row
    broadcast scalar.  The final KL sum folds in explicit token order
    via ``F.aggregate(F.sort_array(collect_list(struct(tok, term))))``
    — same left-to-right float determinism contract as
    ``unigram_logprob``, matched by DuckDB ``list(term ORDER BY tok)``
    + ``list_aggregate('sum')``.  The ordered fold is the
    ORACLE-portability path: per-group term arrays are vocab-bounded
    (fine for word/BPE vocabularies); an unhashable-but-cheaper plain
    ``F.sum`` drop-in exists for open-ended vocabularies at scale.

    Returns (group_col, n_tokens BIGINT, kl DOUBLE round 6).
    """
    ex = docs.select(F.col(group_col), F.explode(tokens(text_col)).alias("tok"))
    # Four consumers (three marginals + the term join) would each
    # re-run the corpus-sized explode; st itself is |groups|×|vocab|
    # rows — bounded and tiny relative to the corpus — so persisting
    # it is cheap and saves three full scans (1.69 → 1.13 s at sf0.1).
    # The cache is intentionally session-lived (ADVICE r5): the
    # returned frame is lazy, so this function cannot unpersist before
    # the caller consumes it; bench.py clearCache()s between queries,
    # and long-lived sessions should clearCache() after consumption.
    st = (
        ex.groupBy(group_col, "tok")
        .agg(F.count(F.lit(1)).alias("c_st"))
        .persist()
    )
    tot_t = st.groupBy("tok").agg(F.sum("c_st").alias("c_t"))
    tot_g = st.groupBy(group_col).agg(F.sum("c_st").alias("n_g"))
    n_all = st.agg(F.sum("c_st").alias("n"))
    p_g = F.col("c_st").cast("double") / F.col("n_g").cast("double")
    p = F.col("c_t").cast("double") / F.col("n").cast("double")
    terms = (
        st.join(tot_t, "tok")
        .join(F.broadcast(tot_g), group_col)
        .crossJoin(F.broadcast(n_all))
        .select(
            F.col(group_col),
            F.col("n_g"),
            F.col("tok"),
            (p_g * F.log(p_g / p)).alias("term"),
        )
    )
    folded = F.aggregate(
        F.sort_array(F.collect_list(F.struct("tok", "term"))),
        F.lit(0.0),
        lambda acc, x: acc + x["term"],
    )
    out = terms.groupBy(group_col).agg(
        F.min("n_g").cast("long").alias("n_tokens"),
        F.round(folded, 6).alias("kl"),
    )
    # |groups| result rows vs a |groups|x|vocab| cache: materialize the
    # tiny result eagerly and release st (caching.eagerly, r7 #6) —
    # the session-lived-cache note above predates this wrapper.
    return eagerly(out, st)


# --- BPE tokenizer induction (round 8) --------------------------------------
# bpe_pair_stats computes ITERATION-1 merge statistics; this is the
# full Sennrich et al. 2016 induction loop on the same distillation
# insight: pair counting and merging run over the DISTINCT word-
# frequency table (|vocab| << corpus), so the corpus-scale work is one
# distributed word-count agg and the iterative loop is vocab-bounded
# driver work — exactly how production tokenizer trainers consume a
# distributed word count.  The learned merge table is itself the
# registered, driver-checked artifact (bpe_learned_merges).

_BPE_MERGE_CACHE: dict[tuple, list] = {}
_WORD_FREQ_CACHE: dict[tuple, list] = {}


def collect_word_freq(
    docs: DataFrame, text_col: str = "text", vocab_max: int = 65536
) -> list[tuple[str, int]]:
    """Distributed distillation: lowercase [a-z]+ word frequencies
    (the bpe_pair_stats vocabulary), top ``vocab_max`` by (freq desc,
    word) — a deterministic bounded collect, the same discipline as
    quantizer training."""
    wf = (
        docs.select(
            F.explode(
                F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z]+"), 0)
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("f"))
        .orderBy(F.desc("f"), F.asc("word"))
        .limit(vocab_max)
    )
    return [(r.word, r.f) for r in wf.collect()]


def cached_word_freq(
    docs: DataFrame,
    text_col: str = "text",
    vocab_max: int = 65536,
    cache_key: tuple | None = None,
) -> list[tuple[str, int]]:
    """Memoized ``collect_word_freq``: the distilled word-frequency
    table is consumed by BOTH the merge learner (``bpe_merge_table``)
    and the fertility query's serving vocabulary — without this memo
    the second consumer re-pays the full corpus scan the first one
    just ran (ADVICE r8 #4)."""
    if cache_key is None:
        return collect_word_freq(docs, text_col, vocab_max)
    key = (cache_key, text_col, vocab_max)
    if key not in _WORD_FREQ_CACHE:
        _WORD_FREQ_CACHE[key] = collect_word_freq(docs, text_col, vocab_max)
    return _WORD_FREQ_CACHE[key]


def learn_bpe_merges(
    word_freq: list[tuple[str, int]], n_merges: int
) -> list[tuple[str, str, int]]:
    """Classic BPE merge learning over a word-frequency table: start
    from character symbols, repeatedly merge the adjacent symbol pair
    with the highest corpus-weighted count (ties broken by
    lexicographically smallest pair — the same ORDER BY n DESC, pair
    rule as the oracle-checked ``bpe_pair_stats`` ranking, so merge #1
    EQUALS that query's rank-1 pair, pytest-pinned).

    Returns [(left, right, support)] in merge order.  O(n_merges x
    |vocab| x word_len) — vocab-bounded driver work by design."""
    vocab: dict[tuple, int] = {}
    for w, f in word_freq:
        if len(w) >= 2:
            vocab[tuple(w)] = vocab.get(tuple(w), 0) + f
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        counts: dict[tuple, int] = {}
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), support = best
        merges.append((a, b, support))
        merged = a + b
        new_vocab: dict[tuple, int] = {}
        for syms, f in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            t = tuple(out)
            new_vocab[t] = new_vocab.get(t, 0) + f
        vocab = new_vocab
    return merges


def segment_word(word: str, merges: list[tuple[str, str, int]]) -> list[str]:
    """Apply learned merges to one word, in merge-priority order (the
    standard BPE inference rule: lowest-rank applicable merge first) —
    the pure function behind a broadcast word→pieces map."""
    rank = {(a, b): i for i, (a, b, _) in enumerate(merges)}
    syms = list(word)
    while len(syms) >= 2:
        best_i, best_r = -1, None
        for i in range(len(syms) - 1):
            r = rank.get((syms[i], syms[i + 1]))
            if r is not None and (best_r is None or r < best_r):
                best_i, best_r = i, r
        if best_r is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_merge_table(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 50,
    vocab_max: int = 65536,
    cache_key: tuple | None = None,
) -> list[tuple[str, str, int]]:
    """Memoized end-to-end induction (distill -> learn); the cache
    keeps bench repeats and downstream consumers from re-paying the
    corpus scan, same discipline as _BLOOM_CACHE."""
    key = (cache_key, text_col, n_merges, vocab_max)
    if cache_key is not None and key in _BPE_MERGE_CACHE:
        return _BPE_MERGE_CACHE[key]
    merges = learn_bpe_merges(
        cached_word_freq(docs, text_col, vocab_max, cache_key), n_merges
    )
    if cache_key is not None:
        _BPE_MERGE_CACHE[key] = merges
    return merges


def nb_quality_label(col: Column | str = "text") -> Column:
    """Distant-supervision label for the model-based quality filter:
    +1 when ALL four quality_rules pass, -1 when at least two fail,
    NULL (unlabeled) in between.  Deterministic boolean arithmetic
    only, so both engines label identically; NULL text yields NULL
    rule values and therefore a NULL label (excluded from training)."""
    rules = quality_rules(col)
    all_pass = (
        rules["pass_len"] & rules["pass_word"] & rules["pass_stop"]
        & rules["pass_distinct"]
    )
    n_fail = sum(
        (~r).cast("int") for r in rules.values()
    )
    return (
        F.when(all_pass, F.lit(1))
        .when(n_fail >= 2, F.lit(-1))
        .otherwise(F.lit(None).cast("int"))
    )


def _nb_train_freq(pre: DataFrame):
    """Shared naive-Bayes training pass: per-token (+/-)-class counts
    from the labeled slice of ``pre`` (columns label, toks) plus the
    three training scalars.  Returns (freq DF — PERSISTED, caller
    releases or lets the session own it; v, pos_total, neg_total)."""
    ex_lab = (
        pre.filter(F.col("label").isNotNull())
        .select("label", F.explode("toks").alias("tok"))
    )
    # persisted: the totals probe and the downstream weight consumer
    # both read it (session-lived by the unigram_logprob precedent;
    # bench.py clearCache()s between queries).
    freq = ex_lab.groupBy("tok").agg(
        F.sum(F.when(F.col("label") == 1, 1).otherwise(0)).alias("pc"),
        F.sum(F.when(F.col("label") == -1, 1).otherwise(0)).alias("nc"),
    ).persist()
    totals = freq.agg(
        F.count(F.lit(1)).alias("v"),
        F.sum("pc").alias("pt"),
        F.sum("nc").alias("nt"),
    ).collect()[0]  # bounded: one row of three scalars
    return freq, int(totals["v"] or 0), int(totals["pt"] or 0), int(totals["nt"] or 0)


def nb_quality_weight_map(
    docs: DataFrame, text_col: str = "text", vocab_max: int = 32_768
) -> tuple[list[tuple[str, int]], int]:
    """Train the naive-Bayes quality model and COLLECT it as a
    bounded literal table for map-only serving — the artifact a
    streaming ingest gate (``jobs.streaming_quality_gate``) embeds as
    a ``create_map`` so scoring needs no join, no shuffle, and no
    state.

    Weights are quantized to integer picounits BY THE ENGINE (the
    same ``round(w·1e12)`` expression the batch scorer applies), so a
    literal-map serve and the batch ``nb_quality_scores`` produce
    bit-identical sums — no Python ``math.log`` re-derivation to
    drift.  Vocabulary beyond ``vocab_max`` (collected in occurrence
    order: count desc, token asc — deterministic) folds into the OOV
    weight, changing the model only in its rarest tail; the cap
    bounds both the driver collect and the serving plan's literal
    size (same 10k–65k planner-health territory as
    unigram_logprob's literal path).

    Returns ([(token, quantized_weight)], quantized_oov_weight);
    ([], 0) when the corpus yields no labeled tokens.
    """
    pre = docs.select(
        nb_quality_label(text_col).alias("label"),
        tokens(text_col).alias("toks"),
    )
    freq, v, pt, nt = _nb_train_freq(pre)
    if v == 0:
        freq.unpersist()
        return [], 0
    pos_den = F.lit(float(pt + v))
    neg_den = F.lit(float(nt + v))
    wq = F.round(
        (
            F.log((F.col("pc") + F.lit(1.0)) / pos_den)
            - F.log((F.col("nc") + F.lit(1.0)) / neg_den)
        )
        * F.lit(1e12),
        0,
    ).cast("long")
    rows = (
        freq.select("tok", (F.col("pc") + F.col("nc")).alias("df"), wq.alias("wq"))
        .orderBy(F.desc("df"), F.asc("tok"))
        .limit(vocab_max)
        .collect()
    )
    oov_row = (
        freq.sparkSession.range(1)
        .select(
            F.round(
                (F.log(F.lit(1.0) / pos_den) - F.log(F.lit(1.0) / neg_den))
                * F.lit(1e12),
                0,
            )
            .cast("long")
            .alias("q")
        )
        .collect()[0]
    )
    freq.unpersist()
    return [(r["tok"], int(r["wq"])) for r in rows], int(oov_row["q"])


def nb_quality_scores(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Model-based quality scoring (the CCNet / fastText-classifier
    step of an LLM data pipeline, distilled to its distributable
    core): learn a naive-Bayes token weight table from heuristically
    labeled corpus extremes, then score EVERY document — including
    the unlabeled middle — by mean token log-likelihood-ratio.

    Training labels come from ``nb_quality_label`` (all-rules-pass →
    +1, ≥2-fails → -1); token weights are add-1-smoothed
    ``ln P(tok|+) − ln P(tok|−)``; unseen tokens get the smoothed OOV
    weight ``ln (neg_total+V)/(pos_total+V)``.  Cross-engine float
    determinism comes from the stats_exact_moments trick, NOT from
    order-preserving folds: each token weight is quantized to integer
    picounits (round(w·1e12) — exact in a double up to 2^53) and the
    per-doc total is an exact DECIMAL(38,0) SUM, summation-order-free
    by construction, so partial aggregation stays map-side combining.
    (The first cut used the unigram_logprob sort_array(collect_list)
    ordered re-fold; at 2M docs that list shuffle was 185 s — the
    quantized plain sum is ~6× faster and has no per-doc list to blow
    up on a million-token document.)

    100 TB shape: one map-only labeling pass fused into the token
    explode; the (token, class) count agg is partial+final with a
    vocabulary-sized result; the weight table joins back onto the
    token stream (broadcast below autoBroadcastJoinThreshold,
    Catalyst's call); the only doc-keyed shuffle is the final
    per-doc partial+final SUM.  For open-vocabulary web corpora, cap
    the weight table at the top-K tokens by document frequency and
    let the tail fall into the OOV weight (one F.when) — the score
    stays bounded and the broadcast stays small.

    Returns (id, n_tokens BIGINT, label INT nullable, nb_score
    DOUBLE); empty/NULL-text docs drop at the explode boundary.
    """
    # Label and token array are PRE-PROJECTED so the Generate passes
    # them through as attributes: putting `explode(tokens)` and the
    # regexp-heavy label expression in ONE select plans the label in
    # the Project ABOVE the Generate — re-evaluated once per exploded
    # TOKEN, not per doc (measured 73 s vs 6 s on 2M docs / 66M
    # tokens).  CollapseProject cannot merge through a Generate, so
    # this two-step shape is stable.
    pre = docs.select(
        F.col(id_col),
        nb_quality_label(text_col).alias("label"),
        tokens(text_col).alias("toks"),
    )
    return _nb_score_pre(pre, id_col)


def _nb_score_pre(pre: DataFrame, id_col: str) -> DataFrame:
    """Shared NB train-and-score body over a pre-projected (id, label,
    toks) frame — ``toks`` is the FEATURE array (plain tokens for
    ``nb_quality_scores``; tokens + hashed bigram features for
    ``nb_quality_scores_hashed_bigrams``).  Extracted verbatim so both
    variants plan identically; ``n_tokens`` counts features."""
    freq, v, pt, nt = _nb_train_freq(pre)
    if v == 0:
        # no labeled tokens (every doc in the unlabeled middle, or an
        # empty corpus): there is no model — emit NULL scores instead
        # of letting the zero denominators reach log()/division (ANSI
        # DIVIDE_BY_ZERO on one engine, NaN-cast divergence on the
        # other).  nb_quality_weight_map makes the same ([], 0) call.
        freq.unpersist()
        return pre.filter(F.size("toks") > 0).select(
            F.col(id_col),
            F.size("toks").cast("long").alias("n_tokens"),
            F.col("label"),
            F.lit(None).cast("double").alias("nb_score"),
        )
    pos_den = F.lit(float(pt + v))
    neg_den = F.lit(float(nt + v))

    weights = freq.select(
        "tok",
        (
            F.log((F.col("pc") + F.lit(1.0)) / pos_den)
            - F.log((F.col("nc") + F.lit(1.0)) / neg_den)
        ).alias("w"),
    )
    oov_w = F.log(F.lit(1.0) / pos_den) - F.log(F.lit(1.0) / neg_den)

    # Size-gated broadcast, decided from the ALREADY-PROBED vocab
    # count (no extra job): natural-language token frequencies are
    # zipfian, so a shuffle join on `tok` puts tens of millions of
    # stopword occurrences on single keys — broadcasting the
    # vocab-sized weight table keeps the token stream map-side and
    # skew-free.  Above the gate (≈100 MB of (string, double) rows)
    # fall back to the plain equi-join and let AQE's skew-join
    # splitting handle the hot keys.
    if v <= 2_000_000:
        weights = F.broadcast(weights)

    ex = pre.select(
        F.col(id_col),
        F.col("label"),
        F.explode("toks").alias("tok"),
    )
    scored = ex.join(weights, "tok", "left").withColumn(
        "wv", F.coalesce(F.col("w"), oov_w)
    )
    wq = (
        F.round(F.col("wv") * F.lit(1e12), 0).cast("long").cast("decimal(38,0)")
    )
    per_doc = scored.groupBy(id_col, "label").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(wq).alias("sq"),
    )
    return per_doc.select(
        F.col(id_col),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("label"),
        F.round(
            F.col("sq").cast("double") / F.col("n_tokens") / F.lit(1e12),
            6,
        ).alias("nb_score"),
    )


def kn_bigram_logprob(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    discount: float = 0.75,
) -> DataFrame:
    """Per-doc mean ln-probability under an interpolated KNESER-NEY
    bigram model — the next rung of the perplexity ladder above
    ``bigram_logprob`` (VERDICT r8 #5), and the smoothing the CCNet
    KenLM filter actually uses (modified KN, here the classic
    single-discount form at order 2):

        P(w2|w1) = max(c(w1 w2) − D, 0)/c(w1)
                   + D·N1+(w1·)/c(w1) · N1+(·w2)/T

    where N1+(w1·) is the count of distinct continuations of w1,
    N1+(·w2) the distinct contexts of w2, and T the number of distinct
    bigram TYPES — the continuation probability that makes KN score
    "glue words" (seen after many contexts) higher than corpus-
    frequent-but-context-bound words, which absolute interpolation
    cannot.  Token 0 scores ln(c(w0)/N) (the bigram_logprob rule).
    Every observed pair has c>=1, N1+>=1, so the argument stays
    positive even when c <= D — KN needs no extra floor.

    The corpus is tokenized three times (header pass, bigram-type agg,
    scoring join) instead of four, and only ONE token-scale shuffle
    agg remains: unigram counts are DERIVED from the bigram-type table
    via the identity c(w) = Σ_w2 c(w,w2) + #docs-ending-in-w (the doc
    tails and the first-token scoring frame ride one explode-free
    header pass), so the unigram explode+agg disappears.  The
    distinct-continuation tables are re-aggs of the bigram-type table
    (vocab-scale, never a second corpus scan); T is a 1-row broadcast
    scalar.  Scoring is the bigram_logprob join shape plus two
    vocab-sized broadcast-gated joins; per-term picounit quantization
    + exact DECIMAL(38,0) sums keep both engines bit-identical.

    Returns (id, n_tokens BIGINT, avg_logprob DOUBLE)."""
    pre = docs.select(F.col(id_col), tokens(text_col).alias("_toks"))
    n_tok = F.size(F.col("_toks"))

    # corpus tokenize #1 (no explode, no shuffle): doc-scale header —
    # token count, first and last token (F.get is OOB-null-safe under
    # ANSI).  persisted: consumed by the unigram derivation, the
    # first-token scoring term, and the final n_tokens (session-lived,
    # bench clearCache()s — the established convention in this module).
    hdr = (
        pre.select(
            F.col(id_col),
            n_tok.alias("_n"),
            F.get("_toks", F.lit(0)).alias("_t1"),
            F.get("_toks", n_tok - 1).alias("_tl"),
        )
        .filter(F.col("_n") > 0)
        .persist()
    )

    pairs_gen = F.zip_with(
        F.slice(F.col("_toks"), 1, F.greatest(n_tok - 1, F.lit(0))),
        F.slice(F.col("_toks"), 2, F.greatest(n_tok - 1, F.lit(0))),
        lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
    )
    big_ex = pre.select(F.col(id_col), F.explode(pairs_gen).alias("bg")).select(
        F.col(id_col),
        F.col("bg.w1").alias("w1"),
        F.col("bg.w2").alias("w2"),
    )
    # persisted: four consumers (scoring join, both continuation
    # re-aggs, unigram derivation) — all vocab-scale.
    bcw = (
        big_ex.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cb")).persist()
    )
    fol = bcw.groupBy("w1").agg(F.count(F.lit(1)).alias("nf"))
    prec = bcw.groupBy("w2").agg(F.count(F.lit(1)).alias("np"))
    tt = bcw.agg(F.count(F.lit(1)).alias("t_types"))

    # unigram counts DERIVED, not re-scanned: every token occurrence
    # is the w1 of exactly one bigram except each doc's last token.
    uni = (
        bcw.select(F.col("w1").alias("tok"), F.col("cb").alias("c"))
        .unionByName(
            hdr.groupBy(F.col("_tl").alias("tok")).agg(
                F.count(F.lit(1)).alias("c")
            )
        )
        .groupBy("tok")
        .agg(F.sum("c").alias("c"))
        .persist()
    )
    totals = uni.agg(
        F.count(F.lit(1)).alias("v"), F.sum("c").alias("n")
    ).collect()[0]
    v = int(totals["v"] or 0)
    n_total = F.lit(float(totals["n"] or 0))

    u = uni
    if v <= 2_000_000:  # the nb_quality_scores zipfian broadcast gate
        u = F.broadcast(uni)
        fol = F.broadcast(fol)
        prec = F.broadcast(prec)

    def quant(col):
        return F.round(col * F.lit(1e12), 0).cast("long").cast("decimal(38,0)")

    f_terms = (
        hdr.select(F.col(id_col), F.col("_t1").alias("tok"))
        .join(u, "tok")
        .select(
            F.col(id_col),
            quant(F.log(F.col("c").cast("double") / n_total)).alias("q"),
        )
    )
    d = F.lit(discount)
    b_terms = (
        big_ex.join(bcw, ["w1", "w2"])
        .join(u.select(F.col("tok").alias("w1"), F.col("c").alias("c1")), "w1")
        .join(fol, "w1")
        .join(prec, "w2")
        .crossJoin(F.broadcast(tt))
        .select(
            F.col(id_col),
            quant(
                F.log(
                    F.greatest(
                        F.col("cb").cast("double") - d, F.lit(0.0)
                    )
                    / F.col("c1")
                    + d
                    * (F.col("nf").cast("double") / F.col("c1"))
                    * (F.col("np").cast("double") / F.col("t_types"))
                )
            ).alias("q"),
        )
    )
    per_doc = (
        f_terms.unionByName(b_terms)
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_tokens"), F.sum("q").alias("sq"))
    )
    return per_doc.select(
        F.col(id_col),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round(
            F.col("sq").cast("double") / F.col("n_tokens") / F.lit(1e12), 6
        ).alias("avg_logprob"),
    )


def kn_trigram_logprob(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    discount: float = 0.75,
) -> DataFrame:
    """Per-doc mean ln-probability under an interpolated KNESER-NEY
    TRIGRAM model — the rung above ``kn_bigram_logprob`` toward the
    CCNet 5-gram KenLM filter.  Chen & Goodman's interpolated KN with
    a single discount D at every order; crucially the MIDDLE order
    uses CONTINUATION counts, not raw counts:

        P(w3|w1 w2) = max(c(w1w2w3) − D, 0)/c(w1w2)
                      + D·N1+(w1w2·)/c(w1w2) · Pmid(w3|w2)
        Pmid(w3|w2) = max(N1+(·w2w3) − D, 0)/N1+(·w2·)
                      + D·N1+L(w2)/N1+(·w2·) · N1+(·w3)/T

    where N1+(·w2w3) counts distinct left contexts of the bigram,
    N1+(·w2·) distinct (w1,w3) trigram frames around w2, N1+L(w2)
    distinct w3 with any (·,w2,w3) trigram, N1+(·w3)/T the same
    lowest-order continuation distribution the bigram model bottoms
    out in.  Token 1 scores ln(c/N), token 2 the order-2 KN formula —
    so a 2-token doc scores identically to ``kn_bigram_logprob``.
    Every scored n-gram was observed, so every argument is strictly
    positive (the interpolation term has N1+ ≥ 1 throughout) — no
    floors needed.

    100 TB shape: the corpus is tokenized three times (explode-free
    header pass, trigram-type agg, scoring join) instead of six, and
    only ONE token-scale shuffle agg remains (the trigram explode):
    the bigram token counts are DERIVED via the identity c(w1,w2) =
    Σ_w3 c(w1,w2,w3) + #docs-ending-in-(w1,w2), and the unigram
    counts via c(w) = Σ_w2 c(w,w2) + #docs-ending-in-w — the doc
    tails, first/second tokens and the last pair all ride the header
    pass, so the separate unigram AND bigram explodes disappear.
    Every other model table is a re-agg of the trigram/bigram TYPE
    tables (type-scale, never a second corpus scan), and the model
    joins themselves run at TYPE scale — one quantized score per
    observed trigram type, attached to the token stream by a SINGLE
    occurrence-scale join (round 18; previously the occurrence frame
    flowed through three shuffled joins).  Single-word-keyed tables
    (fol/prec/mid/lam) broadcast below the 2M-vocab gate; the
    remaining pair/triple-keyed joins are type-scale and stay
    unhinted so AQE splits the zipfian skew.  Per-term picounit
    quantization + DECIMAL(38,0) sums keep both engines
    bit-identical.

    Returns (id, n_tokens BIGINT, avg_logprob DOUBLE)."""
    pre = docs.select(F.col(id_col), tokens(text_col).alias("_toks"))
    n_tok = F.size(F.col("_toks"))

    # corpus tokenize #1 (no explode): doc-scale header.  persisted:
    # consumed by the bigram/unigram derivations and three scoring
    # terms (session-lived, bench clearCache()s).
    hdr = (
        pre.select(
            F.col(id_col),
            n_tok.alias("_n"),
            F.get("_toks", F.lit(0)).alias("_t1"),
            F.get("_toks", F.lit(1)).alias("_t2"),
            F.get("_toks", n_tok - 2).alias("_tp1"),
            F.get("_toks", n_tok - 1).alias("_tl"),
        )
        .filter(F.col("_n") > 0)
        .persist()
    )

    m3 = F.greatest(n_tok - 2, F.lit(0))
    tri_gen = F.zip_with(
        F.zip_with(
            F.slice(F.col("_toks"), 1, m3),
            F.slice(F.col("_toks"), 2, m3),
            lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
        ),
        F.slice(F.col("_toks"), 3, m3),
        lambda p, z: F.struct(
            p["w1"].alias("w1"), p["w2"].alias("w2"), z.alias("w3")
        ),
    )
    tri_ex = pre.select(F.col(id_col), F.explode(tri_gen).alias("tg")).select(
        F.col(id_col),
        F.col("tg.w1").alias("w1"),
        F.col("tg.w2").alias("w2"),
        F.col("tg.w3").alias("w3"),
    )
    # persisted: five consumers (scoring join + nf3/ctx re-aggs + the
    # bigram derivation, and ctx itself re-aggs once more) — all
    # type-scale.
    tcw = (
        tri_ex.groupBy("w1", "w2", "w3")
        .agg(F.count(F.lit(1)).alias("ct"))
        .persist()
    )
    # bigram token counts DERIVED: every bigram occurrence is the
    # (w1,w2) prefix of exactly one trigram except each doc's LAST
    # pair (docs with exactly 2 tokens contribute only the tail row).
    bcw = (
        tcw.select(F.col("w1"), F.col("w2"), F.col("ct").alias("cb"))
        .unionByName(
            hdr.filter(F.col("_n") >= 2)
            .groupBy(F.col("_tp1").alias("w1"), F.col("_tl").alias("w2"))
            .agg(F.count(F.lit(1)).alias("cb"))
        )
        .groupBy("w1", "w2")
        .agg(F.sum("cb").alias("cb"))
        .persist()
    )
    fol = bcw.groupBy("w1").agg(F.count(F.lit(1)).alias("nf"))
    prec = bcw.groupBy("w2").agg(F.count(F.lit(1)).alias("np"))
    tt = bcw.agg(F.count(F.lit(1)).alias("t_types"))

    # unigram counts DERIVED from the bigram table + doc tails.
    uni = (
        bcw.select(F.col("w1").alias("tok"), F.col("cb").alias("c"))
        .unionByName(
            hdr.groupBy(F.col("_tl").alias("tok")).agg(
                F.count(F.lit(1)).alias("c")
            )
        )
        .groupBy("tok")
        .agg(F.sum("c").alias("c"))
        .persist()
    )
    totals = uni.agg(
        F.count(F.lit(1)).alias("v"), F.sum("c").alias("n")
    ).collect()[0]
    v = int(totals["v"] or 0)
    n_total = F.lit(float(totals["n"] or 0))
    nf3 = tcw.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("nf3"))
    # distinct triples ⇒ per-(w2,w3) row count IS the distinct-w1 count
    ctx = tcw.groupBy("w2", "w3").agg(F.count(F.lit(1)).alias("cctx")).persist()
    mid = tcw.groupBy("w2").agg(F.count(F.lit(1)).alias("cmid"))
    lam = ctx.groupBy("w2").agg(F.count(F.lit(1)).alias("clam"))

    u = uni
    if v <= 2_000_000:  # the nb_quality_scores zipfian broadcast gate
        u = F.broadcast(uni)
        fol = F.broadcast(fol)
        prec = F.broadcast(prec)
        mid = F.broadcast(mid)
        lam = F.broadcast(lam)

    def quant(col):
        return F.round(col * F.lit(1e12), 0).cast("long").cast("decimal(38,0)")

    d = F.lit(discount)

    f_terms = (
        hdr.select(F.col(id_col), F.col("_t1").alias("tok"))
        .join(u, "tok")
        .select(
            F.col(id_col),
            quant(F.log(F.col("c").cast("double") / n_total)).alias("q"),
        )
    )
    # token 2 only: the order-2 KN formula over the doc's FIRST pair
    second = hdr.filter(F.col("_n") >= 2).select(
        F.col(id_col),
        F.col("_t1").alias("w1"),
        F.col("_t2").alias("w2"),
    )
    s_terms = (
        second.join(bcw, ["w1", "w2"])
        .join(u.select(F.col("tok").alias("w1"), F.col("c").alias("c1")), "w1")
        .join(fol, "w1")
        .join(prec, "w2")
        .crossJoin(F.broadcast(tt))
        .select(
            F.col(id_col),
            quant(
                F.log(
                    F.greatest(F.col("cb").cast("double") - d, F.lit(0.0))
                    / F.col("c1")
                    + d
                    * (F.col("nf").cast("double") / F.col("c1"))
                    * (F.col("np").cast("double") / F.col("t_types"))
                )
            ).alias("q"),
        )
    )
    # TYPE-scale score pre-join (round 18, guide §2.4): the occurrence-
    # scale token stream previously flowed through THREE shuffled joins
    # (keys (w1,w2,w3) → tcw, (w1,w2) → bcw+nf3, (w2,w3) → ctx) — three
    # full-corpus exchanges of (id, w1, w2, w3).  Every model table is
    # a pure function of the trigram TYPE, so the joins move to TYPE
    # scale: one quantized score per observed trigram type, then ONE
    # occurrence-scale join attaches it.  The float expression tree is
    # unchanged, evaluated on the same double inputs in the same order
    # — per-type q is bit-identical to the per-occurrence computation
    # it replaces.  At sf0.1 the model tables auto-broadcast so the
    # local plan is shape-equivalent (interleaved A/B flat, pairwise
    # mean 0.99); ABOVE the broadcast threshold the committed
    # no-auto-broadcast plan pair shows the occurrence-stream
    # exchanges in the scoring chain drop 3 → 1
    # (plans/r18/text_trigram_logprob_kn_f7_noautobc_{before,after}.txt).
    _score_expr = quant(
        F.log(
            F.greatest(F.col("ct").cast("double") - d, F.lit(0.0))
            / F.col("c12")
            + (d * F.col("nf3") / F.col("c12"))
            * (
                F.greatest(F.col("cctx").cast("double") - d, F.lit(0.0))
                / F.col("cmid")
                + (d * F.col("clam") / F.col("cmid"))
                * (F.col("np").cast("double") / F.col("t_types"))
            )
        )
    ).alias("q")
    type_q = (
        tcw.join(
            bcw.select(F.col("w1"), F.col("w2"), F.col("cb").alias("c12")),
            ["w1", "w2"],
        )
        .join(nf3, ["w1", "w2"])
        .join(ctx, ["w2", "w3"])
        .join(mid, "w2")
        .join(lam, "w2")
        .join(prec.select(F.col("w2").alias("w3"), "np"), "w3")
        .crossJoin(F.broadcast(tt))
        .select("w1", "w2", "w3", _score_expr)
    )
    t_terms = tri_ex.join(type_q, ["w1", "w2", "w3"]).select(
        F.col(id_col), F.col("q")
    )
    per_doc = (
        f_terms.unionByName(s_terms)
        .unionByName(t_terms)
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_tokens"), F.sum("q").alias("sq"))
    )
    return per_doc.select(
        F.col(id_col),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round(
            F.col("sq").cast("double") / F.col("n_tokens") / F.lit(1e12), 6
        ).alias("avg_logprob"),
    )


def nb_feature_array(
    text_col: str = "text", n_buckets: int = 1 << 20
) -> Column:
    """fastText-style feature array: the unigram tokens PLUS one
    hashed-bigram feature per adjacent pair — ``b#<md5int64(w1·w2) %
    n_buckets>``.  Bucketing bounds the feature vocabulary the way
    fastText's ``-bucket`` table does (collisions fold rare bigrams
    together; the model tolerates it), and the hash is the repo's
    cross-engine md5int64 so a DuckDB oracle reproduces every bucket
    id bit-for-bit (`fast_hash64` is the production swap).  The
    bigram stream is built array-side (zip_with over two slices) so
    it rides the SAME pre-projected select as the tokens — nothing
    re-evaluates above a Generate."""
    toks = tokens(text_col)
    n = F.size(toks)
    m = F.greatest(n - F.lit(1), F.lit(0))
    bigrams = F.zip_with(
        F.slice(toks, 1, m),
        F.slice(toks, 2, m),
        lambda a, b: F.concat(
            F.lit("b#"),
            (
                md5int64(F.concat(a, F.lit(" "), b)) % F.lit(n_buckets)
            ).cast("string"),
        ),
    )
    return F.concat(toks, bigrams)


def nb_quality_scores_hashed_bigrams(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1 << 20,
) -> DataFrame:
    """``nb_quality_scores`` with fastText-fidelity features (VERDICT
    r8 #4): unigrams + hashed bigram buckets.  Word n-grams are what
    let the CCNet/fastText classifier catch fluent-looking spam with
    anomalous COLLOCATIONS — two docs with identical token multisets
    (identical unigram NB scores by construction) separate as soon as
    their adjacent pairs differ (property-pinned).  Same training
    (add-1 smoothed per-feature class counts from the distant
    labels), same picounit-quantized DECIMAL sums, same broadcast
    gate — only the feature array changes, so the 100 TB shape is
    unchanged: the feature stream is < 2x the token stream and the
    weight table is capped by n_buckets + |vocab|.

    Returns (id, n_features BIGINT, label INT nullable, nb_score
    DOUBLE)."""
    pre = docs.select(
        F.col(id_col),
        nb_quality_label(text_col).alias("label"),
        nb_feature_array(text_col, n_buckets).alias("toks"),
    )
    return _nb_score_pre(pre, id_col).withColumnRenamed(
        "n_tokens", "n_features"
    )


def bigram_logprob(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lam: float = 0.75,
) -> DataFrame:
    """Per-doc mean ln-probability under an INTERPOLATED BIGRAM model
    — the fidelity step above ``unigram_logprob`` on the CCNet/KenLM
    perplexity-filter ladder: token 0 scores ln(c(w0)/N); token i>0
    scores ln(λ·c(w_{i-1}w_i)/c(w_{i-1}) + (1−λ)·c(w_i)/N).  The
    unigram interpolation floor keeps every observed token's term
    finite without smoothing (the corpus scores itself, so there is
    no OOV); c(w_{i-1}) is the plain unigram count (the standard
    scoring approximation — contexts at doc boundaries make this an
    un-normalized score, which is fine for a FILTER).

    Cross-engine determinism: per-term picounit quantization + exact
    DECIMAL(38,0) sums (the nb_quality_scores discipline) — plain
    partial+final agg, no ordered fold, no per-doc list.

    100 TB shape: unigram agg (vocab-sized, broadcast-gated back onto
    the streams), bigram agg (bigram-vocab-sized — the big side; its
    join back onto the pair stream is an unhinted equi-join, AQE
    splits the zipfian hot contexts), one doc-keyed partial+final
    SUM.  Tokenization and the pair zip are attributes below their
    Generates (the round-8 Generate discipline).

    Returns (id, n_tokens BIGINT, avg_logprob DOUBLE); empty/NULL
    docs drop at the boundary.
    """
    pre = docs.select(F.col(id_col), tokens(text_col).alias("_toks"))
    n_tok = F.size(F.col("_toks"))

    uni_ex = pre.select(F.explode("_toks").alias("tok"))
    # persisted: the N probe and both scoring joins read it
    # (session-lived by the unigram_logprob precedent).
    uni = uni_ex.groupBy("tok").agg(F.count(F.lit(1)).alias("c")).persist()
    totals = uni.agg(F.count(F.lit(1)).alias("v"), F.sum("c").alias("n")).collect()[0]
    v = int(totals["v"] or 0)
    n_total = F.lit(float(totals["n"] or 0))

    pairs_gen = F.zip_with(
        F.slice(F.col("_toks"), 1, F.greatest(n_tok - 1, F.lit(0))),
        F.slice(F.col("_toks"), 2, F.greatest(n_tok - 1, F.lit(0))),
        lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
    )
    big_ex = pre.select(
        F.col(id_col), F.explode(pairs_gen).alias("bg")
    ).select(
        F.col(id_col),
        F.col("bg.w1").alias("w1"),
        F.col("bg.w2").alias("w2"),
        F.concat("bg.w1", F.lit(" "), "bg.w2").alias("g"),
    )
    # NOT persisted: the bigram table has exactly one consumer (the
    # scoring join) — unlike `uni`, which feeds the N probe plus two
    # joins.
    bc = big_ex.groupBy("g").agg(F.count(F.lit(1)).alias("cb"))

    u = uni
    if v <= 2_000_000:  # same zipfian-key broadcast gate as nb_quality_scores
        u = F.broadcast(uni)

    def quant(col):
        return F.round(col * F.lit(1e12), 0).cast("long").cast("decimal(38,0)")

    first = pre.filter(n_tok > 0).select(
        F.col(id_col), F.element_at("_toks", 1).alias("tok")
    )
    f_terms = first.join(u, "tok").select(
        F.col(id_col),
        quant(F.log(F.col("c").cast("double") / n_total)).alias("q"),
    )
    b_terms = (
        big_ex.join(bc, "g")
        .join(u.select(F.col("tok").alias("w1"), F.col("c").alias("c1")), "w1")
        .join(u.select(F.col("tok").alias("w2"), F.col("c").alias("c2")), "w2")
        .select(
            F.col(id_col),
            quant(
                F.log(
                    F.lit(lam) * (F.col("cb").cast("double") / F.col("c1"))
                    + F.lit(1.0 - lam) * (F.col("c2").cast("double") / n_total)
                )
            ).alias("q"),
        )
    )
    per_doc = (
        f_terms.unionByName(b_terms)
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_tokens"), F.sum("q").alias("sq"))
    )
    return per_doc.select(
        F.col(id_col),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round(
            F.col("sq").cast("double") / F.col("n_tokens") / F.lit(1e12), 6
        ).alias("avg_logprob"),
    )


def bm25_scores(
    docs: DataFrame,
    query_terms: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 lexical retrieval scoring (Robertson/Spärck Jones) — the
    full-text-search ranking function the engine's retrieval pillar is
    built on (reference has no search surface; this is the [ext]
    keyword-retrieval counterpart to the ANN stack's vector side).

    ``query_terms`` is a tiny (query_id, term) frame — the query
    workload — broadcast onto the corpus term stream.  Per (query,
    doc): score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)),
    idf = ln(1 + (N − df + ½)/(df + ½)) (the Lucene non-negative
    variant).

    Scale shape: the exploded token stream is filtered to the QUERY
    TERMS (broadcast semi-join) BEFORE any shuffle, so tf and df aggs
    carry posting-list rows only — per-query cost is O(Σ df(term)),
    never corpus-wide.  Doc length is map-only ``regexp_count`` on the
    original scan (no explode, no shuffle); the corpus-level (N, Σdl)
    scalars ride a 1-row broadcast cross join; df (≤ |query terms|
    rows) broadcasts back onto tf.  The only corpus-keyed shuffle is
    the doc-id join of posting-bounded tf against the map-side dl
    frame (unhinted — AQE broadcasts whichever side measures small).
    Cross-engine determinism: each (query, doc, term) contribution is
    one double expression quantized to integer picounits, and the
    per-doc score is the order-free SUM of those int64s (the
    quantized-sum discipline every LM/NB query uses); ``score_q12``
    is exposed so callers rank by the exact integer, never a rounded
    double.

    Returns (query_id, doc_id, score_q12 BIGINT, score DOUBLE).
    """
    base = docs.filter(F.col(text_col).isNotNull())
    qex = base.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("term")
    ).join(F.broadcast(query_terms.select("term").distinct()), "term")
    tf = qex.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    # df derives from tf — its rows are (doc, term)-unique, so the
    # per-term row count IS the document frequency; a second agg over
    # the unmaterialized qex would re-run the corpus scan + explode
    # (review finding, round 11)
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # docs with zero tokens contribute nothing and are excluded from
    # N/avgdl (they have no posting rows — the ex-derived convention)
    dl = base.select(
        F.col(id_col), token_count(text_col).cast("long").alias("dl")
    ).filter(F.col("dl") > 0)
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    return _bm25_score_parts(tf, dl, dfreq, stats, query_terms, id_col, k1, b)


def _bm25_score_parts(
    tf: DataFrame,
    dl: DataFrame,
    dfreq: DataFrame,
    stats: DataFrame,
    query_terms: DataFrame,
    id_col: str,
    k1: float,
    b: float,
) -> DataFrame:
    """The BM25 scoring core over its four index parts — shared by the
    from-corpus path (``bm25_scores``) and the from-stored-index path
    (``bm25_from_index``), so a maintained index provably scores with
    the identical expression tree.  ``tf``: (id, term, tf);
    ``dl``: (id, dl); ``dfreq``: (term, df); ``stats``: 1 row
    (n_docs, sum_dl)."""
    contrib = (
        tf.join(F.broadcast(query_terms), "term")
        .join(F.broadcast(dfreq), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
    )
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs").cast("double") - F.col("df") + F.lit(0.5))
        / (F.col("df").cast("double") + F.lit(0.5))
    )
    tf_d = F.col("tf").cast("double")
    c = idf * tf_d * F.lit(k1 + 1.0) / (
        tf_d
        + F.lit(k1)
        * (F.lit(1.0 - b) + F.lit(b) * F.col("dl").cast("double") / avgdl)
    )
    return (
        contrib.select(
            "query_id",
            F.col(id_col),
            F.round(c * F.lit(1e12)).cast("long").alias("cq"),
        )
        .groupBy("query_id", id_col)
        .agg(F.sum("cq").alias("score_q12"))
        .select(
            "query_id",
            id_col,
            "score_q12",
            F.round(F.col("score_q12").cast("double") / F.lit(1e12), 6).alias(
                "score"
            ),
        )
    )


def _posting_key(id_col: str):
    """The posting row key: term||':'||doc id — ONE definition shared
    by write/ingest/compact so the key can never silently diverge."""
    return F.concat(F.col("term"), F.lit(":"), F.col(id_col).cast("string")).alias(
        "pkey"
    )


def _bm25_index_parts(
    docs: DataFrame, id_col: str, text_col: str
) -> tuple[DataFrame, DataFrame]:
    """(postings, doc lengths) for a doc batch — the single source of
    the index-build arithmetic (write and ingest previously carried
    verbatim copies; review finding, round 11)."""
    base = docs.filter(F.col(text_col).isNotNull())
    postings = (
        base.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .select(_posting_key(id_col), "term", id_col, "tf")
    )
    dl = base.select(
        F.col(id_col), token_count(text_col).cast("long").alias("dl")
    ).filter(F.col("dl") > 0)
    return postings, dl


def bm25_index_write(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 16,
) -> None:
    """Materialize the BM25 index as TWO keyed tables under ``path`` —
    the search-index-maintenance shape (Lucene segment merge /
    Elasticsearch reindex, done as lake tables):

      * ``<path>/postings`` — (pkey, term, doc id, tf), one row per
        posting, keyed on ``pkey = term||':'||id`` so an incremental
        batch MERGEs bucket-pruned (``layout.merge_upsert``: re-adding
        a changed doc REPLACES its postings for unchanged terms and
        inserts new ones).
      * ``<path>/doclen`` — (id, dl), keyed on the doc id.

    df and the (N, Σdl) scalars are NOT stored: they are one
    partial-aggregable pass over the stored tables at query time
    (storing them would make every ingest a read-modify-write of
    global state; deriving them keeps ingest append/merge-only —
    the same reasoning as the mergeable-sketch rollups).  Query with
    ``bm25_from_index``; scores are identical to ``bm25_scores`` on
    the same logical corpus (pytest-pinned) because both feed the
    same ``_bm25_score_parts`` core."""
    from fiware_cosmos_orion_flink_connector_examples_spark.sources import layout

    postings, dl = _bm25_index_parts(docs, id_col, text_col)
    # postings are keyed on term:doc for MERGE but QUERIED by term —
    # term-sorted row groups make the per-query lookup row-group-
    # skippable instead of a full postings scan (round 12)
    layout.write_keyed(
        postings, f"{path.rstrip('/')}/postings", "pkey", n_buckets,
        sort_within="term",
    )
    layout.write_keyed(dl, f"{path.rstrip('/')}/doclen", id_col, n_buckets)
    _write_docterms(docs, path, id_col, text_col, n_buckets)


def _docterms_parts(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-doc term listing: (id, terms array) — the doc-keyed sidecar
    that lets a changed-doc re-ingest find the terms the NEW text
    dropped, with a bucket-pruned read instead of a postings scan."""
    return (
        docs.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_set("term")).alias("terms"))
    )


def _write_docterms(docs, path, id_col, text_col, n_buckets):
    from fiware_cosmos_orion_flink_connector_examples_spark.sources import layout

    layout.write_keyed(
        _docterms_parts(docs, id_col, text_col),
        f"{path.rstrip('/')}/docterms",
        id_col,
        n_buckets,
    )


def _stale_posting_keys(spark, path: str, new_docs_terms: DataFrame, id_col: str):
    """(id, term) pairs present in the stored index for the batch's
    docs but ABSENT from their new text — the postings a changed-doc
    re-ingest must drop.  The old-term lookup reads ONLY the batch
    docs' hash buckets of the doc-keyed ``docterms`` table (manual
    bucket pruning off the sidecar's n_buckets), never the postings
    table.  Returns None for a pre-round-12 index with no docterms
    table (the documented append-only caveat applies there)."""
    import json

    from fiware_cosmos_orion_flink_connector_examples_spark.sources.layout import (
        _fs,
        _read_small,
        read_keyed,
    )

    base = f"{path.rstrip('/')}/docterms"
    jvm, fs = _fs(spark, base)
    if not fs.exists(jvm.org.apache.hadoop.fs.Path(f"{base}/_keyed_layout.json")):
        return None
    meta = json.loads(_read_small(spark, f"{base}/_keyed_layout.json"))
    nb = int(meta["n_buckets"])
    batch_ids = new_docs_terms.select(id_col).distinct()
    touched = [
        r["_b"]
        for r in batch_ids.select(
            F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(nb)).alias("_b")
        )
        .distinct()
        .collect()
    ]  # bounded by n_buckets — a layout constant
    old_terms = (
        read_keyed(spark, base)
        .filter(F.col("_bucket").isin(touched))
        .join(F.broadcast(batch_ids), id_col, "semi")
        .select(F.col(id_col), F.explode("terms").alias("term"))
    )
    new_pairs = new_docs_terms.select(
        F.col(id_col), F.explode("terms").alias("term")
    )
    return old_terms.join(new_pairs, [id_col, "term"], "left_anti")


def bm25_index_ingest(
    spark,
    new_docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Incremental index maintenance: MERGE a new/changed doc batch
    into a ``bm25_index_write`` index — only the hash buckets holding
    the batch's postings/doc-lengths are rewritten (the merge_upsert
    copy-on-write contract).

    CHANGED-doc correctness (round 12): a re-ingested doc's new text
    may have DROPPED terms, whose (term, doc) posting rows would
    otherwise survive as ghosts.  The per-doc ``docterms`` listing
    (doc-keyed → its read prunes to the batch docs' buckets) yields
    those stale keys, which ride the SAME merge as tf=0 SOFT-DELETE
    rows — readers filter ``tf > 0`` (one shared read path), and
    ``bm25_index_compact`` rewrites them away physically (the Lucene
    delete-then-merge lifecycle).  A pre-round-12 index without a
    docterms table keeps the old append-only behavior, stated not
    hidden."""
    from fiware_cosmos_orion_flink_connector_examples_spark.sources import layout

    postings, dl = _bm25_index_parts(new_docs, id_col, text_col)
    new_terms = _docterms_parts(new_docs, id_col, text_col)
    stale = _stale_posting_keys(spark, path, new_terms, id_col)
    if stale is not None:
        soft_deletes = stale.select(
            _posting_key(id_col), "term", id_col, F.lit(0).cast("long").alias("tf")
        )
        postings = postings.unionByName(soft_deletes)
    layout.merge_upsert(spark, f"{path.rstrip('/')}/postings", postings, "pkey")
    layout.merge_upsert(spark, f"{path.rstrip('/')}/doclen", dl, id_col)
    if stale is not None:
        layout.merge_upsert(spark, f"{path.rstrip('/')}/docterms", new_terms, id_col)


def bm25_from_index(
    spark,
    path: str,
    query_terms: DataFrame,
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    root_version: int | None = None,
) -> DataFrame:
    """Score queries against a stored ``bm25_index_write`` index: df
    and the corpus scalars are re-derived in one partial-aggregable
    pass over the stored tables (posting rows for df are pre-filtered
    to the query terms — the bm25_scores posting-bounded discipline
    does not apply to df here because df needs the STORED per-term
    postings anyway, which is exactly what the term-keyed bucket
    layout prunes to), then the shared scoring core runs unchanged.
    ``root_version`` (versioned indexes only) serves the index exactly
    as it stood at that root commit — cross-table time travel."""
    postings, dl = _bm25_index_tables(spark, path, id_col, root_version)
    qt = F.broadcast(query_terms.select("term").distinct())
    tf = postings.join(qt, "term").select(id_col, "term", "tf")
    # postings are (term, doc)-unique, so df = tf's per-term row count
    # — deriving it re-reads nothing (review finding, round 11)
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = dl.agg(F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl"))
    return _bm25_score_parts(tf, dl, dfreq, stats, query_terms, id_col, k1, b)


def _bm25_index_tables(spark, path: str, id_col: str, root_version: int | None = None):
    """Read the live view of a stored BM25 index: postings + doc
    lengths with tombstoned docs (bm25_index_delete) anti-joined out —
    the read-side half of log-structured deletes.  The tombstone set
    is deletion-sized; broadcast it.

    A VERSIONED index (``search_index_write``) is auto-detected by its
    root: every sub-table reads AT THE ROOT'S PINNED VERSION — one
    consistent cross-table snapshot, immune to concurrent ingests, no
    tombstones (versioned deletes are real merge deletes)."""
    from fiware_cosmos_orion_flink_connector_examples_spark.sources.layout import (
        read_keyed,
    )

    root = _index_root(spark, path)
    if root is not None:
        if root_version is not None:
            from fiware_cosmos_orion_flink_connector_examples_spark.sources import (
                layout,
            )

            root = layout.index_root_resolve(spark, path, root_version)
        postings = (
            _pinned_keyed_read(
                spark, f"{path.rstrip('/')}/postings", root["tables"]["postings"]
            )
            .drop("pkey")
            .filter(F.col("tf") > 0)
        )
        dl = _pinned_keyed_read(
            spark, f"{path.rstrip('/')}/doclen", root["tables"]["doclen"]
        )
        return postings, dl

    if root_version is not None:
        raise ValueError(
            "_bm25_index_tables: root_version is only meaningful for a "
            "versioned (search_index_write) index"
        )
    postings = (
        read_keyed(spark, f"{path.rstrip('/')}/postings")
        .drop("pkey", "_bucket")
        .filter(F.col("tf") > 0)  # tf=0 = changed-doc soft delete
    )
    dl = read_keyed(spark, f"{path.rstrip('/')}/doclen").drop("_bucket")
    jvm = spark._jvm
    t_dir = jvm.org.apache.hadoop.fs.Path(f"{path.rstrip('/')}/tombstones")
    fs = t_dir.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(t_dir):
        dead = F.broadcast(
            spark.read.parquet(f"{path.rstrip('/')}/tombstones").select(id_col)
        )
        postings = postings.join(dead, id_col, "left_anti")
        dl = dl.join(dead, id_col, "left_anti")
    return postings, dl


def bm25_query_model(
    spark,
    path: str,
    query_terms: DataFrame,
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> dict:
    """Distill a stored ``bm25_index_write`` index into the tiny
    serving artifact a STREAMING scorer needs: per-query-term df plus
    the (N, Σdl) corpus scalars — a handful of integers, refreshed
    out-of-band whenever the index is re-built/merged (the
    streaming_quality_gate model-artifact discipline).  Returns
    ``{"k1", "b", "n_docs", "sum_dl", "terms": [(term, df), ...]}``."""
    postings, dl = _bm25_index_tables(spark, path, id_col)
    qt = F.broadcast(query_terms.select("term").distinct())
    dfreq = (
        postings.join(qt, "term")
        .groupBy("term")
        .agg(F.countDistinct(id_col).alias("df"))
        .collect()
    )
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    ).first()
    return {
        "k1": k1,
        "b": b,
        "n_docs": int(stats["n_docs"]),
        "sum_dl": int(stats["sum_dl"] or 0),
        "terms": sorted((r["term"], int(r["df"])) for r in dfreq),
    }


def bm25_index_delete(
    spark,
    ids: DataFrame,
    path: str,
    id_col: str = "doc_id",
) -> None:
    """Tombstone deletion for a ``bm25_index_write`` index — the
    log-structured answer to the ingest caveat (postings are keyed
    (term, doc), so a changed/removed doc can't drop stale term rows
    in place): deleted doc ids MERGE into a third keyed table
    ``<path>/tombstones`` and ``bm25_from_index`` anti-joins them out
    of BOTH postings and doc lengths at query time.  Re-adding a
    previously deleted doc = ingest its postings AND delete its
    tombstone (compaction — rewriting postings minus tombstoned docs
    and clearing the table — is the same bucket-pruned merge_upsert
    machinery, run out-of-band)."""
    from fiware_cosmos_orion_flink_connector_examples_spark.sources import layout

    t_path = f"{path.rstrip('/')}/tombstones"
    rows = ids.select(F.col(id_col)).distinct()
    jvm = spark._jvm
    fs_p = jvm.org.apache.hadoop.fs.Path(t_path + "/_keyed_layout.json")
    fs = fs_p.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(fs_p):
        layout.merge_upsert(spark, t_path, rows, id_col)
    else:
        layout.write_keyed(rows, t_path, id_col, n_buckets=4)


def bm25_index_compact(
    spark,
    path: str,
    id_col: str = "doc_id",
    n_buckets: int | None = None,
) -> None:
    """Out-of-band compaction for a tombstoned BM25 index: rewrite
    postings and doc lengths WITHOUT tombstoned docs as fresh keyed
    tables, then drop the tombstone table — the log-structured
    merge/compact step that reclaims space and restores pure
    bucket-pruned reads (the read-side anti-join disappears until the
    next delete).  The rewrite goes to a sibling ``.compact.tmp``
    directory and swaps in with one rename per table, keeping every
    ``.{table}.old`` backup until BOTH tables are live (the
    merge_upsert deferred-cleanup discipline).  Crash recovery is
    built in: compaction starts by restoring any table caught inside
    a previous run's rename window (live dir missing, data in
    ``.{table}.old``), so "recover by re-running compaction" is a
    real contract, not a hope (review finding, round 11)."""
    import json

    from fiware_cosmos_orion_flink_connector_examples_spark.sources import layout
    from fiware_cosmos_orion_flink_connector_examples_spark.sources.layout import (
        _fs,
        _read_small,
    )

    base = path.rstrip("/")
    jvm, fs = _fs(spark, base)
    # recovery pass FIRST: a prior compact may have died between its
    # two renames, leaving {base}/{t} only at {base}/.{t}.old
    for t in ("postings", "doclen", "docterms"):
        cur = jvm.org.apache.hadoop.fs.Path(f"{base}/{t}")
        old = jvm.org.apache.hadoop.fs.Path(f"{base}/.{t}.old")
        if not fs.exists(cur) and fs.exists(old):
            if not fs.rename(old, cur):
                raise IOError(f"bm25_index_compact: recovery of {t} failed")
    if n_buckets is None:
        n_buckets = int(
            json.loads(
                _read_small(spark, f"{base}/postings/_keyed_layout.json").decode()
            )["n_buckets"]
        )
    postings, dl = _bm25_index_tables(spark, path, id_col)
    tmp = base + ".compact.tmp"
    layout.write_keyed(
        postings.select(_posting_key(id_col), "term", id_col, "tf"),
        f"{tmp}/postings",
        "pkey",
        n_buckets,
        sort_within="term",
    )
    layout.write_keyed(dl, f"{tmp}/doclen", id_col, n_buckets)
    tables = ["postings", "doclen"]
    dt_p = jvm.org.apache.hadoop.fs.Path(f"{base}/docterms")
    if fs.exists(dt_p) or fs.exists(
        jvm.org.apache.hadoop.fs.Path(f"{base}/.docterms.old")
    ):
        # rebuild the per-doc term listing from the LIVE (tf>0,
        # tombstone-free) postings so compaction also clears the
        # soft-delete bookkeeping
        docterms = (
            postings.groupBy(id_col)
            .agg(F.sort_array(F.collect_set("term")).alias("terms"))
        )
        layout.write_keyed(docterms, f"{tmp}/docterms", id_col, n_buckets)
        tables.append("docterms")
    swapped = []
    for t in tables:
        cur = jvm.org.apache.hadoop.fs.Path(f"{base}/{t}")
        old = jvm.org.apache.hadoop.fs.Path(f"{base}/.{t}.old")
        new = jvm.org.apache.hadoop.fs.Path(f"{tmp}/{t}")
        if fs.exists(old):
            fs.delete(old, True)  # stale backup from a CLEAN prior run
        if fs.exists(cur) and not fs.rename(cur, old):
            raise IOError(f"bm25_index_compact: rename {cur} -> {old} failed")
        if not fs.rename(new, cur):
            fs.rename(old, cur)
            raise IOError(f"bm25_index_compact: rename {new} -> {cur} failed")
        swapped.append(old)
    # cleanup only after BOTH tables are live — any crash above leaves
    # every pre-compact table recoverable by the pass at the top
    for old in swapped:
        fs.delete(old, True)
    fs.delete(jvm.org.apache.hadoop.fs.Path(f"{base}/tombstones"), True)
    fs.delete(jvm.org.apache.hadoop.fs.Path(tmp), True)


def _phrase_index_parts(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Positional postings for a doc batch: one row per (term, doc)
    holding the SORTED array of 0-based token positions — keyed on the
    same ``pkey = term||':'||id`` as the BM25 postings so the two
    indexes share one MERGE maintenance story (a changed doc's batch
    replaces its rows bucket-pruned)."""
    base = docs.filter(F.col(text_col).isNotNull())
    return (
        base.select(F.col(id_col), F.posexplode(tokens(text_col)).alias("pos", "term"))
        .groupBy(id_col, "term")
        .agg(F.sort_array(F.collect_list("pos")).alias("positions"))
        .select(_posting_key(id_col), "term", id_col, "positions")
    )


def phrase_index_write(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 16,
) -> None:
    """Materialize the POSITIONAL posting index at ``<path>/positions``
    — the stored-index variant ``phrase_match_topk``'s doc names
    (quoted-phrase search without rescanning the corpus), laid out
    exactly like the BM25 postings table (``layout.write_keyed`` on
    pkey) so it can live beside one at the same ``path`` and share its
    tombstone table.  Positions are the tokenizer's 0-based offsets;
    adjacency (p2 = p1 + 1) is all phrase matching needs, so the base
    never leaks into results.  Query with ``phrase_count_from_index``;
    maintain with ``phrase_index_ingest`` (same caveat as the BM25
    ingest: re-ingesting a CHANGED doc cannot drop a term the new
    text no longer contains — deletion needs the tombstone table or
    compaction)."""
    from fiware_cosmos_orion_flink_connector_examples_spark.sources import layout

    layout.write_keyed(
        _phrase_index_parts(docs, id_col, text_col),
        f"{path.rstrip('/')}/positions",
        "pkey",
        n_buckets,
        sort_within="term",
    )
    # per-doc term listing for changed-doc stale-key detection; when
    # co-located with a BM25 index at the same path the two writes
    # produce identical content (same tokenizer) — harmless overwrite
    _write_docterms(docs, path, id_col, text_col, n_buckets)


def phrase_index_ingest(
    spark,
    new_docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Incremental positional-index maintenance: MERGE a new/changed
    doc batch — only the hash buckets holding the batch's (term, doc)
    keys are rewritten (the merge_upsert copy-on-write contract), and
    a changed doc's position arrays REPLACE the old ones wholesale
    because the whole array is the row value (no partial-array merge
    to get wrong).  Terms the new text DROPPED ride the same merge as
    empty-array soft-delete rows (keys from the doc-keyed ``docterms``
    listing, bucket-pruned) — the reader filters them, compaction of a
    co-located BM25 index clears the shared bookkeeping."""
    from fiware_cosmos_orion_flink_connector_examples_spark.sources import layout

    parts = _phrase_index_parts(new_docs, id_col, text_col)
    new_terms = _docterms_parts(new_docs, id_col, text_col)
    stale = _stale_posting_keys(spark, path, new_terms, id_col)
    if stale is not None:
        empty = F.array().cast("array<int>")
        parts = parts.unionByName(
            stale.select(_posting_key(id_col), "term", id_col, empty.alias("positions"))
        )
    layout.merge_upsert(
        spark,
        f"{path.rstrip('/')}/positions",
        parts,
        "pkey",
    )
    if stale is not None:
        layout.merge_upsert(spark, f"{path.rstrip('/')}/docterms", new_terms, id_col)


def phrase_count_from_index(
    spark,
    path: str,
    phrase: list[str],
    id_col: str = "doc_id",
    root_version: int | None = None,
) -> DataFrame:
    """Exact phrase occurrence counts served from a stored
    ``phrase_index_write`` index: start from the first term's position
    arrays and FOLD the remaining terms in — at step i, keep only
    first-token positions p whose doc also has term_i at p+i
    (``F.filter`` + ``array_contains`` over the two arrays: row-local
    once the per-term rows are doc-joined).  Output: (id, n_occurrences
    > 0), row-identical to the row-local zip_with counter on the same
    corpus (pytest-pinned and driver-asserted via the served-equals
    envelope).

    Scale shape: the scan touches ONLY the phrase's terms' posting
    rows (term-filtered off the keyed table — Σ df(term_i) rows, never
    the corpus), then L-1 doc-keyed joins whose inputs shrink
    monotonically (each step filters to docs still matching the
    prefix).  Tombstones at ``<path>/tombstones`` (shared with a
    co-located BM25 index) are anti-joined out, deletion-sized and
    broadcast."""
    if not phrase:
        raise ValueError("phrase_count_from_index: empty phrase")
    from fiware_cosmos_orion_flink_connector_examples_spark.sources.layout import (
        _fs,
        read_keyed,
    )

    root = _index_root(spark, path)
    if root is not None:
        # versioned index: positions pinned to the root's consistent
        # cross-table snapshot; deletes are real, no tombstone pass.
        # root_version = CROSS-TABLE TIME TRAVEL: serve the index
        # exactly as it stood at that root commit.
        if root_version is not None:
            from fiware_cosmos_orion_flink_connector_examples_spark.sources import (
                layout,
            )

            root = layout.index_root_resolve(spark, path, root_version)
        tbl = (
            _pinned_keyed_read(
                spark, f"{path.rstrip('/')}/positions", root["tables"]["positions"]
            )
            .drop("pkey")
            .filter(F.size("positions") > 0)
        )
    elif root_version is not None:
        raise ValueError(
            "phrase_count_from_index: root_version is only meaningful for "
            "a versioned (search_index_write) index"
        )
    else:
        tbl = (
            read_keyed(spark, f"{path.rstrip('/')}/positions")
            .drop("pkey", "_bucket")
            .filter(F.size("positions") > 0)  # changed-doc soft deletes
        )

        jvm, fs = _fs(spark, path)
        t_dir = jvm.org.apache.hadoop.fs.Path(f"{path.rstrip('/')}/tombstones")
        if fs.exists(t_dir):
            dead = F.broadcast(
                spark.read.parquet(f"{path.rstrip('/')}/tombstones").select(id_col)
            )
            tbl = tbl.join(dead, id_col, "left_anti")
    cur = tbl.filter(F.col("term") == phrase[0]).select(
        F.col(id_col), F.col("positions").alias("ps")
    )
    for i, t in enumerate(phrase[1:], start=1):
        nxt = tbl.filter(F.col("term") == t).select(
            F.col(id_col), F.col("positions").alias("_p_next")
        )
        # NOTE the single-arg lambda: F.filter treats a two-parameter
        # function as (element, array_index) and would shadow the
        # phrase offset; the offset is baked in via F.lit(i) at
        # expression-construction time (HOF lambdas run eagerly)
        step = F.filter(
            F.col("ps"),
            lambda p: F.array_contains(F.col("_p_next"), p + F.lit(i)),
        )
        cur = (
            cur.join(nxt, id_col)
            .select(F.col(id_col), step.alias("ps"))
            .filter(F.size("ps") > 0)
        )
    return cur.select(F.col(id_col), F.size("ps").cast("long").alias("n_occurrences"))


# ---------------------------------------------------------------------------
# VERSIONED COMBINED SEARCH INDEX — snapshot sub-tables under ONE atomic root
#
# The round-13 gap: bm25_index_ingest/phrase_index_ingest update their
# tables with SEQUENTIAL merges, so a crash or concurrent reader between
# them sees postings scored against a stale doclen.  The versioned index
# stores every sub-table (postings, doclen, docterms, positions) as a
# snapshot table and publishes ONE index root per ingest
# (layout.index_root_commit): readers pin every sub-table to the root's
# recorded versions, a crash between sub-merges leaves only dangling
# unreferenced sub-versions, and re-running the ingest completes it
# (content-idempotent upserts + root txn watermark).  Deletions are REAL
# snapshot_merge deletes (no tombstone anti-join on the read path), time
# travel and CDC come free per sub-table, and a root version is a
# consistent cross-table snapshot.  Reference: n/a (the reference's only
# sink is HTTP, Example2.scala:42) — [ext] index-maintenance contract.


def _index_root(spark, path: str):
    """Resolved index root at ``path`` or None (plain directory index)."""
    from fiware_cosmos_orion_flink_connector_examples_spark.sources import layout

    v = layout.index_root_latest(spark, path)
    return layout.index_root_resolve(spark, path, v) if v else None


def _pinned_keyed_read(spark, table_path: str, version: int):
    """snapshot_read at a pinned version (schema from the manifest —
    no _bucket column leaks; returns an empty typed frame for an
    empty pinned file set)."""
    from fiware_cosmos_orion_flink_connector_examples_spark.sources import layout

    return layout.snapshot_read(spark, table_path, version=version)


def _pinned_docterms_pairs(spark, path: str, batch_ids, id_col: str, version: int):
    """(id, term) pairs stored for the batch's docs in the PINNED
    docterms version — two-phase read off the manifest's bucket map:
    an id-COLUMN-ONLY scan of the batch's hash buckets finds which
    buckets actually hold batch docs (columnar projection, no terms
    arrays read), then the full rows load from ONLY those buckets.  A
    pure-insert batch (no doc previously indexed) therefore never
    reads a terms array at all — the read that made a 20k-insert
    ingest cost a corpus scan in the round-14 smoke."""
    import json as _json

    from pyspark.sql.types import StructType

    from fiware_cosmos_orion_flink_connector_examples_spark.sources import layout

    base = f"{path.rstrip('/')}/docterms"
    resolved = layout.snapshot_manifest(spark, base, version)
    nb = int(resolved["keyed"]["n_buckets"])
    touched = {
        r["_b"]
        for r in batch_ids.select(
            F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(nb)).alias("_b")
        )
        .distinct()
        .collect()
    }  # bounded by n_buckets — a layout constant
    files = [f for f in resolved["files"] if resolved["buckets"].get(f) in touched]
    schema = StructType.fromJson(_json.loads(resolved["schema"]))
    if not files:
        return spark.createDataFrame([], schema).select(
            F.col(id_col), F.explode("terms").alias("term")
        )
    present = (
        layout.snapshot_read_files(spark, resolved, files, schema)
        .select(id_col)
        .join(F.broadcast(batch_ids), id_col, "semi")
        .select(
            F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(nb)).alias("_b")
        )
        .distinct()
        .collect()
    )
    matched_files = [
        f for f in files if resolved["buckets"].get(f) in {r["_b"] for r in present}
    ]
    old = layout.snapshot_read_files(spark, resolved, matched_files, schema)
    return (
        old.join(F.broadcast(batch_ids), id_col, "semi")
        .select(F.col(id_col), F.explode("terms").alias("term"))
    )


def search_index_write(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 16,
    phrase: bool = True,
) -> int:
    """Create a VERSIONED combined search index: BM25 postings + doc
    lengths + the docterms sidecar (+ positional postings when
    ``phrase``) as snapshot sub-tables, published under one atomic
    index root.  Serve with ``bm25_from_index`` /
    ``phrase_count_from_index`` (they auto-detect the root and pin
    every read); maintain with ``search_index_ingest`` /
    ``search_index_delete`` / ``search_index_compact``.  Scale shape:
    identical to the plain index (term-sorted bucket files, posting-
    bounded serves) plus O(1) root metadata per commit."""
    from fiware_cosmos_orion_flink_connector_examples_spark.sources import layout

    spark = docs.sparkSession
    base = path.rstrip("/")
    if layout.index_root_latest(spark, base) != 0:
        raise ValueError(f"search_index_write: {path} already has an index root")
    postings, dl = _bm25_index_parts(docs, id_col, text_col)
    tables = {
        "postings": layout.snapshot_write_keyed(
            spark, postings, f"{base}/postings", "pkey", n_buckets,
            sort_within="term",
        ),
        "doclen": layout.snapshot_write_keyed(
            spark, dl, f"{base}/doclen", id_col, n_buckets
        ),
        "docterms": layout.snapshot_write_keyed(
            spark,
            _docterms_parts(docs, id_col, text_col),
            f"{base}/docterms",
            id_col,
            n_buckets,
        ),
    }
    if phrase:
        tables["positions"] = layout.snapshot_write_keyed(
            spark,
            _phrase_index_parts(docs, id_col, text_col),
            f"{base}/positions",
            "pkey",
            n_buckets,
            sort_within="term",
        )
    return layout.index_root_commit(spark, base, tables)


def _search_index_apply(
    spark,
    path: str,
    upsert_docs: DataFrame | None,
    delete_ids: DataFrame | None,
    id_col: str,
    text_col: str,
    txn_app: str | None,
    txn_id: int | None,
    retries: int,
    caller: str,
) -> int:
    """The ONE read-merge-publish loop behind ingest/delete/sync: build
    every sub-table's merge batch (upserts with _del=False, dropped or
    deleted keys as REAL delete rows keyed off the PINNED docterms
    version, bucket-pruned), merge each sub-table, publish one root.
    ``upsert_docs`` and ``delete_ids`` must be key-disjoint (the sync
    resolves last-change-per-key before calling).  A foreign root
    landing mid-apply raises SnapshotVersionConflict → re-resolve,
    re-merge (content-idempotent), re-publish; a replayed txn id is a
    no-op; crash recovery = re-run (dangling sub-versions are merged
    over, only a root makes anything visible)."""
    from fiware_cosmos_orion_flink_connector_examples_spark.sources import layout

    base = path.rstrip("/")
    txn = {txn_app: int(txn_id)} if txn_app is not None else None
    empty_pos = F.array().cast("array<int>")
    empty_terms = F.array().cast("array<string>")
    new_pairs = None
    if upsert_docs is not None:
        # batch-sized frames, each consumed by SEVERAL merge jobs
        # (dup-check, touched-bucket resolve, data write, change log)
        # and by every conflict retry: materialize once instead of
        # re-tokenizing the batch per job — batches are micro-batch-
        # sized by contract, so the checkpoint is bounded
        postings_new, dl_new = _bm25_index_parts(upsert_docs, id_col, text_col)
        postings_new = postings_new.localCheckpoint(eager=True)
        dl_new = dl_new.localCheckpoint(eager=True)
        new_terms = _docterms_parts(upsert_docs, id_col, text_col).localCheckpoint(
            eager=True
        )
        new_pairs = new_terms.select(F.col(id_col), F.explode("terms").alias("term"))
        up_ids = new_terms.select(id_col)
    del_ids = delete_ids.select(id_col).distinct() if delete_ids is not None else None
    if upsert_docs is not None and del_ids is not None:
        all_ids = up_ids.unionByName(del_ids).distinct()
    elif upsert_docs is not None:
        all_ids = up_ids
    elif del_ids is not None:
        all_ids = del_ids
    else:
        raise ValueError(f"{caller}: nothing to apply")
    last_err = None
    for _ in range(retries):
        root = layout.index_root_resolve(spark, base)
        if txn is not None:
            wm = root["txn"].get(txn_app)
            if wm is not None and int(txn_id) <= wm:
                return root["version"]  # replayed batch: no-op
        # keys to DROP: every (id, term) stored for the touched docs
        # that the new text no longer carries (deleted docs carry none)
        drop = _pinned_docterms_pairs(
            spark, base, all_ids, id_col, root["tables"]["docterms"]
        )
        if new_pairs is not None:
            drop = drop.join(new_pairs, [id_col, "term"], "left_anti")
        # consumed by the postings AND positions merges (twice each):
        # batch-bounded by construction
        drop = drop.localCheckpoint(eager=True)
        drop_postings = drop.select(
            _posting_key(id_col), "term", F.col(id_col),
            F.lit(0).cast("long").alias("tf"), F.lit(True).alias("_del"),
        )
        tables = dict(root["tables"])
        p_upd = drop_postings
        if upsert_docs is not None:
            p_upd = postings_new.withColumn("_del", F.lit(False)).unionByName(
                drop_postings
            )
        tables["postings"] = layout.snapshot_merge(
            spark, f"{base}/postings", p_upd, "pkey", delete_col="_del"
        )
        dl_upd = None
        if upsert_docs is not None:
            dl_upd = dl_new.withColumn("_del", F.lit(False))
        if del_ids is not None:
            dl_del = del_ids.select(
                F.col(id_col), F.lit(0).cast("long").alias("dl"),
                F.lit(True).alias("_del"),
            )
            dl_upd = dl_del if dl_upd is None else dl_upd.unionByName(dl_del)
        tables["doclen"] = layout.snapshot_merge(
            spark, f"{base}/doclen", dl_upd, id_col, delete_col="_del"
        )
        if "positions" in tables:
            drop_pos = drop.select(
                _posting_key(id_col), "term", F.col(id_col),
                empty_pos.alias("positions"), F.lit(True).alias("_del"),
            )
            pos_upd = drop_pos
            if upsert_docs is not None:
                pos_upd = _phrase_index_parts(
                    upsert_docs, id_col, text_col
                ).localCheckpoint(eager=True).withColumn(
                    "_del", F.lit(False)
                ).unionByName(drop_pos)
            tables["positions"] = layout.snapshot_merge(
                spark, f"{base}/positions", pos_upd, "pkey", delete_col="_del"
            )
        dt_upd = None
        if upsert_docs is not None:
            dt_upd = new_terms.withColumn("_del", F.lit(False))
        if del_ids is not None:
            dt_del = del_ids.select(
                F.col(id_col), empty_terms.alias("terms"),
                F.lit(True).alias("_del"),
            )
            dt_upd = dt_del if dt_upd is None else dt_upd.unionByName(dt_del)
        tables["docterms"] = layout.snapshot_merge(
            spark, f"{base}/docterms", dt_upd, id_col, delete_col="_del"
        )
        try:
            return layout.index_root_commit(
                spark, base, tables, _txn_update=txn,
                expected_version=root["version"],
            )
        except layout.SnapshotTxnAlreadyApplied:
            return layout.index_root_latest(spark, base)
        except layout.SnapshotVersionConflict as e:
            last_err = e
            continue
    raise IOError(f"{caller}: root commit kept conflicting: {last_err}")


def search_index_ingest(
    spark,
    new_docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    txn_app: str | None = None,
    txn_id: int | None = None,
    retries: int = 5,
    delete_ids: DataFrame | None = None,
) -> int:
    """ATOMIC multi-table incremental ingest: merge a new/changed doc
    batch into every sub-table of a ``search_index_write`` index, then
    publish ONE root — a reader can never see the batch's postings
    without its doc lengths (the round-13 sequential-merge gap).

    Changed-doc correctness: terms the new text DROPPED become REAL
    delete rows in the same merges (keys from the PINNED docterms
    version, bucket-pruned) — no tf=0 ghosts, no tombstone anti-join.
    ``delete_ids`` rides document DELETIONS in the SAME per-sub-table
    merges and the same root publish (ids must be disjoint from the
    batch's — the CDC sync resolves last-change-per-key first), so one
    commit carries upserts and deletes together, exactly like
    snapshot_merge's delete_col at the single-table level.

    Exactly-once under replay: pass ``txn_app``/``txn_id`` (the CDC
    sync keys them by source-table version) — a replayed id is a
    no-op at the root, and the zombie-writer race aborts inside
    ``index_root_commit``.  Crash recovery = re-run.  Returns the root
    version (the current one when the txn id was already applied)."""
    return _search_index_apply(
        spark, path, new_docs, delete_ids, id_col, text_col,
        txn_app, txn_id, retries, "search_index_ingest",
    )


def search_index_delete(
    spark,
    ids: DataFrame,
    path: str,
    id_col: str = "doc_id",
    txn_app: str | None = None,
    txn_id: int | None = None,
    retries: int = 5,
) -> int:
    """ATOMIC document deletion across every sub-table of a versioned
    index: the docs' stored terms (pinned docterms, bucket-pruned)
    yield their posting/position keys, which ride REAL delete merges
    together with the doclen/docterms rows — one root publish, no
    tombstone table, the read path stays pure pinned reads."""
    return _search_index_apply(
        spark, path, None, ids, id_col, "text",
        txn_app, txn_id, retries, "search_index_delete",
    )


def search_index_sync(
    spark,
    table_path: str,
    index_path: str,
    cursor_path: str | None = None,
    cursor: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    txn_app: str = "cdc-index-sync",
):
    """PROVABLY EXACTLY-ONCE CDC→index sync — the lakehouse composition
    (source-of-record snapshot table → change feed → serving index):
    tail the table's per-commit CDC feed, resolve the LAST change per
    key in the span (a doc updated then deleted nets to a delete),
    apply upserts + deletes to every index sub-table in ONE atomic
    root publish whose txn watermark IS the source-table version
    consumed, then durably advance the cursor.

    The two-level guarantee: the cursor is at-least-once (crash before
    ``snapshot_tail_commit`` re-delivers the span), and the replayed
    span is a no-op at the index root (its txn watermark already
    carries the span's end version) — at-least-once delivery + an
    idempotence watermark keyed by the delivery = exactly once, the
    commit-derived discipline the streaming MERGE sink uses, now
    spanning MULTIPLE tables atomically.  Cost per sync: O(changed
    rows) feed read + bucket-pruned merges, never a corpus rescan.
    Returns (root_version | None, new_cursor)."""
    from pyspark.sql.window import Window

    from fiware_cosmos_orion_flink_connector_examples_spark.sources import layout

    feed, cur = layout.snapshot_tail(
        spark, table_path, cursor=cursor, cursor_path=cursor_path
    )
    if feed is None:
        return None, cur
    w = Window.partitionBy(id_col).orderBy(F.desc("_version"))
    last = (
        feed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    ups = last.filter(F.col("_change") != "delete").select(id_col, text_col)
    dels = last.filter(F.col("_change") == "delete").select(id_col)
    v = _search_index_apply(
        spark, index_path, ups, dels, id_col, text_col,
        txn_app, cur, 5, "search_index_sync",
    )
    if cursor_path is not None:
        layout.snapshot_tail_commit(spark, cursor_path, cur)
    return v, cur


def search_index_compact(spark, path: str) -> int:
    """Maintenance for a versioned index: compact_files every sub-table
    (posting tables re-clustered on term so row-group skipping stays
    sharp after merge traffic) and publish one root pinning the
    compacted versions.  A sub-table whose latest version is NOT the
    pinned one (an in-flight or crashed foreign ingest's dangling
    merge) is left alone — compacting it would publish half a foreign
    batch."""
    from fiware_cosmos_orion_flink_connector_examples_spark.sources import layout

    base = path.rstrip("/")
    root = layout.index_root_resolve(spark, base)
    tables = dict(root["tables"])
    for name, pinned in root["tables"].items():
        sub = f"{base}/{name}"
        if layout.snapshot_latest_version(spark, sub) != pinned:
            continue  # dangling foreign merge — not ours to publish
        sort_by = "term" if name in ("postings", "positions") else None
        tables[name] = layout.compact_files(spark, sub, sort_by=sort_by)
    return layout.index_root_commit(
        spark, base, tables, expected_version=root["version"]
    )
