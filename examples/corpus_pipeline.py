"""The LLM training-data flow end to end on the testdata tables — what
the [ext] operator pack composes into (no reference analog; this is
the engine's own headline batch pipeline):

  documents → in-flight quality metrics (observe) → quality-rule
  funnel report → exact dedup → near-dup pairs → connected
  components → drop cluster losers → span-dedup report → span
  REMOVAL (cut ≥50-token covered runs) → train/eval split + 8-gram
  decontamination (bloom-pruned at scale, --bloom) + surgical
  train-side span cut → per-source KL drift on the train split →
  token-budgeted mixture (two-pass prefix sum) → chunk → greedy
  pack → per-pack stats; embeddings → int8 quantization report.

Run: python examples/corpus_pipeline.py [--sf-dir /root/testdata/sf0.01]
     [--bloom]   # prune the decontamination join with the broadcast bloom
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import Observation
from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--budget", type=int, default=256, help="pack token budget")
    ap.add_argument(
        "--bloom",
        action="store_true",
        help="use the broadcast-bloom prune before the exact decontamination "
        "join (the 100 TB shape; same output, fewer shuffled grams)",
    )
    args = ap.parse_args()

    from fiware_cosmos_orion_flink_connector_examples_spark.functions.hashing import (
        md5int64_seeded,
    )
    from fiware_cosmos_orion_flink_connector_examples_spark.operators import dedup, text
    from fiware_cosmos_orion_flink_connector_examples_spark.session import get_spark
    from fiware_cosmos_orion_flink_connector_examples_spark.sources.tables import (
        load_table,
    )

    spark = get_spark(app_name="corpus-pipeline")
    docs = load_table(spark, args.sf_dir, "documents")

    # 1. profile in-flight: quality counters ride the first pass
    obs = Observation("quality")
    docs = docs.observe(
        obs,
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("text") == "", 1).otherwise(0)).alias("n_empty"),
    )

    # 1b. quality-rule funnel (report only — the thresholds are studied
    # from the report, the corpus is not re-scanned per candidate value)
    rules = text.quality_rules("text")
    funnel = docs.select(*(c.alias(n) for n, c in rules.items())).agg(
        F.count(F.lit(1)).alias("n"),
        *(F.sum(F.col(n).cast("int")).alias(n) for n in rules),
    ).first()

    # 2. exact dedup (lowest-id survivor), then near-dup clusters
    survivors = docs.join(
        dedup.exact_dedup(docs, ["text"], "doc_id").select(
            F.col("keep_id").alias("doc_id")
        ),
        "doc_id",
        "left_semi",
    )
    pairs = dedup.ngram_jaccard_pairs(survivors, "doc_id", threshold=0.8)
    clusters = dedup.connected_components(pairs)
    losers = clusters.filter(F.col("doc_id") != F.col("cluster_id")).select("doc_id")
    corpus = survivors.join(losers, "doc_id", "left_anti")

    # 2b. span-level duplication report on the cleaned corpus (cross-doc
    # repeated 8-gram occurrences that whole-doc dedup cannot see)
    spans = dedup.repeated_span_report(corpus, "doc_id").agg(
        F.sum("n_spans").alias("n_spans"), F.sum("n_dup_spans").alias("n_dup")
    ).first()

    # 2c. span REMOVAL (the cut half of 2b's report): maximal covered
    # runs of >=50 tokens go (the ExactSubstr rule — long verbatim
    # boilerplate is cut, short idioms survive); downstream stages all
    # run on the cleaned text
    cut = dedup.remove_repeated_spans(corpus, "doc_id", min_run=50)
    span_cut = cut.agg(F.sum("n_removed").alias("t")).first()["t"]
    corpus = corpus.drop("text").join(
        cut.select("doc_id", F.col("text_clean").alias("text")), "doc_id"
    )

    # 3. split + decontaminate: eval docs sharing an 8-gram with train
    is_eval = F.pmod(md5int64_seeded(F.col("doc_id").cast("string"), "split"), F.lit(20)) == 0
    tagged = corpus.withColumn("_e", is_eval)
    decontaminate = (
        dedup.ngram_contamination_bloom if args.bloom else dedup.ngram_contamination
    )
    contaminated = decontaminate(
        tagged.filter(~F.col("_e")), tagged.filter(F.col("_e")), "doc_id", n=8
    )
    clean_eval = tagged.filter(F.col("_e")).join(contaminated, "doc_id", "left_anti")
    train = tagged.filter(~F.col("_e"))

    # 3a. surgical train-side decontamination: eval-shared spans are CUT
    # from train docs (a doc quoting one benchmark question keeps its
    # other tokens; dropping the whole doc would waste them)
    cut_tr = dedup.remove_contaminated_spans(
        train, tagged.filter(F.col("_e")), "doc_id", n=8
    )
    decon_cut = cut_tr.agg(F.sum("n_removed").alias("t")).first()["t"]
    train = train.drop("text").join(
        cut_tr.select("doc_id", F.col("text_clean").alias("text")), "doc_id"
    )

    # 4. chunk + greedy pack the train split
    chunks = text.chunk_documents(train, size=32, stride=24)
    packed = text.pack_chunks(chunks, ["doc_id", "chunk_idx"], budget=args.budget)
    pack_stats = packed.groupBy("pack_id").agg(
        F.sum("n_tokens").alias("pack_tokens")
    ).agg(
        F.count(F.lit(1)).alias("n_packs"),
        F.round(F.avg("pack_tokens") / args.budget, 4).alias("avg_fill"),
    )

    # 3b. mixture drift on the train split: which source's token
    # distribution sits furthest from the corpus mix
    drift = (
        text.source_unigram_kl(train, "source")
        .orderBy(F.desc("kl"), F.asc("source"))
        .first()
    )

    # 5. token-budgeted mixture: per-source contribution under a fixed
    # token budget (two-pass range-partitioned prefix sum — the 100 TB
    # shape with no single-task per-source sort)
    from fiware_cosmos_orion_flink_connector_examples_spark.plans.extensions import (
        _token_budget_two_pass,
    )

    mixture = (
        _token_budget_two_pass(
            train.select("source", "doc_id", "text"), budget=1000
        )
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_tokens").alias("tok"))
        .orderBy(F.desc("tok"))
        .first()
    )

    n_train, n_eval, n_contam = train.count(), clean_eval.count(), contaminated.count()
    stats = pack_stats.first()
    quality = obs.get
    print(f"docs={quality['n_docs']} empty={quality['n_empty']}")
    print(
        "quality_funnel "
        + " ".join(f"{k}={funnel[k]}" for k in ("n", *rules))
    )
    print(f"span_report n_spans={spans['n_spans']} n_dup_spans={spans['n_dup']}")
    print(f"train={n_train} clean_eval={n_eval} contaminated_eval_dropped={n_contam}")
    print(f"span_removal tokens_cut={span_cut} decontamination tokens_cut={decon_cut}")
    print(f"max_drift source={drift['source']} kl={drift['kl']}")
    print(f"mixture_top source={mixture['source']} n_docs={mixture['n']} n_tokens={mixture['tok']}")
    print(f"packs={stats['n_packs']} avg_fill={stats['avg_fill']}")


if __name__ == "__main__":
    main()
