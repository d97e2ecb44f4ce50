"""The LLM training-data flow end to end on the testdata tables — what
the [ext] operator pack composes into (no reference analog; this is
the engine's own headline batch pipeline):

  documents → in-flight quality metrics (observe) → exact dedup →
  near-dup pairs → connected components → drop cluster losers →
  train/eval split + 8-gram decontamination (bloom-pruned at scale,
  --bloom) → chunk → greedy pack → per-pack stats; embeddings → int8
  quantization report.

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

    # 4. chunk + greedy pack the train split
    chunks = text.chunk_documents(train, size=32, stride=24)
    packed = text.pack_chunks(chunks, ["doc_id", "chunk_idx"], budget=args.budget)
    pack_stats = packed.groupBy("pack_id").agg(
        F.sum("n_tokens").alias("pack_tokens")
    ).agg(
        F.count(F.lit(1)).alias("n_packs"),
        F.round(F.avg("pack_tokens") / args.budget, 4).alias("avg_fill"),
    )

    n_train, n_eval, n_contam = train.count(), clean_eval.count(), contaminated.count()
    stats = pack_stats.first()
    quality = obs.get
    print(f"docs={quality['n_docs']} empty={quality['n_empty']}")
    print(f"train={n_train} clean_eval={n_eval} contaminated_eval_dropped={n_contam}")
    print(f"packs={stats['n_packs']} avg_fill={stats['avg_fill']}")


if __name__ == "__main__":
    main()
