"""Measure the broadcast vs shuffle regimes of
``dedup.attach_pair_sides`` (VERDICT r6 #2 / r7 #1).

Synthetic dup-pair sets of varying size join both endpoints against a
corpus-scale doc->source frame, once with the broadcast hints forced
on (``broadcast_pair_max`` above the size) and once forced off (0).
The interesting output is (a) where the regimes converge in wall-clock
and (b) confirmation that the shuffle regime keeps working as the pair
set grows — the broadcast regime's hard failure (driver OOM / 8 GB
broadcast cap) cannot be demonstrated at local scale, so the gate
bound is set by broadcast SIZE arithmetic, not local timing.

Run: python tools/pair_join_crossover.py [pair_sizes...]
Defaults 1e6 4e6 16e6 over a 400k-doc frame.  Results land in
SCALING.md round 8.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parents[1])
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import functions as F

from fiware_cosmos_orion_flink_connector_examples_spark.operators.dedup import (
    attach_pair_sides,
)
from fiware_cosmos_orion_flink_connector_examples_spark.session import get_spark

N_DOCS = 400_000


def synth(spark, n_pairs: int):
    docs = spark.range(N_DOCS).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("src_"), (F.col("id") % 7).cast("string")).alias("source"),
    )
    pairs = spark.range(n_pairs).select(
        (F.col("id") * 2654435761 % N_DOCS).alias("d1"),
        ((F.col("id") + 1) * 2246822519 % N_DOCS).alias("d2"),
        (F.col("id") % 1000 / 1000.0 * 0.2 + 0.8).alias("jaccard"),
    ).filter(F.col("d1") != F.col("d2"))
    return docs, pairs


def run_regime(docs, pairs, gate: int) -> float:
    s1 = docs.select(F.col("doc_id").alias("d1"), F.col("source").alias("sa"))
    s2 = docs.select(F.col("doc_id").alias("d2"), F.col("source").alias("sb"))
    t0 = time.perf_counter()
    both, pairs_p = attach_pair_sides(pairs, s1, s2, broadcast_pair_max=gate)
    (
        both.groupBy(F.least("sa", "sb").alias("a"), F.greatest("sa", "sb").alias("b"))
        .agg(F.count(F.lit(1)).alias("n"), F.avg("jaccard").alias("j"))
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    dt = time.perf_counter() - t0
    pairs_p.unpersist()
    return dt


def main() -> None:
    sizes = [int(float(s)) for s in sys.argv[1:]] or [1_000_000, 4_000_000, 16_000_000]
    spark = get_spark(app_name="pair_join_crossover")
    spark.sparkContext.setLogLevel("ERROR")
    out = []
    for n in sizes:
        docs, pairs = synth(spark, n)
        pairs = pairs.persist()
        n_real = pairs.count()  # materialize input outside the timings
        rec = {"n_pairs": n_real}
        for label, gate in (("broadcast_s", 1 << 62), ("shuffle_s", 0)):
            best = min(run_regime(docs, pairs, gate) for _ in range(2))
            rec[label] = round(best, 2)
        pairs.unpersist()
        spark.catalog.clearCache()
        out.append(rec)
        print(json.dumps(rec), flush=True)
    print(json.dumps({"results": out}))


if __name__ == "__main__":
    main()
