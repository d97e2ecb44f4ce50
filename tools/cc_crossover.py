"""Measure the union-find vs distributed-loop crossover for
``dedup.connected_components`` (VERDICT r4 #7).

The driver fast path collects ≤ ``driver_pair_max`` pairs and solves
union-find in one pass; the distributed path runs the pointer-jumping
loop.  This script times BOTH paths on the same synthetic pair graphs
(random pairs over 4×P docs — forest-plus-cycles, the shape a dedup
pair list actually has) at sizes around the default bound, by forcing
``driver_pair_max`` just above / below each size.

Run: python tools/cc_crossover.py [sizes...]   (defaults 50k 200k 800k)
Results land in SCALING.md §Addenda round 5.
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
    connected_components,
)
from fiware_cosmos_orion_flink_connector_examples_spark.session import get_spark


def synth_pairs(spark, n_pairs: int):
    """Deterministic random pair graph: P pairs over 4P docs (Knuth
    multiplicative hashing), d1<d2, self-loops dropped."""
    n_docs = 4 * n_pairs
    df = (
        spark.range(n_pairs)
        .select(
            (F.col("id") * 2654435761 % n_docs).alias("x"),
            ((F.col("id") + 1) * 2246822519 % n_docs).alias("y"),
        )
        .filter(F.col("x") != F.col("y"))
        .select(
            F.least("x", "y").alias("d1"),
            F.greatest("x", "y").alias("d2"),
        )
    )
    return df


def main() -> None:
    sizes = [int(s) for s in sys.argv[1:]] or [50_000, 200_000, 800_000]
    spark = get_spark(app_name="cc_crossover")
    spark.sparkContext.setLogLevel("ERROR")
    out = []
    for n in sizes:
        pairs = synth_pairs(spark, n).persist()
        n_real = pairs.count()  # materialize input outside the timings
        row = {"pairs": n_real}
        for label, bound in (("driver", n_real + 10), ("distributed", 0)):
            t0 = time.perf_counter()
            got = connected_components(pairs, driver_pair_max=bound)
            n_docs = got.count()  # materialize the full labeling
            row[f"{label}_sec"] = round(time.perf_counter() - t0, 2)
            row["docs"] = n_docs
        pairs.unpersist()
        out.append(row)
        print(json.dumps(row), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
