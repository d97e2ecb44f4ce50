"""Min-of-N re-timer for a named subset of registered queries.

Usage: python tools/bench_subset.py q1 q2 ...  (env: SPARK_GRAFT_SF_DIR,
SPARK_GRAFT_BENCH_REPEATS default 3).  Prints one JSON line with the
per-query min — the adjudication tool VERDICT r14 directive #1 asks
for (outlier verification without a full 191-query run).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parents[1])
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from fiware_cosmos_orion_flink_connector_examples_spark.plans.registry import QUERIES
from fiware_cosmos_orion_flink_connector_examples_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    names = sys.argv[1:]
    spark = get_spark(app_name="bench-subset")
    spark.sparkContext.setLogLevel("ERROR")
    # same warmup as bench.py so the first timed run isn't JIT-cold
    for warm in ("ngsi_window_min", "custom_udaf_geomean"):
        try:
            QUERIES[warm].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:
            pass
    out: dict[str, list[float]] = {}
    for name in names:
        runs = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            QUERIES[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
        out[name] = runs
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "repeats": repeats,
                "runs": out,
                "mins": {k: min(v) for k, v in out.items()},
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
