"""Interleaved A/B of the load_table schema cache over named queries.

Arms alternate INSIDE one session per repeat (the box-noise
discipline): arm "off" sets SPARK_GRAFT_SCHEMA_CACHE=0 so every
load_table pays full per-call datasource resolution + footer schema
inference; arm "on" restores the cache.  The flag is read per
load_table call, so flipping the env var between arms is a faithful
runtime toggle.  Defaults to ALL registered queries (the cache is a
per-query fixed cost, so the honest number is the whole-suite delta).

Usage: python tools/ab_schema_cache.py [q1 q2 ...]
Env: SPARK_GRAFT_SF_DIR, AB_REPEATS (default 2).
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
    repeats = int(os.environ.get("AB_REPEATS", "2"))
    names = sys.argv[1:] or list(QUERIES)
    spark = get_spark(app_name="ab-schema-cache")
    spark.sparkContext.setLogLevel("ERROR")
    for warm in ("ngsi_window_min", "custom_udaf_geomean"):
        try:
            QUERIES[warm].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:
            pass
    runs: dict[str, dict[str, list[float]]] = {
        n: {"off": [], "on": []} for n in names
    }
    # try/finally: an exception mid-arm must not leave the process-global
    # env flag set for a reusing importer (ADVICE r17)
    try:
        for _ in range(repeats):
            for arm in ("off", "on"):
                os.environ["SPARK_GRAFT_SCHEMA_CACHE"] = (
                    "0" if arm == "off" else "1"
                )
                for name in names:
                    t0 = time.perf_counter()
                    QUERIES[name].fn(spark, sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    runs[name][arm].append(round(time.perf_counter() - t0, 3))
                    spark.catalog.clearCache()
    finally:
        os.environ.pop("SPARK_GRAFT_SCHEMA_CACHE", None)
    mins = {
        n: {"off": min(v["off"]), "on": min(v["on"])} for n, v in runs.items()
    }
    print(
        json.dumps(
            {
                "total_off_min": round(sum(v["off"] for v in mins.values()), 2),
                "total_on_min": round(sum(v["on"] for v in mins.values()), 2),
                "mins": mins,
                "runs": runs,
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
