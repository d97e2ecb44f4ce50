"""Interleaved A/B of the opt-in scan spread over named queries.

Arms alternate INSIDE one session per repeat (the box-noise
discipline): arm "off" raises SPARK_GRAFT_SCAN_SPREAD_MIN_BYTES above
any testdata file so every `spread=True` call site degrades to the
plain single-task scan; arm "on" restores the default floor.  The
floor is read per load_table call, so flipping the env var between
arms is a faithful runtime toggle.

Usage: python tools/ab_spread.py q1 q2 ...
Env: SPARK_GRAFT_SF_DIR, AB_REPEATS (default 3).
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

OFF = str(1 << 60)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeats = int(os.environ.get("AB_REPEATS", "3"))
    names = sys.argv[1:]
    spark = get_spark(app_name="ab-spread")
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
    for _ in range(repeats):
        for arm in ("off", "on"):
            if arm == "off":
                os.environ["SPARK_GRAFT_SCAN_SPREAD_MIN_BYTES"] = OFF
            else:
                os.environ.pop("SPARK_GRAFT_SCAN_SPREAD_MIN_BYTES", None)
            for name in names:
                t0 = time.perf_counter()
                QUERIES[name].fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                runs[name][arm].append(round(time.perf_counter() - t0, 3))
                spark.catalog.clearCache()
    os.environ.pop("SPARK_GRAFT_SCAN_SPREAD_MIN_BYTES", None)
    print(
        json.dumps(
            {
                "mins": {
                    n: {"off": min(v["off"]), "on": min(v["on"])}
                    for n, v in runs.items()
                },
                "runs": runs,
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
