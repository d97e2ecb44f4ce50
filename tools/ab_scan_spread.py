"""Interleaved A/B timer for the scale-adaptive scan spread
(tables._scan_spread).  The box's wall-clock drifts in bursts, so
separate before/after sessions are incomparable; this tool alternates
OFF/ON runs of each query inside ONE session (the floor env is read per
load_table call) and reports min-of-N per arm.

Usage: python tools/ab_scan_spread.py q1 q2 ...
env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_AB_REPEATS (default 3)
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

_ENV = "SPARK_GRAFT_SCAN_SPREAD_MIN_BYTES"


def _run(spark, sf_dir: str, name: str) -> float:
    t0 = time.perf_counter()
    QUERIES[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeats = int(os.environ.get("SPARK_GRAFT_AB_REPEATS", "3"))
    names = sys.argv[1:]
    spark = get_spark(app_name="ab-scan-spread")
    spark.sparkContext.setLogLevel("ERROR")
    for warm in ("ngsi_window_min", "custom_udaf_geomean"):
        try:
            QUERIES[warm].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:
            pass
    out = {}
    for name in names:
        offs, ons = [], []
        for _ in range(repeats):
            os.environ[_ENV] = "0"
            offs.append(_run(spark, sf_dir, name))
            os.environ[_ENV] = str(256 * 1024)
            ons.append(_run(spark, sf_dir, name))
        out[name] = {
            "off_min": round(min(offs), 3),
            "on_min": round(min(ons), 3),
            "off": [round(x, 3) for x in offs],
            "on": [round(x, 3) for x in ons],
        }
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"sf_dir": sf_dir, "ab": out}))
    spark.stop()


if __name__ == "__main__":
    main()
