"""Interleaved A/B of a runtime-settable SQL conf over named queries.

Both arms run inside ONE session, alternating per repeat, so box-wide
drift hits them equally (the OPTIMIZATION_r17 box-noise discipline).

Usage:
    AB_CONF=spark.sql.join.preferSortMergeJoin AB_A=true AB_B=false \
        python tools/ab_conf.py q1 q2 ...
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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    conf = os.environ["AB_CONF"]
    val_a = os.environ.get("AB_A", "true")
    val_b = os.environ.get("AB_B", "false")
    repeats = int(os.environ.get("AB_REPEATS", "3"))
    names = sys.argv[1:]
    spark = get_spark(app_name="ab-conf")
    spark.sparkContext.setLogLevel("ERROR")
    for warm in ("ngsi_window_min", "custom_udaf_geomean"):
        try:
            QUERIES[warm].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:
            pass
    runs: dict[str, dict[str, list[float]]] = {
        n: {"a": [], "b": []} for n in names
    }
    for _ in range(repeats):
        for arm, val in (("a", val_a), ("b", val_b)):
            spark.conf.set(conf, val)
            for name in names:
                t0 = time.perf_counter()
                QUERIES[name].fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                runs[name][arm].append(round(time.perf_counter() - t0, 3))
                spark.catalog.clearCache()
    print(
        json.dumps(
            {
                "conf": conf,
                "a": val_a,
                "b": val_b,
                "mins": {
                    n: {"a": min(v["a"]), "b": min(v["b"])}
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
