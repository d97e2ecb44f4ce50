"""Phase profiler for a registered query: splits wall-clock into
(a) DataFrame construction (Python-side plan build, incl. any eager
collects/actions the query fn itself runs), (b) analysis+optimization+
physical planning (explain cost), and (c) noop execution — then counts
the Spark jobs the full run submitted.  Evidence tool for guide §1 /
§7.3 (driver-side planning can dominate small-scale benches).

Usage: python tools/profile_query.py q1 q2 ...  (env: SPARK_GRAFT_SF_DIR)
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
    names = sys.argv[1:]
    spark = get_spark(app_name="profile-query")
    spark.sparkContext.setLogLevel("ERROR")
    for warm in ("ngsi_window_min", "custom_udaf_geomean"):
        try:
            QUERIES[warm].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:
            pass
    tracker = spark.sparkContext.statusTracker()
    out = {}
    for name in names:
        jobs_before = len(tracker.getJobIdsForGroup(None) or [])
        t0 = time.perf_counter()
        df = QUERIES[name].fn(spark, sf_dir)
        t1 = time.perf_counter()
        df._jdf.queryExecution().executedPlan()  # analysis+opt+planning
        t2 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t3 = time.perf_counter()
        # job ids are global and monotonically increasing
        all_jobs = spark.sparkContext._jsc.sc().statusTracker().getJobIdsForGroup(None)
        n_jobs = len(list(all_jobs)) - jobs_before
        out[name] = {
            "build_s": round(t1 - t0, 3),
            "plan_s": round(t2 - t1, 3),
            "exec_s": round(t3 - t2, 3),
            "total_s": round(t3 - t0, 3),
            "jobs": n_jobs,
        }
        spark.catalog.clearCache()
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
