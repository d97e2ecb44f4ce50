"""Per-JOB trace for a registered query: run it twice (capstone caches
warm on the first pass) and list every Spark job the SECOND run
submitted, with its callsite and stage/task counts — clock-free
evidence for fusing per-run probe/metadata jobs (guide §5).

Usage: python tools/job_trace.py <query> [query ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.01)
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parents[1])
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from fiware_cosmos_orion_flink_connector_examples_spark.plans.registry import QUERIES
from fiware_cosmos_orion_flink_connector_examples_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark(app_name="job-trace")
    spark.sparkContext.setLogLevel("ERROR")
    jsc = spark.sparkContext._jsc.sc()
    for name in sys.argv[1:]:
        # pass 1: warm fixture caches so pass 2 is the serve surface
        QUERIES[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        spark.catalog.clearCache()
        before = set(jsc.statusTracker().getJobIdsForGroup(None))
        QUERIES[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        after = jsc.statusTracker().getJobIdsForGroup(None)
        new = sorted(j for j in after if j not in before)
        print(f"\n=== {name}: {len(new)} jobs on the warm run ===")
        for j in new:
            info = jsc.statusTracker().getJobInfo(j)
            if info.isEmpty():
                print(f"  job {j}: <gone>")
                continue
            ji = info.get()
            n_stages = len(list(ji.stageIds()))
            # callsite comes from the first stage's details
            site = ""
            for sid in list(ji.stageIds())[:1]:
                si = jsc.statusTracker().getStageInfo(sid)
                if not si.isEmpty():
                    site = si.get().name()
            print(f"  job {j}: {n_stages} stages | {site}")
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
