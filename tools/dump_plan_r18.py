"""Dump plans/r18/<query>_<tag>.txt for named queries at the CURRENT
code state — round-18 evidence files (VERDICT r17 deliverable).

Usage: TAG=before python tools/dump_plan_r18.py q1 q2 ...
(env: SPARK_GRAFT_SF_DIR, TAG defaults to "before")
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(_REPO))

from fiware_cosmos_orion_flink_connector_examples_spark.plans.registry import QUERIES
from fiware_cosmos_orion_flink_connector_examples_spark.session import get_spark


def _formatted(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    tag = os.environ.get("TAG", "before")
    out_dir = _REPO / "plans" / "r18"
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark(app_name="dump-plan-r18")
    spark.sparkContext.setLogLevel("ERROR")
    for name in sys.argv[1:]:
        try:
            plan = _formatted(QUERIES[name].fn(spark, sf_dir))
        except Exception as exc:  # noqa: BLE001 — report and continue
            print(f"FAILED {name}: {exc}", flush=True)
            continue
        (out_dir / f"{name}_{tag}.txt").write_text(
            f"# {name} — {tag}, sf_dir={sf_dir}\n{plan}"
        )
        print(f"wrote {name}_{tag}.txt", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
