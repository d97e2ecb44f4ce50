"""Dump plans/r17/<query>_before.txt / _after.txt for named queries.

"Before" and "after" are selected by an env toggle understood by the
optimization under test (passed as TOGGLE_ENV/TOGGLE_BEFORE/TOGGLE_AFTER),
defaulting to the scan-spread floor: before = spread disabled (floor 0),
after = repo default (256 KiB).  Usage:

    python tools/dump_plan_pair.py q1 q2 ...
    TOGGLE_ENV=... TOGGLE_BEFORE=... TOGGLE_AFTER=... python tools/dump_plan_pair.py q1
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
    env = os.environ.get("TOGGLE_ENV", "SPARK_GRAFT_SCAN_SPREAD_MIN_BYTES")
    before_val = os.environ.get("TOGGLE_BEFORE", "0")
    after_val = os.environ.get("TOGGLE_AFTER", str(256 * 1024))
    out_dir = _REPO / "plans" / "r17"
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark(app_name="dump-plan-pair")
    spark.sparkContext.setLogLevel("ERROR")
    for name in sys.argv[1:]:
        for tag, val in (("before", before_val), ("after", after_val)):
            os.environ[env] = val
            try:
                plan = _formatted(QUERIES[name].fn(spark, sf_dir))
            finally:
                os.environ.pop(env, None)
            (out_dir / f"{name}_{tag}.txt").write_text(
                f"# {name} — {tag} ({env}={val}), sf_dir={sf_dir}\n{plan}"
            )
            print(f"wrote {name}_{tag}.txt", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
