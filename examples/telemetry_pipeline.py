"""The event-analytics flow end to end on the testdata events table —
what the temporal/behavioral operator pack composes into (the batch
product-analytics counterpart of corpus_pipeline.py):

  events → sessionization (30 min gap) → session stats → sequential
  funnel (signup → click → purchase) → first-order Markov transition
  matrix → hourly LOCF gap-fill of each user's value stream →
  event-type islands (SCD2-style run collapsing) → MAD robust
  outliers per type → as-of enrichment of each event with the user's
  latest order.

Every stage is a registered oracle-checked query or a composition of
the same operators; this script chains them in one session and prints
one summary line per stage for the smoke test to assert on.

Run: python examples/telemetry_pipeline.py [--sf-dir /root/testdata/sf0.001]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    args = ap.parse_args()

    from fiware_cosmos_orion_flink_connector_examples_spark.operators.temporal import (
        asof_join,
        resample_locf,
        transition_counts,
    )
    from fiware_cosmos_orion_flink_connector_examples_spark.plans.registry import (
        QUERIES,
    )
    from fiware_cosmos_orion_flink_connector_examples_spark.session import get_spark
    from fiware_cosmos_orion_flink_connector_examples_spark.sources.tables import (
        load_table,
    )
    from fiware_cosmos_orion_flink_connector_examples_spark.streaming.jobs import (
        sessionize_batch,
    )

    spark = get_spark(app_name="telemetry-pipeline")
    ev = load_table(spark, args.sf_dir, "events")

    # 1. sessionize (batch twin of the streaming sessionizer)
    sessions = sessionize_batch(ev, gap_secs=1800.0)
    srow = sessions.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("n_events"), 2).alias("avg_len"),
    ).collect()[0]
    print(f"sessions n_sessions={srow['n']} avg_events={srow['avg_len']}")

    # 2. funnel: registered query (one user_id exchange, pushed type predicates)
    fun = {
        r["step"]: r["n_users"]
        for r in QUERIES["events_funnel_conversion"].fn(spark, args.sf_dir).collect()
    }
    print(
        "funnel signup={s} click={c} purchase={p}".format(
            s=fun.get("signup", 0),
            c=fun.get("click_after_signup", 0),
            p=fun.get("purchase_after_click", 0),
        )
    )

    # 3. transition matrix: most likely next event after a signup
    tm = transition_counts(ev, "user_id", "ts", "event_type", "event_id")
    top = (
        tm.filter(F.col("prev_state") == "signup")
        .orderBy(F.desc("p"), "next_state")
        .limit(1)
        .collect()
    )
    if top:
        print(
            f"transition_after_signup next={top[0]['next_state']} "
            f"p={top[0]['p']}"
        )

    # 4. hourly LOCF gap-fill: how much of the grid is carried forward
    grid = resample_locf(ev, "user_id", "ts", "value", "event_id", 3600)
    g = grid.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(~F.col("is_observed"), 1).otherwise(0)).alias("filled"),
    ).collect()[0]
    print(f"locf grid_rows={g['n']} carried_forward={g['filled']}")

    # 5. islands + outliers: registered queries
    n_islands = QUERIES["events_type_islands"].fn(spark, args.sf_dir).count()
    n_out = (
        QUERIES["outliers_mad_by_type"]
        .fn(spark, args.sf_dir)
        .agg(F.sum("n_outliers"))
        .collect()[0][0]
    )
    print(f"islands n_islands={n_islands} mad_outliers={int(n_out)}")

    # 6. as-of enrichment: latest order at or before each event
    orders = load_table(spark, args.sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").cast("timestamp").alias("ots"),
        "o_totalprice",
    )
    enriched = asof_join(
        ev,
        orders,
        on="user_id",
        left_ts="ts",
        right_ts="ots",
        payload_cols=["o_totalprice"],
        how="left",
    )
    n_matched = enriched.filter(F.col("o_totalprice").isNotNull()).count()
    print(f"asof events_with_order={n_matched}")


if __name__ == "__main__":
    main()
