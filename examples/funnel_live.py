"""Live funnel over the events stream — the streaming twin of the
`events_funnel_conversion` batch query (no reference analog; an
engine-native demo of `applyInPandasWithState`).

Replays the testdata events table through a file-backed stream (each
replay shard becomes a micro-batch), runs `jobs.streaming_funnel`
(per-user state: first signup → first click after it → first purchase
after that), prints each stage row as it is reached, then the final
stage counts next to the batch query's numbers — they must agree.

Run: python examples/funnel_live.py [--sf-dir /root/testdata/sf0.001]
     [--shards 4]
"""

from __future__ import annotations

import argparse
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument(
        "--shards", type=int, default=4, help="replay files (micro-batch granularity)"
    )
    args = ap.parse_args()

    from fiware_cosmos_orion_flink_connector_examples_spark.plans.registry import (
        QUERIES,
    )
    from fiware_cosmos_orion_flink_connector_examples_spark.session import get_spark
    from fiware_cosmos_orion_flink_connector_examples_spark.sources.tables import (
        load_table,
    )
    from fiware_cosmos_orion_flink_connector_examples_spark.streaming import jobs

    spark = get_spark(app_name="funnel-live")
    spark.sparkContext.setLogLevel("ERROR")

    with tempfile.TemporaryDirectory() as tmp:
        spool = Path(tmp) / "replay"
        # shard by time so each replay file is a contiguous slice —
        # micro-batches then replay history in order
        ev = load_table(spark, args.sf_dir, "events").select(
            "user_id", "ts", "event_type"
        )
        ev.withColumn(
            "shard", F.ntile(args.shards).over(__import__("pyspark").sql.window.Window.orderBy("ts"))
        ).write.partitionBy("shard").mode("overwrite").json(str(spool))

        stream = (
            spark.readStream.schema("user_id long, ts timestamp, event_type string")
            .option("maxFilesPerTrigger", 8)
            .json(str(spool) + "/shard=*")
        )
        out_dir = Path(tmp) / "out"
        q = (
            jobs.streaming_funnel(stream)
            .writeStream.format("json")
            .option("path", str(out_dir))
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(Path(tmp) / "ckpt"))
            .start()
        )
        q.awaitTermination(300)
        reached = (
            spark.read.schema(
                "user_id long, stage int, step string, reached_ts timestamp"
            )
            .json(str(out_dir))
            .groupBy("stage", "step")
            .agg(F.count(F.lit(1)).alias("n_users"))
            .orderBy("stage")
            .collect()
        )
        print("streaming funnel (stage rows emitted on first reach):")
        for r in reached:
            print(f"  stage={r.stage} {r.step}: {r.n_users}")
        batch = QUERIES["events_funnel_conversion"].fn(spark, args.sf_dir).collect()
        print("batch funnel (events_funnel_conversion):")
        for r in sorted(batch, key=lambda x: x.stage):
            print(
                f"  stage={r.stage} {r.step}: {r.n_users} (conv_rate={r.conv_rate})"
            )
        s_counts = {r.stage: r.n_users for r in reached}
        b_counts = {r.stage: r.n_users for r in batch}
        print(f"stream_matches_batch={s_counts == b_counts}")

    spark.stop()


if __name__ == "__main__":
    main()
