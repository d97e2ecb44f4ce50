"""In-flight data-quality metrics via df.observe(): counters computed
DURING the existing pass (no second scan — at 100 TB a separate
quality-count job doubles the read).  Batch uses the Observation
helper; streaming surfaces the same metrics per micro-batch through
query progress."""

from __future__ import annotations

import json
import time

from pyspark.sql import Observation
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_batch_observation_metrics(spark):
    from fiware_cosmos_orion_flink_connector_examples_spark.sources.tables import (
        load_table,
    )

    docs = load_table(spark, SF, "documents")
    obs = Observation("quality")
    observed = docs.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("text").isNull() | (F.col("text") == ""), 1).otherwise(0)).alias(
            "n_empty"
        ),
        F.min("n_chars").alias("min_chars"),
    )
    kept = observed.filter(F.col("n_chars") > 0).count()  # one action, metrics ride along
    m = obs.get
    assert m["n_rows"] == docs.count()
    assert m["n_empty"] == 0
    assert m["min_chars"] >= 1
    assert kept <= m["n_rows"]


def test_streaming_observed_metrics_in_progress(spark, tmp_path):
    rows = [{"event_id": i, "value": float(i)} for i in range(20)]
    src = tmp_path / "obs_src"
    src.mkdir()
    (src / "a.jsonl").write_text("\n".join(json.dumps(r) for r in rows))

    stream = (
        spark.readStream.schema("event_id BIGINT, value DOUBLE")
        .json(str(src))
        .observe("batch_quality", F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("t_observe")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_obs"))
        .start()
    )
    q.awaitTermination(60)
    # availableNow may split batches; the summed observed metrics must
    # cover every input row exactly once
    progresses = [p for p in q.recentProgress if p.get("observedMetrics", {}).get("batch_quality")]
    assert progresses, "no observed metrics surfaced in progress"
    n = sum(p["observedMetrics"]["batch_quality"]["n"] for p in progresses)
    s = sum(p["observedMetrics"]["batch_quality"]["s"] for p in progresses)
    assert n == 20 and s == sum(range(20))


def test_watermark_drop_report_counts_late_rows(spark, tmp_path):
    """Late-data observability: rows arriving behind the watermark are
    DROPPED silently by the windowed agg — watermark_drop_report
    surfaces the count from query progress so a pipeline can alarm
    instead of quietly losing data."""
    import datetime as dt

    from fiware_cosmos_orion_flink_connector_examples_spark.streaming import jobs

    src = tmp_path / "late_src"
    src.mkdir()
    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    fresh = [
        {"ts": (t0 + dt.timedelta(seconds=i)).isoformat(), "user_id": 1, "value": 1.0}
        for i in range(0, 120, 10)
    ]
    (src / "a.jsonl").write_text("\n".join(json.dumps(r) for r in fresh))

    def run(name):
        stream = spark.readStream.schema(
            "ts TIMESTAMP, user_id BIGINT, value DOUBLE"
        ).json(str(src))
        agg = (
            stream.withWatermark("ts", "5 seconds")
            .groupBy(F.window("ts", "10 seconds"), "user_id")
            .agg(F.sum("value").alias("s"))
        )
        # file sink: the memory sink cannot recover from a checkpoint,
        # and watermark persistence across runs is the point here
        q = (
            agg.writeStream.format("parquet")
            .option("path", str(tmp_path / "late_out"))
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt_late"))
            .start()
        )
        q.awaitTermination(120)
        return q

    run("warm")  # advances + CHECKPOINTS the watermark

    # a row a full hour behind the checkpointed watermark arrives in a
    # LATER run — the watermark survives the restart, so this is the
    # real late-arrival shape, not a same-batch race
    late = [{"ts": (t0 - dt.timedelta(hours=1)).isoformat(), "user_id": 1, "value": 9.9}]
    (src / "b.jsonl").write_text("\n".join(json.dumps(r) for r in late))
    q = run("late")
    report = jobs.watermark_drop_report(q)
    assert report["batches"] >= 1
    assert report["dropped_by_watermark"] >= 1, report
    # the late row's value must NOT have reached any emitted window
    vals = [
        r["s"] for r in spark.read.parquet(str(tmp_path / "late_out")).collect()
    ]
    assert all(abs(v - round(v)) < 1e-9 for v in vals), vals
