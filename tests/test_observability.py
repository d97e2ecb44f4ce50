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
