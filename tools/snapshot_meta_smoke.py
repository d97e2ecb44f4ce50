"""Round-12 snapshot-layer metadata scale smoke.

Measures what the segment-manifest redesign claims at volume:
  1. append-commit metadata bytes + wall time FLAT as the table grows
     (30 × 300k-row streaming-style appends);
  2. compact_files collapses the file count and sharpens stats pruning;
  3. keyed 25M-row table: write + clustered merge with and without the
     per-commit change log (the round-12 CDC cost delta).

Run:  python tools/snapshot_meta_smoke.py 2>/dev/null
Writes nothing to the repo; results go to stdout for SCALING.md.
"""

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from fiware_cosmos_orion_flink_connector_examples_spark.session import get_spark
from fiware_cosmos_orion_flink_connector_examples_spark.sources import layout


def main() -> None:
    spark = get_spark(app_name="snapshot_meta_smoke")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="snapmeta_")
    out: dict = {}
    try:
        # --- 1. append flatness ------------------------------------------
        path = f"{root}/grow"
        sink = layout.snapshot_append_stream(path, "smoke", stats_cols=["k"])
        times = []
        import os

        for bid in range(30):
            batch = (
                spark.range(bid * 300_000, (bid + 1) * 300_000)
                .select(F.col("id").alias("k"), (F.col("id") % 97).alias("v"))
                .repartition(4)
            )
            t0 = time.perf_counter()
            sink(batch, bid)
            times.append(round(time.perf_counter() - t0, 3))
        man_sizes = [
            os.path.getsize(f"{path}/_manifest_v{v}.json") for v in (1, 15, 30)
        ]
        out["append_commit_secs_first5"] = times[:5]
        out["append_commit_secs_last5"] = times[-5:]
        out["manifest_bytes_v1_v15_v30"] = man_sizes
        man = layout.snapshot_manifest(spark, path)
        out["final_rows"] = layout.snapshot_read(spark, path).count()
        out["final_files"] = len(man["files"])

        # --- 2. compaction + pruning -------------------------------------
        _, rb, tb = layout.snapshot_scan(spark, path, "k", 1_000_000, 1_010_000)
        t0 = time.perf_counter()
        layout.compact_files(spark, path, target_files=32, sort_by="k")
        out["compact_files_secs"] = round(time.perf_counter() - t0, 3)
        _, ra, ta = layout.snapshot_scan(spark, path, "k", 1_000_000, 1_010_000)
        out["scan_files_before"] = [rb, tb]
        out["scan_files_after"] = [ra, ta]
        out["manifest_bytes_after_compact"] = os.path.getsize(
            f"{path}/_manifest_v31.json"
        )

        # --- 3. keyed 25M merge, change-log on/off -----------------------
        kpath = f"{root}/keyed"
        base = spark.range(25_000_000).select(
            F.col("id").alias("k"), (F.col("id") % 1000).alias("v")
        )
        t0 = time.perf_counter()
        layout.snapshot_write_keyed(spark, base, kpath, "k", n_buckets=64)
        out["keyed_write_25m_secs"] = round(time.perf_counter() - t0, 3)
        upd = spark.createDataFrame(
            [(k, -1) for k in range(100, 110)], "k long, v long"
        )
        t0 = time.perf_counter()
        layout.snapshot_merge(spark, kpath, upd, "k", change_log=False)
        out["merge_clustered_nolog_secs"] = round(time.perf_counter() - t0, 3)
        upd2 = spark.createDataFrame(
            [(k, -2) for k in range(200, 210)], "k long, v long"
        )
        t0 = time.perf_counter()
        layout.snapshot_merge(spark, kpath, upd2, "k", change_log=True)
        out["merge_clustered_log_secs"] = round(time.perf_counter() - t0, 3)
        m1 = layout.snapshot_manifest(spark, kpath, 2)
        m2 = layout.snapshot_manifest(spark, kpath, 3)
        out["merge_files_carried"] = len(set(m1["files"]) & set(m2["files"]))
        out["merge_files_total"] = len(m2["files"])
        out["feed_rows_v3"] = layout.snapshot_changes_feed(spark, kpath, 2, 3).count()
    finally:
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
