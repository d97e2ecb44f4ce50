"""Throughput smoke for the vectorized snapshot_cdc read path
(VERDICT r16 #4): time ``SnapshotCdcStreamReader.read()``'s arrow
RecordBatch yield against the round-16 row-at-a-time reference on a
~1M-row bootstrap, same partitions, same rows out.

Run: python tools/cdc_read_smoke.py [n_rows]   (default 1_000_000)
Acceptance: batch-yield ≥5× the row-yield path.  Results land in
SCALING.md §Addenda round 17.
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parents[1])
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from fiware_cosmos_orion_flink_connector_examples_spark.session import get_spark
from fiware_cosmos_orion_flink_connector_examples_spark.sources import (
    cdc_stream,
    layout,
)


def _row_yield_reference(partition, cols):
    """The round-16 per-row read path, verbatim shape: to_pylist() +
    interpreter loop — kept here ONLY as the smoke's baseline."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(partition.file)
    names = set(tbl.column_names)
    n = tbl.num_rows

    def col(name):
        if name in names:
            return tbl.column(name).to_pylist()
        return [None] * n

    data = [col(c) for c in cols]
    if partition.kind in ("log", "log_pre"):
        changes = col("_change")
        keep_pre = partition.kind == "log_pre"
        for i in range(n):
            ch = changes[i]
            if ch == "update_pre" and not keep_pre:
                continue
            yield (partition.version, ch) + tuple(d[i] for d in data)
    else:
        for i in range(n):
            yield (partition.version, "insert") + tuple(d[i] for d in data)


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark(app_name="cdc-read-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    with tempfile.TemporaryDirectory() as td:
        path = f"{td}/t"
        df = (
            spark.range(n_rows)
            .select(
                F.col("id").alias("k"),
                (F.col("id") % 97).cast("string").alias("g"),
                (F.col("id") * 7 % 100000).alias("x"),
                F.sha2(F.col("id").cast("string"), 256).alias("payload"),
            )
        )
        layout.snapshot_write_keyed(spark, df, path, "k", n_buckets=8)

        schema = StructType.fromDDL(
            cdc_stream.SnapshotCdcDataSource({"path": path}).schema()
        )
        reader = cdc_stream.SnapshotCdcStreamReader({"path": path}, schema)
        parts = reader.partitions({"version": 0}, {"version": 1})

        t0 = time.perf_counter()
        batch_rows = 0
        for p in parts:
            for b in reader.read(p):
                batch_rows += b.num_rows
        t_batch = time.perf_counter() - t0

        t0 = time.perf_counter()
        row_rows = 0
        for p in parts:
            for _ in _row_yield_reference(p, reader.cols):
                row_rows += 1
        t_row = time.perf_counter() - t0

    assert batch_rows == row_rows == n_rows, (batch_rows, row_rows)
    print(
        json.dumps(
            {
                "n_rows": n_rows,
                "n_partitions": len(parts),
                "batch_yield_sec": round(t_batch, 3),
                "row_yield_sec": round(t_row, 3),
                "speedup": round(t_row / t_batch, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
