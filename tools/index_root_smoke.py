"""Round-14 versioned-search-index scale smoke.

Measures what the index-root + insert-aware-COW design claims at ~400×
the bench corpus (2M synthetic docs, 64 buckets, local[32]):

  1. versioned combined index build (4 snapshot sub-tables + 1 root);
  2. ATOMIC multi-table ingest cost: pure-insert batches append files
     (no bucket rewrite, no row-payload reads — only key-column probes
     of the touched buckets), changed-doc batches rewrite only MATCHED
     buckets; the uniform-changed case is the stated worst case (all
     buckets match → full read + the probe on top);
  3. root metadata bytes per commit (should be ~120 B, flat);
  4. serve cost off the pinned root (phrase + BM25) before/after
     ingest — unchanged by maintenance traffic.

Run:  python tools/index_root_smoke.py [docs_millions] 2>/dev/null
Writes nothing to the repo; results go to stdout for SCALING.md.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from fiware_cosmos_orion_flink_connector_examples_spark.operators import text
from fiware_cosmos_orion_flink_connector_examples_spark.session import get_spark
from fiware_cosmos_orion_flink_connector_examples_spark.sources import layout


def _docs(spark, n, offset=0):
    body = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(0), F.pmod(F.xxhash64("id", F.lit(9)), F.lit(30)) + 10),
            lambda i: F.concat(
                F.lit("w"), F.pmod(F.xxhash64(F.col("id"), i), F.lit(50_000))
            ),
        ),
    )
    txt = F.when(
        F.col("id") % 97 == 0, F.concat(F.lit("hash join "), body)
    ).otherwise(body)
    return spark.range(n).select(
        (F.col("id") + F.lit(offset)).alias("doc_id"), txt.alias("text")
    )


def main() -> None:
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    n = m * 1_000_000
    spark = get_spark(app_name="index-root-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="idx_root_smoke_")
    idx = f"{tmp}/idx"

    def run(tag, fn):
        t = time.time()
        fn()
        print(f"{tag:52s} {time.time() - t:.1f}s", flush=True)

    try:
        corpus = _docs(spark, n).localCheckpoint(eager=True)
        print(f"index-root smoke: {m}M docs, 64 buckets")
        run(f"search_index_write ({m}M docs)", lambda: text.search_index_write(
            corpus, idx, n_buckets=64
        ))
        q = spark.createDataFrame(
            [(0, "hash"), (0, "join"), (0, "w100")], "query_id int, term string"
        )
        run("serve: bm25_from_index (pinned root)", lambda: text.bm25_from_index(
            spark, idx, q
        ).write.format("noop").mode("overwrite").save())
        run("serve: phrase_count_from_index", lambda: text.phrase_count_from_index(
            spark, idx, ["hash", "join"]
        ).write.format("noop").mode("overwrite").save())

        # pure-insert batches: wall ∝ batch, never corpus
        for k in (20_000, 200_000):
            batch = _docs(spark, k, offset=n).localCheckpoint(eager=True)
            run(
                f"atomic ingest, pure-insert {k // 1000}k batch",
                lambda b=batch: text.search_index_ingest(
                    spark, b, idx, txn_app="smoke", txn_id=k
                ),
            )
        # changed-doc batch: rewrites only matched buckets (all 64 here —
        # uniformly random doc ids — the honest worst case, printed so
        # SCALING.md can state it rather than hide it)
        changed = _docs(spark, 20_000).select(
            "doc_id", F.concat(F.lit("edited "), F.col("text")).alias("text")
        ).localCheckpoint(eager=True)
        run("atomic ingest, 20k CHANGED docs (matched COW)",
            lambda: text.search_index_ingest(
                spark, changed, idx, txn_app="smoke", txn_id=10**9
            ))
        run("serve: bm25_from_index after maintenance", lambda: text.bm25_from_index(
            spark, idx, q
        ).write.format("noop").mode("overwrite").save())

        latest = layout.index_root_latest(spark, idx)
        root_bytes = os.path.getsize(f"{idx}/_idxroot_v{latest}.json")
        print(f"root versions: {latest}; latest root bytes: {root_bytes}")
        root = layout.index_root_resolve(spark, idx)
        print(f"pinned sub-versions: {root['tables']}; txn: {root['txn']}")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
