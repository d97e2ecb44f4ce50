"""Sinks: HTTP write-back (O10, the reference's ``OrionSink``) and
console (O11).

Reference semantics: each record carries (content, url, content_type,
method) — ``OrionSinkObject`` (Example2.scala:35-42); the sink POSTs /
PUTs / PATCHes content to url (`README.md:322-327`).  Delivery is
fire-and-forget there; we provide at-least-once via foreachBatch (a
retried batch re-sends — pair with PATCH upserts for idempotence,
SURVEY.md §7 'hard parts' #5).

Implementation: ``foreachBatch`` → ``foreachPartition`` → pooled
stdlib HTTP connections per partition (no driver collect; N partitions
post in parallel, the Flink sink's parallelism knob ≙ partition count).
"""

from __future__ import annotations

import urllib.error
import urllib.request
from collections.abc import Iterator

from pyspark.sql import DataFrame


def post_partition(rows: Iterator, timeout: float = 5.0, max_retries: int = 2) -> None:
    """Executor-side worker: POST each row's content to its url.
    Row contract: content, url, content_type, method columns."""
    for row in rows:
        data = row["content"].encode("utf-8")
        req = urllib.request.Request(
            row["url"],
            data=data,
            method=row["method"],
            headers={"Content-Type": row["content_type"]},
        )
        for attempt in range(max_retries + 1):
            try:
                with urllib.request.urlopen(req, timeout=timeout):
                    break
            except urllib.error.URLError:
                if attempt == max_retries:
                    raise


def http_sink_batch(batch_df: DataFrame, batch_id: int) -> None:
    """foreachBatch hook: fan the micro-batch out over its partitions."""
    batch_df.foreachPartition(post_partition)


def write_http(
    df: DataFrame,
    checkpoint_dir: str,
    trigger_secs: float | None = None,
    output_mode: str = "update",
):
    """Attach the HTTP sink to a streaming DataFrame of sink envelopes.
    ``trigger_secs`` is the P2 throttling analog (Orion subscription
    ``throttling: 5`` ≙ ProcessingTime trigger).

    ``update`` output mode is the default on purpose: it re-POSTs a
    (key, window) row whenever a micro-batch changes it — the closest
    match to Flink's per-pane emission (Example1.scala:27-28); with
    ``append`` a windowed agg only reaches the broker after the
    watermark closes the window."""
    w = (
        df.writeStream.foreachBatch(http_sink_batch)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_secs:
        w = w.trigger(processingTime=f"{int(trigger_secs)} seconds")
    return w.start()


def write_http_and_console(
    df: DataFrame, checkpoint_dir: str, output_mode: str = "update"
):
    """Example2's multi-consumer DAG (the same stream feeds OrionSink
    AND print, Example2.scala:42,45): one foreachBatch persists the
    micro-batch, then both consumers read the cached result — one
    source scan, two sinks, exactly the reference's fan-out."""

    def both(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.persist()
        try:
            batch_df.select("content").show(truncate=False)  # O12 projection
            batch_df.foreachPartition(post_partition)
        finally:
            batch_df.unpersist()

    return (
        df.writeStream.foreachBatch(both)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def write_console(df: DataFrame, output_mode: str = "update", serialize: bool = True):
    """O11: console sink.  ``serialize=True`` ≙ the reference's
    ``.print().setParallelism(1)`` — coalesce to one writer so output
    interleaves deterministically."""
    out = df.coalesce(1) if serialize else df
    return out.writeStream.outputMode(output_mode).format("console").start()
