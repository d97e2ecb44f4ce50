"""Streaming-path throughput micro-bench (VERDICT r4 #3).

Drives the full reference-shaped stream end-to-end, all in one process
(the way `files/example1/curl_Notification.sh:28` drives the reference,
but at max rate instead of its fixed 2 s cadence — the reference
publishes no throughput numbers, so these are the path's first):

    feeder threads --HTTP POST--> NgsiHttpReceiver (spool, fsync'd)
        --> orion_http DataSource (Spark 4 Python stream reader)
        --> parse -> flatten -> project -> 5s/2s sliding-window min
        --> NGSI update envelope (O8/O9)
        --> write_http (foreachBatch POST) --> local no-op collector

Reported (one JSON line, mirrors bench.py's tail-safe key order):
  * ingest_events_per_sec   — receiver-side accepted POST rate
  * process_rows_per_sec    — source rows through the windowed agg per
                              second of wall-clock while draining
  * batch_p50_ms / batch_p95_ms — micro-batch triggerExecution latency
                              at the 1 s ProcessingTime trigger (P2)
  * sink_posts              — envelopes actually delivered to the sink

Env knobs: STREAM_BENCH_SECS (feed duration, default 20),
STREAM_BENCH_FEEDERS (default 8), STREAM_BENCH_TRIGGER_SECS (default 1).
Run: python tools/stream_bench.py   (numbers land in SCALING.md)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import threading
import time
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

_REPO = str(Path(__file__).resolve().parents[1])
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def _noop_collector():
    """Local HTTP sink target: 204 every request, count deliveries."""
    counter = {"n": 0}
    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):  # noqa: N802 (http.server API)
            length = int(self.headers.get("Content-Length", 0))
            self.rfile.read(length)
            with lock:
                counter["n"] += 1
            self.send_response(204)
            self.end_headers()

        def log_message(self, *args):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, counter


def _feed(url: str, duration: float, n_threads: int) -> int:
    """POST single-entity NGSI notifications (curl_Notification.sh's
    payload shape) at max rate from ``n_threads`` workers."""
    counts = [0] * n_threads
    stop_at = time.perf_counter() + duration

    def worker(ti: int) -> None:
        i = 0
        while time.perf_counter() < stop_at:
            body = (
                '{"data":[{"id":"Node%d","type":"Node","temperature":'
                '{"type":"Float","value":%0.2f,"metadata":{}}}],'
                '"subscriptionId":"bench"}' % ((ti * 7919 + i) % 50, 20.0 + i % 17)
            )
            req = urllib.request.Request(
                url,
                data=body.encode(),
                method="POST",
                headers={
                    "Content-Type": "application/json",
                    "Fiware-Service": "bench",
                    "Fiware-ServicePath": "/bench",
                },
            )
            try:
                with urllib.request.urlopen(req, timeout=5):
                    counts[ti] += 1
            except OSError:
                pass
            i += 1

    threads = [threading.Thread(target=worker, args=(t,)) for t in range(n_threads)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    return sum(counts)


def run(
    duration: float = 20.0,
    feeders: int = 8,
    trigger_secs: float = 1.0,
    spark=None,
    shuffle_partitions: int | None = None,
) -> dict:
    """``shuffle_partitions`` tunes the stateful shuffle width for the
    streaming query only (state partition count binds from the session
    conf at query start; 32 is right for batch scans but pure overhead
    for micro-batches of a few thousand rows).  Restored afterwards."""
    from pyspark.sql import functions as F

    from fiware_cosmos_orion_flink_connector_examples_spark.operators import ngsi
    from fiware_cosmos_orion_flink_connector_examples_spark.session import get_spark
    from fiware_cosmos_orion_flink_connector_examples_spark.sources.ngsi_http import (
        NgsiHttpReceiver,
        register_orion_source,
    )
    from fiware_cosmos_orion_flink_connector_examples_spark.streaming import jobs
    from fiware_cosmos_orion_flink_connector_examples_spark.streaming.sinks import (
        write_http,
    )

    own_session = spark is None
    if own_session:
        spark = get_spark(app_name="stream_bench")
        spark.sparkContext.setLogLevel("ERROR")
    register_orion_source(spark)

    workdir = tempfile.mkdtemp(prefix="stream_bench_")
    spool = os.path.join(workdir, "spool")
    receiver = NgsiHttpReceiver(spool, port=0).start()
    sink_srv, sink_count = _noop_collector()
    prev_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    if shuffle_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    try:
        stream = (
            spark.readStream.format("orion_http").option("spool_dir", spool).load()
        )
        mins = jobs.streaming_window_min(stream)
        envelopes = mins.select(
            ngsi.to_ngsi_update_json(
                F.col("temperature_min"), "temperature_min", "Float"
            ).alias("content"),
            ngsi.entity_update_url(
                f"http://127.0.0.1:{sink_srv.server_port}/v2/entities/",
                F.col("id"),
            ).alias("url"),
            F.lit("application/json").alias("content_type"),
            F.lit("POST").alias("method"),
        )
        query = write_http(
            envelopes,
            checkpoint_dir=os.path.join(workdir, "ckpt"),
            trigger_secs=trigger_secs,
        )

        feed_t0 = time.perf_counter()
        n_posted = _feed(
            f"http://127.0.0.1:{receiver.port}/notify", duration, feeders
        )
        feed_secs = time.perf_counter() - feed_t0

        # drain: wait until the query has consumed the whole spool (input
        # rate falls to 0 for two consecutive progress reports) or 60 s
        drain_deadline = time.time() + 60
        idle = 0
        while idle < 2 and time.time() < drain_deadline:
            time.sleep(trigger_secs)
            p = query.lastProgress
            idle = idle + 1 if p and p["numInputRows"] == 0 else 0
        progresses = [p for p in query.recentProgress if p is not None]
        query.stop()

        busy = [p for p in progresses if p["numInputRows"] > 0]
        rows_in = sum(p["numInputRows"] for p in busy)
        busy_secs = sum(p["durationMs"]["triggerExecution"] for p in busy) / 1000.0
        lat = sorted(p["durationMs"]["triggerExecution"] for p in busy)
        # Steady-state view (VERDICT r5 #5): batch 0 pays one-off costs
        # (codegen, state-store open, Arrow worker spin-up) that the
        # all-batches p95 was hiding behind — recentProgress is
        # chronological, so dropping the first busy batch isolates the
        # latency a long-running deployment actually sees.
        steady = sorted(
            p["durationMs"]["triggerExecution"] for p in busy[1:]
        )

        def pct(q: float, xs=None) -> float | None:
            xs = lat if xs is None else xs
            if not xs:
                return None
            return float(xs[min(len(xs) - 1, int(q * len(xs)))])

        return {
            "duration_secs": round(feed_secs, 2),
            "feeders": feeders,
            "trigger_secs": trigger_secs,
            "n_batches": len(busy),
            "rows_processed": rows_in,
            "sink_posts": sink_count["n"],
            "batch_p50_ms": pct(0.50),
            "batch_p95_ms": pct(0.95),
            # warm-up batch excluded — the steady-state latency pair
            "steady_p50_ms": pct(0.50, steady),
            "steady_p95_ms": pct(0.95, steady),
            "warmup_batch_ms": float(busy[0]["durationMs"]["triggerExecution"])
            if busy
            else None,
            # receiver-side bound: accepted POSTs per second of feeding
            "ingest_events_per_sec": round(n_posted / feed_secs, 1)
            if feed_secs
            else None,
            # Spark-side bound: source rows chewed per second the
            # micro-batches were actually executing
            "process_rows_per_sec": round(rows_in / busy_secs, 1)
            if busy_secs
            else None,
        }
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_shuffle)
        receiver.stop()
        sink_srv.shutdown()
        sink_srv.server_close()
        shutil.rmtree(workdir, ignore_errors=True)
        if own_session:
            spark.stop()


def main() -> None:
    shuffle = os.environ.get("STREAM_BENCH_SHUFFLE")
    out = run(
        duration=float(os.environ.get("STREAM_BENCH_SECS", "20")),
        feeders=int(os.environ.get("STREAM_BENCH_FEEDERS", "8")),
        trigger_secs=float(os.environ.get("STREAM_BENCH_TRIGGER_SECS", "1")),
        shuffle_partitions=int(shuffle) if shuffle else None,
    )
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
