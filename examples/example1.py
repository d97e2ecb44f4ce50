"""Example1 analog (Example1.scala:12-36): NGSI ingest → flatten →
Temp_Node(id, temperature) → keyed 5s/2s sliding window → min → console."""

from _runner import base_args, run_until_interrupt, start

from fiware_cosmos_orion_flink_connector_examples_spark.streaming.jobs import (
    streaming_window_min,
)
from fiware_cosmos_orion_flink_connector_examples_spark.streaming.sinks import (
    write_console,
)

if __name__ == "__main__":
    args = base_args(__doc__).parse_args()
    spark, stream, receiver = start(args)
    mins = streaming_window_min(stream)
    run_until_interrupt(write_console(mins), receiver)
