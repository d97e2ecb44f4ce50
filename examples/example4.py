"""Example4 analog (Example4.scala:12-52): windowed incremental average
— the custom AverageAggregate's (sum, count) accumulator is exactly
Spark's partial+final avg (see functions/udaf.py for the genuinely
custom-aggregate escape hatch)."""

from _runner import base_args, run_until_interrupt, start

from fiware_cosmos_orion_flink_connector_examples_spark.streaming.jobs import (
    streaming_window_avg,
)
from fiware_cosmos_orion_flink_connector_examples_spark.streaming.sinks import (
    write_console,
)

if __name__ == "__main__":
    args = base_args(__doc__).parse_args()
    spark, stream, receiver = start(args)
    run_until_interrupt(write_console(streaming_window_avg(stream)), receiver)
