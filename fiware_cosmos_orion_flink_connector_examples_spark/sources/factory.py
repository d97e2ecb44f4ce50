"""Notification-stream factory: one entry point, three transports.

The reference hard-codes its transport (OrionSource on a port,
Example1.scala:17).  Here the pipeline code is transport-agnostic —
every source yields the same notification-row schema (payload STRING,
service, servicePath, ts TIMESTAMP) so the Example1-5 transforms run
unchanged on any of:

  * ``orion_http`` — the custom HTTP DataSource (local receiver+spool)
  * ``spool``      — a JSON-lines directory via the built-in json source
  * ``kafka``      — Spark's Kafka source (value = notification JSON;
    the production transport once an LB fronts the receiver tier).
    Untested in this container (no broker) but the mapping is one
    select away from the kafka source's fixed schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fiware_cosmos_orion_flink_connector_examples_spark.sources.ngsi_http import (
    register_orion_source,
    spool_stream_df,
)


def notification_stream(
    spark: SparkSession, transport: str = "orion_http", **options
) -> DataFrame:
    """Build the notification stream for the given transport.  Options
    pass through (orion_http: spool_dir/attrs/condition/maxBatchRows;
    kafka: kafka.bootstrap.servers/subscribe/...)."""
    if transport == "orion_http":
        register_orion_source(spark)
        reader = spark.readStream.format("orion_http")
        for k, v in options.items():
            reader = reader.option(k, v)
        return reader.load()
    if transport == "spool":
        return spool_stream_df(spark, options["spool_dir"])
    if transport == "kafka":
        reader = spark.readStream.format("kafka")
        for k, v in options.items():
            reader = reader.option(k, v)
        raw = reader.load()
        # kafka value bytes = the NGSI POST body; headers carry the
        # Fiware context if the producer forwards them
        return raw.select(
            F.col("value").cast("string").alias("payload"),
            F.lit("").alias("service"),
            F.lit("").alias("servicePath"),
            F.col("timestamp").alias("ts"),
        )
    raise ValueError(f"unknown transport {transport!r}; one of orion_http|spool|kafka")
