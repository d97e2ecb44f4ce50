"""The five reference jobs as pure DataFrame transforms.

Each function maps a DataFrame of raw notification rows
(payload STRING [, ts TIMESTAMP, service, servicePath]) to the job's
result DataFrame.  Because they are pure transforms they run
unchanged on a batch DataFrame (driver correctness path) or a
readStream DataFrame (with watermark added by the caller) — the
Structured Streaming unification (SIGMOD'18).

Job shapes (reference):
  Example1 (Example1.scala:14-33): source -> flatMap entities -> map
    Temp_Node(id, temperature) -> keyBy(id) -> timeWindow(5,2) ->
    min(temperature) -> print
  Example2/3 (Example2.scala:17-47): same through min, then
    OrionSinkObject(json, URL_CB + id + "/attrs", JSON, POST) ->
    OrionSink + print(content)
  Example4 (Example4.scala:17-35): custom AverageAggregate (sum,count)
    -> windowed avg
  Example5 (Example5.scala:14-37): nested information.value ->
    explode buses -> Bus(name, price) -> keyBy(name) ->
    timeWindow(5,2) -> min(price)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fiware_cosmos_orion_flink_connector_examples_spark.operators.ngsi import (
    entity_update_url,
    explode_buses,
    flatten_entities,
    parse_notifications,
    project_temp_nodes,
    to_ngsi_update_json,
)
from fiware_cosmos_orion_flink_connector_examples_spark.operators.windows import (
    sliding_window_agg,
)


def example1(df: DataFrame, size: str = "5 seconds", slide: str = "2 seconds") -> DataFrame:
    """Windowed min temperature per entity id -> (window_start, id, temperature_min)."""
    nodes = project_temp_nodes(flatten_entities(parse_notifications(df)))
    return sliding_window_agg(
        nodes, "ts", ["id"], [F.min("temperature").alias("temperature_min")],
        size=size, slide=slide,
    )


def example2(
    df: DataFrame,
    url_cb: str = "http://localhost:1026/v2/entities/",
    size: str = "5 seconds",
    slide: str = "2 seconds",
) -> DataFrame:
    """Example1 + sink envelope: (content, url, content_type, method)
    ready for the HTTP sink (OrionSinkObject, Example2.scala:35-38)."""
    mins = example1(df, size=size, slide=slide)
    return mins.select(
        to_ngsi_update_json(F.col("temperature_min"), "temperature_min", "Float").alias("content"),
        entity_update_url(url_cb, F.col("id")).alias("url"),
        F.lit("application/json").alias("content_type"),
        F.lit("POST").alias("method"),
    )


def example3(df: DataFrame, **kw) -> DataFrame:
    """Byte-identical to example2 except the in-cluster broker address
    (Example3.scala:13) — environment addressing is a parameter here,
    not code."""
    return example2(df, url_cb=kw.pop("url_cb", "http://orion:1026/v2/entities/"), **kw)


def example4(df: DataFrame, size: str = "5 seconds", slide: str = "2 seconds") -> DataFrame:
    """Windowed average temperature (the custom incremental
    AverageAggregate, Example4.scala:39-49 — add/merge/getResult ≙
    Spark's partial/merge/final agg phases, built-in avg)."""
    nodes = project_temp_nodes(flatten_entities(parse_notifications(df)))
    return sliding_window_agg(
        nodes, "ts", ["id"], [F.avg("temperature").alias("temperature_avg")],
        size=size, slide=slide,
    )


def example5(df: DataFrame, size: str = "5 seconds", slide: str = "2 seconds") -> DataFrame:
    """Nested bus pipeline: windowed min price per bus company
    (Example5.scala:20-30)."""
    buses = explode_buses(flatten_entities(parse_notifications(df)))
    return sliding_window_agg(
        buses, "ts", ["name"], [F.min("price").alias("price_min")],
        size=size, slide=slide,
    )
