"""PySpark-native analytics engine with the capability surface of
``ging/fiware-cosmos-orion-flink-connector-examples``.

The reference (at /root/reference, read-only) is a set of five Flink
DataStream jobs: NGSI-v2 HTTP ingest -> flatten -> project/cast ->
keyBy -> sliding time window -> min / custom incremental avg ->
HTTP / console sink.  This package re-expresses that surface
Spark-first (DataFrame + Structured Streaming + Catalyst), plus the
LLM-data-pipeline extension operators (dedup, similarity search,
multimodal columns, text analysis) mandated by BASELINE.json.

Layout:
    sources/    parquet table loaders, NGSI streaming source, spool source
    operators/  ngsi parse/flatten/cast, sliding windows, dedup,
                similarity, text analysis, multimodal
    functions/  scalar/aggregate column-expression helpers
    plans/      the query registry driving __spark_entry__.py
    streaming/  Structured Streaming pipelines (Example1..5 analogs)
"""

__version__ = "0.1.0"

from fiware_cosmos_orion_flink_connector_examples_spark.session import get_spark  # noqa: F401
