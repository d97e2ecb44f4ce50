from fiware_cosmos_orion_flink_connector_examples_spark.plans.registry import (  # noqa: F401
    QUERIES,
    QuerySpec,
    oracle_sql_map,
    query_map,
)
