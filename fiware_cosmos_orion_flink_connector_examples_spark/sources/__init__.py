from fiware_cosmos_orion_flink_connector_examples_spark.sources.tables import (  # noqa: F401
    TABLE_NAMES,
    load_table,
    load_tables,
)
