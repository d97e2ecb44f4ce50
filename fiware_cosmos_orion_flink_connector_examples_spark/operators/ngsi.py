"""NGSI-v2 notification data model + parse layer (SURVEY.md §1).

Reference semantics: one HTTP POST body = one NgsiEvent carrying
`subscriptionId` + `data: [entity...]`, each entity `{id, type,
<attrName>: {type, value, metadata}, ...}` with `value: Any`
(files/example1/curl_Notification.sh:12-25).  Every read site casts
the dynamic value explicitly — `.value.asInstanceOf[Number]
.floatValue()` (Example1.scala:23), `.asInstanceOf[Map[String,Any]]`
(Example5.scala:22).

Spark mapping: attribute values are polymorphic, so `data` parses to
ARRAY<MAP<STRING, STRING>> — each map value holds the attribute's raw
JSON text (Spark's from_json keeps nested objects as JSON strings when
the target type is STRING), and every access casts on read via
get_json_object / from_json, mirroring the reference's asInstanceOf
sites one-for-one.  All functions here are pure Column/DataFrame
transforms: they run identically on batch DataFrames and on
readStream DataFrames (Structured Streaming's unification), and stay
entirely inside whole-stage codegen — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    MapType,
    StringType,
    StructField,
    StructType,
)

# Raw notification shape (files/example1/curl_Notification.sh:12-25).
# Entities parse to MAP<STRING,STRING>: scalar keys (id, type) come
# through as plain strings, attribute objects as their raw JSON text.
NOTIFICATION_SCHEMA = StructType(
    [
        StructField("subscriptionId", StringType()),
        StructField("data", ArrayType(MapType(StringType(), StringType()))),
    ]
)

# Example5's structured attribute value (files/example5/curl_Notification.sh:17-42):
# information.value = {buses: [{name, schedule{morning,afternoon,night}, price}]}
BUS_SCHEDULE_SCHEMA = StructType(
    [
        StructField("morning", ArrayType(IntegerType())),
        StructField("afternoon", ArrayType(IntegerType())),
        StructField("night", ArrayType(IntegerType())),
    ]
)
BUS_SCHEMA = StructType(
    [
        StructField("name", StringType()),
        StructField("schedule", BUS_SCHEDULE_SCHEMA),
        StructField("price", IntegerType()),
    ]
)
BUSES_VALUE_SCHEMA = StructType([StructField("buses", ArrayType(BUS_SCHEMA))])


def pruned_notification_schema(attrs: list[str]) -> StructType:
    """P1 pushdown analog for the BATCH parse path: the subscription's
    ``notification.attrs`` projection (curl_SubscribeToEntityNotifications
    .sh:22-25) declared at parse time.  Entities parse to a STRUCT with
    only (id, type, <attr>.value) — the Jackson parser still tokenizes
    the payload but skips materializing the attrs MAP and every
    non-projected attribute's raw JSON text.  Measured on
    ngsi_parse_project at sf0.1: 2.37 s (full MAP) → 1.05 s (pruned),
    identical result hash."""
    attr_struct = StructType([StructField("value", StringType())])
    entity = StructType(
        [StructField("id", StringType()), StructField("type", StringType())]
        + [StructField(a, attr_struct) for a in attrs]
    )
    return StructType(
        [
            StructField("subscriptionId", StringType()),
            StructField("data", ArrayType(entity)),
        ]
    )


def parse_notifications(
    df: DataFrame,
    payload_col: str = "payload",
    service_col: str | None = "service",
    service_path_col: str | None = "servicePath",
    ts_col: str | None = "ts",
    attrs: list[str] | None = None,
) -> DataFrame:
    """Raw payload strings -> parsed notification rows.

    Keeps the HTTP context columns (Fiware-Service / Fiware-ServicePath
    headers, curl_Notification.sh:10-11) and the ingest timestamp when
    present; injects processing time otherwise (the reference's Flink
    1.9 windows are processing-time, pom.xml:48).

    ``attrs`` opts into the pruned-schema parse (P1 pushdown analog,
    see pruned_notification_schema): entities become typed structs
    holding only the projected attributes instead of the dynamic
    MAP<STRING,STRING>.  Downstream accessors (entity_id,
    project_temp_nodes) handle both shapes.
    """
    schema = pruned_notification_schema(attrs) if attrs else NOTIFICATION_SCHEMA
    keep = [c for c in (service_col, service_path_col, ts_col) if c and c in df.columns]
    out = df.select(F.from_json(payload_col, schema).alias("_n"), *keep)
    out = out.select(
        F.col("_n.subscriptionId").alias("subscriptionId"),
        F.col("_n.data").alias("entities"),
        *keep,
    )
    if ts_col and ts_col not in out.columns:
        out = out.withColumn(ts_col, F.current_timestamp())
    return out


def flatten_entities(df: DataFrame, entities_col: str = "entities") -> DataFrame:
    """One notification -> N entity rows (O2, `flatMap(event => event.entities)`,
    Example1.scala:21).  Narrow op — no shuffle; fuses into the scan stage."""
    other = [c for c in df.columns if c != entities_col]
    return df.select(*other, F.explode(entities_col).alias("entity"))


def entity_id(entity: Column | str = "entity") -> Column:
    return F.col(entity)["id"] if isinstance(entity, str) else entity["id"]


def entity_type(entity: Column | str = "entity") -> Column:
    return F.col(entity)["type"] if isinstance(entity, str) else entity["type"]


def attr_raw(entity: Column | str, name: str) -> Column:
    """The attribute's raw JSON text `{"type":...,"value":...,"metadata":...}`
    — the Any-typed value before any cast (entity.attrs(name), Example1.scala:23)."""
    e = F.col(entity) if isinstance(entity, str) else entity
    return e[name]


def attr_value(entity: Column | str, name: str, dtype: str = "double") -> Column:
    """Projection + cast (O3): attrs(name).value.asInstanceOf[Number]
    (Example1.scala:22-25).  Missing attribute or non-numeric value
    yields NULL (SQL semantics) — the reference throws
    NoSuchElementException instead (SURVEY.md §5); null-and-filter is
    our documented policy.  try_cast, not cast: under ANSI mode
    (Spark 4 default) a plain cast THROWS on non-numeric values,
    killing the stream on one bad payload."""
    return F.get_json_object(attr_raw(entity, name), "$.value").try_cast(dtype)


def attr_value_struct(entity: Column | str, name: str, schema: StructType) -> Column:
    """Nested-object navigation (O13): attrs(name).value as a typed
    struct (Example5.scala:21-23 `asInstanceOf[Map[String,Any]]`)."""
    return F.from_json(F.get_json_object(attr_raw(entity, name), "$.value"), schema)


def explode_buses(df: DataFrame, entity_col: str = "entity") -> DataFrame:
    """Example5's full nested pipeline (O13+O14+O15): navigate
    information.value -> explode buses -> typed Bus(name, price) with
    the BigInt->Int narrowing (Example5.scala:21-27).  One select:
    Catalyst fuses json-parse + explode + field access into a single
    pre-shuffle stage (SURVEY.md §3.3)."""
    other = [c for c in df.columns if c != entity_col]
    buses = attr_value_struct(entity_col, "information", BUSES_VALUE_SCHEMA)["buses"]
    return df.select(*other, F.explode(buses).alias("bus")).select(
        *other,
        F.col("bus.name").alias("name"),
        F.col("bus.price").cast("int").alias("price"),
        F.col("bus.schedule").alias("schedule"),
    )


def project_temp_nodes(df: DataFrame, attr: str = "temperature") -> DataFrame:
    """Examples 1-4's Temp_Node projection: (id, temperature)
    (Example1.scala:22-25, case class at :35).  Rows whose entity lacks
    the attribute are dropped (see attr_value null policy).  Handles
    both entity shapes: the dynamic MAP (attribute = raw JSON text,
    value via get_json_object) and the pruned STRUCT from the P1
    pushdown parse (value = direct field access, no JSON re-parse)."""
    other = [c for c in df.columns if c != "entity"]
    if isinstance(df.schema["entity"].dataType, StructType):
        val = F.col("entity")[attr]["value"].try_cast("double")
    else:
        val = attr_value("entity", attr, "double")
    return df.select(
        *other,
        entity_id("entity").alias("id"),
        val.alias(attr),
    ).filter(F.col(attr).isNotNull())


def to_ngsi_update_json(value: Column, attr_name: str, ngsi_type: str = "Float") -> Column:
    """O8: record -> NGSI update payload, byte-compatible with the
    reference's hand-built string (Example2.scala:49-51:
    '{"temperature_min": { "value":<v>, "type": "Float"}}')."""
    return F.concat(
        F.lit('{"%s": { "value":' % attr_name),
        value.cast("string"),
        F.lit(', "type": "%s"}}' % ngsi_type),
    )


def entity_update_url(base_url: Column | str, entity_id_col: Column) -> Column:
    """O9: per-record URL construction URL_CB + id + "/attrs"
    (Example2.scala:35-38)."""
    base = F.lit(base_url) if isinstance(base_url, str) else base_url
    return F.concat(base, entity_id_col, F.lit("/attrs"))
