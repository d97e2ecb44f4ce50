"""SparkSession builder tuned for this engine.

The reference runs a Flink mini-cluster (1 jobmanager + 1 taskmanager,
docker-compose.yml:13-34); our analog is local[N] with AQE on.  All
settings here also make sense on a real multi-executor cluster: AQE
handles skew/partition coalescing at 100 TB, and the broadcast
threshold keeps dimension-table joins shuffle-free.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "fiware-cosmos-orion-flink-connector-examples-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's defaults.

    cpus defaults to $SPARK_GRAFT_CPUS (driver contract) else all cores.
    """
    cpus_s = str(cpus) if cpus else os.environ.get("SPARK_GRAFT_CPUS", "*")
    shuffle = str(shuffle_partitions or os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus_s}]")
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # driver testdata ships nanosecond parquet timestamps (events.ts)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()


def enable_rocksdb_state_store(spark: SparkSession) -> SparkSession:
    """Switch Structured Streaming state to the RocksDB provider —
    state spills to local disk instead of living on the JVM heap, the
    difference between O(heap) and O(disk) live keys for high-
    cardinality windowed/sessionized streams.  Runtime-settable; takes
    effect for newly started queries."""
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true"
    )
    return spark


def _ship_package(spark: SparkSession) -> None:
    """Make this package importable on executor Python workers.

    Workers spawn with PYTHONPATH from the environment, NOT the
    driver's runtime sys.path — a driver launched outside the repo can
    import the package (after sys.path.insert) while its pandas-UDF
    closures die on workers with ModuleNotFoundError (observed live).
    Shipping a zip via addPyFile is the standard fix and covers every
    Arrow/pandas stage."""
    if getattr(spark, "_engine_pkg_shipped", False):
        return
    import tempfile
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    zpath = os.path.join(
        tempfile.gettempdir(), f"spark_ngsi_engine_pkg_{os.getpid()}.zip"
    )
    if not os.path.exists(zpath):
        tmp = zpath + ".tmp"
        with zipfile.ZipFile(tmp, "w") as z:
            for dirpath, _, files in os.walk(pkg_dir):
                for fn in files:
                    if fn.endswith(".py"):
                        full = os.path.join(dirpath, fn)
                        z.write(full, os.path.relpath(full, root))
        os.replace(tmp, zpath)
    spark.sparkContext.addPyFile(zpath)
    spark._engine_pkg_shipped = True


def ensure_engine_confs(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs this engine depends on to a session
    we did not build (the driver passes its own SparkSession to
    ``entry``/``queries``).  Only touches runtime-safe SQL confs, plus
    ships the package zip to executor Python workers.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    _ship_package(spark)
    return spark
