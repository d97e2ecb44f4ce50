"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (Example1's keyed sliding-
window min, SURVEY.md §7 milestone 0) at sf0.001.  ``queries()`` /
``oracle_sql()`` expose the full registry in
fiware_cosmos_orion_flink_connector_examples_spark.plans.registry —
one entry per implemented SURVEY.md §2 operator, with matching DuckDB
oracle SQL where the semantics are ANSI-SQL-expressible.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from fiware_cosmos_orion_flink_connector_examples_spark.plans.registry import (  # noqa: E402
    QUERIES,
    oracle_sql_map,
    query_map,
)
from fiware_cosmos_orion_flink_connector_examples_spark.session import (  # noqa: E402
    ensure_engine_confs,
)

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    ensure_engine_confs(spark)
    return QUERIES["ngsi_window_min"].fn(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_engine_confs(spark)
            return fn(spark, sf_dir)

        run.__doc__ = fn.__doc__
        return run

    return {name: wrap(fn) for name, fn in query_map().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query (omitted ⇒ rows-only check)."""
    return oracle_sql_map()
