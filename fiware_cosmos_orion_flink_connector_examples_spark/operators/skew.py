"""Skew mitigation: salted two-phase aggregation.

The reference's only shuffle is keyBy(entity id) (Example1.scala:26);
with one hot sensor at 100 TB that key's partition becomes the job.
AQE skew handling (on in session.py) splits oversized partitions at
runtime; this operator is the *explicit* form for aggregations —
pre-shuffle salt → partial agg on (key, salt) → final agg on key —
useful when the aggregate is algebraic and you want deterministic
fan-out regardless of AQE's stats.

Only algebraic aggregates (reassociatable: sum/count/min/max and
anything built from them) are valid here; the API takes the partial
and final expression lists explicitly to keep that contract visible.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key_cols: Sequence[str],
    partial_aggs: Sequence[Column],
    final_aggs: Sequence[Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-proof aggregation.

    ``partial_aggs`` aggregate raw rows per (key, salt); ``final_aggs``
    combine the ≤ n_salts partial rows per key.  Example::

        salted_agg(ev, ["event_type"],
                   [F.sum("value").alias("s"), F.count(F.lit(1)).alias("c")],
                   [F.sum("s").alias("sum_value"), F.sum("c").alias("n")])

    The first shuffle spreads each hot key over ``n_salts`` reducers;
    the second moves ≤ n_salts rows per key.
    """
    # deterministic per-row salt (rand() would resalt rows on task retry)
    salt = F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
    salted = df.withColumn("_salt", salt)
    partial = salted.groupBy(*key_cols, "_salt").agg(*partial_aggs)
    return partial.groupBy(*key_cols).agg(*final_aggs)
