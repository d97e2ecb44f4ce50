"""Output-layout writer: the storage-side half of the engine.

At 100 TB, HOW a table is written decides every later read: files per
partition value (small-file explosion vs giant-file stragglers),
within-file ordering (row-group min/max pruning works only on sorted
data), and hive partition columns (partition pruning / DPP).  The
reference has no batch sinks at all (its only sink is HTTP,
Example2.scala:42); this module is the engine's data-lake writer
discipline, regression-tested in tests/test_layout_writer.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fiware_cosmos_orion_flink_connector_examples_spark.functions.hashing import md5int64


def write_clustered(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    sort_cols: list[str],
    files_per_value: int = 1,
    fmt: str = "parquet",
) -> None:
    """Write ``df`` hive-partitioned by ``partition_cols`` with a
    BOUNDED number of files per partition value and rows sorted by
    ``sort_cols`` inside each file.

    Mechanics: repartition on (partition_cols [+ deterministic salt])
    clusters each partition value into exactly ``files_per_value``
    tasks, so each task writes one file per value it holds — no
    thousand-small-files explosion, no single-writer straggler for a
    hot value.  ``sortWithinPartitions`` orders rows inside each file,
    which is what makes parquet row-group min/max statistics
    selective for later range predicates on ``sort_cols``.  The salt
    is a hash of the first sort column — deterministic, so repeated
    runs produce identical layouts."""
    keys = [F.col(c) for c in partition_cols]
    if files_per_value > 1:
        salt = F.pmod(md5int64(F.col(sort_cols[0]).cast("string")), F.lit(files_per_value))
        clustered = df.repartition(*keys, salt.alias("_salt"))
    else:
        clustered = df.repartition(*keys)
    (
        clustered.sortWithinPartitions(*partition_cols, *sort_cols)
        .write.partitionBy(*partition_cols)
        .format(fmt)
        .mode("overwrite")
        .save(path)
    )
