"""Temporal join operators the reference (and stock Spark SQL) lack:
as-of join and bounded range join — expressed as compositions of
DataFrame ops, never an inequality theta-join.

Scale shapes:
  * ``asof_join`` uses the union/sort/last-non-null formulation: tag
    both inputs, union, one window sort per key, carry the most recent
    right payload forward.  Cost is ONE shuffle+sort of |L|+|R| rows —
    versus the naive ``l.ts >= r.ts`` theta-join, which Spark executes
    as a broadcast-nested-loop (O(|L|·|R|) at 100 TB, a non-starter).
    This is the standard kdb/pandas merge_asof semantics distributed.
  * ``range_pairs`` buckets time into ``horizon``-sized cells and
    equi-joins on (key, cell) with each left row probing its own and
    the previous cell — candidates are bounded by cell co-residency,
    then the exact |Δt| ≤ horizon predicate filters.  Equi-join + AQE
    instead of an unbounded interval explosion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    how: str = "inner",
) -> DataFrame:
    """For every left row, attach ``payload_cols`` from the right row
    with the greatest ``right_ts`` <= ``left_ts`` within the same
    ``on`` key (backward as-of; equal timestamps match).

    ``right`` must be unique per (on, right_ts) — pre-deduplicate,
    otherwise which duplicate wins is tie-ambiguous in ANY engine.
    ``how='left'`` keeps unmatched left rows with NULL payload.

    DuckDB twin: ``left ASOF [LEFT] JOIN right ON l.on = r.on AND
    l.left_ts >= r.right_ts``.
    """
    payload = F.struct(*[F.col(c) for c in payload_cols]).alias("_match")
    r = right.select(
        F.col(on), F.col(right_ts).alias("_ts"), F.lit(0).alias("_side"), payload
    )
    match_type = r.schema["_match"].dataType
    l = left.select(
        *left.columns,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(match_type).alias("_match"),
    )
    u = l.unionByName(r, allowMissingColumns=True)
    # right rows sort BEFORE left rows at the same _ts (_side 0 < 1), so
    # an equal-timestamp right row is visible to the left row — the
    # inclusive ('>=') as-of convention
    w = (
        Window.partitionBy(on)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = u.withColumn("_m", F.last("_match", ignorenulls=True).over(w)).filter(
        F.col("_side") == 1
    )
    if how == "inner":
        matched = matched.filter(F.col("_m").isNotNull())
    elif how != "left":
        raise ValueError(f"asof_join: how must be 'inner' or 'left', got {how!r}")
    return matched.select(
        *left.columns, *[F.col(f"_m.{c}").alias(c) for c in payload_cols]
    )


def range_pairs(
    df: DataFrame,
    key: str,
    ts_col: str,
    horizon_secs: int,
    id_col: str,
) -> DataFrame:
    """Pairs of rows with the same ``key`` whose timestamps lie within
    ``horizon_secs`` of each other (earlier row first, self excluded).

    Bucketing: cell = floor(epoch/horizon); a pair within the horizon
    is either in the same cell or in adjacent cells, so the LEFT side
    probes (cell, cell+1) — an equi-join on (key, cell) with exactly 2
    probe rows per left row, then the exact Δt filter.  No inequality
    join, no unbounded candidate set."""
    us = F.unix_micros(F.col(ts_col))
    horizon_us = horizon_secs * 1_000_000
    base = df.select(
        F.col(key),
        F.col(id_col),
        us.alias("_us"),
        F.floor(us / horizon_us).alias("_cell"),
    )
    a = base.select(
        F.col(key),
        F.col(id_col).alias("id1"),
        F.col("_us").alias("us1"),
        F.explode(F.array(F.col("_cell"), F.col("_cell") + 1)).alias("_cell"),
    )
    b = base.select(
        F.col(key), F.col(id_col).alias("id2"), F.col("_us").alias("us2"), "_cell"
    )
    # no distinct needed: the right row carries ONE cell, the left row
    # probes two distinct cells — each qualifying pair matches exactly once
    return (
        a.join(b, [key, "_cell"])
        .filter(
            (F.col("us1") < F.col("us2"))
            | ((F.col("us1") == F.col("us2")) & (F.col("id1") < F.col("id2")))
        )
        .filter(F.col("us2") - F.col("us1") <= horizon_us)
        .select(key, "id1", "id2", (F.col("us2") - F.col("us1")).alias("gap_us"))
    )
