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


def resample_locf(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    id_col: str,
    step_secs: int,
) -> DataFrame:
    """Fixed-grid resample per ``key`` with last-observation-carried-
    forward (LOCF): one output row per ``step_secs`` bin between each
    key's first and last observation, carrying the latest observed
    ``value_col`` forward through empty bins.  The gap-fill/downsample
    op every time-series store ships (``date_bin`` + fill); stock Spark
    has no built-in, so it's composed here.

    Within-bin "last" is the max of (ts, id) — ``id_col`` must be
    unique so ties at the same timestamp are deterministic in any
    engine.  The carried value is copied verbatim (no arithmetic), so
    results are bit-exact across engines.

    Scale shape: three keyed exchanges, all on (key[, bin]) — per-bin
    last is a map-side-combinable agg on (key, bin); the span frame is
    one row per key; the grid explode emits span/step rows per key
    (bounded by the caller's step choice, NOT by data volume); the LOCF
    fill is one frameless window per key whose partition width is that
    same bounded grid.  No global sort, no inequality join; skew bound
    = longest single-key span / step.

    Output: (key, bin_ts epoch-seconds, value_locf, is_observed).
    """
    step_us = step_secs * 1_000_000
    us = F.unix_micros(F.col(ts_col))
    obs = df.select(
        F.col(key),
        F.floor(us / F.lit(step_us)).alias("_bin"),
        us.alias("_us"),
        F.col(id_col).alias("_id"),
        F.col(value_col).alias("_v"),
    )
    per_bin = obs.groupBy(key, "_bin").agg(
        F.max(F.struct("_us", "_id", "_v")).getField("_v").alias("_last_v")
    )
    spans = per_bin.groupBy(key).agg(
        F.min("_bin").alias("_lo"), F.max("_bin").alias("_hi")
    )
    grid = spans.select(
        F.col(key), F.explode(F.sequence("_lo", "_hi")).alias("_bin")
    )
    w = (
        Window.partitionBy(key)
        .orderBy("_bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        grid.join(per_bin, [key, "_bin"], "left")
        .withColumn("_fill", F.last("_last_v", ignorenulls=True).over(w))
        .select(
            F.col(key),
            (F.col("_bin") * F.lit(step_secs)).cast("long").alias("bin_ts"),
            F.col("_fill").alias("value_locf"),
            F.col("_last_v").isNotNull().alias("is_observed"),
        )
    )


def transition_counts(
    df: DataFrame,
    key: str,
    ts_col: str,
    state_col: str,
    id_col: str,
) -> DataFrame:
    """First-order Markov transition matrix over per-``key`` ordered
    state sequences: for each (prev_state, next_state) pair, the count
    of adjacent occurrences and the row-normalized probability.
    Ordering ties on ``ts_col`` break by ``id_col`` (unique), so the
    sequence — and therefore the matrix — is engine-deterministic.

    Scale shape: one exchange on ``key`` for the lag window (partition
    width = one key's history), then a map-side-combinable count agg on
    the (prev, next) pair — 2 exchanges total, the second over
    |states|² rows.  The row-sum normalizer is a second frameless
    window over the tiny matrix, not a join.
    """
    w = Window.partitionBy(key).orderBy(ts_col, id_col)
    pairs = (
        df.select(
            F.col(key),
            F.col(ts_col),
            F.col(id_col),
            F.col(state_col).alias("next_state"),
        )
        .withColumn("prev_state", F.lag("next_state").over(w))
        .filter(F.col("prev_state").isNotNull())
    )
    counts = pairs.groupBy("prev_state", "next_state").agg(
        F.count(F.lit(1)).alias("n")
    )
    wrow = Window.partitionBy("prev_state")
    return counts.select(
        "prev_state",
        "next_state",
        "n",
        F.round(F.col("n") / F.sum("n").over(wrow), 6).alias("p"),
    )
