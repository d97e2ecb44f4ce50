"""INCREMENTAL VIEW MAINTENANCE (IVM) over the snapshot CDC feed: a
materialized GROUP BY count/sum view that follows its source table
commit-by-commit in O(changed rows), never recomputing a group.

The algebra: with the commit's post-image rows (`snapshot_changes_feed`)
AND its update pre-images (`snapshot_update_preimages`, recorded in the
same changelog write), every change becomes a uniform signed
contribution —

    insert          → (+1 row,  +new values)   into its group
    update (post)   → (+1 row,  +new values)   into the NEW group
    update_pre      → (−1 row,  −old values)   out of the OLD group
    delete          → (−1 row,  −old values)   out of its group

— so a group-changing update is handled for free, and the view merge
touches only groups with a non-zero delta.  A group whose maintained
row count reaches zero is DELETED from the view (no ghost groups).

Exactly-once without a separate cursor: the view is itself a keyed
snapshot table whose transaction watermark (per ``txn_app``) is the
LAST CONSUMED SOURCE VERSION — the delta merge and the watermark
advance are one atomic commit, so a crashed/replayed sync either
happened entirely or not at all (``SnapshotTxnAlreadyApplied`` absorbs
redelivery), the ``search_index_sync`` contract applied to aggregates.

Scale shape: per sync, read O(changed rows) from the span's change
logs, one shuffle to aggregate deltas by group, one BUCKET-PRUNED read
of the view's touched groups (the touched keys hash to ≤ n_buckets
bucket ids — view-side cost tracks the delta, not the view), one
bucket-pruned COW merge.  Nothing scans the source table after the
initial materialization.

Limits (stated, not hidden): count/sum only — min/max are not
incrementally maintainable under deletes without per-group recompute;
float sums drift under repeated ± (use scaled integers, the engine's
cents convention); NULL values contribute 0 to sums (view sums are
COALESCE(x, 0) semantics, paired with the maintained row count).
A truncate/overwrite in the span raises ``SnapshotTruncateInFeed`` —
re-materialize with ``agg_view_create`` at a fresh path.

Reference scope note: the reference repo (226 lines of Flink demo
Scala) has no storage or view layer; [ext] infrastructure for the
mandated training-data pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fiware_cosmos_orion_flink_connector_examples_spark.sources import layout

_GKEY = "_gkey"
_NROWS = "_n"
_SEP = "\x1f"
_NULL = "\x00null"


def _group_key(group_cols: list[str]):
    # null-safe composite key: NULL and '' must not collide
    return F.concat_ws(
        _SEP,
        *[F.coalesce(F.col(c).cast("string"), F.lit(_NULL)) for c in group_cols],
    ).alias(_GKEY)


def _sum_name(c: str) -> str:
    return f"sum_{c}"


def agg_view_create(
    spark,
    source_path: str,
    view_path: str,
    group_cols: list[str],
    sum_cols: list[str],
    txn_app: str = "agg-view",
    n_buckets: int = 8,
) -> int:
    """Materialize the initial count/sum view from the source table's
    CURRENT version and stamp that version as the view's consumed
    watermark — later ``agg_view_sync`` calls pick up exactly after
    it.  The view is a keyed snapshot table (key = the null-safe
    composite group key; group columns kept as data), so it has time
    travel, CDC, and merge semantics of its own.  Returns the view's
    committed version (1)."""
    src_version = layout.snapshot_latest_version(spark, source_path)
    if src_version <= 0:
        raise ValueError(f"agg_view_create: no committed source at {source_path}")
    src = layout.snapshot_read(spark, source_path, src_version)
    rows = src.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias(_NROWS),
        *[
            F.sum(F.coalesce(F.col(c), F.lit(0))).alias(_sum_name(c))
            for c in sum_cols
        ],
    )
    rows = rows.select(_group_key(group_cols), *rows.columns)
    return layout.snapshot_write_keyed(
        spark,
        rows,
        view_path,
        _GKEY,
        n_buckets=n_buckets,
        _txn_update={txn_app: src_version},
    )


def _span_deltas(
    spark,
    source_path: str,
    consumed: int,
    latest: int,
    group_cols: list[str],
    sum_cols: list[str],
) -> DataFrame:
    """Signed per-group contributions of every commit in (consumed,
    latest] — post-images count positive, pre-images and deletes
    negative."""
    feed = layout.snapshot_changes_feed(spark, source_path, consumed, latest)
    pre = None
    for v in range(consumed + 1, latest + 1):
        p = layout.snapshot_update_preimages(spark, source_path, v)
        pre = p if pre is None else pre.unionByName(p)

    def _signed(df: DataFrame, sign: int) -> DataFrame:
        return df.select(
            *group_cols,
            F.lit(sign).alias("_dn"),
            *[
                (F.coalesce(F.col(c), F.lit(0)) * sign).alias(_sum_name(c))
                for c in sum_cols
            ],
        )

    plus = _signed(feed.filter(F.col("_change").isin("insert", "update")), 1)
    minus = _signed(feed.filter(F.col("_change") == "delete"), -1)
    out = plus.unionByName(minus)
    if pre is not None:
        out = out.unionByName(_signed(pre, -1))
    return out


def _touched_view_rows(
    spark, view_path: str, view_version: int, agg: DataFrame, sum_cols: list[str]
) -> DataFrame:
    """Current totals of the groups the delta touches, read
    BUCKET-PRUNED: the touched group keys hash to ≤ n_buckets bucket
    ids (one bounded collect — a layout constant, never group count),
    and only those buckets' files are opened — the sync's view-side
    cost tracks the delta, not the view (a billion-group view whose
    day touched 3 buckets reads 3 buckets)."""
    import json

    from pyspark.sql.types import StructType

    manifest = layout.snapshot_manifest(spark, view_path, view_version)
    keyed = manifest["keyed"]
    nb = int(keyed["n_buckets"])
    schema = StructType.fromJson(json.loads(manifest["schema"]))
    touched = {
        r["_b"]
        for r in agg.select(
            F.pmod(F.xxhash64(F.col(_GKEY).cast("string")), F.lit(nb)).alias("_b")
        )
        .distinct()
        .collect()
    }
    files = [
        f for f in manifest["files"] if manifest["buckets"].get(f) in touched
    ]
    src = (
        spark.read.schema(schema).parquet(*files)
        if files
        else spark.createDataFrame([], schema)
    )
    return src.select(
        _GKEY,
        F.col(_NROWS).alias("_cur_n"),
        *[F.col(_sum_name(c)).alias(f"_cur_{c}") for c in sum_cols],
    )


def agg_view_sync(
    spark,
    source_path: str,
    view_path: str,
    group_cols: list[str],
    sum_cols: list[str],
    txn_app: str = "agg-view",
    retries: int = 5,
) -> tuple[int | None, int]:
    """Advance the view over every source commit since its watermark
    in ONE atomic view merge: aggregate the span's signed deltas by
    group, add them to the view's current totals (left join — absent
    groups start at zero), DELETE groups whose row count reaches
    zero, and carry the new consumed source version as the merge's
    transaction watermark.  Returns ``(view_version | None,
    consumed_source_version)`` — None when there was nothing new.
    Safe under concurrent foreign view writers (optimistic
    ``expected_version`` retry) and under replay (the watermark
    absorbs an already-consumed span)."""
    src_latest = layout.snapshot_latest_version(spark, source_path)
    last_err: Exception | None = None
    for _ in range(retries):
        view_cur = layout.snapshot_latest_version(spark, view_path)
        consumed = (
            layout.snapshot_manifest(spark, view_path, view_cur)["txn"].get(txn_app)
        )
        if consumed is None:
            raise ValueError(
                f"agg_view_sync: view {view_path} carries no {txn_app!r} "
                "watermark — create it with agg_view_create"
            )
        if src_latest <= consumed:
            return None, consumed
        deltas = _span_deltas(
            spark, source_path, consumed, src_latest, group_cols, sum_cols
        )
        agg = deltas.groupBy(*group_cols).agg(
            F.sum("_dn").alias("_dn"),
            *[F.sum(_sum_name(c)).alias(f"_d_{c}") for c in sum_cols],
        )
        agg = agg.select(_group_key(group_cols), *agg.columns)
        cur = _touched_view_rows(spark, view_path, view_cur, agg, sum_cols)
        upd = (
            agg.join(cur, _GKEY, "left_outer")
            .select(
                _GKEY,
                *group_cols,
                (F.coalesce(F.col("_cur_n"), F.lit(0)) + F.col("_dn")).alias(
                    _NROWS
                ),
                *[
                    (
                        F.coalesce(F.col(f"_cur_{c}"), F.lit(0))
                        + F.col(f"_d_{c}")
                    ).alias(_sum_name(c))
                    for c in sum_cols
                ],
            )
            .withColumn("_del", F.col(_NROWS) == 0)
        )
        try:
            v = layout.snapshot_merge(
                spark,
                view_path,
                upd,
                _GKEY,
                delete_col="_del",
                _txn_update={txn_app: src_latest},
                expected_version=view_cur,
            )
            return v, src_latest
        except layout.SnapshotTxnAlreadyApplied:
            return None, src_latest  # replayed span — already in the view
        except layout.SnapshotVersionConflict as e:
            last_err = e
            continue  # foreign view commit landed — re-read and retry
    raise IOError(f"agg_view_sync: view kept conflicting: {last_err}")


def agg_view_read(spark, view_path: str, version: int | None = None) -> DataFrame:
    """The view's logical contents (group columns + ``_n`` row count +
    ``sum_*`` totals — the internal ``_gkey`` dropped), time-travelable
    like any snapshot table."""
    return layout.snapshot_read(spark, view_path, version).drop(_GKEY)


# --- EXACT COUNT-DISTINCT views --------------------------------------------
#
# The classic IVM reduction: COUNT(DISTINCT d) GROUP BY g is exactly a
# count view grouped by (g, d) — the signed algebra maintains one row
# per LIVE (group, value) pair (a pair whose row count reaches zero is
# deleted), and the distinct count is the pair count per group, read in
# O(live pairs).  Deletes and value-moving updates work for free, which
# no sketch (HLL) can do.  NULL values never count (SQL COUNT(DISTINCT)
# semantics): the reader filters them; a group with ONLY NULL values
# reads as absent, not zero — stated, not hidden.


def distinct_view_create(
    spark,
    source_path: str,
    view_path: str,
    group_cols: list[str],
    distinct_col: str,
    txn_app: str = "distinct-view",
    n_buckets: int = 8,
) -> int:
    """Materialize an exact COUNT(DISTINCT ``distinct_col``) view: the
    stored table is the (group, value)-pair count view; read it with
    ``distinct_view_read``, advance it with ``distinct_view_sync``."""
    return agg_view_create(
        spark, source_path, view_path, group_cols + [distinct_col], [],
        txn_app, n_buckets,
    )


def distinct_view_sync(
    spark,
    source_path: str,
    view_path: str,
    group_cols: list[str],
    distinct_col: str,
    txn_app: str = "distinct-view",
    retries: int = 5,
) -> tuple[int | None, int]:
    """Advance the pair view over every source commit since its
    watermark — same exactly-once contract as ``agg_view_sync``."""
    return agg_view_sync(
        spark, source_path, view_path, group_cols + [distinct_col], [],
        txn_app, retries,
    )


def distinct_view_read(
    spark,
    view_path: str,
    group_cols: list[str],
    distinct_col: str,
    version: int | None = None,
) -> DataFrame:
    """Per-group exact distinct count off the maintained pair view:
    ``n_distinct_<col>`` plus ``_n`` (total non-NULL source rows) —
    one aggregation over O(live pairs), never the source."""
    v = agg_view_read(spark, view_path, version)
    return (
        v.filter(F.col(distinct_col).isNotNull())
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias(f"n_distinct_{distinct_col}"),
            F.sum(_NROWS).alias(_NROWS),
        )
    )


def extremes_view_read(
    spark,
    view_path: str,
    group_cols: list[str],
    value_col: str,
    version: int | None = None,
) -> DataFrame:
    """Per-group MIN/MAX off a maintained pair view — the aggregate
    plain delta-IVM cannot keep (a delete of the current extremum
    forces a group recompute) becomes a read over O(live pairs): the
    pair view retains EVERY live value with its row count, so when the
    extremum's count reaches zero its pair row dies and the next value
    takes over automatically.  Build the view with
    ``distinct_view_create(group_cols, value_col)`` and sync as usual;
    distinct counts and extremes serve off the SAME state."""
    v = agg_view_read(spark, view_path, version)
    return (
        v.filter(F.col(value_col).isNotNull())
        .groupBy(*group_cols)
        .agg(
            F.min(value_col).alias(f"min_{value_col}"),
            F.max(value_col).alias(f"max_{value_col}"),
            F.sum(_NROWS).alias(_NROWS),
        )
    )
