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


def compact_table(
    spark,
    path: str,
    target_file_bytes: int = 128 << 20,
    sort_cols: list[str] | None = None,
    fmt: str = "parquet",
) -> int:
    """Small-file compaction (the OPTIMIZE-style maintenance pass):
    rewrite an unpartitioned table so each output file targets
    ``target_file_bytes``, optionally restoring ``sort_cols`` order
    within files (compaction otherwise interleaves row groups and
    destroys min/max selectivity).  Returns the output file count.

    Sizing goes through the Hadoop FileSystem API (portable to
    HDFS/S3A, not just local paths): n_files = ceil(current bytes /
    target).  The rewrite lands in a sibling temp dir and swaps in via
    two FileSystem renames — readers see the old or the new listing,
    never a half-written mix; the pre-swap table is deleted only after
    the swap completes.

    Streaming ingest (per-trigger micro-batch files, the reference's
    arrival pattern) is exactly what produces the small-file explosion
    this repairs; run it on a schedule against spool-fed tables.
    """
    import math

    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    total = fs.getContentSummary(hpath).getLength()
    n = max(1, math.ceil(total / target_file_bytes))

    df = spark.read.format(fmt).load(path)
    if sort_cols:
        # repartitionByRange + sortWithinPartitions: globally range-
        # clustered files whose min/max stats stay selective
        out = df.repartitionByRange(n, *[F.col(c) for c in sort_cols])
        out = out.sortWithinPartitions(*sort_cols)
    else:
        out = df.repartition(n)
    tmp = path.rstrip("/") + ".compact.tmp"
    old = path.rstrip("/") + ".compact.old"
    out.write.format(fmt).mode("overwrite").save(tmp)
    tmp_p = jvm.org.apache.hadoop.fs.Path(tmp)
    old_p = jvm.org.apache.hadoop.fs.Path(old)
    if fs.exists(old_p):
        fs.delete(old_p, True)
    if not fs.rename(hpath, old_p):
        raise IOError(f"compact_table: rename {path} -> {old} failed")
    if not fs.rename(tmp_p, hpath):
        fs.rename(old_p, hpath)  # roll back
        raise IOError(f"compact_table: rename {tmp} -> {path} failed")
    fs.delete(old_p, True)
    return len(spark.read.format(fmt).load(path).inputFiles())


def zorder_key(cols: list, bits: int = 8):
    """Morton (Z-order) interleave of pre-scaled integer columns: bit b
    of column i lands at position ``b * len(cols) + i`` of the key, so
    nearby (x, y, ...) points share key prefixes and range-clustered
    files stay box-local in EVERY dimension at once — the property
    linear sort gives only its leading column.  Pure
    shiftleft/shiftright/AND/OR column arithmetic (no lambdas), so the
    whole key stays inside whole-stage codegen.  ``cols`` must already
    be ints in [0, 2**bits); ``bits * len(cols)`` must fit a long."""
    if bits * len(cols) > 63:
        raise ValueError("zorder_key: bits * len(cols) must be <= 63")
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * len(cols) + i))
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_cols: list[str],
    n_files: int = 16,
    bits: int = 8,
    fmt: str = "parquet",
) -> None:
    """OPTIMIZE ZORDER-style write (the Delta Lake data-skipping
    discipline, re-expressed on plain parquet): scale each
    ``zorder_cols`` column to [0, 2**bits) by its global min/max (ONE
    1-row agg — the only driver round-trip), Morton-interleave into a
    single key, then ``repartitionByRange(n_files, key)`` +
    ``sortWithinPartitions(key)`` so every file covers one compact
    Z-curve segment.  Per-file min/max statistics then prune box
    queries on ANY subset of the z-ordered dimensions — a linear sort
    prunes only its leading column (a y-only predicate reads EVERY
    x-sorted file; the regression test pins z-order strictly better
    on exactly that query).  At 100 TB this is a maintenance-pass
    rewrite, one full shuffle by design — the payoff is every later
    scan."""
    exprs = []
    for i, c in enumerate(zorder_cols):
        exprs += [
            F.min(F.col(c)).alias(f"_mn{i}"),
            F.max(F.col(c)).alias(f"_mx{i}"),
        ]
    row = df.agg(*exprs).first()
    top = (1 << bits) - 1
    scaled = []
    for i, c in enumerate(zorder_cols):
        # empty input: min/max are NULL — write the (empty) frame with
        # a degenerate constant key instead of crashing
        mn = row[f"_mn{i}"] if row[f"_mn{i}"] is not None else 0
        mx = row[f"_mx{i}"] if row[f"_mx{i}"] is not None else 0
        span = float(mx - mn) if mx > mn else 1.0
        scaled.append(
            F.least(
                F.lit(top).cast("long"),
                (
                    (F.col(c).cast("double") - float(mn)) / span * (top + 1)
                ).cast("long"),
            )
        )
    out = (
        df.withColumn("_z", zorder_key(scaled, bits))
        .repartitionByRange(n_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
    )
    out.write.format(fmt).mode("overwrite").save(path)


def write_keyed(
    df: DataFrame,
    path: str,
    key_col: str,
    n_buckets: int = 16,
    fmt: str = "parquet",
) -> None:
    """Write a key-addressed table hive-partitioned by a deterministic
    hash bucket of ``key_col`` — the layout that makes ``merge_upsert``
    a partition-pruned copy-on-write instead of a full-table rewrite.
    One directory per bucket; each bucket clustered into one task's
    files.  Bucket count is a layout constant: pick it so a bucket
    (~table/n) fits a rewrite task comfortably, and re-bucket with a
    fresh write_keyed when the table outgrows it."""
    out = df.withColumn(
        "_bucket", F.pmod(F.xxhash64(F.col(key_col).cast("string")), F.lit(n_buckets))
    )
    (
        out.repartition(F.col("_bucket"))
        .write.partitionBy("_bucket")
        .format(fmt)
        .mode("overwrite")
        .save(path)
    )
    # layout sidecar: the bucket count is part of the table's identity
    # (hash mod must match on every later upsert even if some bucket
    # directory happens to be empty) — never inferred from listings
    import json

    spark = df.sparkSession
    jvm = spark._jvm
    meta = jvm.org.apache.hadoop.fs.Path(f"{path.rstrip('/')}/_keyed_layout.json")
    fs = meta.getFileSystem(spark._jsc.hadoopConfiguration())
    st = fs.create(meta, True)
    st.write(bytearray(json.dumps({"key_col": key_col, "n_buckets": n_buckets}).encode()))
    st.close()


def merge_upsert(
    spark,
    path: str,
    updates: DataFrame,
    key_col: str,
    fmt: str = "parquet",
) -> int:
    """MERGE/upsert into a ``write_keyed`` table — the Delta/Iceberg
    ``MERGE INTO`` shape on plain parquet: rows whose key matches an
    update are REPLACED, new keys are INSERTED, and only the hash
    buckets containing updated keys are read or rewritten (copy-on-
    write at bucket granularity; the filter on ``_bucket`` is classic
    hive partition pruning, so an upsert touching k of n buckets scans
    and rewrites k/n of the table).  Returns the rewritten bucket
    count.

    Updates must be key-unique — MERGE with duplicate source keys has
    no defined winner, so duplicates raise instead of silently picking
    one (the Delta MERGE error contract).

    Atomicity, precisely (not overstated): each touched bucket flips
    via TWO FileSystem renames — cur→``._bucket=N.old``, then
    tmp→cur.  A reader listing the table BETWEEN those two renames
    sees the bucket directory missing (an empty bucket, not a mix of
    old and new files); the window is two metadata operations wide.
    A crash inside the window leaves the bucket's data intact in the
    hidden ``._bucket=N.old`` directory — run
    ``recover_merge_upsert(spark, path)`` to restore it.  To make
    that recovery always possible, ``.old`` directories are kept
    until EVERY touched bucket has swapped successfully and are
    deleted only in a final cleanup pass.  Cross-bucket atomicity
    needs a metadata layer (Delta/Iceberg commit log) — out of scope
    for a plain-parquet lake, and stated here rather than pretended
    away: a crash mid-merge can leave some buckets post-merge and
    others pre-merge (each bucket internally consistent); re-running
    the SAME merge_upsert is idempotent (MERGE is key-addressed
    replace), which is the recovery path for partial application.

    Object-store caveat: ``FileSystem.rename`` is atomic on HDFS and
    posix-like stores but NOT on S3A (it is a copy+delete that can be
    observed half-done and is O(data)).  On object stores use a real
    table format's commit log instead of this swap — the bucket
    layout and MERGE plan shape carry over unchanged.
    """
    import json

    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    # CHEAP validations first (sidecar existence + key identity are
    # metadata reads) — a wrong-table call must fail before paying any
    # Spark job (ADVICE r10).  Bucket count is part of the table's
    # IDENTITY (the hash mod must match the original write even if a
    # bucket directory is empty) — read the write_keyed sidecar, never
    # infer from listings.
    meta_p = jvm.org.apache.hadoop.fs.Path(f"{path.rstrip('/')}/_keyed_layout.json")
    if not fs.exists(meta_p):
        raise ValueError(f"merge_upsert: {path} is not a write_keyed table")
    stream = fs.open(meta_p)
    try:
        raw = bytes(
            jvm.org.apache.hadoop.io.IOUtils.readFullyToByteArray(stream)
        )
    finally:
        stream.close()
    meta = json.loads(raw.decode())
    n_buckets = int(meta["n_buckets"])
    if meta["key_col"] != key_col:
        raise ValueError(
            f"merge_upsert: table is keyed on {meta['key_col']!r}, not {key_col!r}"
        )
    dup = (
        updates.groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > 1)
        .limit(1)
        .collect()
    )
    if dup:
        raise ValueError(
            f"merge_upsert: duplicate key {dup[0][key_col]!r} in updates — "
            "MERGE requires a key-unique source"
        )
    upd = updates.withColumn(
        "_bucket", F.pmod(F.xxhash64(F.col(key_col).cast("string")), F.lit(n_buckets))
    )
    touched = sorted(
        r["_bucket"] for r in upd.select("_bucket").distinct().collect()
    )  # bounded by n_buckets — a layout constant, never data-scale
    if not touched:
        return 0
    existing = (
        spark.read.format(fmt)
        .load(path)
        .filter(F.col("_bucket").isin(touched))  # partition-pruned scan
    )
    keys = upd.select(F.col(key_col))
    merged = (
        existing.drop("_bucket")
        .join(keys, key_col, "left_anti")
        .unionByName(upd.drop("_bucket"))
        .withColumn(
            "_bucket",
            F.pmod(F.xxhash64(F.col(key_col).cast("string")), F.lit(n_buckets)),
        )
    )
    tmp = path.rstrip("/") + ".merge.tmp"
    (
        merged.repartition(F.col("_bucket"))
        .write.partitionBy("_bucket")
        .format(fmt)
        .mode("overwrite")
        .save(tmp)
    )
    swapped_olds = []
    for b in touched:
        cur = jvm.org.apache.hadoop.fs.Path(f"{path.rstrip('/')}/_bucket={b}")
        new = jvm.org.apache.hadoop.fs.Path(f"{tmp}/_bucket={b}")
        old = jvm.org.apache.hadoop.fs.Path(f"{path.rstrip('/')}/._bucket={b}.old")
        if fs.exists(old):
            fs.delete(old, True)  # stale backup from a CLEANLY finished run
        had_cur = fs.exists(cur)
        if had_cur and not fs.rename(cur, old):
            raise IOError(f"merge_upsert: rename {cur} -> {old} failed")
        if not fs.rename(new, cur):
            if had_cur:
                fs.rename(old, cur)  # roll back this bucket
            raise IOError(f"merge_upsert: rename {new} -> {cur} failed")
        if had_cur:
            # keep the backup until EVERY bucket has swapped — a crash
            # from here on must leave all pre-merge data recoverable
            swapped_olds.append(old)
    # cleanup pass: only reached once all touched buckets are live
    for old in swapped_olds:
        fs.delete(old, True)
    fs.delete(jvm.org.apache.hadoop.fs.Path(tmp), True)
    return len(touched)


def recover_merge_upsert(spark, path: str) -> dict:
    """Crash recovery for an interrupted ``merge_upsert``: restore any
    bucket whose live directory went missing mid-swap and clear
    leftovers, returning ``{"restored": [...], "cleaned": [...]}``.

    Protocol (driven purely by what's on disk — no journal needed):
      * ``._bucket=N.old`` present, ``_bucket=N`` MISSING → the crash
        hit between the two renames; restore old→cur (that bucket
        returns to its PRE-merge content).
      * ``._bucket=N.old`` present, ``_bucket=N`` present → the swap
        completed but the final cleanup pass didn't; the live bucket
        is post-merge, so the backup is deleted.
      * a ``<path>.merge.tmp`` staging directory → deleted.

    After recovery the table is readable and internally consistent per
    bucket, but a crashed merge may be PARTIALLY applied across
    buckets (some post-merge, restored ones pre-merge) — re-running
    the same ``merge_upsert`` completes it idempotently, since MERGE
    is key-addressed replace."""
    jvm = spark._jvm
    base = path.rstrip("/")
    hpath = jvm.org.apache.hadoop.fs.Path(base)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    restored, cleaned = [], []
    if fs.exists(hpath):
        for st in fs.listStatus(hpath):
            name = st.getPath().getName()
            if not (name.startswith("._bucket=") and name.endswith(".old")):
                continue
            bucket = name[len("._bucket=") : -len(".old")]
            cur = jvm.org.apache.hadoop.fs.Path(f"{base}/_bucket={bucket}")
            if fs.exists(cur):
                fs.delete(st.getPath(), True)
                cleaned.append(name)
            else:
                if not fs.rename(st.getPath(), cur):
                    raise IOError(f"recover_merge_upsert: rename {name} failed")
                restored.append(f"_bucket={bucket}")
    tmp = jvm.org.apache.hadoop.fs.Path(base + ".merge.tmp")
    if fs.exists(tmp):
        fs.delete(tmp, True)
        cleaned.append(tmp.getName())
    return {"restored": sorted(restored), "cleaned": sorted(cleaned)}


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    fmt: str = "parquet",
) -> dict:
    """Write the SERVING artifact a training dataloader consumes: docs
    hash-assigned to ``n_shards`` hive-partitioned shard directories,
    rows inside each shard's files sorted by the curriculum position
    (high-quality-first — the curriculum_shard_order contract), plus a
    ``_shards_manifest.json`` recording per-shard doc/token counts for
    the dataloader's deterministic epoch plan.  Returns the manifest
    dict.

    Shape: the position comes from the same two-pass (shard, tier)
    rank the registered query proves (no whole-shard single-task
    sort); the write repartitions on the shard column so each shard
    directory is one task's files, sorted within via
    sortWithinPartitions — the write_clustered discipline.  At 100 TB
    n_shards grows with the corpus (shards ≈ tokens / shard budget),
    keeping per-task work constant."""
    import json

    from pyspark.sql.window import Window

    from fiware_cosmos_orion_flink_connector_examples_spark.functions.hashing import (
        md5int64_seeded,
    )
    from fiware_cosmos_orion_flink_connector_examples_spark.operators.text import (
        quality_score,
        token_count,
    )

    base = df.filter(F.col(text_col).isNotNull()).withColumn(
        "_shard",
        F.pmod(md5int64_seeded(F.col(id_col).cast("string"), "shard"), F.lit(n_shards)),
    ).withColumn("_q", quality_score(text_col)).withColumn(
        "_nt", token_count(text_col).cast("long")
    ).withColumn("_tier", F.floor(F.col("_q") * 10).cast("int"))
    wt = (
        Window.partitionBy("_shard")
        .orderBy(F.desc("_tier"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefixes = (
        base.groupBy("_shard", "_tier")
        .agg(F.count(F.lit(1)).alias("_n"))
        .withColumn("_prefix", F.coalesce(F.sum("_n").over(wt), F.lit(0)))
        .select("_shard", "_tier", "_prefix")
    )
    ww = Window.partitionBy("_shard", "_tier").orderBy(
        F.desc("_q"), F.asc(id_col)
    )
    ordered = (
        base.join(F.broadcast(prefixes), ["_shard", "_tier"])
        .withColumn("_position", (F.col("_prefix") + F.row_number().over(ww)).cast("long"))
        .drop("_tier", "_prefix")
    )
    (
        ordered.repartition(F.col("_shard"))
        .sortWithinPartitions("_position")
        .write.partitionBy("_shard")
        .format(fmt)
        .mode("overwrite")
        .save(path)
    )
    manifest_rows = (
        ordered.groupBy("_shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_nt").alias("n_tokens"),
        )
        .collect()
    )  # bounded by n_shards — a layout constant
    manifest = {
        "n_shards": n_shards,
        "shards": {
            str(r["_shard"]): {"n_docs": r["n_docs"], "n_tokens": r["n_tokens"]}
            for r in manifest_rows
        },
    }
    spark = df.sparkSession
    jvm = spark._jvm
    meta = jvm.org.apache.hadoop.fs.Path(f"{path.rstrip('/')}/_shards_manifest.json")
    fs = meta.getFileSystem(spark._jsc.hadoopConfiguration())
    st = fs.create(meta, True)
    st.write(bytearray(json.dumps(manifest, sort_keys=True).encode()))
    st.close()
    return manifest


# --- snapshot-isolated tables (manifest commit log) --------------------------
#
# The missing metadata layer merge_upsert's docstring names: plain
# parquet directories can only swap per-directory, so multi-bucket /
# multi-partition changes are never atomic as a whole.  A MANIFEST
# table fixes that the way Iceberg/Delta do, minus the format baggage:
# data files are immutable and write-once under <path>/data/, and each
# COMMIT is ONE atomic create-style rename of a complete
# _manifest_v<N>.json (staged as a hidden .tmp, renamed to a
# destination that must not exist — so two racing committers of the
# same version conflict instead of clobbering: optimistic
# concurrency, Iceberg's commit rule).  Readers list the manifests
# and take the max version (or an explicit version = time travel) and
# read exactly that file list — they can never observe a
# half-committed state, because a manifest either exists completely
# or not at all, and nothing it references is ever mutated.  A crash
# mid-commit leaves orphaned data files and a stale hidden .tmp
# manifest, both invisible to readers and reclaimable by
# vacuum_snapshots.  There is deliberately NO mutable pointer file: a
# delete+recreate pointer has a reader-visible missing window and a
# crash there would reset the version counter (review finding, round
# 11).  Same caveat as everything rename-based: atomic on HDFS/posix
# stores, not on S3A.


def _fs(spark, path: str):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return jvm, p.getFileSystem(spark._jsc.hadoopConfiguration())


def _read_small(spark, path: str) -> bytes:
    jvm, fs = _fs(spark, path)
    stream = fs.open(jvm.org.apache.hadoop.fs.Path(path))
    try:
        return bytes(jvm.org.apache.hadoop.io.IOUtils.readFullyToByteArray(stream))
    finally:
        stream.close()


def _write_small(spark, path: str, data: bytes) -> None:
    jvm, fs = _fs(spark, path)
    st = fs.create(jvm.org.apache.hadoop.fs.Path(path), True)
    st.write(bytearray(data))
    st.close()


def _commit_manifest(spark, base: str, version: int, manifest: dict) -> None:
    """Atomically publish _manifest_v<version>.json: stage the full
    bytes at a hidden .tmp name, then rename to the final name.  The
    destination must not exist — Hadoop rename returns false then, so
    a concurrent commit of the same version raises instead of
    clobbering (optimistic concurrency)."""
    import json

    jvm, fs = _fs(spark, base)
    tmp = f"{base}/._manifest_v{version}.json.tmp"

    def _json_safe(v):
        # stats min/max of timestamp/date/decimal columns: serialize as
        # str — for ISO-8601 temporals lexicographic order IS
        # chronological order, so snapshot_scan's range comparison
        # stays correct against string bounds
        return str(v)

    _write_small(spark, tmp, json.dumps(manifest, default=_json_safe).encode())
    dst = jvm.org.apache.hadoop.fs.Path(f"{base}/_manifest_v{version}.json")
    if fs.exists(dst) or not fs.rename(jvm.org.apache.hadoop.fs.Path(tmp), dst):
        fs.delete(jvm.org.apache.hadoop.fs.Path(tmp), False)
        raise IOError(
            f"snapshot commit conflict: version {version} already exists "
            f"(concurrent committer won); retry from the new latest"
        )


def snapshot_commit(
    spark,
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    stats_cols: list[str] | None = None,
    _extra: dict | None = None,
) -> int:
    """Commit ``df`` to a snapshot table at ``path`` and return the new
    version number.  ``mode='overwrite'`` makes the new version exactly
    ``df``; ``mode='append'`` makes it previous-files + ``df``'s files
    (append never rewrites data — the manifest just grows).

    Protocol (each step safe to crash after):
      1. write df's parquet files to ``data/v<N>-<uuid>/`` (write-once,
         never listed by readers until referenced by a manifest);
      2. stage the complete ``_manifest_v<N>.json`` at a hidden .tmp
         name, then atomically rename it into place — THE commit.
    A crash before step 2's rename leaves only invisible artifacts
    (readers still resolve N-1); the rename refuses an existing
    destination, so concurrent committers conflict instead of
    clobbering.  Committing to a ``snapshot_write_keyed`` table is
    rejected — a plain commit would drop the bucket map and break
    ``snapshot_merge`` (use snapshot_merge, or re-key with a fresh
    snapshot_write_keyed at a new path).

    ``stats_cols`` records per-NEW-file min/max of those columns in
    the manifest (one bounded pass over just-written files, grouped
    by input_file_name) — the Iceberg-style FILE-SKIPPING metadata
    ``snapshot_scan`` prunes with; append carries the previous files'
    stats forward untouched.  ``_extra`` merges extra fields into the
    manifest (the streaming sink's transaction watermark rides here).
    """
    import json
    import uuid

    from pyspark.sql.types import StructType

    base = path.rstrip("/")
    jvm, fs = _fs(spark, base)
    cur_version = snapshot_latest_version(spark, base)
    prev_files: list[str] = []
    schema = df.schema
    if cur_version > 0:
        prev = json.loads(_read_small(spark, f"{base}/_manifest_v{cur_version}.json"))
        if prev.get("keyed"):
            raise ValueError(
                "snapshot_commit: table is keyed (snapshot_write_keyed) — a "
                "plain commit would drop its bucket map; use snapshot_merge"
            )
        if mode == "append":
            prev_files = prev["files"]
            # transactional watermarks survive interleaved plain
            # appends — dropping them would let a crashed stream
            # double-append after an unrelated batch commit (review
            # finding, round 11)
            if prev.get("txn") and not (_extra or {}).get("txn"):
                _extra = dict(_extra or {})
                _extra["txn"] = prev["txn"]
            # SCHEMA EVOLUTION on append: the committed schema is the
            # column union (existing order first, new columns after);
            # a column present in both with a DIFFERENT type is a
            # contract break and raises — silent coercion corrupts
            prev_schema = StructType.fromJson(json.loads(prev["schema"]))
            by_name = {f.name: f for f in df.schema.fields}
            fields = []
            for f in prev_schema.fields:
                nf = by_name.pop(f.name, None)
                if nf is not None and nf.dataType != f.dataType:
                    raise ValueError(
                        f"snapshot_commit: column {f.name!r} changes type "
                        f"{f.dataType.simpleString()} -> "
                        f"{nf.dataType.simpleString()} — evolution adds "
                        "columns, never retypes them"
                    )
                fields.append(f)
            fields.extend(by_name.values())
            schema = StructType(fields)
    new_version = cur_version + 1
    data_dir = f"{base}/data/v{new_version}-{uuid.uuid4().hex[:8]}"
    df.write.mode("error").parquet(data_dir)
    new_files = [
        f
        for f in (
            st.getPath().toString()
            for st in fs.listStatus(jvm.org.apache.hadoop.fs.Path(data_dir))
        )
        if f.rsplit("/", 1)[-1].startswith("part-")
    ]
    stats: dict = {}
    if cur_version > 0 and mode == "append":
        stats.update(prev.get("stats", {}))
    if stats_cols and new_files:
        aggs = []
        for c in stats_cols:
            aggs += [F.min(c).alias(f"_mn_{c}"), F.max(c).alias(f"_mx_{c}")]
        rows = (
            spark.read.parquet(*new_files)
            .groupBy(F.input_file_name().alias("_f"))
            .agg(*aggs)
            .collect()
        )  # one row per just-written file — commit-sized, never table-sized
        for r in rows:
            stats[_normalize_file_uri(r["_f"])] = {
                c: [r[f"_mn_{c}"], r[f"_mx_{c}"]] for c in stats_cols
            }
    manifest = {
        "version": new_version,
        "mode": mode,
        "files": sorted(prev_files + new_files),
        "schema": schema.json(),
    }
    if stats:
        manifest["stats"] = stats
    if _extra:
        manifest.update(_extra)
    _commit_manifest(spark, base, new_version, manifest)
    return new_version


def _normalize_file_uri(f: str) -> str:
    """input_file_name() returns a percent-encoded URI (file:///…,
    %20 for spaces); the manifest stores Hadoop Path renderings
    (file:/… with raw characters).  Normalize prefix AND decode so
    stats keys match file-list entries on any path — a silent
    mismatch would not corrupt results but would disable pruning."""
    from urllib.parse import unquote

    if f.startswith("file:///"):
        f = "file:/" + f[len("file:///"):]
    return unquote(f)


def snapshot_latest_version(spark, path: str) -> int:
    """Current committed version (0 = no table yet): the max N with a
    published ``_manifest_vN.json``.  One directory listing of the
    table root — manifests are tiny and vacuum bounds their count, so
    this stays O(retained versions); hidden ``.tmp`` stages and data
    dirs are not consulted."""
    import re

    base = path.rstrip("/")
    jvm, fs = _fs(spark, base)
    root = jvm.org.apache.hadoop.fs.Path(base)
    if not fs.exists(root):
        return 0
    latest = 0
    for st in fs.listStatus(root):
        m = re.fullmatch(r"_manifest_v(\d+)\.json", st.getPath().getName())
        if m:
            latest = max(latest, int(m.group(1)))
    return latest


def snapshot_read(spark, path: str, version: int | None = None) -> DataFrame:
    """Read a snapshot table: the latest committed version, or an
    explicit ``version`` for TIME TRAVEL.  The returned frame reads
    exactly the manifest's immutable file list — concurrent commits
    cannot change what this reader sees (snapshot isolation by
    construction: data files are never mutated, only superseded)."""
    import json

    base = path.rstrip("/")
    if version is None:
        version = snapshot_latest_version(spark, base)
    if version <= 0:
        raise ValueError(f"snapshot_read: no committed version at {path}")
    manifest = json.loads(_read_small(spark, f"{base}/_manifest_v{version}.json"))
    from pyspark.sql.types import StructType

    schema = StructType.fromJson(json.loads(manifest["schema"]))
    if not manifest["files"]:
        return spark.createDataFrame([], schema)
    # the manifest's schema is the table contract for THIS version —
    # reading with it (not inference off one file) makes appended-
    # column evolution work: old files yield NULL for new columns,
    # and time travel to a pre-evolution version shows the old shape
    return spark.read.schema(schema).parquet(*manifest["files"])


def vacuum_snapshots(spark, path: str, keep_last: int = 2) -> dict:
    """Reclaim storage: drop manifests older than the last
    ``keep_last`` versions and delete data files no retained manifest
    references (orphans from crashed commits included).  Time travel
    reaches only retained versions afterwards — the Iceberg
    expire-snapshots contract.  Returns {"deleted_files": n,
    "deleted_manifests": n}."""
    import json

    base = path.rstrip("/")
    jvm, fs = _fs(spark, base)
    latest = snapshot_latest_version(spark, base)
    if latest <= 0:
        return {"deleted_files": 0, "deleted_manifests": 0}
    keep = set(range(max(1, latest - keep_last + 1), latest + 1))
    live: set[str] = set()
    dropped_manifests = 0
    for v in range(1, latest + 1):
        mp = f"{base}/_manifest_v{v}.json"
        if not fs.exists(jvm.org.apache.hadoop.fs.Path(mp)):
            continue
        if v in keep:
            live.update(json.loads(_read_small(spark, mp))["files"])
        else:
            fs.delete(jvm.org.apache.hadoop.fs.Path(mp), False)
            dropped_manifests += 1
    # stale hidden manifest stages from crashed commits
    root = jvm.org.apache.hadoop.fs.Path(base)
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if name.startswith("._manifest_v") and name.endswith(".json.tmp"):
            fs.delete(st.getPath(), False)
    deleted = 0
    data_root = jvm.org.apache.hadoop.fs.Path(f"{base}/data")

    def _sweep(d):
        nonlocal deleted
        for st in fs.listStatus(d):
            if st.isDirectory():
                # keyed tables nest one _bucket=<b> level under the
                # version dir (review finding, round 11: the flat walk
                # never reclaimed keyed files)
                _sweep(st.getPath())
                if not fs.listStatus(st.getPath()):
                    fs.delete(st.getPath(), True)
                continue
            f = st.getPath().toString()
            if f.rsplit("/", 1)[-1].startswith("part-") and f not in live:
                fs.delete(st.getPath(), False)
                deleted += 1

    if fs.exists(data_root):
        for vdir in fs.listStatus(data_root):
            _sweep(vdir.getPath())
            if not fs.listStatus(vdir.getPath()):
                fs.delete(vdir.getPath(), True)
    return {"deleted_files": deleted, "deleted_manifests": dropped_manifests}


def snapshot_write_keyed(
    spark,
    df: DataFrame,
    path: str,
    key_col: str,
    n_buckets: int = 16,
) -> int:
    """Create a KEYED snapshot table: rows hash-bucketed by ``key_col``
    into one file set per bucket, the bucket map recorded in the
    manifest — the layout that makes ``snapshot_merge`` a bucket-pruned
    copy-on-write whose commit is ATOMIC ACROSS BUCKETS (the property
    plain-directory ``merge_upsert`` cannot give: its per-bucket swaps
    are individually atomic, the whole merge is not).  Returns the
    committed version."""
    import json
    import uuid

    base = path.rstrip("/")
    jvm, fs = _fs(spark, base)
    if snapshot_latest_version(spark, base) != 0:
        raise ValueError(f"snapshot_write_keyed: {path} already has commits")
    data_dir = f"{base}/data/v1-{uuid.uuid4().hex[:8]}"
    out = df.withColumn(
        "_bucket", F.pmod(F.xxhash64(F.col(key_col).cast("string")), F.lit(n_buckets))
    )
    out.repartition(F.col("_bucket")).write.partitionBy("_bucket").parquet(data_dir)
    files, buckets = [], {}
    root = jvm.org.apache.hadoop.fs.Path(data_dir)
    for bdir in fs.listStatus(root):
        name = bdir.getPath().getName()
        if not name.startswith("_bucket="):
            continue
        b = int(name.split("=", 1)[1])
        for st in fs.listStatus(bdir.getPath()):
            f = st.getPath().toString()
            if f.rsplit("/", 1)[-1].startswith("part-"):
                files.append(f)
                buckets[f] = b
    manifest = {
        "version": 1,
        "mode": "overwrite",
        "files": sorted(files),
        "buckets": buckets,
        "schema": df.schema.json(),
        "keyed": {"key_col": key_col, "n_buckets": n_buckets},
    }
    _commit_manifest(spark, base, 1, manifest)
    return 1


def snapshot_merge(
    spark,
    path: str,
    updates: DataFrame,
    key_col: str,
    delete_col: str | None = None,
) -> int:
    """MERGE INTO a keyed snapshot table with FULL-TABLE atomicity:
    matched keys replaced, new keys inserted, only the buckets holding
    updated keys re-read/re-written (copy-on-write via the manifest's
    bucket map — untouched buckets' files carry over BY REFERENCE),
    and the whole merge becomes visible in ONE atomic manifest rename.
    A reader can never see half a merge, a crash anywhere leaves the
    table at the previous version, and time travel reaches the
    pre-merge state — the three guarantees the plain-directory
    ``merge_upsert`` documents as out of its reach.

    ``delete_col`` names a boolean column in ``updates``: rows where
    it is true DELETE their key (WHEN MATCHED … DELETE; deleting an
    absent key is a no-op), the rest upsert as usual — one atomic
    commit carries inserts, updates, and deletes together.  The
    column is stripped before writing.  Returns the new version."""
    import json
    import uuid

    base = path.rstrip("/")
    jvm, fs = _fs(spark, base)
    cur = snapshot_latest_version(spark, base)
    if cur <= 0:
        raise ValueError(f"snapshot_merge: no committed version at {path}")
    manifest = json.loads(_read_small(spark, f"{base}/_manifest_v{cur}.json"))
    keyed = manifest.get("keyed")
    if not keyed:
        raise ValueError(f"snapshot_merge: {path} is not a snapshot_write_keyed table")
    if keyed["key_col"] != key_col:
        raise ValueError(
            f"snapshot_merge: table is keyed on {keyed['key_col']!r}, not {key_col!r}"
        )
    n_buckets = int(keyed["n_buckets"])
    dup = (
        updates.groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > 1)
        .limit(1)
        .collect()
    )
    if dup:
        raise ValueError(
            f"snapshot_merge: duplicate key {dup[0][key_col]!r} in updates"
        )
    upd = updates.withColumn(
        "_bucket", F.pmod(F.xxhash64(F.col(key_col).cast("string")), F.lit(n_buckets))
    )
    touched = sorted(
        r["_bucket"] for r in upd.select("_bucket").distinct().collect()
    )  # bounded by n_buckets — a layout constant
    buckets: dict = manifest.get("buckets", {})
    touched_files = [f for f in manifest["files"] if buckets.get(f) in touched]
    untouched = [f for f in manifest["files"] if buckets.get(f) not in touched]
    keys = upd.select(F.col(key_col))
    survivors = upd.drop("_bucket")
    if delete_col is not None:
        survivors = survivors.filter(~F.coalesce(F.col(delete_col), F.lit(False))).drop(
            delete_col
        )
    if touched_files:
        existing = spark.read.parquet(*touched_files)
        merged = existing.join(keys, key_col, "left_anti").unionByName(survivors)
    else:
        merged = survivors
    merged = merged.withColumn(
        "_bucket", F.pmod(F.xxhash64(F.col(key_col).cast("string")), F.lit(n_buckets))
    )
    new_version = cur + 1
    data_dir = f"{base}/data/v{new_version}-{uuid.uuid4().hex[:8]}"
    merged.repartition(F.col("_bucket")).write.partitionBy("_bucket").parquet(data_dir)
    new_files, new_buckets = [], {}
    for bdir in fs.listStatus(jvm.org.apache.hadoop.fs.Path(data_dir)):
        name = bdir.getPath().getName()
        if not name.startswith("_bucket="):
            continue
        b = int(name.split("=", 1)[1])
        for st in fs.listStatus(bdir.getPath()):
            f = st.getPath().toString()
            if f.rsplit("/", 1)[-1].startswith("part-"):
                new_files.append(f)
                new_buckets[f] = b
    all_files = sorted(untouched + new_files)
    all_buckets = {f: buckets[f] for f in untouched}
    all_buckets.update(new_buckets)
    out_manifest = {
        "version": new_version,
        "mode": "merge",
        "files": all_files,
        "buckets": all_buckets,
        "schema": manifest["schema"],
        "keyed": keyed,
    }
    _commit_manifest(spark, base, new_version, out_manifest)
    return new_version


def snapshot_scan(
    spark,
    path: str,
    col: str,
    lo,
    hi,
    version: int | None = None,
):
    """Stats-pruned range scan of a snapshot table: keep only files
    whose manifest [min, max] for ``col`` OVERLAPS [lo, hi] (files
    without recorded stats are conservatively kept), read just those,
    and apply the exact predicate on top — output identical to
    filtering a full ``snapshot_read``, but unselective files are
    never opened (manifest-level data skipping, the metadata twin of
    parquet row-group pruning).  Returns ``(df, n_files_read,
    n_files_total)`` so callers — and the regression test — can SEE
    the pruning."""
    import json

    base = path.rstrip("/")
    if version is None:
        version = snapshot_latest_version(spark, base)
    if version <= 0:
        raise ValueError(f"snapshot_scan: no committed version at {path}")
    manifest = json.loads(_read_small(spark, f"{base}/_manifest_v{version}.json"))
    from pyspark.sql.types import StructType

    schema = StructType.fromJson(json.loads(manifest["schema"]))
    stats = manifest.get("stats", {})
    keep = []
    for f in manifest["files"]:
        st = stats.get(f, {}).get(col)
        if st is None or st[0] is None:
            keep.append(f)  # no stats → cannot prune safely
        elif not (st[1] < lo or st[0] > hi):
            keep.append(f)
    pred = (F.col(col) >= F.lit(lo)) & (F.col(col) <= F.lit(hi))
    if not keep:
        return (
            spark.createDataFrame([], schema).filter(pred),
            0,
            len(manifest["files"]),
        )
    # bind the MANIFEST schema, exactly as snapshot_read does: after
    # schema evolution a kept pre-evolution file may sort first, and
    # footer inference off it would drop the evolved column the
    # predicate names (review finding, round 11)
    return (
        spark.read.schema(schema).parquet(*keep).filter(pred),
        len(keep),
        len(manifest["files"]),
    )


def snapshot_append_stream(
    path: str,
    txn_app_id: str,
    stats_cols: list[str] | None = None,
):
    """EXACTLY-ONCE streaming append sink on the snapshot commit log —
    the Delta transactional-sink pattern on plain parquet, keyed by
    ``txn_app_id`` exactly as Delta keys by ``txnAppId``: the manifest
    carries a ``txn`` map {app_id: last_batch_id}, each micro-batch
    becomes one atomic append commit advancing ITS OWN app's
    watermark, and a RETRIED batch (failure after commit but before
    the checkpoint advanced) sees batch_id ≤ its watermark and skips.
    Keying per app is what makes this safe in the real world: a
    SECOND stream with its own checkpoint (fresh batch ids from 0)
    gets its own watermark instead of being silently discarded, and
    plain batch appends carry every app's watermark forward (both
    review findings, round 11).  Structured Streaming delivers
    batch_ids in increasing order per query, which is exactly what a
    per-app watermark needs.  Returns the function for
    ``foreachBatch``."""
    import json

    def commit_batch(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        base = path.rstrip("/")
        cur = snapshot_latest_version(spark, base)
        txn: dict = {}
        if cur > 0:
            prev = json.loads(_read_small(spark, f"{base}/_manifest_v{cur}.json"))
            txn = dict(prev.get("txn", {}))
            last = txn.get(txn_app_id)
            if last is not None and batch_id <= last:
                return  # retry replay of an already-committed batch
        txn[txn_app_id] = batch_id
        snapshot_commit(
            spark,
            batch,
            base,
            mode="append",
            stats_cols=stats_cols,
            _extra={"txn": txn},
        )

    return commit_batch


def snapshot_changes(
    spark,
    path: str,
    from_version: int,
    to_version: int | None = None,
    key_col: str | None = None,
) -> DataFrame:
    """CHANGE DATA FEED between two versions of a keyed snapshot
    table: one row per changed key with ``_change ∈ {insert, update,
    delete}`` plus the row's new values (old values for deletes) —
    the Delta CDF shape, derived entirely from the two immutable
    manifests (time travel makes the diff exact and repeatable; no
    write-side change logging needed).

    Cost note: this reads both versions' files and diffs by key — the
    honest cost of a log-free CDF.  The copy-on-write layout keeps it
    proportional to the table, not to history; a per-commit change
    log (write the survivors/deletes alongside each merge) is the
    incremental variant, stated not built."""
    import json

    base = path.rstrip("/")
    if to_version is None:
        to_version = snapshot_latest_version(spark, base)
    manifest = json.loads(_read_small(spark, f"{base}/_manifest_v{to_version}.json"))
    keyed = manifest.get("keyed")
    if key_col is None:
        if not keyed:
            raise ValueError("snapshot_changes: pass key_col for non-keyed tables")
        key_col = keyed["key_col"]
    old = snapshot_read(spark, base, from_version)
    new = snapshot_read(spark, base, to_version)
    value_cols = [c for c in new.columns if c != key_col]
    new_types = {f.name: f.dataType for f in new.schema.fields}
    # schema evolution: a column added between the versions is absent
    # from the OLD frame — pad it with typed NULLs so the structs line
    # up (review finding, round 11)
    old_vals = [
        F.col(c) if c in old.columns else F.lit(None).cast(new_types[c]).alias(c)
        for c in value_cols
    ]
    o = old.select(
        F.col(key_col),
        F.struct(*old_vals).alias("_old"),
    )
    n = new.select(
        F.col(key_col),
        F.struct(*[F.col(c) for c in value_cols]).alias("_new"),
    )
    joined = o.join(n, key_col, "full_outer")
    return (
        joined.select(
            key_col,
            F.when(F.col("_old").isNull(), F.lit("insert"))
            .when(F.col("_new").isNull(), F.lit("delete"))
            .otherwise(F.lit("update"))
            .alias("_change"),
            F.coalesce(F.col("_new"), F.col("_old")).alias("_row"),
        )
        .filter(
            F.col("_change").isin("insert", "delete")
            | (F.col("_new") != F.col("_old"))
        )
        .select(key_col, "_change", "_row.*")
    )
