"""The snapshot CDC feed as a NATIVE Structured Streaming source
(round 16): ``spark.readStream.format("snapshot_cdc").load(path)``
streams a snapshot table's per-commit changes — ``_version``,
``_change`` (insert/update/delete) plus the table's columns — into ANY
streaming query, via PySpark 4's Python Data Source API.

Why this shape: the engine's maintenance sinks (``maintain_agg_view``,
``search_index_sync``…) already tail the commit log with their own
exactly-once cursors, but an EXTERNAL consumer (a Kafka egress job, a
warehouse loader, someone else's foreachBatch) previously had to poll
``layout.snapshot_tail`` by hand.  As a registered data source the
commit log becomes a first-class stream: offsets are commit VERSIONS
(``{"version": N}``), so Structured Streaming's checkpoint IS the
cursor — deterministic replay between offsets gives exactly-once to
any downstream sink that is idempotent or transactional, the same
contract Delta's CDF streaming read offers.

Scale shape: planning is metadata-only on the driver (two small JSON
reads per commit — the ``snapshot_span_delta_files`` discipline);
ROW READING RUNS ON EXECUTORS, one input partition per recorded delta
file (``partitions()`` → pyarrow reads inside ``read(partition)``), so
a large backlog fans out across the cluster instead of funneling
through the driver.  The reader is PURE PYTHON (json + pyarrow — no
JVM round-trips): it reads the same ``_manifest_vN.json`` /
``segments/seg-vN-*.json`` files ``layout`` writes.

Semantics match ``layout.snapshot_changes_feed``: post-image rows only
(``update_pre`` pre-images stay internal to the IVM algebra — pass
``.option("includePreImages", "true")`` to emit them too, which is
what an EXTERNAL signed-delta consumer doing its own incremental
aggregation needs: insert/update +1, delete/update_pre −1), version
1 (the table's creation) streams as inserts when starting from offset
0, metadata-only commits contribute nothing, and a truncate/overwrite
in the span raises (re-bootstrap the consumer).  Vacuumed-away
versions raise with the re-bootstrap hint rather than silently
skipping.

Usage::

    from fiware_cosmos_orion_flink_connector_examples_spark.sources import (
        cdc_stream,
    )

    cdc_stream.register(spark)
    feed = (spark.readStream.format("snapshot_cdc")
            .option("startVersion", 0)       # 0 = bootstrap from v1
            .load("/data/my_table"))
    q = feed.writeStream.foreachBatch(...).start()

Limits (stated): the table path must be reachable from plain Python
``open()`` on driver AND executors (local/NFS paths — the engine's
test and single-box deployment shape; an object-store deployment
would swap the two ``open()`` call sites for fsspec).  The declared
schema is the table's schema AT STREAM START; a mid-stream schema
evolution's new columns are dropped until the stream restarts (Spark
streams have a fixed schema — same contract as Delta CDF).

Reference scope note: the reference repo's only source is an HTTP
notification receiver (Example1.scala:17); [ext] engine
infrastructure for the mandated training-data pipeline surface.
"""

from __future__ import annotations

import glob
import json
import os
import re
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)


def _local(path: str) -> str:
    """file:/ URI → plain path.  The manifests record Hadoop Path
    renderings — RAW characters, never percent-encoded — so this only
    strips the scheme; percent-decoding here would corrupt any real
    path containing '%' (pinned by the hostile-path pytest)."""
    if path.startswith("file:"):
        return re.sub("^file:/+", "/", path)
    return path


def _latest_version(base: str) -> int:
    vs = [
        int(m.group(1))
        for f in glob.glob(os.path.join(base, "_manifest_v*.json"))
        if (m := re.fullmatch(r"_manifest_v(\d+)\.json", os.path.basename(f)))
    ]
    return max(vs, default=0)


def _manifest_doc(base: str, version: int) -> dict:
    p = os.path.join(base, f"_manifest_v{version}.json")
    try:
        with open(p) as fh:
            return json.load(fh)
    except FileNotFoundError:
        raise FileNotFoundError(
            f"snapshot_cdc: version {version} of {base} is missing — "
            f"expired by vacuum_snapshots (latest is {_latest_version(base)});"
            " re-bootstrap the stream from a retained version"
        ) from None


def _segment_doc(base: str, rel: str) -> dict:
    with open(os.path.join(base, rel)) as fh:
        return json.load(fh)


def _ddl_type(t) -> str:
    """Spark schema-JSON type → DDL string (primitives, decimals,
    arrays, maps, structs — the shapes snapshot tables carry)."""
    if isinstance(t, str):
        return t  # long/string/double/timestamp/decimal(p,s)/…
    kind = t.get("type")
    if kind == "array":
        return f"array<{_ddl_type(t['elementType'])}>"
    if kind == "map":
        return f"map<{_ddl_type(t['keyType'])},{_ddl_type(t['valueType'])}>"
    if kind == "struct":
        inner = ",".join(
            f"{f['name']}:{_ddl_type(f['type'])}" for f in t["fields"]
        )
        return f"struct<{inner}>"
    raise ValueError(f"snapshot_cdc: unsupported type {t!r}")


def _table_cols(manifest: dict) -> list[str]:
    return [f["name"] for f in json.loads(manifest["schema"])["fields"]]


class _CdcPartition(InputPartition):
    """One recorded delta file of one commit — the executor-side read
    unit.  ``kind`` is "log" (changelog rows carrying ``_change``) or
    "insert" (append/bootstrap data served as inserts)."""

    def __init__(self, version: int, kind: str, file: str, cols: list[str]):
        self.version = version
        self.kind = kind
        self.file = file
        self.cols = cols


class SnapshotCdcStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        self.base = _local(options["path"]).rstrip("/")
        self.start_version = int(options.get("startVersion", 0))
        self.include_pre = str(
            options.get("includePreImages", "false")
        ).lower() in ("true", "1", "yes")

    # -- offsets ------------------------------------------------------
    def initialOffset(self) -> dict:
        return {"version": self.start_version}

    def latestOffset(self) -> dict:
        return {"version": max(_latest_version(self.base), self.start_version)}

    def commit(self, end: dict) -> None:
        pass  # the checkpoint is the cursor; nothing engine-side to ack

    # -- planning (driver, metadata-only) ------------------------------
    def partitions(self, start: dict, end: dict) -> list[_CdcPartition]:
        base = self.base
        out: list[_CdcPartition] = []
        for v in range(int(start["version"]) + 1, int(end["version"]) + 1):
            doc = _manifest_doc(base, v)
            cols = _table_cols(doc)
            segs = doc.get("segments") or []
            rel = segs[-1] if segs else None
            if rel is None or f"seg-v{v}-" not in rel:
                raise ValueError(
                    f"snapshot_cdc: version {v} of {base} has no own "
                    "segment — pre-segment history; re-bootstrap"
                )
            seg = _segment_doc(base, rel)
            mode = seg.get("change_mode")
            if mode is None and seg.get("truncate") and v == 1:
                mode = "bootstrap"  # the creation commit: adds ARE the rows
            if mode == "log":
                kind = "log_pre" if self.include_pre else "log"
                for f in seg.get("changelog") or []:
                    out.append(_CdcPartition(v, kind, _local(f), cols))
            elif mode in ("insert", "bootstrap"):
                for f in seg.get("add") or []:
                    out.append(_CdcPartition(v, "insert", _local(f), cols))
            elif mode == "truncate":
                raise ValueError(
                    f"snapshot_cdc: span crosses a TRUNCATE/overwrite commit "
                    f"(v{v} of {base}) — not expressible as row changes; "
                    "re-bootstrap the stream from that version"
                )
            elif mode == "none" or (seg.get("truncate") and mode is None):
                continue  # metadata/file compaction — no logical change
            else:
                raise ValueError(
                    f"snapshot_cdc: version {v} of {base} recorded no change "
                    "delta — re-bootstrap the stream"
                )
        return out

    # -- reading (executors, pure pyarrow) ------------------------------
    def read(self, partition: _CdcPartition) -> Iterator[tuple]:
        import pyarrow.parquet as pq

        tbl = pq.read_table(partition.file)
        names = set(tbl.column_names)
        n = tbl.num_rows

        def col(name):
            if name in names:
                return tbl.column(name).to_pylist()
            return [None] * n  # schema-evolution: file predates the column

        data = [col(c) for c in partition.cols]
        if partition.kind in ("log", "log_pre"):
            changes = col("_change")
            keep_pre = partition.kind == "log_pre"
            for i in range(n):
                ch = changes[i]
                if ch == "update_pre" and not keep_pre:
                    continue  # pre-images stay internal to the IVM algebra
                yield (partition.version, ch) + tuple(d[i] for d in data)
        else:
            for i in range(n):
                yield (partition.version, "insert") + tuple(d[i] for d in data)


class SnapshotCdcDataSource(DataSource):
    """``format("snapshot_cdc")`` — see the module docstring."""

    @classmethod
    def name(cls) -> str:
        return "snapshot_cdc"

    def schema(self) -> str:
        base = _local(self.options["path"]).rstrip("/")
        latest = _latest_version(base)
        if latest == 0:
            raise ValueError(f"snapshot_cdc: no committed table at {base}")
        fields = json.loads(_manifest_doc(base, latest)["schema"])["fields"]
        cols = ", ".join(f"`{f['name']}` {_ddl_type(f['type'])}" for f in fields)
        return f"`_version` bigint, `_change` string, {cols}"

    def streamReader(self, schema) -> SnapshotCdcStreamReader:
        return SnapshotCdcStreamReader(self.options)


def register(spark) -> None:
    """Register the source on a session:
    ``spark.readStream.format("snapshot_cdc").load(table_path)``."""
    spark.dataSource.register(SnapshotCdcDataSource)
