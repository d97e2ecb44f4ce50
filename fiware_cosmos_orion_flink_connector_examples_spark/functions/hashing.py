"""Cross-engine-stable hash primitives.

All dedup/fingerprint operators hash through md5 — not because md5 is
fast (Spark's murmur3 `F.hash` is faster) but because the correctness
oracle (DuckDB) must reproduce the exact same integers; md5 is the
one hash both engines implement bit-identically.  The swap to
`F.xxhash64` for production is a one-liner kept in `fast_hash64`.

md5int64: first 15 hex chars of md5 → BIGINT (60 bits, always
positive, no overflow).  DuckDB equivalent:
``CAST(concat('0x', substr(md5(x), 1, 15)) AS BIGINT)``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MD5INT_BITS = 60


def md5int64(col: Column) -> Column:
    """Deterministic 60-bit positive integer hash of a string column."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def md5int64_seeded(col: Column, seed: int | str) -> Column:
    """Seeded variant: H_seed(x) = md5int64(seed || ':' || x) — the
    MinHash hash-family construction."""
    return md5int64(F.concat(F.lit(f"{seed}:"), col))


def fast_hash64(col: Column) -> Column:
    """Production path (no oracle requirement): xxhash64, JVM codegen."""
    return F.xxhash64(col)


def duckdb_md5int64(expr: str) -> str:
    """The DuckDB SQL rendering of md5int64 for oracle strings."""
    return f"CAST(concat('0x', substr(md5({expr}), 1, 15)) AS BIGINT)"


def duckdb_md5int64_seeded(expr: str, seed: int | str) -> str:
    return duckdb_md5int64(f"concat('{seed}:', {expr})")
