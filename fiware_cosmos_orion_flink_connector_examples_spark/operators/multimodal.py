"""Multimodal column handling ([ext] X5): image/audio/video as opaque
BINARY columns + typed metadata, processed by Arrow-batched pandas
transforms.

The container has no image/audio codecs, so the actual decode is
STUBBED (``decode_image_real`` raises NotImplementedError; the
pipeline runs ``fake_decode_features`` — a deterministic pure function
of the bytes).  Everything around the stub is real and tested: binary
column construction, metadata schema, ``mapInPandas`` signature, Arrow
batch shapes, and partition behavior — swap one function when codecs
exist.

Scale notes: mapInPandas streams Arrow record batches (no per-row
Python overhead); binary payloads stay columnar end-to-end; the
metadata-only queries (byte length, sha256) never enter Python at all.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

if TYPE_CHECKING:
    import pandas as pd

# media row: opaque payload + typed metadata (the multimodal data model)
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("n_bytes", LongType()),
        StructField("sha256", StringType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("first_byte", IntegerType()),
    ]
)


def to_media_table(df: DataFrame, id_col: str, payload_col: str, kind: str) -> DataFrame:
    """Wrap any binary-bearing DataFrame into the media model with
    metadata computed JVM-side (no Python)."""
    payload = F.col(payload_col).cast("binary")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(kind).alias("kind"),
        payload.alias("payload"),
        F.length(payload).cast("long").alias("n_bytes"),
        F.sha2(payload, 256).alias("sha256"),
    )


def decode_image_real(payload: bytes) -> tuple[int, int]:
    """Real decode path — requires an image codec (not in this
    container).  Plumbing is exercised via fake_decode_features."""
    raise NotImplementedError(
        "image codecs unavailable in this environment; use fake_decode_features"
    )


def fake_decode_features(payload: bytes) -> tuple[int, int, int, int]:
    """Deterministic stand-in for decode: (width, height, n_frames,
    first_byte) as pure functions of the payload bytes.  Chosen to be
    reproducible in SQL so the oracle can check the full mapInPandas
    path: width = n%64+1, height = (n//64)%64+1, n_frames = n%16+1,
    first_byte = payload[0]."""
    n = len(payload)
    if n == 0:
        return (1, 1, 1, 0)
    return (n % 64 + 1, (n // 64) % 64 + 1, n % 16 + 1, payload[0])


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the media table.  One
    mapInPandas pass; batch shape = (rows of the input partition), no
    shuffle introduced."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            feats = [fake_decode_features(bytes(p)) for p in pdf["payload"]]
            out = pd.DataFrame(
                feats, columns=["width", "height", "n_frames", "first_byte"]
            )
            out.insert(0, "kind", pdf["kind"].values)
            out.insert(0, "media_id", pdf["media_id"].values)
            yield out

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_bytes", BinaryType()),
    ]
)


def sample_frames(media: DataFrame, frame_size: int = 256, every_n: int = 2) -> DataFrame:
    """Frame-sampling plumbing for video payloads: split each payload
    into ``frame_size``-byte pseudo-frames (a real impl would parse
    container frame boundaries — that's the stubbed step) and keep
    every ``every_n``-th.  One mapInPandas pass; output is a frame-level
    table (media_id, frame_idx, frame_bytes) ready for per-frame
    feature extraction.  Row explosion happens executor-side inside the
    Arrow batch — no driver involvement, no shuffle."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                n_frames = max((len(b) + frame_size - 1) // frame_size, 1)
                for i in range(0, n_frames, every_n):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(b[i * frame_size : (i + 1) * frame_size])
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_bytes": frames}
            )

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: passes payloads through the pandas path and
    restamps metadata.  The actual pixel resample is the stubbed step."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            # real impl would decode+resample here; stub keeps bytes
            yield pdf

    return media.mapInPandas(run, schema=media.schema)
