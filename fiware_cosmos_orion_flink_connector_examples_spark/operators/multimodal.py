"""Multimodal column handling ([ext] X5): image/audio/video as opaque
BINARY columns + typed metadata, processed by Arrow-batched pandas
transforms.

The container has no image/audio CODEC libraries, so decode of
compressed formats (JPEG/PNG/MP4) is STUBBED (``decode_image_real``
raises NotImplementedError; that pipeline runs ``fake_decode_features``
— a deterministic pure function of the bytes).  Codec-LESS formats are
decoded for REAL since round 5: BMP via pure numpy header+pixel parse
and PCM WAV via stdlib ``wave`` (``decode_bmp``/``decode_wav``/
``extract_features_real``, oracle-checked end-to-end by the
``multimodal_decode_real`` query).  Everything around the remaining
stub is real and tested: binary column construction, metadata schema,
``mapInPandas`` signature, Arrow batch shapes, partition behavior.

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
    DoubleType,
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
    """Real decode for COMPRESSED formats (JPEG/PNG/MP4) — requires a
    codec library, absent from this container; still stubbed.  The
    codec-LESS formats are no longer stubbed: see ``decode_bmp`` /
    ``decode_wav`` (pure numpy / stdlib) and ``extract_features_real``."""
    raise NotImplementedError(
        "compressed-image codecs unavailable in this environment; "
        "BMP/WAV decode is real (decode_bmp/decode_wav)"
    )


# --- real codec-less decoders (round 5) ------------------------------------
# The container has no PIL/ffmpeg, but uncompressed containers need no
# codec: BMP is a struct header + raw pixel rows (numpy), WAV is stdlib
# `wave`.  These make the decode step REAL for those formats; the
# compressed formats stay behind decode_image_real's NotImplementedError.


def encode_bmp(width: int, height: int, fill: int) -> bytes:
    """Minimal BI_RGB 24bpp BMP with a constant ``fill`` byte in every
    channel — a valid file any image viewer opens.  Used by tests and
    the roundtrip query to synthesize decodable payloads."""
    import struct

    row = (3 * width + 3) & ~3  # rows pad to 4-byte boundaries
    img_size = row * height
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    row_bytes = bytes([fill] * (3 * width)) + b"\x00" * (row - 3 * width)
    return header + row_bytes * height


def decode_bmp(payload: bytes) -> tuple[int, int, float]:
    """Parse a BI_RGB 24bpp BMP: (width, height, mean pixel value) —
    the pixel array really is read and averaged (padding stripped)."""
    import struct

    import numpy as np

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (offset,) = struct.unpack_from("<I", payload, 10)
    width, height = struct.unpack_from("<ii", payload, 18)
    (bpp,) = struct.unpack_from("<H", payload, 28)
    if bpp != 24:
        raise ValueError(f"only 24bpp supported, got {bpp}")
    height = abs(height)
    row = (3 * width + 3) & ~3
    arr = np.frombuffer(payload, dtype="uint8", count=row * height, offset=offset)
    pixels = arr.reshape(height, row)[:, : 3 * width]
    return width, height, float(pixels.mean())


def encode_wav(n_frames: int, amplitude: int, sample_rate: int = 8000) -> bytes:
    """Mono 16-bit PCM WAV holding a constant-amplitude signal (stdlib
    ``wave`` writer — no codec involved)."""
    import io
    import wave

    import numpy as np

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(np.full(n_frames, amplitude, dtype="<i2").tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[int, int, int, float]:
    """Parse a PCM WAV via stdlib ``wave``: (n_channels, sample_rate,
    n_frames, rms of the 16-bit samples)."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(payload), "rb") as w:
        nch, swidth, rate, nframes = (
            w.getnchannels(),
            w.getsampwidth(),
            w.getframerate(),
            w.getnframes(),
        )
        raw = w.readframes(nframes)
    if swidth != 2:
        raise ValueError(f"only 16-bit PCM supported, got {swidth * 8}-bit")
    x = np.frombuffer(raw, dtype="<i2").astype("float64")
    rms = float(np.sqrt((x * x).mean())) if x.size else 0.0
    return nch, rate, nframes, rms


REAL_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("mean_value", DoubleType()),
    ]
)


def extract_features_real(media: DataFrame) -> DataFrame:
    """REAL decode over the media table for codec-less formats: BMP
    payloads (kind=image) via ``decode_bmp``, WAV payloads (kind=audio)
    via ``decode_wav``.  Same Arrow mapInPandas shape as the stubbed
    ``extract_features``; images report (width, height, n_frames=1,
    sample_rate=0, mean pixel), audio reports (width=channels,
    height=0, n_frames, sample_rate, rms)."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                b = bytes(payload)
                if kind == "image":
                    w, h, mean = decode_bmp(b)
                    rows.append((mid, kind, w, h, 1, 0, mean))
                elif kind == "audio":
                    nch, rate, nframes, rms = decode_wav(b)
                    rows.append((mid, kind, nch, 0, nframes, rate, rms))
                else:
                    raise ValueError(f"no codec-less decoder for kind={kind}")
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "kind",
                    "width",
                    "height",
                    "n_frames",
                    "sample_rate",
                    "mean_value",
                ],
            )

    return media.mapInPandas(run, schema=REAL_FEATURE_SCHEMA)


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
