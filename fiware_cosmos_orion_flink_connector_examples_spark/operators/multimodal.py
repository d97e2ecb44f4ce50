"""Multimodal column handling ([ext] X5): image/audio/video as opaque
BINARY columns + typed metadata, processed by Arrow-batched pandas
transforms.

The container has no image/audio CODEC libraries, so decode of formats
that need one (JPEG/MP4) is STUBBED (``decode_image_real`` raises
NotImplementedError; that pipeline runs ``fake_decode_features`` — a
deterministic pure function of the bytes).  No-codec formats are
decoded for REAL since round 5: BMP via pure numpy header+pixel parse,
PCM WAV via stdlib ``wave``, and PNG via stdlib ``zlib`` inflate +
numpy scanline unfiltering (all five spec filter types) —
``decode_bmp``/``decode_wav``/``decode_png``/``extract_features_real``,
oracle-checked end-to-end by the ``multimodal_decode_real`` query.
Everything around the remaining stub is real and tested: binary column
construction, metadata schema, ``mapInPandas`` signature, Arrow batch
shapes, partition behavior.

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
    """Real decode for formats needing a CODEC LIBRARY (JPEG/MP4) —
    absent from this container; still stubbed.  No-codec formats are
    real: ``decode_bmp`` (numpy), ``decode_wav`` (stdlib wave), and
    since late round 5 ``decode_png`` (stdlib zlib inflate + numpy
    scanline unfiltering — PNG's only compression is DEFLATE, which
    Python ships)."""
    raise NotImplementedError(
        "JPEG/MP4 codecs unavailable in this environment; "
        "BMP/PNG/WAV decode is real (decode_bmp/decode_png/decode_wav)"
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


def decode_bmp_array(payload: bytes):
    """Parse a BI_RGB 24bpp BMP to its (height, width, 3) uint8 pixel
    array in TOP-DOWN row order (BMP stores rows bottom-up for positive
    heights — flipped back here), padding stripped."""
    import struct

    import numpy as np

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (offset,) = struct.unpack_from("<I", payload, 10)
    width, height = struct.unpack_from("<ii", payload, 18)
    (bpp,) = struct.unpack_from("<H", payload, 28)
    if bpp != 24:
        raise ValueError(f"only 24bpp supported, got {bpp}")
    bottom_up = height > 0
    height = abs(height)
    row = (3 * width + 3) & ~3
    arr = np.frombuffer(payload, dtype="uint8", count=row * height, offset=offset)
    pixels = arr.reshape(height, row)[:, : 3 * width].reshape(height, width, 3)
    return pixels[::-1] if bottom_up else pixels


def decode_bmp(payload: bytes) -> tuple[int, int, float]:
    """Parse a BI_RGB 24bpp BMP: (width, height, mean pixel value) —
    the pixel array really is read and averaged (padding stripped)."""
    pixels = decode_bmp_array(payload)
    h, w, _ = pixels.shape
    return w, h, float(pixels.mean())


def encode_bmp_gray(arr) -> bytes:
    """Encode a 2-D uint8 grayscale array as a BI_RGB 24bpp BMP with
    equal R=G=B channels (rows written bottom-up per spec) — a valid
    file any viewer opens; ``decode_bmp_array`` round-trips it."""
    import struct

    import numpy as np

    a = np.asarray(arr, dtype="uint8")
    height, width = a.shape
    row = (3 * width + 3) & ~3
    img_size = row * height
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    rgb = np.repeat(a[::-1], 3, axis=1)  # bottom-up rows, BGR==gray
    pad = row - 3 * width
    if pad:
        rgb = np.concatenate(
            [rgb, np.zeros((height, pad), dtype="uint8")], axis=1
        )
    return header + rgb.tobytes()


PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def encode_png(width: int, height: int, fill: int) -> bytes:
    """Minimal 8-bit RGB PNG (color type 2, filter 0 rows) via stdlib
    ``zlib`` — PNG's only compression is DEFLATE, which Python ships,
    so no codec library is needed.  Constant ``fill`` byte per channel;
    a valid file any viewer opens."""
    import struct
    import zlib

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw = (b"\x00" + bytes([fill] * (3 * width))) * height
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def decode_png_array(payload: bytes):
    """REAL PNG decode via stdlib ``zlib`` + numpy to the reconstructed
    (height, width, channels) uint8 array: parse chunks, inflate the
    IDAT stream, undo the per-scanline filters (all five spec filter
    types: none/sub/up/average/paeth).  Supports 8-bit gray (color
    type 0) and RGB (type 2), non-interlaced — the shapes a pipeline's
    thumbnail/QC pass sees.  The average/paeth unfilter is
    scanline-sequential by spec (each byte depends on the
    reconstructed left neighbor); the sub filter is a per-lane
    cumulative sum.  CRCs are validated per chunk."""
    import struct
    import zlib

    import numpy as np

    if payload[: len(PNG_MAGIC)] != PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos, idat, ihdr = len(PNG_MAGIC), b"", None
    while pos < len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if zlib.crc32(tag + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {tag!r} chunk")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("missing IHDR")
    width, height, depth, ctype, comp, filt, interlace = ihdr
    if depth != 8 or ctype not in (0, 2) or comp or filt or interlace:
        raise ValueError(
            f"unsupported PNG shape: depth={depth} color={ctype} interlace={interlace}"
        )
    ch = 3 if ctype == 2 else 1
    stride = ch * width
    raw = np.frombuffer(zlib.decompress(idat), dtype="uint8")
    if raw.size != (stride + 1) * height:
        raise ValueError("IDAT size mismatch")
    raw = raw.reshape(height, stride + 1)
    out = np.zeros((height, stride), dtype="uint8")
    for y in range(height):
        ftype, line = raw[y, 0], raw[y, 1:].astype("int32")
        prev = out[y - 1].astype("int32") if y else np.zeros(stride, dtype="int32")
        if ftype == 0:
            rec = line
        elif ftype == 1:  # sub: per-lane cumulative sum mod 256
            rec = line.reshape(-1, ch).cumsum(axis=0).reshape(-1)
        elif ftype == 2:  # up
            rec = line + prev
        elif ftype in (3, 4):  # average / paeth: left-sequential by spec
            rec = np.empty(stride, dtype="int32")
            for x in range(stride):
                # predictors read RECONSTRUCTED bytes — mask to 8 bits
                # as we go, or the left neighbor carries the overflow
                a = rec[x - ch] if x >= ch else 0
                b = prev[x]
                if ftype == 3:
                    rec[x] = (line[x] + ((a + b) >> 1)) & 0xFF
                else:
                    c = prev[x - ch] if x >= ch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    rec[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad filter type {ftype}")
        out[y] = rec & 0xFF
    return out.reshape(height, width, ch)


def decode_png(payload: bytes) -> tuple[int, int, float]:
    """(width, height, mean pixel value) over the real decoded array —
    see ``decode_png_array`` for the decode itself."""
    arr = decode_png_array(payload)
    h, w, _ = arr.shape
    return w, h, float(arr.mean())


def encode_png_gray(arr) -> bytes:
    """Encode a 2-D uint8 grayscale array as an 8-bit grayscale PNG
    (color type 0, filter-0 rows) via stdlib ``zlib`` —
    ``decode_png_array`` round-trips it."""
    import struct
    import zlib

    import numpy as np

    a = np.asarray(arr, dtype="uint8")
    height, width = a.shape

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + a[y].tobytes() for y in range(height))
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


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
                    if b[: len(PNG_MAGIC)] == PNG_MAGIC:
                        w, h, mean = decode_png(b)
                    else:
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

    return media.filter(F.col("payload").isNotNull()).mapInPandas(
        run, schema=REAL_FEATURE_SCHEMA
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

    return media.filter(F.col("payload").isNotNull()).mapInPandas(
        run, schema=FEATURE_SCHEMA
    )


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

    return media.filter(F.col("payload").isNotNull()).mapInPandas(
        run, schema=FRAME_SCHEMA
    )


# --- perceptual hashing (round 7): image NEAR-dup dedup ---------------------
# Text has exact/MinHash/SimHash/embedding dedup; this is the image
# counterpart (X2 x X5): decode -> grayscale -> block-average to an
# 8x8 grid -> average hash (aHash: bit = block >= mean of blocks) as
# one int64 per image.  Near-identical images (recompression, small
# edits, equal-channel format conversion) land within a few Hamming
# bits; candidate pairing is SimHash-style pigeonhole banding
# (operators/dedup.hash_dup_pairs), never image x image.


def ahash64(arr, grid: int = 8) -> int:
    """Average-hash a decoded pixel array to a SIGNED 64-bit int.

    ``arr`` is (h, w) grayscale or (h, w, ch); channels average to
    grayscale first (exact when channels are equal, e.g. gray-encoded
    BMP).  The array block-averages to ``grid x grid`` cells with
    integral floor boundaries (``np.add.reduceat``) — exact block
    means for divisible sizes, deterministic floor-split otherwise —
    then bit(R, C) = cell >= mean(cells), packed row-major MSB-first:
    bit index 63 - (R*grid + C).  Two's-complement wrap keeps the
    value a Spark/DuckDB BIGINT."""
    import numpy as np

    if grid < 1 or grid * grid > 64:
        raise ValueError(f"grid must be in [1, 8] for 64-bit packing, got {grid}")
    a = np.asarray(arr, dtype="float64")
    if a.ndim == 3:
        a = a.mean(axis=2)
    h, w = a.shape
    if h < grid or w < grid:
        raise ValueError(f"image {h}x{w} smaller than {grid}x{grid} grid")
    rb = (np.arange(grid) * h) // grid
    cb = (np.arange(grid) * w) // grid
    sums = np.add.reduceat(np.add.reduceat(a, rb, axis=0), cb, axis=1)
    counts = np.outer(np.diff(np.append(rb, h)), np.diff(np.append(cb, w)))
    cells = sums / counts
    bits = (cells >= cells.mean()).ravel()
    val = 0
    for i, b in enumerate(bits):
        if b:
            val |= 1 << (63 - i)
    return val - (1 << 64) if val >= 1 << 63 else val


def image_phash(media: DataFrame, grid: int = 8) -> DataFrame:
    """Perceptual-hash table over the media model: decode each image
    payload (BMP via ``decode_bmp_array``, PNG via ``decode_png_array``
    — format sniffed by magic) and aHash it -> (media_id, phash).

    One Arrow ``mapInPandas`` pass, no shuffle: payloads stream
    through executor-side batches and only (id, int64) rows come out —
    at 100 TB the downstream dedup never touches image bytes again.
    Non-image kinds and NULL payloads drop at the boundary — and so do
    UNDECODABLE payloads (unsupported container, truncated bytes,
    images smaller than the hash grid): a 100 TB crawl always carries
    a few corrupt blobs, and one bad payload must skip its row, never
    fail the job (ADVICE r7 #1)."""
    # config validation driver-side: inside the per-row try/except a
    # bad grid would masquerade as 100% undecodable payloads (the
    # audio_fingerprint guard, applied to both media paths).
    if grid < 1 or grid * grid > 64:
        raise ValueError(f"grid must be in [1, 8] for 64-bit packing, got {grid}")

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            ids, hashes = [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    b = bytes(payload)
                    arr = (
                        decode_png_array(b)
                        if b[: len(PNG_MAGIC)] == PNG_MAGIC
                        else decode_bmp_array(b)
                    )
                    h = ahash64(arr, grid)
                except Exception:
                    continue  # undecodable: drop at the boundary
                ids.append(mid)
                hashes.append(h)
            yield pd.DataFrame({"media_id": ids, "phash": hashes}).astype(
                {"media_id": "int64", "phash": "int64"}
            )

    return (
        media.filter((F.col("kind") == "image") & F.col("payload").isNotNull())
        .select("media_id", "payload")
        .mapInPandas(run, schema="media_id long, phash long")
    )


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: passes payloads through the pandas path and
    restamps metadata.  The actual pixel resample is the stubbed step."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            # real impl would decode+resample here; stub keeps bytes
            yield pdf

    return media.mapInPandas(run, schema=media.schema)


# --- audio fingerprinting (round 8): WAV NEAR-dup dedup --------------------
# The audio counterpart of the image aHash path (VERDICT r7 #7 — makes
# dedup.hash_dup_pairs' "any fixed-width fingerprint" claim
# load-bearing): decode PCM -> 8 time windows x 8 log-energy FFT bands
# -> bit = cell >= mean of cells -> one int64 per clip.  Re-encoded,
# re-gained, or lightly edited copies of the same recording land
# within a few Hamming bits; pairing reuses hash_dup_pairs UNCHANGED.


def decode_wav_samples(payload: bytes):
    """Mono float64 sample array from a 16-bit PCM WAV (stdlib
    ``wave``; multi-channel averages to mono)."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(payload), "rb") as w:
        nch, swidth, nframes = w.getnchannels(), w.getsampwidth(), w.getnframes()
        rate = w.getframerate()
        raw = w.readframes(nframes)
    if swidth != 2:
        raise ValueError(f"only 16-bit PCM supported, got {swidth * 8}-bit")
    x = np.frombuffer(raw, dtype="<i2").astype("float64")
    if nch > 1:
        x = x[: (x.size // nch) * nch].reshape(-1, nch).mean(axis=1)
    return x, rate


def encode_wav_samples(x, sample_rate: int = 8000) -> bytes:
    """Mono 16-bit PCM WAV from a sample array (values clipped to
    int16 range) — the synthesis side of the audio fixtures."""
    import io
    import wave

    import numpy as np

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(
            np.clip(np.asarray(x), -32768, 32767).astype("<i2").tobytes()
        )
    return buf.getvalue()


def audio_fp64(x, grid: int = 8) -> int:
    """Spectral fingerprint of a sample array as a SIGNED 64-bit int:
    ``grid`` equal time windows (integral floor boundaries, trailing
    remainder joins the last window), each rFFT'd; positive-frequency
    power splits into ``grid`` equal bands; cell(w, b) =
    log1p(band power); bit = cell >= mean(cells), packed row-major
    (window-major) MSB-first exactly like ``ahash64``.

    The log compresses the dynamic range so the mean-threshold bit is
    driven by WHICH bands carry energy (the perceptual content), not
    by gain — re-gained copies keep their bits, unrelated tone mixes
    differ in ~half of them (property-tested)."""
    import numpy as np

    if grid < 1 or grid * grid > 64:
        # 64-bit packing bound: grid > 8 would shift by a negative
        # count inside the per-row decode try/except, silently
        # dropping EVERY clip as "undecodable" — fail loudly at the
        # config boundary instead (review finding, round 8).
        raise ValueError(f"grid must be in [1, 8] for 64-bit packing, got {grid}")
    x = np.asarray(x, dtype="float64")
    if x.size < grid * 2:
        raise ValueError(f"{x.size} samples too short for {grid} windows")
    win = x.size // grid
    if x.size % grid == 0:
        # divisible fast path (the common fixed-length-clip case): ONE
        # batched rFFT over the (grid, win) window matrix + per-band
        # axis sums — ~grid numpy ops per clip instead of grid² python
        # slices (measured 2.7 → 1.3 s over 5000 clips at sf0.1)
        p = np.abs(np.fft.rfft(x.reshape(grid, win), axis=1)[:, 1:]) ** 2
        if p.shape[1] < grid:
            p = np.pad(p, ((0, 0), (0, grid - p.shape[1])))
        bb = (np.arange(grid) * p.shape[1]) // grid
        cells = np.stack(
            [
                np.log1p(
                    p[:, bb[b] : bb[b + 1] if b < grid - 1 else p.shape[1]].sum(
                        axis=1
                    )
                )
                for b in range(grid)
            ],
            axis=1,
        )
    else:
        cells = np.empty((grid, grid))
        for wdx in range(grid):
            seg = (
                x[wdx * win :] if wdx == grid - 1 else x[wdx * win : (wdx + 1) * win]
            )
            p = np.abs(np.fft.rfft(seg)[1:]) ** 2  # drop DC: gain offset bin
            if p.size < grid:
                p = np.pad(p, (0, grid - p.size))
            bb = (np.arange(grid) * p.size) // grid
            cells[wdx] = [
                np.log1p(p[bb[b] : bb[b + 1] if b < grid - 1 else p.size].sum())
                for b in range(grid)
            ]
    bits = (cells >= cells.mean()).ravel()
    val = 0
    for i, b in enumerate(bits):
        if b:
            val |= 1 << (63 - i)
    return val - (1 << 64) if val >= 1 << 63 else val


def audio_fingerprint(media: DataFrame, grid: int = 8) -> DataFrame:
    """Fingerprint table over the media model: decode each 'audio'
    payload (PCM WAV) and spectral-hash it -> (media_id, afp).  One
    Arrow ``mapInPandas`` pass, no shuffle — only (id, int64) rows
    reach the downstream banded dedup, mirroring ``image_phash``;
    undecodable payloads drop at the boundary (same contract)."""
    # config validation must happen HERE, driver-side: inside the
    # per-row try/except a bad grid would masquerade as 100%
    # undecodable payloads (empty output, no error).
    if grid < 1 or grid * grid > 64:
        raise ValueError(f"grid must be in [1, 8] for 64-bit packing, got {grid}")

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            ids, fps = [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    x, _ = decode_wav_samples(bytes(payload))
                    fp = audio_fp64(x, grid)
                except Exception:
                    continue  # undecodable: drop at the boundary
                ids.append(mid)
                fps.append(fp)
            yield pd.DataFrame({"media_id": ids, "afp": fps}).astype(
                {"media_id": "int64", "afp": "int64"}
            )

    return (
        media.filter((F.col("kind") == "audio") & F.col("payload").isNotNull())
        .select("media_id", "payload")
        .mapInPandas(run, schema="media_id long, afp long")
    )
