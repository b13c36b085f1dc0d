"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Pattern (BASELINE north-star): image/audio/video travel through the engine
as ``binary`` columns with a typed metadata struct; decode / feature
extraction / frame sampling run as Arrow-batched ``mapInPandas`` stages so
the (heavy) per-item work is vectorized per partition and never crosses the
driver.

The decode step is REAL for two pure-byte public formats that need no
external libraries:

- netpbm PPM ``P6`` (binary pixmap): tokenized header (whitespace +
  ``#``-comment handling per the netpbm spec) + raw RGB bytes.
- RIFF/WAVE PCM: chunk-walked container (``RIFF``/``WAVE``, ``fmt ``,
  ``data``) + little-endian 16-bit samples.

``decode_media`` sniffs the magic and dispatches. Payload *generation* is
JVM-side column expressions (``with_media_payload``): the image body is a
real PPM rendered from the document bytes, the audio body a real WAV —
so the Python stage genuinely parses foreign bytes it did not produce.

The container envelope is 12 bytes: magic 'SPMM' + 4-byte big-endian
media_type + 4-byte body length, with a typed metadata struct alongside.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Header: magic 'SPMM' + 4-byte big-endian media_type + 4-byte payload len.
MAGIC = b"SPMM"
HEADER_LEN = 12
FRAME_SIZE = 64  # bytes per synthetic "frame" for frame sampling

# Fixed shapes for the generated media bodies (small enough that every
# fixture document fills them; short bodies are zero-padded).
PPM_W, PPM_H, PPM_MAXVAL = 8, 6, 255
PPM_PIX_BYTES = PPM_W * PPM_H * 3  # 144
PPM_HEADER = f"P6\n{PPM_W} {PPM_H}\n{PPM_MAXVAL}\n".encode()

WAV_DATA_LEN = 256  # bytes -> 128 s16le samples
WAV_RATE = 8000
WAV_HEADER = (
    b"RIFF"
    + struct.pack("<I", 36 + WAV_DATA_LEN)
    + b"WAVE"
    + b"fmt "
    + struct.pack("<IHHIIHH", 16, 1, 1, WAV_RATE, WAV_RATE * 2, 2, 16)
    + b"data"
    + struct.pack("<I", WAV_DATA_LEN)
)


def with_payload(doc_df: DataFrame) -> DataFrame:
    """Attach the synthetic opaque binary column + typed metadata struct.

    media_type is derived from doc_id (0=image, 1=audio, 2=video) purely to
    exercise the typed-metadata path. Body = raw utf-8 document bytes (the
    metadata path does not decode; see ``with_media_payload`` for real
    format bodies).
    """
    media_type = (F.col("doc_id") % 3).cast("int")
    body = F.encode(F.col("text"), "utf-8")
    header = F.concat(
        F.lit(MAGIC),
        _int32_be(media_type),
        _int32_be(F.length(body)),
    )
    return doc_df.select(
        "doc_id",
        F.concat(header, body).alias("payload"),
        F.struct(
            media_type.alias("media_type"),
            F.length(body).alias("body_len"),
        ).alias("meta"),
    )


def with_media_payload(doc_df: DataFrame) -> DataFrame:
    """SPMM envelope whose body is a REAL format: PPM for media_type 0,
    WAV for 1, raw bytes for 2. All JVM column expressions (binary rpad /
    substring are byte-based); the document bytes become the pixel /
    sample data, zero-padded to the fixed shape."""
    media_type = (F.col("doc_id") % 3).cast("int")
    b = F.encode(F.col("text"), "utf-8")
    # binary rpad (byte-based) needs a binary pad literal -> call_function
    rpad_bin = lambda c, n: F.call_function(  # noqa: E731
        "rpad", c, F.lit(n), F.lit(b"\x00")
    )
    ppm = F.concat(
        F.lit(PPM_HEADER), rpad_bin(F.substring(b, 1, PPM_PIX_BYTES), PPM_PIX_BYTES)
    )
    wav = F.concat(
        F.lit(WAV_HEADER), rpad_bin(F.substring(b, 1, WAV_DATA_LEN), WAV_DATA_LEN)
    )
    body = (
        F.when(media_type == 0, ppm).when(media_type == 1, wav).otherwise(b)
    )
    header = F.concat(F.lit(MAGIC), _int32_be(media_type), _int32_be(F.length(body)))
    return doc_df.select(
        "doc_id",
        F.concat(header, body).alias("payload"),
        F.struct(
            media_type.alias("media_type"),
            F.length(body).alias("body_len"),
        ).alias("meta"),
    )


def _int32_be(col):
    """Big-endian 4-byte encoding of a non-negative int column (JVM-side)."""
    hexstr = F.lpad(F.hex(col.cast("bigint")), 8, "0")
    return F.to_binary(hexstr, F.lit("hex"))


# ---------------------------------------------------------------------------
# Real decoders (pure Python/numpy, public byte formats)
# ---------------------------------------------------------------------------


def decode_ppm(data: bytes) -> tuple[int, int, int, bytes]:
    """Parse a binary PPM (netpbm ``P6``): returns (width, height, maxval,
    pixel bytes). Real header tokenizer — arbitrary whitespace between
    tokens and ``#`` comments to end-of-line, per the netpbm spec."""
    if data[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    pos = 2
    tokens: list[int] = []
    while len(tokens) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if pos < len(data) and data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PPM header")
        tokens.append(int(data[start:pos]))
    pos += 1  # single whitespace byte after maxval, then raster starts
    width, height, maxval = tokens
    if not (0 < maxval < 65536):
        raise ValueError(f"bad maxval {maxval}")
    n = width * height * 3 * (2 if maxval > 255 else 1)
    pixels = data[pos : pos + n]
    if len(pixels) < n:
        raise ValueError("truncated PPM raster")
    return width, height, maxval, pixels


def decode_wav(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """Parse a RIFF/WAVE container: returns (channels, sample_rate,
    bits_per_sample, samples). Real chunk walker — skips unknown chunks,
    honors chunk sizes (+pad byte), requires a ``fmt `` before ``data``."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, ch, rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if audio_fmt != 1:
                raise ValueError(f"not PCM (format {audio_fmt})")
            fmt = (ch, rate, bits)
        elif cid == b"data":
            if fmt is None:
                raise ValueError("data chunk before fmt")
            ch, rate, bits = fmt
            if bits == 16:
                samples = np.frombuffer(body, dtype="<i2")
            elif bits == 8:
                samples = np.frombuffer(body, dtype=np.uint8).astype(np.int16) - 128
            else:
                raise ValueError(f"unsupported bit depth {bits}")
            return ch, rate, bits, samples
        pos += 8 + size + (size & 1)  # RIFF chunks are word-aligned
    raise ValueError("no data chunk")


def decode_media(data: bytes) -> tuple[str, dict]:
    """Sniff + dispatch: 'ppm' / 'wav' / 'raw' with format-specific info."""
    if data[:2] == b"P6":
        w, h, maxval, pixels = decode_ppm(data)
        return "ppm", {"width": w, "height": h, "maxval": maxval, "pixels": pixels}
    if data[:4] == b"RIFF":
        ch, rate, bits, samples = decode_wav(data)
        return "wav", {"channels": ch, "rate": rate, "bits": bits, "samples": samples}
    return "raw", {"body": data}


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("body_len", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("maxval", T.IntegerType()),
        T.StructField("mean_byte", T.IntegerType()),
    ]
)


def extract_features(mm_df: DataFrame) -> DataFrame:
    """Arrow-batched REAL image decode + feature extraction: parses the PPM
    body of every row (rows must be media_type 0) and reduces the raster to
    summary features. Partition-local, no shuffle."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                body = bytes(payload)[HEADER_LEN:]
                width, height, maxval, pixels = decode_ppm(body)
                arr = np.frombuffer(pixels, dtype=np.uint8)
                rows.append(
                    (
                        int(doc_id),
                        len(body),
                        width,
                        height,
                        maxval,
                        int(arr.sum()) // len(arr),
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in FEATURE_SCHEMA.fields]
            )

    return mm_df.mapInPandas(batches, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_len", T.IntegerType()),
        T.StructField("frame_byte_sum", T.LongType()),
        T.StructField("frame_crc", T.LongType()),
    ]
)


AUDIO_WIN = 32  # samples per analysis window

ENERGY_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("win_idx", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("energy", T.LongType()),
    ]
)


def audio_window_energy(mm_df: DataFrame, win: int = AUDIO_WIN) -> DataFrame:
    """Windowed audio energy via REAL WAV decode: chunk-walk the RIFF
    container, read the little-endian PCM samples, reduce each
    ``win``-sample window to mean-square energy. Arrow-batched
    mapInPandas, one output row per (doc, window), partition-local."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: list[tuple[int, int, int, int]] = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                body = bytes(payload)[HEADER_LEN:]
                _ch, _rate, _bits, samples = decode_wav(body)
                sq = samples.astype(np.int64) ** 2
                n = len(sq)
                for i in range((n + win - 1) // win):
                    chunk = sq[i * win : (i + 1) * win]
                    out.append(
                        (int(doc_id), i, len(chunk), int(chunk.sum()) // len(chunk))
                    )
            yield pd.DataFrame(
                out, columns=[f.name for f in ENERGY_SCHEMA.fields]
            )

    return mm_df.mapInPandas(batches, schema=ENERGY_SCHEMA)


def sample_frames(mm_df: DataFrame, stride: int = 2) -> DataFrame:
    """Frame-sample the payload: every ``stride``-th FRAME_SIZE-byte chunk.

    Video stays an opaque byte stream (no in-container video codec is
    byte-exact without libraries); emits one row per sampled frame with a
    checksum so correctness is byte-exact without shipping frames.
    """
    import zlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                body = bytes(payload)[HEADER_LEN:]
                n_frames = (len(body) + FRAME_SIZE - 1) // FRAME_SIZE
                for i in range(0, n_frames, stride):
                    chunk = body[i * FRAME_SIZE : (i + 1) * FRAME_SIZE]
                    rows.append(
                        (int(doc_id), i, len(chunk), sum(chunk), zlib.crc32(chunk))
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in FRAME_SCHEMA.fields]
            )

    return mm_df.mapInPandas(batches, schema=FRAME_SCHEMA)
