"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Pattern (BASELINE north-star): image/audio/video travel through the engine
as ``binary`` columns with a typed metadata struct; decode / feature
extraction / frame sampling run as Arrow-batched ``mapInPandas`` stages so
the (heavy, library-bound) per-item work is vectorized per partition and
never crosses the driver.

The container has no image/audio libraries, so the *decode* step is a
clearly-marked stub: ``decode_image_real`` raises NotImplementedError and
``_fake_decode`` supplies a deterministic stand-in derived from the payload
bytes. Everything Spark-side — schema, Arrow batch shape, partition
behavior, UDF signatures — is real and tested.

The synthetic payload is the utf-8 encoding of ``documents.text`` plus a
12-byte header, so fixtures need no extra tables and the DuckDB oracle can
mirror the deterministic parts (length / header fields) in SQL.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Header: magic 'SPMM' + 4-byte big-endian media_type + 4-byte payload len.
MAGIC = b"SPMM"
HEADER_LEN = 12
FRAME_SIZE = 64  # bytes per synthetic "frame" for frame sampling


def with_payload(doc_df: DataFrame) -> DataFrame:
    """Attach the synthetic opaque binary column + typed metadata struct.

    media_type is derived from doc_id (0=image, 1=audio, 2=video) purely to
    exercise the typed-metadata path.
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


def _int32_be(col):
    """Big-endian 4-byte encoding of a non-negative int column (JVM-side)."""
    hexstr = F.lpad(F.hex(col.cast("bigint")), 8, "0")
    return F.to_binary(hexstr, F.lit("hex"))


def decode_image_real(payload: bytes):
    """Real decode would use PIL/ffmpeg — unavailable in this container."""
    raise NotImplementedError(
        "image/audio decode requires codec libraries not present here; "
        "wire PIL/torchaudio/pyav in here when deploying"
    )


def _fake_decode(body: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for decode: (width, height, mean_byte)."""
    width = 16 + (len(body) % 640)
    height = 16 + ((len(body) * 7) % 480)
    mean_byte = (sum(body) // len(body)) if body else 0
    return width, height, mean_byte


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.IntegerType()),
        T.StructField("body_len", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_byte", T.IntegerType()),
    ]
)


def extract_features(mm_df: DataFrame) -> DataFrame:
    """Arrow-batched decode + feature extraction over the payload column."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload, meta in zip(
                pdf["doc_id"], pdf["payload"], pdf["meta"]
            ):
                body = bytes(payload)[HEADER_LEN:]
                width, height, mean_byte = _fake_decode(body)
                rows.append(
                    (
                        int(doc_id),
                        int(meta["media_type"]),
                        int(meta["body_len"]),
                        width,
                        height,
                        mean_byte,
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
        T.StructField("frame_crc", T.LongType()),
    ]
)


AUDIO_WIN = 32  # samples per analysis window for the fake-PCM energy path

ENERGY_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("win_idx", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("energy", T.LongType()),
    ]
)


def audio_window_energy(mm_df: DataFrame, win: int = AUDIO_WIN) -> DataFrame:
    """Windowed audio energy over the payload, vectorized with numpy.

    Stand-in for a real PCM decode (decode_image_real documents the stub
    contract): the body bytes are treated as unsigned 8-bit samples and
    reduced to per-window mean-square energy. The Spark-side shape is the
    real one — Arrow-batched mapInPandas, one output row per (doc, window),
    partition-local with no shuffle — so swapping in torchaudio/pyav only
    replaces the inner numpy line.
    """
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: list[tuple[int, int, int, int]] = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                body = np.frombuffer(bytes(payload), dtype=np.uint8)[HEADER_LEN:]
                n = len(body)
                if n == 0:
                    continue
                sq = body.astype(np.int64) ** 2
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

    Stand-in for video frame extraction; emits one row per sampled frame
    with a checksum so correctness is byte-exact without shipping frames.
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
                        (int(doc_id), i, len(chunk), zlib.crc32(chunk))
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in FRAME_SCHEMA.fields]
            )

    return mm_df.mapInPandas(batches, schema=FRAME_SCHEMA)
