"""Batch TS sources: files / binary columns -> packet DataFrame.

The reference ingests UDP datagrams of 7x188 B (mpeg2ts/src/ts.h:38,
mpeg2_sp.c:1340-1430). The batch-parity source is segment files (the
standard at-scale layout: many multi-MB .ts segments, one task per
segment, so a 100 TB capture parallelizes across the cluster by file);
``packets_from_binary_column`` covers the datagram shape (any DataFrame
with a binary column, 1 row = 1 datagram/segment).

Parsing is the vectorized numpy path (codec.ts.parse_ts_buffer_np) inside
``mapInPandas`` — Arrow-batched, no per-packet Python.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from streamprocessors_spark.codec.ts import TS_PKT_SIZE, parse_ts_buffer_np

PACKET_SCHEMA = StructType(
    [
        StructField("stream_id", StringType()),
        StructField("pkt_index", LongType()),  # position within stream (T1 order)
        StructField("sync_ok", BooleanType()),
        StructField("tei", IntegerType()),
        StructField("pusi", IntegerType()),
        StructField("pid", IntegerType()),
        StructField("scrambling", IntegerType()),
        StructField("afc", IntegerType()),
        StructField("cc", IntegerType()),
        StructField("af_len", IntegerType()),
        StructField("discontinuity", IntegerType()),
        StructField("random_access", IntegerType()),
        StructField("pcr", LongType()),  # 27 MHz ticks, -1 = absent
        StructField("payload_len", IntegerType()),
        StructField("raw", BinaryType()),  # full 188 B (reassembly input)
    ]
)


def _slice_batch(
    stream_ids: pd.Series,
    blobs: pd.Series,
    keep_raw: bool,
    base_indices: pd.Series | None = None,
) -> pd.DataFrame:
    frames = []
    bases = base_indices if base_indices is not None else [0] * len(blobs)

    # Fast path: every row is exactly one packet (the datagram/row shape).
    # One numpy parse over the fused batch instead of one call per row —
    # per-call numpy overhead dominates 188-byte buffers by ~100x.
    if len(blobs) > 1 and all(
        b is not None and len(b) == TS_PKT_SIZE for b in blobs
    ):
        import numpy as np

        cols = parse_ts_buffer_np(b"".join(bytes(b) for b in blobs))
        df = pd.DataFrame(
            {
                "stream_id": list(stream_ids),
                "pkt_index": np.asarray(list(bases), dtype="int64"),
                "sync_ok": cols["sync_ok"],
                "tei": cols["tei"].astype("int32"),
                "pusi": cols["pusi"].astype("int32"),
                "pid": cols["pid"].astype("int32"),
                "scrambling": cols["scrambling"].astype("int32"),
                "afc": cols["afc"].astype("int32"),
                "cc": cols["cc"].astype("int32"),
                "af_len": cols["af_len"].astype("int32"),
                "discontinuity": cols["discontinuity"].astype("int32"),
                "random_access": cols["random_access"].astype("int32"),
                "pcr": cols["pcr"],
                "payload_len": cols["payload_len"].astype("int32"),
            }
        )
        df["raw"] = [bytes(b) for b in blobs] if keep_raw else None
        return df

    for sid, blob, base in zip(stream_ids, blobs, bases):
        if blob is None or len(blob) < TS_PKT_SIZE:
            continue
        cols = parse_ts_buffer_np(bytes(blob))
        if base:
            cols["pkt_index"] = cols["pkt_index"] + int(base)
        n = len(cols["pid"])
        df = pd.DataFrame(
            {
                "stream_id": sid,
                "pkt_index": cols["pkt_index"],
                "sync_ok": cols["sync_ok"],
                "tei": cols["tei"].astype("int32"),
                "pusi": cols["pusi"].astype("int32"),
                "pid": cols["pid"].astype("int32"),
                "scrambling": cols["scrambling"].astype("int32"),
                "afc": cols["afc"].astype("int32"),
                "cc": cols["cc"].astype("int32"),
                "af_len": cols["af_len"].astype("int32"),
                "discontinuity": cols["discontinuity"].astype("int32"),
                "random_access": cols["random_access"].astype("int32"),
                "pcr": cols["pcr"],
                "payload_len": cols["payload_len"].astype("int32"),
            }
        )
        if keep_raw:
            b = bytes(blob)
            df["raw"] = [
                b[i * TS_PKT_SIZE : (i + 1) * TS_PKT_SIZE] for i in range(n)
            ]
        else:
            df["raw"] = None
        frames.append(df)
    if not frames:
        return pd.DataFrame({f.name: pd.Series(dtype="object") for f in PACKET_SCHEMA})
    return pd.concat(frames, ignore_index=True)


def packets_from_binary_column(
    df: DataFrame,
    id_col: str = "stream_id",
    bytes_col: str = "value",
    keep_raw: bool = True,
    index_col: str | None = None,
) -> DataFrame:
    """Slice+parse a binary column (P1+P2/P3): 1 row in -> N packet rows.

    ``pkt_index`` is the packet position within each input row's buffer —
    the monotonic per-stream order required for CC/reassembly (T1). When a
    stream arrives as many single-packet rows instead of one buffer, pass
    ``index_col`` (a per-row base offset, e.g. a sequence number): it is
    added to the in-buffer position, preserving T1 order without first
    concatenating the stream into one value (repeated binary concat is
    quadratic in stream length).
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _slice_batch(
                pdf[id_col],
                pdf[bytes_col],
                keep_raw,
                pdf[index_col] if index_col else None,
            )

    cols = [
        F.col(id_col).cast("string").alias(id_col),
        F.col(bytes_col).alias(bytes_col),
    ]
    if index_col:
        cols.append(F.col(index_col).cast("long").alias(index_col))
    return df.select(*cols).mapInPandas(gen, schema=PACKET_SCHEMA)


def read_ts_files(
    spark: SparkSession, path: str, keep_raw: bool = True
) -> DataFrame:
    """Read .ts segment file(s) -> packet DataFrame (one task per file)."""
    files = (
        spark.read.format("binaryFile").load(path).select(
            F.col("path").alias("stream_id"), F.col("content").alias("value")
        )
    )
    return packets_from_binary_column(files, keep_raw=keep_raw)
