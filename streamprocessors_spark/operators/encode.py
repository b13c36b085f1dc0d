"""Distributed TS encode: fixture tables -> TS byte-stream DataFrames.

The reference generates its own test inputs with its encoders
(utests_prog_proc.cpp:116-173); these operators do the same, distributed:
each input row becomes an independent mini transport stream (one row ->
one binary buffer), so encoding parallelizes with the table and the
decode pipeline gets exercised over thousands of streams — the multi-
stream shape the daemon's 64-instance cap points at (stream_procs.c:53).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import BinaryType, StringType, StructField, StructType

STREAM_SCHEMA = StructType(
    [
        StructField("stream_id", StringType()),
        StructField("value", BinaryType()),
    ]
)


def document_section_streams(documents: DataFrame, max_chars: int = 250) -> DataFrame:
    """One PSI-style private section per document, packetized.

    table_id 0x40 (private), table_id_ext = doc_id % 65536, version =
    doc_id % 32, payload = UTF-8 of the first ``max_chars`` characters.
    PID = 32 + doc_id % 256. Each document is its own stream, so section
    reassembly fans out across (stream_id, pid) keys."""
    from streamprocessors_spark.codec.psi import encode_section, sectionize

    # A single small parquet file arrives as ONE input split; the encode
    # fan-out is CPU-bound Python, so spread it across the cluster first
    # (at 100 TB the many-file input parallelizes naturally and the
    # round-robin repartition is a cheap rebalance).
    src = documents.select("doc_id", "text").repartition(
        documents.sparkSession.sparkContext.defaultParallelism
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                payload = (text or "")[:max_chars].encode("utf-8")
                sec = encode_section(
                    table_id=0x40,
                    table_id_ext=int(doc_id) % 65536,
                    version=int(doc_id) % 32,
                    section_number=0,
                    last_section_number=0,
                    payload=payload,
                )
                pid = 32 + int(doc_id) % 256
                pkts = sectionize(sec, pid=pid, start_cc=0)
                rows.append((str(int(doc_id)), b"".join(pkts)))
            yield pd.DataFrame(rows, columns=["stream_id", "value"])

    return src.mapInPandas(gen, schema=STREAM_SCHEMA)


def nation_program_streams(nation: DataFrame) -> DataFrame:
    """One single-program transport stream per nation row.

    program_number = n_nationkey + 1 (0 is the network PID, skipped by
    the programs-summary join, mpeg2_sp.c:1165-1166); PMT PID =
    0x100 + key*16; PCR PID = PMT+1; two ES streams (H.264 + AAC);
    service_name = n_name. The full PSI chain (PAT -> PMT -> SDT) is
    emitted so the decode side exercises R1-R7 + J4/J7/J8 end-to-end."""
    from streamprocessors_spark.codec.fixtures import MuxSpec, ProgramSpec, build_ts

    src = nation.select("n_nationkey", "n_name").repartition(
        nation.sparkSession.sparkContext.defaultParallelism
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for key, name in zip(pdf["n_nationkey"], pdf["n_name"]):
                key = int(key)
                pmt_pid = 0x100 + key * 16
                spec = MuxSpec(
                    programs=[
                        ProgramSpec(
                            program_number=key + 1,
                            pmt_pid=pmt_pid,
                            pcr_pid=pmt_pid + 1,
                            streams=[(0x1B, pmt_pid + 1), (0x0F, pmt_pid + 2)],
                            service_name=str(name),
                        )
                    ],
                    psi_interval=50,
                    es_payload_packets=20,
                )
                rows.append((f"nation-{key}", build_ts(spec)))
            yield pd.DataFrame(rows, columns=["stream_id", "value"])

    return src.mapInPandas(gen, schema=STREAM_SCHEMA)
