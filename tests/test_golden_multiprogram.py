"""Golden end-to-end: one multi-program capture through the full pipeline.

The reference's e2e test replays a real multi-program capture
(san_diego_200kbps.ts) and eyeballs the REST state; this is the same shape
with a synthetic 16-program mux — a SINGLE transport stream whose PAT
lists every program and whose PSI tables interleave with ES packets — plus
a PAT version update to pin R7 (latest-version register) on a genuinely
multi-table stream.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

N_PROGRAMS = 16


@pytest.fixture(scope="module")
def capture(spark):
    from streamprocessors_spark.codec.fixtures import MuxSpec, ProgramSpec, build_ts
    from streamprocessors_spark.operators.demux import reassemble_sections
    from streamprocessors_spark.sources import packets_from_binary_column

    spec = MuxSpec(
        programs=[
            ProgramSpec(
                program_number=k,
                pmt_pid=0x100 + k * 16,
                pcr_pid=0x101 + k * 16,
                streams=[(0x1B, 0x101 + k * 16), (0x0F, 0x102 + k * 16)],
                service_name=f"CHAN-{k:02d}",
            )
            for k in range(1, N_PROGRAMS + 1)
        ],
        psi_interval=40,
        es_payload_packets=25,
    )
    buf = build_ts(spec)
    raw = spark.createDataFrame([("cap", buf)], "stream_id STRING, value BINARY")
    pkts = packets_from_binary_column(raw)
    return pkts, reassemble_sections(pkts)


def test_multiprogram_summary(spark, capture):
    from streamprocessors_spark.operators.demux import (
        pat_programs,
        pmt_streams,
        programs_summary,
        sdt_services,
    )

    _, sections = capture
    rows = programs_summary(
        pat_programs(sections), pmt_streams(sections), sdt_services(sections)
    ).collect()
    assert len(rows) == N_PROGRAMS
    by_pn = {r.program_number: r for r in rows}
    for k in range(1, N_PROGRAMS + 1):
        r = by_pn[k]
        assert r.service_name == f"CHAN-{k:02d}"
        assert r.n_streams == 2
        assert r.reference_pid == 0x100 + k * 16
        assert r.pcr_pid == 0x101 + k * 16


def test_multiprogram_pid_census(spark, capture):
    pkts, _ = capture
    pids = {r.pid for r in pkts.select("pid").distinct().collect()}
    assert 0x0 in pids and 0x11 in pids
    for k in range(1, N_PROGRAMS + 1):
        assert 0x100 + k * 16 in pids  # PMT
        assert 0x101 + k * 16 in pids  # ES/PCR


def test_pat_version_update_r7(spark):
    """Two PAT versions in one stream: the current-table register keeps
    only v1 (the program added in v1 visible, v0's view superseded)."""
    from streamprocessors_spark.codec.psi import encode_pat, sectionize
    from streamprocessors_spark.operators.demux import (
        latest_sections,
        pat_programs,
        reassemble_sections,
    )
    from streamprocessors_spark.sources import packets_from_binary_column

    v0 = encode_pat([(1, 0x100)], version=0)
    v1 = encode_pat([(1, 0x100), (2, 0x110)], version=1)
    buf = b"".join(sectionize(v0, pid=0, start_cc=0)) + b"".join(
        sectionize(v1, pid=0, start_cc=8)
    )
    raw = spark.createDataFrame([("s", buf)], "stream_id STRING, value BINARY")
    sections = reassemble_sections(packets_from_binary_column(raw))
    assert sections.count() == 2  # both versions decoded
    latest = latest_sections(sections).collect()
    assert len(latest) == 1 and latest[0].version == 1  # register swapped
    progs = pat_programs(sections).orderBy("program_number").collect()
    assert [(p.program_number, p.reference_pid) for p in progs] == [
        (1, 0x100),
        (2, 0x110),
    ]
    assert all(p.pat_version == 1 for p in progs)
