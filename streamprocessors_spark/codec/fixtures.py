"""Deterministic synthetic TS fixture generator.

The reference builds its test inputs with its own encoders
(mpeg2ts/utests/utests_prog_proc.cpp:116-173); we do the same: a
multi-program transport stream with PAT + one PMT per program + DVB SDT +
ES payload packets with proper CC sequencing and periodic PCR. Fully
deterministic (no RNG) so golden outputs are stable.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from streamprocessors_spark.codec import psi
from streamprocessors_spark.codec.ts import encode_ts_packet


@dataclass
class ProgramSpec:
    program_number: int
    pmt_pid: int
    pcr_pid: int
    streams: list[tuple[int, int]]  # (stream_type, es_pid)
    service_name: str = ""
    provider: str = "spark"
    service_type: int = 1  # digital TV


@dataclass
class MuxSpec:
    programs: list[ProgramSpec] = field(default_factory=list)
    ts_id: int = 1
    psi_interval: int = 50  # packets between PSI refreshes
    es_payload_packets: int = 200  # per ES pid


def default_mux() -> MuxSpec:
    """Two-program stream: prog 1 (video+audio), prog 2 (video+subtitles)."""
    return MuxSpec(
        programs=[
            ProgramSpec(
                program_number=1,
                pmt_pid=0x0100,
                pcr_pid=0x0101,
                streams=[(0x1B, 0x0101), (0x0F, 0x0102)],
                service_name="Channel One",
            ),
            ProgramSpec(
                program_number=2,
                pmt_pid=0x0200,
                pcr_pid=0x0201,
                streams=[(0x02, 0x0201), (0x06, 0x0202)],
                service_name="Channel Two",
            ),
        ]
    )


def build_ts(spec: MuxSpec | None = None) -> bytes:
    """Serialize the mux: round-robin ES packets with PSI every
    ``psi_interval`` packets, CC counters per PID, PCR on each pcr_pid
    every 10th of its packets."""
    spec = spec or default_mux()
    cc: dict[int, int] = {}

    def next_cc(pid: int) -> int:
        cur = cc.get(pid, -1)
        cc[pid] = (cur + 1) & 0xF
        return cc[pid]

    pat = psi.encode_pat(
        [(p.program_number, p.pmt_pid) for p in spec.programs], ts_id=spec.ts_id
    )
    pmts = {
        p.pmt_pid: psi.encode_pmt(p.program_number, p.pcr_pid, p.streams)
        for p in spec.programs
    }
    sdt = psi.encode_sdt(
        [
            (p.program_number, p.service_type, p.provider, p.service_name)
            for p in spec.programs
        ],
        ts_id=spec.ts_id,
    )

    def emit_section(sec: bytes, pid: int) -> list[bytes]:
        burst = psi.sectionize(sec, pid, start_cc=next_cc(pid))
        for _ in burst[1:]:  # sectionize advanced cc internally; mirror it
            next_cc(pid)
        return burst

    def psi_burst() -> list[bytes]:
        pkts: list[bytes] = []
        pkts += emit_section(pat, psi.PSI_PID_PAT)
        for pid, sec in pmts.items():
            pkts += emit_section(sec, pid)
        pkts += emit_section(sdt, psi.PSI_PID_SDT)
        return pkts

    es_pids = [es for p in spec.programs for _, es in p.streams]
    pcr_pids = {p.pcr_pid for p in spec.programs}

    out: list[bytes] = []
    out += psi_burst()
    for i in range(spec.es_payload_packets):
        for pid in es_pids:
            payload = bytes([i & 0xFF, pid >> 8, pid & 0xFF]) * 20
            pcr = None
            if pid in pcr_pids and i % 10 == 0:
                # 27 MHz ticks; ~40 ms cadence between bursts
                pcr = 27_000_000 // 25 * i
            out.append(
                encode_ts_packet(
                    pid,
                    payload=payload,
                    cc=next_cc(pid),
                    pusi=1 if i == 0 else 0,
                    pcr=pcr,
                    random_access=1 if i == 0 else 0,
                )
            )
        if (i + 1) % spec.psi_interval == 0:
            out += psi_burst()
    return b"".join(out)
