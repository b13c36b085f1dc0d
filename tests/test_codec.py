"""Pure-codec tests: CRC, packet roundtrip, PSI section roundtrip,
reassembly semantics (pointer_field, back-to-back, stuffing, corruption).
Mirrors the reference's encode->decode-through-the-pipeline test pattern
(utests_prog_proc.cpp:116-230)."""

from __future__ import annotations

import numpy as np
import pytest

from streamprocessors_spark.codec import crc, psi, ts
from streamprocessors_spark.codec.fixtures import build_ts, default_mux


# --- CRC-32/MPEG-2 ---------------------------------------------------------


def test_crc_known_vectors():
    # Public check value: CRC-32/MPEG-2("123456789") == 0x0376E6E7
    assert crc.crc32_mpeg2(b"123456789") == 0x0376E6E7
    assert crc.crc32_mpeg2(b"") == 0xFFFFFFFF


def test_crc_self_verifying():
    body = b"\x00\xb0\x0d payload"
    sec = crc.append_crc(body)
    assert crc.crc32_mpeg2_ok(sec)
    corrupted = sec[:-1] + bytes([sec[-1] ^ 1])
    assert not crc.crc32_mpeg2_ok(corrupted)


# --- TS packet layer -------------------------------------------------------


def test_packet_roundtrip_plain():
    payload = bytes(range(100))
    pkt = ts.encode_ts_packet(pid=0x123, payload=payload, cc=7, pusi=1)
    assert len(pkt) == ts.TS_PKT_SIZE
    p = ts.parse_ts_packet(pkt)
    assert p["errors"] == []
    assert p["pid"] == 0x123
    assert p["cc"] == 7
    assert p["pusi"] == 1
    assert p["payload"] == payload


def test_packet_roundtrip_pcr():
    pcr = 12345678 * 300 + 123
    pkt = ts.encode_ts_packet(pid=0x101, payload=b"x" * 50, cc=3, pcr=pcr)
    p = ts.parse_ts_packet(pkt)
    assert p["af"]["pcr_flag"] == 1
    assert p["af"]["pcr"] == pcr


def test_packet_full_payload_and_overflow():
    pkt = ts.encode_ts_packet(pid=5 + 0x20, payload=b"z" * 184, cc=0)
    p = ts.parse_ts_packet(pkt)
    assert p["payload"] == b"z" * 184
    with pytest.raises(ValueError):
        ts.encode_ts_packet(pid=0x20, payload=b"z" * 185)


def test_packet_empty_payload_is_af_only():
    pkt = ts.encode_ts_packet(pid=0x20, payload=b"")
    p = ts.parse_ts_packet(pkt)
    assert p["afc"] == 2
    assert p["payload"] == b""


def test_vectorized_parse_matches_scalar():
    pkts = [
        ts.encode_ts_packet(pid=0x100 + i, payload=bytes([i]) * (10 + i), cc=i & 0xF,
                            pusi=i % 2, pcr=(i * 300 if i % 3 == 0 else None))
        for i in range(50)
    ]
    buf = b"".join(pkts)
    cols = ts.parse_ts_buffer_np(buf)
    for i, pkt in enumerate(pkts):
        s = ts.parse_ts_packet(pkt)
        assert cols["pid"][i] == s["pid"]
        assert cols["cc"][i] == s["cc"]
        assert cols["pusi"][i] == s["pusi"]
        assert bool(cols["sync_ok"][i])
        exp_pcr = s["af"]["pcr"] if s["af"] and s["af"].get("pcr") is not None else -1
        assert cols["pcr"][i] == exp_pcr
        assert cols["payload_len"][i] == len(s["payload"])


def test_pcr_wraparound_delta():
    mod = ts.PCR_MAX_BASE * 300
    near_end = mod - 300
    assert ts.pcr_delta(near_end, 600) == 900
    assert ts.pcr_delta(600, near_end) == -900


def test_cc_rules():
    # ts_dec.c:98-172 semantics
    assert ts.check_cc(None, 5, True, False)
    assert ts.check_cc(5, 6, True, False)
    assert not ts.check_cc(5, 7, True, False)
    assert ts.check_cc(15, 0, True, False)  # wrap
    assert ts.check_cc(5, 7, True, True)  # discontinuity excuses
    assert ts.check_cc(5, 5, False, False)  # no payload: no increment
    assert not ts.check_cc(5, 6, False, False)


# --- PSI sections ----------------------------------------------------------


def test_pat_roundtrip():
    sec = psi.encode_pat([(1, 0x100), (2, 0x200)], ts_id=7, version=3)
    p = psi.parse_section(sec)
    assert p["table_id"] == psi.PSI_TABLE_ID_PAT
    assert p["table_id_ext"] == 7
    assert p["version"] == 3
    assert p["crc_ok"]
    assert p["pas"] == [
        {"program_number": 1, "reference_pid": 0x100},
        {"program_number": 2, "reference_pid": 0x200},
    ]


def test_pmt_roundtrip():
    sec = psi.encode_pmt(2, 0x201, [(0x1B, 0x201), (0x0F, 0x202)], version=1)
    p = psi.parse_section(sec)
    assert p["table_id"] == psi.PSI_TABLE_ID_PMT
    assert p["table_id_ext"] == 2
    assert p["pms"]["pcr_pid"] == 0x201
    assert [(s["stream_type"], s["elementary_pid"]) for s in p["pms"]["streams"]] == [
        (0x1B, 0x201),
        (0x0F, 0x202),
    ]


def test_sdt_roundtrip():
    sec = psi.encode_sdt([(1, 1, "prov", "Channel One")])
    p = psi.parse_section(sec)
    assert p["table_id"] == psi.PSI_TABLE_ID_SDT
    svc = p["sds"]["services"][0]
    assert svc["service_id"] == 1
    d = [d for d in svc["descriptors"] if d["tag"] == psi.DESC_TAG_SERVICE][0]
    assert d["service_name"] == "Channel One"
    assert d["provider_name"] == "prov"


def test_section_crc_detects_corruption():
    sec = bytearray(psi.encode_pat([(1, 0x100)]))
    sec[10] ^= 0xFF
    p = psi.parse_section(bytes(sec))
    assert not p["crc_ok"]


# --- Reassembly (R1) -------------------------------------------------------


def _reassemble(packets: list[bytes]) -> list[bytes]:
    r = psi.SectionReassembler()
    out = []
    for pkt in packets:
        out.extend(r.push(pkt))
    return out


def test_reassembly_single_packet_section():
    sec = psi.encode_pat([(1, 0x100)])
    pkts = psi.sectionize(sec, pid=0)
    assert len(pkts) == 1
    got = _reassemble(pkts)
    assert got == [sec]


def test_reassembly_multi_packet_section():
    # SDT with long names spans >1 packet
    services = [(i, 1, "provider-" + "x" * 40, f"Channel {i:03d} " + "y" * 40) for i in range(8)]
    sec = psi.encode_sdt(services)
    assert len(sec) > 184
    pkts = psi.sectionize(sec, pid=0x11)
    assert len(pkts) >= 2
    got = _reassemble(pkts)
    assert got == [sec]
    assert psi.parse_section(got[0])["crc_ok"]


def test_reassembly_ignores_prefix_until_pusi():
    sec = psi.encode_pat([(1, 0x100)])
    pkts = psi.sectionize(sec, pid=0)
    # a stray continuation packet before sync must be skipped
    stray = psi._raw_packet(0, b"\xaa" * 184, cc=9, pusi=0)
    got = _reassemble([stray] + pkts)
    assert got == [sec]


def test_reassembly_pointer_field_completes_previous():
    """A PUSI packet whose pointer_field > 0 carries the tail of the
    previous section before the new one starts (psi_dec.c:300-319)."""
    sec_a = psi.encode_sdt([(1, 1, "p" * 120, "n" * 120)])  # > 184 bytes
    assert 184 < len(sec_a) < 367
    sec_b = psi.encode_pat([(9, 0x900)])
    pid = 0x11
    first = psi._raw_packet(pid, b"\x00" + sec_a[:183], cc=0, pusi=1)
    tail = sec_a[183:]
    body = bytes([len(tail)]) + tail + sec_b
    assert len(body) <= 184
    body = body + b"\xff" * (184 - len(body))
    second = psi._raw_packet(pid, body, cc=1, pusi=1)
    got = _reassemble([first, second])
    assert got == [sec_a, sec_b]


def test_reassembly_back_to_back_sections_one_packet():
    sec_a = psi.encode_pat([(1, 0x100)])
    sec_b = psi.encode_pat([(2, 0x200)], version=1)
    body = b"\x00" + sec_a + sec_b
    assert len(body) <= 184
    body = body + b"\xff" * (184 - len(body))
    pkt = psi._raw_packet(0, body, cc=0, pusi=1)
    got = _reassemble([pkt])
    assert got == [sec_a, sec_b]


def test_reassembly_stuffing_stops_parse():
    sec = psi.encode_pat([(1, 0x100)])
    pkts = psi.sectionize(sec, pid=0)
    got = _reassemble(pkts)
    assert got == [sec]  # trailing 0xFF stuffing not parsed as a section


# --- Fixture generator -----------------------------------------------------


def test_fixture_stream_structure():
    blob = build_ts()
    assert len(blob) % ts.TS_PKT_SIZE == 0
    cols = ts.parse_ts_buffer_np(blob)
    assert bool(np.all(cols["sync_ok"]))
    pids = set(int(x) for x in np.unique(cols["pid"]))
    spec = default_mux()
    assert psi.PSI_PID_PAT in pids and psi.PSI_PID_SDT in pids
    for p in spec.programs:
        assert p.pmt_pid in pids
        for _, es in p.streams:
            assert es in pids


def test_fixture_psi_decodes():
    blob = build_ts()
    cols = ts.parse_ts_buffer_np(blob)
    n = len(cols["pid"])
    by_pid: dict[int, list[bytes]] = {}
    for i in range(n):
        pid = int(cols["pid"][i])
        if pid in (psi.PSI_PID_PAT, psi.PSI_PID_SDT, 0x100, 0x200):
            by_pid.setdefault(pid, []).append(
                blob[i * ts.TS_PKT_SIZE : (i + 1) * ts.TS_PKT_SIZE]
            )
    pat_secs = _reassemble(by_pid[psi.PSI_PID_PAT])
    assert pat_secs
    pat = psi.parse_section(pat_secs[0])
    assert pat["crc_ok"]
    assert [pr["program_number"] for pr in pat["pas"]] == [1, 2]
    sdt = psi.parse_section(_reassemble(by_pid[psi.PSI_PID_SDT])[0])
    names = [
        d["service_name"]
        for s in sdt["sds"]["services"]
        for d in s["descriptors"]
        if d["tag"] == psi.DESC_TAG_SERVICE
    ]
    assert names == ["Channel One", "Channel Two"]
    pmt1 = psi.parse_section(_reassemble(by_pid[0x100])[0])
    assert pmt1["pms"]["pcr_pid"] == 0x101


def test_fixture_cc_continuity():
    blob = build_ts()
    cols = ts.parse_ts_buffer_np(blob)
    last: dict[int, int] = {}
    for i in range(len(cols["pid"])):
        pid = int(cols["pid"][i])
        ccv = int(cols["cc"][i])
        has_payload = (int(cols["afc"][i]) & 1) == 1
        if pid in last:
            assert ts.check_cc(last[pid], ccv, has_payload, False), (
                f"cc break pid={pid} i={i} prev={last[pid]} cur={ccv}"
            )
        last[pid] = ccv
