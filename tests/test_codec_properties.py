"""Property-based codec tests (hypothesis): encode->decode identity over
randomized inputs — the reference's own test pattern (build fixtures with
the encoders, utests_prog_proc.cpp:116-173) generalized from hand-picked
cases to the full input space. Pure Python, no Spark session."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from streamprocessors_spark.codec.psi import (
    MAX_SECTION_PRIVATE,
    SectionReassembler,
    encode_section,
    parse_section,
    sectionize,
)
from streamprocessors_spark.codec.ts import (
    encode_ts_packet,
    parse_ts_packet,
    pcr_delta,
)

PCR_MOD = 8_589_934_592 * 300


@settings(max_examples=200, deadline=None)
@given(
    pid=st.integers(0, 0x1FFE),
    cc=st.integers(0, 15),
    pusi=st.integers(0, 1),
    payload=st.binary(min_size=0, max_size=184),
    pcr=st.one_of(st.none(), st.integers(0, PCR_MOD - 1)),
    discontinuity=st.integers(0, 1),
)
def test_packet_roundtrip_property(pid, cc, pusi, payload, pcr, discontinuity):
    if pcr is not None or discontinuity:
        # AF consumes >= 8 / 2 bytes, shrinking the max payload
        max_payload = 184 - (8 if pcr is not None else 2)
        payload = payload[:max_payload]
    pkt = encode_ts_packet(
        pid=pid, payload=payload, cc=cc, pusi=pusi, pcr=pcr,
        discontinuity=discontinuity,
    )
    assert len(pkt) == 188
    h = parse_ts_packet(pkt)
    assert h["pid"] == pid and h["cc"] == cc and h["pusi"] == pusi
    af = h["af"] or {}
    assert af.get("discontinuity", 0) == discontinuity
    if pcr is not None:
        assert af["pcr"] == pcr
    if payload:
        assert h["payload"][: len(payload)] == payload


@settings(max_examples=100, deadline=None)
@given(
    table_id=st.integers(0x40, 0xFE),  # private range; 0xFF is stuffing
    table_id_ext=st.integers(0, 0xFFFF),
    version=st.integers(0, 31),
    payload=st.binary(min_size=0, max_size=MAX_SECTION_PRIVATE - 12),
    pid=st.integers(16, 0x1FFE),
    start_cc=st.integers(0, 15),
)
def test_section_packetize_reassemble_property(
    table_id, table_id_ext, version, payload, pid, start_cc
):
    """section -> packets -> reassembler yields the identical section,
    for arbitrary payloads spanning any number of packets."""
    sec = encode_section(table_id, table_id_ext, version, 0, 0, payload)
    h = parse_section(sec)
    assert h["crc_ok"] and h["table_id"] == table_id
    assert h["table_id_ext"] == table_id_ext and h["version"] == version

    pkts = sectionize(sec, pid=pid, start_cc=start_cc)
    r = SectionReassembler()
    out = [s for p in pkts for s in r.push(bytes(p))]
    assert out == [sec]


@settings(max_examples=200, deadline=None)
@given(a=st.integers(0, PCR_MOD - 1), d=st.integers(-(10**12), 10**12))
def test_pcr_delta_wraparound_property(a, d):
    """delta(a, a+d mod M) == d for any |d| < M/2 — the 33-bit(+300)
    wraparound arithmetic (ts.h:123-134), SURVEY hard part (c)."""
    b = (a + d) % PCR_MOD
    assert pcr_delta(a, b) == d


@settings(max_examples=100, deadline=None)
@given(
    payload_sizes=st.lists(st.integers(0, 700), min_size=1, max_size=6),
    pid=st.integers(16, 0x1FFE),
    start_cc=st.integers(0, 15),
    data=st.data(),
)
def test_continuous_packing_reassembly_property(payload_sizes, pid, start_cc, data):
    """Sections packed back-to-back (starts at ARBITRARY mid-packet
    alignments, shared packets, no inter-section stuffing) reassemble to
    the identical section list — the pointer_field/lookahead path
    (psi_dec.c:344-404) over the full alignment space."""
    from streamprocessors_spark.codec.psi import pack_sections_continuous

    sections = [
        encode_section(
            0x40 + i % 8,
            data.draw(st.integers(0, 0xFFFF)),
            i % 32,
            0,
            0,
            data.draw(st.binary(min_size=n, max_size=n)),
        )
        for i, n in enumerate(payload_sizes)
    ]
    pkts = pack_sections_continuous(sections, pid=pid, start_cc=start_cc)
    r = SectionReassembler()
    out = [s for p in pkts for s in r.push(bytes(p))]
    assert out == sections


# ---------------------------------------------------------------------------
# PES PTS marker-bit encoding (codec/pes.py)
# ---------------------------------------------------------------------------

from streamprocessors_spark.codec.pes import (  # noqa: E402
    PTS_MOD,
    pts_decode_py,
    pts_encode_py,
)


@settings(max_examples=500, deadline=None)
@given(pts=st.integers(0, PTS_MOD - 1))
def test_pts_marker_encoding_roundtrip_property(pts):
    b = pts_encode_py(pts)
    assert len(b) == 5
    assert b[0] >> 4 == 0x2  # '0010' prefix
    assert b[0] & 1 and b[2] & 1 and b[4] & 1  # marker bits
    assert pts_decode_py(b, 0) == pts


@settings(max_examples=200, deadline=None)
@given(pts=st.integers())
def test_pts_encode_wraps_mod_2_33(pts):
    assert pts_decode_py(pts_encode_py(pts), 0) == pts % PTS_MOD
