"""Variable-layout PES / DVB-subtitling patch path (Python twin of
``codec/pes.py``).

The JVM expressions in ``codec/pes.py`` handle the fixed 30-byte shape this
engine generates (one page composition segment, one region entry, no header
stuffing) with static-offset splicing — the whole-stage-codegen fast path.
Real off-air subtitle streams vary: PES_header_data_length includes
stuffing bytes, a display set carries several subtitling segments, and a
page composition segment lists any number of regions (EN 300 743 §7.2.2).

This module is the general path for those streams: a full variable-layout
parser + patcher applying the *same* dvb_subt settings arithmetic
(es_proc.js:87-93, dvb_subt.js:667-767) — PTS restamp per ISO 13818-1
§2.4.3.7, page_time_out clamp, per-region position offsets — to every page
composition segment and every region entry, wherever they sit. All patched
fields are fixed-width, so the re-encode splices bytes in place and every
length field (PES_packet_length, segment_length) is preserved by
construction.

Spark integration is ``dvb_subt_patch_batches`` (mapInPandas, Arrow
batches, partition-local, zero shuffle); the pandas path and the JVM
expression path are pinned byte-identical on the common shape by
``tests/test_pes_codec.py``.
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass, field

from streamprocessors_spark.codec.pes import (
    PTS_MOD,
    DvbSubtSettings,
    pts_decode_py,
    pts_encode_py,
)

# EN 300 743 §7.2 segment types
SEG_PAGE_COMPOSITION = 0x10
SEG_REGION_COMPOSITION = 0x11
SEG_CLUT = 0x12
SEG_OBJECT_DATA = 0x13
SEG_DISPLAY_DEFINITION = 0x14
SEG_END_OF_DISPLAY_SET = 0x80
END_MARKER = 0xFF  # end_of_PES_data_field_marker (EN 300 743 §7.1)


@dataclass
class SubtSegment:
    """One subtitling segment (sync 0x0F, type, page_id u16, length u16)."""

    seg_type: int
    page_id: int
    payload: bytes
    offset: int = 0  # absolute offset of the 0x0F sync byte in the PES


@dataclass
class ParsedPes:
    stream_id: int
    pes_packet_length: int
    header_data_length: int
    pts: int | None
    pts_offset: int | None  # absolute offset of the 5-byte PTS field
    data_offset: int  # first byte after the PES header
    data_identifier: int | None
    segments: list[SubtSegment] = field(default_factory=list)


def parse_pes_py(b: bytes) -> ParsedPes:
    """Parse a PES packet with a variable-length header and, for DVB
    subtitle data (data_identifier 0x20), the full subtitling-segment list
    (ISO 13818-1 §2.4.3.6-7 + EN 300 743 §7.1-7.2)."""
    if len(b) < 9 or b[0:3] != b"\x00\x00\x01":
        raise ValueError("not a PES packet (missing start code)")
    stream_id = b[3]
    pes_packet_length = (b[4] << 8) | b[5]
    flags2 = b[7]
    header_data_length = b[8]
    pts_dts_flags = (flags2 >> 6) & 0x3
    pts = None
    pts_offset = None
    if pts_dts_flags in (0x2, 0x3):
        pts_offset = 9
        pts = pts_decode_py(b, pts_offset)
    data_offset = 9 + header_data_length
    # The packet ends at 6 + pes_packet_length when the length field is
    # set (0 = unbounded, video only): a buffer carrying trailing bytes —
    # e.g. two concatenated PES packets from an off-air ES dump — must
    # not have its tail parsed (or patched) as if it belonged to this
    # packet's subtitling segments.
    end = min(len(b), 6 + pes_packet_length) if pes_packet_length else len(b)
    if data_offset > end:
        raise ValueError(
            f"PES header ({data_offset}B) overruns packet end ({end}B)"
        )
    data_identifier = None
    segments: list[SubtSegment] = []
    if data_offset + 2 <= end and b[data_offset] == 0x20:
        data_identifier = b[data_offset]
        i = data_offset + 2  # skip subtitle_stream_id
        while i < end and b[i] == 0x0F:
            if i + 6 > end:
                raise ValueError(f"truncated segment header at {i}")
            seg_type = b[i + 1]
            page_id = (b[i + 2] << 8) | b[i + 3]
            seg_len = (b[i + 4] << 8) | b[i + 5]
            if i + 6 + seg_len > end:
                raise ValueError(f"truncated segment payload at {i}")
            segments.append(
                SubtSegment(seg_type, page_id, bytes(b[i + 6 : i + 6 + seg_len]), i)
            )
            i += 6 + seg_len
    return ParsedPes(
        stream_id,
        pes_packet_length,
        header_data_length,
        pts,
        pts_offset,
        data_offset,
        data_identifier,
        segments,
    )


def parse_page_composition(payload: bytes) -> tuple[int, int, list[tuple[int, int, int]]]:
    """Page composition payload -> (page_time_out, version_state_byte,
    [(region_id, hpos, vpos), ...]) (EN 300 743 §7.2.2: 2 fixed bytes then
    6-byte region entries)."""
    if len(payload) < 2 or (len(payload) - 2) % 6:
        raise ValueError("malformed page composition segment")
    regions = []
    for i in range(2, len(payload), 6):
        regions.append(
            (
                payload[i],
                (payload[i + 2] << 8) | payload[i + 3],
                (payload[i + 4] << 8) | payload[i + 5],
            )
        )
    return payload[0], payload[1], regions


def _clamp(v: int, lo: int, hi: int) -> int:
    return min(max(v, lo), hi)


def dvb_subt_patch_py(
    b: bytes, s: DvbSubtSettings, pcr_90k: int | None = None
) -> tuple[bytes, dict]:
    """Variable-layout twin of ``codec.pes.dvb_subt_patch_expr``: identical
    settings arithmetic, applied to every page composition segment and
    every region entry. Returns (patched_bytes, meta) where meta carries
    pts_in/pts_out and the first page segment's timeout/first region's
    position (the expr's reporting surface)."""
    p = parse_pes_py(b)
    out = bytearray(b)
    pts_in = p.pts
    pts_out = pts_in
    if pts_in is not None:
        if s.restamping:
            pts_out = (pts_in + int(s.time_shift_offset_msec) * 90) % PTS_MOD
        if pcr_90k is not None and s.ts_pcr_guard_msec is not None:
            guard = int(s.ts_pcr_guard_msec) * 90
            dist = (pts_out - pcr_90k) % PTS_MOD
            if dist < guard:
                pts_out = (pcr_90k + guard) % PTS_MOD
        out[p.pts_offset : p.pts_offset + 5] = pts_encode_py(pts_out)
    timeout_out = hpos_out = vpos_out = None
    for seg in p.segments:
        if seg.seg_type != SEG_PAGE_COMPOSITION:
            continue
        timeout, _ver_state, regions = parse_page_composition(seg.payload)
        t = _clamp(
            timeout + s.duration_offset_seg,
            s.duration_min_seg,
            min(s.duration_max_seg, 255),
        )
        body = seg.offset + 6
        # & 0xFF matches the JVM twin's _enc_u8 masking: pathological
        # settings (duration_min_seg > 255, large negative offsets) must
        # wrap identically on both paths, not raise here only.
        out[body] = t & 0xFF
        for i, (_rid, h, v) in enumerate(regions):
            h2 = _clamp(h + s.hpos_offset_pels, 0, 719)
            v2 = _clamp(v + s.vpos_offset_pels, 0, 575)
            off = body + 2 + 6 * i
            out[off + 2 : off + 4] = h2.to_bytes(2, "big")
            out[off + 4 : off + 6] = v2.to_bytes(2, "big")
            if hpos_out is None:
                hpos_out, vpos_out = h2, v2
        if timeout_out is None:
            timeout_out = t
    return bytes(out), {
        "pts_in": pts_in,
        "pts_out": pts_out,
        "timeout_out": timeout_out,
        "hpos_out": hpos_out,
        "vpos_out": vpos_out,
    }


PATCH_RESULT_SCHEMA = (
    "out_payload binary, pts_in bigint, pts_out bigint, "
    "timeout_out int, hpos_out int, vpos_out int"
)


def dvb_subt_patch_batches(s: DvbSubtSettings, payload_col: str = "payload"):
    """mapInPandas body for the variable-layout path: Arrow-batched,
    partition-local, no shuffle. Usage:

        df.mapInPandas(dvb_subt_patch_batches(settings),
                       schema=PATCH_RESULT_SCHEMA)

    Scale: pure per-row transform — runs where the rows already are; the
    only Python cost is the byte walk, amortized over Arrow batches.
    """
    import pandas as pd

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = [dvb_subt_patch_py(bytes(x), s) for x in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "out_payload": [r[0] for r in rows],
                    "pts_in": [r[1]["pts_in"] for r in rows],
                    "pts_out": [r[1]["pts_out"] for r in rows],
                    "timeout_out": [r[1]["timeout_out"] for r in rows],
                    "hpos_out": [r[1]["hpos_out"] for r in rows],
                    "vpos_out": [r[1]["vpos_out"] for r in rows],
                }
            )

    return fn


def build_pes_py(
    pts: int | None,
    segments: list[tuple[int, int, bytes]],
    stuffing: int = 0,
    end_marker: bool = True,
) -> bytes:
    """Build a variable-layout DVB-subtitle PES packet: optional header
    stuffing bytes (0xFF, counted in PES_header_data_length per ISO 13818-1
    §2.4.3.6) and any number of (seg_type, page_id, payload) subtitling
    segments. Test-fixture generator for the general path."""
    data = bytearray(b"\x20\x00")
    for seg_type, page_id, payload in segments:
        data += bytes([0x0F, seg_type])
        data += page_id.to_bytes(2, "big")
        data += len(payload).to_bytes(2, "big")
        data += payload
    if end_marker:
        data.append(END_MARKER)
    header = bytearray()
    if pts is not None:
        header += pts_encode_py(pts)
    header += b"\xff" * stuffing
    flags2 = 0x80 if pts is not None else 0x00
    body = bytes([0x84, flags2, len(header)]) + bytes(header) + bytes(data)
    return b"\x00\x00\x01\xbd" + len(body).to_bytes(2, "big") + body


def page_composition_payload(
    timeout: int, regions: list[tuple[int, int, int]], ver_state: int = 0x04
) -> bytes:
    """Page composition payload from (region_id, hpos, vpos) entries."""
    out = bytearray([timeout & 0xFF, ver_state])
    for rid, h, v in regions:
        out += bytes([rid & 0xFF, 0xFF])
        out += h.to_bytes(2, "big")
        out += v.to_bytes(2, "big")
    return bytes(out)
