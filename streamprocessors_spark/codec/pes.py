"""PES + DVB-subtitling segment codec as pure JVM column expressions.

The reference's two non-trivial ES processors are subtitle transforms
(``dvb_subt``, ``scte_subt2dvb`` — assets/html/js/es_proc.js:740-745) whose
settings surface is deterministic timestamp/position arithmetic:
``time_shift_offset_msec`` / ``restamping`` (es_proc.js:87-93),
``duration_min_seg`` / ``duration_max_seg`` / ``duration_offset_seg`` and
pixel offsets (dvb_subt.js:667-767), ``duration_offset_msec`` /
``vpos_offset_pels`` (scte_subt2dvb.js:371-374).

This module implements the byte-level surface those transforms operate on,
Spark-first (whole-stage-codegen expressions, no Python):

- PES packet header with the 33-bit 90 kHz PTS in its 5-byte marker-bit
  encoding (ISO/IEC 13818-1 §2.4.3.7: '0010' + PTS[32..30] + marker +
  PTS[29..15] + marker + PTS[14..0] + marker).
- DVB subtitling segments (ETSI EN 300 743 §7.2): sync 0x0F, segment_type,
  page_id, segment_length; page composition segment carries
  ``page_time_out`` (the on-screen duration the dvb_subt settings clamp),
  and its region list carries region_horizontal_address /
  region_vertical_address (the pixel positions the offsets patch).

The generated packets use one fixed shape (one page composition segment,
one region entry) so every field sits at a static offset and the
parse/patch/re-encode path stays in the JVM. Variable-layout streams would
route the same arithmetic through a pandas_udf; the settings semantics are
identical.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

PTS_MOD = 1 << 33  # 33-bit PTS wrap (ISO 13818-1 §2.4.3.7)

# Fixed layout offsets (1-based, substring convention) of the generated PES.
PES_HEADER_LEN = 14  # 6 start/len + 3 flags + 5 PTS
_PTS_OFF = 10  # first PTS byte
# PES data field: data_identifier 0x20, subtitle_stream_id 0x00 (EN 300 743
# §7.1), then one subtitling segment.
_SEG_OFF = PES_HEADER_LEN + 3  # sync byte 0x0F position
_PAGE_TIMEOUT_OFF = _SEG_OFF + 6  # after sync, type, page_id(2), len(2)
_REGION_HPOS_OFF = _PAGE_TIMEOUT_OFF + 4  # after timeout, ver/state, id, res
_REGION_VPOS_OFF = _REGION_HPOS_OFF + 2
PES_TOTAL_LEN = _REGION_VPOS_OFF + 1  # 30 bytes


def _byte(col: Column, pos: int) -> Column:
    """1-based single-byte read as bigint."""
    return F.conv(F.hex(F.substring(col, pos, 1)), 16, 10).cast("bigint")


def _u16(col: Column, pos: int) -> Column:
    return _byte(col, pos) * 256 + _byte(col, pos + 1)


def _enc_u8(v: Column) -> Column:
    # Mask first: lpad would TRUNCATE a >2-hex-digit string to its leftmost
    # chars, silently corrupting over-width values (e.g. a timeout pushed
    # past 255 by pathological settings) instead of wrapping.
    return F.unhex(F.lpad(F.hex(v.cast("bigint").bitwiseAND(F.lit(0xFF))), 2, "0"))


def _enc_u16(v: Column) -> Column:
    return F.unhex(F.lpad(F.hex(v.cast("bigint").bitwiseAND(F.lit(0xFFFF))), 4, "0"))


def pts_encode_expr(pts: Column) -> Column:
    """33-bit PTS -> 5-byte marker-bit encoding (ISO 13818-1 §2.4.3.7)."""
    p = F.pmod(pts.cast("bigint"), F.lit(PTS_MOD))
    b0 = F.lit(0x21) + F.shiftrightunsigned(p, 30).bitwiseAND(F.lit(0x7)) * 2
    b1 = F.shiftrightunsigned(p, 22).bitwiseAND(F.lit(0xFF))
    b2 = F.shiftrightunsigned(p, 15).bitwiseAND(F.lit(0x7F)) * 2 + 1
    b3 = F.shiftrightunsigned(p, 7).bitwiseAND(F.lit(0xFF))
    b4 = p.bitwiseAND(F.lit(0x7F)) * 2 + 1
    return F.concat(*[_enc_u8(b) for b in (b0, b1, b2, b3, b4)])


def pts_decode_expr(pes: Column, pos: int = _PTS_OFF) -> Column:
    """5-byte PTS field at ``pos`` -> 33-bit value."""
    b0, b1, b2, b3, b4 = (_byte(pes, pos + i) for i in range(5))
    return (
        F.shiftleft(F.shiftrightunsigned(b0, 1).bitwiseAND(F.lit(0x7)), 30)
        + F.shiftleft(b1, 22)
        + F.shiftleft(F.shiftrightunsigned(b2, 1).bitwiseAND(F.lit(0x7F)), 15)
        + F.shiftleft(b3, 7)
        + F.shiftrightunsigned(b4, 1).bitwiseAND(F.lit(0x7F))
    ).cast("bigint")


def pts_encode_py(pts: int) -> bytes:
    """Pure-Python twin of ``pts_encode_expr`` (property-test reference;
    independently written from ISO 13818-1 §2.4.3.7)."""
    p = pts % PTS_MOD
    return bytes(
        [
            0x21 | (((p >> 30) & 0x7) << 1),
            (p >> 22) & 0xFF,
            (((p >> 15) & 0x7F) << 1) | 1,
            (p >> 7) & 0xFF,
            ((p & 0x7F) << 1) | 1,
        ]
    )


def pts_decode_py(b: bytes, off: int = _PTS_OFF - 1) -> int:
    """Pure-Python twin of ``pts_decode_expr`` (0-based ``off``)."""
    return (
        (((b[off] >> 1) & 0x7) << 30)
        | (b[off + 1] << 22)
        | (((b[off + 2] >> 1) & 0x7F) << 15)
        | (b[off + 3] << 7)
        | ((b[off + 4] >> 1) & 0x7F)
    )


def page_timeout_expr(pes: Column) -> Column:
    """page_time_out (seconds) of the page composition segment."""
    return _byte(pes, _PAGE_TIMEOUT_OFF)


def region_positions_expr(pes: Column) -> Column:
    """struct(hpos, vpos) of the region entry in the page composition."""
    return F.struct(
        _u16(pes, _REGION_HPOS_OFF).alias("hpos"),
        _u16(pes, _REGION_VPOS_OFF).alias("vpos"),
    )


def dvb_subt_pes_expr(
    pts: Column, page_id: Column, timeout_s: Column, hpos: Column, vpos: Column
) -> Column:
    """Build a DVB-subtitle PES packet (private_stream_1, EN 300 743 §7.1)
    with one page composition segment + one region entry."""
    # page composition payload: timeout, version<<4|state, region_id, resv,
    # hpos u16, vpos u16  -> segment_length = 8
    seg = F.concat(
        F.unhex(F.lit("0F10")),  # sync + segment_type page composition
        _enc_u16(page_id),
        F.unhex(F.lit("0008")),  # segment_length
        _enc_u8(timeout_s),
        # page_version 0, page_state 'acquisition point' = 0b01 (EN 300 743
        # §7.2.2 table 3; 0x0C would be the RESERVED state 0b11).
        F.unhex(F.lit("04")),
        F.unhex(F.lit("01FF")),  # region_id 1, reserved
        _enc_u16(hpos),
        _enc_u16(vpos),
    )
    data = F.concat(F.unhex(F.lit("2000")), seg)  # data_identifier 0x20
    # PES_packet_length = bytes after the length field: 2 flag bytes +
    # header_data_length byte + 5 PTS + data (16) = 24
    return F.concat(
        F.unhex(F.lit("000001BD")),  # start code + private_stream_1
        _enc_u16(F.lit(24)),
        F.unhex(F.lit("8480")),  # '10', data_alignment | PTS_DTS_flags='10'
        _enc_u8(F.lit(5)),  # PES_header_data_length
        pts_encode_expr(pts),
        data,
    )


@dataclass(frozen=True)
class DvbSubtSettings:
    """dvb_subt settings surface (es_proc.js:87-93, dvb_subt.js:667-767).

    ``ts_pcr_guard_msec``: minimum lead of the ES time-stamp over its
    program's PCR (the per-ES guard distance of es_proc.js:70-81); applied
    by ``dvb_subt_patch_expr`` when a PCR reference column is supplied.
    None = no guard (the reference's default depends on stream type).
    """

    time_shift_offset_msec: int = 0
    restamping: bool = True
    duration_min_seg: int = 0
    duration_max_seg: int = 255
    duration_offset_seg: int = 0
    vpos_offset_pels: int = 0
    hpos_offset_pels: int = 0
    ts_pcr_guard_msec: int | None = None


def _clamp(c: Column, lo: Column, hi: Column) -> Column:
    return F.least(F.greatest(c, lo), hi)


def dvb_subt_patch_expr(
    pes: Column, s: DvbSubtSettings, pcr_90k: Column | None = None
) -> Column:
    """The real dvb_subt body: restamp PTS by time_shift_offset_msec,
    clamp page_time_out through duration_{min,max,offset}_seg, shift the
    region position by the pixel offsets; re-encode by splicing the fixed
    layout. When ``pcr_90k`` (program PCR base, 90 kHz ticks) is given and
    ``ts_pcr_guard_msec`` is set, the restamped PTS is additionally held
    at least the guard distance ahead of the PCR (es_proc.js ts_pcr_guard
    semantics). Returns struct(out_payload, pts_in, pts_out, timeout_out,
    hpos_out, vpos_out)."""
    pts_in = pts_decode_expr(pes)
    shift = F.lit(int(s.time_shift_offset_msec) * 90)
    pts_out = (
        F.pmod(pts_in + shift, F.lit(PTS_MOD)) if s.restamping else pts_in
    )
    if pcr_90k is not None and s.ts_pcr_guard_msec is not None:
        floor_pts = F.pmod(
            pcr_90k.cast("bigint") + F.lit(int(s.ts_pcr_guard_msec) * 90),
            F.lit(PTS_MOD),
        )
        # wrap-aware "is pts_out at least guard ahead of pcr": compare the
        # forward distance pcr->pts_out against the guard
        dist = F.pmod(pts_out - pcr_90k.cast("bigint"), F.lit(PTS_MOD))
        pts_out = F.when(
            dist < F.lit(int(s.ts_pcr_guard_msec) * 90), floor_pts
        ).otherwise(pts_out)
    timeout_out = _clamp(
        _byte(pes, _PAGE_TIMEOUT_OFF) + F.lit(s.duration_offset_seg),
        F.lit(s.duration_min_seg),
        F.least(F.lit(s.duration_max_seg), F.lit(255)),
    )
    # SD display: 720x576 (EN 300 743 display definition default)
    hpos_out = _clamp(
        _u16(pes, _REGION_HPOS_OFF) + F.lit(s.hpos_offset_pels),
        F.lit(0),
        F.lit(719),
    )
    vpos_out = _clamp(
        _u16(pes, _REGION_VPOS_OFF) + F.lit(s.vpos_offset_pels),
        F.lit(0),
        F.lit(575),
    )
    out = F.concat(
        F.substring(pes, 1, _PTS_OFF - 1),
        pts_encode_expr(pts_out),
        F.substring(pes, _PTS_OFF + 5, _PAGE_TIMEOUT_OFF - (_PTS_OFF + 5)),
        _enc_u8(timeout_out),
        F.substring(
            pes, _PAGE_TIMEOUT_OFF + 1, _REGION_HPOS_OFF - (_PAGE_TIMEOUT_OFF + 1)
        ),
        _enc_u16(hpos_out),
        _enc_u16(vpos_out),
    )
    return F.struct(
        out.alias("out_payload"),
        pts_in.alias("pts_in"),
        pts_out.cast("bigint").alias("pts_out"),
        timeout_out.cast("int").alias("timeout_out"),
        hpos_out.cast("int").alias("hpos_out"),
        vpos_out.cast("int").alias("vpos_out"),
    )


# ---------------------------------------------------------------------------
# SCTE-27 -> DVB conversion (scte_subt2dvb)
# ---------------------------------------------------------------------------

# Simplified SCTE-27-shaped envelope (SCTE 27 subtitle_message carries a
# display-in PTS, a display duration in frames and bitmap coordinates; the
# full section layout is richer — this fixed envelope keeps the conversion
# arithmetic, which is the settings surface, byte-exact and JVM-side):
#   +0      0xC6 table_id (SCTE-27 subtitle message)
#   +1..2   length u16
#   +3..7   display_in_PTS (5-byte PES encoding)
#   +8..9   display_duration in frames @30 fps, u16
#   +10..11 bitmap vpos u16
#   +12..13 bitmap hpos u16
SCTE_ENVELOPE_LEN = 14
_SCTE_PTS_OFF = 4
_SCTE_DUR_OFF = 9
_SCTE_VPOS_OFF = 11
_SCTE_HPOS_OFF = 13
SCTE_FPS = 30


def scte_envelope_expr(
    pts: Column, duration_frames: Column, vpos: Column, hpos: Column
) -> Column:
    return F.concat(
        F.unhex(F.lit("C6")),
        _enc_u16(F.lit(SCTE_ENVELOPE_LEN - 3)),
        pts_encode_expr(pts),
        _enc_u16(duration_frames),
        _enc_u16(vpos),
        _enc_u16(hpos),
    )


@dataclass(frozen=True)
class ScteSubt2DvbSettings:
    """scte_subt2dvb settings surface (scte_subt2dvb.js:371-374)."""

    duration_offset_msec: int = 0
    vpos_offset_pels: int = 0


def scte_subt2dvb_expr(env: Column, s: ScteSubt2DvbSettings) -> Column:
    """The real scte_subt2dvb body: frames -> milliseconds -> DVB
    page_time_out seconds (ceil, clamped to u8), vertical position shifted
    by vpos_offset_pels, PTS carried over; emits a spec-shaped DVB PES via
    ``dvb_subt_pes_expr``. Returns struct(out_payload, pts, timeout_out,
    vpos_out, hpos_out)."""
    pts = pts_decode_expr(env, _SCTE_PTS_OFF)
    dur_ms = _u16(env, _SCTE_DUR_OFF) * 1000 / F.lit(SCTE_FPS) + F.lit(
        s.duration_offset_msec
    )
    timeout = _clamp(
        F.ceil(dur_ms / 1000).cast("bigint"), F.lit(0), F.lit(255)
    )
    vpos = _clamp(
        _u16(env, _SCTE_VPOS_OFF) + F.lit(s.vpos_offset_pels),
        F.lit(0),
        F.lit(575),
    )
    hpos = _clamp(_u16(env, _SCTE_HPOS_OFF), F.lit(0), F.lit(719))
    out = dvb_subt_pes_expr(pts, F.lit(1), timeout, hpos, vpos)
    return F.struct(
        out.alias("out_payload"),
        pts.alias("pts"),
        timeout.cast("int").alias("timeout_out"),
        vpos.cast("int").alias("vpos_out"),
        hpos.cast("int").alias("hpos_out"),
    )
