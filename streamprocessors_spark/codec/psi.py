"""PSI layer: section parse/encode, PAT/PMT/SDT payloads, descriptors,
and the per-PID section reassembler.

Re-expresses (not ports) the reference's PSI stack:
- generic section decode/dispatch  mpeg2ts/src/psi_dec.c:110-236
- PAS (PAT) payload                mpeg2ts/src/psi_dec.c:501-543
- PMS (PMT) payload                mpeg2ts/src/psi_dec.c:545-658
- DVB SDS (SDT) payload            mpeg2ts/src/psi_dvb_dec.c
- descriptors (0x48 service, 0x59 subtitling; unknown kept raw)
                                   mpeg2ts/src/psi_desc_dec.c:53-174
- section reassembly across packets (pointer_field, section-start
  mid-packet, stuffing, CRC)       mpeg2ts/src/psi_dec.c:238-499
- encode direction (+CRC patch)    mpeg2ts/src/psi_enc.c:52-250

All functions are pure Python over ``bytes`` — they run inside Arrow-batched
``applyInPandas`` bodies and in the fixture generator.
"""

from __future__ import annotations

from typing import Any, Iterator

from streamprocessors_spark.codec.crc import append_crc, crc32_mpeg2_ok
from streamprocessors_spark.codec.ts import TS_PKT_SIZE, encode_ts_packet

PSI_TABLE_ID_PAT = 0x00  # psi.h:44-area constants (public spec values)
PSI_TABLE_ID_PMT = 0x02
PSI_TABLE_ID_SDT = 0x42
PSI_PID_PAT = 0x0000
PSI_PID_SDT = 0x0011
MAX_SECTION_MPEG = 1024  # psi.h:82-83
MAX_SECTION_PRIVATE = 4096

DESC_TAG_SERVICE = 0x48
DESC_TAG_SUBTITLING = 0x59

# Small public-spec tag->name map (broadcast dim table in the Spark plan;
# the reference keeps a 256-entry lookup at psi_desc.c:543-802).
DESCRIPTOR_TAG_NAMES = {
    0x40: "network_name_descriptor",
    0x41: "service_list_descriptor",
    0x48: "service_descriptor",
    0x4D: "short_event_descriptor",
    0x52: "stream_identifier_descriptor",
    0x56: "teletext_descriptor",
    0x59: "subtitling_descriptor",
    0x6A: "AC-3_descriptor",
}

STREAM_TYPE_NAMES = {
    0x01: "MPEG-1 video",
    0x02: "MPEG-2 video",
    0x03: "MPEG-1 audio",
    0x04: "MPEG-2 audio",
    0x06: "private PES (subtitles/teletext)",
    0x0F: "AAC audio",
    0x1B: "H.264 video",
    0x24: "HEVC video",
}


# ---------------------------------------------------------------------------
# Descriptors (P7/P8)
# ---------------------------------------------------------------------------


def parse_descriptors(buf: bytes) -> list[dict[str, Any]]:
    """Parse a descriptor loop; unknown tags keep raw bytes.

    Mirrors psi_desc_dec.c:53-111 incl. the resync-on-truncated rule:
    a descriptor whose declared length overruns the loop is dropped."""
    out: list[dict[str, Any]] = []
    i = 0
    while i + 2 <= len(buf):
        tag = buf[i]
        length = buf[i + 1]
        body = buf[i + 2 : i + 2 + length]
        if len(body) < length:
            break  # truncated: stop (psi_dec.c:611-633 bad-desc resync)
        d: dict[str, Any] = {
            "tag": tag,
            "name": DESCRIPTOR_TAG_NAMES.get(tag, "unknown"),
            "raw": body,
            "service_type": None,
            "provider_name": None,
            "service_name": None,
            "language": None,
        }
        if tag == DESC_TAG_SERVICE and length >= 2:
            # service_descriptor: type u8, provider len+chars, name len+chars
            st = body[0]
            pl = body[1]
            provider = body[2 : 2 + pl]
            j = 2 + pl
            nl = body[j] if j < len(body) else 0
            name = body[j + 1 : j + 1 + nl]
            d["service_type"] = st
            d["provider_name"] = provider.decode("latin-1", "replace")
            d["service_name"] = name.decode("latin-1", "replace")
        elif tag == DESC_TAG_SUBTITLING and length >= 8:
            d["language"] = body[0:3].decode("latin-1", "replace")
        out.append(d)
        i += 2 + length
    return out


def encode_service_descriptor(
    service_type: int, provider: str, name: str
) -> bytes:
    p = provider.encode("latin-1")
    n = name.encode("latin-1")
    body = bytes([service_type, len(p)]) + p + bytes([len(n)]) + n
    return bytes([DESC_TAG_SERVICE, len(body)]) + body


# ---------------------------------------------------------------------------
# Section header + payload parse (R2-R5)
# ---------------------------------------------------------------------------


def parse_section(section: bytes) -> dict[str, Any]:
    """Parse a full PSI section (header + typed payload + CRC check).

    Mirrors psi_dec_section (psi_dec.c:110-236): length bounds, version,
    section numbering, current_next, dispatch on table_id; unknown
    table_ids keep the raw payload (short-circuit, psi_dec.c:211-215)."""
    errors: list[str] = []
    if len(section) < 12:
        return {"errors": ["too_short"], "table_id": None}
    table_id = section[0]
    b1, b2 = section[1], section[2]
    ssi = (b1 >> 7) & 1  # section_syntax_indicator
    section_length = ((b1 & 0x0F) << 8) | b2
    if not 9 <= section_length <= 1021 and table_id <= 0x7F:
        errors.append("bad_section_length")  # psi_dec.c:165-176 bound
    table_id_ext = (section[3] << 8) | section[4]
    version = (section[5] >> 1) & 0x1F
    current_next = section[5] & 1
    section_number = section[6]
    last_section_number = section[7]
    crc_ok = crc32_mpeg2_ok(section[: section_length + 3])
    payload = section[8 : section_length + 3 - 4]

    out: dict[str, Any] = {
        "table_id": table_id,
        "ssi": ssi,
        "section_length": section_length,
        "table_id_ext": table_id_ext,
        "version": version,
        "current_next": current_next,
        "section_number": section_number,
        "last_section_number": last_section_number,
        "crc_ok": crc_ok,
        "payload": payload,
        "pas": None,
        "pms": None,
        "sds": None,
        "errors": errors,
    }
    if table_id == PSI_TABLE_ID_PAT:
        out["pas"] = _parse_pas(payload)
    elif table_id == PSI_TABLE_ID_PMT:
        out["pms"] = _parse_pms(payload)
    elif table_id == PSI_TABLE_ID_SDT:
        out["sds"] = _parse_sds(payload)
    return out


def _parse_pas(payload: bytes) -> list[dict[str, int]]:
    """PAT: N x {program_number u16, reference_pid u13} (psi_dec.c:501-543)."""
    progs = []
    for i in range(0, len(payload) - 3, 4):
        program_number = (payload[i] << 8) | payload[i + 1]
        pid = ((payload[i + 2] & 0x1F) << 8) | payload[i + 3]
        progs.append({"program_number": program_number, "reference_pid": pid})
    return progs


def _parse_pms(payload: bytes) -> dict[str, Any]:
    """PMT: pcr_pid + program descriptors + ES loop (psi_dec.c:545-658)."""
    if len(payload) < 4:
        return {"pcr_pid": None, "descriptors": [], "streams": []}
    pcr_pid = ((payload[0] & 0x1F) << 8) | payload[1]
    pinfo_len = ((payload[2] & 0x0F) << 8) | payload[3]
    descs = parse_descriptors(payload[4 : 4 + pinfo_len])
    streams = []
    i = 4 + pinfo_len
    while i + 5 <= len(payload):
        stream_type = payload[i]
        es_pid = ((payload[i + 1] & 0x1F) << 8) | payload[i + 2]
        es_info_len = ((payload[i + 3] & 0x0F) << 8) | payload[i + 4]
        es_descs = parse_descriptors(payload[i + 5 : i + 5 + es_info_len])
        streams.append(
            {
                "stream_type": stream_type,
                "stream_type_name": STREAM_TYPE_NAMES.get(stream_type, "unknown"),
                "elementary_pid": es_pid,
                "descriptors": es_descs,
            }
        )
        i += 5 + es_info_len
    return {"pcr_pid": pcr_pid, "descriptors": descs, "streams": streams}


def _parse_sds(payload: bytes) -> dict[str, Any]:
    """DVB SDT: original_network_id + service loop (psi_dvb_dec.c)."""
    if len(payload) < 3:
        return {"original_network_id": None, "services": []}
    onid = (payload[0] << 8) | payload[1]
    services = []
    i = 3  # skip reserved byte
    while i + 5 <= len(payload):
        service_id = (payload[i] << 8) | payload[i + 1]
        eit_sched = (payload[i + 2] >> 1) & 1
        eit_pf = payload[i + 2] & 1
        running_status = (payload[i + 3] >> 5) & 7
        free_ca = (payload[i + 3] >> 4) & 1
        loop_len = ((payload[i + 3] & 0x0F) << 8) | payload[i + 4]
        descs = parse_descriptors(payload[i + 5 : i + 5 + loop_len])
        services.append(
            {
                "service_id": service_id,
                "eit_schedule": eit_sched,
                "eit_present_following": eit_pf,
                "running_status": running_status,
                "free_ca_mode": free_ca,
                "descriptors": descs,
            }
        )
        i += 5 + loop_len
    return {"original_network_id": onid, "services": services}


# ---------------------------------------------------------------------------
# Section encode (R8) — fixture generation + sink path
# ---------------------------------------------------------------------------


def encode_section(
    table_id: int,
    table_id_ext: int,
    version: int,
    section_number: int,
    last_section_number: int,
    payload: bytes,
    current_next: int = 1,
) -> bytes:
    """Encode a section and patch its CRC (psi_enc.c:52-166)."""
    section_length = 5 + len(payload) + 4  # post-length bytes incl. CRC
    header = bytes(
        [
            table_id,
            0x80 | 0x30 | ((section_length >> 8) & 0x0F),  # ssi=1, reserved
            section_length & 0xFF,
            (table_id_ext >> 8) & 0xFF,
            table_id_ext & 0xFF,
            0xC0 | ((version & 0x1F) << 1) | (current_next & 1),
            section_number & 0xFF,
            last_section_number & 0xFF,
        ]
    )
    return append_crc(header + payload)


def encode_pat(
    programs: list[tuple[int, int]], ts_id: int = 1, version: int = 0
) -> bytes:
    payload = b"".join(
        bytes([pn >> 8, pn & 0xFF, 0xE0 | (pid >> 8), pid & 0xFF])
        for pn, pid in programs
    )
    return encode_section(PSI_TABLE_ID_PAT, ts_id, version, 0, 0, payload)


def encode_pmt(
    program_number: int,
    pcr_pid: int,
    streams: list[tuple[int, int]],
    version: int = 0,
) -> bytes:
    """streams: [(stream_type, elementary_pid)]."""
    body = bytes([0xE0 | (pcr_pid >> 8), pcr_pid & 0xFF, 0xF0, 0x00])
    for stream_type, es_pid in streams:
        body += bytes(
            [stream_type, 0xE0 | (es_pid >> 8), es_pid & 0xFF, 0xF0, 0x00]
        )
    return encode_section(PSI_TABLE_ID_PMT, program_number, version, 0, 0, body)


def encode_sdt(
    services: list[tuple[int, int, str, str]],
    ts_id: int = 1,
    onid: int = 1,
    version: int = 0,
) -> bytes:
    """services: [(service_id, service_type, provider, name)]."""
    body = bytes([onid >> 8, onid & 0xFF, 0xFF])
    for service_id, stype, provider, name in services:
        desc = encode_service_descriptor(stype, provider, name)
        body += bytes(
            [
                service_id >> 8,
                service_id & 0xFF,
                0xFC,  # reserved + eit flags 0
                (4 << 5) | (len(desc) >> 8),  # running_status=4 (running)
                len(desc) & 0xFF,
            ]
        ) + desc
    return encode_section(PSI_TABLE_ID_SDT, ts_id, version, 0, 0, body)


# ---------------------------------------------------------------------------
# Sectionize: section bytes -> TS packets (fixture generator direction)
# ---------------------------------------------------------------------------


def sectionize(
    section: bytes, pid: int, start_cc: int = 0
) -> list[bytes]:
    """Split a section across TS packets with pointer_field=0 on the
    first packet (the reference's own fixtures do the same,
    utests_prog_proc.cpp:116-173)."""
    first_capacity = TS_PKT_SIZE - 4 - 1  # pointer_field byte
    rest_capacity = TS_PKT_SIZE - 4
    pkts = []
    chunk = section[:first_capacity]
    body = b"\x00" + chunk  # pointer_field = 0
    if len(body) < TS_PKT_SIZE - 4:
        body = body + b"\xff" * (TS_PKT_SIZE - 4 - len(body))
    pkts.append(_raw_packet(pid, body, start_cc, pusi=1))
    off = first_capacity
    cc = start_cc
    while off < len(section):
        cc = (cc + 1) & 0xF
        chunk = section[off : off + rest_capacity]
        if len(chunk) < rest_capacity:
            chunk = chunk + b"\xff" * (rest_capacity - len(chunk))
        pkts.append(_raw_packet(pid, chunk, cc, pusi=0))
        off += rest_capacity
    return pkts


def _raw_packet(pid: int, body184: bytes, cc: int, pusi: int) -> bytes:
    """Packet with exactly 184 payload bytes (no AF) — PSI carriage."""
    assert len(body184) == TS_PKT_SIZE - 4
    b1 = (pusi << 6) | (pid >> 8)
    return bytes([0x47, b1, pid & 0xFF, 0x10 | (cc & 0xF)]) + body184


def pack_sections_continuous(
    sections: list[bytes], pid: int, start_cc: int = 0
) -> list[bytes]:
    """Pack several sections back-to-back with standard pointer_field
    semantics: a section may start mid-packet (pointer_field counts the
    previous section's tail bytes before it), and consecutive sections can
    share packets with no stuffing in between — the exact arrival shape
    the reassembler's lookahead path exists for (psi_dec.c:344-404).
    Contrast with ``sectionize``, which stuffs each section to a packet
    boundary (never produces mid-packet starts)."""
    stream = b"".join(sections)
    starts: list[int] = []
    off = 0
    for s in sections:
        starts.append(off)
        off += len(s)

    pkts: list[bytes] = []
    pos = 0
    cc = start_cc
    si = 0  # next section-start not yet signalled
    while pos < len(stream):
        next_start = starts[si] if si < len(starts) else None
        if next_start is not None and pos <= next_start <= pos + 183:
            # PUSI packet: pointer_field points at the section start;
            # bytes before it finish the previous section.
            pointer = next_start - pos
            chunk = stream[pos : pos + 183]
            body = bytes([pointer]) + chunk + b"\xff" * (183 - len(chunk))
            pkts.append(_raw_packet(pid, body, cc, pusi=1))
            pos += 183
            # skip every start covered by this packet (back-to-back
            # sections share the single pointer_field)
            while si < len(starts) and starts[si] < pos:
                si += 1
        else:
            chunk = stream[pos : pos + 184]
            body = chunk + b"\xff" * (184 - len(chunk))
            pkts.append(_raw_packet(pid, body, cc, pusi=0))
            pos += 184
        cc = (cc + 1) & 0xF
    return pkts


# ---------------------------------------------------------------------------
# Section reassembly (R1) — the batch/stream UDF body
# ---------------------------------------------------------------------------


class SectionReassembler:
    """Per-PID stateful section reassembly.

    Feed 188-byte packets of ONE pid in stream order; yields complete
    section byte strings. Implements the reference semantics
    (psi_dec.c:238-499): sync to PUSI, honor pointer_field (which may
    terminate a previous section and start a new one mid-packet),
    accumulate until section_length+3, handle back-to-back sections in
    one packet (next-section lookahead, psi_dec.c:344-404), treat 0xFF
    as stuffing, discard on impossible lengths.
    """

    def __init__(self, max_section: int = MAX_SECTION_PRIVATE) -> None:
        self.buf = bytearray()
        self.synced = False
        self.max_section = max_section

    def _target_len(self) -> int | None:
        if len(self.buf) < 3:
            return None
        return (((self.buf[1] & 0x0F) << 8) | self.buf[2]) + 3

    def push(self, pkt: bytes) -> Iterator[bytes]:
        if len(pkt) != TS_PKT_SIZE or pkt[0] != 0x47:
            return
        b1, b3 = pkt[1], pkt[3]
        pusi = (b1 >> 6) & 1
        afc = (b3 >> 4) & 3
        off = 4
        if afc & 2:
            off = 5 + pkt[4]
        if not (afc & 1) or off >= TS_PKT_SIZE:
            return
        data = pkt[off:TS_PKT_SIZE]

        if pusi:
            pointer = data[0]
            if 1 + pointer > len(data):
                # corrupt pointer: drop accumulated state, resync later
                self.buf.clear()
                self.synced = False
                return
            # Bytes before the pointer target complete the previous section.
            if self.synced and pointer > 0:
                self.buf.extend(data[1 : 1 + pointer])
                yield from self._drain(final=True)
            self.buf.clear()
            self.synced = True
            self.buf.extend(data[1 + pointer :])
            yield from self._drain()
        else:
            if not self.synced:
                return  # psi_dec.c: wait for a PUSI packet
            self.buf.extend(data)
            yield from self._drain()

    def _drain(self, final: bool = False) -> Iterator[bytes]:
        """Emit every complete section at the head of the buffer."""
        while True:
            # stuffing: a table_id of 0xFF means rest-of-payload padding
            # (psi_dec.c:444-474)
            if self.buf and self.buf[0] == 0xFF:
                self.buf.clear()
                if final:
                    self.synced = False
                return
            tlen = self._target_len()
            if tlen is None:
                return
            if tlen > self.max_section + 3:
                self.buf.clear()
                self.synced = False
                return
            if len(self.buf) < tlen:
                return
            yield bytes(self.buf[:tlen])
            del self.buf[:tlen]
