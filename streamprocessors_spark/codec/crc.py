"""CRC-32/MPEG-2 (the PSI section checksum).

Parameters (public spec, ISO/IEC 13818-1 Annex A): polynomial 0x04C11DB7,
init 0xFFFFFFFF, no input/output reflection, no final xor. The reference
verifies it over every reassembled section (mpeg2ts/src/psi_dec.c:476-481)
and patches it into encoded sections (mpeg2ts/src/psi_enc.c:161-166).
"""

from __future__ import annotations

import numpy as np

_POLY = 0x04C11DB7


def _make_table() -> np.ndarray:
    table = np.zeros(256, dtype=np.uint32)
    for i in range(256):
        c = i << 24
        for _ in range(8):
            c = ((c << 1) ^ _POLY) if (c & 0x80000000) else (c << 1)
            c &= 0xFFFFFFFF
        table[i] = c
    return table


_TABLE = _make_table()
_TABLE_LIST = _TABLE.tolist()  # plain ints: faster for the scalar loop


def crc32_mpeg2(data: bytes) -> int:
    """CRC-32/MPEG-2 over ``data`` (scalar path, sections are <= 4 KiB)."""
    crc = 0xFFFFFFFF
    tbl = _TABLE_LIST
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ tbl[((crc >> 24) ^ b) & 0xFF]
    return crc


def crc32_mpeg2_ok(section: bytes) -> bool:
    """True iff the trailing 4 CRC bytes verify (CRC over the whole
    section including the stored CRC equals 0 for this parameterization —
    same acceptance the reference uses)."""
    if len(section) < 4:
        return False
    return crc32_mpeg2(section) == 0


def append_crc(body: bytes) -> bytes:
    """Return ``body`` with its CRC-32/MPEG-2 appended (encode side)."""
    return body + crc32_mpeg2(body).to_bytes(4, "big")
