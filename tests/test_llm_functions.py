"""Unit tests for the LLM-pipeline function library.

End-to-end Spark<->DuckDB parity of every registered query is covered by
test_oracle_parity; these tests pin the pieces that parity alone wouldn't
catch: the multimodal Arrow plumbing (payload layout, batch schema,
decode-stub contract) and the cross-engine determinism of floor_round.
"""

from __future__ import annotations

import zlib

import duckdb
import pytest

from streamprocessors_spark.functions import dialect as D
from streamprocessors_spark.functions import minhash as MH
from streamprocessors_spark.functions import multimodal as MM


def test_minhash_constants_sane():
    assert MH.BANDS * MH.ROWS_PER_BAND == MH.K_PERMS == len(MH.PERMS)
    for a, b in MH.PERMS:
        # products must stay within signed-64 (DuckDB raises on overflow)
        assert 0 < a < MH.P and 0 <= b < MH.P
        assert a * (MH.P - 1) + b < 2**63


def test_decode_stub_is_marked():
    with pytest.raises(NotImplementedError):
        MM.decode_image_real(b"\x00")


def test_fake_decode_deterministic():
    assert MM._fake_decode(b"hello") == MM._fake_decode(b"hello")
    w, h, m = MM._fake_decode(b"")
    assert (w, h, m) == (16, 16, 0)


def test_payload_layout(spark, sf_dir):
    from streamprocessors_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents").limit(5)
    rows = MM.with_payload(docs).collect()
    assert len(rows) == 5
    for r in rows:
        payload = bytes(r.payload)
        assert payload[:4] == MM.MAGIC
        media_type = int.from_bytes(payload[4:8], "big")
        body_len = int.from_bytes(payload[8:12], "big")
        assert media_type == r.doc_id % 3 == r.meta.media_type
        assert body_len == len(payload) - MM.HEADER_LEN == r.meta.body_len


def test_frame_sample_crcs(spark, sf_dir):
    from streamprocessors_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents").limit(3)
    mm = MM.with_payload(docs)
    payloads = {r.doc_id: bytes(r.payload)[MM.HEADER_LEN :] for r in mm.collect()}
    frames = MM.sample_frames(mm).collect()
    assert frames
    for fr in frames:
        body = payloads[fr.doc_id]
        chunk = body[fr.frame_idx * MM.FRAME_SIZE : (fr.frame_idx + 1) * MM.FRAME_SIZE]
        assert fr.frame_idx % 2 == 0  # stride
        assert fr.frame_len == len(chunk)
        assert fr.frame_crc == zlib.crc32(chunk)


def test_floor_round_cross_engine(spark):
    """floor-based quantization is bit-identical across engines even on
    values where round() half-up/half-even behavior differs."""
    vals = [80.725, 0.1, -0.5554445, 2.675, 1.0 / 3.0, -1e-7]
    sql_vals = ", ".join(f"({v!r}::DOUBLE)" for v in vals)
    du = duckdb.sql(
        f"SELECT {', '.join(D.floor_round(D.DUCK, f'({v!r})::DOUBLE', 4) for v in vals)}"
    ).fetchone()
    sp = spark.sql(
        f"SELECT {', '.join(D.floor_round(D.SPARK, f'cast({v!r} as double)', 4) for v in vals)}"
    ).collect()[0]
    assert list(du) == list(sp), (sql_vals, du, sp)
