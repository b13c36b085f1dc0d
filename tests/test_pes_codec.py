"""PES + DVB-subtitling segment codec tests (codec/pes.py).

Pins the byte layout and the settings arithmetic of the U2 subtitle
processors: PTS 5-byte marker encoding (ISO 13818-1 §2.4.3.7) roundtrip
including 33-bit wraparound, duration/position clamping (dvb_subt.js
settings surface), and the SCTE frames -> page_time_out conversion.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from streamprocessors_spark.codec.pes import (
    PES_TOTAL_LEN,
    PTS_MOD,
    DvbSubtSettings,
    ScteSubt2DvbSettings,
    dvb_subt_patch_expr,
    dvb_subt_pes_expr,
    page_timeout_expr,
    pts_decode_expr,
    pts_encode_expr,
    region_positions_expr,
    scte_envelope_expr,
    scte_subt2dvb_expr,
)

PTS_CASES = [0, 1, 90_000, PTS_MOD - 1, PTS_MOD // 2, 0x1_2345_6789 % PTS_MOD]


def test_pts_marker_encoding_roundtrip(spark):
    df = spark.createDataFrame([(p,) for p in PTS_CASES], "pts bigint")
    enc = df.select("pts", pts_encode_expr(F.col("pts")).alias("b"))
    out = enc.select(
        "pts",
        F.length("b").alias("n"),
        pts_decode_expr(F.concat(F.unhex(F.lit("00" * 9)), F.col("b"))).alias(
            "back"
        ),
    ).collect()
    for r in out:
        assert r.n == 5
        assert r.back == r.pts


def test_pts_marker_bits_set(spark):
    # every odd byte of the 5-byte field carries a trailing marker bit = 1
    df = spark.createDataFrame([(p,) for p in PTS_CASES], "pts bigint")
    rows = df.select(F.hex(pts_encode_expr(F.col("pts"))).alias("h")).collect()
    for r in rows:
        b = bytes.fromhex(r.h)
        assert b[0] >> 4 == 0x2  # '0010' prefix
        assert b[0] & 1 and b[2] & 1 and b[4] & 1


def test_dvb_pes_layout_and_patch_clamps(spark):
    df = spark.createDataFrame([(100, 10, 700, 560)], "pts long, t long, h long, v long")
    pes = dvb_subt_pes_expr(
        F.col("pts"), F.lit(7), F.col("t"), F.col("h"), F.col("v")
    )
    s = DvbSubtSettings(
        time_shift_offset_msec=-10,  # 100 - 900 ticks -> wraps mod 2^33
        duration_min_seg=15,
        duration_max_seg=20,
        duration_offset_seg=100,  # 10+100 clamped to max 20
        vpos_offset_pels=100,  # 560+100 clamped to 575
        hpos_offset_pels=100,  # 700+100 clamped to 719
    )
    r = df.select(dvb_subt_patch_expr(pes, s).alias("r")).select("r.*").collect()[0]
    assert r.pts_in == 100
    assert r.pts_out == (100 - 900) % PTS_MOD
    assert r.timeout_out == 20
    assert r.hpos_out == 719
    assert r.vpos_out == 575
    # patched packet still parses, and length is the fixed layout
    out = df.select(dvb_subt_patch_expr(pes, s)["out_payload"].alias("o"))
    row = out.select(
        F.length("o").alias("n"),
        F.hex(F.substring("o", 1, 4)).alias("start"),
        pts_decode_expr(F.col("o")).alias("pts"),
        page_timeout_expr(F.col("o")).alias("t"),
        region_positions_expr(F.col("o")).alias("pos"),
    ).collect()[0]
    assert row.n == PES_TOTAL_LEN
    assert row.start == "000001BD"
    assert row.pts == (100 - 900) % PTS_MOD
    assert (row.t, row.pos.hpos, row.pos.vpos) == (20, 719, 575)


def test_pts_expr_matches_python_twin(spark):
    """The JVM expression and the pure-Python reference implement the same
    bit layout — checked over a spread of the 33-bit space in one job."""
    from streamprocessors_spark.codec.pes import pts_encode_py

    vals = sorted({(i * 2654435761) % PTS_MOD for i in range(64)} | set(PTS_CASES))
    df = spark.createDataFrame([(v,) for v in vals], "pts bigint")
    rows = df.select("pts", F.hex(pts_encode_expr(F.col("pts"))).alias("h")).collect()
    for r in rows:
        assert bytes.fromhex(r.h) == pts_encode_py(r.pts), r.pts


def test_restamping_disabled_keeps_pts(spark):
    df = spark.createDataFrame([(12345,)], "pts long")
    pes = dvb_subt_pes_expr(F.col("pts"), F.lit(1), F.lit(5), F.lit(0), F.lit(0))
    s = DvbSubtSettings(time_shift_offset_msec=5000, restamping=False)
    r = df.select(dvb_subt_patch_expr(pes, s).alias("r")).select("r.*").collect()[0]
    assert r.pts_out == 12345


def test_scte_conversion_duration_and_vpos(spark):
    # 45 frames @30fps = 1500ms, +700ms offset = 2200ms -> ceil = 3s
    df = spark.createDataFrame([(9000, 45, 500, 100)], "pts long, f long, v long, h long")
    env = scte_envelope_expr(F.col("pts"), F.col("f"), F.col("v"), F.col("h"))
    s = ScteSubt2DvbSettings(duration_offset_msec=700, vpos_offset_pels=90)
    r = df.select(scte_subt2dvb_expr(env, s).alias("r")).select("r.*").collect()[0]
    assert r.pts == 9000
    assert r.timeout_out == 3
    assert r.vpos_out == 575  # 500+90 clamped
    assert r.hpos_out == 100
    out = df.select(scte_subt2dvb_expr(env, s)["out_payload"].alias("o"))
    row = out.select(
        F.length("o").alias("n"), pts_decode_expr(F.col("o")).alias("pts")
    ).collect()[0]
    assert row.n == PES_TOTAL_LEN and row.pts == 9000


def test_pcr_guard_clamps_pts(spark):
    """ts_pcr_guard_msec (es_proc.js:70-81): the restamped PTS is held at
    least the guard distance ahead of the program PCR, wrap-aware."""
    # pts 1000 ticks after pcr; guard 100 ms = 9000 ticks -> clamp to floor
    df = spark.createDataFrame(
        [(10_000, 9_000), (100_000, 9_000), (500, PTS_MOD - 400)],
        "pts long, pcr long",
    )
    pes = dvb_subt_pes_expr(F.col("pts"), F.lit(1), F.lit(5), F.lit(0), F.lit(0))
    s = DvbSubtSettings(ts_pcr_guard_msec=100)
    rows = df.select(
        "pts",
        "pcr",
        dvb_subt_patch_expr(pes, s, pcr_90k=F.col("pcr")).alias("r"),
    ).select("pts", "pcr", "r.*").collect()
    by_pts = {r.pts: r for r in rows}
    # 10_000 is only 1_000 ahead of 9_000 -> clamped to pcr + 9000
    assert by_pts[10_000].pts_out == 9_000 + 9_000
    # 100_000 is 91_000 ahead -> untouched
    assert by_pts[100_000].pts_out == 100_000
    # wrap case: pcr near the top, pts just past zero; distance 900 < 9000
    assert by_pts[500].pts_out == (PTS_MOD - 400 + 9_000) % PTS_MOD
