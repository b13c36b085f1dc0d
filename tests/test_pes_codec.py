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


# ---------------------------------------------------------------------------
# Variable-layout path (codec/pes_var.py): the general parser/patcher the
# fixed-offset JVM expressions are a fast path of. Pinned two ways: (a)
# byte-identical to dvb_subt_patch_expr on the common fixed shape, (b)
# hypothesis properties over randomized multi-segment / stuffed layouts.
# ---------------------------------------------------------------------------

from hypothesis import given, settings as hsettings
from hypothesis import strategies as st

from streamprocessors_spark.codec.pes_var import (
    PATCH_RESULT_SCHEMA,
    SEG_PAGE_COMPOSITION,
    build_pes_py,
    dvb_subt_patch_batches,
    dvb_subt_patch_py,
    page_composition_payload,
    parse_pes_py,
)


def _rand_params(n, seed=0x5EED):
    """Deterministic spread of (pts, page_id, timeout, hpos, vpos)."""
    x = seed
    out = []
    for _ in range(n):
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        out.append(
            (
                x % PTS_MOD,
                (x >> 33) % 0x10000,
                (x >> 49) % 256,
                (x >> 7) % 720,
                (x >> 17) % 576,
            )
        )
    return out


def test_build_pes_py_matches_jvm_generator(spark):
    """The Python fixture builder reproduces dvb_subt_pes_expr's 30-byte
    layout bit-for-bit, so the two paths patch the same input space."""
    params = _rand_params(64)
    df = spark.createDataFrame(params, "pts long, pg long, t long, h long, v long")
    rows = df.select(
        "*",
        F.hex(
            dvb_subt_pes_expr(
                F.col("pts"), F.col("pg"), F.col("t"), F.col("h"), F.col("v")
            )
        ).alias("hx"),
    ).collect()
    for r in rows:
        built = build_pes_py(
            r.pts,
            [
                (
                    SEG_PAGE_COMPOSITION,
                    r.pg,
                    page_composition_payload(r.t, [(1, r.h, r.v)]),
                )
            ],
            end_marker=False,
        )
        assert built == bytes.fromhex(r.hx), (r.pts, r.pg)


def test_variable_path_matches_jvm_patch_bytes(spark):
    """On the fixed shape, dvb_subt_patch_py output (bytes + every reported
    field) is identical to dvb_subt_patch_expr — one job, 64 random packets,
    settings exercising shift/clamp/guard simultaneously."""
    s = DvbSubtSettings(
        time_shift_offset_msec=-3712,
        duration_min_seg=4,
        duration_max_seg=180,
        duration_offset_seg=7,
        hpos_offset_pels=-35,
        vpos_offset_pels=60,
        ts_pcr_guard_msec=120,
    )
    params = _rand_params(64, seed=0xB00)
    df = spark.createDataFrame(
        [(p, pg, t, h, v, (p * 7919) % PTS_MOD) for p, pg, t, h, v in params],
        "pts long, pg long, t long, h long, v long, pcr long",
    )
    pes = dvb_subt_pes_expr(F.col("pts"), F.col("pg"), F.col("t"), F.col("h"), F.col("v"))
    rows = df.select(
        "pcr",
        F.hex(pes).alias("in_hx"),
        dvb_subt_patch_expr(pes, s, pcr_90k=F.col("pcr")).alias("r"),
    ).select("pcr", "in_hx", "r.*").collect()
    for r in rows:
        out_py, meta = dvb_subt_patch_py(bytes.fromhex(r.in_hx), s, pcr_90k=r.pcr)
        assert out_py == bytes(r.out_payload)
        assert meta["pts_in"] == r.pts_in and meta["pts_out"] == r.pts_out
        assert meta["timeout_out"] == r.timeout_out
        assert (meta["hpos_out"], meta["vpos_out"]) == (r.hpos_out, r.vpos_out)


_page_seg = st.tuples(
    st.just(SEG_PAGE_COMPOSITION),
    st.integers(0, 0xFFFF),
    st.tuples(
        st.integers(0, 255),
        st.lists(
            st.tuples(st.integers(0, 255), st.integers(0, 719), st.integers(0, 575)),
            min_size=0,
            max_size=4,
        ),
    ).map(lambda tv: page_composition_payload(tv[0], tv[1])),
)
_other_seg = st.tuples(
    st.sampled_from([0x11, 0x12, 0x13, 0x14, 0x80]),
    st.integers(0, 0xFFFF),
    st.binary(min_size=0, max_size=40),
)


@hsettings(max_examples=150, deadline=None)
@given(
    pts=st.integers(0, PTS_MOD - 1),
    stuffing=st.integers(0, 16),
    segs=st.lists(st.one_of(_page_seg, _other_seg), min_size=0, max_size=6),
    shift=st.integers(-(10**6), 10**6),
    dmin=st.integers(0, 50),
    dmax=st.integers(50, 300),
    doff=st.integers(-100, 300),
    hoff=st.integers(-800, 800),
    voff=st.integers(-600, 600),
)
def test_variable_layout_patch_property(
    pts, stuffing, segs, shift, dmin, dmax, doff, hoff, voff
):
    """Randomized multi-segment, stuffed-header PES: the patch applies the
    settings arithmetic to EVERY page composition segment and EVERY region,
    leaves every other byte untouched, and preserves the layout."""
    s = DvbSubtSettings(
        time_shift_offset_msec=shift,
        duration_min_seg=dmin,
        duration_max_seg=dmax,
        duration_offset_seg=doff,
        hpos_offset_pels=hoff,
        vpos_offset_pels=voff,
    )
    pes = build_pes_py(pts, segs, stuffing=stuffing)
    out, meta = dvb_subt_patch_py(pes, s)
    assert len(out) == len(pes)
    assert meta["pts_in"] == pts
    assert meta["pts_out"] == (pts + shift * 90) % PTS_MOD
    pin, pout = parse_pes_py(pes), parse_pes_py(out)
    assert pout.pts == meta["pts_out"]
    assert pout.header_data_length == pin.header_data_length
    assert len(pout.segments) == len(pin.segments)
    from streamprocessors_spark.codec.pes_var import parse_page_composition

    for a, b in zip(pin.segments, pout.segments):
        assert (a.seg_type, a.page_id, len(a.payload)) == (
            b.seg_type,
            b.page_id,
            len(b.payload),
        )
        if a.seg_type != SEG_PAGE_COMPOSITION:
            assert a.payload == b.payload  # untouched
            continue
        t0, vs0, regs0 = parse_page_composition(a.payload)
        t1, vs1, regs1 = parse_page_composition(b.payload)
        assert vs0 == vs1
        assert t1 == min(max(t0 + doff, dmin), min(dmax, 255))
        for (rid0, h0, v0), (rid1, h1, v1) in zip(regs0, regs1):
            assert rid0 == rid1
            assert h1 == min(max(h0 + hoff, 0), 719)
            assert v1 == min(max(v0 + voff, 0), 575)
    # non-segment trailing bytes (end marker) untouched
    assert out[-1] == pes[-1] == 0xFF


def test_variable_path_mapinpandas(spark):
    """The Arrow-batched Spark wrapper returns the same rows as the pure
    Python patch — the distributed form of the general path."""
    s = DvbSubtSettings(time_shift_offset_msec=40, vpos_offset_pels=-10)
    packets = [
        build_pes_py(
            p,
            [
                (0x14, 0, b"\x01\x02"),
                (
                    SEG_PAGE_COMPOSITION,
                    pg,
                    page_composition_payload(t, [(1, h, v), (2, h // 2, v // 2)]),
                ),
            ],
            stuffing=3,
        )
        for p, pg, t, h, v in _rand_params(16, seed=0xCAFE)
    ]
    df = spark.createDataFrame([(bytearray(p),) for p in packets], "payload binary")
    got = {
        bytes(r.out_payload): (r.pts_in, r.pts_out, r.timeout_out, r.hpos_out, r.vpos_out)
        for r in df.mapInPandas(
            dvb_subt_patch_batches(s), schema=PATCH_RESULT_SCHEMA
        ).collect()
    }
    assert len(got) == len(packets)
    for p in packets:
        out, m = dvb_subt_patch_py(p, s)
        assert got[out] == (
            m["pts_in"],
            m["pts_out"],
            m["timeout_out"],
            m["hpos_out"],
            m["vpos_out"],
        )


def test_variable_path_no_pts_and_malformed_inputs():
    """Error/edge paths of the variable-layout parser: PES without PTS
    (patch is a no-op on timestamps, segments still patched), missing
    start code, and truncated segment headers."""
    import pytest

    from streamprocessors_spark.codec.pes_var import SEG_PAGE_COMPOSITION

    # no PTS: pts_dts_flags '00', header empty; page comp still patched
    pes = build_pes_py(
        None,
        [(SEG_PAGE_COMPOSITION, 3, page_composition_payload(9, [(1, 10, 20)]))],
    )
    p = parse_pes_py(pes)
    assert p.pts is None and p.header_data_length == 0
    out, meta = dvb_subt_patch_py(
        pes, DvbSubtSettings(time_shift_offset_msec=999, duration_offset_seg=5)
    )
    assert meta["pts_in"] is None and meta["pts_out"] is None
    assert meta["timeout_out"] == 14
    assert len(out) == len(pes)

    with pytest.raises(ValueError, match="start code"):
        parse_pes_py(b"\x00\x00\x02\xbd" + b"\x00" * 10)

    # truncated segment header: sync byte present but <6 bytes remain
    trunc = build_pes_py(100, [])[:-1] + b"\x0f\x10\x00"
    with pytest.raises(ValueError, match="truncated"):
        parse_pes_py(trunc)

    # truncated segment payload: declared length exceeds buffer
    bad = build_pes_py(100, [(SEG_PAGE_COMPOSITION, 1, b"\x05\x04")], end_marker=False)
    bad = bad[:-1]  # chop one payload byte
    with pytest.raises(ValueError, match="truncated"):
        parse_pes_py(bad)


def test_variable_path_multiple_page_segments_all_patched():
    """A display set with TWO page composition segments (e.g. current +
    next page): the patch must rewrite both, reporting the first."""
    s = DvbSubtSettings(duration_offset_seg=10, hpos_offset_pels=5)
    pes = build_pes_py(
        500,
        [
            (SEG_PAGE_COMPOSITION, 1, page_composition_payload(20, [(1, 100, 200)])),
            (SEG_PAGE_COMPOSITION, 2, page_composition_payload(40, [(2, 300, 400)])),
        ],
    )
    out, meta = dvb_subt_patch_py(pes, s)
    pp = parse_pes_py(out)
    from streamprocessors_spark.codec.pes_var import parse_page_composition

    t1, _, r1 = parse_page_composition(pp.segments[0].payload)
    t2, _, r2 = parse_page_composition(pp.segments[1].payload)
    assert (t1, r1[0][1]) == (30, 105)
    assert (t2, r2[0][1]) == (50, 305)
    assert meta["timeout_out"] == 30 and meta["hpos_out"] == 105


def test_pathological_settings_mask_parity(spark):
    """ADVICE r3: settings that push the clamped timeout outside 0..255
    must WRAP identically on both paths — the upper clamp is
    min(duration_max_seg, 255), so the reachable pathology is a NEGATIVE
    timeout (negative duration_min_seg + large negative offset). The JVM
    twin masks through _enc_u8; the python twin must write t & 0xFF
    rather than raising. Byte output and every reported field must stay
    identical (timeout_out reports the unmasked clamp on both sides)."""
    s = DvbSubtSettings(
        time_shift_offset_msec=0,
        duration_min_seg=-200,
        duration_max_seg=400,
        duration_offset_seg=-300,  # timeout in 0..255 -> clamp to [-200, -45]
    )
    params = _rand_params(16, seed=0xFACE)
    df = spark.createDataFrame(params, "pts long, pg long, t long, h long, v long")
    pes = dvb_subt_pes_expr(F.col("pts"), F.col("pg"), F.col("t"), F.col("h"), F.col("v"))
    rows = df.select(
        "t", F.hex(pes).alias("in_hx"), dvb_subt_patch_expr(pes, s).alias("r")
    ).select("t", "in_hx", "r.*").collect()
    for r in rows:
        out_py, meta = dvb_subt_patch_py(bytes.fromhex(r.in_hx), s)
        assert out_py == bytes(r.out_payload)
        expected = max(r.t - 300, -200)
        assert meta["timeout_out"] == r.timeout_out == expected < 0
        # the byte on the wire is the masked wrap on BOTH paths
        assert parse_pes_py(out_py).segments[0].payload[0] == expected & 0xFF


def test_packet_length_bounds_segment_walk():
    """ADVICE r3: a buffer holding bytes past the PES packet end (two
    concatenated packets, plausible for off-air ES dumps) must have its
    tail neither parsed nor patched — the segment walk stops at
    6 + pes_packet_length."""
    a = build_pes_py(
        1000,
        [(SEG_PAGE_COMPOSITION, 7, page_composition_payload(50, [(1, 100, 200)]))],
    )
    b = build_pes_py(
        2000,
        [(SEG_PAGE_COMPOSITION, 9, page_composition_payload(60, [(2, 300, 400)]))],
    )
    both = a + b
    p = parse_pes_py(both)
    # only packet A's segments are visible
    assert [seg.page_id for seg in p.segments] == [7]
    s = DvbSubtSettings(duration_offset_seg=100, hpos_offset_pels=10)
    out, meta = dvb_subt_patch_py(both, s)
    # packet A patched...
    assert meta["timeout_out"] == 150 and meta["hpos_out"] == 110
    # ...packet B byte-identical (untouched tail)
    assert out[len(a):] == b
    assert out[: len(a)] == dvb_subt_patch_py(a, s)[0]

    # a header_data_length overrunning the declared packet end raises
    import pytest as _pytest

    bad = bytearray(a)
    bad[8] = 250  # header_data_length far past 6 + pes_packet_length
    with _pytest.raises(ValueError):
        parse_pes_py(bytes(bad))
