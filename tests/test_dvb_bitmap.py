"""DVB subtitle pixel-plane codec (EN 300 743 §7.2.3-7.2.5, §10).

The decoder is pinned two independent ways: hand-assembled bit vectors
for each run-length code table (derived from the spec tables, not from
the encoder), and encoder->decoder round-trips over random planes
(hypothesis) covering all three depths, the bulk run codes and the
map-table path.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from streamprocessors_spark.codec import dvb_bitmap as B


# ---------------------------------------------------------------------------
# hand vectors (spec bit tables, assembled manually)
# ---------------------------------------------------------------------------


def _bits(s: str) -> bytes:
    s = s.replace(" ", "")
    s += "0" * (-len(s) % 8)
    return bytes(
        int(s[i : i + 8], 2) for i in range(0, len(s), 8)
    )


def test_2bit_hand_vector():
    # pixel 2, pixel 1, run of 5 x color 3, single 0, end
    s = "10" + "01" + "00 1 010 11" + "00 0 1" + "00 0 0 00"
    data = bytes([B.DT_2BIT]) + _bits(s) + bytes([B.DT_END_OF_LINE])
    rows = B.decode_field(data, 2)
    assert rows == [[2, 1, 3, 3, 3, 3, 3, 0]]


def test_4bit_hand_vector():
    # pixel 9, run of 4 x color 5 (0000 1 0 00 0101), 3 zeros
    # (0000 0 001), two zeros (0000 1 1 01), run of 9 x color 2
    # (0000 1 1 10 0000 0010), end (0000 0 000)
    s = (
        "1001"
        + "0000 1 0 00 0101"
        + "0000 0 001"
        + "0000 1 1 01"
        + "0000 1 1 10 0000 0010"
        + "0000 0 000"
    )
    data = bytes([B.DT_4BIT]) + _bits(s) + bytes([B.DT_END_OF_LINE])
    rows = B.decode_field(data, 4)
    assert rows == [[9] + [5] * 4 + [0] * 3 + [0, 0] + [2] * 9]


def test_8bit_hand_vector():
    # pixel 0xAB, 3 zeros (00000000 0 0000011), run of 4 x 0x42
    # (00000000 1 0000100 01000010), end (00000000 0 0000000)
    s = (
        "10101011"
        + "00000000 0 0000011"
        + "00000000 1 0000100 01000010"
        + "00000000 0 0000000"
    )
    data = bytes([B.DT_8BIT]) + _bits(s) + bytes([B.DT_END_OF_LINE])
    rows = B.decode_field(data, 8)
    assert rows == [[0xAB, 0, 0, 0, 0x42, 0x42, 0x42, 0x42]]


def test_map_table_2to4():
    # explicit 2->4 map then a 2-bit string in a 4-bit region
    s = "01" + "10" + "00 0 0 00"  # pixels 1, 2, end
    data = (
        bytes([B.DT_MAP_2TO4, 0x3C, 0x5A])  # map [3, 12, 5, 10]
        + bytes([B.DT_2BIT])
        + _bits(s)
        + bytes([B.DT_END_OF_LINE])
    )
    rows = B.decode_field(data, 4)
    assert rows == [[12, 5]]


# ---------------------------------------------------------------------------
# roundtrips
# ---------------------------------------------------------------------------


@settings(max_examples=40, deadline=None)
@given(
    depth=st.sampled_from([2, 4, 8]),
    data=st.data(),
)
def test_pixel_string_roundtrip(depth, data):
    w = data.draw(st.integers(min_value=1, max_value=350))
    row = data.draw(
        st.lists(
            st.integers(min_value=0, max_value=(1 << depth) - 1),
            min_size=w,
            max_size=w,
        )
    )
    enc = B.encode_pixel_string(row, depth)
    rows = B.decode_field(enc, depth)
    assert rows == [row]


@settings(max_examples=15, deadline=None)
@given(
    depth=st.sampled_from([2, 4, 8]),
    data=st.data(),
)
def test_object_data_roundtrip(depth, data):
    w = data.draw(st.integers(min_value=1, max_value=40))
    h = data.draw(st.integers(min_value=1, max_value=12))
    plane = [
        data.draw(
            st.lists(
                st.integers(min_value=0, max_value=(1 << depth) - 1),
                min_size=w,
                max_size=w,
            )
        )
        for _ in range(h)
    ]
    payload = B.build_object_data(7, plane, depth)
    object_id, top, bot = B.parse_object_data(payload, depth)
    assert object_id == 7
    assert top == plane[0::2]
    # odd-row-free planes mirror the top field per §7.2.5
    assert bot == (plane[1::2] if len(plane) > 1 else plane[0::2])


def test_clut_roundtrip_and_defaults():
    entries = {0: (16, 128, 128, 255), 3: (235, 90, 110, 0), 9: (60, 200, 40, 128)}
    seg = B.build_clut_segment(5, entries, version=2)
    clut_id, version, got = B.parse_clut_segment(seg)
    assert (clut_id, version) == (5, 2)
    assert got == entries
    # defaults: entry 0 transparent at every depth
    for depth in (2, 4, 8):
        d = B.default_clut(depth)
        assert d[0][3] == 255
        assert len(d) == 1 << depth


def test_region_composition_roundtrip_and_render():
    rc = B.RegionComposition(
        region_id=4, version=1, fill=True, width=12, height=6,
        depth_bits=4, clut_id=5, fill_code=2, objects=[(7, 3, 1)],
    )
    seg = B.build_region_composition(rc)
    back = B.parse_region_composition(seg)
    assert back == rc

    plane = [[9, 9, 9], [1, 0, 1]]  # 3x2 object
    payload = B.build_object_data(7, plane, 4)
    _oid, top, bot = B.parse_object_data(payload, 4)
    out = B.render_region(rc, {7: (top, bot)})
    assert len(out) == 6 and all(len(r) == 12 for r in out)
    # fill everywhere except the blit
    assert out[0] == [2] * 12
    assert out[1][3:6] == [9, 9, 9]      # top field row 0 -> y=1
    assert out[2][3:6] == [1, 0, 1]      # bottom field row 0 -> y=2
    assert out[3] == [2] * 12


def test_display_definition_roundtrip():
    seg = B.build_display_definition(720, 576, version=3)
    assert B.parse_display_definition(seg) == (3, 720, 576)


def test_ycrcb_rgb_inverse_consistency():
    for r, g, b in [(0, 0, 0), (255, 255, 255), (255, 0, 0), (10, 200, 90)]:
        y, cr, cb = B._rgb_to_ycrcb(r, g, b)
        rgb = B.ycrcbt_to_rgb24(y, cr, cb)
        r2, g2, b2 = rgb >> 16, (rgb >> 8) & 0xFF, rgb & 0xFF
        assert abs(r - r2) <= 2 and abs(g - g2) <= 2 and abs(b - b2) <= 2
