"""Control-plane tests: dual-format settings parse + config-store merges.

The oracle gate covers the end-to-end replay; these pin the store's
upsert semantics across multiple merges (last-writer-wins per sys_id,
read-back verify count) and the P9 format guess on edge inputs.
"""

from __future__ import annotations


def test_normalize_settings_dual_format(spark):
    from streamprocessors_spark.streaming.control import normalize_settings

    df = spark.createDataFrame(
        [
            (1, '{"tag": "a", "input_url": "udp://127.0.0.1:2000", "cbr": "1024"}'),
            (2, "tag=b&output_url=udp://1.2.3.4:5&brctrl_type=cbr"),
            (3, '  {"tag": "c"}'),  # leading whitespace still JSON (ltrim)
            (4, "not_a_known_key=zzz"),
        ],
        "sys_id INT, doc STRING",
    )
    rows = {r.sys_id: r for r in normalize_settings(df).collect()}
    assert rows[1].is_json and rows[1].tag == "a" and rows[1].cbr == "1024"
    assert rows[1].input_url == "udp://127.0.0.1:2000"
    assert not rows[2].is_json and rows[2].tag == "b"
    assert rows[2].output_url == "udp://1.2.3.4:5"
    assert rows[2].brctrl_type == "cbr"
    assert rows[3].is_json and rows[3].tag == "c" and rows[3].cbr is None
    assert rows[4].tag is None  # unknown keys ignored, no error

def test_config_store_last_writer_wins(spark):
    from streamprocessors_spark.streaming.control import ConfigStore

    store = ConfigStore(spark)
    b1 = spark.createDataFrame(
        [(1, 10, "v1"), (2, 11, "v2")], "sys_id BIGINT, seq BIGINT, doc STRING"
    )
    assert store.upsert(b1) == 2
    # second merge: update sys_id 1 (higher seq), stale write for 2 (lower
    # seq loses), new sys_id 3
    b2 = spark.createDataFrame(
        [(1, 20, "v1b"), (2, 5, "stale"), (3, 12, "v3")],
        "sys_id BIGINT, seq BIGINT, doc STRING",
    )
    assert store.upsert(b2) == 3  # S5 read-back verify
    final = {r.sys_id: (r.seq, r.doc) for r in store.read().collect()}
    assert final == {1: (20, "v1b"), 2: (11, "v2"), 3: (12, "v3")}


def test_es_settings_from_config_store(spark):
    """S5 + P9 + U2 wired together: ES-processor settings stored as config
    docs (JSON and query-string) drive the real subtitle transform."""
    from pyspark.sql import functions as F

    from streamprocessors_spark.codec.pes import (
        PTS_MOD,
        dvb_subt_patch_expr,
        dvb_subt_pes_expr,
    )
    from streamprocessors_spark.operators.es_procs import (
        dvb_subt_settings_from_doc,
        scte_subt2dvb_settings_from_doc,
    )
    from streamprocessors_spark.streaming.control import ConfigStore

    store = ConfigStore(spark)
    store.upsert(
        spark.createDataFrame(
            [
                (1, 1, '{"time_shift_offset_msec": -40, "restamping": true,'
                       ' "vpos_offset_pels": 12, "duration_max_seg": 25}'),
                (2, 1, "duration_offset_msec=500&vpos_offset_pels=-6"),
            ],
            "sys_id BIGINT, seq BIGINT, doc STRING",
        )
    )
    docs = {r.sys_id: r.doc for r in store.read().collect()}

    s1 = dvb_subt_settings_from_doc(docs[1])
    assert (s1.time_shift_offset_msec, s1.restamping) == (-40, True)
    assert (s1.vpos_offset_pels, s1.duration_max_seg) == (12, 25)
    assert s1.duration_min_seg == 0  # default preserved

    s2 = scte_subt2dvb_settings_from_doc(docs[2])
    assert (s2.duration_offset_msec, s2.vpos_offset_pels) == (500, -6)

    # the parsed settings drive the actual byte transform
    df = spark.createDataFrame([(90000, 100, 560)], "pts long, h long, v long")
    pes = dvb_subt_pes_expr(F.col("pts"), F.lit(1), F.lit(30), F.col("h"), F.col("v"))
    r = df.select(dvb_subt_patch_expr(pes, s1).alias("r")).select("r.*").collect()[0]
    assert r.pts_out == (90000 - 40 * 90) % PTS_MOD
    assert r.vpos_out == 572
    assert r.timeout_out == 25  # clamped to duration_max_seg


def test_parse_udp_url_edge_cases():
    """S2 URL parse: empty/None/other-scheme/malformed all mean 'input
    closed' (the reference closes input on an empty input_url PUT)."""
    from streamprocessors_spark.streaming.control import parse_udp_url

    assert parse_udp_url("udp://127.0.0.1:2000") == ("127.0.0.1", 2000)
    assert parse_udp_url("  udp://h:1  ") == ("h", 1)
    assert parse_udp_url("") is None
    assert parse_udp_url(None) is None
    assert parse_udp_url("http://127.0.0.1:2000") is None
    assert parse_udp_url("udp://nohost") is None
    assert parse_udp_url("udp://h:notaport") is None
    assert parse_udp_url("udp://:2000") is None
