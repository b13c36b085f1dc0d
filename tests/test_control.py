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
