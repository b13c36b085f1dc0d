"""Live UDP loopback tests (S1 source, S3 replayer, S4 sink).

Mirrors the reference's own end-to-end shape (utests_mpeg2_sp.cpp: replay
a TS asset to udp://127.0.0.1 and watch the daemon's state): replay a
synthetic single-program TS into the UDP DataSource, run the packet
pipeline on the live stream, and check the decoded output.
"""

from __future__ import annotations

import socket
import threading
import time

import pytest

from streamprocessors_spark.sources.udp import (
    DATAGRAM_SIZE,
    register_udp_source,
    replay_ts_to_udp,
    udp_sink_foreach_batch,
)


def _free_port() -> int:
    s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture()
def mux_bytes():
    from streamprocessors_spark.codec.fixtures import MuxSpec, ProgramSpec, build_ts

    spec = MuxSpec(
        programs=[
            ProgramSpec(
                program_number=1,
                pmt_pid=0x100,
                pcr_pid=0x101,
                streams=[(0x1B, 0x101)],
                service_name="LOOPBACK",
            )
        ],
        psi_interval=10,
        es_payload_packets=30,
    )
    return build_ts(spec)


def test_udp_source_roundtrip(spark, mux_bytes):
    """Replay -> UDP DataSource -> packet parse -> PID histogram."""
    import tempfile

    from pyspark.sql import functions as F

    from streamprocessors_spark.sources import packets_from_binary_column

    port = _free_port()
    register_udp_source(spark)
    stream = (
        spark.readStream.format("udp_ts")
        .option("port", str(port))
        .option("drain_ms", "300")
        .load()
    )
    pkts = packets_from_binary_column(
        stream.selectExpr("cast(arrival_seq as string) as stream_id", "data as value")
    )
    counts = pkts.groupBy("pid").count()
    q = (
        counts.writeStream.format("memory")
        .queryName("udp_pids")
        .outputMode("complete")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="spgraft_udp_"))
        .trigger(processingTime="300 milliseconds")
        .start()
    )
    try:
        # Wait for the first micro-batch to complete — the reader binds its
        # socket during batch 1, and UDP is fire-and-forget, so replaying
        # earlier silently drops everything (a fixed sleep races under load).
        deadline = time.monotonic() + 60
        while time.monotonic() < deadline and not q.recentProgress:
            time.sleep(0.2)
        assert q.recentProgress, "source never produced a batch"
        sender = threading.Thread(
            target=replay_ts_to_udp,
            args=(mux_bytes, "127.0.0.1", port, 2_000_000),
        )
        sender.start()
        sender.join()
        expected_pkts = len(mux_bytes) // 188
        deadline = time.monotonic() + 30
        total = 0
        while time.monotonic() < deadline:
            rows = spark.sql("SELECT sum(count) AS n FROM udp_pids").collect()
            total = rows[0].n or 0
            if total >= expected_pkts:
                break
            time.sleep(0.5)
        assert total == expected_pkts, f"received {total}/{expected_pkts}"
        pids = {r.pid for r in spark.table("udp_pids").collect()}
        assert {0x0, 0x11, 0x100, 0x101} <= pids  # PAT, SDT, PMT, ES
    finally:
        q.stop()


def test_udp_soak_url_flip_matrix(spark, mux_bytes):
    """Composed e2e soak mirroring the reference's URL-flip matrix
    (utests_mpeg2_sp.cpp:127-188): live replayer -> udp_ts source ->
    packet parse -> per-PID state, reconfigured through the ConfigStore:

      set input_url      -> packets flow (PAT/SDT/PMT/ES PIDs seen)
      clear (empty PUT)  -> input closed, query gone
      wrong port         -> query up, nothing received
      restore            -> packets flow again

    Settings PUTs alternate JSON and query-string bodies (the dual-format
    edge, P9 / mpeg2_sp.c:716)."""
    import tempfile

    from streamprocessors_spark.sources import packets_from_binary_column
    from streamprocessors_spark.streaming.control import (
        ConfigStore,
        InputSupervisor,
    )

    register_udp_source(spark)
    port_good = _free_port()
    port_wrong = _free_port()
    store = ConfigStore(spark)
    sys_id = 7

    def put(seq: int, doc: str) -> None:
        store.upsert(
            spark.createDataFrame(
                [(sys_id, seq, doc)], "sys_id BIGINT, seq BIGINT, doc STRING"
            )
        )

    def build_query(host: str, port: int, gen: int):
        stream = (
            spark.readStream.format("udp_ts")
            .option("host", host)
            .option("port", str(port))
            .option("drain_ms", "300")
            .load()
        )
        pkts = packets_from_binary_column(
            stream.selectExpr(
                "cast(arrival_seq as string) as stream_id", "data as value"
            )
        )
        return (
            pkts.groupBy("pid")
            .count()
            .writeStream.format("memory")
            .queryName(f"udp_soak_{gen}")
            .outputMode("complete")
            .option(
                "checkpointLocation", tempfile.mkdtemp(prefix="spgraft_soak_")
            )
            .trigger(processingTime="300 milliseconds")
            .start()
        )

    sup = InputSupervisor(store, sys_id, build_query)

    def wait_first_batch(q):
        deadline = time.monotonic() + 60
        while time.monotonic() < deadline and not q.recentProgress:
            time.sleep(0.2)
        assert q.recentProgress, "source never produced a batch"

    def replay() -> None:
        t = threading.Thread(
            target=replay_ts_to_udp,
            args=(mux_bytes, "127.0.0.1", port_good, 2_000_000),
        )
        t.start()
        t.join()

    def received(gen: int) -> int:
        rows = spark.sql(
            f"SELECT coalesce(sum(count), 0) AS n FROM udp_soak_{gen}"
        ).collect()
        return rows[0].n

    expected = len(mux_bytes) // 188
    try:
        # --- phase 1: set (JSON settings doc) ---
        put(1, '{"tag": "soak", "input_url": "udp://127.0.0.1:%d"}' % port_good)
        q = sup.reconcile()
        assert q is not None and sup.current_url.endswith(str(port_good))
        wait_first_batch(q)
        replay()
        deadline = time.monotonic() + 30
        while time.monotonic() < deadline and received(1) < expected:
            time.sleep(0.5)
        assert received(1) == expected
        pids = {r.pid for r in spark.table("udp_soak_1").collect()}
        assert {0x0, 0x11, 0x100, 0x101} <= pids  # PAT, SDT, PMT, ES

        # --- phase 2: clear input (query-string doc, empty url) ---
        put(2, "input_url=&tag=soak")
        assert sup.reconcile() is None
        assert not q.isActive  # old query was stopped, socket released
        replay()  # nothing is listening; must not error or block

        # --- phase 3: wrong port (query-string doc) ---
        put(3, f"input_url=udp://127.0.0.1:{port_wrong}&tag=soak")
        q3 = sup.reconcile()
        assert q3 is not None
        wait_first_batch(q3)
        replay()  # replays to port_good; q3 listens on port_wrong
        time.sleep(2.0)
        assert received(sup.generation) == 0

        # --- phase 4: restore (JSON doc) ---
        put(4, '{"input_url": "udp://127.0.0.1:%d"}' % port_good)
        q4 = sup.reconcile()
        assert q4 is not None and not q3.isActive
        wait_first_batch(q4)
        replay()
        gen = sup.generation
        deadline = time.monotonic() + 30
        while time.monotonic() < deadline and received(gen) < expected:
            time.sleep(0.5)
        assert received(gen) == expected
    finally:
        if sup.query is not None:
            sup.query.stop()


def test_udp_sink_pacing(spark, mux_bytes):
    """foreachBatch UDP sink emits every packet as 7-packet datagrams."""
    port = _free_port()
    recv = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    recv.bind(("127.0.0.1", port))
    recv.settimeout(5)

    got = bytearray()

    def drain():
        while True:
            try:
                data, _ = recv.recvfrom(DATAGRAM_SIZE * 4)
            except socket.timeout:
                return
            got.extend(data)

    t = threading.Thread(target=drain)
    t.start()
    time.sleep(0.2)

    n = 35  # 5 datagrams
    pkts = [mux_bytes[i * 188 : (i + 1) * 188] for i in range(n)]
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(pkts)], "idx INT, raw BINARY"
    ).orderBy("idx")
    sink = udp_sink_foreach_batch("127.0.0.1", port, cbr_kbps=4096)
    sink(df, epoch_id=0)
    t.join()
    recv.close()
    assert bytes(got) == mux_bytes[: n * 188]  # order + byte-exact
