"""UDP transport-stream source and paced sink (SURVEY S1/S4/T5).

Source (S1): the reference blocks on ``comm_recv_external`` for 7x188-byte
datagrams (mpeg2_sp.c:1340-1430, ts.h:38). Spark-first restatement: a
Python DataSource (Spark 4 API) whose SimpleDataSourceStreamReader drains
a bound UDP socket once per micro-batch — one row per datagram
(arrival_seq, recv_time, data). UDP is fire-and-forget, so offsets only
move forward and ``readBetweenOffsets`` replays from an in-memory spool of
the current run (the reference likewise drops on overflow,
psi_proc.c:249-251 — loss is a UDP property, flagged downstream by the CC
check, never blocking).

Sink (S4/T5): ``udp_sink_foreach_batch`` re-emits packets as 7-packet
datagrams paced to a constant bitrate (the program-processor's CBR output,
app_prog_proc.c:77-90; default 1024 kbit/s :832), from ``foreachBatch`` —
sink-side rate control is not a Catalyst concern (SURVEY §4).

Replayer (S3): ``replay_ts_to_udp`` is the tsudpsend analog
(utests_mpeg2_sp.cpp:54-66) used by tests to drive the source loopback.

Scale note: one UDP port is a single-node tap by nature; at fleet scale
you run one source per ingest edge and the query fans in, or (preferred,
and what the batch layer already does) land datagrams to segment files and
let the file source parallelize. This source exists for live-parity, not
bulk throughput.
"""

from __future__ import annotations

import socket
import time
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,  # noqa: F401  (re-export for discoverability)
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

TS_PKT_SIZE = 188
PKTS_PER_DATAGRAM = 7  # "legacy UDP", ts.h:38
DATAGRAM_SIZE = TS_PKT_SIZE * PKTS_PER_DATAGRAM

UDP_SCHEMA = StructType(
    [
        StructField("arrival_seq", LongType()),
        StructField("recv_time", DoubleType()),
        StructField("data", BinaryType()),
    ]
)


class UDPStreamReader(SimpleDataSourceStreamReader):
    """Drains whatever datagrams are queued on the socket each batch."""

    def __init__(self, options: dict) -> None:
        self.host = options.get("host", "127.0.0.1")
        self.port = int(options.get("port", "2000"))
        # how long one batch keeps polling an idle socket before yielding
        self.drain_ms = int(options.get("drain_ms", "200"))
        self.max_per_batch = int(options.get("max_per_batch", "65536"))
        self._sock: socket.socket | None = None
        self._spool: dict[int, list[tuple]] = {}

    def _socket(self) -> socket.socket:
        if self._sock is None:
            s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
            s.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
            s.setsockopt(socket.SOL_SOCKET, socket.SO_RCVBUF, 1 << 22)
            s.bind((self.host, self.port))
            s.settimeout(self.drain_ms / 1000.0)
            self._sock = s
        return self._sock

    def initialOffset(self) -> dict:
        return {"seq": 0}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        seq = int(start["seq"])
        sock = self._socket()
        rows: list[tuple] = []
        deadline = time.monotonic() + self.drain_ms / 1000.0
        while len(rows) < self.max_per_batch:
            try:
                data, _addr = sock.recvfrom(DATAGRAM_SIZE * 4)
            except socket.timeout:
                break
            rows.append((seq + len(rows), time.monotonic(), bytes(data)))
            if time.monotonic() > deadline:
                break
        end = {"seq": seq + len(rows)}
        if rows:
            self._spool[seq] = rows
        return iter(rows), end

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        """Replay from the in-run spool (post-crash replay of a raw UDP
        feed is impossible by nature; the reference has the same hole)."""
        lo, hi = int(start["seq"]), int(end["seq"])
        out = []
        for base, rows in self._spool.items():
            for r in rows:
                if lo <= r[0] < hi:
                    out.append(r)
        return iter(sorted(out))

    def commit(self, end: dict) -> None:
        done = int(end["seq"])
        self._spool = {
            base: rows
            for base, rows in self._spool.items()
            if rows and rows[-1][0] >= done
        }


class UDPDataSource(DataSource):
    """``spark.readStream.format("udp_ts")`` after ``register_udp_source``."""

    @classmethod
    def name(cls) -> str:
        return "udp_ts"

    def schema(self) -> StructType:
        return UDP_SCHEMA

    def simpleStreamReader(self, schema: StructType) -> UDPStreamReader:
        return UDPStreamReader(self.options)


def register_udp_source(spark) -> None:
    spark.dataSource.register(UDPDataSource)


def replay_ts_to_udp(
    buf: bytes, host: str, port: int, bitrate_bps: int = 200_000
) -> int:
    """tsudpsend analog: send a TS buffer as 7-packet datagrams at a fixed
    bitrate (the golden-asset replay runs 200 kbit/s). Returns datagrams
    sent."""
    sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    sent = 0
    delay = (DATAGRAM_SIZE * 8) / bitrate_bps
    for i in range(0, len(buf), DATAGRAM_SIZE):
        sock.sendto(buf[i : i + DATAGRAM_SIZE], (host, port))
        sent += 1
        time.sleep(delay)
    sock.close()
    return sent


def udp_sink_foreach_batch(
    host: str, port: int, cbr_kbps: int = 1024, bytes_col: str = "raw"
):
    """S4 paced UDP re-emission as a foreachBatch sink (T5 CBR control).

    Packs the batch's packets into 7-packet datagrams and paces sends to
    ``cbr_kbps``. A single UDP socket is inherently one emission point, so
    the batch is coalesced to ONE partition and sent from an executor task
    via ``foreachPartition`` — the bytes never cross the driver (at scale
    the driver hop would double the output path; the executor task streams
    partition rows straight onto the wire). Emission order follows the
    batch's sort order; PCR smoothness is the upstream query's job
    (ts_pcr_delta).
    """

    def send_partition(rows) -> None:
        sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        delay = (DATAGRAM_SIZE * 8) / (cbr_kbps * 1000)
        pending = bytearray()
        try:
            for r in rows:
                b = r[bytes_col]
                if b is None:
                    continue
                pending.extend(bytes(b))
                while len(pending) >= DATAGRAM_SIZE:
                    sock.sendto(pending[:DATAGRAM_SIZE], (host, port))
                    del pending[:DATAGRAM_SIZE]
                    time.sleep(delay)
            if pending:  # trailing partial datagram (< 7 packets)
                sock.sendto(bytes(pending), (host, port))
        finally:
            sock.close()

    def fn(batch_df, epoch_id: int) -> None:
        batch_df.select(bytes_col).coalesce(1).foreachPartition(send_partition)

    return fn
