"""Structured Streaming parity layer (SURVEY §7.2 milestone 5).

The reference is a continuous stream processor (UDP in, 1 s refresh,
per-PID keyed state); this package re-expresses that dataflow as
Structured Streaming:

- file-segment / table streams stand in for the UDP socket (S3's
  file-replay pattern — the test-stable equivalent the reference itself
  uses, utests_mpeg2_sp.cpp:54-66);
- per-PID continuity and PSI section reassembly run as keyed state in
  ``applyInPandasWithState`` (R1/R6 + P6 with T1-T4 semantics);
- the 1 s polling cadence (T6) maps to trigger intervals; the 60 s stats
  ring buffers (A3-A5) map to watermarked window aggregates;
- "current table" registers (R7) are the latest-version aggregate of the
  section stream.

Every streaming operator here is *batch-parity checked*: run with an
``availableNow`` trigger over the same fixtures, its output equals the
batch pipeline's (and the driver's DuckDB oracle) row for row.
"""

from streamprocessors_spark.streaming.runner import run_available_now  # noqa: F401
