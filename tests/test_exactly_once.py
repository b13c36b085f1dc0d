"""Exactly-once foreachBatch sinks under micro-batch replay (VERDICT r10
#1 — the T7 teardown/recovery pin extended to the ingest sinks).

Each sink test: run the pipeline cleanly for the expected result; re-run
against a persistent workdir with a planted fault that kills the driver
mid-replay; simulate the half-committed artifacts a real crash can leave
(a partial batch output directory, a state snapshot written after the
output but before the streaming commit); restart with a FRESH state dict
(a new driver process) and the same workdir. The drained result must
equal the clean run bit-for-bit — the replayed micro-batch must not
duplicate output, and recovered state must come from snapshot N-1, never
the crashed attempt's own N.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import StreamingQueryException

from streamprocessors_spark.streaming import exactly_once as XO



# ---------------------------------------------------------------------------
# helper-level unit tests (no Spark)
# ---------------------------------------------------------------------------


def test_state_snapshot_roundtrip_and_strictly_less_rule(tmp_path):
    wd = str(tmp_path)
    XO.write_state_snapshot(wd, 0, {"offsets": {"a": 1}})
    XO.write_state_snapshot(wd, 1, {"offsets": {"a": 3}})
    XO.write_state_snapshot(wd, 2, {"offsets": {"a": 99}})  # crashed attempt
    # replaying batch 2 must load snapshot 1, never 2 itself
    bid, data = XO.load_state_snapshot(wd, 2)
    assert bid == 1 and data == {"offsets": {"a": 3}}
    assert XO.load_state_snapshot(wd, 0) is None


def test_recover_state_warm_vs_cold(tmp_path):
    wd = str(tmp_path)
    XO.write_state_snapshot(wd, 4, {"offsets": {"a": 7}, "partials": {}})
    # cold (fresh dict): rebuild from snapshot
    st: dict = {}
    XO.recover_state(st, 5, wd, {"offsets": {}, "partials": {}})
    assert st["offsets"] == {"a": 7} and st["last_batch"] == 4
    # warm (this process just did batch 5): untouched
    st["offsets"] = {"a": 11}
    XO.mark_done(st, 5)
    XO.recover_state(st, 6, wd, {"offsets": {}, "partials": {}})
    assert st["offsets"] == {"a": 11}
    # replay of batch 5 in a restarted process (last >= batch): reload
    st2 = {"offsets": {"a": 999}, "last_batch": 5}
    XO.recover_state(st2, 5, wd, {"offsets": {}, "partials": {}})
    assert st2["offsets"] == {"a": 7} and st2["last_batch"] == 4
    # no snapshots at all: init (deep-copied)
    init = {"offsets": {}, "partials": {}}
    st3: dict = {}
    XO.recover_state(st3, 0, str(tmp_path / "empty"), init)
    assert st3["offsets"] == {} and st3["last_batch"] is None
    st3["offsets"]["x"] = 1
    assert init["offsets"] == {}  # init must not be aliased


def test_latest_batch_dir_strictly_less(tmp_path):
    sink = str(tmp_path)
    for b in (0, 1, 3):
        os.makedirs(os.path.join(sink, f"batch_id={b}"))
    assert XO.latest_batch_dir(sink, 3) == os.path.join(sink, "batch_id=1")
    assert XO.latest_batch_dir(sink, 9) == os.path.join(sink, "batch_id=3")
    assert XO.latest_batch_dir(sink, 0) is None
    assert XO.latest_batch_dir(str(tmp_path / "nope"), 5) is None


# ---------------------------------------------------------------------------
# sink-level kill-and-restart tests
# ---------------------------------------------------------------------------


def _shard_docs(spark, tmp_path):
    """8 small docs over 2 sources, staged as 4 one-file micro-batches."""
    import pandas as pd

    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    rows = []
    for i in range(1, 9):
        words = [vocab[(i * 7 + k) % len(vocab)] for k in range(95 + i)]
        rows.append((i, " ".join(words), "en", "srcA" if i % 2 else "srcB"))
    docs = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source"])
    )
    src = str(tmp_path / "shards")
    for lo, hi in ((1, 2), (3, 4), (5, 6), (7, 8)):
        docs.where(F.col("doc_id").between(lo, hi)).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    stream = lambda: (  # noqa: E731 — each run needs a fresh stream DF
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    return docs, stream


def _fail_once_at(batch_id: int):
    fired = {"done": False}

    def fault(bid: int) -> None:
        if bid == batch_id and not fired["done"]:
            fired["done"] = True
            raise XO.PlantedFault(f"planted crash at batch {bid}")

    return fault


def _seq_for(docs):
    us = "\x1f"
    return (
        docs.selectExpr("explode(split(lower(text), ' ')) as word")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .selectExpr("word", f"concat('{us}', word, '{us}') as seq", "cnt")
        .localCheckpoint()
    )


def test_packer_sink_exactly_once_under_replay(spark, tmp_path):
    from streamprocessors_spark.plans.streaming_queries import (
        ingest_packed_bins,
    )

    docs, stream = _shard_docs(spark, tmp_path)
    seq = _seq_for(docs)
    expected = {
        (r.source, r.bin): (r.n_tokens, r.n_docs, r.n_seps, r.fp)
        for r in ingest_packed_bins(stream(), seq).collect()
    }

    wd = str(tmp_path / "wd")
    with pytest.raises(StreamingQueryException):
        ingest_packed_bins(
            stream(), seq, state={}, workdir=wd, fault=_fail_once_at(2)
        )
    # simulate the artifacts of a crash AFTER batch 2's writes but BEFORE
    # its streaming commit: a partial/garbage output dir and a poisoned
    # state snapshot — the replay must overwrite the former and ignore
    # the latter (strictly-less rule)
    spark.createDataFrame(
        [("srcA", 999, 1, 1, 1, 1)],
        "source string, bin bigint, n_tokens bigint, n_docs bigint,"
        " n_seps bigint, fp bigint",
    ).write.mode("overwrite").parquet(os.path.join(wd, "bins", "batch_id=2"))
    with open(os.path.join(wd, "state_2.json"), "w") as fh:
        json.dump({"offsets": {"srcA": 10**9}, "partials": {}}, fh)

    probe: dict = {}  # FRESH state dict = new driver process
    out = ingest_packed_bins(stream(), seq, state=probe, workdir=wd)
    replayed = {
        (r.source, r.bin): (r.n_tokens, r.n_docs, r.n_seps, r.fp)
        for r in out.collect()
    }
    assert replayed == expected
    assert all(v < 10**9 for v in probe["offsets"].values())


def test_cdc_sink_exactly_once_under_replay(spark, tmp_path):
    from streamprocessors_spark.plans.streaming_queries import (
        cdc_delta_report,
    )

    docs, stream = _shard_docs(spark, tmp_path)
    # previous snapshot: docs 1-6, with doc 3's content changed
    store = (
        docs.where("doc_id <= 6")
        .selectExpr(
            "doc_id as id0",
            "source as src0",
            "case when doc_id = 3 then 'old-content'"
            " else md5(text) end as h0",
        )
        .localCheckpoint()
    )
    # arrivals: docs 2-8 (doc 1 removed)
    arrived = lambda: stream().where("doc_id >= 2")  # noqa: E731
    expected = {
        (r.source, r.delta): r.n_docs
        for r in cdc_delta_report(store, arrived()).collect()
    }

    wd = str(tmp_path / "wd")
    with pytest.raises(StreamingQueryException):
        cdc_delta_report(store, arrived(), workdir=wd, fault=_fail_once_at(1))
    # garbage partial output of the crashed batch — must be overwritten
    spark.createDataFrame(
        [(999, "srcA", "added")], "doc_id bigint, source string, delta string"
    ).write.mode("overwrite").parquet(
        os.path.join(wd, "verdicts", "batch_id=1")
    )
    replayed = {
        (r.source, r.delta): r.n_docs
        for r in cdc_delta_report(store, arrived(), workdir=wd).collect()
    }
    assert replayed == expected
    assert sum(n for (_, d), n in replayed.items() if d == "removed") == 1


def test_keep_list_labels_exactly_once_under_replay(spark, tmp_path):
    from streamprocessors_spark.plans.streaming_queries import (
        _incremental_keep_list_labels,
    )

    # identical texts -> every candidate pair passes the Jaccard verify
    sh = F.array(*[F.lit(w) for w in ("a b c", "b c d", "c d e")])
    shingles = spark.range(1, 7).select(
        F.col("id").alias("doc_id"), sh.alias("sh")
    )
    src = str(tmp_path / "pairs")
    pair_schema = "doc_a bigint, doc_b bigint"
    for pa, pb in ((1, 2), (3, 4), (1, 3)):
        spark.createDataFrame([(pa, pb)], pair_schema).coalesce(
            1
        ).write.mode("append").parquet(src)
    pair_stream = lambda: (  # noqa: E731
        spark.readStream.schema(pair_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    expected = {
        (r.doc_id, r.canonical)
        for r in _incremental_keep_list_labels(
            pair_stream(), shingles
        ).collect()
    }
    assert expected == {(1, 1), (2, 1), (3, 1), (4, 1)}

    wd = str(tmp_path / "wd")
    with pytest.raises(StreamingQueryException):
        _incremental_keep_list_labels(
            pair_stream(), shingles, workdir=wd, fault=_fail_once_at(1)
        )
    # poisoned label snapshot of the crashed batch: the replay must
    # rebuild from batch 0's labels, then overwrite this
    spark.createDataFrame(
        [(999, 999)], "doc_id bigint, canonical bigint"
    ).write.mode("overwrite").parquet(
        os.path.join(wd, "labels", "batch_id=1")
    )
    labels = _incremental_keep_list_labels(pair_stream(), shingles, workdir=wd)
    assert {(r.doc_id, r.canonical) for r in labels.collect()} == expected


# ---------------------------------------------------------------------------
# property test: the recovery protocol under ARBITRARY crash schedules
# ---------------------------------------------------------------------------


def _run_protocol(batches, crash_points, workdir):
    """Drive the snapshot/recover protocol over a deterministic fold
    (state = running per-source sums), crashing wherever ``crash_points``
    says, restarting with a FRESH state dict each time (a new driver).
    Crash point (batch_idx, phase): phase 0 = before any write (replay
    recomputes everything), phase 1 = after the output write but before
    the snapshot, phase 2 = after the snapshot but before the streaming
    commit. Returns (final_state, outputs) where outputs is the
    per-batch_id last-written output dir content (simulated as a dict on
    disk via the real snapshot files plus an out_{id}.json)."""
    import json as _json

    init = {"sums": {}}
    outputs: dict[int, dict] = {}
    crashes = dict(crash_points)  # (batch_idx) -> phase, fire once
    state: dict = {}
    i = 0
    while i < len(batches):
        XO.recover_state(state, i, workdir, init)
        phase = crashes.pop(i, None)
        if phase == 0:
            state = {}  # driver dies before doing anything
            continue  # restart replays batch i
        sums = dict(state["sums"])
        for src, v in batches[i]:
            sums[src] = sums.get(src, 0) + v
        # output write (idempotent overwrite by batch id)
        outputs[i] = dict(sums)
        with open(os.path.join(workdir, f"out_{i}.json"), "w") as fh:
            _json.dump(sums, fh)
        if phase == 1:
            state = {}
            continue
        XO.write_state_snapshot(workdir, i, {"sums": sums})
        if phase == 2:
            state = {}
            continue
        state["sums"] = sums
        XO.mark_done(state, i)
        i += 1  # streaming commit: only now does the batch advance
    return state


def test_recovery_protocol_random_crash_schedules(tmp_path):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    batch_strategy = st.lists(
        st.lists(
            st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(-5, 9)),
            max_size=3,
        ),
        min_size=1,
        max_size=6,
    )
    crash_strategy = st.dictionaries(
        st.integers(0, 5), st.integers(0, 2), max_size=4
    )

    @settings(max_examples=60, deadline=None)
    @given(batches=batch_strategy, crashes=crash_strategy)
    def run(batches, crashes):
        import shutil
        import tempfile

        crashes = {k: v for k, v in crashes.items() if k < len(batches)}
        wd_clean = tempfile.mkdtemp(dir=str(tmp_path))
        wd_crash = tempfile.mkdtemp(dir=str(tmp_path))
        try:
            clean = _run_protocol(batches, {}, wd_clean)
            crashed = _run_protocol(batches, crashes, wd_crash)
            # the final folded state is crash-schedule-independent
            assert crashed["sums"] == clean["sums"]
            # ... and so is every batch's (last-written) output
            import json as _json

            for i in range(len(batches)):
                with open(os.path.join(wd_clean, f"out_{i}.json")) as fh:
                    c = _json.load(fh)
                with open(os.path.join(wd_crash, f"out_{i}.json")) as fh:
                    x = _json.load(fh)
                assert c == x, f"batch {i} output diverged"
        finally:
            shutil.rmtree(wd_clean, ignore_errors=True)
            shutil.rmtree(wd_crash, ignore_errors=True)

    run()


def test_cdc_continuous_trigger_kill_restart(spark, tmp_path):
    """Exactly-once under a CONTINUOUS trigger (the deployment mode, not
    just availableNow): start the CDC sink at processingTime, feed two
    shards, hard-stop the query mid-stream (driver kill), add more
    shards, restart on the same workdir, finish with availableNow, and
    drain — the rollup must equal the clean single-run result."""
    import time

    from streamprocessors_spark.plans.streaming_queries import (
        cdc_delta_report,
        cdc_drain,
        cdc_start,
    )

    docs, _ = _shard_docs(spark, tmp_path / "ref")
    store = (
        docs.where("doc_id <= 6")
        .selectExpr(
            "doc_id as id0",
            "source as src0",
            "case when doc_id = 3 then 'old-content'"
            " else md5(text) end as h0",
        )
        .localCheckpoint()
    )
    src = str(tmp_path / "feed")
    schema = docs.schema

    def feed(lo, hi):
        docs.where(F.col("doc_id").between(lo, hi)).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def stream():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

    feed(2, 3)
    feed(4, 5)
    expected = {
        (r.source, r.delta): r.n_docs
        for r in cdc_delta_report(store, stream()).collect()
    }
    # reset the feed for the live run (fresh dir)
    import shutil

    shutil.rmtree(src)
    wd = str(tmp_path / "wd")
    feed(2, 3)
    q = cdc_start(store, stream(), wd, trigger={"processingTime": "300 milliseconds"})
    deadline = time.monotonic() + 60
    while time.monotonic() < deadline and not q.recentProgress:
        time.sleep(0.2)
    feed(4, 5)
    time.sleep(1.2)  # let some (possibly all) of shard 2 commit
    q.stop()  # driver kill mid-stream
    # restart on the same workdir; availableNow finishes the backlog
    q2 = cdc_start(store, stream(), wd)
    q2.awaitTermination()
    got = {
        (r.source, r.delta): r.n_docs
        for r in cdc_drain(spark, store, wd).collect()
    }
    assert got == expected
