"""Durable per-corpus stores (VERDICT r11 #2): the band store, keep-list
labels, pair tables, and IVF index are written once as parquet and loaded
from disk by LATER SESSIONS — a recrawl increment in a fresh session must
not re-derive the v0 artifacts from the v0 corpus.

The cross-session pin runs two real subprocesses (two separate JVMs /
SparkSessions) against one store directory: session A builds + commits
the stores while answering the queries; session B asserts the stores are
already committed BEFORE running anything, pins that the store frames'
physical plans scan ONLY the store directories (no documents/embeddings
scan), and must produce identical result hashes.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

from tests.conftest import REPO_ROOT

_PHASE_SCRIPT = r"""
import hashlib, json, os, sys
store_dir, phase = sys.argv[1], sys.argv[2]
os.environ["SPARK_GRAFT_STORE_DIR"] = store_dir
sf = "/root/testdata/sf0.001"
from pyspark.sql import SparkSession
spark = (
    SparkSession.builder.master("local[4]")
    .appName("durable-" + phase)
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "8")
    .getOrCreate()
)
from streamprocessors_spark import plans, storage
plans.load_all()


def hsh(df):
    rows = sorted(map(repr, df.collect()))
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def plan_str(df):
    return spark._jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


if phase == "B":
    # 1. every store this session needs was committed by session A
    for name in ("snapshot_band_store", "snapshot_v0_labels", "ivf_index"):
        p = storage.store_path(sf, name)
        assert os.path.isfile(os.path.join(p, "_SUCCESS")), f"missing {name}"

    # 2. the hard pin: any store BUILD in this session is a failure —
    #    loading the committed artifact must never re-derive it from
    #    the v0 corpus (the one scan the durable store exists to avoid)
    def _no_build(sf_dir, names):
        raise RuntimeError(f"session B re-derived {names} from {sf_dir}")

    storage._ON_BUILD = _no_build
    # 3. the loaded store frames never reference the corpus tables
    from streamprocessors_spark.plans import llm_ops
    from streamprocessors_spark.plans.advanced import _cached_snapshot_store
    from streamprocessors_spark.session import read_table

    docs = read_table(spark, sf, "documents")
    band_store, v0_labels = _cached_snapshot_store(spark, sf, docs, 8)
    for name, df in (
        ("snapshot_band_store", band_store),
        ("snapshot_v0_labels", v0_labels),
    ):
        p = plan_str(df)
        assert "documents" not in p, f"{name} rescans the corpus:\n{p}"
    e = llm_ops._embs(spark, sf).selectExpr(
        "vec_id",
        "embedding",
        f"{llm_ops.D.dot_double(llm_ops.SPARK, 'embedding', 'embedding')} as qnorm",
    )
    idx = llm_ops._ivf_stored_index(spark, sf, e, llm_ops._ivf_cents(e))
    p = plan_str(idx)
    assert "embeddings" not in p, f"ivf_index rescans the corpus:\n{p}"

out = {
    "snapshot_incremental_dedup": hsh(
        plans.REGISTRY["snapshot_incremental_dedup"].fn(spark, sf)
    ),
    "ann_ivf_append": hsh(plans.REGISTRY["ann_ivf_append"].fn(spark, sf)),
}
print("RESULT " + json.dumps(out))
"""


def _run_phase(store_dir: str, phase: str) -> dict:
    proc = subprocess.run(
        [sys.executable, "-c", _PHASE_SCRIPT, store_dir, phase],
        cwd=REPO_ROOT,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, (
        f"phase {phase} failed:\n{proc.stdout[-3000:]}\n{proc.stderr[-3000:]}"
    )
    lines = [l for l in proc.stdout.splitlines() if l.startswith("RESULT ")]
    assert lines, proc.stdout[-2000:]
    return json.loads(lines[-1][len("RESULT "):])


def test_stores_survive_session_restart(tmp_path):
    store_dir = str(tmp_path / "stores")
    a = _run_phase(store_dir, "A")
    b = _run_phase(store_dir, "B")
    assert a == b, f"cross-session hash drift: {a} vs {b}"


def test_write_store_is_write_once_and_atomic(spark, tmp_path):
    from streamprocessors_spark import storage

    path = str(tmp_path / "store-v1")
    df1 = spark.createDataFrame([(1, 10), (2, 20)], "k int, v int")
    storage.write_store(df1, path, sort_by=("k",))
    assert storage._committed(path)
    # write-once: a second write with different content is a no-op
    df2 = spark.createDataFrame([(9, 90)], "k int, v int")
    storage.write_store(df2, path, sort_by=("k",))
    got = sorted(tuple(r) for r in spark.read.parquet(path).collect())
    assert got == [(1, 10), (2, 20)]
    # no staging litter
    litter = [d for d in os.listdir(str(tmp_path)) if d.startswith("_stage_")]
    assert litter == []


def test_write_store_replaces_uncommitted_leftover(spark, tmp_path):
    """A crashed writer leaves a dest dir without _SUCCESS; the next
    builder must replace it, not trust it."""
    from streamprocessors_spark import storage

    path = str(tmp_path / "store-v1")
    os.makedirs(path)
    with open(os.path.join(path, "part-garbage.parquet"), "w") as fh:
        fh.write("torn")
    df = spark.createDataFrame([(1, 10)], "k int, v int")
    storage.write_store(df, path)
    assert storage._committed(path)
    assert [tuple(r) for r in spark.read.parquet(path).collect()] == [(1, 10)]


def test_corpus_fingerprint_tracks_table_files(tmp_path):
    """Same path + same files -> same fingerprint (cross-session reuse);
    a regenerated table (new mtime) -> new fingerprint (no stale store)."""
    from streamprocessors_spark import storage

    d = tmp_path / "sf"
    d.mkdir()
    t = d / "documents.parquet"
    t.write_bytes(b"x" * 10)
    f1 = storage.corpus_fingerprint(str(d))
    assert f1 == storage.corpus_fingerprint(str(d))
    os.utime(str(t), ns=(1, 1))
    f2 = storage.corpus_fingerprint(str(d))
    assert f1 != f2
    (d / "notes.txt").write_text("ignored")
    assert f2 == storage.corpus_fingerprint(str(d))


def test_store_path_carries_format_version(tmp_path, monkeypatch):
    from streamprocessors_spark import storage

    monkeypatch.setenv("SPARK_GRAFT_STORE_DIR", str(tmp_path))
    p = storage.store_path("/root/testdata/sf0.001", "text_pairs")
    assert p.startswith(str(tmp_path))
    assert p.endswith(f"text_pairs-{storage.STORE_FORMAT}")


def test_gc_drops_only_same_corpus_stale_fingerprints(tmp_path, monkeypatch):
    """A regenerated corpus re-fingerprints; the first build under the
    new fingerprint collects the old one's dirs — but never another
    corpus's stores, and never an unclaimed dir."""
    from streamprocessors_spark import storage

    monkeypatch.setenv("SPARK_GRAFT_STORE_DIR", str(tmp_path))
    corpus_a = tmp_path / "corpusA"
    corpus_a.mkdir()
    (corpus_a / "documents.parquet").write_bytes(b"v1")
    fp_old = storage.corpus_fingerprint(str(corpus_a))
    storage._claim_fingerprint(str(corpus_a), fp_old)
    # a different corpus's claimed dir and an unclaimed dir must survive
    storage._claim_fingerprint("/elsewhere/corpusB", "bbbb")
    os.makedirs(str(tmp_path / "unclaimed"))
    # regenerate corpus A -> new fingerprint
    os.utime(str(corpus_a / "documents.parquet"), ns=(5, 5))
    fp_new = storage.corpus_fingerprint(str(corpus_a))
    assert fp_new != fp_old
    storage._gc_stale_fingerprints(str(corpus_a), fp_new)
    left = set(os.listdir(str(tmp_path))) - {"corpusA"}
    assert fp_old not in left
    assert {"bbbb", "unclaimed"} <= left
