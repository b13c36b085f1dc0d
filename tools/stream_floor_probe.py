"""Round-13 measurement: decompose the availableNow micro-batch floor.

Times, warm (min-of-3 after one warm-up), under the bench session config:
 - schema probe: spark.read.parquet(path).schema            (per stream_* call)
 - trivial availableNow stream: readStream -> select -> memory sink
 - the same with a pre-resolved schema (no probe)
 - stateless agg stream (complete mode)
 - stateful applyInPandasWithState stream (floor incl. Python worker)
 - foreachBatch no-op stream

Usage: python tools/stream_floor_probe.py
"""

from __future__ import annotations

import os
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _min3(fn):
    fn()
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return round(min(ts), 3)


def main() -> None:
    from pyspark.sql import functions as F

    from streamprocessors_spark.session import get_spark

    spark = get_spark(
        app_name="stream-floor-probe",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.range(1_000_000).selectExpr("sum(id*2)").collect()
    path = os.path.join(SF_DIR, "documents.parquet")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    results = {}

    def probe_schema():
        spark.read.parquet(path).schema

    results["schema_probe"] = _min3(probe_schema)

    schema = spark.read.parquet(path).schema

    def stage_dir() -> str:
        d = tempfile.mkdtemp(prefix="spgraft_src_")
        os.symlink(
            os.path.abspath(path), os.path.join(d, os.path.basename(path))
        )
        return d

    def run(stream_df, mode="append"):
        name = f"sink_{uuid.uuid4().hex[:12]}"
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(mode)
            .option(
                "checkpointLocation", tempfile.mkdtemp(prefix="spgraft_ckpt_")
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        spark.table(name).count()

    def trivial_with_probe():
        sch = spark.read.parquet(path).schema
        df = spark.readStream.schema(sch).parquet(stage_dir())
        run(df.select("doc_id"))

    results["trivial_stream_with_probe"] = _min3(trivial_with_probe)

    def trivial_no_probe():
        df = spark.readStream.schema(schema).parquet(stage_dir())
        run(df.select("doc_id"))

    results["trivial_stream_no_probe"] = _min3(trivial_no_probe)

    def agg_complete():
        df = spark.readStream.schema(schema).parquet(stage_dir())
        run(df.groupBy("source").count(), mode="complete")

    results["agg_complete_stream"] = _min3(agg_complete)

    def stateful():
        import pandas as pd  # noqa: F401
        from pyspark.sql.streaming.state import GroupStateTimeout

        df = spark.readStream.schema(schema).parquet(stage_dir())

        def fn(key, pdfs, state):
            n = 0
            for pdf in pdfs:
                n += len(pdf)
            state.update((n,))
            import pandas as pd

            yield pd.DataFrame({"g": [key[0]], "n": [n]})

        g = (
            df.select(
                (F.col("doc_id") % 32).alias("g").cast("long"), "doc_id"
            )
            .groupBy("g")
            .applyInPandasWithState(
                fn,
                "g long, n long",
                "n long",
                "append",
                GroupStateTimeout.NoTimeout,
            )
        )
        run(g)

    results["stateful_pandas_stream"] = _min3(stateful)

    def feb_noop():
        df = spark.readStream.schema(schema).parquet(stage_dir())

        def process(bdf, bid):
            bdf.count()

        q = (
            df.select("doc_id")
            .writeStream.foreachBatch(process)
            .outputMode("append")
            .option(
                "checkpointLocation", tempfile.mkdtemp(prefix="spgraft_ckpt_")
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    results["foreachbatch_count_stream"] = _min3(feb_noop)

    # how many batches does a trivial availableNow run?
    name = f"sink_{uuid.uuid4().hex[:12]}"
    df = spark.readStream.schema(schema).parquet(stage_dir())
    q = (
        df.select("doc_id")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="spgraft_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    results["n_batches_trivial"] = len(q.recentProgress)
    results["batch_durations_ms"] = [
        p["durationMs"] for p in q.recentProgress
    ]

    print(results)
    spark.stop()


if __name__ == "__main__":
    main()
