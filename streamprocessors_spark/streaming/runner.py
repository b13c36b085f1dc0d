"""Run a streaming DataFrame to completion and hand back a batch result.

``availableNow`` processes everything already in the source (possibly over
multiple micro-batches, honoring source rate limits) and stops — the
streaming analog of a batch run. Results land in a uniquely-named memory
sink; the caller gets a plain DataFrame, so streaming operators slot into
the same driver contract / DuckDB-oracle gate as batch ones.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession


def run_available_now(
    stream_df: DataFrame, output_mode: str = "append"
) -> DataFrame:
    """Execute a streaming DF with Trigger.AvailableNow; return the sink."""
    spark: SparkSession = stream_df.sparkSession
    name = f"sink_{uuid.uuid4().hex[:12]}"
    ckpt = tempfile.mkdtemp(prefix="spgraft_ckpt_")
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    tbl = spark.table(name)
    # No-op projection: the raw memory-sink relation (MemoryPlan) does
    # not dedup attribute ids across plan instances, so a self-join of
    # the sink (e.g. postings JOIN agg-of-postings in stream_bm25_topk)
    # dies with INTERNAL_ERROR "conflicting references in Join"; the
    # projection restores normal multi-instance resolution.
    return tbl.toDF(*tbl.columns)


def run_available_now_many(
    streams: list[tuple[DataFrame, str]],
) -> list[DataFrame]:
    """Execute several independent availableNow streaming queries
    CONCURRENTLY and return their sinks in order (guide §2.6: actions
    are only sequential because the driver calls them sequentially —
    independent queries overlap their fixed micro-batch machinery and
    back-fill each other's stage tails). Each query keeps its own
    checkpoint and memory sink; there is no cross-query state."""
    spark: SparkSession = streams[0][0].sparkSession
    started = []
    for stream_df, output_mode in streams:
        name = f"sink_{uuid.uuid4().hex[:12]}"
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option(
                "checkpointLocation", tempfile.mkdtemp(prefix="spgraft_ckpt_")
            )
            .trigger(availableNow=True)
            .start()
        )
        started.append((name, q))
    for _, q in started:
        q.awaitTermination()
    out = []
    for name, _ in started:
        tbl = spark.table(name)
        # same attribute-id dedup projection as run_available_now
        out.append(tbl.toDF(*tbl.columns))
    return out


def _stage_dir(path: str) -> str:
    """FileStreamSource ingests *directories*; expose a single fixture file
    through a temp dir of symlinks (zero-copy)."""
    import os

    d = tempfile.mkdtemp(prefix="spgraft_src_")
    os.symlink(os.path.abspath(path), os.path.join(d, os.path.basename(path)))
    return d


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events fixture (nanosecond-timestamp parquet).

    File-source streaming needs an explicit schema; we take it from a batch
    read under ``nanosAsLong`` (the events files store TIMESTAMP(NANOS),
    which the vanilla reader rejects) and restore a proper timestamp column
    afterwards — identical to session.read_table's batch normalization.
    """
    import os

    from pyspark.sql import functions as F

    path = os.path.join(sf_dir, "events.parquet")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(path).schema
    df = spark.readStream.schema(schema).parquet(_stage_dir(path))
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("`ts` div 1000")))
    elif dict(df.dtypes).get("ts") == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def stream_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    path = os.path.join(sf_dir, "documents.parquet")
    schema = spark.read.parquet(path).schema
    return spark.readStream.schema(schema).parquet(_stage_dir(path))


def stream_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    path = os.path.join(sf_dir, "embeddings.parquet")
    schema = spark.read.parquet(path).schema
    return spark.readStream.schema(schema).parquet(_stage_dir(path))
