"""Bucketed-table co-located join (the 100 TB join strategy, SURVEY §7.2 m8).

At scale the embedding corpus is written ONCE bucketed by the sign-LSH
bucket; every subsequent candidate join then reads co-located buckets with
no shuffle on the corpus side. This test materializes a bucketed table and
asserts the join plan really is exchange-free on both sides — the property
that turns repeated ANN/dedup passes from shuffle-bound to scan-bound.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from streamprocessors_spark.functions import vectors as V
from streamprocessors_spark.functions.dialect import SPARK
from streamprocessors_spark.session import read_table


@pytest.fixture()
def bucketed_embeddings(spark, sf_dir, tmp_path):
    name = "emb_bucketed_test"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    (
        read_table(spark, sf_dir, "embeddings")
        .selectExpr("vec_id", "embedding", f"{V.sign_bucket(SPARK, 'embedding')} as bucket")
        .write.bucketBy(8, "bucket")
        .sortBy("bucket", "vec_id")
        .format("parquet")
        # external table at an explicit temp path (warehouse dir is a
        # static conf on the shared session)
        .option("path", str(tmp_path / "emb_bucketed"))
        .saveAsTable(name)
    )
    yield name
    spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_self_join_has_no_exchange(spark, bucketed_embeddings):
    t = spark.table(bucketed_embeddings)
    # merge hint: the fixture table is tiny so Spark would broadcast it,
    # hiding the co-location property this pins (at real scale the corpus
    # is never broadcastable — SMJ/SHJ is the only option)
    a = t.hint("merge").select(F.col("vec_id").alias("va"), F.col("bucket"))
    b = t.hint("merge").select(
        F.col("vec_id").alias("vb"), F.col("bucket").alias("bucket_b")
    )
    j = a.join(b, (a.bucket == b.bucket_b) & (F.col("va") < F.col("vb")))
    plan = spark._jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        j._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan, plan[:1500]
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert j.count() > 0
