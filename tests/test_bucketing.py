"""Bucketed co-located joins: pre-bucketing both sides of a recurring join
key eliminates the shuffle entirely (the Iceberg bucket(N, doc_id)
pattern the canonical-graph tables use at cluster scale)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir):
    # saveAsTable uses the session's default warehouse (./spark-warehouse,
    # gitignored); tables are dropped on teardown
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").withColumnRenamed(
        "vec_id", "doc_id"
    )
    spark.sql("DROP TABLE IF EXISTS docs_b")
    spark.sql("DROP TABLE IF EXISTS emb_b")
    (docs.write.bucketBy(8, "doc_id").sortBy("doc_id")
         .mode("overwrite").saveAsTable("docs_b"))
    (emb.write.bucketBy(8, "doc_id").sortBy("doc_id")
        .mode("overwrite").saveAsTable("emb_b"))
    yield spark
    spark.sql("DROP TABLE IF EXISTS docs_b")
    spark.sql("DROP TABLE IF EXISTS emb_b")


def test_bucketed_join_has_no_exchange(bucketed):
    spark = bucketed
    # disable auto-broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("docs_b").join(spark.table("emb_b"), "doc_id").select(
            "doc_id", "lang", "label"
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: zero shuffle
        assert j.count() == spark.table("docs_b").count()
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(10 * 1024 * 1024)
        )


def test_unbucketed_join_needs_exchange(bucketed, sf_dir):
    spark = bucketed
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").withColumnRenamed(
            "vec_id", "doc_id"
        )
        plan = (
            docs.join(emb, "doc_id")._jdf.queryExecution()
            .executedPlan().toString()
        )
        assert "Exchange" in plan  # the shuffle bucketing removes
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(10 * 1024 * 1024)
        )
