"""Per-row content sha256 invariant vs the source table (BASELINE.json
input_hint; SURVEY.md §5 test 6)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from harvesting_validator_spark.plans.pipeline import (
    add_doc_id,
    content_sha_invariant,
)
from harvesting_validator_spark.sources.synthetic import generate_sources


def test_sha_matches_python_reference(spark):
    sources = generate_sources(spark, 64)
    inv = {r.doc_id: r.content_sha256 for r in content_sha_invariant(sources).collect()}
    for r in add_doc_id(sources).collect():
        assert inv[r.doc_id] == hashlib.sha256(r.content.encode()).hexdigest()


def test_invariant_detects_mutation(spark):
    sources = add_doc_id(generate_sources(spark, 32)).persist()
    recorded = content_sha_invariant(sources)

    mutated = sources.withColumn(
        "content",
        F.when(F.col("doc_id").substr(1, 1) == "a",
               F.concat(F.col("content"), F.lit("TAMPERED")))
        .otherwise(F.col("content")),
    )
    rederived = content_sha_invariant(mutated).withColumnRenamed(
        "content_sha256", "rederived_sha"
    )
    diff = (
        recorded.join(rederived, "doc_id")
        .filter(F.col("content_sha256") != F.col("rederived_sha"))
        .count()
    )
    expected = sources.filter(F.col("doc_id").substr(1, 1) == "a").count()
    assert diff == expected and expected > 0
    sources.unpersist()
