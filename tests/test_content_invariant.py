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
    # content_sha_invariant is an EDGE function: hex doc_id out; the
    # internal add_doc_id form is binary sha bytes — bridge via .hex()
    inv = {r.doc_id: r.content_sha256 for r in content_sha_invariant(sources).collect()}
    for r in add_doc_id(sources).collect():
        assert r.doc_id.hex() in inv
        assert inv[r.doc_id.hex()] == hashlib.sha256(r.content.encode()).hexdigest()


def test_invariant_detects_mutation(spark):
    sources = add_doc_id(generate_sources(spark, 32)).persist()
    recorded = content_sha_invariant(sources)

    first_hex = F.lower(F.hex(F.col("doc_id").substr(1, 1)))
    mutated = sources.withColumn(
        "content",
        F.when(first_hex < "80",  # deterministic ~half of the docs
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
    expected = sources.filter(first_hex < "80").count()
    assert diff == expected and expected > 0
    sources.unpersist()
