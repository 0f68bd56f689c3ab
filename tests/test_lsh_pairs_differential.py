"""Differential guard for the shuffle-free LSH candidate generation.

q_minhash_lsh_pairs emits each pair exactly once at its FIRST shared band
(an unrolled codegen filter) instead of band-join + .distinct(). The pair
SET must be identical to the straightforward distinct formulation on any
corpus — including adversarial shapes: exact duplicates (all bands
collide), singletons, empty strings, and high-collision tiny vocabularies.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from harvesting_validator_spark.queries.dedup import (
    N_BANDS,
    _band_table,
    q_minhash_lsh_pairs,
)


def _reference_pairs(spark, sf_dir):
    """The r2 formulation: band-hash self-join + distinct."""
    b = _band_table(spark, sf_dir)
    a, c = b.alias("a"), b.alias("b")
    return (
        a.join(
            c,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def _write_docs(spark, tmp_path, texts):
    sf_dir = str(tmp_path / "sf")
    rows = [(i, t, "en", "synth", len(t)) for i, t in enumerate(texts)]
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")
    return sf_dir


def test_first_band_emission_equals_distinct(spark, tmp_path):
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(12)]  # tiny vocab -> heavy collisions
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 10)))
        for _ in range(120)
    ]
    # adversarial shapes: exact duplicates (collide in ALL bands),
    # singleton token docs, empty text
    texts += [texts[0]] * 3 + ["w0", ""]
    sf_dir = _write_docs(spark, tmp_path, texts)

    fast = {(r.doc_a, r.doc_b) for r in q_minhash_lsh_pairs(spark, sf_dir).collect()}
    ref = {(r.doc_a, r.doc_b) for r in _reference_pairs(spark, sf_dir).collect()}
    assert fast == ref
    assert fast, "collision-heavy corpus must produce candidate pairs"
    # each pair exactly once (set compare can hide duplicates)
    rows = q_minhash_lsh_pairs(spark, sf_dir).collect()
    assert len(rows) == len(fast)


def test_first_band_no_pairs_on_disjoint_vocab(spark, tmp_path):
    # each doc has a unique vocabulary -> no band can collide across docs
    texts = [f"u{i}a u{i}b u{i}c" for i in range(N_BANDS * 10)]
    sf_dir = _write_docs(spark, tmp_path, texts)
    assert q_minhash_lsh_pairs(spark, sf_dir).count() == 0
