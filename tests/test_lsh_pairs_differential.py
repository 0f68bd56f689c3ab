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


# --- r6: class-level + bitmap verified pairs --------------------------------------
def _reference_verified(spark, sf_dir):
    """The r5 formulation: per-DOC-pair array_intersect on candidates."""
    from harvesting_validator_spark.queries.common import dround, md5_int, tbl, tokens

    pairs = q_minhash_lsh_pairs(spark, sf_dir)
    d = (
        tbl(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.array_distinct(F.transform(tokens(), md5_int)).alias("toks"),
        )
        .withColumn("n_toks", F.size("toks"))
    )
    j = pairs.join(d.alias("da"), pairs.doc_a == F.col("da.doc_id")).join(
        d.alias("db"), pairs.doc_b == F.col("db.doc_id")
    )
    inter = F.size(F.array_intersect(F.col("da.toks"), F.col("db.toks")))
    uni = F.col("da.n_toks") + F.col("db.n_toks") - inter
    jac = dround(inter.cast("double") / uni, 6)
    return j.select("doc_a", "doc_b", jac.alias("jaccard")).filter(
        F.col("jaccard") >= 0.7
    )


def _verified_rows(df):
    return sorted((r.doc_a, r.doc_b, r.jaccard) for r in df.collect())


def _adversarial_texts(vocab_size: int, n_docs: int, seed: int):
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(vocab_size)]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 10)))
        for _ in range(n_docs)
    ]
    # exact duplicates (intra-class pairs, jaccard 1.0), near-identical
    # docs, singleton tokens, empty text
    texts += [texts[0]] * 3 + [texts[1] + " " + vocab[0], "w0", ""]
    return texts


def test_class_bitmap_verified_equals_per_doc_reference(spark, tmp_path):
    """r6 rewrite guard: token-set classes + dictionary-bitmap intersects
    must reproduce the per-doc-pair array_intersect formulation exactly —
    including diagonal (duplicate-doc) pairs and the rounded jaccard."""
    from harvesting_validator_spark.queries.dedup import q_lsh_verified_pairs

    texts = _adversarial_texts(vocab_size=12, n_docs=120, seed=11)
    sf_dir = _write_docs(spark, tmp_path, texts)
    new = _verified_rows(q_lsh_verified_pairs(spark, sf_dir))
    ref = _verified_rows(_reference_verified(spark, sf_dir))
    assert new == ref
    assert new, "collision-heavy corpus must produce verified pairs"


def test_class_fallback_verified_equals_per_doc_reference(spark, tmp_path):
    """A >256-token vocabulary must overflow the bitmap dictionary and
    take the array_intersect fallback — with identical results."""
    import harvesting_validator_spark.queries.dedup as dedup_mod

    texts = _adversarial_texts(vocab_size=400, n_docs=150, seed=13)
    # force near-dup density despite the big vocab: clone a few docs
    texts += texts[:10]
    sf_dir = _write_docs(spark, tmp_path, texts)
    vocab = dedup_mod._bitmap_vocab(dedup_mod._token_classes(spark, sf_dir))
    assert vocab is None, "400-token vocab must reject the bitmap path"
    new = _verified_rows(dedup_mod.q_lsh_verified_pairs(spark, sf_dir))
    ref = _verified_rows(_reference_verified(spark, sf_dir))
    assert new == ref
    assert new
