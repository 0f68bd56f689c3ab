"""Invariant tests for the training-data prep operators (textprep.py) —
the DuckDB oracles pin exact values at the driver gate; these pin the
ALGEBRAIC properties on adversarial corpora the gate corpus lacks."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from harvesting_validator_spark.queries.textprep import (
    CHUNK_STRIDE,
    CHUNK_TOKENS,
    PACK_BIN_TOKENS,
    q_chunk_documents,
    q_pack_sequences,
    q_stratified_sample,
)


def _write_docs(spark, tmp_path, texts, langs=None):
    sf_dir = str(tmp_path / "sf")
    rows = [
        (i, t, (langs[i] if langs else "en"), "synth", len(t))
        for i, t in enumerate(texts)
    ]
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")
    return sf_dir


def test_chunks_reconstruct_documents(spark, tmp_path):
    """Every doc reassembles exactly from its chunks: chunk 0's tokens +
    each later chunk's tokens beyond the overlap == the original token
    stream. Covers short docs (single chunk), boundary lengths (exact
    multiples of stride/size), and empty text."""
    rng = random.Random(3)
    texts = [
        " ".join(f"t{rng.randint(0, 50)}" for _ in range(n))
        for n in [1, 5, CHUNK_STRIDE, CHUNK_TOKENS, CHUNK_TOKENS + 1,
                  2 * CHUNK_STRIDE, 97, 200]
    ] + [""]
    sf_dir = _write_docs(spark, tmp_path, texts)
    rows = q_chunk_documents(spark, sf_dir).collect()

    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(range(len(texts)))  # every doc emits chunks
    overlap = CHUNK_TOKENS - CHUNK_STRIDE
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r.chunk_idx)
        assert [c.chunk_idx for c in chunks] == list(range(len(chunks)))
        toks: list[str] = []
        for c in chunks:
            ctoks = c.chunk_text.split(" ")
            assert len(ctoks) == c.n_chunk_tokens <= CHUNK_TOKENS
            # chunk i starts at i*stride, so beyond chunk 0 the first
            # `overlap` tokens repeat the previous chunk's tail
            toks.extend(ctoks[overlap:] if c.chunk_idx else ctoks)
        assert toks == texts[doc_id].split(" ")


def test_pack_bins_respect_budget_and_order(spark, tmp_path):
    """Within a stratum, bin ids are nondecreasing in doc order and each
    doc's bin is exactly its start-offset window."""
    rng = random.Random(5)
    langs = [rng.choice(["en", "de"]) for _ in range(60)]
    texts = [" ".join("w" for _ in range(rng.randint(1, 300))) for _ in range(60)]
    sf_dir = _write_docs(spark, tmp_path, texts, langs)
    rows = q_pack_sequences(spark, sf_dir).collect()
    per_lang: dict[str, list] = {}
    for r in rows:
        per_lang.setdefault(r.lang, []).append(r)
    for lang, rs in per_lang.items():
        rs.sort(key=lambda r: r.doc_id)
        offset = 0
        for r in rs:
            assert r.bin_start_offset == offset
            assert r.bin_id == offset // PACK_BIN_TOKENS
            offset += r.n_tokens


def test_stratified_sample_is_deterministic_and_stratified(spark, tmp_path):
    texts = ["w" for _ in range(400)]
    langs = (["en"] * 200) + (["zh"] * 200)
    sf_dir = _write_docs(spark, tmp_path, texts, langs)
    a = {r.doc_id for r in q_stratified_sample(spark, sf_dir).collect()}
    b = {r.doc_id for r in q_stratified_sample(spark, sf_dir).collect()}
    assert a == b  # resumable mixing: identical selection every run
    n_en = sum(1 for d in a if d < 200)
    n_zh = len(a) - n_en
    # md5 buckets are uniform-ish: en at 80% and zh at 20% must separate
    assert n_en > 200 * 0.6 and n_zh < 200 * 0.4
