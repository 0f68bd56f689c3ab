"""Streaming incremental KG canonicalization (foreachBatch +
merge_components): the mapping after N micro-batches equals the one-shot
batch union-find over everything that streamed in — including merges
that span batches (an entity in batch 3 bridging two components built in
batches 1 and 2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from harvesting_validator_spark.sources.synthetic import (
    generate_chain_sources,
    generate_entity_sources,
)
from harvesting_validator_spark.streaming.canonical import canonicalize_stream
from harvesting_validator_spark.streaming.micro_batch import SOURCE_SCHEMA


def _drain(spark, landing, wh, cp):
    stream = spark.readStream.schema(SOURCE_SCHEMA).option(
        "maxFilesPerTrigger", "1"
    ).parquet(landing)
    q = canonicalize_stream(stream, wh, cp)
    assert q.awaitTermination(240), "stream did not drain in time"


def _batch_truth(spark, sources):
    from harvesting_validator_spark.kg.canonicalize import canonical_mapping
    from harvesting_validator_spark.kg.linking import (
        block_candidates_by_key,
        extract_mentions,
        link_edges,
    )
    from harvesting_validator_spark.kg.normalize import normalize_triples
    from harvesting_validator_spark.sources.rdf_parse import (
        parse_sources_to_triples,
    )

    mentions = extract_mentions(
        normalize_triples(parse_sources_to_triples(sources))
    )
    edges = link_edges(block_candidates_by_key(mentions), threshold=0.9)
    return canonical_mapping(mentions.select("entity"), edges)


def test_streaming_canonicalization_equals_batch(spark, tmp_path):
    landing = str(tmp_path / "landing")
    wh = str(tmp_path / "wh")
    cp = str(tmp_path / "cp")

    # chain corpus: doc i links entity i to i+1 within chains of 6 —
    # components only COMPLETE once several batches have streamed in, so
    # the incremental path must merge across micro-batches
    corpus = generate_chain_sources(spark, 36, chain_len=6).persist()
    corpus.count()

    # three landings, each drained as its own set of micro-batches
    thirds = [
        corpus.filter(F.col("path").rlike(r"/e([0-9]|1[01])\.ttl$")),      # 0-11
        corpus.filter(F.col("path").rlike(r"/e(1[2-9]|2[0-3])\.ttl$")),    # 12-23
        corpus.filter(F.col("path").rlike(r"/e(2[4-9]|3[0-5])\.ttl$")),    # 24-35
    ]
    assert sum(t.count() for t in thirds) == 36
    for t in thirds:
        t.write.mode("append").parquet(landing)
        _drain(spark, landing, wh, cp)

    got = {
        (r.entity, r.canonical)
        for r in spark.read.parquet(f"{wh}/_stream_mapping").collect()
    }
    want = {(r.entity, r.canonical) for r in _batch_truth(spark, corpus).collect()}
    assert got == want
    # 36 docs / chains of 6 -> 6 components, canonical = chain head
    canons = {c for _, c in got}
    assert canons == {
        f"http://example.com/ns#E{6 * k:06d}" for k in range(6)
    }
    corpus.unpersist()


def test_streaming_canonicalization_replay_idempotent(spark, tmp_path):
    """Re-draining the same landing dir with a FRESH checkpoint (a full
    at-least-once replay of every batch) leaves the mapping unchanged."""
    landing = str(tmp_path / "landing")
    wh = str(tmp_path / "wh")

    corpus = generate_entity_sources(spark, 30, n_entities=5)
    corpus.write.mode("append").parquet(landing)
    _drain(spark, landing, wh, str(tmp_path / "cp1"))
    first = {
        (r.entity, r.canonical)
        for r in spark.read.parquet(f"{wh}/_stream_mapping").collect()
    }
    _drain(spark, landing, wh, str(tmp_path / "cp2"))  # full replay
    second = {
        (r.entity, r.canonical)
        for r in spark.read.parquet(f"{wh}/_stream_mapping").collect()
    }
    assert first == second
    assert len({c for _, c in first}) == 5


def test_mapping_swap_crash_window_preserves_history(spark, tmp_path):
    """ADVICE r4 #1: a crash between write_mapping's two renames must
    never lose the historical mapping — mapping() falls back to the
    .bak copy, and an at-least-once replay of the batch folds into the
    FULL history (then the next successful swap clears the backup)."""
    from harvesting_validator_spark import fs
    from harvesting_validator_spark.streaming.canonical import (
        CanonicalStreamState,
    )

    wh = str(tmp_path / "wh")
    state = CanonicalStreamState(spark, wh)
    m1 = spark.createDataFrame(
        [("e1", "c1"), ("e2", "c1")], "entity string, canonical string"
    )
    state.write_mapping(m1)
    assert not fs.exists(spark, state.mapping_path + ".bak")

    # simulate the crash window: primary renamed aside, new one not in
    fs.rename(spark, state.mapping_path, state.mapping_path + ".bak")
    got = {(r.entity, r.canonical) for r in state.mapping().collect()}
    assert got == {("e1", "c1"), ("e2", "c1")}, "backup fallback lost history"

    # the replayed batch merges against the FULL history and swaps clean
    m2 = state.mapping().unionByName(
        spark.createDataFrame([("e3", "c3")], "entity string, canonical string")
    )
    state.write_mapping(m2)
    assert not fs.exists(spark, state.mapping_path + ".bak")
    final = {(r.entity, r.canonical) for r in state.mapping().collect()}
    assert final == {("e1", "c1"), ("e2", "c1"), ("e3", "c3")}
