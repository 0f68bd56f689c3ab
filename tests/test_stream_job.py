"""End-to-end test of validate_job --stream (VERDICT r4 next-step #6):
the spark-submit surface drives the foreachBatch incremental
canonicalizer — two submissions over a growing landing dir converge to
the one-shot batch union-find mapping, and the shared checkpoint makes
each landed file processed exactly once across submissions."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from jobs.validate_job import main as job_main


def _run(capsys, *argv) -> dict:
    assert job_main(list(argv)) == 0
    out = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    return json.loads(out[-1])


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


def test_stream_job_two_submissions_equal_batch(spark, tmp_path, capsys):
    from harvesting_validator_spark.sources.synthetic import (
        generate_chain_sources,
    )

    landing = str(tmp_path / "landing")
    wh = str(tmp_path / "wh")

    # chain corpus: components only complete once both submissions have
    # drained, so the job surface must merge across runs
    corpus = generate_chain_sources(spark, 24, chain_len=6).persist()
    corpus.count()
    halves = [
        corpus.filter(F.col("path").rlike(r"/e([0-9]|1[01])\.ttl$")),   # 0-11
        corpus.filter(F.col("path").rlike(r"/e(1[2-9]|2[0-3])\.ttl$")),  # 12-23
    ]
    assert sum(h.count() for h in halves) == 24

    halves[0].write.mode("append").parquet(landing)
    res1 = _run(capsys, "--stream", "--sources", landing, "--warehouse", wh)
    assert res1["mode"] == "stream"
    assert res1["mapping_entities"] > 0

    halves[1].write.mode("append").parquet(landing)
    res2 = _run(capsys, "--stream", "--sources", landing, "--warehouse", wh)

    got = {
        (r.entity, r.canonical)
        for r in spark.read.parquet(f"{wh}/_stream_mapping").collect()
    }
    want = {
        (r.entity, r.canonical) for r in _batch_truth(spark, corpus).collect()
    }
    assert got == want
    # 24 docs / chains of 6 -> 4 components, canonical = chain head
    assert res2["components"] == 4
    assert {c for _, c in got} == {
        f"http://example.com/ns#E{6 * k:06d}" for k in range(4)
    }
    corpus.unpersist()

    # the checkpoint is shared, so a third submission with NO new files
    # is a no-op drain: the mapping is unchanged
    res3 = _run(capsys, "--stream", "--sources", landing, "--warehouse", wh)
    assert res3["mapping_entities"] == res2["mapping_entities"]
    assert res3["components"] == 4
    again = {
        (r.entity, r.canonical)
        for r in spark.read.parquet(f"{wh}/_stream_mapping").collect()
    }
    assert again == got


def test_stream_job_rejects_synthetic_sources(spark):
    import pytest

    with pytest.raises(SystemExit):
        job_main(["--stream", "--sources", "synthetic:10",
                  "--warehouse", "/tmp/x"])
