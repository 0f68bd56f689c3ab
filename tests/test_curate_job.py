"""End-to-end test of the curate_job spark-submit entrypoint (in-process:
SparkSession.builder.getOrCreate attaches to the test session)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from jobs.curate_job import main as curate_main


def _run(capsys, *argv) -> dict:
    assert curate_main(list(argv)) == 0
    out = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    return json.loads(out[-1])


def test_curate_job_end_to_end(spark, sf_dir, tmp_path, capsys):
    from harvesting_validator_spark.queries.textprep import q_curated_corpus

    wh = str(tmp_path / "wh")
    res = _run(capsys, "--documents", sf_dir, "--warehouse", wh,
               "--run-id", "r1")
    assert res["executed"] == ["curated", "manifest"]

    curated = spark.read.parquet(f"{wh}/r1/curated")
    survivors = q_curated_corpus(spark, sf_dir)
    # the export contains exactly the funnel's survivors, text attached
    assert curated.count() == survivors.count() == res["curated_docs"]
    assert curated.filter(F.col("text").isNull()).count() == 0
    # partitioned-by-shard layout: shard dirs on disk, ids in [0, 16)
    assert (tmp_path / "wh" / "r1" / "curated" / "shard_id=0").exists()
    assert curated.agg(F.max("shard_id")).collect()[0][0] < 16

    # manifest totals == curated rollup
    manifest = spark.read.parquet(f"{wh}/r1/manifest")
    m = manifest.agg(F.sum("n_docs"), F.sum("n_tokens")).collect()[0]
    assert m[0] == curated.count()
    assert m[1] == curated.agg(F.sum("n_tokens")).collect()[0][0]
    assert res["curated_tokens"] == m[1]

    # pack layout invariant: bin_start_offset is the per-(lang) running
    # sum in doc_id order, so offsets are unique per lang and bin_id is
    # its PACK_BIN_TOKENS window
    dup_offsets = (
        curated.groupBy("lang", "bin_start_offset").count()
        .filter(F.col("count") > 1).count()
    )
    assert dup_offsets == 0

    # resume: the same run-id skips both stages
    res2 = _run(capsys, "--documents", sf_dir, "--warehouse", wh,
                "--run-id", "r1")
    assert res2["skipped"] == ["curated", "manifest"]
    assert res2["executed"] == []
    assert res2["curated_docs"] == res["curated_docs"]
