"""spark-submit entrypoint for the training-data curation pipeline.

Composes the oracle-checked curation operators end-to-end — exact dedup +
quality gate + n-gram decontamination (``q_curated_corpus``), sequence-
packing layout, deterministic sharding — and materializes a training
export a dataloader can consume:

    spark-submit --master <cluster> \\
        --py-files dist/harvesting_validator_spark.zip \\
        jobs/curate_job.py \\
        --documents <dir containing documents.parquet> \\
        --warehouse /data/curated --run-id run42 [--shards 16]

Outputs under ``{warehouse}/{run_id}/``:

* ``curated``  — surviving docs with (lang, n_tokens, bin_id,
  bin_start_offset, shard_id), text included, written PARTITIONED BY
  shard_id so a dataloader reads one shard without listing the rest;
* ``manifest`` — per-shard (n_docs, n_tokens, n_bytes) rollup, the
  epoch-planning summary.

Resumable: stages already present for --run-id are skipped (the same
skip-if-exists contract as validate_job's lineage layer); identical
inputs produce identical outputs because every id/shard assignment is a
content/id hash (C4 — no uuid, no monotonically_increasing_id).

Scale shape: the funnel's only corpus-wide shuffles are the dedup
groupBy, the (broadcast-decided) decontamination gram join, and the
per-lang pack window; sharding adds one hash-partitioned write. The
final write clusters on shard_id so each output task owns whole shard
directories (no small-file spray).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--documents", required=True,
                    help="directory containing documents.parquet "
                         "(doc_id, lang, text, ...)")
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--run-id", default="curate-run")
    ap.add_argument("--shards", type=int, default=None,
                    help="output shard count (default: corpusops.N_SHARDS "
                         "so the manifest matches the shard_manifest "
                         "oracle shape)")
    ap.add_argument("--catalog", default=None,
                    help="Iceberg catalog for stage outputs (default: "
                         "auto-detect; absent -> parquet dirs)")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession, Window
    from pyspark.sql import functions as F

    from harvesting_validator_spark.queries.common import md5_int, tbl
    from harvesting_validator_spark.queries.corpusops import N_SHARDS
    from harvesting_validator_spark.queries.textprep import (
        PACK_BIN_TOKENS,
        q_curated_corpus,
    )
    from harvesting_validator_spark.warehouse import stage_store

    spark = SparkSession.builder.getOrCreate()
    tables = stage_store(spark, args.warehouse, catalog=args.catalog)
    n_shards = args.shards or N_SHARDS
    run_id, executed, skipped = args.run_id, [], []

    if tables.exists(run_id, "curated"):
        skipped.append("curated")
    else:
        survivors = q_curated_corpus(spark, args.documents)
        docs = tbl(spark, args.documents, "documents")
        # pack layout over SURVIVORS only (the bin budget should not be
        # spent on docs the funnel dropped), then deterministic sharding
        w = Window.partitionBy("lang").orderBy("doc_id")
        start = F.sum("n_tokens").over(w) - F.col("n_tokens")
        laid_out = survivors.select(
            "doc_id", "lang", "n_tokens",
            (start / PACK_BIN_TOKENS).cast("int").alias("bin_id"),
            start.cast("bigint").alias("bin_start_offset"),
            F.pmod(md5_int(F.col("doc_id").cast("string")),
                   F.lit(n_shards)).cast("int").alias("shard_id"),
        )
        curated = laid_out.join(docs.select("doc_id", "text"), "doc_id")
        tables.write(curated, run_id, "curated", partition_by=("shard_id",))
        executed.append("curated")

    if tables.exists(run_id, "manifest"):
        skipped.append("manifest")
    else:
        curated = tables.read(run_id, "curated")
        manifest = (
            curated.groupBy("shard_id")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                F.sum("n_tokens").cast("bigint").alias("n_tokens"),
                F.sum(F.length(F.encode(F.col("text"), "UTF-8")))
                .cast("bigint").alias("n_bytes"),
            )
        )
        tables.write(manifest, run_id, "manifest")
        executed.append("manifest")

    m = tables.read(run_id, "manifest").agg(
        F.sum("n_docs").alias("docs"), F.sum("n_tokens").alias("tokens")
    ).collect()[0]
    print(json.dumps({
        "run_id": run_id,
        "executed": executed,
        "skipped": skipped,
        "n_shards": n_shards,
        "curated_docs": m["docs"] and int(m["docs"]),
        "curated_tokens": m["tokens"] and int(m["tokens"]),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
