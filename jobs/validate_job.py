"""spark-submit entrypoint for the validation + KG-construction pipeline.

Cluster launch (north_rule):
    spark-submit --master <cluster> \\
        --py-files dist/harvesting_validator_spark.zip \\
        jobs/validate_job.py \\
        --sources <path-or-synthetic:N> --shapes <profile.ttl> \\
        --warehouse /data/warehouse --run-id run42

The job is resumable: re-submitting with the same --run-id skips completed
stages via the lineage table (lineage.py). Local smoke:
    spark-submit --master 'local[8]' --py-files dist/... jobs/validate_job.py \\
        --sources synthetic:1000 --warehouse /tmp/wh

Streaming mode (--stream) points --sources at a landing DIRECTORY and
drains it through the foreachBatch incremental canonicalizer
(streaming/canonical.py) with trigger(availableNow) — re-submit with the
same --checkpoint as new files land (cron shape), or --follow for a
long-lived query:
    spark-submit ... jobs/validate_job.py --stream \\
        --sources /data/landing --warehouse /data/wh
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sources", required=True,
                    help="parquet path of (repo,path,commit,lang,content) "
                         "or 'synthetic:N'")
    ap.add_argument("--shapes", default=None,
                    help="SHACL profile turtle file (default: the "
                         "reference application profile)")
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--catalog", default=None,
                    help="Iceberg catalog name for stage outputs "
                         "(default: auto-detect from spark.sql.catalog.* "
                         "config; absent -> parquet dirs under "
                         "--warehouse)")
    ap.add_argument("--run-id", default=None)
    ap.add_argument("--kg", action="store_true",
                    help="also run entity linking + canonical graph")
    ap.add_argument("--strict", action="store_true",
                    default=os.environ.get("STRICT_MODE_FILTERING", "false")
                    .lower() == "true",
                    help="strict SHACL filtering: drop a violated focus "
                         "node whole (reference: shacl.strictModeFiltering "
                         "/ STRICT_MODE_FILTERING env, default false)")
    ap.add_argument("--incremental", action="store_true",
                    help="ledger-driven batch: validate ONLY unseen docs "
                         "and append outputs (incremental.py)")
    ap.add_argument("--watermark-col", default=None,
                    help="with --incremental: monotone source column "
                         "enabling the snapshot-diff intake (committed "
                         "history pruned by a column filter + run_id "
                         "partition pruning, never a full-ledger scan)")
    ap.add_argument("--stream", action="store_true",
                    help="treat --sources as a LANDING DIRECTORY of "
                         "source parquet files and drain it through the "
                         "foreachBatch incremental canonicalizer "
                         "(streaming/canonical.py); the mapping under "
                         "<warehouse>/_stream_mapping converges to the "
                         "one-shot batch union-find over everything seen")
    ap.add_argument("--checkpoint", default=None,
                    help="with --stream: Structured Streaming checkpoint "
                         "dir (default <warehouse>/_stream_checkpoint); "
                         "reuse it across submissions to resume the "
                         "stream exactly-once per landed file")
    ap.add_argument("--follow", action="store_true",
                    help="with --stream: keep the query running instead "
                         "of trigger(availableNow) drain-and-exit")
    ap.add_argument("--drain-timeout", type=int, default=3600,
                    help="with --stream (no --follow): seconds to wait "
                         "for the availableNow drain before stopping "
                         "the query and failing (default 3600)")
    args = ap.parse_args(argv)

    if args.stream and args.sources.startswith("synthetic:"):
        ap.error("--stream needs a landing directory, not synthetic:N "
                 "(write the corpus to parquet first)")
    if args.stream:
        # the stream branch runs ONLY the incremental canonicalizer —
        # silently accepting batch-mode flags would let an operator
        # believe SHACL gating/kg/incremental semantics applied
        for flag, name in (
            ("--shapes", "shapes"), ("--kg", "kg"),
            ("--strict", "strict"), ("--incremental", "incremental"),
            ("--run-id", "run_id"), ("--catalog", "catalog"),
            ("--watermark-col", "watermark_col"),
        ):
            # reject only EXPLICITLY-passed flags: --strict's default
            # reads the STRICT_MODE_FILTERING env, and an environment
            # that exports it must not make --stream unusable
            if getattr(args, name) != ap.get_default(name):
                ap.error(f"{flag} does not apply with --stream (the "
                         "stream branch runs the incremental "
                         "canonicalizer only; validate in batch mode)")
    elif args.checkpoint or args.follow:
        ap.error("--checkpoint/--follow only apply with --stream")

    from pyspark.sql import SparkSession

    from harvesting_validator_spark.lineage import run_validation_checkpointed
    from harvesting_validator_spark.sources.synthetic import (
        generate_sources,
        profile_text,
    )

    # spark-submit provides the session config; getOrCreate attaches to it
    spark = SparkSession.builder.getOrCreate()

    if args.stream:
        from harvesting_validator_spark import fs
        from harvesting_validator_spark.streaming.canonical import (
            canonicalize_stream,
        )
        from harvesting_validator_spark.streaming.micro_batch import (
            stream_sources,
        )

        checkpoint = args.checkpoint or fs.join(
            args.warehouse, "_stream_checkpoint"
        )
        # the library's file source (16 files/trigger): each micro-batch
        # pays one union-find fold + mapping rewrite, so bigger batches
        # amortize it — per-file batching multiplied that overhead ~16x
        stream = stream_sources(spark, args.sources)
        query = canonicalize_stream(
            stream, args.warehouse, checkpoint,
            available_now=not args.follow,
        )
        if args.follow:
            query.awaitTermination()
            return 0
        if not query.awaitTermination(args.drain_timeout):
            query.stop()  # stop cleanly before exiting, not mid-batch
            print(json.dumps({
                "mode": "stream",
                "error": f"drain timeout after {args.drain_timeout}s "
                         "(resume with the same --checkpoint)",
            }))
            return 1
        mapping_path = fs.join(args.warehouse, "_stream_mapping")
        if fs.exists(spark, mapping_path):
            mapping = spark.read.parquet(mapping_path)
            n_entities = mapping.count()
            n_components = mapping.select("canonical").distinct().count()
        else:
            n_entities = n_components = 0
        print(json.dumps({
            "mode": "stream",
            "checkpoint": checkpoint,
            "mapping_entities": n_entities,
            "components": n_components,
        }))
        return 0

    if args.sources.startswith("synthetic:"):
        sources = generate_sources(spark, int(args.sources.split(":", 1)[1]))
    else:
        sources = spark.read.parquet(args.sources)

    shapes_turtle = profile_text(args.shapes)

    if args.incremental:
        from harvesting_validator_spark.incremental import process_incremental

        n_new, _ = process_incremental(
            spark, sources, shapes_turtle, args.warehouse,
            run_id=args.run_id, watermark_col=args.watermark_col,
        )
        print(json.dumps({
            "mode": "incremental",
            "n_new_docs": n_new,
            "watermark_col": args.watermark_col,
        }))
        return 0

    from harvesting_validator_spark.warehouse import stage_store

    tables = stage_store(spark, args.warehouse, catalog=args.catalog)
    if args.kg:
        from harvesting_validator_spark.lineage import run_kg_checkpointed

        runner = run_kg_checkpointed(
            spark, sources, shapes_turtle, args.warehouse, run_id=args.run_id,
            tables=tables,
        )
    else:
        runner = run_validation_checkpointed(
            spark, sources, shapes_turtle, args.warehouse, run_id=args.run_id,
            strict=args.strict, tables=tables,
        )

    print(json.dumps({
        "run_id": runner.run_id,
        "executed": runner.executed,
        "skipped": runner.skipped,
        "metrics": runner.metrics(),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
