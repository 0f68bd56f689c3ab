"""spark-submit entrypoint running SPARQL text over harvested sources.

The reference's operational read path is "execute this SPARQL string
against the store" (`SparqlQueryLoad.java`, the 15 bundled templates);
this job is that surface on the engine: parse the sources, compile the
query with `sparql.py`, and materialize the solution sequence.

    spark-submit --master <cluster> \\
        --py-files dist/harvesting_validator_spark.zip \\
        jobs/sparql_job.py \\
        --sources <parquet-of-(repo,path,commit,lang,content)|synthetic:N> \\
        --query <file.sparql | literal SPARQL text> \\
        [--output /data/answers] [--show 20]

With --output the solution DataFrame is written as parquet (distributed
write — the scale path); otherwise the first --show rows print as JSON
lines plus a one-line summary either way. Parse errors in the corpus
never fail the job: malformed docs contribute no triples (the engine's
degrade-don't-crash parse contract), and their count is reported in the
summary line so silent data loss is visible.

--canonical runs the FULL construction pipeline first (SHACL conformance
gate -> entity linking -> union-find -> deduplicated canonical graph)
and queries THAT — harvest, validate, construct, and query in one
spark-submit. ${name} template parameters bind with repeatable --param
flags (the reference's Freemarker .sparql files run unchanged).

--update treats the query as a SPARQL 1.1 UPDATE request (the
reference's write surface: update-task-status / append-task-* /
write-ttl-file / insert-data run unchanged) and applies it to the
parsed quad frame via `sparql_update`; the UPDATED store writes to
--output (required — an update's deliverable is the new store, not a
row print), doc ids re-hexed at this driver edge like every other sink.
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
    ap.add_argument("--query", required=True,
                    help="path to a .sparql file, or the query text itself")
    ap.add_argument("--output", default=None,
                    help="parquet output path for the solutions "
                         "(omit to just print --show rows)")
    ap.add_argument("--show", type=int, default=20,
                    help="rows to print as JSON lines without --output")
    ap.add_argument("--param", action="append", default=[],
                    metavar="NAME=VALUE",
                    help="bind a ${name} template parameter (repeatable; "
                         "the reference's Freemarker-style .sparql "
                         "templates run unchanged)")
    ap.add_argument("--canonical", action="store_true",
                    help="query the CONSTRUCTED canonical graph instead "
                         "of the raw parsed triples: conforming docs -> "
                         "entity linking -> union-find -> deduplicated "
                         "(s,p,o) graph, then the query runs over it "
                         "(no GRAPH clauses — provenance is dropped by "
                         "the canonical dedup)")
    ap.add_argument("--shapes", default=None,
                    help="with --canonical: SHACL profile turtle file "
                         "(default: the reference application profile)")
    ap.add_argument("--blocking", default=None,
                    choices=["minhash", "key"],
                    help="with --canonical: candidate blocking strategy "
                         "(default minhash)")
    ap.add_argument("--update", action="store_true",
                    help="treat the query as a SPARQL 1.1 UPDATE request "
                         "and write the UPDATED quad store to --output "
                         "(INSERT DATA / DELETE DATA / DELETE-INSERT-"
                         "WHERE / ;-sequences — the reference's write "
                         "templates run unchanged)")
    args = ap.parse_args(argv)
    if not args.canonical and (args.shapes or args.blocking):
        ap.error("--shapes/--blocking only apply with --canonical")
    if args.update and args.canonical:
        ap.error("--update applies to the provenance-carrying quad "
                 "store; the canonical graph has no named graphs "
                 "(use the raw triples without --canonical)")
    if args.update and not args.output:
        ap.error("--update needs --output: the deliverable is the "
                 "updated store")

    from pyspark.sql import SparkSession

    from harvesting_validator_spark.sources.rdf_parse import (
        parse_sources_to_triples,
    )
    from harvesting_validator_spark.sources.synthetic import generate_sources
    from harvesting_validator_spark.sparql import bind_template, sparql_select

    spark = SparkSession.builder.getOrCreate()

    if os.path.exists(args.query):
        with open(args.query) as fh:
            query_text = fh.read()
    else:
        query_text = args.query
    if args.param:
        params = {}
        for p in args.param:
            name, sep, value = p.partition("=")
            if not sep:
                ap.error(f"--param needs NAME=VALUE, got {p!r}")
            params[name] = value
        query_text = bind_template(query_text, params)

    # fail FAST on bad query text in EVERY mode — the corpus parse below
    # is the expensive step, and a syntax error must not cost it (the
    # --canonical branch additionally rejects GRAPH clauses below)
    if args.update:
        from harvesting_validator_spark.sparql import _Parser

        _Parser(query_text).parse_update()
    else:
        from harvesting_validator_spark.sparql import parse_sparql

        parse_sparql(query_text)

    if args.sources.startswith("synthetic:"):
        sources = generate_sources(spark, int(args.sources.split(":", 1)[1]))
    else:
        sources = spark.read.parquet(args.sources)

    if args.canonical:
        from harvesting_validator_spark.plans.pipeline import (
            run_kg_construction,
        )
        from harvesting_validator_spark.sources.synthetic import profile_text
        from harvesting_validator_spark.sparql import (
            SparqlUnsupported,
            parse_sparql,
            uses_graph_clause,
        )

        # fail FAST on a bad query — the construction pipeline below is
        # minutes of compute; a syntax error or a GRAPH clause (the
        # canonical graph intentionally drops provenance, so there are
        # no named graphs to match) must not cost a full run
        if uses_graph_clause(parse_sparql(query_text)):
            raise SparqlUnsupported(
                "GRAPH clauses cannot be used with --canonical: the "
                "deduplicated canonical graph has no per-document "
                "provenance (query the raw triples without --canonical)"
            )
        kg = run_kg_construction(
            spark, sources, profile_text(args.shapes),
            blocking=args.blocking or "minhash",
        )
        graph = kg.graph.persist()
        try:
            graph.count()  # one materialization serves print + count
            result = sparql_select(graph, query_text)
            n = _emit(spark, result, args)
            summary = {
                "mode": "sparql-canonical",
                "solutions": n,
                "parse_errors": kg.validation.parse_errors.count(),
                "output": args.output,
            }
        finally:
            graph.unpersist()
            kg.cleanup()
        print(json.dumps(summary))
        return 0

    # persist the parsed triples: the solution count, the row print, and
    # the error count otherwise each re-run the (expensive) corpus parse
    triples, errors, parsed = parse_sources_to_triples(
        sources, with_errors=True, return_raw=True, repartition_by_doc=True
    )
    parsed = parsed.persist()
    try:
        parsed.count()  # full-width materialization (CLAUDE.md invariant)
        if args.update:
            from harvesting_validator_spark.plans.pipeline import hex_doc_id
            from harvesting_validator_spark.sparql import sparql_update

            updated = hex_doc_id(sparql_update(triples, query_text))
            n = _emit(spark, updated, args)
            print(json.dumps({
                "mode": "sparql-update",
                "quads": n,
                "parse_errors": errors.count(),
                "output": args.output,
            }))
            return 0
        result = sparql_select(triples, query_text)
        n = _emit(spark, result, args)
        print(json.dumps({
            "mode": "sparql",
            "solutions": n,
            "parse_errors": errors.count(),
            "output": args.output,
        }))
    finally:
        parsed.unpersist()
    return 0


def _emit(spark, result, args) -> int:
    """Materialize the solutions (parquet or JSON lines) and count them
    BEFORE any pipeline caches are released."""
    if args.output:
        result.write.mode("overwrite").parquet(args.output)
        return spark.read.parquet(args.output).count()
    for r in result.limit(args.show).collect():
        print(json.dumps(r.asDict(), default=str))
    return result.count()


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
