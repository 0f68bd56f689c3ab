"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Headline set = the flagship KG pipeline (parse -> SHACL validate -> split
-> report) plus the scale-relevant operators (LSH dedup, similarity,
TPC-H-style aggregates). Each query is executed to completion with a
count() over its result (no collect of wide rows) after a warm-up of the
parquet footer reads.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "kg_verdicts",
    "kg_split_counts",
    "kg_report_sizes",
    "tpch_q1",
    "threehop_segment_revenue",
    "star_pivot",
    # minhash_lsh_pairs is subsumed by lsh_verified_pairs (same blocking
    # stage + verify); it stays in queries() for the correctness gate
    "lsh_verified_pairs",
    "simhash",
    "fingerprint",
    "dedup_exact",
    "cosine_topk",
    "quality_score",
    # the KG linking path (blocking -> pair scoring -> union-find ->
    # canonical graph), so round-over-round linking perf is visible
    "kg_canonical_graph",
    # r5: real SPARQL text through the tokenizer->parser->Catalyst stack
    # (BGP self-joins + OPTIONAL over the shared validation-run triples)
    "sparql_person_roster",
    # r5 wave 3: SPARQL-based SHACL constraints (pass 7: the constraint
    # SELECT compiled to doc-scoped joins) and query-position closure
    # paths (per-predicate reachability fixpoint) — the two new
    # iterative/join-heavy surfaces, benched so regressions are visible
    "kg_sparql_verdicts",
    "sparql_reachable_rollup",
    # training-data prep (r3): 1->N chunk explosion, stratified-window
    # packing, broadcast-shaped n-gram decontamination
    "chunk_documents",
    "pack_sequences",
    "contamination_flags",
    # r3 wave 2: window-function analytics (one user_id shuffle), the
    # shuffle-free repetition filter, and iterative graph analytics
    # (K pregel-by-join rounds, integer fixed-point)
    "sessionize_events",
    "range_join_incidents",
    "quality_repetition",
    "pagerank_bipartite",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from harvesting_validator_spark.queries import ALL_QUERIES
    from harvesting_validator_spark.session import get_spark

    spark = get_spark(
        master=f"local[{cpus}]",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    # steady-state warmup (declared): JVM codegen + Python workers + parquet
    # footers, so recorded timings measure the operators, not JVM startup
    from harvesting_validator_spark.sources.rdf_parse import parse_sources_to_triples
    from harvesting_validator_spark.sources.synthetic import generate_sources

    parse_sources_to_triples(generate_sources(spark, 256)).count()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1).count()

    # two passes, min per query: this box is a shared VM with CPU-steal
    # windows of ±30% (BENCH.md §3); the min of two samples measures the
    # operator, not the neighbor load. Declared in the JSON note.
    from harvesting_validator_spark.runtime import (
        persistent_rdd_ids,
        release_bucketed_tables,
        release_new_rdds,
    )

    baseline_ids = persistent_rdd_ids(spark)
    timings: dict[str, float] = {}
    for _pass in range(2):
        # drop the per-session pipeline-run caches between passes so pass 2
        # re-times the full kg pipelines (cold per-query cost), not a
        # cache read; also release the executor storage those runs pinned
        from harvesting_validator_spark.queries import kg as _kg

        for stale in list(_kg._RUN_CACHE.values()):
            stale.cleanup()
        for stale in list(_kg._KG_CACHE.values()):
            stale.cleanup()
        _kg._RUN_CACHE.clear()
        _kg._KG_CACHE.clear()
        # storage back to baseline before the pass: the cache cleanups
        # above release the tracked handles; this sweep catches anything
        # untracked (e.g. pagerank's edge checkpoint) so pass-2 cold
        # timings never pay for pass-1's resident RDDs (VERDICT r3 #2a)
        release_new_rdds(spark, baseline_ids)
        for name in HEADLINE:
            fn = ALL_QUERIES[name]
            t0 = time.time()
            n = fn(spark, sf_dir).count()
            dt = round(time.time() - t0, 3)
            timings[name] = min(timings.get(name, dt), dt)
            print(f"# pass{_pass} {name}: {n} rows in {dt}s", file=sys.stderr)
            if not name.startswith("kg_"):
                # non-kg queries share no caches across the suite: release
                # whatever this one pinned (iterative checkpoints, bucketed
                # scratch tables) right away. kg_* caches are shared
                # intra-pass and released at the pass boundary via
                # cleanup() above.
                release_new_rdds(spark, baseline_ids)
                release_bucketed_tables(spark)
    total = round(sum(timings.values()), 3)

    # flagship throughput: the kg_verdicts query runs the full
    # parse -> SHACL validate -> verdict pipeline over n corpus docs
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    flagship_docs_per_s = round(n_docs / timings["kg_verdicts"], 1)

    print(
        json.dumps(
            {
                "metric": "headline-suite wall time (kg pipeline + dedup/simhash/LSH + ANN + TPC-H aggs)",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "flagship_docs_per_s": flagship_docs_per_s,
                "note": "per-query timings are min of 2 passes (shared-VM "
                        "host shows +-30% CPU-steal windows; BENCH.md s3); "
                        "pipeline-run caches cleared between passes so kg_* "
                        "re-run cold; amortized corpus throughput is in "
                        "BENCH_SCALING.json",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
