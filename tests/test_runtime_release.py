"""Executor-storage hygiene (VERDICT r3 ask #3): iterative queries must
not leave localCheckpoint RDDs resident after their output is
materialized and released — in a shared bench/driver session that
storage otherwise precedes later queries' cold passes.

Reference analog: the per-task scratch state the reference drops on task
completion (ValidationRun.cleanup mirrors it for persist() caches; these
tests cover the checkpoint RDDs that have no DataFrame-level unpersist).
"""

from __future__ import annotations

from harvesting_validator_spark.runtime import (
    persistent_rdd_ids,
    release_new_rdds,
)


def _storage_ids(spark):
    return persistent_rdd_ids(spark)


def test_connected_components_releases_loop_intermediates(spark):
    """A 17-node chain needs several pointer-jumping rounds; the in-loop
    release must leave at most ONE resident checkpoint (the final label
    table the returned DataFrame is backed by) — not one per probed
    round plus the edge list."""
    from harvesting_validator_spark.kg.canonicalize import connected_components

    base = _storage_ids(spark)
    edges = spark.createDataFrame(
        [(f"http://x/{i}", f"http://x/{i + 1}") for i in range(16)],
        ["src", "dst"],
    )
    comp = connected_components(edges)
    rows = comp.collect()
    assert len(rows) == 17
    assert {r.canonical for r in rows} == {"http://x/0"}
    resident = _storage_ids(spark) - base
    # final labels checkpoint only: und + superseded round checkpoints
    # were released inside the loop
    assert len(resident) <= 1, f"loop leaked {len(resident)} RDDs"
    released = release_new_rdds(spark, base, blocking=True)
    assert released == len(resident)
    assert _storage_ids(spark) == base


def test_kg_run_cleanup_returns_storage_to_baseline(spark):
    """KgRun.cleanup() must release persist() caches AND the union-find
    final checkpoint (tracked by RDD id)."""
    from harvesting_validator_spark.plans.pipeline import run_kg_construction
    from harvesting_validator_spark.sources.synthetic import (
        APPLICATION_PROFILE,
        generate_sources,
    )

    base = _storage_ids(spark)
    run = run_kg_construction(
        spark, generate_sources(spark, 40), APPLICATION_PROFILE
    )
    assert run.graph.count() > 0
    assert _storage_ids(spark) - base, "expected resident caches before cleanup"
    run.cleanup()
    # non-blocking unpersist: re-read for the assertion with a blocking
    # sweep of anything the async release has not finished dropping yet
    release_new_rdds(spark, base, blocking=True)
    assert _storage_ids(spark) == base


def test_bench_style_sweep_after_pagerank(spark, sf_dir):
    """r6: the pagerank edge list lives in a layout-preserving persisted
    repartition (no bucketed scratch table, no catalog entry, no /tmp
    dir). One invocation leaves exactly ONE resident cache (the edge
    table backing the returned DataFrame); a second invocation releases
    the first via the module handle; the bench-style release_new_rdds
    sweep returns storage to baseline."""
    from harvesting_validator_spark.queries.graphops import (
        _PR_EDGE_CACHE,
        q_pagerank_bipartite,
    )

    # earlier tests in the shared session (test_plans runs pagerank too)
    # may have left a live edge cache: drain it BEFORE snapshotting, else
    # this test's invocation releases an id that is part of `base`
    while _PR_EDGE_CACHE:
        _PR_EDGE_CACHE.pop().unpersist(blocking=True)
    base = _storage_ids(spark)
    base_tables = {t.name for t in spark.catalog.listTables()}
    assert q_pagerank_bipartite(spark, sf_dir).count() > 0
    resident = _storage_ids(spark) - base
    assert len(resident) == 1, f"expected the edge cache only, got {resident}"
    assert {t.name for t in spark.catalog.listTables()} == base_tables

    # a second invocation must hand off the cache, not accumulate
    assert q_pagerank_bipartite(spark, sf_dir).count() > 0
    release_new_rdds(spark, base, blocking=True)
    assert _storage_ids(spark) == base
    assert len(_PR_EDGE_CACHE) == 1  # handle for the (now-released) last run
    _PR_EDGE_CACHE.clear()
