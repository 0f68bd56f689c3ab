"""Graph-analytics operators beyond union-find (task brief: analytics a
KG-construction deployment runs on its output graph): degree statistics,
fixed-point PageRank, and a bucketized range join.

Determinism design: PageRank is computed in INTEGER fixed-point
(rank scaled by 10^6, contributions via integer floor-division), so every
iteration is exact on both engines — no double-summation order effects,
no rounding policy to reconcile. The rank vector after K iterations is a
BIGINT column the driver can hash bit-for-bit.

Scale notes: the PageRank loop is the standard pregel-by-join shape —
ranks (keyed by node) ⋈ edges (keyed by src) → groupBy(dst) — one keyed
shuffle pair per iteration, partial-aggregated map-side; K is fixed (no
driver round-trips). Degree stats are one groupBy. The range join avoids
the inequality-join trap (BroadcastNestedLoop/cartesian at scale): each
interval lands in ceil(len/bucket)+1 time buckets, probes equi-join on
(user_id, bucket) — bounded fan-out — and an exact containment filter
restores semantics; each probe row participates only at its OWN bucket,
so every (incident, probe) pair matches exactly once with no dedup
shuffle — identical results to the naive formulation the DuckDB oracle
uses.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from harvesting_validator_spark.queries.common import epoch_us, tbl

PR_ITERS = 5
PR_SCALE = 1_000_000  # rank fixed-point scale
PR_BASE = 150_000  # 0.15 * SCALE
INCIDENT_WINDOW_US = 600 * 1_000_000  # 10 min

# r6: the loop-invariant edge cache of the most recent pagerank invocation;
# released on the next call (bench.py additionally sweeps via
# release_new_rdds between queries)
_PR_EDGE_CACHE: list = []


def _edges(spark, sf_dir):
    """Symmetrized customer<->supplier edge list ('c<k>' / 's<k>' node
    ids keep the key spaces disjoint). Distinct per direction.

    r6: both directions come from ONE explode over the distinct pair set
    instead of a union of two selects — Catalyst performs no common-
    subexpression elimination across union branches, so the r5 shape
    recomputed the orders ⋈ lineitem join + distinct once per branch
    (profiled at sf1.0: two 6M-row lineitem scans and two 12M-row
    distinct exchanges where one of each suffices)."""
    o = tbl(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = tbl(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pair = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("c"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("s"),
        )
        .distinct()
    )
    both = F.array(
        F.struct(F.col("c").alias("src"), F.col("s").alias("dst")),
        F.struct(F.col("s").alias("src"), F.col("c").alias("dst")),
    )
    return pair.select(F.explode(both).alias("e")).select("e.src", "e.dst")


_EDGE_SQL = """
edges AS (
  SELECT src, dst FROM (
    SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
  )
  UNION ALL
  SELECT dst AS src, src AS dst FROM (
    SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
  )
)
"""


# --- degree statistics --------------------------------------------------------
def q_graph_degree_stats(spark, sf_dir):
    """Out-degree per node — the building block for skew detection /
    salting decisions at scale (a hot key shows up as a degree outlier
    before it melts a join)."""
    e = _edges(spark, sf_dir)
    return e.groupBy("src").agg(F.count(F.lit(1)).alias("out_degree"))


O_DEGREE = f"""
WITH {_EDGE_SQL.strip()}
SELECT src, CAST(count(*) AS BIGINT) AS out_degree
FROM edges GROUP BY src
"""


# --- fixed-point PageRank -----------------------------------------------------
def q_pagerank_bipartite(spark, sf_dir):
    """PR_ITERS rounds of PageRank over the symmetrized graph, integer
    fixed-point: r0 = SCALE; r_{{k+1}}(v) = BASE + Σ_{{(u,v)∈E}}
    (r_k(u) * 85) div (100 * outdeg(u)). All arithmetic is BIGINT
    floor-division, so the result is exact and engine-independent.
    Dangling mass is not redistributed (every node here has out-edges by
    construction — the graph is symmetrized)."""
    # materialize the DEGREE-ANNOTATED edge list ONCE before the loop as a
    # parquet table BUCKETED on the loop's join key. The r3/r4 shape
    # (repartition("src").localCheckpoint()) computed it once but PySpark's
    # localCheckpoint re-enters the plan as `Scan ExistingRDD,
    # UnknownPartitioning` — Catalyst forgets the hash layout and re-adds a
    # FULL edge-list Exchange inside every unrolled round (K×|E| shuffled
    # bytes, the dominant per-round cost at graph scale). A bucketed scan
    # reports HashPartitioning(src, n_buckets), so each round's join is
    # satisfied in place on the edge side and the only per-round shuffle is
    # the O(|V|) rank vector (ranks-side Exchange + contribution groupBy).
    # The repartition before write puts exactly one file under each bucket
    # (writer-task partitioning == bucket hash), keeping file count flat.
    # Measured sf0.1 local[32] (4 interleaved fresh-JVM pairs): wall-
    # neutral (old min 21.9s / new 22.6s) — the graph there is too small
    # for K×|E| shuffle mass to dominate; the change buys the per-round
    # byte complexity and drops the resident localCheckpoint storage.
    #
    # r6 (guide §2.3/§2.4/§3.1), plan evidence in plans/r06/:
    # 1. Edge rows carry NO outdeg: the per-edge contribution
    #    (rank*85) div (100*outdeg) is a function of the SOURCE NODE, so
    #    it is computed once per node on the O(|V|) rank vector, and the
    #    materialized edge table narrows to (src, dst). That removes both
    #    the degree self-join (which recomputed the whole edge pipeline —
    #    no CSE across branches) and 12M per-round divisions at sf1.0.
    # 2. Degrees come from an IN-PLACE groupBy on the loop key: the graph
    #    is symmetrized, so indeg == outdeg and either key works.
    # 3. The loop-invariant edge table is repartition(loop_key).persist()
    #    — the library-safe layout-preserving cache (InMemoryTableScan
    #    advertises HashPartitioning; house invariant list) — instead of
    #    a bucketed parquet scratch table: drops the |E|-sized write +
    #    catalog machinery and rounds re-scan columnar memory.
    # 4. The loop shape is chosen from a MEASURED bound on |V|: the node
    #    space is a subset of customers ∪ suppliers, whose parquet row
    #    counts are metadata-only reads. If the bound says the rank
    #    vector fits well under the broadcast threshold, edges partition
    #    by DST and each round joins a size-checked broadcast of the
    #    ranks — the contribution groupBy(dst) aggregates IN PLACE and
    #    the per-round shuffle drops from O(|E|) contribution rows
    #    (12M/round at sf1.0) to the O(|V|) broadcast build. Otherwise
    #    (the 100-TB shape) the r5 plan is kept: edges partition by SRC,
    #    stay in place for the join, and only the rank vector shuffles.
    #    A runtime statistic with a documented fallback, not a hint
    #    tuned to one scale.
    # 5. The loop runs on BIGINT node ids (custkey*2 / suppkey*2+1 — a
    #    bijection into disjoint even/odd spaces, guide §2.3 "narrower
    #    types"): every probe, aggregation and cached edge row hashes a
    #    long instead of a 'c<k>'/'s<k>' string; the public string ids
    #    are rebuilt only on the final O(|V|) rank vector, bit-identical.
    o = tbl(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = tbl(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pair = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    both = F.array(
        F.struct(F.col("c").alias("src"), F.col("s").alias("dst")),
        F.struct(F.col("s").alias("src"), F.col("c").alias("dst")),
    )
    e = pair.select(F.explode(both).alias("e")).select("e.src", "e.dst")
    import re as _re

    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    thr_raw = spark.conf.get(
        "spark.sql.autoBroadcastJoinThreshold", "10485760"
    ).lower()
    m = _re.match(r"(-?\d+)([bkmg]?)", thr_raw)
    bcast_threshold = int(m.group(1)) * {
        "": 1, "b": 1, "k": 1 << 10, "m": 1 << 20, "g": 1 << 30
    }[m.group(2)]
    n_bound = (
        tbl(spark, sf_dir, "customer").count()
        + tbl(spark, sf_dir, "supplier").count()
    )
    # ~64B per built hash-relation row (string node id + bigint + overhead)
    broadcast_ranks = n_bound * 64 <= bcast_threshold
    loop_key = "dst" if broadcast_ranks else "src"
    from harvesting_validator_spark.runtime import swap_persisted

    edb = swap_persisted(_PR_EDGE_CACHE, e.repartition(n_parts, loop_key))
    edb.count()  # materialize full-width before column-pruned readers
    # in-place on the loop key; indeg == outdeg on the symmetrized graph
    deg = edb.groupBy(loop_key).agg(F.count(F.lit(1)).alias("outdeg")).select(
        F.col(loop_key).alias("node"), "outdeg"
    )
    ranks = deg.select(
        F.col("node").alias("src"),
        F.lit(PR_SCALE).cast("bigint").alias("rank"),
        "outdeg",
    )
    for _ in range(PR_ITERS):
        # per-NODE contribution value; edges only look it up and sum
        r = ranks.select(
            "src", F.expr("(rank * 85) div (100 * outdeg)").alias("c")
        )
        rb = F.broadcast(r) if broadcast_ranks else r
        contrib = (
            edb.join(rb, "src")
            .groupBy("dst")
            .agg(F.sum("c").alias("in_mass"))
        )
        # re-attach outdeg for the next round: contrib is partitioned by
        # dst and deg by the loop key — in the broadcast path both are
        # dst (aligned join, no exchange); in the fallback path both
        # sides are hash-partitioned on their join key (dst vs node=src),
        # so neither re-shuffles
        ranks = contrib.join(deg, contrib.dst == deg.node).select(
            F.col("dst").alias("src"),
            (F.lit(PR_BASE).cast("bigint") + F.col("in_mass")).alias("rank"),
            "outdeg",
        )
    node_str = F.when(
        F.col("src") % 2 == 0,
        F.concat(F.lit("c"), F.expr("src div 2").cast("string")),
    ).otherwise(F.concat(F.lit("s"), F.expr("src div 2").cast("string")))
    return ranks.select(node_str.alias("node"), "rank")


def _pr_unrolled_sql():
    """r0..rK as unrolled CTEs — the oracle mirror of the Spark loop."""
    parts = [
        "deg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM edges GROUP BY src)",
        f"r0 AS (SELECT src, CAST({PR_SCALE} AS BIGINT) AS rank FROM deg)",
    ]
    for k in range(PR_ITERS):
        parts.append(
            f"""r{k + 1} AS (
  SELECT e.dst AS src,
         CAST({PR_BASE} + sum((r.rank * 85) // (100 * d.outdeg)) AS BIGINT) AS rank
  FROM edges e JOIN deg d ON e.src = d.src JOIN r{k} r ON e.src = r.src
  GROUP BY e.dst
)"""
        )
    return ",\n".join(parts)


O_PAGERANK = f"""
WITH {_EDGE_SQL.strip()},
{_pr_unrolled_sql()}
SELECT src AS node, rank FROM r{PR_ITERS}
"""


# --- bucketized range join ----------------------------------------------------
def q_range_join_incidents(spark, sf_dir):
    """For each 'error' event, count the same user's events inside the
    10-minute incident window [t_err, t_err + W] — a range join.

    Scale shape: instead of the inequality join (which Spark plans as
    BroadcastNestedLoop / cartesian), each incident is replicated to the
    time buckets its window overlaps (bucket width == window length →
    ≤ 2 buckets) and probes equi-join on (user_id, bucket); an exact
    containment predicate then filters, and counting each probe event at
    its OWN bucket (always inside the window) makes a pair count exactly
    once with no dedup shuffle. The DuckDB oracle is the naive
    inequality join — same result, different (non-scalable) plan.
    """
    e = tbl(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        epoch_us().alias("t_us"),
    )
    w = F.lit(INCIDENT_WINDOW_US)
    # incidents replicated to every bucket their window overlaps
    inc = e.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("incident_id"),
        "user_id",
        F.col("t_us").alias("t0"),
        F.explode(
            F.sequence(
                F.expr(f"t_us div {INCIDENT_WINDOW_US}"),
                F.expr(f"(t_us + {INCIDENT_WINDOW_US}) div {INCIDENT_WINDOW_US}"),
            )
        ).alias("bucket"),
    )
    probe = e.select(
        "user_id",
        F.col("event_id").alias("probe_id"),
        F.col("event_type").alias("probe_type"),
        F.col("t_us").alias("t"),
        F.expr(f"t_us div {INCIDENT_WINDOW_US}").alias("bucket"),
    )
    hits = inc.join(probe, ["user_id", "bucket"]).filter(
        (F.col("t") >= F.col("t0")) & (F.col("t") <= F.col("t0") + w)
    )
    return hits.groupBy("incident_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("probe_type").alias("n_types"),
    )


O_RANGE_JOIN = f"""
WITH e AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS t_us FROM events
)
SELECT i.event_id AS incident_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT p.event_type) AS BIGINT) AS n_types
FROM e i JOIN e p
  ON i.user_id = p.user_id
 AND p.t_us >= i.t_us
 AND p.t_us <= i.t_us + {INCIDENT_WINDOW_US}
WHERE i.event_type = 'error'
GROUP BY i.event_id
"""


QUERIES = {
    "graph_degree_stats": q_graph_degree_stats,
    "pagerank_bipartite": q_pagerank_bipartite,
    "range_join_incidents": q_range_join_incidents,
}

ORACLES = {
    "graph_degree_stats": O_DEGREE,
    "pagerank_bipartite": O_PAGERANK,
    "range_join_incidents": O_RANGE_JOIN,
}
