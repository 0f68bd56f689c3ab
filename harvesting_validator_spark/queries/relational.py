"""Relational operator parity queries (SURVEY.md §2.1-2.9).

Each query re-expresses one reference operator over the driver's TPC-H-ish
tables so the DuckDB oracle can hash-check it. The same operator shapes are
used inside the KG pipeline (kg.py) on the triples table.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from harvesting_validator_spark.queries.common import dround, money, tbl

EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]


# --- P1/S1: delta intake filter (AppController.java:30-33) -----------------
def q_delta_status_filter(spark, sf_dir):
    """(pred, obj) equality filter over the event stream; pushdown-checked."""
    return (
        tbl(spark, sf_dir, "events")
        .filter(F.col("event_type") == "signup")
        .select("event_id", "user_id", "event_type")
    )


O_DELTA = """
SELECT event_id, user_id, event_type FROM events WHERE event_type = 'signup'
"""


# --- P2: ASK existence -> left_semi (is-task.sparql, TaskService.java:59-63)
def q_ask_exists_semi(spark, sf_dir):
    c = tbl(spark, sf_dir, "customer")
    o = tbl(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


O_SEMI = """
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""


# --- P5/J5: conformance gate -> left_anti (FilteringService.java:77-82) ----
def q_conformance_anti(spark, sf_dir):
    c = tbl(spark, sf_dir, "customer")
    o = tbl(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_mktsegment"
    )


O_ANTI = """
SELECT c_custkey, c_mktsegment FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""


# --- J1: star join via pivot (load-task.sparql:13-27) -----------------------
def q_star_pivot(spark, sf_dir):
    """Subject-star pivot: one row per user with per-predicate counts —
    the Spark form of the 8-predicate task-load star join."""
    e = tbl(spark, sf_dir, "events")
    piv = (
        e.groupBy("user_id")
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))
    )
    return piv.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in EVENT_TYPES],
    )


O_PIVOT = """
SELECT user_id,
       count(*) FILTER (WHERE event_type='click')    AS n_click,
       count(*) FILTER (WHERE event_type='view')     AS n_view,
       count(*) FILTER (WHERE event_type='purchase') AS n_purchase,
       count(*) FILTER (WHERE event_type='signup')   AS n_signup,
       count(*) FILTER (WHERE event_type='error')    AS n_error
FROM events GROUP BY user_id
"""


# --- J2: 2-hop chain join (select-input-container-graph.sparql) -------------
def q_twohop_region_rollup(spark, sf_dir):
    """customer -> nation -> region, dims broadcast (SURVEY §2.3 J2)."""
    c = tbl(spark, sf_dir, "customer")
    n = tbl(spark, sf_dir, "nation")
    r = tbl(spark, sf_dir, "region")
    # nation (25 rows) and region (5 rows) are CONSTANT-size TPC-H dims at
    # every sf — the forced broadcast can never outgrow the driver
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dround(F.sum(money("c_acctbal")), 2).alias("sum_acctbal"),
        )
    )


O_TWOHOP = """
SELECT r_name,
       count(*) AS n_customers,
       round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


# --- J3: 3-hop chain join (fetch-triple-from-file-input-container.sparql) ---
def q_threehop_segment_revenue(spark, sf_dir):
    li = tbl(spark, sf_dir, "lineitem")
    o = tbl(spark, sf_dir, "orders")
    c = tbl(spark, sf_dir, "customer")
    rev = money("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - money("l_discount"))
    # customer GROWS with sf (unlike the constant nation/region dims) — no
    # forced broadcast; statistics/AQE pick one while it fits the threshold
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            dround(F.sum(rev), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


O_THREEHOP = """
SELECT c_mktsegment,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 2) AS revenue,
       count(*) AS n_lines
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


# --- A1: COUNT(*) per graph (count-imported-triples.sparql) -----------------
def q_count_per_type(spark, sf_dir):
    return (
        tbl(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


O_COUNT = "SELECT event_type, count(*) AS n FROM events GROUP BY event_type"


# --- A2: COUNT(DISTINCT) (count-triple-from-file-input-container.sparql) ----
def q_countdistinct_users(spark, sf_dir):
    return (
        tbl(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


O_CDIST = """
SELECT event_type, count(DISTINCT user_id) AS n_users FROM events GROUP BY event_type
"""


# --- F3+F4: UNION + DISTINCT (TaskService.java:116; SPARQL DISTINCT) --------
def q_union_distinct(spark, sf_dir):
    o = tbl(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    c = tbl(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    return o.union(c).distinct()


O_UNION = """
SELECT DISTINCT custkey FROM (
  SELECT o_custkey AS custkey FROM orders
  UNION ALL
  SELECT c_custkey AS custkey FROM customer
)
"""


# --- F2: set difference via anti-join (FilteringService.java:97) ------------
def q_set_difference(spark, sf_dir):
    """parts never shipped: part keys minus lineitem part keys (Model
    difference = anti-join on the full key, not exceptAll)."""
    p = tbl(spark, sf_dir, "part")
    li = tbl(spark, sf_dir, "lineitem")
    return p.join(li, p.p_partkey == li.l_partkey, "left_anti").select(
        "p_partkey", "p_brand"
    )


O_DIFF = """
SELECT p_partkey, p_brand FROM part p
WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)
"""


# --- O1: ORDER BY + LIMIT, deterministic tiebreak (SURVEY §2.7) --------------
def q_topk_orders(spark, sf_dir):
    return (
        tbl(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )


O_TOPK = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


# --- C2: abbreviate (StringUtils.abbreviate, PipelineService.java:55) --------
def q_abbrev_docs(spark, sf_dir):
    d = tbl(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.substring("text", 1, 40).alias("head"),
        F.length("text").alias("n"),
    )


O_ABBREV = "SELECT doc_id, substr(text, 1, 40) AS head, length(text) AS n FROM documents"


# --- C8: sha256 content invariant (BASELINE.json input_hint) -----------------
def q_sha_invariant(spark, sf_dir):
    d = tbl(spark, sf_dir, "documents")
    return d.select("doc_id", F.sha2("text", 256).alias("content_sha256"))


O_SHA = "SELECT doc_id, sha256(text) AS content_sha256 FROM documents"


# --- C7: rlike predicate (sh:pattern compiled form) ---------------------------
def q_rlike_filter(spark, sf_dir):
    d = tbl(spark, sf_dir, "documents")
    return (
        d.filter(F.col("text").rlike("spark.*join|join.*spark"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )


O_RLIKE = """
SELECT lang, count(*) AS n FROM documents
WHERE regexp_matches(text, 'spark.*join|join.*spark')
GROUP BY lang
"""


# --- headline agg: TPC-H Q1 shape (map-side partial agg stress) ---------------
def q_tpch_q1(spark, sf_dir):
    li = tbl(spark, sf_dir, "lineitem")
    disc = F.lit(1).cast("decimal(18,2)") - money("l_discount")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dround(F.sum(money("l_quantity")), 2).alias("sum_qty"),
            dround(F.sum(money("l_extendedprice")), 2).alias("sum_base_price"),
            dround(F.sum(money("l_extendedprice") * disc), 2).alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


O_Q1 = """
SELECT l_returnflag, l_linestatus,
       round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_qty,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_base_price,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 2) AS sum_disc_price,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


# --- exact grouped percentiles ------------------------------------------------
def q_price_percentiles(spark, sf_dir):
    """Exact p25/p50/p75 of order totals per status — Spark's
    `percentile` (exact, linear interpolation at h = (n-1)·p, the
    type-7 definition DuckDB's quantile_cont shares). Exact percentile
    sorts within each group — the right tool for low-cardinality group
    keys; the sketch pair (`sketch_price_quantiles`) is the
    corpus-scale approximation with error bounds."""
    o = tbl(spark, sf_dir, "orders")
    pct = F.expr("percentile(o_totalprice, array(0.25D, 0.5D, 0.75D))")
    g = o.groupBy("o_orderstatus").agg(pct.alias("p"))
    return g.select(
        "o_orderstatus",
        dround(F.col("p")[0], 4).alias("p25"),
        dround(F.col("p")[1], 4).alias("p50"),
        dround(F.col("p")[2], 4).alias("p75"),
    )


O_PERCENTILES = """
SELECT o_orderstatus,
       round(CAST(quantile_cont(o_totalprice, 0.25) AS DOUBLE), 4) AS p25,
       round(CAST(quantile_cont(o_totalprice, 0.5)  AS DOUBLE), 4) AS p50,
       round(CAST(quantile_cont(o_totalprice, 0.75) AS DOUBLE), 4) AS p75
FROM orders
GROUP BY o_orderstatus
"""


# --- multidimensional aggregation (CUBE / grouping sets) ----------------------
def q_orders_cube(spark, sf_dir):
    """CUBE over (status, priority): all four grouping sets in ONE pass —
    Spark expands the sets map-side and partial-aggregates each, so the
    corpus is scanned once regardless of dimension count (the OLAP
    rollup shape). grouping_id() disambiguates subtotal rows; group
    values are never null here so 'ALL' backfill is a plain coalesce on
    both engines."""
    o = tbl(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            dround(F.sum(money("o_totalprice")), 2).alias("total_price"),
        )
        .select(
            "gid",
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "total_price",
        )
    )


O_CUBE = """
SELECT CAST(GROUPING(o_orderstatus, o_orderpriority) AS INT) AS gid,
       COALESCE(o_orderstatus, 'ALL') AS status,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       count(*) AS n_orders,
       round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
         AS total_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


QUERIES = {
    "delta_status_filter": q_delta_status_filter,
    "ask_exists_semi": q_ask_exists_semi,
    "conformance_anti": q_conformance_anti,
    "star_pivot": q_star_pivot,
    "twohop_region_rollup": q_twohop_region_rollup,
    "threehop_segment_revenue": q_threehop_segment_revenue,
    "count_per_type": q_count_per_type,
    "countdistinct_users": q_countdistinct_users,
    "union_distinct": q_union_distinct,
    "set_difference": q_set_difference,
    "topk_orders": q_topk_orders,
    "abbrev_docs": q_abbrev_docs,
    "sha_invariant": q_sha_invariant,
    "rlike_filter": q_rlike_filter,
    "tpch_q1": q_tpch_q1,
    "orders_cube": q_orders_cube,
    "price_percentiles": q_price_percentiles,
}

ORACLES = {
    "delta_status_filter": O_DELTA,
    "ask_exists_semi": O_SEMI,
    "conformance_anti": O_ANTI,
    "star_pivot": O_PIVOT,
    "twohop_region_rollup": O_TWOHOP,
    "threehop_segment_revenue": O_THREEHOP,
    "count_per_type": O_COUNT,
    "countdistinct_users": O_CDIST,
    "union_distinct": O_UNION,
    "set_difference": O_DIFF,
    "topk_orders": O_TOPK,
    "abbrev_docs": O_ABBREV,
    "sha_invariant": O_SHA,
    "rlike_filter": O_RLIKE,
    "tpch_q1": O_Q1,
    "orders_cube": O_CUBE,
    "price_percentiles": O_PERCENTILES,
}
