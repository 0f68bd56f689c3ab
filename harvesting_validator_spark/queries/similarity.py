"""Similarity search over the `embeddings` table (task brief): brute-force
cosine top-k as the baseline, and a coarse-quantizer (IVF-style,
label-bucketed) variant as the scale path.

Fp determinism: dot products are ordered folds (`F.aggregate` over
`zip_with`) in double precision — the same left-to-right order DuckDB's
list functions use — and results are rounded to 6 before ranking, with
vec_id as the tiebreak, so ranks are engine-independent.

Scale notes: brute-force is query-broadcast x corpus-scan (no shuffle on
the corpus side; fine for small query sets over any corpus size). The IVF
variant joins on the partition key (label) so each query only scans its
cell — the standard recall/cost trade at 10^9+ vectors.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from harvesting_validator_spark.queries.common import dround, spread_tbl, tbl

N_QUERIES = 8
TOP_K = 5
# embeddings table width — shared by the unrolled kernels, the hyperplane
# weights, and the DuckDB oracle SQL (range(1, 65)); ONE constant so the
# Spark kernels and their oracles cannot silently disagree
N_DIMS = 64


def _as_double(col):
    return F.transform(F.col(col), lambda x: x.cast("double"))


def _ltr_sum(terms):
    """Left-to-right chained addition — the exact fp order of the r5
    ``F.aggregate`` fold and of DuckDB's list functions, as codegen
    arithmetic instead of an interpreted higher-order function."""
    s = terms[0]
    for t in terms[1:]:
        s = s + t
    return s


def _dot(a, b):
    return _ltr_sum(
        [F.element_at(a, i) * F.element_at(b, i) for i in range(1, N_DIMS + 1)]
    )


def _norm(a):
    return F.sqrt(
        _ltr_sum(
            [F.element_at(a, i) * F.element_at(a, i) for i in range(1, N_DIMS + 1)]
        )
    )


def _cosine(a, b):
    """r6: unrolled element_at arithmetic (guide §4.1 — higher-order
    lambdas like aggregate/zip_with run interpreted per row; the r5 fold
    cost ~10x the arithmetic on the 400k-pair brute-force scan). The
    chained adds keep the fold's left-to-right order, so every double is
    bit-identical to the r5 expression and to DuckDB's list_sum."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def q_cosine_topk(spark, sf_dir):
    """Brute-force exact top-k: the correctness baseline every ANN variant
    is measured against. r6: norms attach per VECTOR before the cross
    join (one norm per corpus row instead of one per (query, row) pair);
    the division q_norm * v_norm multiplies the same doubles the fused
    expression produced, so cos stays bit-identical."""
    e = spread_tbl(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double("embedding").alias("v")
    ).withColumn("nrm", _norm(F.col("v")))
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"),
    )
    pairs = F.broadcast(q).crossJoin(e).filter(F.col("q_id") != F.col("vec_id"))
    scored = pairs.select(
        "q_id",
        F.col("vec_id").alias("neighbor_id"),
        dround(
            _dot(F.col("qv"), F.col("v")) / (F.col("qnrm") * F.col("nrm")), 6
        ).alias("cos"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("q_id", "neighbor_id", "cos", "rank")
    )


_COS_SQL = """
round(
  list_sum(list_transform(range(1, 65),
           i -> q.v[i] * e.v[i]))
  / (sqrt(list_sum(list_transform(q.v, x -> x * x)))
     * sqrt(list_sum(list_transform(e.v, x -> x * x)))), 6)
"""

O_COSINE_TOPK = f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS q_id, v FROM v WHERE vec_id < {N_QUERIES}),
e AS (SELECT vec_id, v FROM v),
scored AS (
  SELECT q.q_id, e.vec_id AS neighbor_id, {_COS_SQL} AS cos
  FROM q JOIN e ON q.q_id <> e.vec_id
)
SELECT q_id, neighbor_id, cos,
       CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id) AS INT) AS rank
FROM scored
QUALIFY rank <= {TOP_K}
"""


def q_cosine_topk_ivf(spark, sf_dir):
    """IVF-style: restrict each query's scan to its own coarse cell
    (label) — equi-join on the cell id instead of a cross join."""
    e = spread_tbl(spark, sf_dir, "embeddings").select(
        "vec_id", "label", _as_double("embedding").alias("v")
    )
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("label").alias("q_label"),
        F.col("v").alias("qv"),
    )
    pairs = (
        F.broadcast(q)
        .join(e, F.col("q_label") == F.col("label"))
        .filter(F.col("q_id") != F.col("vec_id"))
    )
    scored = pairs.select(
        "q_id",
        F.col("vec_id").alias("neighbor_id"),
        dround(_cosine(F.col("qv"), F.col("v")), 6).alias("cos"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("q_id", "neighbor_id", "cos", "rank")
    )


O_COSINE_IVF = f"""
WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS q_id, label AS q_label, v FROM v WHERE vec_id < {N_QUERIES}),
e AS (SELECT vec_id, label, v FROM v),
scored AS (
  SELECT q.q_id, e.vec_id AS neighbor_id, {_COS_SQL} AS cos
  FROM q JOIN e ON q.q_label = e.label AND q.q_id <> e.vec_id
)
SELECT q_id, neighbor_id, cos,
       CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id) AS INT) AS rank
FROM scored
QUALIFY rank <= {TOP_K}
"""


N_PLANES = 4


def _plane_weights() -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes from md5 — reproducible
    bit-for-bit in the DuckDB oracle (same formula inline in SQL)."""
    import hashlib

    return [
        [
            (int(hashlib.md5(f"{p}:{j}".encode()).hexdigest()[:8], 16) % 2001
             - 1000) / 1000.0
            for j in range(N_DIMS)
        ]
        for p in range(N_PLANES)
    ]


def _bucket_col(v):
    """Random-hyperplane LSH bucket id: sign bits of P dot products."""
    bucket = F.lit(0)
    for p, w in enumerate(_plane_weights()):
        wl = F.array(*[F.lit(x) for x in w])
        dot = F.aggregate(
            F.zip_with(v, wl, lambda a, b: a * b), F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(dot >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


_PLANE_SQL_TERMS = " + ".join(
    f"(CASE WHEN list_sum(list_transform(range(1, {N_DIMS + 1}), "
    f"j -> v[j] * ((('0x' || substr(md5({p} || ':' || (j - 1)), 1, 8))::BIGINT "
    f"% 2001 - 1000) / 1000.0))) >= 0 THEN {1 << p} ELSE 0 END)"
    for p in range(N_PLANES)
)


def q_ann_lsh_buckets(spark, sf_dir):
    """Scale path #2: random-hyperplane LSH bucketing — unlike the IVF
    variant it needs no precomputed cell labels, so it works on raw
    embeddings at any scale (buckets are the blocking key of the ANN
    join)."""
    e = tbl(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double("embedding").alias("v")
    )
    return e.select("vec_id", _bucket_col(F.col("v")).alias("bucket"))


O_ANN_BUCKETS = f"""
SELECT vec_id, CAST({_PLANE_SQL_TERMS} AS INT) AS bucket
FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
"""


def q_ann_lsh_topk(spark, sf_dir):
    """Top-k restricted to the query's LSH bucket: the ANN recall/cost
    trade at 10^9+ vectors (equi-join on bucket replaces the cross join)."""
    e = tbl(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double("embedding").alias("v")
    ).withColumn("bucket", _bucket_col(F.col("v")))
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("bucket").alias("q_bucket"),
        F.col("v").alias("qv"),
    )
    pairs = (
        F.broadcast(q)
        .join(e, F.col("q_bucket") == F.col("bucket"))
        .filter(F.col("q_id") != F.col("vec_id"))
    )
    scored = pairs.select(
        "q_id",
        F.col("vec_id").alias("neighbor_id"),
        dround(_cosine(F.col("qv"), F.col("v")), 6).alias("cos"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("q_id", "neighbor_id", "cos", "rank")
    )


O_ANN_TOPK = f"""
WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
v AS (
  SELECT vec_id, v, CAST({_PLANE_SQL_TERMS} AS INT) AS bucket FROM base
),
q AS (SELECT vec_id AS q_id, bucket AS q_bucket, v FROM v WHERE vec_id < {N_QUERIES}),
e AS (SELECT vec_id, bucket, v FROM v),
scored AS (
  SELECT q.q_id, e.vec_id AS neighbor_id, {_COS_SQL} AS cos
  FROM q JOIN e ON q.q_bucket = e.bucket AND q.q_id <> e.vec_id
)
SELECT q_id, neighbor_id, cos,
       CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id) AS INT) AS rank
FROM scored
QUALIFY rank <= {TOP_K}
"""


def q_embedding_norms(spark, sf_dir):
    """Per-vector L2 norm + cell stats — the precompute an IVF index
    materializes once so the query path never recomputes norms."""
    e = tbl(spark, sf_dir, "embeddings").select(
        "vec_id", "label", _as_double("embedding").alias("v")
    )
    norm = F.sqrt(
        F.aggregate(
            F.transform(F.col("v"), lambda x: x * x),
            F.lit(0.0),
            lambda s, x: s + x,
        )
    )
    return e.select("vec_id", "label", dround(norm, 6).alias("l2_norm"))


O_NORMS = """
SELECT vec_id, label,
       round(sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))), 6) AS l2_norm
FROM embeddings
"""


# --- per-label centroids (the k-means / IVF training step) --------------------
def q_embedding_centroids(spark, sf_dir):
    """Element-wise mean embedding per label — the centroid update step
    of k-means / IVF coarse-quantizer training. posexplode → one
    (label, pos)-keyed groupBy with map-side partial sums; at 10^9
    vectors the shuffle carries only dim × labels partials per map task.

    Fp determinism: each element is summed as DECIMAL(28,9) (double →
    decimal is unambiguous at scale ≥ 1: a binary double can never land
    exactly on a decimal half-boundary), so the sum is exact and
    order-independent; the mean divides once in double at the end.
    """
    e = tbl(spark, sf_dir, "embeddings").select(
        "label", F.posexplode("embedding").alias("pos", "val")
    )
    return (
        e.groupBy("label", "pos")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.sum(F.col("val").cast("double").cast("decimal(28,9)")).alias("s"),
        )
        .select(
            "label",
            "pos",
            "n_vectors",
            dround(F.col("s").cast("double") / F.col("n_vectors"), 6).alias(
                "mean_val"
            ),
        )
    )


O_CENTROIDS = """
WITH t AS (
  SELECT label, u.pos AS pos,
         CAST(CAST(embedding[u.pos + 1] AS DOUBLE) AS DECIMAL(28,9)) AS val
  FROM embeddings, unnest(range(0, len(embedding))) AS u(pos)
)
SELECT label, CAST(pos AS INT) AS pos,
       CAST(count(*) AS BIGINT) AS n_vectors,
       round(CAST(sum(val) AS DOUBLE) / count(*), 6) AS mean_val
FROM t GROUP BY label, pos
"""


# --- int8 symmetric quantization (embedding-store compression) ----------------
def q_embedding_quantize(spark, sf_dir):
    """Per-vector symmetric int8 quantization — the storage/serving
    compression step of an embedding store (4x smaller than fp32,
    8x smaller than the fp64 compute form): scale = max|x| / 127,
    q_i = halfup(x_i / scale). Reported per vector: the max-abs
    (dequant scale numerator), the integer sum of |q| (bit-exact
    cross-engine: quantized codes are integers), and the max absolute
    reconstruction error.

    Determinism: elementwise doubles + floor(x + 0.5) half-up (the repo
    rounding recipe) — no reduction-order ambiguity (per-list ops are
    sequential on both engines, and the only sum is over integers).
    Narrow map over the store, no shuffle at all."""
    e = tbl(spark, sf_dir, "embeddings").select(
        "vec_id", "label", _as_double("embedding").alias("v")
    )
    maxabs = F.array_max(F.transform(F.col("v"), F.abs))
    e = e.withColumn("maxabs", maxabs)

    def quant(x):
        # halfup(x / maxabs * 127); all-zero vectors quantize to 0
        return F.when(
            F.col("maxabs") == 0.0, F.lit(0).cast("bigint")
        ).otherwise(
            F.floor(x / F.col("maxabs") * 127.0 + 0.5).cast("bigint")
        )

    sum_abs_q = F.aggregate(
        F.transform(F.col("v"), lambda x: F.abs(quant(x))),
        F.lit(0).cast("bigint"),
        lambda s, x: s + x,
    )
    max_err = F.array_max(
        F.zip_with(
            F.col("v"),
            F.transform(F.col("v"), quant),
            lambda x, q: F.when(F.col("maxabs") == 0.0, F.lit(0.0)).otherwise(
                F.abs(q.cast("double") * F.col("maxabs") / 127.0 - x)
            ),
        )
    )
    return e.select(
        "vec_id",
        "label",
        dround(F.col("maxabs"), 6).alias("max_abs"),
        sum_abs_q.alias("sum_abs_q"),
        dround(max_err, 6).alias("max_recon_err"),
    )


O_QUANTIZE = """
WITH e AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS v,
         list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) AS maxabs
  FROM embeddings
)
SELECT vec_id, label,
       round(maxabs, 6) AS max_abs,
       CAST(CASE WHEN maxabs = 0 THEN 0 ELSE
         list_sum(list_transform(v, x -> abs(floor(x / maxabs * 127 + 0.5))))
       END AS BIGINT) AS sum_abs_q,
       round(CASE WHEN maxabs = 0 THEN 0 ELSE
         list_max(list_transform(v,
           x -> abs(floor(x / maxabs * 127 + 0.5) * maxabs / 127 - x)))
       END, 6) AS max_recon_err
FROM e
"""


QUERIES = {
    "cosine_topk": q_cosine_topk,
    "cosine_topk_ivf": q_cosine_topk_ivf,
    "ann_lsh_buckets": q_ann_lsh_buckets,
    "ann_lsh_topk": q_ann_lsh_topk,
    "embedding_norms": q_embedding_norms,
    "embedding_centroids": q_embedding_centroids,
    "embedding_quantize": q_embedding_quantize,
}

ORACLES = {
    "cosine_topk": O_COSINE_TOPK,
    "cosine_topk_ivf": O_COSINE_IVF,
    "ann_lsh_buckets": O_ANN_BUCKETS,
    "ann_lsh_topk": O_ANN_TOPK,
    "embedding_norms": O_NORMS,
    "embedding_centroids": O_CENTROIDS,
    "embedding_quantize": O_QUANTIZE,
}
