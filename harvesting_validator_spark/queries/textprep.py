"""Training-data preparation operators (task brief: "the operations a
large-scale training-data pipeline would need", beyond dedup/similarity/
text-analysis): context-window chunking, sequence packing, deterministic
stratified sampling (data mixing), tokenizer-vocabulary induction, and
benchmark decontamination. All pure Catalyst with exact DuckDB oracles.

Scale notes: chunking/sampling are narrow per-row maps (no shuffle);
vocab induction is one partial-aggregated groupBy + a bounded top-k;
packing is one window over (lang)-partitioned running sums — at corpus
scale the stratum key keeps window state executor-local; decontamination
joins the corpus n-gram stream against the BENCHMARK n-gram set, which is
small by construction (eval suites are ~10^3-10^5 docs) and broadcasts —
the canonical map-side decontamination shape at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from harvesting_validator_spark.queries.common import md5_int, tbl, tokens
from harvesting_validator_spark.queries.textops import STOPWORDS

CHUNK_TOKENS = 32
CHUNK_STRIDE = 24
PACK_BIN_TOKENS = 512
VOCAB_K = 100
CONTAM_GRAM = 3
# deterministic per-stratum sampling rates (data-mixing weights)
SAMPLE_RATES = {"en": 80, "de": 50, "fr": 50, "es": 50, "zh": 20}


# --- context-window chunking (fixed size + overlap, 1 doc -> N chunks) --------
def q_chunk_documents(spark, sf_dir):
    """Split each doc into CHUNK_TOKENS-token chunks every CHUNK_STRIDE
    tokens (overlap = CHUNK_TOKENS - CHUNK_STRIDE). Whitespace split never
    yields an empty array, so every doc emits >= 1 chunk."""
    d = tbl(spark, sf_dir, "documents")
    t = d.select("doc_id", tokens().alias("toks"), F.size(tokens()).alias("n"))
    e = t.select(
        "doc_id", "toks",
        F.posexplode(
            F.sequence(F.lit(0), F.col("n") - 1, F.lit(CHUNK_STRIDE))
        ).alias("chunk_idx", "start"),
    )
    chunk = F.slice(F.col("toks"), F.col("start") + 1, CHUNK_TOKENS)
    return e.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.size(chunk).alias("n_chunk_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


O_CHUNKS = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks,
                  len(string_split(text, ' ')) AS n FROM documents)
SELECT doc_id,
       CAST(s // {CHUNK_STRIDE} AS INT) AS chunk_idx,
       CAST(len(list_slice(toks, s + 1, s + {CHUNK_TOKENS})) AS INT) AS n_chunk_tokens,
       array_to_string(list_slice(toks, s + 1, s + {CHUNK_TOKENS}), ' ') AS chunk_text
FROM t, unnest(range(0, n, {CHUNK_STRIDE})) AS u(s)
"""


# --- sequence packing (fixed-budget bins via stratified running sums) ----------
def q_pack_sequences(spark, sf_dir):
    """Assign each doc to a PACK_BIN_TOKENS-budget training bin: docs are
    laid out in deterministic (lang, doc_id) order and a bin is the
    PACK_BIN_TOKENS-token window its first token lands in — the
    distributed-friendly streaming approximation of sequence packing
    (greedy first-fit is inherently serial; the running-sum layout is
    what large pipelines actually do)."""
    d = tbl(spark, sf_dir, "documents")
    t = d.select("doc_id", "lang", F.size(tokens()).alias("n_tokens"))
    w = Window.partitionBy("lang").orderBy("doc_id")
    start = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return t.select(
        "doc_id", "lang", "n_tokens",
        (start / PACK_BIN_TOKENS).cast("int").alias("bin_id"),
        start.cast("bigint").alias("bin_start_offset"),
    )


O_PACK = f"""
WITH t AS (SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tokens
           FROM documents),
c AS (SELECT doc_id, lang, n_tokens,
             sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id)
               - n_tokens AS start
      FROM t)
SELECT doc_id, lang, CAST(n_tokens AS INT) AS n_tokens,
       CAST(start // {PACK_BIN_TOKENS} AS INT) AS bin_id,
       CAST(start AS BIGINT) AS bin_start_offset
FROM c
"""


# --- deterministic stratified sampling (data mixing) ---------------------------
def q_stratified_sample(spark, sf_dir):
    """Hash-based per-stratum sampling: doc survives iff
    md5int(doc_id) % 100 < rate(lang). Deterministic (same doc always
    lands the same way — resumable mixing, C4), map-side only, and the
    rates are the data-mixing weights a trainer tunes."""
    d = tbl(spark, sf_dir, "documents")
    bucket = F.pmod(md5_int(F.col("doc_id").cast("string")), F.lit(100))
    rate = F.lit(0)
    for lang, r in SAMPLE_RATES.items():
        rate = F.when(F.col("lang") == lang, F.lit(r)).otherwise(rate)
    return (
        d.select("doc_id", "lang", bucket.cast("int").alias("bucket"))
        .filter(F.col("bucket") < rate)
    )


_RATE_SQL = "CASE lang " + " ".join(
    f"WHEN '{lang}' THEN {r}" for lang, r in SAMPLE_RATES.items()
) + " ELSE 0 END"

O_SAMPLE = f"""
SELECT doc_id, lang,
       CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS INT)
         AS bucket
FROM documents
WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < {_RATE_SQL}
"""


# --- tokenizer-vocabulary induction (top-k tokens by corpus frequency) ---------
def q_vocab_topk(spark, sf_dir):
    """Occurrence counts (not per-doc distinct) -> top VOCAB_K with a
    deterministic tiebreak — the first step of BPE/unigram vocabulary
    training. Partial aggregation map-side; only K rows cross the final
    ordering."""
    d = tbl(spark, sf_dir, "documents")
    return (
        d.select(F.explode(tokens()).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(VOCAB_K)
    )


O_VOCAB = f"""
SELECT token, count(*) AS n
FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
GROUP BY token
ORDER BY n DESC, token ASC
LIMIT {VOCAB_K}
"""


# --- benchmark decontamination (n-gram overlap vs a held-out eval set) ---------
def q_contamination_flags(spark, sf_dir):
    """Flag training docs sharing any CONTAM_GRAM-gram with the benchmark
    set (here: docs with doc_id % 97 == 0 stand in for an eval suite).
    Inner-join on the gram string against the (small, broadcastable)
    benchmark gram set, count distinct overlapping grams per doc."""
    from harvesting_validator_spark.queries.common import spread_tbl

    # r6: the few-MB bench parquet plans 1-2 splits, serializing the
    # n-gram explode onto 1-2 tasks; spread to full parallelism (no-op
    # at corpus scale — see spread_scan)
    d = spread_tbl(spark, sf_dir, "documents")
    t = d.select(
        "doc_id", tokens().alias("toks"), F.size(tokens()).alias("n")
    ).filter(F.col("n") >= CONTAM_GRAM)
    grams = t.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.col("n") - CONTAM_GRAM),
                _gram_at,
            )
        ).alias("gram"),
    )
    bench = (
        grams.filter(F.col("doc_id") % 97 == 0).select("gram").distinct()
    )
    return (
        grams.filter(F.col("doc_id") % 97 != 0)
        .join(bench, "gram")
        .groupBy("doc_id")
        .agg(F.countDistinct("gram").alias("n_contaminated"))
    )


def _gram_at(s):
    # factory-free here is safe: single-arg lambda (no index-binding trap)
    return F.array_join(F.slice(F.col("toks"), s + 1, CONTAM_GRAM), " ")


O_CONTAM = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks,
                  len(string_split(text, ' ')) AS n
           FROM documents WHERE len(string_split(text, ' ')) >= {CONTAM_GRAM}),
grams AS (
  SELECT doc_id, array_to_string(list_slice(toks, s + 1, s + {CONTAM_GRAM}), ' ') AS gram
  FROM t, unnest(range(0, n - {CONTAM_GRAM} + 1)) AS u(s)
),
bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 97 = 0)
SELECT g.doc_id, count(DISTINCT g.gram) AS n_contaminated
FROM grams g JOIN bench b ON g.gram = b.gram
WHERE g.doc_id % 97 != 0
GROUP BY g.doc_id
"""


# --- composed end-to-end corpus curation ---------------------------------------
# the pipeline a training-data run actually executes, as ONE dataflow:
# exact-dedup keep-list -> quality gate -> benchmark decontamination.
# All predicates are integer/boolean (no fp thresholds), so the survivor
# set is bit-identical on both engines.
CURATE_MIN_TOKENS = 12
CURATE_STOP_PCT = 45  # drop if 100*n_stop > 45*n_tokens


def q_curated_corpus(spark, sf_dir):
    """Survivors of the full curation funnel, (doc_id, lang, n_tokens).

    Scale shape: ONE content-hash groupBy for the keep-list (min doc_id
    per sha256(text), the dedup_exact shape), narrow integer quality
    predicates in the same scan, and a gram join whose build side is the
    (small) benchmark gram set — broadcast/statistics-decided, never the
    corpus against itself. Everything else is a map; at 100 TB the only
    corpus-wide shuffle is the dedup groupBy."""
    d = tbl(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text",
        tokens().alias("toks"), F.size(tokens()).alias("n_tok"),
    )
    # (a) exact dedup: keep the min doc_id per identical text
    keep = (
        d.groupBy(F.sha2("text", 256).alias("h"))
        .agg(F.min("doc_id").alias("keep_doc"))
        .select(F.col("keep_doc").alias("doc_id"))
    )
    kept = d.join(keep, "doc_id", "left_semi")
    # (b) quality gate: integer-exact length + stopword-ratio bounds
    n_stop = F.size(F.filter(F.col("toks"), lambda t: t.isin(STOPWORDS)))
    q = kept.filter(
        (F.col("n_tok") >= CURATE_MIN_TOKENS)
        & (F.lit(100) * n_stop <= F.lit(CURATE_STOP_PCT) * F.col("n_tok"))
    )
    # (c) decontamination: drop docs sharing any CONTAM_GRAM-gram with
    # the benchmark slice (doc_id % 97 == 0), and the slice itself
    grams = q.filter(F.col("doc_id") % 97 != 0).select(
        "doc_id", "lang", "n_tok",
        F.explode(
            F.transform(F.sequence(F.lit(0), F.col("n_tok") - CONTAM_GRAM), _gram_at)
        ).alias("gram"),
    )
    bench = (
        d.filter((F.col("doc_id") % 97 == 0) & (F.col("n_tok") >= CONTAM_GRAM))
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.col("n_tok") - CONTAM_GRAM), _gram_at
                )
            ).alias("gram")
        )
        .distinct()
    )
    contaminated = grams.join(bench, "gram").select("doc_id").distinct()
    return (
        q.filter(F.col("doc_id") % 97 != 0)
        .join(contaminated, "doc_id", "left_anti")
        .select("doc_id", "lang", F.col("n_tok").alias("n_tokens"))
    )


_STOP_IN = "', '".join(STOPWORDS)

O_CURATED = f"""
WITH d AS (
  SELECT doc_id, lang, text, string_split(text, ' ') AS toks,
         len(string_split(text, ' ')) AS n_tok
  FROM documents
),
keep AS (
  SELECT min(doc_id) AS doc_id FROM d GROUP BY sha256(text)
),
q AS (
  SELECT d.* FROM d JOIN keep USING (doc_id)
  WHERE n_tok >= {CURATE_MIN_TOKENS}
    AND 100 * len(list_filter(toks, t -> t IN ('{_STOP_IN}')))
        <= {CURATE_STOP_PCT} * n_tok
),
bench AS (
  SELECT DISTINCT array_to_string(list_slice(toks, s + 1, s + {CONTAM_GRAM}), ' ') AS gram
  FROM d, unnest(range(0, n_tok - {CONTAM_GRAM} + 1)) AS u(s)
  WHERE doc_id % 97 = 0 AND n_tok >= {CONTAM_GRAM}
),
contaminated AS (
  SELECT DISTINCT g.doc_id
  FROM (
    SELECT doc_id,
           array_to_string(list_slice(toks, s + 1, s + {CONTAM_GRAM}), ' ') AS gram
    FROM q, unnest(range(0, n_tok - {CONTAM_GRAM} + 1)) AS u(s)
    WHERE doc_id % 97 != 0
  ) g JOIN bench b ON g.gram = b.gram
)
SELECT doc_id, lang, CAST(n_tok AS INT) AS n_tokens
FROM q
WHERE doc_id % 97 != 0
  AND doc_id NOT IN (SELECT doc_id FROM contaminated)
"""


def q_doc_length_histogram(spark, sf_dir):
    """Per-language document-length histogram (r5): fixed 200-char
    buckets via INTEGER division (`DIV` — exact on both engines, no
    float binning drift), the corpus-diagnostics staple a curation run
    reads before picking chunk/filter thresholds. Map-side-combined
    groupBy to |langs|x|buckets| rows; zero joins, zero fp."""
    d = tbl(spark, sf_dir, "documents")
    return (
        d.select("lang", F.expr("n_chars DIV 200").alias("bucket"))
        .groupBy("lang", "bucket")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


O_LENGTH_HIST = """
SELECT lang,
       CAST(n_chars // 200 AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_docs
FROM documents
GROUP BY 1, 2
"""


QUERIES = {
    "chunk_documents": q_chunk_documents,
    "pack_sequences": q_pack_sequences,
    "stratified_sample": q_stratified_sample,
    "vocab_topk": q_vocab_topk,
    "contamination_flags": q_contamination_flags,
    "curated_corpus": q_curated_corpus,
    "doc_length_histogram": q_doc_length_histogram,
}

ORACLES = {
    "chunk_documents": O_CHUNKS,
    "pack_sequences": O_PACK,
    "stratified_sample": O_SAMPLE,
    "vocab_topk": O_VOCAB,
    "contamination_flags": O_CONTAM,
    "curated_corpus": O_CURATED,
    "doc_length_histogram": O_LENGTH_HIST,
}
