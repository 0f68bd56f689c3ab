"""Text-analysis operators for the training-data pipeline (task brief):
language-ID heuristic, quality scoring, token counting, document
fingerprinting. All pure Catalyst expressions over the `documents` table —
no Python UDFs — so each has an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from harvesting_validator_spark.queries.common import dround, tbl, tokens

# words that also occur in the synthetic corpus's vocabulary
STOPWORDS = ["the", "a", "of", "and", "in", "to", "is"]
_STOP_SQL = "', '".join(STOPWORDS)


# --- token counting -----------------------------------------------------------
def q_token_stats(spark, sf_dir):
    d = tbl(spark, sf_dir, "documents")
    toks = tokens()
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
    )


O_TOKEN_STATS = """
SELECT doc_id,
       len(string_split(text, ' ')) AS n_tokens,
       len(list_distinct(string_split(text, ' '))) AS n_distinct
FROM documents
"""

# BPE-ish pre-tokenizer: word pieces OR single non-space symbols — the
# regex family GPT-style tokenizers apply before merges
_BPE_RE = "[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\\s]"


def q_token_stats_bpe(spark, sf_dir):
    d = tbl(spark, sf_dir, "documents")
    toks = F.regexp_extract_all("text", F.lit(_BPE_RE), 0)
    return d.select(
        "doc_id",
        F.size(toks).alias("n_pieces"),
        F.size(F.array_distinct(toks)).alias("n_distinct_pieces"),
    )


O_TOKEN_BPE = f"""
SELECT doc_id,
       len(regexp_extract_all(text, '{_BPE_RE}')) AS n_pieces,
       len(list_distinct(regexp_extract_all(text, '{_BPE_RE}'))) AS n_distinct_pieces
FROM documents
"""


# --- language ID (stopword-overlap heuristic) ----------------------------------
def q_lang_id(spark, sf_dir):
    d = tbl(spark, sf_dir, "documents")
    toks = tokens()
    n_stop = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS)))
    ratio = dround(n_stop.cast("double") / F.size(toks), 6)
    return d.select(
        "doc_id",
        ratio.alias("stop_ratio"),
        (ratio > 0.04).alias("pred_en"),
        "lang",
    )


O_LANG_ID = f"""
SELECT doc_id,
       round(CAST(len(list_filter(string_split(text, ' '),
                                  t -> t IN ('{_STOP_SQL}'))) AS DOUBLE)
             / len(string_split(text, ' ')), 6) AS stop_ratio,
       round(CAST(len(list_filter(string_split(text, ' '),
                                  t -> t IN ('{_STOP_SQL}'))) AS DOUBLE)
             / len(string_split(text, ' ')), 6) > 0.04 AS pred_en,
       lang
FROM documents
"""


# --- quality scoring ------------------------------------------------------------
def q_quality_score(spark, sf_dir):
    """Length / mean-token-length / stopword-ratio composite — the standard
    cheap pre-filter in web-scale corpus curation."""
    d = tbl(spark, sf_dir, "documents")
    toks = tokens()
    n_tok = F.size(toks)
    sum_len = F.aggregate(
        F.transform(toks, F.length),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    mean_tok = dround(sum_len.cast("double") / n_tok, 6)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS)))
    stop_ratio = dround(n_stop.cast("double") / n_tok, 6)
    quality = dround(
        F.least(F.lit(1.0), n_tok.cast("double") / 100.0) * (F.lit(1.0) - stop_ratio),
        6,
    )
    return d.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        mean_tok.alias("mean_tok_len"),
        stop_ratio.alias("stop_ratio"),
        quality.alias("quality"),
    )


O_QUALITY = f"""
WITH t AS (
  SELECT doc_id,
         string_split(text, ' ') AS toks,
         len(string_split(text, ' ')) AS n_tokens
  FROM documents
)
SELECT doc_id,
       n_tokens,
       round(CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / n_tokens, 6) AS mean_tok_len,
       round(CAST(len(list_filter(toks, x -> x IN ('{_STOP_SQL}'))) AS DOUBLE) / n_tokens, 6) AS stop_ratio,
       round(least(1.0, CAST(n_tokens AS DOUBLE) / 100.0)
             * (1.0 - round(CAST(len(list_filter(toks, x -> x IN ('{_STOP_SQL}'))) AS DOUBLE) / n_tokens, 6)), 6) AS quality
FROM t
"""


# --- document fingerprint (rolling polynomial hash over tokens) ------------------
_MOD = 1_000_000_007


def q_fingerprint(spark, sf_dir):
    """Order-sensitive rolling hash h = fold((acc*31 + md5int(tok)) % M):
    two docs share a fingerprint iff their token sequences are identical.
    Ordered fold (F.aggregate) keeps it deterministic under repartitioning."""
    d = tbl(spark, sf_dir, "documents")
    hashed = F.transform(
        tokens(),
        lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("bigint"),
    )
    fp = F.aggregate(
        hashed,
        F.lit(0).cast("bigint"),
        lambda acc, x: (acc * 31 + x) % _MOD,
    )
    return d.select("doc_id", fp.alias("fingerprint"))


O_FINGERPRINT = f"""
SELECT doc_id,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           list_transform(string_split(text, ' '),
                          t -> ('0x' || substr(md5(t), 1, 8))::BIGINT)),
         (acc, x) -> (acc * 31 + x) % {_MOD}) AS fingerprint
FROM documents
"""


QUERIES = {
    "token_stats": q_token_stats,
    "token_stats_bpe": q_token_stats_bpe,
    "lang_id": q_lang_id,
    "quality_score": q_quality_score,
    "fingerprint": q_fingerprint,
}

ORACLES = {
    "token_stats": O_TOKEN_STATS,
    "token_stats_bpe": O_TOKEN_BPE,
    "lang_id": O_LANG_ID,
    "quality_score": O_QUALITY,
    "fingerprint": O_FINGERPRINT,
}
