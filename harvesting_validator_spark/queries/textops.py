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


# --- repetition-based quality filter (Gopher-style) ----------------------------
def q_quality_repetition(spark, sf_dir):
    """Per-doc repetition metrics (the Gopher/C4 family of corpus
    filters): distinct-token ratio and the most-common-token fraction.

    The top-token count is computed WITHOUT a shuffle: sort the token
    array, then a single ordered fold (F.aggregate) finds the longest
    run of equal adjacent tokens — identical to max per-token count, but
    it stays a narrow per-row expression instead of an
    explode + groupBy(doc, token) + window (two shuffles at corpus
    scale). The DuckDB oracle intentionally uses the explode/groupBy
    formulation so the two derivations cross-check each other.
    """
    d = tbl(spark, sf_dir, "documents")
    toks = tokens()
    srt = F.array_sort(toks)
    init = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
    )

    def _merge(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    top_n = F.aggregate(srt, init, _merge, lambda acc: acc["best"])
    n_tok = F.size(toks)
    return d.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        top_n.alias("top_token_n"),
        dround(F.size(F.array_distinct(toks)).cast("double") / n_tok, 6).alias(
            "distinct_ratio"
        ),
        dround(top_n.cast("double") / n_tok, 6).alias("top_token_frac"),
    )


O_REPETITION = """
WITH t AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
c AS (SELECT doc_id, token, count(*) AS n FROM t GROUP BY doc_id, token),
a AS (
  SELECT doc_id,
         CAST(sum(n) AS INT) AS n_tokens,
         CAST(count(*) AS INT) AS n_distinct,
         CAST(max(n) AS INT) AS top_token_n
  FROM c GROUP BY doc_id
)
SELECT doc_id, n_tokens, top_token_n,
       round(CAST(n_distinct AS DOUBLE) / n_tokens, 6) AS distinct_ratio,
       round(CAST(top_token_n AS DOUBLE) / n_tokens, 6) AS top_token_frac
FROM a
"""


# --- PII detection / redaction --------------------------------------------------
# Java-regex AND RE2 compatible patterns (no lookaround, no backrefs)
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_PHONE = r"\+1-555-[0-9]{4}"
_PII_IP = r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b"


def q_pii_scrub(spark, sf_dir):
    """PII detection + redaction over the documents table. The synthetic
    corpus contains no PII, so the query first APPENDS deterministic
    doc_id-derived PII spans (emails on every 3rd doc, phones on every
    5th, IPv4s on every 7th) and then detects/redacts them — exercising
    the real scrub path with non-trivial counts while staying exactly
    reproducible. Pure Catalyst (regexp_count / regexp_replace), a
    narrow map at any scale; patterns chosen to mean the same thing in
    Java regex (Spark) and RE2 (DuckDB).
    """
    d = tbl(spark, sf_dir, "documents")
    did = F.col("doc_id")
    aug = F.concat(
        F.col("text"),
        F.when(
            did % 3 == 0,
            F.concat(
                F.lit(" mail user"), (did % 50).cast("string"), F.lit("@example.com")
            ),
        ).otherwise(F.lit("")),
        F.when(
            did % 5 == 0,
            F.concat(
                F.lit(" call +1-555-"),
                F.lpad((did % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            did % 7 == 0,
            F.concat(
                F.lit(" host 10."),
                (did % 256).cast("string"),
                F.lit(".0."),
                ((did * 7) % 256).cast("string"),
            ),
        ).otherwise(F.lit("")),
    )
    t = d.select("doc_id", aug.alias("aug"))
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace("aug", _PII_EMAIL, "<EMAIL>"), _PII_PHONE, "<PHONE>"
        ),
        _PII_IP,
        "<IP>",
    )
    return t.select(
        "doc_id",
        F.regexp_count("aug", F.lit(_PII_EMAIL)).alias("n_emails"),
        F.regexp_count("aug", F.lit(_PII_PHONE)).alias("n_phones"),
        F.regexp_count("aug", F.lit(_PII_IP)).alias("n_ips"),
        red.alias("redacted"),
    )


O_PII = f"""
WITH t AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 3 = 0
                 THEN ' mail user' || CAST(doc_id % 50 AS VARCHAR) || '@example.com'
                 ELSE '' END
         || CASE WHEN doc_id % 5 = 0
                 THEN ' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                 ELSE '' END
         || CASE WHEN doc_id % 7 = 0
                 THEN ' host 10.' || CAST(doc_id % 256 AS VARCHAR)
                      || '.0.' || CAST((doc_id * 7) % 256 AS VARCHAR)
                 ELSE '' END AS aug
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(aug, '{_PII_EMAIL}')) AS INT) AS n_emails,
       CAST(len(regexp_extract_all(aug, '{_PII_PHONE}')) AS INT) AS n_phones,
       CAST(len(regexp_extract_all(aug, '{_PII_IP}')) AS INT) AS n_ips,
       regexp_replace(
         regexp_replace(
           regexp_replace(aug, '{_PII_EMAIL}', '<EMAIL>', 'g'),
           '{_PII_PHONE}', '<PHONE>', 'g'),
         '{_PII_IP}', '<IP>', 'g') AS redacted
FROM t
"""


QUERIES = {
    "token_stats": q_token_stats,
    "token_stats_bpe": q_token_stats_bpe,
    "lang_id": q_lang_id,
    "quality_score": q_quality_score,
    "quality_repetition": q_quality_repetition,
    "pii_scrub": q_pii_scrub,
    "fingerprint": q_fingerprint,
}

ORACLES = {
    "token_stats": O_TOKEN_STATS,
    "token_stats_bpe": O_TOKEN_BPE,
    "lang_id": O_LANG_ID,
    "quality_score": O_QUALITY,
    "quality_repetition": O_REPETITION,
    "pii_scrub": O_PII,
    "fingerprint": O_FINGERPRINT,
}
