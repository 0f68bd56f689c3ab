"""Multimodal-operator queries. The asset payload is the UTF-8 bytes of
documents.text (a REAL binary column processed by numpy inside Arrow
batches), so the byte-level kernels stay DuckDB-checkable through the text
form: byte == ascii(char) for this ASCII corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from harvesting_validator_spark.multimodal import (
    FRAME_SIZE,
    N_FEATURES,
    RESIZE_TO,
    assets_from_documents,
    extract_features,
    resize_media,
    sample_frames,
)
from harvesting_validator_spark.queries.common import tbl


def _assets(spark, sf_dir):
    return assets_from_documents(tbl(spark, sf_dir, "documents"))


# --- feature extraction (byte histogram -> exploded rows for hashing) --------
def q_mm_features(spark, sf_dir):
    feats = extract_features(_assets(spark, sf_dir))
    return feats.select(
        "asset_id", F.posexplode("features").alias("bucket", "v")
    )


O_MM_FEATURES = f"""
SELECT doc_id AS asset_id, j AS bucket,
       round(CAST(len(list_filter(
                list_transform(range(1, length(text) + 1),
                               i -> ascii(substr(text, i, 1))),
                a -> a // 16 = j)) AS DOUBLE)
             / greatest(1, length(text)), 6) AS v
FROM documents, unnest(range(0, {N_FEATURES})) AS t(j)
"""


# --- nearest-neighbor resize ---------------------------------------------------
def q_mm_resized(spark, sf_dir):
    r = resize_media(_assets(spark, sf_dir))
    return r.select("asset_id", F.decode("resized", "UTF-8").alias("resized_str"))


O_MM_RESIZED = f"""
SELECT doc_id AS asset_id,
       array_to_string(
         list_transform(range(0, {RESIZE_TO}),
                        i -> substr(text, (i * length(text)) // {RESIZE_TO} + 1, 1)),
         '') AS resized_str
FROM documents
"""


# --- frame sampling (1 -> N explosion inside the Arrow kernel) ------------------
def q_mm_frames(spark, sf_dir):
    fr = sample_frames(_assets(spark, sf_dir))
    return fr.select(
        "asset_id", "frame_idx", F.decode("frame", "UTF-8").alias("frame_str")
    )


O_MM_FRAMES = f"""
SELECT doc_id AS asset_id, CAST(fi AS INT) AS frame_idx,
       substr(text, fi * {FRAME_SIZE} + 1, {FRAME_SIZE}) AS frame_str
FROM documents, unnest(range(0, length(text) // {FRAME_SIZE}, 2)) AS t(fi)
"""


# --- asset metadata rollup (typed meta struct exercised relationally) -----------
def q_mm_meta_rollup(spark, sf_dir):
    a = _assets(spark, sf_dir)
    return a.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("meta.width")).alias("total_width"),
        F.sum(F.length("media")).alias("total_bytes"),
    )


# NB DuckDB's bare integer sum() yields HUGEINT (int128) — the driver's
# Arrow fetch renders that differently from Spark's BIGINT, so every
# aggregate in oracle output MUST be cast to a concrete type (CLAUDE.md
# invariant). total_bytes uses strlen (DuckDB's BYTE length for VARCHAR;
# octet_length only accepts BLOB here) so byte-vs-char parity with
# F.length(binary media) survives a non-ASCII corpus.
O_MM_META = """
SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
       count(*) AS n,
       CAST(sum(length(text)) AS BIGINT) AS total_width,
       CAST(sum(strlen(text)) AS BIGINT) AS total_bytes
FROM documents
GROUP BY 1
"""


QUERIES = {
    "mm_features": q_mm_features,
    "mm_resized": q_mm_resized,
    "mm_frames": q_mm_frames,
    "mm_meta_rollup": q_mm_meta_rollup,
}

ORACLES = {
    "mm_features": O_MM_FEATURES,
    "mm_resized": O_MM_RESIZED,
    "mm_frames": O_MM_FRAMES,
    "mm_meta_rollup": O_MM_META,
}
