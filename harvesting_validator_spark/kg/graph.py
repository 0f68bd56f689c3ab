"""Canonical-graph materialization: rewrite subj/obj through the
canonical mapping, then global dropDuplicates on (subj, pred, obj) — the
north_rule's "deduplicated (subj, pred, obj) graph".

Scale notes: the mapping table is (entities, canonical) — tiny relative
to triples — so both rewrites are broadcast joins when it fits, shuffle
joins keyed on the rewritten column otherwise (Spark picks via AQE). The
final dedup shuffles once on the full (s,p,o) key; partition the sink by
bucket(pred) so hot predicates (rdf:type) spread across files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TRIPLE_COLS = ["subj", "pred", "obj_value", "obj_kind", "obj_datatype", "obj_lang"]


def rewrite_to_canonical(triples: DataFrame, mapping: DataFrame) -> DataFrame:
    """Replace subj and IRI-objects by their canonical id."""
    m_s = mapping.select(
        F.col("entity").alias("_s_ent"), F.col("canonical").alias("_s_canon")
    )
    m_o = mapping.select(
        F.col("entity").alias("_o_ent"), F.col("canonical").alias("_o_canon")
    )
    out = (
        triples.join(m_s, triples.subj == m_s._s_ent, "left")
        .withColumn("subj", F.coalesce("_s_canon", "subj"))
        .drop("_s_ent", "_s_canon")
    )
    out = (
        out.join(
            m_o,
            (out.obj_kind != "literal") & (out.obj_value == m_o._o_ent),
            "left",
        )
        .withColumn("obj_value", F.coalesce("_o_canon", "obj_value"))
        .drop("_o_ent", "_o_canon")
    )
    return out


def dedup_graph(triples: DataFrame) -> DataFrame:
    """Global (s,p,o) dedup — doc_id provenance is dropped; one row per
    distinct triple (Jena Model set semantics at corpus scale)."""
    return triples.select(*TRIPLE_COLS).dropDuplicates(
        ["subj", "pred", "obj_value", "obj_kind", "obj_datatype", "obj_lang"]
    )


def materialize_graph(
    triples: DataFrame, path: str, partition_buckets: int = 64
) -> None:
    """Write the canonical graph partitioned by a bucketed predicate hash
    (Iceberg analog: PARTITIONED BY (bucket(64, pred)); plain parquet here
    since no Iceberg runtime jar ships in this sandbox — SURVEY §7 stage 0
    storage seam)."""
    (
        triples.withColumn(
            "pred_bucket", F.pmod(F.xxhash64("pred"), F.lit(partition_buckets))
        )
        .repartition("pred_bucket")
        .write.mode("overwrite")
        .partitionBy("pred_bucket")
        .parquet(path)
    )
