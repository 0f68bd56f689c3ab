"""Structured-Streaming ingestion for the validation pipeline.

The reference is event-driven micro-batch (one /delta notification -> one
task run; no watermarks or event-time state — SURVEY.md §2.10), so the
faithful streaming mapping is a file-source ``readStream`` over the
landing directory of source batches with ``foreachBatch`` running the SAME
batch pipeline through the incremental ledger. Exactly-once-per-doc comes
from the ledger's anti-join (doc-level dedup), not from sink
transactionality — replayed micro-batches are no-ops.

At cluster scale the landing dir is the Iceberg sources table and
``readStream.format("iceberg")`` tails snapshots; the storage seam is
confined to ``stream_sources``. Checkpointing: Spark's own streaming
checkpoint (offsets) + our ledger (doc-level) + lineage.py (stage-level)
— three independent resume layers, any one of which suffices.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.types import StructType

from harvesting_validator_spark import fs

SOURCE_SCHEMA = (
    StructType()
    .add("repo", "string")
    .add("path", "string")
    .add("commit", "string")
    .add("lang", "string")
    .add("content", "string")
)


def stream_sources(spark: SparkSession, landing_dir: str):
    """File-source stream of parquet batches landing in a directory."""
    return (
        spark.readStream.schema(SOURCE_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .parquet(landing_dir)
    )


def run_streaming_validation(
    spark: SparkSession,
    landing_dir: str,
    shapes_turtle: str,
    warehouse: str,
    available_now: bool = True,
):
    """Validate source documents as they land. Returns the started query;
    callers await termination (or run continuously in production)."""
    from harvesting_validator_spark.incremental import process_incremental

    def handle_batch(batch_df, batch_id: int) -> None:
        # the ledger makes replays idempotent, so at-least-once file
        # delivery + doc-level dedup = effectively-once outputs
        process_incremental(
            spark, batch_df, shapes_turtle, warehouse, run_id=f"stream-{batch_id}"
        )

    writer = (
        stream_sources(spark, landing_dir)
        .writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", fs.join(warehouse, "_stream_checkpoint"))
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
