"""Event-time windowed aggregation with watermarked late-data handling
(task brief: "watermarks + windowed aggs for late data").

The reference's delta intake is purely processing-time (one POST -> one
run, `AppController.java:27-45`), so the batch engine needs no event-time
semantics. A harvesting DEPLOYMENT, though, wants per-window ingest
observability — "how many docs (and how many conforming) landed per
source per 10-minute event-time window" — where events arrive out of
order and stragglers must be folded into their ORIGINAL window until a
lateness bound, then dropped so state stays finite. That is exactly
Spark's watermarked tumbling-window aggregation; this module is the thin,
tested assembly of it for the pipeline's verdict stream.

Scale notes: state per (window, source) group only — bounded by
(#windows within the watermark horizon) x (#sources), independent of doc
count; the shuffle is the same keyed exchange as any groupBy. Append
output mode emits each window exactly once, when the watermark passes its
end — the right sink contract for downstream parquet/Iceberg appends.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import functions as F

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame


def windowed_ingest_stats(
    events: "DataFrame",
    window_duration: str = "10 minutes",
    watermark: str = "20 minutes",
) -> "DataFrame":
    """events: STREAMING DataFrame with (event_time timestamp, source
    string, conforms boolean). Returns the append-mode stream of
    (window_start, window_end, source, n_docs, n_conforming) rows, one
    per closed window — late rows within `watermark` fold into their
    original window; later than that they are dropped (state stays
    bounded)."""
    return (
        events.withWatermark("event_time", watermark)
        .groupBy(
            F.window("event_time", window_duration).alias("w"),
            "source",
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("conforms").cast("int")).alias("n_conforming"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "source",
            "n_docs",
            "n_conforming",
        )
    )
