"""Stream-static enrichment join (task brief: Structured Streaming
coverage): a micro-batch event stream joined against a static dimension
table, then rolled up per event-time window and dimension attribute.

This is the canonical "enrich the firehose" shape — the static side is a
slowly-changing dim (here: user → segment) that Spark re-resolves per
micro-batch, so swapping the dim's underlying files between batches is
picked up without restarting the stream. The join carries NO streaming
state (unlike stream-stream joins): at 100 TB/day the stream side flows
through map tasks and the dim side broadcasts — the same plan shape as
the batch engine's constant-dim joins (PLANS.md §2), just re-planned per
batch.

Scale notes: broadcast is forced only because a user dim is
constant-size relative to the stream; a growing dim would drop the hint
and let statistics decide (repo invariant). Aggregation state is bounded
by (#windows in the watermark horizon) × (#segments), independent of
stream volume.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import functions as F

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame


def enriched_segment_stats(
    events: "DataFrame",
    user_dims: "DataFrame",
    window_duration: str = "10 minutes",
    watermark: str = "5 minutes",
) -> "DataFrame":
    """events: STREAMING DataFrame (event_time timestamp, user string,
    value double). user_dims: STATIC DataFrame (user string, segment
    string). Returns the append-mode stream of (window_start, segment,
    n_events, total_value) — one row per closed window × segment; events
    whose user is missing from the dim fold into segment 'unknown'
    (left join, so the stream never drops rows on dim gaps)."""
    joined = events.join(F.broadcast(user_dims), "user", "left").withColumn(
        "segment", F.coalesce("segment", F.lit("unknown"))
    )
    return (
        joined.withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", window_duration).alias("w"), "segment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2
            ).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "segment",
            "n_events",
            "total_value",
        )
    )
