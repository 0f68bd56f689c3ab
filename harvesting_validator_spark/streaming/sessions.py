"""Streaming sessionization via native session windows (task brief:
Structured Streaming coverage; complements the batch gap-sessionization
operator `queries/eventops.py::q_sessionize_events`).

Where the batch operator numbers sessions with a lag + running-sum window
over a static table, the streaming form uses Spark's `session_window`
aggregation: per-key sessions grow while events keep arriving within the
gap, merge when a bridging event connects two open sessions, and emit
exactly once (append mode) when the event-time watermark passes the
session's end. State per key is bounded by the watermark horizon — the
engine drops sessions the watermark has sealed, so long-running streams
don't accumulate state.

Scale notes: the shuffle is one keyed exchange on the session key
(user/source), identical to any streaming groupBy; skewed keys are the
same salting problem as batch and the watermark bounds both state size
and emission latency. Append mode is the right contract for downstream
parquet/Iceberg appends (each session row lands exactly once).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import functions as F

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame


def sessionized_user_stats(
    events: "DataFrame",
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
) -> "DataFrame":
    """events: STREAMING DataFrame with (event_time timestamp, user
    string, value double). Returns the append-mode stream of
    (session_start, session_end, user, n_events, total_value) rows — one
    per closed session, where a session is the maximal run of a user's
    events with consecutive gaps < `gap`. `session_end` is Spark's
    session-window end (last event + gap). Events later than `watermark`
    behind the stream's max event time are dropped; anything inside the
    horizon merges into (or bridges) its original session before the
    session seals."""
    return (
        events.withWatermark("event_time", watermark)
        .groupBy(F.session_window("event_time", gap).alias("s"), "user")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2)
            .alias("total_value"),
        )
        .select(
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "user",
            "n_events",
            "total_value",
        )
    )
