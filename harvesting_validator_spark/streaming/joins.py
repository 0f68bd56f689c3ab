"""Watermarked stream-stream interval join (task brief: Structured
Streaming coverage; completes the join matrix next to the stream-static
enrichment in enrich.py).

Correlates two live streams — here "error" events against the same
user's "action" events that preceded them within a bounded interval —
the alerting/root-cause shape ("what did the user do in the 10 minutes
before the error?"). Unlike the batch as-of join (one sorted pass), a
stream-stream join must BUFFER both sides; the two watermarks plus the
time-bound predicate are what let Spark evict state: an action row can
be dropped once the error-side watermark passes its timestamp + the
interval, so state is bounded by (stream rate × horizon), independent of
stream lifetime. Append mode emits a match exactly once, when both
watermarks seal it.

Scale notes: the join keys on user — one keyed exchange per side, the
same partitioning any per-user operator uses; a hot user is the standard
salting problem. The time-bound condition is REQUIRED: without it the
state store grows without bound and Spark rejects the append-mode plan.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import functions as F

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame


def errors_with_recent_actions(
    errors: "DataFrame",
    actions: "DataFrame",
    interval: str = "10 minutes",
    watermark: str = "5 minutes",
) -> "DataFrame":
    """errors: STREAMING (err_time timestamp, user string, err_id string).
    actions: STREAMING (act_time timestamp, user string, act_id string).
    Returns the append-mode stream of (user, err_id, act_id, err_time,
    act_time) pairs where the action happened in [err_time - interval,
    err_time] for the same user — each pair exactly once."""
    e = errors.withWatermark("err_time", watermark)
    a = actions.withWatermark("act_time", watermark)
    cond = (
        (e["user"] == a["user"])
        & (a["act_time"] <= e["err_time"])
        & (a["act_time"] >= e["err_time"] - F.expr(f"INTERVAL {interval}"))
    )
    return e.join(a, cond, "inner").select(
        e["user"].alias("user"),
        "err_id",
        "act_id",
        "err_time",
        "act_time",
    )
