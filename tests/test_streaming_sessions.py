"""Streaming session windows: events within the gap extend a user's open
session; a bridging event MERGES two previously-separate open sessions;
sessions emit exactly once (append mode) when the watermark passes their
end; rows older than the watermark are dropped. Run as availableNow
executions over one checkpoint so session + watermark state must survive
restarts (same harness shape as test_streaming_windowed)."""

from __future__ import annotations

import os
from datetime import datetime

from harvesting_validator_spark.streaming.sessions import sessionized_user_stats

SCHEMA = "event_time timestamp, user string, value double"


def _t(hh, mm):
    return datetime(2026, 1, 1, hh, mm, 0)


def _land(spark, landing, name, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(
        os.path.join(landing, name)
    )


def _run(spark, tmp_path, landing):
    events = spark.readStream.schema(SCHEMA).option(
        "pathGlobFilter", "*.parquet"
    ).option("recursiveFileLookup", "true").parquet(landing)
    out = sessionized_user_stats(events, gap="10 minutes", watermark="5 minutes")
    sink = str(tmp_path / "out")
    q = (
        out.writeStream.format("parquet")
        .outputMode("append")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "availableNow run did not finish in 120s"
    try:
        rows = spark.read.parquet(sink).collect()
    except Exception:  # nothing emitted yet
        rows = []
    out_map = {
        (
            r.session_start.strftime("%H:%M"),
            r.session_end.strftime("%H:%M"),
            r.user,
        ): (r.n_events, r.total_value)
        for r in rows
    }
    assert len(rows) == len(out_map), "session re-emitted"
    return out_map


def test_session_extend_close_and_drop_late(spark, tmp_path):
    landing = str(tmp_path / "landing")
    os.makedirs(landing)

    # run 1: u1 at 10:00 and 10:05 coalesce into ONE open session
    # [10:00, 10:15); watermark = 10:05 - 5 = 10:00 < session end ->
    # nothing emitted.
    _land(spark, landing, "b1", [(_t(10, 0), "u1", 1.0), (_t(10, 5), "u1", 2.0)])
    assert _run(spark, tmp_path, landing) == {}

    # run 2 (state recovered from checkpoint): u1 at 10:07 overlaps the
    # open session and EXTENDS it to [10:00, 10:17); u2 at 11:00 pushes
    # the watermark to 10:55 -> u1's session seals with all 3 events;
    # u2's own session [11:00, 11:10) stays open.
    _land(spark, landing, "b2", [(_t(10, 7), "u1", 3.0), (_t(11, 0), "u2", 5.0)])
    assert _run(spark, tmp_path, landing) == {
        ("10:00", "10:17", "u1"): (3, 6.0),
    }

    # run 3: u1 at 10:30 is OLDER than the watermark (10:55) -> dropped,
    # no resurrected session; u3 at 12:00 pushes the watermark to 11:55
    # -> u2's session (end 11:10) seals. Earlier sessions are not
    # re-emitted (append-mode exactly-once per session).
    _land(spark, landing, "b3", [(_t(10, 30), "u1", 9.0), (_t(12, 0), "u3", 1.0)])
    assert _run(spark, tmp_path, landing) == {
        ("10:00", "10:17", "u1"): (3, 6.0),
        ("11:00", "11:10", "u2"): (1, 5.0),
    }


def test_bridging_event_merges_open_sessions(spark, tmp_path):
    """u1 opens two sessions [10:00, 10:10) and [10:12, 10:22) — separate
    because 10:12 >= 10:10. A late-but-in-horizon 10:08 event's own
    window [10:08, 10:18) overlaps BOTH, merging them into one session
    spanning [10:00, 10:22)."""
    landing = str(tmp_path / "landing")
    os.makedirs(landing)

    # watermark = 10:12 - 5 = 10:07 < both session ends -> both open
    _land(spark, landing, "b1", [(_t(10, 0), "u1", 1.0), (_t(10, 12), "u1", 2.0)])
    assert _run(spark, tmp_path, landing) == {}

    # 10:08 >= watermark (in horizon) bridges the two open sessions;
    # u2 at 11:00 pushes the watermark to 10:55 past the merged end ->
    # ONE merged session with all 3 events (1.0 + 2.0 + 4.0)
    _land(spark, landing, "b2", [(_t(10, 8), "u1", 4.0), (_t(11, 0), "u2", 1.0)])
    assert _run(spark, tmp_path, landing) == {
        ("10:00", "10:22", "u1"): (3, 7.0),
    }
