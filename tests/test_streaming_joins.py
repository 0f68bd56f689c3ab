"""Stream-stream interval join: matches emit exactly once (append mode),
only action rows inside [err_time - interval, err_time] for the same
user match, and matches spanning micro-batches still pair up (both
sides' state survives the checkpoint across availableNow restarts)."""

from __future__ import annotations

import os
from datetime import datetime

from harvesting_validator_spark.streaming.joins import errors_with_recent_actions

ERR_SCHEMA = "err_time timestamp, user string, err_id string"
ACT_SCHEMA = "act_time timestamp, user string, act_id string"


def _t(hh, mm):
    return datetime(2026, 1, 1, hh, mm, 0)


def _land(spark, root, sub, name, rows, schema):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(
        os.path.join(root, sub, name)
    )


def _run(spark, tmp_path):
    errors = spark.readStream.schema(ERR_SCHEMA).option(
        "pathGlobFilter", "*.parquet"
    ).option("recursiveFileLookup", "true").parquet(str(tmp_path / "errors"))
    actions = spark.readStream.schema(ACT_SCHEMA).option(
        "pathGlobFilter", "*.parquet"
    ).option("recursiveFileLookup", "true").parquet(str(tmp_path / "actions"))
    out = errors_with_recent_actions(
        errors, actions, interval="10 minutes", watermark="5 minutes"
    )
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
    except Exception:
        rows = []
    pairs = sorted((r.user, r.err_id, r.act_id) for r in rows)
    assert len(pairs) == len(set(pairs)), "pair re-emitted"
    return pairs


def test_interval_join_across_batches(spark, tmp_path):
    os.makedirs(str(tmp_path / "errors"))
    os.makedirs(str(tmp_path / "actions"))

    # batch 1: u1 acts at 10:00 and 10:20; an error at 10:07 should match
    # ONLY the 10:00 action (10:20 is after the error). u2's action must
    # never match u1's error.
    _land(spark, str(tmp_path), "actions", "a1",
          [(_t(10, 0), "u1", "a-1"), (_t(10, 20), "u1", "a-2"),
           (_t(10, 6), "u2", "a-3")], ACT_SCHEMA)
    _land(spark, str(tmp_path), "errors", "e1",
          [(_t(10, 7), "u1", "e-1")], ERR_SCHEMA)
    first = _run(spark, tmp_path)
    assert first == [("u1", "e-1", "a-1")]

    # batch 2 (state recovered from checkpoint): an error at 10:25 pairs
    # with the BUFFERED 10:20 action from batch 1 (cross-batch match);
    # an action 11 minutes before an error is outside the interval.
    _land(spark, str(tmp_path), "errors", "e2",
          [(_t(10, 25), "u1", "e-2"), (_t(10, 31), "u1", "e-3")], ERR_SCHEMA)
    second = _run(spark, tmp_path)
    assert second == [
        ("u1", "e-1", "a-1"),
        ("u1", "e-2", "a-2"),
        # e-3 at 10:31 is 11 min after a-2 (10:20) -> no match
    ]
