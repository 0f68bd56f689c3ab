"""Event-time windowed aggregation with watermark: late-but-in-horizon
rows fold into their ORIGINAL window; rows older than the watermark are
dropped; each window emits exactly once (append mode) when the watermark
passes its end. The stream is run as three availableNow executions over
one checkpoint, so watermark state must also survive restarts."""

from __future__ import annotations

import os
from datetime import datetime

from harvesting_validator_spark.streaming.windowed import windowed_ingest_stats

SCHEMA = "event_time timestamp, source string, conforms boolean"


def _t(hh, mm):
    return datetime(2026, 1, 1, hh, mm, 0)


def _land(spark, landing, name, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(
        os.path.join(landing, name)
    )


def _run(spark, tmp_path, landing, qname):
    events = spark.readStream.schema(SCHEMA).option(
        "pathGlobFilter", "*.parquet"
    ).option("recursiveFileLookup", "true").parquet(landing)
    out = windowed_ingest_stats(
        events, window_duration="10 minutes", watermark="5 minutes"
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
    except Exception:  # nothing emitted yet -> no data files to infer from
        rows = []
    out_map = {
        (r.window_start.strftime("%H:%M"), r.source): (r.n_docs, r.n_conforming)
        for r in rows
    }
    # append mode must emit each closed window exactly once
    assert len(rows) == len(out_map), "window re-emitted"
    return out_map


def test_windowed_counts_with_watermark(spark, tmp_path):
    landing = str(tmp_path / "landing")
    os.makedirs(landing)

    # run 1: opens windows 10:00 and 10:10; watermark ends at 10:07 —
    # nothing closed yet
    _land(spark, landing, "b1", [(_t(10, 5), "s1", True), (_t(10, 12), "s1", True)])
    assert _run(spark, tmp_path, landing, "win_r1") == {}

    # run 2 (watermark 10:07 recovered from checkpoint): 10:08 is LATE for
    # window 10:00 but inside the horizon -> folds into its ORIGINAL
    # window; 10:25 pushes the watermark to 10:20 -> 10:00/10:10 close
    _land(spark, landing, "b2", [(_t(10, 8), "s1", False), (_t(10, 25), "s2", False)])
    assert _run(spark, tmp_path, landing, "win_r2") == {
        ("10:00", "s1"): (2, 1),
        ("10:10", "s1"): (1, 1),
    }

    # run 3 (watermark 10:20): 10:02 is OLDER than the watermark -> dropped
    # entirely; 10:40 pushes the watermark to 10:35 -> window 10:20 closes
    # WITHOUT the dropped row anywhere (the sink is cumulative: earlier
    # windows appear exactly once, not re-emitted)
    _land(spark, landing, "b3", [(_t(10, 2), "s1", True), (_t(10, 40), "s3", True)])
    assert _run(spark, tmp_path, landing, "win_r3") == {
        ("10:00", "s1"): (2, 1),
        ("10:10", "s1"): (1, 1),
        ("10:20", "s2"): (1, 0),
    }
