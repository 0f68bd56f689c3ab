"""Stream-static enrichment join: the static dim resolves per
micro-batch (a dim update between batches is visible without a stream
restart), unmatched users fold into 'unknown' instead of dropping, and
the downstream watermarked window emits each (window, segment) exactly
once in append mode."""

from __future__ import annotations

import os
from datetime import datetime

from harvesting_validator_spark.streaming.enrich import enriched_segment_stats

SCHEMA = "event_time timestamp, user string, value double"
DIM_SCHEMA = "user string, segment string"


def _t(hh, mm):
    return datetime(2026, 1, 1, hh, mm, 0)


def _land(spark, landing, name, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(
        os.path.join(landing, name)
    )


def _write_dim(spark, dim_dir, rows):
    spark.createDataFrame(rows, DIM_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(dim_dir)


def _run(spark, tmp_path, landing, dim_dir):
    events = spark.readStream.schema(SCHEMA).option(
        "pathGlobFilter", "*.parquet"
    ).option("recursiveFileLookup", "true").parquet(landing)
    dims = spark.read.parquet(dim_dir)
    out = enriched_segment_stats(
        events, dims, window_duration="10 minutes", watermark="5 minutes"
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
    out_map = {
        (r.window_start.strftime("%H:%M"), r.segment): (r.n_events, r.total_value)
        for r in rows
    }
    assert len(rows) == len(out_map), "window re-emitted"
    return out_map


def test_enrichment_join_and_dim_refresh(spark, tmp_path):
    landing = str(tmp_path / "landing")
    dim_dir = str(tmp_path / "dims")
    os.makedirs(landing)
    _write_dim(spark, dim_dir, [("u1", "gold"), ("u2", "silver")])

    # run 1: u1 (gold), u3 (NOT in dim -> 'unknown') in window 10:00;
    # 10:25 pushes the watermark to 10:20 -> window 10:00 closes.
    _land(
        spark, landing, "b1",
        [(_t(10, 2), "u1", 1.0), (_t(10, 4), "u3", 2.0), (_t(10, 25), "u2", 5.0)],
    )
    first = _run(spark, tmp_path, landing, dim_dir)
    assert first == {
        ("10:00", "gold"): (1, 1.0),
        ("10:00", "unknown"): (1, 2.0),
    }

    # dim UPDATE between batches: u3 gains a segment; a new u3 event in
    # window 10:30 must resolve under the refreshed dim (the static side
    # re-resolves per micro-batch — no stream restart needed). 11:00
    # pushes the watermark past both open windows.
    _write_dim(
        spark, dim_dir, [("u1", "gold"), ("u2", "silver"), ("u3", "bronze")]
    )
    _land(
        spark, landing, "b2",
        [(_t(10, 32), "u3", 4.0), (_t(11, 0), "u1", 1.0)],
    )
    second = _run(spark, tmp_path, landing, dim_dir)
    assert second == {
        ("10:00", "gold"): (1, 1.0),
        ("10:00", "unknown"): (1, 2.0),
        ("10:20", "silver"): (1, 5.0),
        ("10:30", "bronze"): (1, 4.0),
    }
