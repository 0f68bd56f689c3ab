"""AQE skew-join splitting fires on a hot key — evidence the configured
skew handling actually engages, not just that the flag is set.

Uses its own session (thresholds lowered so test-scale data crosses them;
production keeps the defaults and the same mechanics engage at 256MB
partitions). Note AQE only splits when no downstream operator requires the
join's partitioning — our per-doc aggregations after joins reuse the
exchange, which is exactly why the hot rdf:type predicate is ALSO bounded
by carrying doc_id in every join key (shacl/compile.py scale notes)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


_CONF = {
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


@pytest.fixture()
def skew_spark(spark):
    """Shared session with skew thresholds lowered for the test and
    restored afterwards (runtime confs; no session leakage)."""
    saved = {k: spark.conf.get(k, None) for k in _CONF}
    for k, v in _CONF.items():
        spark.conf.set(k, v)
    yield spark
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_skew_join_splits_hot_key(skew_spark):
    spark = skew_spark
    left = spark.range(200000).select(
        F.when(F.col("id") % 20 != 0, F.lit(0)).otherwise(F.col("id")).alias("k"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"),
    )
    right = spark.range(5000).select(F.col("id").alias("k"), F.lit("r").alias("rv"))
    j = left.join(right, "k")
    rows = j.collect()
    assert len(rows) == 190250
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" in plan
    assert "skewed" in plan  # AQEShuffleRead split the hot partition
