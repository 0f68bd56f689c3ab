"""Sketch accuracy bounds vs exact answers (sketches have no SQL oracle)."""

from __future__ import annotations

from pyspark.sql import functions as F

from harvesting_validator_spark.queries.sketches import (
    q_sketch_distinct_users,
    q_sketch_price_quantiles,
)


def test_hll_within_rsd(spark, sf_dir):
    approx = {r.event_type: r.approx_users
              for r in q_sketch_distinct_users(spark, sf_dir).collect()}
    exact = {
        r.event_type: r.exact
        for r in spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k in exact:
        assert abs(approx[k] - exact[k]) <= max(2, 0.1 * exact[k])


def test_quantiles_within_tolerance(spark, sf_dir):
    rows = {r.o_orderstatus: r for r in q_sketch_price_quantiles(spark, sf_dir).collect()}
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    for status, r in rows.items():
        vals = sorted(
            x.o_totalprice
            for x in orders.filter(F.col("o_orderstatus") == status).collect()
        )
        n = len(vals)
        for q, got in ((0.5, r.p50), (0.95, r.p95), (0.99, r.p99)):
            lo = vals[max(0, int(n * (q - 0.02)) - 1)]
            hi = vals[min(n - 1, int(n * (q + 0.02)))]
            assert lo <= got <= hi, (status, q, got, lo, hi)
