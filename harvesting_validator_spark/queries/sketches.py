"""Approximate-aggregate sketches (training-data pipeline extension).

HyperLogLog++ distinct counts and approximate quantiles — the sketches a
100 TB profiling pass uses where exact DISTINCT/percentiles would shuffle
the world. Sketch outputs are implementation-defined, so these queries
carry NO DuckDB oracle (the driver records the weaker rows-only check);
accuracy bounds against exact answers are asserted in
tests/test_sketches.py instead.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from harvesting_validator_spark.queries.common import tbl


def q_sketch_distinct_users(spark, sf_dir):
    """HLL++ approx distinct users per event type (rsd 2%)."""
    return (
        tbl(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", 0.02).alias("approx_users"))
    )


def q_sketch_price_quantiles(spark, sf_dir):
    """Approximate order-price quantiles per status (Greenwald-Khanna)."""
    return (
        tbl(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.percentile_approx(
                "o_totalprice", [0.5, 0.95, 0.99], 10000
            ).alias("price_q")
        )
        .select(
            "o_orderstatus",
            F.col("price_q")[0].alias("p50"),
            F.col("price_q")[1].alias("p95"),
            F.col("price_q")[2].alias("p99"),
        )
    )


QUERIES = {
    "sketch_distinct_users": q_sketch_distinct_users,
    "sketch_price_quantiles": q_sketch_price_quantiles,
}

# intentionally no ORACLES entries: sketch outputs are algorithm-specific
ORACLES: dict[str, str] = {}
