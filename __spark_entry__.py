"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship KG-validation pipeline at
sf0.001; ``queries()``/``oracle_sql()`` expose the full operator registry
(harvesting_validator_spark/queries/) for the driver's DuckDB
hash-comparison at sf0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from harvesting_validator_spark.queries import ALL_ORACLES, ALL_QUERIES

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: parse the synthetic source-repo corpus, SHACL-validate
    every document, and return per-doc conformance verdicts."""
    from harvesting_validator_spark.queries.kg import q_kg_verdicts

    return q_kg_verdicts(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(ALL_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ALL_ORACLES)
