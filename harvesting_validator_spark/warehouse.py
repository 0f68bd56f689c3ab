"""Table-format seam for stage outputs: Iceberg tables when an Iceberg
catalog is configured on the session, partitioned parquet directories
otherwise.

North-star shape: the pipeline "scans an Iceberg table of source-code
repositories ... materialized back to partitioned Iceberg". No Iceberg
runtime jar ships in this sandbox (SURVEY §7 stage 0), so the parquet
store is what tests exercise; the Iceberg store builds the identical
writeTo/table calls and is selected automatically the moment the
cluster's spark-defaults carry a
``spark.sql.catalog.<name> = org.apache.iceberg.spark.SparkCatalog``
entry — no code change, one config switch. Everything above this seam
(CheckpointedRunner stages, the kg job) is storage-agnostic.

Reference analog: the result-container files the validator appends per
task (`SPARQL/append-task-result-file.sparql:5-12`) — here each stage
output is one table/dir, resumable by (run_id, stage).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from harvesting_validator_spark import fs


def detect_iceberg_catalog(spark: SparkSession) -> str | None:
    """Name of the first configured Iceberg catalog, or None.

    Detection is config-driven (``spark.sql.catalog.<name>`` set to an
    Iceberg catalog class) so a cluster profile activates the Iceberg
    store with zero code changes."""
    for key, value in spark.sparkContext.getConf().getAll():
        m = re.fullmatch(r"spark\.sql\.catalog\.([A-Za-z0-9_]+)", key)
        if m and "iceberg" in value.lower():
            return m.group(1)
    return None


class ParquetStageStore:
    """Stage outputs as parquet dirs ``{root}/{run_id}/{stage}`` via the
    Hadoop FileSystem seam (fs.py) — file://, hdfs://, s3a://."""

    is_iceberg = False

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    def _path(self, run_id: str, stage: str) -> str:
        return fs.join(self.root, run_id, stage)

    def exists(self, run_id: str, stage: str) -> bool:
        return fs.exists(self.spark, self._path(run_id, stage))

    def write(self, df: DataFrame, run_id: str, stage: str,
              partition_by: tuple = ()) -> None:
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self._path(run_id, stage))

    def read(self, run_id: str, stage: str) -> DataFrame:
        return self.spark.read.parquet(self._path(run_id, stage))


class IcebergStageStore:
    """Stage outputs as Iceberg tables
    ``{catalog}.{namespace}.{run_id}__{stage}`` (createOrReplace = the
    atomic snapshot-swap overwrite; resume probes the catalog, not the
    filesystem). Partition specs pass through to ``partitionedBy`` so
    transforms (bucket/days/...) land in the table metadata."""

    is_iceberg = True

    def __init__(self, spark: SparkSession, catalog: str,
                 namespace: str = "harvest"):
        self.spark = spark
        self.catalog = catalog
        self.namespace = namespace
        spark.sql(
            f"CREATE NAMESPACE IF NOT EXISTS {catalog}.{namespace}"
        )

    def ident(self, run_id: str, stage: str) -> str:
        safe = re.sub(r"[^A-Za-z0-9_]", "_", f"{run_id}__{stage}")
        return f"{self.catalog}.{self.namespace}.{safe}"

    def exists(self, run_id: str, stage: str) -> bool:
        return self.spark.catalog.tableExists(self.ident(run_id, stage))

    def write(self, df: DataFrame, run_id: str, stage: str,
              partition_by: tuple = ()) -> None:
        w = df.writeTo(self.ident(run_id, stage)).using("iceberg")
        if partition_by:
            w = w.partitionedBy(*partition_by)
        w.createOrReplace()

    def read(self, run_id: str, stage: str) -> DataFrame:
        return self.spark.table(self.ident(run_id, stage))


def stage_store(spark: SparkSession, root: str,
                catalog: str | None = None):
    """The seam: an Iceberg store iff a catalog is configured (or named
    explicitly), else the parquet store."""
    catalog = catalog or detect_iceberg_catalog(spark)
    if catalog:
        return IcebergStageStore(spark, catalog)
    return ParquetStageStore(spark, root)
