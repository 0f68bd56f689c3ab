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

import math
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

    def compact(self, run_id: str, stage: str,
                target_bytes: int = 128 * 1024 * 1024) -> dict:
        """Small-file compaction: rewrite the stage dir into
        ``ceil(total_bytes / target_bytes)`` files and swap atomically
        (write aside → two renames → delete). At 100 TB the small-file
        problem is operational, not cosmetic — a checkpointed stage
        written at high parallelism leaves thousands of tiny parquet
        files whose per-file open/footer cost dominates later scans and
        whose NameNode/object-store listing cost grows per file.

        Unpartitioned stages compact with ``coalesce`` (split merging,
        NO shuffle). Hive-partitioned stages (``col=val`` dirs from
        ``write(partition_by=...)``) hash-cluster on the partition
        columns — one shuffle — so each output task owns whole partition
        values and file counts drop to ~1 per partition dir. A row-count
        parity check on the rewritten copy gates the swap."""
        path = self._path(run_id, stage)
        entries = [
            e for e in fs.listdir(self.spark, path)
            if not e.startswith(("_", "."))
        ]
        part_cols = sorted({e.split("=", 1)[0] for e in entries if "=" in e})
        total = fs.tree_size(self.spark, path)
        n_out = max(1, math.ceil(total / target_bytes))
        df = self.spark.read.parquet(path)
        tmp, old = path + ".__compacting__", path + ".__pre_compact__"
        fs.delete(self.spark, tmp, recursive=True)
        if part_cols:
            w = df.repartition(n_out, *part_cols).write.partitionBy(*part_cols)
        else:
            if n_out >= len(entries):
                return {"files_before": len(entries),
                        "files_after": len(entries), "bytes": total,
                        "skipped": True}
            w = df.coalesce(n_out).write
        w.mode("overwrite").parquet(tmp)
        n_src, n_tmp = df.count(), self.spark.read.parquet(tmp).count()
        if n_src != n_tmp:
            fs.delete(self.spark, tmp, recursive=True)
            raise IOError(
                f"compaction row-count mismatch for {path}: "
                f"{n_src} != {n_tmp}; source left untouched"
            )
        fs.rename(self.spark, path, old)
        fs.rename(self.spark, tmp, path)
        fs.delete(self.spark, old, recursive=True)
        files_after = len([
            e for e in fs.listdir(self.spark, path)
            if not e.startswith(("_", "."))
        ])
        return {"files_before": len(entries), "files_after": files_after,
                "bytes": total, "skipped": False}


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

    def _rewrite_sql(self, run_id: str, stage: str,
                     target_bytes: int) -> str:
        """The Iceberg-native compaction call (rewrite_data_files binpacks
        small files into target-size ones inside a snapshot commit)."""
        return (
            f"CALL {self.catalog}.system.rewrite_data_files("
            f"table => '{self.namespace}.{self.ident(run_id, stage).rsplit('.', 1)[-1]}', "
            f"options => map('target-file-size-bytes', '{target_bytes}'))"
        )

    def compact(self, run_id: str, stage: str,
                target_bytes: int = 128 * 1024 * 1024) -> dict:
        row = self.spark.sql(
            self._rewrite_sql(run_id, stage, target_bytes)
        ).collect()[0]
        return {"rewritten_files": row[0], "added_files": row[1]}


def stage_store(spark: SparkSession, root: str,
                catalog: str | None = None):
    """The seam: an Iceberg store iff a catalog is configured (or named
    explicitly), else the parquet store."""
    catalog = catalog or detect_iceberg_catalog(spark)
    if catalog:
        return IcebergStageStore(spark, catalog)
    return ParquetStageStore(spark, root)
