"""Output sinks (SURVEY.md §2.1 S4/S5/S6).

* S4 — N-Triples export: `ModelUtils.toFile(model, RDFLanguages.NT, path)`
  (`TaskService.java:212-249`). Here the NT serialization is pure Catalyst
  string ops (operators/filtering.py::nt_lines) and the sink is a
  partitioned text write under `{share}/{job_id}/{container}/`.
* S5 — file-metadata rows: the physical+logical `nfo:FileDataObject` pair
  (`SPARQL/write-ttl-file.sparql:8-31`): name, size, format, timestamps,
  `prov:wasDerivedFrom`. Here one row per written partition file appended
  to a `lineage_files` parquet table; ids are deterministic sha2 of the
  path (C4 — the reference's random `uuid()` at `TaskService.java:217,226`
  breaks resume/idempotence, ours doesn't).
* S6 — violation-statistics workbook (`XlsReportService.java:61-134`,
  disabled in the reference at :40-44): summary sheet (path local-name ->
  count, grand total). The aggregation is the operator; the xlsx writer is
  gated behind an import-try (openpyxl is not in this image) with a CSV
  fallback.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from harvesting_validator_spark.operators.filtering import nt_lines

NT_FORMAT = "application/n-triples"
NT_EXTENSION = "nt"


def write_nt(
    triples: DataFrame,
    share_root: str,
    job_id: str,
    container: str,
    spark: SparkSession,
) -> DataFrame:
    """Serialize a triple table to N-Triples text files under
    {share_root}/{job_id}/{container}/ and append S5 metadata rows.
    Returns the lineage_files rows written."""
    out_dir = os.path.join(share_root, job_id, container)
    # range-partition + sort before export (SURVEY §4): file contents are
    # deterministic functions of the data, so re-exports are byte-stable
    # (golden-file diffs, resume idempotence) and no output file is skewed
    lines = (
        nt_lines(triples)
        .select("line")
        .repartitionByRange(max(1, triples.sparkSession.sparkContext.defaultParallelism // 4), "line")
        .sortWithinPartitions("line")
    )
    lines.write.mode("overwrite").text(out_dir)

    # Spark task-output names embed a per-write UUID; rename to stable
    # ordinal names so share_uri (and thus file_id = sha2(share_uri)) is a
    # pure function of (job_id, container, partition) — re-exports
    # converge instead of minting fresh ids (C4 determinism).
    raw = sorted(
        f
        for f in os.listdir(out_dir)
        if f.startswith("part-") and not f.endswith(".crc")
    )
    files = []
    for i, name in enumerate(raw):
        stable = f"{container}-{i:05d}.{NT_EXTENSION}"
        os.replace(
            os.path.join(out_dir, name), os.path.join(out_dir, stable)
        )
        crc = os.path.join(out_dir, f".{name}.crc")
        if os.path.exists(crc):
            os.remove(crc)
        files.append(stable)
    now = time.time()
    rows = [
        (
            f"share://{job_id}/{container}/{name}",
            os.path.getsize(os.path.join(out_dir, name)),
            name,
            NT_FORMAT,
            NT_EXTENSION,
            now,
            job_id,
            container,
        )
        for name in sorted(files)
    ]
    meta = spark.createDataFrame(
        rows,
        "share_uri string, file_size bigint, file_name string, "
        "format string, extension string, created double, "
        "job_id string, container string",
    ).withColumn(
        # deterministic logical-file id (C4): sha2 of the share uri, not uuid()
        "file_id",
        F.sha2(F.col("share_uri"), 256),
    )
    meta_path = os.path.join(share_root, "_lineage_files")
    # re-running the same (job_id, container) export overwrites the text
    # files byte-identically; the metadata append must converge the same
    # way, so drop rows whose deterministic file_id is already recorded
    # (resume/retry otherwise duplicates _lineage_files rows — ADVICE r1).
    # NB os.listdir above confines this sink to local filesystems; the
    # Iceberg/remote-FS seam replaces the enumeration with the Hadoop
    # FileSystem API.
    if os.path.exists(meta_path):
        seen = spark.read.parquet(meta_path).select("file_id").distinct()
        meta = meta.join(seen, "file_id", "left_anti")
    meta.write.mode("append").parquet(meta_path)
    return meta


def violation_stats(violations: DataFrame) -> DataFrame:
    """S6 aggregation: violations per result-path local name + grand total
    (`XlsReportService.java:73-88,119-127`)."""
    local = F.element_at(F.split("result_path", "[/#]"), -1)
    per_path = (
        violations.filter(F.col("result_path").isNotNull())
        .groupBy(local.alias("path"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = violations.groupBy().agg(
        F.lit("__total__").alias("path"), F.count(F.lit(1)).alias("n")
    )
    return per_path.unionByName(total)


def violation_details(violations: DataFrame) -> DataFrame:
    """S6 detail rows — one per violation with the fields the reference
    writes per path sheet (`XlsReportService.java:99-116`): path local
    name, focusNode, value, abbreviated message."""
    local = F.element_at(F.split("result_path", "[/#]"), -1)
    return violations.select(
        F.coalesce(local, F.lit("(node)")).alias("path"),
        F.col("focus_node").alias("focusNode"),
        F.col("value"),
        F.substring(F.col("message"), 1, 1024).alias("message"),
    )


def write_violation_workbook(violations: DataFrame, path: str) -> str:
    """Summary sheet + one detail sheet per result path
    (`XlsReportService.java:61-134`); xlsx when openpyxl exists, else CSV
    files. Returns the summary path written. Single-partition by design —
    violation stats are tiny relative to the corpus."""
    stats = violation_stats(violations).toPandas()
    details = violation_details(violations).toPandas()
    try:
        import openpyxl  # noqa: F401
        import pandas as pd

        out = path if path.endswith(".xlsx") else path + ".xlsx"
        with pd.ExcelWriter(out) as xl:
            stats.to_excel(xl, sheet_name="summary", index=False)
            for p, grp in details.groupby("path"):
                # sheet names: 31-char excel limit
                grp.to_excel(xl, sheet_name=str(p)[:31], index=False)
    except ImportError:
        base = path[:-5] if path.endswith(".xlsx") else path
        out = base + ".csv"
        stats.to_csv(out, index=False)
        details.to_csv(base + "_details.csv", index=False)
    return out
