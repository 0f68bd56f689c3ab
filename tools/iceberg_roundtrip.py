"""Real Iceberg write-path exercise for the warehouse seam.

Runs IcebergStageStore.write / read / overwrite / compact against a REAL
local Hadoop catalog — the part of warehouse.py that cannot execute in
an offline sandbox (no iceberg-spark-runtime jar ships here, and Maven
Central is unreachable: `curl repo1.maven.org` fails DNS resolution, see
BENCH.md §8). On the first networked or cluster environment:

    # grab the runtime jar matching the Spark/Scala build, e.g.
    #   iceberg-spark-runtime-4.0_2.13-<version>.jar
    python tools/iceberg_roundtrip.py /path/to/iceberg-spark-runtime.jar

or set ICEBERG_SPARK_JAR and run the skip-marked test:

    ICEBERG_SPARK_JAR=/path/to/jar python -m pytest \
        tests/test_warehouse.py -k real_iceberg -q

Prints ONE JSON line {"ok": true, ...} on success; any assertion failure
or Spark error exits non-zero. Runs in its own process because the jar
must be on the JVM classpath at launch — it cannot be added to an
already-running test session.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile


def main(jar: str, workdir: str | None = None) -> int:
    from pyspark.sql import SparkSession, functions as F

    from harvesting_validator_spark.warehouse import (
        IcebergStageStore,
        stage_store,
    )

    own_tmp = workdir is None
    workdir = workdir or tempfile.mkdtemp(prefix="iceberg_roundtrip_")
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("iceberg-roundtrip")
        .config("spark.jars", jar)
        .config("spark.sql.catalog.lake",
                "org.apache.iceberg.spark.SparkCatalog")
        .config("spark.sql.catalog.lake.type", "hadoop")
        .config("spark.sql.catalog.lake.warehouse", workdir)
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    try:
        store = stage_store(spark, workdir)  # must auto-detect 'lake'
        assert isinstance(store, IcebergStageStore), type(store).__name__

        df = spark.range(1000).select(
            F.col("id"), (F.col("id") % 4).alias("p")
        ).repartition(16)

        # write (partitioned) -> exists -> read back exact values
        assert not store.exists("r1", "stage")
        store.write(df, "r1", "stage", partition_by=("p",))
        assert store.exists("r1", "stage")
        back = store.read("r1", "stage")
        assert sorted((r.id, r.p) for r in back.collect()) == [
            (i, i % 4) for i in range(1000)
        ]

        # overwrite is a snapshot swap (createOrReplace), not an append
        store.write(df.filter(F.col("id") < 500), "r1", "stage",
                    partition_by=("p",))
        assert store.read("r1", "stage").count() == 500

        # native compaction commits a rewrite snapshot
        compact = store.compact("r1", "stage")
        assert set(compact) >= {"rewritten_files", "added_files"}, compact

        n_snapshots = spark.sql(
            f"SELECT count(*) AS n FROM {store.ident('r1', 'stage')}.snapshots"
        ).collect()[0].n
        assert n_snapshots >= 2, n_snapshots  # write, overwrite(+rewrite)

        print(json.dumps({
            "ok": True,
            "rows": 500,
            "snapshots": n_snapshots,
            "compact": {k: str(v) for k, v in compact.items()},
        }))
        return 0
    finally:
        spark.stop()
        if own_tmp:
            shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    if len(sys.argv) < 2:
        print("usage: iceberg_roundtrip.py <iceberg-spark-runtime.jar> "
              "[workdir]", file=sys.stderr)
        sys.exit(2)
    sys.exit(main(sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else None))
