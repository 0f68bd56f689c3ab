"""S4/S5/S6 sinks: NT export round-trip, file-metadata rows, stats sheet."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from harvesting_validator_spark.plans.pipeline import run_validation
from harvesting_validator_spark.sinks import (
    violation_stats,
    write_nt,
    write_violation_workbook,
)
from harvesting_validator_spark.sources.rdf_parse import parse_ntriples
from harvesting_validator_spark.sources.synthetic import (
    APPLICATION_PROFILE,
    golden_sources,
)


def test_nt_roundtrip_and_file_metadata(spark, tmp_path):
    run = run_validation(spark, golden_sources(spark), APPLICATION_PROFILE)
    share = str(tmp_path / "share")

    meta = write_nt(run.valid_triples, share, "job1", "filter", spark)
    rows = meta.collect()
    assert rows, "at least one part file written"
    assert all(r.share_uri.startswith("share://job1/filter/") for r in rows)
    assert all(r.format == "application/n-triples" for r in rows)
    assert all(len(r.file_id) == 64 for r in rows)

    # S5 rows landed in the lineage_files table
    lf = spark.read.parquet(f"{share}/_lineage_files")
    assert lf.count() == len(rows)

    # round-trip: re-parse the written NT and compare the triple set
    out_dir = f"{share}/job1/filter"
    text = ""
    for name in sorted(os.listdir(out_dir)):
        if name.endswith(".nt"):
            with open(os.path.join(out_dir, name)) as fh:
                text += fh.read()
    reparsed = {
        (t.subj, t.pred, t.obj_value, t.obj_kind, t.obj_datatype, t.obj_lang)
        for t in parse_ntriples(text)
    }
    original = {
        (r.subj, r.pred, r.obj_value, r.obj_kind, r.obj_datatype, r.obj_lang)
        for r in run.valid_triples.collect()
    }
    assert reparsed == original


def test_violation_stats_and_workbook(spark, tmp_path):
    run = run_validation(spark, golden_sources(spark), APPLICATION_PROFILE)
    stats = {r.path: r.n for r in violation_stats(run.violations).collect()}
    # golden fixture: ssn (alice pattern + bob maxcount), worksFor (calvin
    # class), birthDate+www (calvin closed) — FIXTURES.md §2
    assert stats["ssn"] == 2
    assert stats["worksFor"] == 1
    assert stats["birthDate"] == 1 and stats["www"] == 1
    assert stats["__total__"] == 5

    out = write_violation_workbook(run.violations, str(tmp_path / "stats.xlsx"))
    assert os.path.exists(out) and out.endswith(".xlsx")

    # the output must be a REAL OOXML workbook (reference: POI xlsx,
    # XlsReportService.java:61-134) — even without openpyxl in the image.
    # Verify with stdlib: valid zip, expected parts, summary sheet values.
    import re
    import zipfile

    with zipfile.ZipFile(out) as zf:
        names = set(zf.namelist())
        assert "[Content_Types].xml" in names
        assert "xl/workbook.xml" in names
        wb = zf.read("xl/workbook.xml").decode()
        sheet_names = re.findall(r'name="([^"]+)"', wb)
        assert sheet_names[0] == "summary"
        assert {"ssn", "worksFor", "birthDate", "www"} <= set(sheet_names)
        sheet1 = zf.read("xl/worksheets/sheet1.xml").decode()
        texts = re.findall(r"<t[^>]*>([^<]*)</t>", sheet1)
        nums = re.findall(r"<v>([^<]*)</v>", sheet1)
        assert "__total__" in texts and "ssn" in texts
        assert "5" in nums and "2" in nums  # total=5, ssn=2

    # detail rows: one per violation, path local-names + focus nodes
    from harvesting_validator_spark.sinks import violation_details

    details = violation_details(run.violations).collect()
    assert len(details) == 5
    assert {d.path for d in details} == {"ssn", "worksFor", "birthDate", "www"}
    assert all(d.focusNode.startswith("http://example.com/ns#") for d in details)


def test_write_nt_via_filesystem_uri_scheme(spark, tmp_path):
    """VERDICT r2 #6: the sink layer runs through the Hadoop FileSystem
    API, so an explicit file:// URI share root (the stand-in for any
    hdfs://-style warehouse) must work end-to-end — export, stable
    renames, metadata rows, re-export idempotence."""
    share = f"file://{tmp_path}/share"
    run = run_validation(spark, golden_sources(spark), APPLICATION_PROFILE)

    meta = write_nt(run.valid_triples, share, "jobU", "filter", spark)
    rows = meta.collect()
    assert rows and all(
        r.share_uri.startswith("share://jobU/filter/") for r in rows
    )
    # stable ordinal names landed on disk (rename went through Hadoop FS)
    local = tmp_path / "share" / "jobU" / "filter"
    names = sorted(p.name for p in local.iterdir() if p.suffix == ".nt")
    assert names == [f"filter-{i:05d}.nt" for i in range(len(names))]
    assert len(names) == len(rows)

    # metadata table readable through the same URI; re-export converges
    first = spark.read.parquet(f"{share}/_lineage_files").collect()
    write_nt(run.valid_triples, share, "jobU", "filter", spark)
    again = spark.read.parquet(f"{share}/_lineage_files").collect()
    assert sorted(r.file_id for r in again) == sorted(r.file_id for r in first)


def test_checkpointed_runner_via_filesystem_uri_scheme(spark, tmp_path):
    """The lineage store + stage-skip probes also route through the FS
    seam: a file:// warehouse resumes correctly."""
    from harvesting_validator_spark.lineage import (
        run_validation_checkpointed,
    )

    wh = f"file://{tmp_path}/wh"
    r1 = run_validation_checkpointed(
        spark, golden_sources(spark), APPLICATION_PROFILE, wh, run_id="ck1"
    )
    assert r1.executed and not r1.skipped
    r2 = run_validation_checkpointed(
        spark, golden_sources(spark), APPLICATION_PROFILE, wh, run_id="ck1"
    )
    assert not r2.executed and set(r2.skipped) == set(r1.executed)


def test_reexport_does_not_duplicate_lineage_rows(spark, tmp_path):
    """ADVICE r1: re-running the same (job_id, container) export must not
    append duplicate _lineage_files rows (file_id is deterministic)."""
    from harvesting_validator_spark.sources.rdf_parse import (
        parse_sources_to_triples,
    )
    from harvesting_validator_spark.sources.synthetic import golden_sources

    share = str(tmp_path / "share")
    triples = parse_sources_to_triples(golden_sources(spark))
    write_nt(triples, share, "job1", "valid", spark)
    first = spark.read.parquet(f"{share}/_lineage_files").collect()
    write_nt(triples, share, "job1", "valid", spark)
    again = spark.read.parquet(f"{share}/_lineage_files").collect()
    assert sorted(r.file_id for r in again) == sorted(r.file_id for r in first)
    assert len({r.file_id for r in again}) == len(again)
