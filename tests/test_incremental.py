"""Incremental-batch semantics: delta intake filter + process-only-new."""

from __future__ import annotations

from pyspark.sql import functions as F

from harvesting_validator_spark.incremental import (
    STATUS_SCHEDULED,
    SUBJECT_STATUS,
    DELTA_SCHEMA,
    process_incremental,
    scheduled_tasks_from_delta,
)
from harvesting_validator_spark.sources.synthetic import (
    APPLICATION_PROFILE,
    generate_sources,
)


def test_delta_insert_filter(spark):
    rows = [
        ("insert", "task:1", SUBJECT_STATUS, STATUS_SCHEDULED, "iri"),
        ("insert", "task:1", SUBJECT_STATUS, STATUS_SCHEDULED, "iri"),  # dup
        ("delete", "task:2", SUBJECT_STATUS, STATUS_SCHEDULED, "iri"),  # delete
        ("insert", "task:3", SUBJECT_STATUS, "other-status", "iri"),
        ("insert", "task:4", "other-pred", STATUS_SCHEDULED, "iri"),
        ("insert", "task:5", SUBJECT_STATUS, STATUS_SCHEDULED, "iri"),
    ]
    deltas = spark.createDataFrame(rows, DELTA_SCHEMA)
    tasks = sorted(r.task for r in scheduled_tasks_from_delta(deltas).collect())
    assert tasks == ["task:1", "task:5"]


def test_incremental_processes_only_new(spark, tmp_path):
    wh = str(tmp_path / "wh")
    corpus = generate_sources(spark, 50)

    batch1 = corpus.filter(F.col("path").rlike("page[0-2]?[0-9]\\."))  # 0..29
    n1, _ = process_incremental(spark, batch1, APPLICATION_PROFILE, wh, "r1")
    assert n1 == 30
    assert spark.read.parquet(f"{wh}/verdicts").count() == 30

    # overlapping superset: only the 20 unseen docs are processed
    n2, _ = process_incremental(spark, corpus, APPLICATION_PROFILE, wh, "r2")
    assert n2 == 20
    verdicts = spark.read.parquet(f"{wh}/verdicts")
    assert verdicts.count() == 50
    assert verdicts.select("doc_id").distinct().count() == 50

    # idempotence: representing the same corpus is a no-op
    n3, out = process_incremental(spark, corpus, APPLICATION_PROFILE, wh, "r3")
    assert n3 == 0 and out is None
    assert spark.read.parquet(f"{wh}/verdicts").count() == 50

    # outputs equal a from-scratch run over the full corpus (modulo the
    # batch_id partition column the incremental appends add)
    from harvesting_validator_spark.plans.pipeline import run_validation

    full = run_validation(spark, corpus, APPLICATION_PROFILE)
    a = {tuple(r) for r in verdicts.select(*full.verdicts.columns).collect()}
    b = {tuple(r) for r in full.verdicts.collect()}
    assert a == b


def test_crash_replay_does_not_duplicate_outputs(spark, tmp_path):
    """ADVICE r1 + VERDICT r2 #5: outputs append BEFORE ledger.mark —
    simulate a crash in that window through the real protocol (intent
    recorded, outputs written under the attempt's batch partition, mark
    never runs) and replay. The retry must converge: no duplicate
    verdict/valid rows."""
    from harvesting_validator_spark.incremental import (
        IncrementalLedger,
        _append_batch,
    )
    from harvesting_validator_spark.plans.pipeline import (
        add_doc_id,
        run_validation,
    )

    wh = str(tmp_path / "wh")
    corpus = add_doc_id(generate_sources(spark, 20))

    # crashed first attempt: intent + outputs land, mark() never runs
    ledger = IncrementalLedger(spark, wh)
    ledger.record_intent(corpus.select("doc_id"), "crashed1")
    run = run_validation(spark, corpus, APPLICATION_PROFILE)
    _append_batch(spark, run.verdicts, f"{wh}/verdicts", "crashed1", [])
    _append_batch(
        spark, run.valid_triples, f"{wh}/valid_triples", "crashed1", []
    )

    # driver retry: the processed ledger says nothing done -> full replay,
    # and the crashed attempt is the (only) in-doubt batch
    assert ledger.in_doubt_batches("retry") == ["crashed1"]
    n, _ = process_incremental(spark, corpus, APPLICATION_PROFILE, wh, "retry")
    assert n == 20
    verdicts = spark.read.parquet(f"{wh}/verdicts")
    assert verdicts.count() == 20
    assert verdicts.select("doc_id").distinct().count() == 20
    valid = spark.read.parquet(f"{wh}/valid_triples")
    assert valid.count() == valid.distinct().count()

    # the crashed batch left the in-doubt window once its docs were marked,
    # and the post-mark compaction emptied the intent ledger entirely
    assert ledger.in_doubt_batches("r2") == []
    assert ledger.read_inflight().count() == 0
    # and the batch after the replay is a clean no-op
    n2, out = process_incremental(spark, corpus, APPLICATION_PROFILE, wh, "r2")
    assert n2 == 0 and out is None


def test_replay_dedup_scan_is_bounded(spark, tmp_path):
    """VERDICT r2 #5: the dedup read must not scan prior batches. Steady
    state: no in-doubt attempts -> the output table is not read at all.
    Replay: the probe carries a batch_id partition filter, so committed
    batches' partitions are pruned from the scan."""
    from harvesting_validator_spark.incremental import (
        IncrementalLedger,
        anti_in_doubt,
    )

    wh = str(tmp_path / "wh")
    corpus = generate_sources(spark, 30)
    n1, _ = process_incremental(spark, corpus, APPLICATION_PROFILE, wh, "b1")
    assert n1 == 30

    # steady state: nothing in doubt, anti_in_doubt is the identity (no
    # output-table read is even planned)
    ledger = IncrementalLedger(spark, wh)
    assert ledger.in_doubt_batches("b2") == []
    df = spark.range(3).select(F.col("id").cast("string").alias("doc_id"))
    assert anti_in_doubt(spark, df, f"{wh}/verdicts", []) is df

    # replay path: the scan of the output table must prune on batch_id
    probed = anti_in_doubt(spark, df, f"{wh}/verdicts", ["bX"])
    fmt = spark._jvm.PythonSQLUtils.explainString(
        probed._jdf.queryExecution(), "formatted"
    )
    scans = [
        l for l in fmt.splitlines() if "PartitionFilters" in l
    ]
    assert scans and any("batch_id" in l for l in scans), fmt


def test_snapshot_diff_intake_prunes_ledger(spark, tmp_path):
    """VERDICT r3 ask #7: with a monotone watermark column the intake is
    O(new rows) — committed history is excluded by a column filter plus
    run_id PARTITION pruning on the processed ledger, never a full-ledger
    scan."""
    from harvesting_validator_spark.incremental import IncrementalLedger

    wh = str(tmp_path / "wh")
    ledger = IncrementalLedger(spark, wh)

    def mk(lo, hi):
        return (
            spark.range(lo, hi)
            .select(
                F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
                F.col("id").cast("double").alias("ingested_at"),
            )
        )

    # run A: docs 0..9 processed and watermark-committed
    ledger.mark(mk(0, 10).select("doc_id"), "runA")
    ledger.record_watermark("runA", 9.0)
    # run C: docs 10..12 processed, watermark 12 committed — the current
    # BOUNDARY run (its watermark equals the global hw, so it must stay
    # in the anti-join set; runA is strictly below and prunable)
    ledger.mark(mk(10, 13).select("doc_id"), "runC")
    ledger.record_watermark("runC", 12.0)
    # run B: docs 13..14 marked but CRASHED before committing a watermark
    ledger.mark(mk(13, 15).select("doc_id"), "runB")

    new = ledger.new_docs(mk(0, 20), watermark_col="ingested_at")
    got = {r.doc_id for r in new.collect()}
    # 0..11 pruned by the >= hw filter; 12 (boundary) via runC's
    # partition; 13..14 via runB's (uncovered) partition; 15..19 are new
    assert got == {f"d{i}" for i in range(15, 20)}

    # the ledger scan must carry a run_id PARTITION filter (runA pruned
    # at file-listing time)
    fmt = spark._jvm.PythonSQLUtils.explainString(
        new._jdf.queryExecution(), "formatted"
    )
    part_lines = [l for l in fmt.splitlines() if "PartitionFilters" in l]
    assert part_lines and any("run_id" in l for l in part_lines), fmt

    # after runB's watermark commits, covered history below the new hw
    # (runA, runC) drops via the column filter + pruning; runB is the
    # new boundary
    ledger.record_watermark("runB", 14.0)
    got2 = {r.doc_id for r in
            ledger.new_docs(mk(0, 20), watermark_col="ingested_at").collect()}
    assert got2 == {f"d{i}" for i in range(15, 20)}


def test_watermark_boundary_append_is_not_lost(spark, tmp_path):
    """ADVICE r4 #2: the watermark contract is NON-strict monotonicity —
    a row appended after a run commits with watermark exactly equal to
    the committed hw must still surface as new work, while the processed
    boundary rows dedupe via the boundary run's ledger partition."""
    from harvesting_validator_spark.incremental import IncrementalLedger

    wh = str(tmp_path / "wh")
    ledger = IncrementalLedger(spark, wh)
    first = spark.createDataFrame(
        [("a", 1.0), ("b", 2.0)], "doc_id string, ingested_at double"
    )
    ledger.mark(first.select("doc_id"), "run1")
    ledger.record_watermark("run1", 2.0)
    # late tie: "c" lands AFTER run1 committed, with the same watermark
    appended = spark.createDataFrame(
        [("a", 1.0), ("b", 2.0), ("c", 2.0)],
        "doc_id string, ingested_at double",
    )
    got = {
        r.doc_id
        for r in ledger.new_docs(appended, watermark_col="ingested_at").collect()
    }
    assert got == {"c"}, "boundary-valued append must not be lost"


def test_resubmitted_run_id_covered_by_newest_watermark(spark, tmp_path):
    """Review-wave fix: a run_id with MULTIPLE watermark rows (nightly
    re-submission with a fixed --run-id) must be covered by its NEWEST
    watermark — covering it via an older row would prune the ledger
    partition that dedupes the hw-valued docs its latest commit already
    processed, reprocessing them every subsequent batch."""
    from harvesting_validator_spark.incremental import IncrementalLedger

    wh = str(tmp_path / "wh")
    ledger = IncrementalLedger(spark, wh)
    # night 1 and night 2 run under the SAME run id
    ledger.mark(
        spark.createDataFrame([("a",)], "doc_id string"), "nightly"
    )
    ledger.record_watermark("nightly", 1.0)
    ledger.mark(
        spark.createDataFrame([("b",)], "doc_id string"), "nightly"
    )
    ledger.record_watermark("nightly", 2.0)
    # night 3 presents the full corpus: "b" sits AT the global hw and
    # must dedupe through the nightly partition (not be reprocessed)
    corpus = spark.createDataFrame(
        [("a", 1.0), ("b", 2.0), ("c", 2.0)],
        "doc_id string, ingested_at double",
    )
    got = {
        r.doc_id
        for r in ledger.new_docs(corpus, watermark_col="ingested_at").collect()
    }
    assert got == {"c"}, "hw-valued docs of the re-submitted run leaked"


def test_legacy_unpartitioned_ledger_migrates(spark, tmp_path):
    """ADVICE r4 #4: a processed ledger written by the pre-r4 code
    (unpartitioned part files at the root, hex-string doc_id) is
    upgraded in place on first read — rewritten into run_id partitions
    with binary doc_id — and then coexists with new-layout appends."""
    import os

    from harvesting_validator_spark.incremental import IncrementalLedger

    wh = str(tmp_path / "wh")
    processed = f"{wh}/_processed"
    legacy = spark.createDataFrame(
        [("aa" * 32, "old1", 1.0), ("bb" * 32, "old2", 2.0)],
        "doc_id string, run_id string, processed_at double",
    )
    legacy.write.mode("overwrite").parquet(processed)  # the old layout
    assert any(n.startswith("part-") for n in os.listdir(processed))

    ledger = IncrementalLedger(spark, wh)
    rows = ledger.read().collect()
    assert {bytes(r.doc_id).hex() for r in rows} == {"aa" * 32, "bb" * 32}
    assert {r.run_id for r in rows} == {"old1", "old2"}
    # physically partitioned now, no root part files left
    assert any(n.startswith("run_id=") for n in os.listdir(processed))
    assert not any(
        n.startswith("part-") and os.path.isfile(os.path.join(processed, n))
        for n in os.listdir(processed)
    )
    # new-layout appends land alongside the migrated history
    new = spark.createDataFrame([(b"\xcc" * 32,)], "doc_id binary")
    ledger.mark(new, "run3")
    after = ledger.read()
    assert after.count() == 3
    assert {r.run_id for r in after.collect()} == {"old1", "old2", "run3"}
    # anti-join consumers see the migrated doc_ids
    src = spark.createDataFrame(
        [(bytes.fromhex("aa" * 32),), (b"\xdd" * 32,)], "doc_id binary"
    )
    assert ledger.new_docs(src).count() == 1


def test_process_incremental_with_watermark(spark, tmp_path):
    """End-to-end: watermarked intake processes each append once and is
    idempotent on re-presentation of the full corpus."""
    wh = str(tmp_path / "wh")
    corpus = generate_sources(spark, 40).withColumn(
        "ingested_at",
        F.element_at(F.split(F.regexp_extract("path", r"page(\d+)\.", 1), " "), 1)
        .cast("double"),
    )
    b1 = corpus.filter(F.col("ingested_at") < 20)
    n1, _ = process_incremental(
        spark, b1, APPLICATION_PROFILE, wh, "w1", watermark_col="ingested_at"
    )
    assert n1 == 20
    n2, _ = process_incremental(
        spark, corpus, APPLICATION_PROFILE, wh, "w2", watermark_col="ingested_at"
    )
    assert n2 == 20
    n3, out = process_incremental(
        spark, corpus, APPLICATION_PROFILE, wh, "w3", watermark_col="ingested_at"
    )
    assert n3 == 0 and out is None
    assert spark.read.parquet(f"{wh}/verdicts").select("doc_id").distinct().count() == 40
