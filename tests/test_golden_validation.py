"""End-to-end golden test: the reference's dummy-import fixture, one
subject per document, validated against the reference's application
profile. Expected verdicts / valid / error sets are the inline comments in
`test/config/migrations/202103191602-create-dummy-import.ttl:7-31`
(pinned in FIXTURES.md §2).
"""

from __future__ import annotations

import pytest

from harvesting_validator_spark.plans.pipeline import run_validation
from harvesting_validator_spark.shacl.model import SH
from harvesting_validator_spark.sources.synthetic import (
    APPLICATION_PROFILE,
    golden_sources,
)

EX = "http://example.com/ns#"


@pytest.fixture(scope="module")
def run(spark):
    return run_validation(spark, golden_sources(spark), APPLICATION_PROFILE)


def _doc_key(run, spark):
    rows = run.sources.select("doc_id", "path").collect()
    return {r.path.split("/")[-1].split(".")[0]: r.doc_id for r in rows}


def test_verdicts(run, spark):
    key = _doc_key(run, spark)
    verdicts = {r.doc_id: r for r in run.verdicts.collect()}
    assert not verdicts[key["alice"]].conforms
    assert not verdicts[key["bob"]].conforms
    assert not verdicts[key["calvin"]].conforms
    assert verdicts[key["momo"]].conforms
    # Agrougrou: not targeted by any shape -> no violations -> conforms,
    # but is completely filtered (zero valid triples) — fixture line 30.
    assert verdicts[key["agrougrou"]].conforms


def test_violation_components(run, spark):
    key = _doc_key(run, spark)
    by_doc = {}
    for r in run.violations.collect():
        by_doc.setdefault(r.doc_id, []).append(r)

    alice = by_doc[key["alice"]]
    assert {v.constraint_component for v in alice} == {
        SH + "PatternConstraintComponent"
    }
    assert alice[0].value == "987-65-432A"

    bob_components = sorted(v.constraint_component for v in by_doc[key["bob"]])
    assert bob_components == [SH + "MaxCountConstraintComponent"]

    calvin = by_doc[key["calvin"]]
    comps = sorted(v.constraint_component for v in calvin)
    assert comps == [
        SH + "ClassConstraintComponent",
        SH + "ClosedConstraintComponent",
        SH + "ClosedConstraintComponent",
    ]
    closed_paths = {
        v.result_path for v in calvin
        if v.constraint_component == SH + "ClosedConstraintComponent"
    }
    assert closed_paths == {EX + "birthDate", EX + "www"}

    assert key["momo"] not in by_doc
    assert key["agrougrou"] not in by_doc


def test_valid_triples(run, spark):
    key = _doc_key(run, spark)
    valid = {}
    for r in run.valid_triples.collect():
        valid.setdefault(r.doc_id, set()).add((r.subj, r.pred, r.obj_value))

    rdf_type = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    # Alice keeps only the type triple (ssn fails pattern)
    assert valid[key["alice"]] == {(EX + "Alice", rdf_type, EX + "Person")}
    # Bob: maxCount drops BOTH ssns (fixture marks both invalid)
    assert valid[key["bob"]] == {(EX + "Bob", rdf_type, EX + "Person")}
    # Calvin keeps type + valid ssn; birthDate/www (closed) and worksFor
    # (class) are dropped
    assert valid[key["calvin"]] == {
        (EX + "Calvin", rdf_type, EX + "Person"),
        (EX + "Calvin", EX + "ssn", "987-65-4321"),
    }
    # Momo fully valid
    assert valid[key["momo"]] == {
        (EX + "Momo", rdf_type, EX + "Person"),
        (EX + "Momo", EX + "ssn", "987-65-4321"),
    }
    # Agrougrou completely filtered
    assert key["agrougrou"] not in valid


def test_error_triples_are_complement(run, spark):
    key = _doc_key(run, spark)
    errs = {}
    for r in run.error_triples.collect():
        errs.setdefault(r.doc_id, set()).add((r.subj, r.pred, r.obj_value))

    assert errs[key["alice"]] == {(EX + "Alice", EX + "ssn", "987-65-432A")}
    assert errs[key["bob"]] == {
        (EX + "Bob", EX + "ssn", "123-45-6789"),
        (EX + "Bob", EX + "ssn", "124-35-6789"),
    }
    assert errs[key["calvin"]] == {
        (EX + "Calvin", EX + "birthDate", "1971-07-07"),
        (EX + "Calvin", EX + "www", "kekee"),
        (EX + "Calvin", EX + "worksFor", EX + "UntypedCompany"),
    }
    assert key["momo"] not in errs
    rdf_type = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    assert errs[key["agrougrou"]] == {
        (EX + "Agrougrou", rdf_type, EX + "Coucou"),
        (EX + "Agrougrou", EX + "ssn", "987-65-4321"),
    }


def test_valid_error_partition_input(run, spark):
    """valid ∪ error == input, valid ∩ error == ∅ (F2 difference
    semantics, FilteringService.java:97)."""
    n_in = run.triples.count()
    n_valid = run.valid_triples.count()
    n_err = run.error_triples.count()
    assert n_valid + n_err == n_in
    overlap = run.valid_triples.intersect(run.error_triples).count()
    assert overlap == 0


def test_report_triples(run, spark):
    key = _doc_key(run, spark)
    rep = run.report.collect()
    by_doc = {}
    for r in rep:
        by_doc.setdefault(r.doc_id, []).append(r)
    # 4 violations total -> alice 1, bob 1, calvin 3
    for name, n_results in (("alice", 1), ("bob", 1), ("calvin", 3)):
        rows = by_doc[key[name]]
        results = {r.obj_value for r in rows if r.pred == SH + "result"}
        assert len(results) == n_results
        conforms = [r for r in rows if r.pred == SH + "conforms"]
        assert len(conforms) == 1 and conforms[0].obj_value == "false"
        # all report subjects are skolemized IRIs, never blank nodes
        assert all(not r.subj.startswith("_:") for r in rows)
    assert key["momo"] not in by_doc
    assert key["agrougrou"] not in by_doc


def test_report_is_deterministic(run, spark):
    a = sorted(
        (r.subj, r.pred, r.obj_value) for r in run.report.collect()
    )
    b = sorted(
        (r.subj, r.pred, r.obj_value) for r in run.report.collect()
    )
    assert a == b


class TestStrictMode:
    """shacl.strictModeFiltering=true analog (ApplicationConfig.java:38-39,
    52-56; default false at application.yml:7): a violated focus node is
    dropped WHOLE; non-strict output stays byte-identical to the default
    fixtures above (which this class re-derives and compares)."""

    @pytest.fixture(scope="class")
    def strict_run(self, spark):
        return run_validation(
            spark, golden_sources(spark), APPLICATION_PROFILE, strict=True
        )

    def test_strict_valid_triples(self, strict_run, spark):
        key = _doc_key(strict_run, spark)
        valid = {}
        for r in strict_run.valid_triples.collect():
            valid.setdefault(r.doc_id, set()).add((r.subj, r.pred, r.obj_value))
        rdf_type = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
        # Alice/Bob/Calvin each have >=1 violation -> dropped whole
        assert key["alice"] not in valid
        assert key["bob"] not in valid
        assert key["calvin"] not in valid
        # Momo conforms -> kept whole; Agrougrou untargeted -> filtered
        assert valid[key["momo"]] == {
            (EX + "Momo", rdf_type, EX + "Person"),
            (EX + "Momo", EX + "ssn", "987-65-4321"),
        }
        assert key["agrougrou"] not in valid

    def test_strict_error_complement(self, strict_run, spark):
        n_in = strict_run.triples.count()
        assert (
            strict_run.valid_triples.count() + strict_run.error_triples.count()
            == n_in
        )
        key = _doc_key(strict_run, spark)
        errs = {}
        for r in strict_run.error_triples.collect():
            errs.setdefault(r.doc_id, set()).add((r.subj, r.pred, r.obj_value))
        # Bob's type triple now lands in errors too (whole node dropped)
        rdf_type = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
        assert (EX + "Bob", rdf_type, EX + "Person") in errs[key["bob"]]

    def test_non_strict_unchanged(self, run, strict_run, spark):
        """The toggle must not perturb default-mode output: re-run with
        strict=False explicitly and compare full valid/error sets."""
        explicit = run_validation(
            spark, golden_sources(spark), APPLICATION_PROFILE, strict=False
        )
        for a, b in (
            (run.valid_triples, explicit.valid_triples),
            (run.error_triples, explicit.error_triples),
        ):
            sa = sorted(map(tuple, a.collect()))
            sb = sorted(map(tuple, b.collect()))
            assert sa == sb
        explicit.cleanup()
