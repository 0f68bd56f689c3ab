"""Property-based invariants (SURVEY.md §5 test 3).

For random corpora: valid ∪ error == input and valid ∩ error == ∅ (the F2
Model.difference semantics, `FilteringService.java:97`); verdicts are
consistent with violations; the pipeline is deterministic across runs.
Hypothesis drives the corpus shape; each example builds one multi-doc
corpus so Spark-session overhead stays bounded.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from harvesting_validator_spark.plans.pipeline import run_validation
from harvesting_validator_spark.sources.synthetic import APPLICATION_PROFILE

EX = "http://example.com/ns#"

_ssn_ok = st.from_regex(r"\d{3}-\d{2}-\d{4}", fullmatch=True)
_ssn_bad = st.text(
    alphabet="0123456789-XY", min_size=1, max_size=12
).filter(lambda s: not __import__("re").fullmatch(r"\d{3}-\d{2}-\d{4}", s))

_doc = st.fixed_dictionaries(
    {
        "typed": st.booleans(),          # rdf:type ex:Person present?
        "ssns": st.lists(st.one_of(_ssn_ok, _ssn_bad), max_size=3),
        "extra_prop": st.booleans(),     # closed-shape violation
        "works_for_typed": st.one_of(st.none(), st.booleans()),
    }
)


def _doc_to_turtle(i: int, d: dict) -> str:
    lines = [f"@prefix ex: <{EX}> ."]
    subj = f"ex:R{i}"
    stmts = []
    if d["typed"]:
        stmts.append("a ex:Person")
    for s in d["ssns"]:
        esc = s.replace("\\", "\\\\").replace('"', '\\"')
        stmts.append(f'ex:ssn "{esc}"')
    if d["extra_prop"]:
        stmts.append('ex:hobby "z"')
    if d["works_for_typed"] is not None:
        stmts.append("ex:worksFor ex:Corp")
    if not stmts:
        stmts.append('ex:other "x"')
    lines.append(subj + " " + " ;\n  ".join(stmts) + " .")
    if d["works_for_typed"]:
        lines.append("ex:Corp a ex:Company .")
    return "\n".join(lines) + "\n"


@pytest.mark.slow
@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(docs=st.lists(_doc, min_size=1, max_size=12))
def test_split_partition_and_verdict_consistency(spark, docs):
    rows = [
        ("r", f"p/{i}.ttl", f"c{i}", "turtle", _doc_to_turtle(i, d))
        for i, d in enumerate(docs)
    ]
    sources = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )
    run = run_validation(spark, sources, APPLICATION_PROFILE, cache=False)

    key = lambda r: (r.doc_id, r.subj, r.pred, r.obj_value, r.obj_kind,
                     r.obj_datatype, r.obj_lang)
    inp = {key(r) for r in run.triples.collect()}
    valid = {key(r) for r in run.valid_triples.collect()}
    error = {key(r) for r in run.error_triples.collect()}

    # F1/F2 set algebra: partition of the input
    assert valid | error == inp
    assert valid & error == set()

    # verdict consistency: conforms <=> no violations and parse ok
    n_viol = {
        r.doc_id: r["cnt"]
        for r in run.violations.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    for r in run.verdicts.collect():
        assert r.conforms == (n_viol.get(r.doc_id, 0) == 0 and r.parse_ok)

    # violations only ever name focus nodes that exist in the doc
    subj_by_doc = {}
    for t in inp:
        subj_by_doc.setdefault(t[0], set()).add(t[1])
    for r in run.violations.collect():
        assert r.focus_node in subj_by_doc[r.doc_id]


def test_determinism_across_runs(spark):
    docs = [
        {"typed": True, "ssns": ["123-45-6789", "99"], "extra_prop": True,
         "works_for_typed": False},
        {"typed": False, "ssns": ["1"], "extra_prop": False,
         "works_for_typed": None},
        {"typed": True, "ssns": [], "extra_prop": False,
         "works_for_typed": True},
    ]
    rows = [
        ("r", f"p/{i}.ttl", f"c{i}", "turtle", _doc_to_turtle(i, d))
        for i, d in enumerate(docs)
    ]
    sources = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )
    outs = []
    for _ in range(2):
        run = run_validation(spark, sources, APPLICATION_PROFILE, cache=False)
        outs.append({
            "verdicts": {tuple(r) for r in run.verdicts.collect()},
            "violations": {tuple(r) for r in run.violations.collect()},
            "valid": {tuple(r) for r in run.valid_triples.collect()},
            "report": {tuple(r) for r in run.report.collect()},
        })
    assert outs[0] == outs[1]
