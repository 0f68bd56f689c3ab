"""Differential test: the Spark SHACL compiler vs an independent
pure-Python evaluator (tests/reference_shacl.py) on random corpora —
every constraint construct, including nested shapes, compared violation-
for-violation."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from harvesting_validator_spark.shacl.compile import validate
from harvesting_validator_spark.shacl.parse import parse_shapes_turtle
from harvesting_validator_spark.sources.rdf_parse import Triple
from tests.reference_shacl import validate_reference
from tests.test_default_profile import DEFAULT_PROFILE

EX = "http://example.com/ns#"
XSD = "http://www.w3.org/2001/XMLSchema#"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

SHAPES = parse_shapes_turtle(DEFAULT_PROFILE)

_ssn = st.sampled_from(["123-45-6789", "12-45-6789X", "987-65-4321", "nope"])
_postal = st.sampled_from(
    [("9000", XSD + "string"), ("123456", XSD + "string"),
     ("9300", XSD + "integer"), ("2021-01-01", XSD + "date"),
     ("x", XSD + "string")]
)
_company = st.sampled_from([EX + "Acme", EX + "Ghost"])  # Acme gets typed


@st.composite
def _person(draw, idx: int):
    """Triples for one person subject, randomly (non-)conforming."""
    subj = f"{EX}P{idx}"
    out = []
    if draw(st.booleans()):
        out.append(Triple(subj, RDF_TYPE, EX + "Person", "iri", None, None))
    for s in draw(st.lists(_ssn, max_size=2)):
        out.append(Triple(subj, EX + "ssn", s, "literal", XSD + "string", None))
    if draw(st.booleans()):
        c = draw(_company)
        out.append(Triple(subj, EX + "worksFor", c, "iri", None, None))
        if c == EX + "Acme":
            out.append(Triple(c, RDF_TYPE, EX + "Company", "iri", None, None))
    if draw(st.booleans()):  # closed-shape violation candidate
        out.append(Triple(subj, EX + "hobby", "z", "literal",
                          XSD + "string", None))
    addr_kind = draw(st.sampled_from(["none", "bnode", "iri", "two"]))
    if addr_kind != "none":
        nodes = []
        if addr_kind == "bnode":
            nodes = [f"_:a{idx}"]
        elif addr_kind == "iri":
            nodes = [f"{EX}Addr{idx}"]
        else:
            nodes = [f"_:a{idx}", f"_:b{idx}"]  # maxCount 1 violation
        for node in nodes:
            kind = "bnode" if node.startswith("_:") else "iri"
            out.append(Triple(subj, EX + "address", node, kind, None, None))
            if draw(st.booleans()):
                out.append(Triple(node, EX + "city", "Ghent", "literal",
                                  XSD + "string", None))
            pc, dt = draw(_postal)
            if draw(st.booleans()):
                out.append(Triple(node, EX + "postalCode", pc, "literal",
                                  dt, None))
    return out


@st.composite
def _corpus(draw):
    n_docs = draw(st.integers(min_value=1, max_value=6))
    docs = {}
    for d in range(n_docs):
        n_subj = draw(st.integers(min_value=1, max_value=2))
        triples = []
        for i in range(n_subj):
            triples.extend(draw(_person(d * 10 + i)))
        docs[f"doc{d}"] = triples
    return docs


def _spark_violations(spark, docs):
    rows = [
        (doc_id, t.subj, t.pred, t.obj_value, t.obj_kind,
         t.obj_datatype, t.obj_lang)
        for doc_id, ts in docs.items()
        for t in ts
    ]
    if not rows:
        return set()
    df = spark.createDataFrame(
        rows,
        "doc_id string, subj string, pred string, obj_value string, "
        "obj_kind string, obj_datatype string, obj_lang string",
    )
    viol = validate(df, SHAPES, spark, cache_intermediate=False)
    return {
        (r.doc_id, r.shape, r.focus_node, r.constraint_component,
         r.result_path, r.value)
        for r in viol.collect()
    }


@pytest.mark.slow
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(docs=_corpus())
def test_spark_compiler_matches_reference_evaluator(spark, docs):
    got = _spark_violations(spark, docs)
    expected = validate_reference(docs, SHAPES)
    assert got == expected
