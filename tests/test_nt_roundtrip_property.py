"""Property test: nt_lines serialization -> parse_ntriples is the identity
on arbitrary triples (escapes, datatypes, language tags, bnodes)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from harvesting_validator_spark.operators.filtering import nt_lines
from harvesting_validator_spark.sources.rdf_parse import parse_ntriples

XSD = "http://www.w3.org/2001/XMLSchema#"

_iri = st.from_regex(r"https?://e\.org/[A-Za-z0-9_]{1,8}", fullmatch=True)
_bnode = st.from_regex(r"_:[A-Za-z0-9]{1,6}", fullmatch=True)
# escapes exercised deliberately: quotes, backslashes, newlines, tabs
_lex = st.text(
    alphabet=st.one_of(
        st.characters(codec="utf-8", min_codepoint=0x20, max_codepoint=0x2FF),
        st.sampled_from(['"', "\\", "\n", "\r", "\t"]),
    ),
    max_size=24,
)

_literal = st.tuples(
    _lex,
    st.one_of(
        st.none(),  # plain string (xsd:string)
        st.just(XSD + "integer"),
        st.just(XSD + "date"),
    ),
    st.one_of(st.none(), st.just("en"), st.just("nl-be")),
)


@st.composite
def _triple(draw):
    subj = draw(st.one_of(_iri, _bnode))
    pred = draw(_iri)
    kind = draw(st.sampled_from(["iri", "bnode", "literal"]))
    if kind == "iri":
        return (subj, pred, draw(_iri), "iri", None, None)
    if kind == "bnode":
        return (subj, pred, draw(_bnode), "bnode", None, None)
    lex, dt, lang = draw(_literal)
    if lang is not None:
        return (subj, pred, lex, "literal", None, lang)
    return (subj, pred, lex, "literal", dt or XSD + "string", None)


@pytest.mark.slow
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(st.lists(_triple(), min_size=1, max_size=25, unique=True))
def test_nt_serialize_parse_roundtrip(spark, triples):
    rows = [("d0", *t) for t in triples]
    df = spark.createDataFrame(
        rows,
        "doc_id string, subj string, pred string, obj_value string, "
        "obj_kind string, obj_datatype string, obj_lang string",
    )
    text = "\n".join(r.line for r in nt_lines(df).collect())
    reparsed = {
        (t.subj, t.pred, t.obj_value, t.obj_kind, t.obj_datatype,
         (t.obj_lang or None))
        for t in parse_ntriples(text)
    }
    expected = {
        (s, p, o, k, dt, (lang.lower() if lang else None))
        for (s, p, o, k, dt, lang) in triples
    }
    assert reparsed == expected
