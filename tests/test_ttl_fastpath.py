"""Turtle fast-kernel equivalence: for every doc, _fast_parse_turtle
either falls back (None) or produces exactly the tokenizer's triples.
Mirrors the NT fast-path test strategy (test_nt_fastpath.py)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from harvesting_validator_spark.sources.rdf_parse import (
    _fast_parse_turtle,
    parse_turtle,
)
from harvesting_validator_spark.sources.synthetic import GOLDEN_DOCS


def _assert_consistent(doc: str):
    fast = _fast_parse_turtle(doc)
    if fast is None:
        return False
    want = parse_turtle(doc)
    assert sorted(fast) == sorted(want), doc
    return True


def test_synthetic_corpus_differential(spark):
    """Every turtle doc the generator emits: fast == tokenizer (modes 0-6
    take the fast path; mode 8's ',' object list falls back)."""
    from pyspark.sql import functions as F

    from harvesting_validator_spark.sources.synthetic import (
        generate_entity_sources,
        generate_sources,
    )

    docs = (
        generate_sources(spark, 300)
        .filter(F.col("lang") == "turtle")
        .select("content")
        .collect()
    )
    docs += (
        generate_entity_sources(spark, 50).select("content").collect()
    )
    n_fast = sum(_assert_consistent(r.content) for r in docs)
    assert n_fast >= int(0.8 * len(docs))  # the corpus is fast-path-heavy


def test_golden_docs_consistent():
    for doc in GOLDEN_DOCS.values():
        _assert_consistent(doc)


def test_known_fallback_constructs():
    for doc in [
        '@prefix ex: <http://e/> .\nex:B ex:ssn "x", "y" .\n',
        '@prefix ex: <http://e/> .\nex:C ex:age 42 .\n',
        '@prefix ex: <http://e/> .\nex:D ex:w "k"@en .\n',
        '@prefix ex: <http://e/> .\nex:G ex:d "1971-07-07"^^<http://www.w3.org/2001/XMLSchema#date> .\n',
        '@base <http://b/> .\n<s> <p> <o> .\n',
        '@prefix ex: <http://e/> .\nex:H ex:v "a\\"b" .\n',
        '@prefix ex: <http://e/> .\nex:I ex:list ( ex:a ex:b ) .\n',
        '@prefix ex: <http://e/> .\nex:J ex:k [ ex:l "m" ] .\n',
        '@prefix ex: <http://e/> .\nex:K ex:v """long\nstring""" .\n',
        '@prefix ex: <http://e/> .\n# comment\nex:F a ex:T .\n',
        'PREFIX ex: <http://e/>\nex:M a ex:T .\n',
        'ex:NoPrefix a ex:Person .',
        '@prefix ex: <http://e/> .\nex:s ex:p "see @prefix y: <http://z/> ." .\n',
        # ADVICE r2: prefix redeclaration — hoisting would resolve the
        # FIRST statement against the second IRI (tokenizer scopes decls)
        '@prefix p: <http://a/> .\np:x p:y p:z .\n'
        '@prefix p: <http://b/> .\np:q p:r p:s .\n',
        # ADVICE r2: invalid shapes the tokenizer rejects — missing ';'
        # between pairs, and 'a' outside the predicate slot
        '@prefix ex: <http://e/> .\nex:s ex:p1 ex:o1 ex:p2 ex:o2 .\n',
        '@prefix ex: <http://e/> .\nex:s ex:p a .\n',
        '@prefix ex: <http://e/> .\na ex:p ex:o .\n',
    ]:
        assert _fast_parse_turtle(doc) is None, doc


def test_prefix_redeclaration_matches_tokenizer():
    """Conforming doc that redeclares a prefix: must parse (via the
    tokenizer) with each statement bound to the decl in scope AT that
    point — p:x under <http://a/>, p:q under <http://b/>."""
    doc = (
        "@prefix p: <http://a/> .\np:x p:y p:z .\n"
        "@prefix p: <http://b/> .\np:q p:r p:s .\n"
    )
    subjects = {t[0] for t in parse_turtle(doc)}
    assert subjects == {"http://a/x", "http://b/q"}


_pname = st.sampled_from(["ex:A", "ex:b.c", ":root", "ex:x%20y"])
_iri = st.sampled_from(["<http://x/y>", "<urn:uuid:1>", "<http://e/p#f>"])
_bnode = st.sampled_from(["_:b1", "_:x.y"])
_literal = st.text(
    alphabet=st.characters(
        codec="ascii", exclude_characters='"\\\n\r'
    ),
    max_size=20,
).map(lambda s: f'"{s}"')
_subject = st.one_of(_pname, _iri, _bnode, st.just("a"))
_predicate = st.one_of(_pname, _iri, st.just("a"))
_object = st.one_of(_pname, _iri, _bnode, _literal, st.just("a"))
# sprinkle in constructs the fast path must REJECT, not mis-parse
_object_any = st.one_of(
    _object,
    st.sampled_from(['"x"@en', '"1"^^<http://www.w3.org/2001/XMLSchema#int>',
                     "42", "true", "( ex:a )", '[ ex:p "v" ]']),
)


@st.composite
def _ttl_doc(draw):
    lines = ["@prefix ex: <http://e/> .", "@prefix : <http://d/> ."]
    if draw(st.booleans()):
        # occasionally redeclare a prefix mid-doc (fast path must fall back)
        lines.append("@prefix ex: <http://e2/> .")
    for _ in range(draw(st.integers(1, 4))):
        subj = draw(_subject)
        # ' ' (missing ';') is INVALID Turtle the fast path must reject
        sep = draw(st.sampled_from([" ; ", " "]))
        pos = [
            f"{draw(_predicate)} {draw(_object_any)}"
            for _ in range(draw(st.integers(1, 3)))
        ]
        lines.append(f"{subj} {sep.join(pos)} .")
    return "\n".join(lines) + "\n"


@settings(max_examples=300, deadline=None)
@given(_ttl_doc())
def test_fast_kernel_never_diverges(doc):
    """Property: over randomized simple/unsafe statement mixes, the fast
    kernel either falls back or agrees with the tokenizer exactly."""
    fast = _fast_parse_turtle(doc)
    if fast is None:
        return
    try:
        want = parse_turtle(doc)
    except Exception:
        # tokenizer rejects what the fast path accepted -> divergence
        raise AssertionError(f"fast parsed a doc the tokenizer rejects: {doc!r}")
    assert sorted(fast) == sorted(want), doc


def test_spark_level_differential(spark, monkeypatch):
    """Through mapInPandas: the whole mixed-format corpus parsed with the
    fast kernel enabled vs force-disabled yields identical triple sets."""
    from harvesting_validator_spark.sources import rdf_parse
    from harvesting_validator_spark.sources.rdf_parse import (
        parse_sources_to_triples,
    )
    from harvesting_validator_spark.sources.synthetic import (
        generate_sources,
        golden_sources,
    )

    corpus = generate_sources(spark, 120).unionByName(golden_sources(spark))
    with_fast = {tuple(r) for r in parse_sources_to_triples(corpus).collect()}
    monkeypatch.setattr(rdf_parse, "_fast_parse_turtle", lambda text: None)
    tokenizer_only = {
        tuple(r) for r in parse_sources_to_triples(corpus).collect()
    }
    assert with_fast == tokenizer_only and len(with_fast) > 200
