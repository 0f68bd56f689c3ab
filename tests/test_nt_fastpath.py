"""Vectorized N-Triples fast path: equivalence with the tokenizer parser,
per-doc fallback for non-strict input."""

from __future__ import annotations

from harvesting_validator_spark.sources.rdf_parse import (
    _parse_nt_vectorized,
    parse_ntriples,
    parse_sources_to_triples,
)

STRICT = """<http://e.org/a> <http://e.org/p> <http://e.org/b> .
<http://e.org/a> <http://e.org/q> "plain" .
<http://e.org/a> <http://e.org/q> "typed"^^<http://www.w3.org/2001/XMLSchema#integer> .
<http://e.org/a> <http://e.org/q> "tagged"@en-US .
_:b1 <http://e.org/p> _:b2 .
"""

NEEDS_FALLBACK = """<http://e.org/a> <http://e.org/p> "esc\\"aped" .
<http://e.org/a> <http://e.org/q> "x" .
"""

BARE_NUMBER = """<http://e.org/a> <http://e.org/p> 5 .
"""


def _norm(triples):
    return {
        (t[0], t[1], t[2], t[3], t[4], t[5] if t[5] else None)
        for t in triples
    }


def test_fast_path_matches_tokenizer():
    fast, fallback = _parse_nt_vectorized(["d1"], [STRICT])
    assert fallback == []
    got = {
        (r.subj, r.pred, r.obj_value, r.obj_kind,
         r.obj_datatype if isinstance(r.obj_datatype, str) else None,
         r.obj_lang if isinstance(r.obj_lang, str) else None)
        for r in fast.itertuples()
    }
    assert got == _norm(parse_ntriples(STRICT))


def test_escapes_route_to_fallback():
    fast, fallback = _parse_nt_vectorized(["d1"], [NEEDS_FALLBACK])
    assert fallback == ["d1"]
    assert fast is None or "d1" not in set(fast["doc_id"])


def test_bare_number_routes_to_fallback():
    fast, fallback = _parse_nt_vectorized(["d1"], [BARE_NUMBER])
    assert fallback == ["d1"]


def test_spark_path_identical_results(spark):
    rows = [
        ("r", "a.nt", "c1", "nt", STRICT),
        ("r", "b.nt", "c2", "ntriples", NEEDS_FALLBACK),
        ("r", "c.nt", "c3", "nt", BARE_NUMBER),
        ("r", "d.ttl", "c4", "turtle",
         '@prefix ex: <http://e.org/> .\nex:a ex:p "v" .\n'),
    ]
    src = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )
    got = {
        (r.subj, r.pred, r.obj_value, r.obj_kind, r.obj_datatype, r.obj_lang)
        for r in parse_sources_to_triples(src).collect()
    }
    expected = set()
    for _, _, _, lang, content in rows:
        from harvesting_validator_spark.sources.rdf_parse import parse_document
        for t in parse_document(content, lang):
            expected.add((t.subj, t.pred, t.obj_value, t.obj_kind,
                          t.obj_datatype, t.obj_lang))
    assert got == expected
