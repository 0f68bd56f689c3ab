"""SHACL-core extension components (beyond the reference's profiles):
value ranges, sh:languageIn, sh:uniqueLang, and the property-pair
components sh:equals / sh:disjoint / sh:lessThan / sh:lessThanOrEquals.

Two layers:
1. handcrafted documents with EXACT expected violation identity sets
   (one case per component, incl. the incomparable-value edge);
2. a seeded differential sweep vs the independent pure-Python evaluator
   (tests/reference_shacl.py) on randomized corpora.
"""

from __future__ import annotations

import random

import pytest

from harvesting_validator_spark.shacl.compile import validate
from harvesting_validator_spark.shacl.parse import parse_shapes_turtle
from harvesting_validator_spark.sources.rdf_parse import Triple
from tests.reference_shacl import validate_reference

EX = "http://example.com/ns#"
SH = "http://www.w3.org/ns/shacl#"
XSD = "http://www.w3.org/2001/XMLSchema#"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

EXTENDED_PROFILE = """
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
@prefix ex: <http://example.com/ns#> .

ex:ProductShape a sh:NodeShape ;
  sh:targetClass ex:Product ;
  sh:property [ sh:path ex:price ;
                sh:minInclusive 0 ; sh:maxExclusive 1000 ] ;
  sh:property [ sh:path ex:label ;
                sh:languageIn ("en" "de") ; sh:uniqueLang true ] ;
  sh:property [ sh:path ex:sku ; sh:equals ex:skuAlias ] ;
  sh:property [ sh:path ex:tag ; sh:disjoint ex:category ] ;
  sh:property [ sh:path ex:salePrice ; sh:lessThanOrEquals ex:price ] ;
  sh:property [ sh:path ex:minQty ; sh:lessThan ex:maxQty ] .
"""

SHAPES = parse_shapes_turtle(EXTENDED_PROFILE)
SHAPE = EX + "ProductShape"


def _t(subj, pred, val, kind="literal", dt=XSD + "string", lang=None):
    if kind != "literal":
        dt = None
    return Triple(subj, pred, val, kind, dt, lang)


def _spark_violations(spark, docs):
    rows = [
        (doc_id, t.subj, t.pred, t.obj_value, t.obj_kind,
         t.obj_datatype, t.obj_lang)
        for doc_id, ts in docs.items()
        for t in ts
    ]
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


def test_parse_extended_constructs():
    by_path = {
        p.path: p for s in SHAPES.shapes for p in s.properties
    }
    price = by_path[EX + "price"]
    assert price.min_inclusive == "0" and price.max_exclusive == "1000"
    label = by_path[EX + "label"]
    assert label.language_in == ("en", "de") and label.unique_lang
    assert by_path[EX + "sku"].equals == EX + "skuAlias"
    assert by_path[EX + "tag"].disjoint == EX + "category"
    assert by_path[EX + "salePrice"].less_than_or_equals == EX + "price"
    assert by_path[EX + "minQty"].less_than == EX + "maxQty"


def test_handcrafted_exact_violations(spark):
    # p1 exercises the per-value components; p2 the pair components
    # (separate subjects so pair constraints see ONE clean price value)
    p1, p2 = EX + "P1", EX + "P2"
    docs = {
        "d": [
            _t(p1, RDF_TYPE, EX + "Product", kind="iri"),
            # ranges: -1 violates minInclusive, 1000 violates maxExclusive
            # (exclusive bound), "cheap" is non-numeric => BOTH range
            # components flag it, 999.5 conforms
            _t(p1, EX + "price", "-1", dt=XSD + "integer"),
            _t(p1, EX + "price", "1000", dt=XSD + "integer"),
            _t(p1, EX + "price", "cheap"),
            _t(p1, EX + "price", "999.5", dt=XSD + "decimal"),
            # languageIn/uniqueLang: fr not allowed; en duplicated
            _t(p1, EX + "label", "a", lang="en"),
            _t(p1, EX + "label", "b", lang="en"),
            _t(p1, EX + "label", "c", lang="fr"),
            _t(p1, EX + "label", "plain"),  # no lang tag => languageIn
            _t(p2, RDF_TYPE, EX + "Product", kind="iri"),
            _t(p2, EX + "price", "100", dt=XSD + "integer"),
            # equals: "X" shared, "Y" only on sku, "Z" only on alias
            _t(p2, EX + "sku", "X"),
            _t(p2, EX + "sku", "Y"),
            _t(p2, EX + "skuAlias", "X"),
            _t(p2, EX + "skuAlias", "Z"),
            # disjoint: "news" shared with category
            _t(p2, EX + "tag", "news"),
            _t(p2, EX + "tag", "sports"),
            _t(p2, EX + "category", "news"),
            # lessThanOrEquals vs price=100: 120 violates; 80 ok
            _t(p2, EX + "salePrice", "120", dt=XSD + "integer"),
            _t(p2, EX + "salePrice", "80", dt=XSD + "integer"),
            # lessThan strict: equal values violate
            _t(p2, EX + "minQty", "5", dt=XSD + "integer"),
            _t(p2, EX + "maxQty", "5", dt=XSD + "integer"),
        ]
    }
    got = _spark_violations(spark, docs)
    expect = {
        ("d", SHAPE, p1, SH + "MinInclusiveConstraintComponent",
         EX + "price", "-1"),
        ("d", SHAPE, p1, SH + "MaxExclusiveConstraintComponent",
         EX + "price", "1000"),
        ("d", SHAPE, p1, SH + "MinInclusiveConstraintComponent",
         EX + "price", "cheap"),
        ("d", SHAPE, p1, SH + "MaxExclusiveConstraintComponent",
         EX + "price", "cheap"),
        ("d", SHAPE, p1, SH + "LanguageInConstraintComponent",
         EX + "label", "c"),
        ("d", SHAPE, p1, SH + "LanguageInConstraintComponent",
         EX + "label", "plain"),
        ("d", SHAPE, p1, SH + "UniqueLangConstraintComponent",
         EX + "label", "en"),
        ("d", SHAPE, p2, SH + "EqualsConstraintComponent",
         EX + "sku", "Y"),
        ("d", SHAPE, p2, SH + "EqualsConstraintComponent",
         EX + "sku", "Z"),
        ("d", SHAPE, p2, SH + "DisjointConstraintComponent",
         EX + "tag", "news"),
        ("d", SHAPE, p2, SH + "LessThanOrEqualsConstraintComponent",
         EX + "salePrice", "120"),
        ("d", SHAPE, p2, SH + "LessThanConstraintComponent",
         EX + "minQty", "5"),
    }
    assert got == expect
    # the independent evaluator agrees on the same corpus
    ref = validate_reference(docs, SHAPES)
    assert ref == expect


def test_range_ignores_untargeted_and_conforming(spark):
    p, q = EX + "A", EX + "B"
    docs = {
        "d": [
            _t(p, RDF_TYPE, EX + "Product", kind="iri"),
            _t(p, EX + "price", "0", dt=XSD + "integer"),     # == min incl
            _t(p, EX + "price", "999.999", dt=XSD + "decimal"),
            # q is NOT typed Product: no focus, no violations
            _t(q, EX + "price", "-50", dt=XSD + "integer"),
        ]
    }
    assert _spark_violations(spark, docs) == set()


def test_numeric_vs_string_comparison_rule(spark):
    """lessThan falls back to string comparison when either side fails
    the numeric regex — '9' vs 'abc' compares lexically on both
    engines."""
    p = EX + "P"
    docs = {
        "d": [
            _t(p, RDF_TYPE, EX + "Product", kind="iri"),
            _t(p, EX + "minQty", "9", dt=XSD + "integer"),
            _t(p, EX + "maxQty", "abc"),
        ]
    }
    got = _spark_violations(spark, docs)
    assert got == validate_reference(docs, SHAPES)
    # '9' < 'abc' lexically => conforms under the documented rule
    assert got == set()


@pytest.mark.slow
def test_differential_random_corpora(spark):
    """Seeded randomized sweep: Spark compiler == independent evaluator
    violation-for-violation across all extension components."""
    rng = random.Random(0xC0FFEE)
    prices = ["-5", "0", "500", "1000", "1500", "n/a", "12.5"]
    langs = ["en", "de", "fr", None]
    vals = ["A", "B", "C"]
    nums = ["1", "5", "10", "x"]
    for trial in range(4):
        docs = {}
        for d in range(rng.randint(1, 5)):
            ts = []
            for i in range(rng.randint(1, 3)):
                subj = f"{EX}S{d}_{i}"
                if rng.random() < 0.9:
                    ts.append(_t(subj, RDF_TYPE, EX + "Product", kind="iri"))
                for _ in range(rng.randint(0, 3)):
                    ts.append(_t(subj, EX + "price", rng.choice(prices),
                                 dt=XSD + "string"))
                for _ in range(rng.randint(0, 3)):
                    ts.append(_t(subj, EX + "label", rng.choice(vals),
                                 lang=rng.choice(langs)))
                for pred in ("sku", "skuAlias", "tag", "category",
                             "salePrice", "minQty", "maxQty"):
                    for _ in range(rng.randint(0, 2)):
                        pool = nums if pred in (
                            "salePrice", "minQty", "maxQty"
                        ) else vals
                        ts.append(_t(subj, EX + pred, rng.choice(pool)))
            docs[f"doc{d}"] = ts
        got = _spark_violations(spark, docs)
        want = validate_reference(docs, SHAPES)
        assert got == want, f"trial {trial}: {got ^ want}"
