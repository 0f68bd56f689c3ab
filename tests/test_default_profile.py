"""Parity with the reference's bundled default profile
(`src/main/resources/default.shaclc:7-16`): closed shape, 0..1
cardinalities, datatype union (xsd:integer|xsd:string), maxLength=5,
BlankNode nodeKind, and a NESTED node shape on ex:address."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from harvesting_validator_spark.plans.pipeline import run_validation
from harvesting_validator_spark.shacl.model import SH

EX = "http://example.com/ns#"

# default.shaclc re-expressed in SHACL/Turtle (shaclc compact syntax 1:1)
DEFAULT_PROFILE = """
@prefix ex: <http://example.com/ns#> .
@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .

ex:PersonShape a sh:NodeShape ;
  sh:targetClass ex:Person ;
  sh:closed true ;
  sh:ignoredProperties ( rdf:type ) ;
  sh:property [ sh:path ex:ssn ; sh:maxCount 1 ;
                sh:datatype xsd:string ;
                sh:pattern "^\\\\d{3}-\\\\d{2}-\\\\d{4}$" ] ;
  sh:property [ sh:path ex:worksFor ; sh:class ex:Company ;
                sh:nodeKind sh:IRI ] ;
  sh:property [ sh:path ex:address ; sh:maxCount 1 ;
                sh:nodeKind sh:BlankNode ; sh:node ex:AddressShape ] .

ex:AddressShape a sh:NodeShape ;
  sh:property [ sh:path ex:city ; sh:minCount 1 ; sh:maxCount 1 ;
                sh:datatype xsd:string ] ;
  sh:property [ sh:path ex:postalCode ; sh:minCount 1 ; sh:maxCount 1 ;
                sh:or ( [ sh:datatype xsd:integer ] [ sh:datatype xsd:string ] ) ;
                sh:maxLength 5 ] .
"""

DOCS = {
    # fully valid: string postalCode within 5 chars
    "ok_string_postal": """@prefix ex: <http://example.com/ns#> .
ex:P1 a ex:Person ; ex:ssn "123-45-6789" ;
  ex:address [ ex:city "Ghent" ; ex:postalCode "9000" ] .
""",
    # fully valid: integer postalCode (the sh:or union's other arm)
    "ok_int_postal": """@prefix ex: <http://example.com/ns#> .
ex:P2 a ex:Person ;
  ex:address [ ex:city "Aalst" ; ex:postalCode 9300 ] .
""",
    # nested minCount: address missing city
    "missing_city": """@prefix ex: <http://example.com/ns#> .
ex:P3 a ex:Person ; ex:address [ ex:postalCode "9000" ] .
""",
    # nested maxLength: 6-char postal code
    "long_postal": """@prefix ex: <http://example.com/ns#> .
ex:P4 a ex:Person ; ex:address [ ex:city "X" ; ex:postalCode "123456" ] .
""",
    # nested datatype union: xsd:date postal code matches neither arm
    "date_postal": """@prefix ex: <http://example.com/ns#> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
ex:P5 a ex:Person ;
  ex:address [ ex:city "X" ; ex:postalCode "2021-01-01"^^xsd:date ] .
""",
    # address must be a blank node, not an IRI
    "iri_address": """@prefix ex: <http://example.com/ns#> .
ex:P6 a ex:Person ; ex:address ex:SomePlace ;
  ex:worksFor ex:Acme . ex:Acme a ex:Company .
""",
}


@pytest.fixture(scope="module")
def run(spark):
    rows = [
        ("r", f"p/{name}.ttl", name, "turtle", text)
        for name, text in DOCS.items()
    ]
    sources = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )
    return run_validation(spark, sources, DEFAULT_PROFILE)


def _by_doc(run):
    key = {r.commit: r.doc_id for r in run.sources.select("doc_id", "commit").collect()}
    viol = {}
    for r in run.violations.collect():
        viol.setdefault(r.doc_id, []).append(r)
    return key, viol


def test_verdicts(run):
    key, _ = _by_doc(run)
    verdicts = {r.doc_id: r.conforms for r in run.verdicts.collect()}
    assert verdicts[key["ok_string_postal"]]
    assert verdicts[key["ok_int_postal"]]
    assert not verdicts[key["missing_city"]]
    assert not verdicts[key["long_postal"]]
    assert not verdicts[key["date_postal"]]
    assert not verdicts[key["iri_address"]]


def test_nested_min_count(run):
    key, viol = _by_doc(run)
    v = viol[key["missing_city"]]
    assert {x.constraint_component for x in v} == {
        SH + "MinCountConstraintComponent"
    }
    assert {x.result_path for x in v} == {EX + "city"}
    # the focus node of the nested violation is the address bnode
    assert all(x.focus_node.startswith("_:") for x in v)
    assert all(x.shape == EX + "AddressShape" for x in v)


def test_nested_max_length(run):
    key, viol = _by_doc(run)
    comps = {x.constraint_component for x in viol[key["long_postal"]]}
    assert SH + "MaxLengthConstraintComponent" in comps


def test_datatype_union(run):
    key, viol = _by_doc(run)
    v = viol[key["date_postal"]]
    comps = {x.constraint_component for x in v}
    # the 10-char date literal violates BOTH the datatype union and
    # maxLength=5 — SHACL evaluates every constraint independently
    assert comps == {
        SH + "DatatypeConstraintComponent",
        SH + "MaxLengthConstraintComponent",
    }
    assert {x.value for x in v} == {"2021-01-01"}


def test_blanknode_nodekind(run):
    key, viol = _by_doc(run)
    comps = {x.constraint_component for x in viol[key["iri_address"]]}
    assert SH + "NodeKindConstraintComponent" in comps
    # ex:SomePlace is not a blank node, so AddressShape's nested minCounts
    # must NOT fire on it (nested focus derivation excludes literals only;
    # IRI values do enter the child shape per SHACL sh:node semantics)


def test_valid_triples_keep_nested_bnode_structure(run):
    key, _ = _by_doc(run)
    doc = key["ok_string_postal"]
    valid = {
        (r.subj, r.pred, r.obj_value)
        for r in run.valid_triples.filter(F.col("doc_id") == doc).collect()
    }
    # person triples + the address bnode's own triples survive filtering
    assert (EX + "P1", EX + "ssn", "123-45-6789") in valid
    preds = {p for _, p, _ in valid}
    assert EX + "city" in preds and EX + "postalCode" in preds
