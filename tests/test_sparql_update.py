"""SPARQL 1.1 Update subset: quad semantics, sequences, and guards.

The reference's entire write surface is SPARQL Update (six of its
fifteen bundled templates — run verbatim in
test_sparql_reference_templates.py). These tests pin the ENGINE
semantics on handcrafted frames: graph-store set semantics (novelty
insert / delete-every-copy), pre-state evaluation within one operation,
skip-unbound template instantiation (Update §3.1.3), canonical quad
equality across RDF 1.1 xsd:string / lang-case variants, the
urn:doc:HEX vs sha256(iri) graph-naming symmetry between reads and
writes, and the degrade-don't-guess guards for out-of-subset forms.
"""

from __future__ import annotations

import hashlib

import pytest

from harvesting_validator_spark.sparql import (
    SparqlError,
    SparqlUnsupported,
    bind_template,
    graph_doc_id_bytes,
    sparql_select,
    sparql_update,
)

XSD = "http://www.w3.org/2001/XMLSchema#"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

_SCHEMA = (
    "doc_id binary, subj string, pred string, obj_value string, "
    "obj_kind string, obj_datatype string, obj_lang string"
)

ADMS = "http://www.w3.org/ns/adms#"
DCT = "http://purl.org/dc/terms/"
TASK1 = "http://t/task1"
TASK2 = "http://t/task2"
SCHEDULED = "http://status/scheduled"
BUSY = "http://status/busy"

UPDATE_STATUS = """
PREFIX adms: <http://www.w3.org/ns/adms#>
PREFIX dct: <http://purl.org/dc/terms/>
PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
DELETE {
  GRAPH ?g {
    ?subject adms:status ?status .
    ?subject dct:modified ?modified.
  }
}
INSERT {
  GRAPH ?g {
   ?subject adms:status <http://status/busy>.
   ?subject dct:modified "2021-02-02T00:00:00"^^xsd:dateTime.
  }
}
WHERE {
  GRAPH ?g {
    BIND(<%s> as ?subject)
    ?subject adms:status ?status .
    OPTIONAL { ?subject dct:modified ?modified. }
  }
}
"""


@pytest.fixture()
def tasks(spark):
    rows = [
        # doc 1: a task WITH a dct:modified row
        (b"\x01", TASK1, ADMS + "status", SCHEDULED, "iri", None, None),
        (b"\x01", TASK1, DCT + "modified", "2021-01-01T00:00:00",
         "literal", XSD + "dateTime", None),
        # doc 2: a task WITHOUT one (the OPTIONAL-unbound branch)
        (b"\x02", TASK2, ADMS + "status", SCHEDULED, "iri", None, None),
        (b"\x02", TASK2, RDF_TYPE, "http://t/Task", "iri", None, None),
    ]
    return spark.createDataFrame(rows, _SCHEMA)


def quads(df):
    return sorted(
        (r.doc_id.hex(), r.subj, r.pred, r.obj_value, r.obj_kind,
         r.obj_datatype, r.obj_lang)
        for r in df.collect()
    )


# --- graph naming -----------------------------------------------------------


def test_graph_doc_id_bytes_naming():
    assert graph_doc_id_bytes("urn:doc:01ff") == b"\x01\xff"
    ext = graph_doc_id_bytes("http://g/tasks")
    assert ext == hashlib.sha256(b"http://g/tasks").digest()
    with pytest.raises(SparqlError):
        graph_doc_id_bytes("urn:doc:xyz")
    with pytest.raises(SparqlError):
        graph_doc_id_bytes("urn:doc:abc")  # odd-length hex


def test_insert_data_external_graph_readable_by_name(tasks):
    out = sparql_update(
        tasks,
        'INSERT DATA { GRAPH <http://g/tasks> '
        '{ <http://t/task1> <http://p/x> "v" } }',
    )
    assert out.count() == tasks.count() + 1
    # symmetric with reads: the minted graph answers GRAPH <iri> queries
    got = sparql_select(
        out,
        "SELECT ?o WHERE { GRAPH <http://g/tasks> "
        "{ <http://t/task1> <http://p/x> ?o } }",
    ).collect()
    assert [r.o for r in got] == ["v"]
    (new,) = [r for r in out.collect() if r.obj_value == "v"]
    assert new.doc_id == hashlib.sha256(b"http://g/tasks").digest()
    assert new.obj_kind == "literal"


def test_insert_data_urn_doc_targets_that_document(tasks):
    out = sparql_update(
        tasks,
        'INSERT DATA { GRAPH <urn:doc:02> '
        '{ <http://t/task2> <http://p/x> <http://t/o> } }',
    )
    (new,) = [r for r in out.collect() if r.pred == "http://p/x"]
    assert new.doc_id == b"\x02"
    assert new.obj_kind == "iri"


# --- set semantics ----------------------------------------------------------


def test_insert_data_is_idempotent(tasks):
    req = (
        'INSERT DATA { GRAPH <urn:doc:01> '
        '{ <http://t/task1> <http://p/x> "v" } }'
    )
    once = sparql_update(tasks, req)
    twice = sparql_update(once, req)
    assert quads(once) == quads(twice)


def test_insert_data_matches_existing_xsd_string_variant(spark):
    # RDF 1.1: "v" and "v"^^xsd:string are the SAME term — inserting the
    # typed spelling over the plain one adds nothing
    g = spark.createDataFrame(
        [(b"\x01", "http://s", "http://p", "v", "literal", None, None)],
        _SCHEMA,
    )
    out = sparql_update(
        g,
        'PREFIX xsd: <http://www.w3.org/2001/XMLSchema#> INSERT DATA '
        '{ GRAPH <urn:doc:01> { <http://s> <http://p> "v"^^xsd:string } }',
    )
    assert out.count() == 1


def test_delete_data_removes_every_copy_and_canonicalizes(spark):
    # pre-existing duplicate rows of the matched quad all go; the
    # xsd:string-typed spelling and an upper-case lang tag still match
    rows = [
        (b"\x01", "http://s", "http://p", "v", "literal", None, None),
        (b"\x01", "http://s", "http://p", "v", "literal",
         XSD + "string", None),
        (b"\x01", "http://s", "http://q", "hi", "literal", None, "EN"),
        (b"\x01", "http://s", "http://r", "keep", "literal", None, None),
        (b"\x01", "http://s", "http://r", "keep", "literal", None, None),
    ]
    g = spark.createDataFrame(rows, _SCHEMA)
    out = sparql_update(
        g,
        'DELETE DATA { GRAPH <urn:doc:01> { '
        '<http://s> <http://p> "v" . <http://s> <http://q> "hi"@en } }',
    )
    got = quads(out)
    # both "v" spellings and the lang row are gone; the untouched
    # duplicate passes through unchanged (a store update is not a
    # corpus-wide dropDuplicates)
    assert got == [
        ("01", "http://s", "http://r", "keep", "literal", None, None),
        ("01", "http://s", "http://r", "keep", "literal", None, None),
    ]


# --- DELETE/INSERT WHERE ----------------------------------------------------


def test_modify_skips_unbound_delete_instantiations(tasks):
    # the update-task-status shape: doc 2 has no dct:modified, so that
    # delete instantiation is SKIPPED (Update §3.1.3), not an error —
    # and the insert still fires for both
    out = sparql_update(tasks, UPDATE_STATUS % TASK1)
    out = sparql_update(out, UPDATE_STATUS % TASK2)
    got = quads(out)
    assert (
        "01", TASK1, ADMS + "status", BUSY, "iri", None, None
    ) in got
    assert (
        "02", TASK2, ADMS + "status", BUSY, "iri", None, None
    ) in got
    # old status + old modified deleted; fresh modified on BOTH docs
    assert not [q for q in got if q[3] == SCHEDULED]
    assert not [q for q in got if q[3] == "2021-01-01T00:00:00"]
    assert len([q for q in got if q[2] == DCT + "modified"]) == 2
    # the untouched rdf:type row survives
    assert ("02", TASK2, RDF_TYPE, "http://t/Task", "iri", None, None) in got


def test_modify_where_evaluates_against_pre_state(spark):
    # rename p -> p itself with a changed object: the WHERE snapshot is
    # the PRE-state, so the op terminates and does not see its own insert
    g = spark.createDataFrame(
        [(b"\x01", "http://s", "http://p", "1", "literal",
          XSD + "integer", None)],
        _SCHEMA,
    )
    out = sparql_update(
        g,
        'PREFIX xsd: <http://www.w3.org/2001/XMLSchema#> '
        'DELETE { GRAPH ?g { ?s <http://p> ?o } } '
        'INSERT { GRAPH ?g { ?s <http://p> "2"^^xsd:integer } } '
        'WHERE { GRAPH ?g { ?s <http://p> ?o } }',
    )
    assert quads(out) == [
        ("01", "http://s", "http://p", "2", "literal",
         XSD + "integer", None),
    ]


def test_delete_where_shorthand(tasks):
    out = sparql_update(
        tasks,
        "PREFIX adms: <http://www.w3.org/ns/adms#> "
        "DELETE WHERE { GRAPH ?g { ?s adms:status ?o } }",
    )
    assert not [q for q in quads(out) if q[2] == ADMS + "status"]
    assert out.count() == tasks.count() - 2


def test_insert_only_modify_and_constant_target_graph(tasks):
    # INSERT {} WHERE {} with a CONSTANT graph in the template: solutions
    # come from doc-scoped WHERE, quads land in one named graph
    out = sparql_update(
        tasks,
        "PREFIX adms: <http://www.w3.org/ns/adms#> "
        "INSERT { GRAPH <http://g/audit> { ?s <http://p/was> ?o } } "
        "WHERE { GRAPH ?g { ?s adms:status ?o } }",
    )
    audit = hashlib.sha256(b"http://g/audit").digest().hex()
    got = [q for q in quads(out) if q[0] == audit]
    assert got == [
        (audit, TASK1, "http://p/was", SCHEDULED, "iri", None, None),
        (audit, TASK2, "http://p/was", SCHEDULED, "iri", None, None),
    ]
    assert out.count() == tasks.count() + 2


def test_sequence_ops_each_see_predecessor(tasks):
    # op1 inserts, op2 reads op1's quad through its WHERE (Update §3:
    # operations apply in order against the evolving store)
    out = sparql_update(
        tasks,
        'INSERT DATA { GRAPH <urn:doc:01> '
        '{ <http://t/task1> <http://p/flag> "y" } } ; '
        'DELETE { GRAPH ?g { ?s <http://p/flag> "y" } } '
        'INSERT { GRAPH ?g { ?s <http://p/flag2> "z" } } '
        'WHERE { GRAPH ?g { ?s <http://p/flag> "y" } } ;',
    )
    got = quads(out)
    assert not [q for q in got if q[2] == "http://p/flag"]
    assert ("01", TASK1, "http://p/flag2", "z", "literal", None, None) in got


# --- guards -----------------------------------------------------------------


@pytest.mark.parametrize(
    "text",
    [
        "CLEAR GRAPH <http://g>",
        "DROP GRAPH <http://g>",
        "LOAD <http://g>",
        "CREATE GRAPH <http://g>",
        "WITH <http://g> DELETE { GRAPH <urn:doc:01> { <s:a> <p:b> "
        '"v" } } WHERE { ?s ?p ?o }',
        'INSERT DATA { <http://s> <http://p> "v" }',  # no default graph
    ],
)
def test_out_of_subset_update_forms_raise(text):
    import harvesting_validator_spark.sparql as S

    with pytest.raises(SparqlUnsupported):
        S._Parser(text).parse_update()


@pytest.mark.parametrize(
    "text",
    [
        # variables in the DATA forms
        'INSERT DATA { GRAPH <urn:doc:01> { ?s <http://p> "v" } }',
        'DELETE DATA { GRAPH <urn:doc:01> { <http://s> <http://p> ?o } }',
        # variable graph in a DATA form
        'INSERT DATA { GRAPH ?g { <http://s> <http://p> "v" } }',
        # literal subject / predicate in a template
        'INSERT DATA { GRAPH <urn:doc:01> { "lit" <http://p> "v" } }',
        # empty quad set / empty GRAPH block
        "INSERT DATA { }",
        "INSERT DATA { GRAPH <urn:doc:01> { } }",
    ],
)
def test_malformed_update_raises(text):
    import harvesting_validator_spark.sparql as S

    with pytest.raises(SparqlError):
        S._Parser(text).parse_update()


def test_select_entry_points_updates_at_sparql_update(tasks):
    with pytest.raises(SparqlUnsupported, match="sparql_update"):
        sparql_select(
            tasks,
            'INSERT DATA { GRAPH <urn:doc:01> { <s:a> <p:b> "v" } }',
        )


def test_template_graph_var_must_be_a_graph_binding(tasks):
    # ?o is a term var, not a GRAPH binding from WHERE
    with pytest.raises(SparqlError, match="graph"):
        sparql_update(
            tasks,
            "INSERT { GRAPH ?o { ?s <http://p/x> ?s } } "
            "WHERE { GRAPH ?g { ?s <http://www.w3.org/ns/adms#status> ?o } }",
        ).collect()


# --- Freemarker <#if> -------------------------------------------------------


def test_bind_template_if_has_content():
    tpl = (
        "INSERT DATA { GRAPH <${g}> { <${uri}> <http://p/a> <${target}>."
        "<#if validationGraphUri?has_content>\n"
        "  <${uri}> <http://p/v> <${validationGraphUri}>.\n"
        "</#if>"
        " } }"
    )
    params = {
        "g": "http://g/t",
        "uri": "http://c/1",
        "target": "http://g/data",
    }
    dropped = bind_template(tpl, {**params, "validationGraphUri": ""})
    assert "http://p/v" not in dropped
    absent = bind_template(tpl, params)
    assert "http://p/v" not in absent
    kept = bind_template(
        tpl, {**params, "validationGraphUri": "http://g/check"}
    )
    assert "<http://c/1> <http://p/v> <http://g/check>" in kept
