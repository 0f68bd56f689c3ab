"""SPARQL-based constraints (sh:sparql, SHACL spec §5.3).

Neither reference profile uses sh:sparql, but the reference's Jena engine
supports it and `ApplicationConfig.java:44-50` loads arbitrary profiles, so
a migrating user can hit it. The constraint's SELECT compiles through the
engine's own SPARQL->DataFrame compiler (sparql.py) with per-document
scoping (shacl/compile.py pass 7); everything the engine cannot evaluate
faithfully raises at PROFILE PARSE time (degrade-don't-guess).

Layers:
1. parse-time contract: prefix inlining, $this rewrite, skolem source
   ids, and every documented rejection;
2. handcrafted documents with EXACT expected violation identity sets —
   cross-node join constraint (not expressible in SHACL core), ?value /
   ?path binding mapping, per-document scoping, solution dedup;
3. composition: sh:sparql inside a sub-shape probed via sh:not.
"""

from __future__ import annotations

import pytest

from harvesting_validator_spark.shacl.compile import validate
from harvesting_validator_spark.shacl.parse import parse_shapes_turtle

EX = "http://example.com/ns#"
SH = "http://www.w3.org/ns/shacl#"
XSD = "http://www.w3.org/2001/XMLSchema#"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

PROFILE = """
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.com/ns#> .

ex:EmployeeShape a sh:NodeShape ;
  sh:targetClass ex:Employee ;
  sh:sparql [
    sh:message "manager below required level" ;
    sh:prefixes ex: ;
    sh:select \"\"\"
      SELECT $this ?value
      WHERE {
        $this ex:managedBy ?value .
        ?value ex:level ?lvl .
        FILTER(?lvl < 4)
      }
    \"\"\" ;
  ] .

ex: sh:declare [ sh:prefix "ex" ; sh:namespace "http://example.com/ns#" ] .
"""

SHAPES = parse_shapes_turtle(PROFILE)
SHAPE = EX + "EmployeeShape"
COMPONENT = SH + "SPARQLConstraintComponent"


def _frame(spark, rows):
    return spark.createDataFrame(
        rows,
        "doc_id string, subj string, pred string, obj_value string, "
        "obj_kind string, obj_datatype string, obj_lang string",
    )


def _violations(spark, rows, shapes=SHAPES):
    viol = validate(_frame(spark, rows), shapes, spark,
                    cache_intermediate=False)
    return {
        (r.doc_id, r.focus_node, r.result_path, r.value, r.value_kind,
         r.constraint_component, r.message)
        for r in viol.collect()
    }


def _emp(doc, emp, *managers):
    rows = [(doc, EX + emp, RDF_TYPE, EX + "Employee", "iri", None, None)]
    for m, lvl in managers:
        rows.append(
            (doc, EX + emp, EX + "managedBy", EX + m, "iri", None, None))
        rows.append((doc, EX + m, EX + "level", str(lvl), "literal",
                     XSD + "integer", None))
    return rows


# --- 1. parse-time contract ------------------------------------------------

def test_parse_inlines_prefixes_and_rewrites_this():
    (sc,) = SHAPES.by_id[SHAPE].sparql_constraints
    assert sc.select.startswith("PREFIX ex: <http://example.com/ns#>")
    assert "$this" not in sc.select and "?this" in sc.select
    assert sc.message == "manager below required level"
    # blank constraint nodes get deterministic skolem ids (C4 discipline)
    assert sc.source.startswith("urn:skolem:sparql:")
    assert parse_shapes_turtle(PROFILE).by_id[SHAPE].sparql_constraints[
        0].source == sc.source


def _expect_parse_error(profile_body: str, match: str):
    text = (
        "@prefix sh: <http://www.w3.org/ns/shacl#> .\n"
        "@prefix ex: <http://example.com/ns#> .\n" + profile_body
    )
    with pytest.raises(Exception, match=match):
        parse_shapes_turtle(text)


def test_parse_rejections():
    # missing sh:select (ask-only constraint validators)
    _expect_parse_error(
        'ex:S a sh:NodeShape ; sh:targetClass ex:T ; '
        'sh:sparql [ sh:message "m" ] .',
        "sh:select",
    )
    # pre-bound vars beyond $this
    _expect_parse_error(
        'ex:S a sh:NodeShape ; sh:targetClass ex:T ; sh:sparql [ sh:select '
        '"""SELECT $this WHERE { $this $PATH ?v . }""" ] .',
        r"\$PATH",
    )
    # $this never referenced
    _expect_parse_error(
        'ex:S a sh:NodeShape ; sh:targetClass ex:T ; sh:sparql [ sh:select '
        '"""SELECT ?v WHERE { ?a <http://example.com/ns#p> ?v . }""" ] .',
        r"\$this",
    )
    # GRAPH clause (compiler owns document scoping)
    _expect_parse_error(
        'ex:S a sh:NodeShape ; sh:targetClass ex:T ; sh:sparql [ sh:select '
        '"""SELECT $this WHERE { GRAPH ?g { $this '
        '<http://example.com/ns#p> ?v . } }""" ] .',
        "GRAPH",
    )
    # aggregates / solution modifiers have no per-focus meaning
    _expect_parse_error(
        'ex:S a sh:NodeShape ; sh:targetClass ex:T ; sh:sparql [ sh:select '
        '"""SELECT $this (COUNT(?v) AS ?n) WHERE { $this '
        '<http://example.com/ns#p> ?v . } GROUP BY ?this""" ] .',
        "out of contract",
    )
    _expect_parse_error(
        'ex:S a sh:NodeShape ; sh:targetClass ex:T ; sh:sparql [ sh:select '
        '"""SELECT $this WHERE { $this <http://example.com/ns#p> ?v . } '
        'LIMIT 5""" ] .',
        "out of contract",
    )
    # sh:sparql on a property shape whose path is an EXPRESSION ($PATH
    # substitution needs a plain IRI)
    _expect_parse_error(
        'ex:S a sh:NodeShape ; sh:targetClass ex:T ; sh:property [ '
        'sh:path [ sh:inversePath ex:p ] ; sh:sparql [ sh:select '
        '"""SELECT $this WHERE { $this ?p ?v . }""" ] ] .',
        "non-IRI",
    )
    # $PATH on a NODE shape (no path to substitute)
    _expect_parse_error(
        'ex:S a sh:NodeShape ; sh:targetClass ex:T ; sh:sparql [ sh:select '
        '"""SELECT $this WHERE { $this $PATH ?v . }""" ] .',
        r"\$PATH",
    )
    # out-of-subset SPARQL (SERVICE) surfaces the sparql.py error at parse
    _expect_parse_error(
        'ex:S a sh:NodeShape ; sh:targetClass ex:T ; sh:sparql [ sh:select '
        '"""SELECT $this WHERE { $this <http://example.com/ns#p> ?v . '
        'SERVICE <http://x> { $this <http://example.com/ns#q> ?v . } }""" '
        '] .',
        "(?i)service",
    )


def test_deactivated_constraint_is_skipped():
    text = (
        "@prefix sh: <http://www.w3.org/ns/shacl#> .\n"
        "@prefix ex: <http://example.com/ns#> .\n"
        "ex:S a sh:NodeShape ; sh:targetClass ex:T ; sh:sparql [ "
        'sh:deactivated true ; sh:select """broken $this (""" ] .'
    )
    assert parse_shapes_turtle(text).by_id[EX + "S"].sparql_constraints == ()


# --- 2. handcrafted exact violations ---------------------------------------

def test_cross_node_join_constraint_exact(spark):
    rows = (
        _emp("a", "e1", ("m1", 5))       # conforms
        + _emp("b", "e2", ("m2", 2))     # 1 violation (m2)
        + _emp("c", "e3", ("m3", 1), ("m4", 3))  # 2 violations
        + _emp("d", "e4", ("m5", 4))     # boundary: 4 is not < 4
    )
    msg = "manager below required level"
    assert _violations(spark, rows) == {
        ("b", EX + "e2", None, EX + "m2", "iri", COMPONENT, msg),
        ("c", EX + "e3", None, EX + "m3", "iri", COMPONENT, msg),
        ("c", EX + "e3", None, EX + "m4", "iri", COMPONENT, msg),
    }


def test_per_document_scoping(spark):
    # e9's manager m2 has NO level triple in doc z; m2's level 2 lives in
    # doc b only. Per-document semantics (each doc = one Jena model,
    # FilteringService.java:60-85): no violation may leak across docs.
    rows = _emp("b", "e2", ("m2", 2)) + [
        ("z", EX + "e9", RDF_TYPE, EX + "Employee", "iri", None, None),
        ("z", EX + "e9", EX + "managedBy", EX + "m2", "iri", None, None),
    ]
    assert {v[0] for v in _violations(spark, rows)} == {"b"}


def test_duplicate_solutions_dedup(spark):
    # two distinct ?other bindings yield the same (this, value) solution
    # projection; a validation report is a GRAPH (set semantics), so one
    # violation row survives
    profile = """
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.com/ns#> .
ex:S a sh:NodeShape ; sh:targetClass ex:Employee ; sh:sparql [
  sh:select \"\"\"
    PREFIX ex: <http://example.com/ns#>
    SELECT $this ?value WHERE {
      $this ex:managedBy ?value . $this ex:flag ?other .
    }\"\"\" ] .
"""
    shapes = parse_shapes_turtle(profile)
    rows = _emp("a", "e1", ("m1", 5)) + [
        ("a", EX + "e1", EX + "flag", "x", "literal", XSD + "string", None),
        ("a", EX + "e1", EX + "flag", "y", "literal", XSD + "string", None),
    ]
    viols = _violations(spark, rows, shapes)
    assert len(viols) == 1 and next(iter(viols))[3] == EX + "m1"


def test_path_binding_maps_to_result_path(spark):
    # ?path binding -> sh:resultPath; literal ?value keeps literal kind
    profile = """
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.com/ns#> .
ex:S a sh:NodeShape ; sh:targetClass ex:Employee ; sh:sparql [
  sh:select \"\"\"
    PREFIX ex: <http://example.com/ns#>
    SELECT $this ?path ?value WHERE {
      $this ?path ?value . FILTER(STRSTARTS(STR(?value), "bad-")) .
    }\"\"\" ] .
"""
    shapes = parse_shapes_turtle(profile)
    rows = _emp("a", "e1", ("m1", 5)) + [
        ("a", EX + "e1", EX + "note", "bad-data", "literal",
         XSD + "string", None),
    ]
    viols = _violations(spark, rows, shapes)
    assert viols == {
        ("a", EX + "e1", EX + "note", "bad-data", "literal", COMPONENT,
         "SPARQL constraint violated"),
    }


def test_core_constraints_compose_with_sparql(spark):
    # sh:sparql rides the SAME violations frame as core components: a doc
    # violating both a core minCount and the SPARQL rule reports both
    profile = PROFILE.replace(
        "sh:targetClass ex:Employee ;",
        "sh:targetClass ex:Employee ;\n  sh:property [ sh:path ex:badge ; "
        "sh:minCount 1 ] ;",
    )
    shapes = parse_shapes_turtle(profile)
    rows = _emp("a", "e1", ("m1", 2))  # no badge + low-level manager
    comps = {v[5] for v in _violations(spark, rows, shapes)}
    assert comps == {COMPONENT, SH + "MinCountConstraintComponent"}


def test_message_placeholder_substitution(spark):
    # sh:message {?var} / {$var} placeholders substitute per solution
    # (spec §5.3.2.3); unknown names stay literal
    profile = PROFILE.replace(
        'sh:message "manager below required level" ;',
        'sh:message "{$this} has low-level manager {?value} ({?nope})" ;',
    )
    shapes = parse_shapes_turtle(profile)
    rows = _emp("b", "e2", ("m2", 2))
    viols = _violations(spark, rows, shapes)
    assert {v[6] for v in viols} == {
        f"{EX}e2 has low-level manager {EX}m2 ({{?nope}})",
    }


def test_property_shape_sparql_with_path_prebinding(spark):
    # spec §5.3.1: on a property shape, $PATH substitutes the shape's
    # path IRI and violations default sh:resultPath to that path
    profile = """
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.com/ns#> .
ex:S a sh:NodeShape ; sh:targetClass ex:Employee ;
  sh:property [ sh:path ex:managedBy ;
    sh:sparql [
      sh:message "manager below required level" ;
      sh:select \"\"\"
        PREFIX ex: <http://example.com/ns#>
        SELECT $this ?value WHERE {
          $this $PATH ?value .
          ?value ex:level ?lvl .
          FILTER(?lvl < 4)
        }\"\"\" ] ] .
"""
    shapes = parse_shapes_turtle(profile)
    (ps,) = shapes.shapes[0].properties
    (sc,) = ps.sparql_constraints
    assert "$PATH" not in sc.select
    assert f"<{EX}managedBy>" in sc.select
    rows = _emp("a", "e1", ("m1", 5)) + _emp("b", "e2", ("m2", 2))
    viols = _violations(spark, rows, shapes)
    # result_path defaults to the property shape's path
    assert viols == {
        ("b", EX + "e2", EX + "managedBy", EX + "m2", "iri", COMPONENT,
         "manager below required level"),
    }


def test_absence_rule_via_not_exists(spark):
    # the other half of constraint space: "violation when something is
    # MISSING", expressed with FILTER NOT EXISTS inside sh:sparql (the
    # inner pattern inherits the per-document scope via the graph var)
    profile = """
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.com/ns#> .
ex:S a sh:NodeShape ; sh:targetClass ex:Employee ; sh:sparql [
  sh:message "manager has no recorded level" ;
  sh:select \"\"\"
    PREFIX ex: <http://example.com/ns#>
    SELECT $this ?value WHERE {
      $this ex:managedBy ?value .
      FILTER NOT EXISTS { ?value ex:level ?lvl . }
    }\"\"\" ] .
"""
    shapes = parse_shapes_turtle(profile)
    rows = _emp("a", "e1", ("m1", 5)) + [
        ("b", EX + "e2", RDF_TYPE, EX + "Employee", "iri", None, None),
        ("b", EX + "e2", EX + "managedBy", EX + "m9", "iri", None, None),
        # m9 has a level only in doc a — must NOT satisfy doc b's probe
        ("a", EX + "m9", EX + "level", "7", "literal", XSD + "integer",
         None),
    ]
    viols = _violations(spark, rows, shapes)
    assert viols == {
        ("b", EX + "e2", None, EX + "m9", "iri", COMPONENT,
         "manager has no recorded level"),
    }


def test_subselect_aggregate_constraint(spark):
    # r5: sub-SELECT joined the SPARQL subset, so a per-focus aggregate
    # becomes expressible INSIDE sh:sparql: the aggregate lives in the
    # nested query (per-solution semantics preserved — the outer query
    # still emits one result per solution), e.g. "more than one manager"
    profile = """
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.com/ns#> .
ex:S a sh:NodeShape ; sh:targetClass ex:Employee ; sh:sparql [
  sh:message "multiple managers" ;
  sh:select \"\"\"
    PREFIX ex: <http://example.com/ns#>
    SELECT $this WHERE {
      { SELECT $this (COUNT(?m) AS ?n) WHERE { $this ex:managedBy ?m }
        GROUP BY $this }
      FILTER(?n > 1)
    }\"\"\" ] .
"""
    shapes = parse_shapes_turtle(profile)
    rows = _emp("a", "e1", ("m1", 5)) + _emp("c", "e3", ("m3", 1), ("m4", 3))
    viols = _violations(spark, rows, shapes)
    assert {(v[0], v[1], v[6]) for v in viols} == {
        ("c", EX + "e3", "multiple managers"),
    }


def test_subselect_hiding_this_is_rejected():
    # ?this referenced ONLY inside a sub-select that does not project it:
    # SPARQL projection scope (18.2.2.8) hides it, so the constraint can
    # never attach violations to a focus — reject at profile parse
    _expect_parse_error(
        'ex:S a sh:NodeShape ; sh:targetClass ex:T ; sh:sparql [ sh:select '
        '"""SELECT ?v WHERE { { SELECT ?v WHERE { $this '
        '<http://example.com/ns#p> ?v . } } }""" ] .',
        r"\$this|\?this",
    )


# --- 3. composition with the probe machinery --------------------------------

def test_sparql_inside_negated_subshape(spark):
    # sh:not [ sh:sparql ... ]: focus violates iff it CONFORMS to the
    # sub-shape, i.e. iff the SPARQL constraint finds NO solution for it —
    # the recursion evaluates pass 7 for probe focus rows
    profile = """
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.com/ns#> .
ex:S a sh:NodeShape ; sh:targetClass ex:Employee ; sh:not ex:Sub .
ex:Sub a sh:NodeShape ; sh:sparql [
  sh:select \"\"\"
    PREFIX ex: <http://example.com/ns#>
    SELECT $this ?value WHERE {
      $this ex:managedBy ?value . ?value ex:level ?lvl . FILTER(?lvl < 4)
    }\"\"\" ] .
"""
    shapes = parse_shapes_turtle(profile)
    rows = _emp("a", "e1", ("m1", 5)) + _emp("b", "e2", ("m2", 2))
    viols = _violations(spark, rows, shapes)
    # e1 conforms to Sub (manager fine) => violates sh:not; e2 fails Sub
    # => conforms to sh:not
    assert {(v[0], v[1], v[5]) for v in viols} == {
        ("a", EX + "e1", SH + "NotConstraintComponent"),
    }


def test_message_placeholder_unbound_per_row_keeps_text(spark):
    # a placeholder var bound only inside OPTIONAL: rows where it is
    # NULL keep the literal placeholder (concat must not NULL out the
    # whole message)
    profile = """
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.com/ns#> .
ex:S a sh:NodeShape ; sh:targetClass ex:Employee ;
  sh:sparql [
    sh:message "low manager {?value}, nick {?nick}" ;
    sh:select \"\"\"
      PREFIX ex: <http://example.com/ns#>
      SELECT $this ?value ?nick WHERE {
        $this ex:managedBy ?value .
        ?value ex:level ?lvl .
        OPTIONAL { ?value ex:nick ?nick }
        FILTER(?lvl < 4)
      }\"\"\" ] .
"""
    shapes = parse_shapes_turtle(profile)
    rows = [
        ("a", EX + "e1", RDF_TYPE, EX + "Employee", "iri", None, None),
        ("a", EX + "e1", EX + "managedBy", EX + "m1", "iri", None, None),
        ("a", EX + "m1", EX + "level", "2", "literal",
         XSD + "integer", None),
    ]
    viols = _violations(spark, rows, shapes)
    assert {v[6] for v in viols} == {
        f"low manager {EX}m1, nick {{?nick}}",
    }
