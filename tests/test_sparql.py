"""SPARQL subset engine: parser, term semantics, algebra, and guards.

Differential correctness of the four registered sparql_* queries is
covered by tools/check_oracle.py (window) and test_oracle_tail.py
(tail); these tests pin the ENGINE semantics on handcrafted frames —
the cases a hash over the synthetic corpus can't isolate: term-equality
joins across datatypes/lang tags, OPTIONAL null-extension, UNION var
alignment, GRAPH constant scoping, effective-boolean FILTER evaluation,
and the degrade-don't-guess guards for out-of-subset constructs.
"""

from __future__ import annotations

import pytest

from harvesting_validator_spark.sparql import (
    SparqlError,
    SparqlUnsupported,
    parse_sparql,
    sparql_select,
)

XSD = "http://www.w3.org/2001/XMLSchema#"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

_SCHEMA = (
    "doc_id binary, subj string, pred string, obj_value string, "
    "obj_kind string, obj_datatype string, obj_lang string"
)


@pytest.fixture(scope="module")
def triples(spark):
    rows = [
        # doc 1: alice, typed Person, plain ssn, works for acme
        (b"\x01", "http://ex/Alice", RDF_TYPE, "http://ex/Person", "iri", None, None),
        (b"\x01", "http://ex/Alice", "http://ex/ssn", "123-45-6789", "literal", None, None),
        (b"\x01", "http://ex/Alice", "http://ex/worksFor", "http://ex/Acme", "iri", None, None),
        (b"\x01", "http://ex/Alice", "http://ex/label", "alice", "literal", None, "en"),
        # doc 2: bob, xsd:string ssn (RDF 1.1: same term as plain), int age
        (b"\x02", "http://ex/Bob", RDF_TYPE, "http://ex/Person", "iri", None, None),
        (b"\x02", "http://ex/Bob", "http://ex/ssn", "123-45-6789", "literal", XSD + "string", None),
        (b"\x02", "http://ex/Bob", "http://ex/age", "42", "literal", XSD + "integer", None),
        (b"\x02", "http://ex/Bob", "http://ex/knows", "_:b0", "bnode", None, None),
        # doc 3: acme the company; a literal that collides with an IRI's text
        (b"\x03", "http://ex/Acme", RDF_TYPE, "http://ex/Company", "iri", None, None),
        (b"\x03", "http://ex/Acme", "http://ex/label", "http://ex/Person", "literal", None, None),
    ]
    return spark.createDataFrame(rows, _SCHEMA)


def rows(df):
    return [tuple(r) for r in df.collect()]


# --- BGP + joins ------------------------------------------------------------


def test_bgp_join_and_constant_object(triples):
    got = rows(
        sparql_select(
            triples,
            """PREFIX ex: <http://ex/>
               SELECT ?who WHERE { ?who a ex:Person ; ex:ssn "123-45-6789" }
               ORDER BY ?who""",
        )
    )
    # plain literal in the query matches BOTH the plain and the
    # xsd:string-typed stored forms (RDF 1.1 collapse)
    assert got == [("http://ex/Alice",), ("http://ex/Bob",)]


def test_kind_distinguishes_literal_from_iri(triples):
    # ex:label "http://ex/Person" is a LITERAL: joining ?t against type
    # objects (IRIs) must not match it
    got = rows(
        sparql_select(
            triples,
            """PREFIX ex: <http://ex/>
               SELECT ?s WHERE { ?s ex:label ?t . ?x a ?t }""",
        )
    )
    assert got == []


def test_lang_tagged_literal_constant(triples):
    q = 'PREFIX ex: <http://ex/> SELECT ?s WHERE { ?s ex:label "alice"@en }'
    assert rows(sparql_select(triples, q)) == [("http://ex/Alice",)]
    q2 = 'PREFIX ex: <http://ex/> SELECT ?s WHERE { ?s ex:label "alice" }'
    assert rows(sparql_select(triples, q2)) == []  # plain != lang-tagged


def test_graph_constant_scopes_to_one_doc(triples):
    q = (
        "SELECT ?s WHERE { GRAPH <urn:doc:02> { ?s ?p ?o } } ORDER BY ?s"
    )
    got = rows(sparql_select(triples, q))
    assert set(got) == {("http://ex/Bob",)}


def test_graph_var_joins_within_doc(triples):
    # worksFor and type must come from the SAME graph: Alice only
    q = """PREFIX ex: <http://ex/>
           SELECT ?g ?p WHERE { GRAPH ?g { ?p a ex:Person ; ex:worksFor ?c } }"""
    assert rows(sparql_select(triples, q)) == [("01", "http://ex/Alice")]


# --- OPTIONAL / UNION -------------------------------------------------------


def test_optional_extends_with_nulls(triples):
    q = """PREFIX ex: <http://ex/>
           SELECT ?p ?co WHERE {
             ?p a ex:Person .
             OPTIONAL { ?p ex:worksFor ?co }
           } ORDER BY ?p"""
    assert rows(sparql_select(triples, q)) == [
        ("http://ex/Alice", "http://ex/Acme"),
        ("http://ex/Bob", None),
    ]


def test_union_aligns_vars(triples):
    q = """PREFIX ex: <http://ex/>
           SELECT ?x ?co WHERE {
             { ?x a ex:Company } UNION { ?x ex:worksFor ?co }
           } ORDER BY ?x"""
    assert rows(sparql_select(triples, q)) == [
        ("http://ex/Acme", None),
        ("http://ex/Alice", "http://ex/Acme"),
    ]


# --- FILTER builtins ---------------------------------------------------------


def test_filter_numeric_comparison(triples):
    q = """PREFIX ex: <http://ex/>
           SELECT ?p WHERE { ?p ex:age ?a . FILTER(?a >= 9) }"""
    # numeric, not lexical: "42" >= 9 (lexically "42" < "9")
    assert rows(sparql_select(triples, q)) == [("http://ex/Bob",)]


def test_filter_term_tests_and_lang(triples):
    q = """PREFIX ex: <http://ex/>
           SELECT ?o WHERE { ?s ex:knows ?o . FILTER isBlank(?o) }"""
    assert rows(sparql_select(triples, q)) == [("_:b0",)]
    q2 = """PREFIX ex: <http://ex/>
            SELECT ?v WHERE { ?s ex:label ?v . FILTER(lang(?v) = "en") }"""
    assert rows(sparql_select(triples, q2)) == [("alice",)]


def test_filter_str_functions_and_bound(triples):
    q = """PREFIX ex: <http://ex/>
           SELECT ?p WHERE {
             ?p a ex:Person .
             OPTIONAL { ?p ex:worksFor ?co }
             FILTER(!bound(?co) || strends(str(?co), "Acme"))
           } ORDER BY ?p"""
    assert [r[0] for r in rows(sparql_select(triples, q))] == [
        "http://ex/Alice", "http://ex/Bob",
    ]


def test_ask_true_and_false(triples):
    t = 'PREFIX ex: <http://ex/> ASK { ?s a ex:Company }'
    f = 'PREFIX ex: <http://ex/> ASK { ?s a ex:Robot }'
    assert rows(sparql_select(triples, t)) == [(True,)]
    assert rows(sparql_select(triples, f)) == [(False,)]


def test_count_group_by_and_modifiers(triples):
    q = """SELECT ?g (COUNT(*) AS ?n) WHERE { GRAPH ?g { ?s ?p ?o } }
           GROUP BY ?g ORDER BY DESC(?g) LIMIT 2 OFFSET 1"""
    assert rows(sparql_select(triples, q)) == [("02", 4), ("01", 4)]


def test_select_star_binds_all_vars(triples):
    q = 'PREFIX ex: <http://ex/> SELECT * WHERE { ?s ex:age ?v }'
    df = sparql_select(triples, q)
    assert sorted(df.columns) == ["s", "v"]
    assert rows(df) == [("http://ex/Bob", "42")]


# --- guards -------------------------------------------------------------------


@pytest.mark.parametrize(
    "text",
    [
        "SELECT (MEDIAN(?o) AS ?t) WHERE { ?s ?p ?o }",
        "SELECT (SUM(DISTINCT ?o) AS ?t) WHERE { ?s ?p ?o }",
        "SELECT ?s WHERE { ?s (<http://x>*)+ ?o }",  # nested closure
        "SELECT ?s WHERE { SERVICE <http://x> { ?s ?p ?o } }",
    ],
)
def test_out_of_subset_raises(text):
    with pytest.raises(SparqlUnsupported):
        parse_sparql(text)


# --- negation: FILTER [NOT] EXISTS and MINUS --------------------------------


def test_filter_not_exists_and_exists(triples):
    base = """PREFIX ex: <http://ex/>
        SELECT ?who WHERE {{ ?who a ex:Person .
          FILTER {neg} EXISTS {{ ?who ex:worksFor ?c . }} }} ORDER BY ?who"""
    assert rows(sparql_select(triples, base.format(neg="NOT"))) == [
        ("http://ex/Bob",)
    ]
    assert rows(sparql_select(triples, base.format(neg=""))) == [
        ("http://ex/Alice",)
    ]


def test_minus_shared_and_disjoint(triples):
    got = rows(sparql_select(
        triples,
        """PREFIX ex: <http://ex/>
           SELECT ?who WHERE { ?who a ex:Person .
             MINUS { ?who ex:worksFor ?c . } } ORDER BY ?who""",
    ))
    assert got == [("http://ex/Bob",)]
    # disjoint domains: SPARQL MINUS removes NOTHING (unlike NOT EXISTS)
    got = rows(sparql_select(
        triples,
        """PREFIX ex: <http://ex/>
           SELECT ?who WHERE { ?who a ex:Person .
             MINUS { ?x ex:nonexistent ?y . } } ORDER BY ?who""",
    ))
    assert got == [("http://ex/Alice",), ("http://ex/Bob",)]


def test_not_exists_scopes_per_document_inside_graph(triples):
    # Alice's doc (01) has no ex:age rows; Bob's (02) does. The inner
    # pattern inherits the GRAPH scope, so the probe joins on doc_id too.
    got = rows(sparql_select(
        triples,
        """PREFIX ex: <http://ex/>
           SELECT ?who WHERE { GRAPH ?g { ?who a ex:Person .
             FILTER NOT EXISTS { ?who ex:age ?a . } } } ORDER BY ?who""",
    ))
    assert got == [("http://ex/Alice",)]


def test_disconnected_pattern_raises(triples):
    with pytest.raises(SparqlUnsupported, match="cartesian|share"):
        sparql_select(
            triples, "SELECT ?a ?b WHERE { ?a a ?t . ?b ?p 42 }"
        ).collect()


def test_malformed_raises():
    with pytest.raises(SparqlError):
        parse_sparql("SELECT ?s WHERE { ?s ?p }")
    with pytest.raises(SparqlError):
        parse_sparql("PREFIX ex <http://x> SELECT ?s WHERE { ?s ?p ?o }")
    with pytest.raises(SparqlError):
        parse_sparql('SELECT ?s WHERE { "lit" ?p ?o } ORDER BY')


def test_literal_subject_has_no_solutions(triples):
    # spec: literal subjects are simply unmatchable, not an error
    q = 'PREFIX ex: <http://ex/> SELECT ?p WHERE { "x" ?p ?o }'
    assert rows(sparql_select(triples, q)) == []


# --- review-hardening regressions (r5 code-review findings) -------------------


def test_trailing_dot_terminates_pname(triples):
    # 'ex:Person.' (no space) must parse as the IRI + the '.' terminator,
    # not absorb the dot into the local name (PN_LOCAL can't end in '.')
    q = 'PREFIX ex: <http://ex/> SELECT ?s WHERE { ?s a ex:Person. } ORDER BY ?s'
    assert [r[0] for r in rows(sparql_select(triples, q))] == [
        "http://ex/Alice", "http://ex/Bob",
    ]
    # same for integers: '42.' is INTEGER 42 + DOT per the SPARQL grammar
    q2 = 'PREFIX ex: <http://ex/> SELECT ?p WHERE { ?p ex:age 42. }'
    assert rows(sparql_select(triples, q2)) == [("http://ex/Bob",)]


def test_ask_where_form(triples):
    q = "PREFIX ex: <http://ex/> ASK WHERE { ?s a ex:Person }"
    assert rows(sparql_select(triples, q)) == [(True,)]


def test_two_union_groups_join_without_ambiguity(triples):
    q = """PREFIX ex: <http://ex/>
           SELECT ?x WHERE {
             { ?x a ex:Person } UNION { ?x a ex:Company }
             { ?x ex:worksFor ?c } UNION { ?x ex:age ?a }
           } ORDER BY ?x"""
    assert [r[0] for r in rows(sparql_select(triples, q))] == [
        "http://ex/Alice", "http://ex/Bob",
    ]


def test_group_key_not_projected_stays_internal(triples):
    q = """SELECT ?s (COUNT(*) AS ?n) WHERE { GRAPH ?g { ?s ?p ?o } }
           GROUP BY ?s ?g ORDER BY ?s"""
    df = sparql_select(triples, q)
    assert df.columns == ["s", "n"]  # ?g groups but is not emitted
    assert rows(df) == [
        ("http://ex/Acme", 2), ("http://ex/Alice", 4), ("http://ex/Bob", 4),
    ]
    # projection declaration order is honored (aggregate first)
    q2 = "SELECT (COUNT(*) AS ?n) ?s WHERE { ?s ?p ?o } GROUP BY ?s"
    assert sparql_select(triples, q2).columns == ["n", "s"]


def test_group_by_without_aggregates(triples):
    q = "PREFIX ex: <http://ex/> SELECT ?t WHERE { ?s a ?t } GROUP BY ?t ORDER BY ?t"
    assert [r[0] for r in rows(sparql_select(triples, q))] == [
        "http://ex/Company", "http://ex/Person",
    ]
    with pytest.raises(SparqlUnsupported):
        sparql_select(
            triples, "SELECT ?s WHERE { ?s ?p ?o } GROUP BY ?s ?p"
        )


def test_graph_var_colliding_with_term_var_raises(triples):
    with pytest.raises(SparqlUnsupported, match="graph"):
        sparql_select(triples, "SELECT ?g WHERE { GRAPH ?g { ?g ?p ?o } }")


def test_unicode_escapes_decode(triples):
    from harvesting_validator_spark.sparql import _unescape

    assert _unescape(r"café") == "café"
    assert _unescape(r"\U0001F600") == "😀"
    with pytest.raises(SparqlError):
        _unescape(r"\d")  # unknown escapes are a syntax error, not 'd'


def test_datatype_of_lang_tagged_is_langstring(triples):
    q = ('PREFIX ex: <http://ex/> SELECT ?v WHERE { ?s ex:label ?v . '
         'FILTER(datatype(?v) = '
         '<http://www.w3.org/1999/02/22-rdf-syntax-ns#langString>) }')
    assert rows(sparql_select(triples, q)) == [("alice",)]


# --- property paths (non-closure, desugared) ----------------------------------


def test_sequence_path(triples):
    # Alice --worksFor--> Acme --a--> Company
    q = """PREFIX ex: <http://ex/>
           SELECT ?who ?t WHERE { ?who ex:worksFor/a ?t }"""
    assert rows(sparql_select(triples, q)) == [
        ("http://ex/Alice", "http://ex/Company"),
    ]


def test_inverse_path(triples):
    q = """PREFIX ex: <http://ex/>
           SELECT ?co WHERE { ?co ^ex:worksFor ?p . ?p a ex:Person }"""
    assert rows(sparql_select(triples, q)) == [("http://ex/Acme",)]


def test_alternative_path(triples):
    q = """PREFIX ex: <http://ex/>
           SELECT ?s ?v WHERE { ?s ex:ssn|ex:age ?v } ORDER BY ?s ?v"""
    assert rows(sparql_select(triples, q)) == [
        ("http://ex/Alice", "123-45-6789"),
        ("http://ex/Bob", "123-45-6789"),
        ("http://ex/Bob", "42"),
    ]


def test_composed_path_and_star_hides_path_vars(triples):
    # inverse inside a sequence, parenthesized; SELECT * must not leak
    # the desugaring's fresh intermediate variables
    q = """PREFIX ex: <http://ex/>
           SELECT * WHERE { ?e (ex:worksFor/^ex:worksFor) ?e2 }"""
    df = sparql_select(triples, q)
    assert sorted(df.columns) == ["e", "e2"]
    assert rows(df) == [("http://ex/Alice", "http://ex/Alice")]


def test_var_cannot_be_path_step():
    with pytest.raises(SparqlError):
        parse_sparql("SELECT ?s WHERE { ?s ?p/<http://x> ?o }")


# --- CONSTRUCT -----------------------------------------------------------------


def test_construct_derives_and_dedups(triples):
    q = """PREFIX ex: <http://ex/>
           CONSTRUCT { ?c ex:employs ?p . ?c a ex:Employer }
           WHERE { ?p ex:worksFor ?c }"""
    df = sparql_select(triples, q)
    assert df.columns == [
        "subj", "pred", "obj_value", "obj_kind", "obj_datatype", "obj_lang",
    ]
    got = {(r.subj, r.pred, r.obj_value, r.obj_kind) for r in df.collect()}
    assert got == {
        ("http://ex/Acme", "http://ex/employs", "http://ex/Alice", "iri"),
        ("http://ex/Acme", RDF_TYPE, "http://ex/Employer", "iri"),
    }


def test_construct_skips_invalid_instantiations(triples):
    # ?v is a literal for label rows -> literal subject instantiations
    # are skipped, not errors; unbound OPTIONAL vars likewise
    q = """PREFIX ex: <http://ex/>
           CONSTRUCT { ?v ex:seen "y" . ?p ex:emp ?co }
           WHERE { ?p a ex:Person .
                   OPTIONAL { ?p ex:worksFor ?co }
                   OPTIONAL { ?p ex:label ?v } }"""
    got = {(r.subj, r.pred, r.obj_value) for r in sparql_select(triples, q).collect()}
    assert got == {
        ("http://ex/Alice", "http://ex/emp", "http://ex/Acme"),
    }


def test_construct_output_is_requeryable(triples):
    derived = sparql_select(triples, """
        PREFIX ex: <http://ex/>
        CONSTRUCT { ?c ex:employs ?p } WHERE { ?p ex:worksFor ?c }""")
    again = sparql_select(
        derived.withColumn("doc_id", F_lit_binary()),
        "PREFIX ex: <http://ex/> SELECT ?p WHERE { ?c ex:employs ?p }",
    )
    assert rows(again) == [("http://ex/Alice",)]


def F_lit_binary():
    from pyspark.sql import functions as F

    return F.lit(b"\x00")


# --- BIND / VALUES / templates -------------------------------------------------


def test_bind_copies_term_and_computes_literals(triples):
    q = """PREFIX ex: <http://ex/>
           SELECT ?p ?who ?l WHERE {
             ?p a ex:Person .
             BIND(?p AS ?who)
             BIND(strlen(str(?p)) AS ?l)
             FILTER isIRI(?who)
           } ORDER BY ?p"""
    assert rows(sparql_select(triples, q)) == [
        ("http://ex/Alice", "http://ex/Alice", "15"),
        ("http://ex/Bob", "http://ex/Bob", "13"),
    ]
    with pytest.raises(SparqlError, match="already bound"):
        sparql_select(triples, "SELECT ?s WHERE { ?s ?p ?o . BIND(1 AS ?s) }")


def test_values_single_and_grouped(triples):
    q = """PREFIX ex: <http://ex/>
           SELECT ?s ?v WHERE {
             ?s ex:ssn ?v .
             VALUES ?s { <http://ex/Alice> <http://ex/Nobody> }
           }"""
    assert rows(sparql_select(triples, q)) == [
        ("http://ex/Alice", "123-45-6789"),
    ]
    # grouped form constrains tuples, and a plain VALUES literal matches
    # the stored xsd:string-typed twin (RDF 1.1 normalization at the join)
    q2 = """PREFIX ex: <http://ex/>
            SELECT ?s WHERE {
              ?s ex:ssn ?v .
              VALUES (?s ?v) { (<http://ex/Bob> "123-45-6789") }
            }"""
    assert rows(sparql_select(triples, q2)) == [("http://ex/Bob",)]


def test_plain_and_xsd_string_objects_unify_in_joins(triples):
    # Alice's ssn is plain, Bob's is ^^xsd:string — same RDF 1.1 term
    q = """PREFIX ex: <http://ex/>
           SELECT ?a ?b WHERE {
             ?a ex:ssn ?v . ?b ex:ssn ?v . FILTER(?a < ?b)
           }"""
    assert rows(sparql_select(triples, q)) == [
        ("http://ex/Alice", "http://ex/Bob"),
    ]


def test_bind_template_reference_shape():
    from harvesting_validator_spark.sparql import bind_template

    text = ("select ?path where { <${source}> "
            "<http://redpencil.data.gift/vocabularies/tasks/hasFile> ?file. "
            "?file <http://www.w3.org/ns/prov#wasDerivedFrom> "
            "<${derivedFrom}>. } limit ${limitSize?string.computer}")
    out = bind_template(text, {
        "source": "http://x/container1",
        "derivedFrom": "http://x/page",
        "limitSize": 100,
    })
    assert "<http://x/container1>" in out and "limit 100" in out
    q = parse_sparql(out)
    assert q.limit == 100
    with pytest.raises(KeyError, match="derivedFrom"):
        bind_template(text, {"source": "s", "limitSize": 1})


# --- second review wave regressions --------------------------------------------


def test_values_undef_cells(triples):
    # UNDEF is match-anything and binds nothing (r5 wave 5): the first
    # row constrains (?s ?v) fully, the second constrains only ?s —
    # Alice matches via the UNDEF ?v cell with her own ssn value kept
    q = """PREFIX ex: <http://ex/>
           SELECT ?s ?v WHERE {
             ?s ex:ssn ?v .
             VALUES (?s ?v) {
               (<http://ex/Bob> "123-45-6789")
               (<http://ex/Alice> UNDEF)
             }
           } ORDER BY ?s"""
    assert rows(sparql_select(triples, q)) == [
        ("http://ex/Alice", "123-45-6789"),
        ("http://ex/Bob", "123-45-6789"),
    ]
    # an all-UNDEF column constrains nothing: every solution survives
    q2 = """PREFIX ex: <http://ex/>
            SELECT ?p WHERE {
              ?p a ex:Person . VALUES ?p { UNDEF }
            } ORDER BY ?p"""
    assert rows(sparql_select(triples, q2)) == [
        ("http://ex/Alice",), ("http://ex/Bob",),
    ]


def test_values_join_compatibility_with_optional(triples):
    # Bob has no worksFor: ?co is unbound for him, which per SPARQL join
    # compatibility is COMPATIBLE with every VALUES row (and adopts its
    # value) — an equijoin would silently drop Bob
    q = """PREFIX ex: <http://ex/>
           SELECT ?p ?co WHERE {
             ?p a ex:Person .
             OPTIONAL { ?p ex:worksFor ?co }
             VALUES ?co { <http://ex/Acme> }
           } ORDER BY ?p"""
    assert rows(sparql_select(triples, q)) == [
        ("http://ex/Alice", "http://ex/Acme"),
        ("http://ex/Bob", "http://ex/Acme"),
    ]


def test_construct_single_pass_with_limit(triples):
    # both template triples must instantiate from the SAME solution slice
    q = """PREFIX ex: <http://ex/>
           CONSTRUCT { ?p ex:tag "x" . ?p a ex:Tagged }
           WHERE { ?p a ex:Person } LIMIT 1"""
    got = [tuple(r) for r in sparql_select(triples, q).collect()]
    subjects = {r[0] for r in got}
    assert len(got) == 2 and len(subjects) == 1  # one person, two triples


def test_construct_template_rejects_paths(triples):
    with pytest.raises(SparqlError):
        parse_sparql(
            "PREFIX ex: <http://ex/> "
            "CONSTRUCT { ?p ^ex:worksFor ?c } WHERE { ?p ex:worksFor ?c }"
        )
    with pytest.raises(SparqlError):
        parse_sparql(
            "PREFIX ex: <http://ex/> "
            "CONSTRUCT { ?p ex:a/ex:b ?c } WHERE { ?p ex:worksFor ?c }"
        )


def test_closure_modifier_parse_and_guards():
    # simple-IRI closures are IN the subset (r5 wave 3)
    for op in ("*", "+", "?"):
        parse_sparql(f"SELECT ?x WHERE {{ ?x <http://x/p>{op} ?y }}")
    # composite sub-path closures parse too (r5 wave 5); stacked
    # modifiers and nested closures stay out
    parse_sparql("SELECT ?x WHERE { ?x (<http://x/p>|<http://x/q>)+ ?y }")
    with pytest.raises(SparqlUnsupported):
        parse_sparql("SELECT ?x WHERE { ?x <http://x/p>*+ ?y }")
    with pytest.raises(SparqlUnsupported):
        parse_sparql("SELECT ?x WHERE { ?x (<http://x/p>*)+ ?y }")
    with pytest.raises(SparqlUnsupported):
        parse_sparql(
            "SELECT ?x WHERE { ?x (<http://x/p>/<http://x/q>*)+ ?y }"
        )


def test_parenthesized_var_path_step_rejected():
    with pytest.raises(SparqlError):
        parse_sparql("SELECT ?x WHERE { ?x ^(?v) ?y }")
    with pytest.raises(SparqlError):
        parse_sparql("SELECT ?x WHERE { ?x (?v)/<http://x/q> ?y }")


def test_group_by_no_agg_any_key_order(triples):
    q = """PREFIX ex: <http://ex/>
           SELECT ?s ?t WHERE { ?s a ?t } GROUP BY ?t ?s ORDER BY ?s"""
    assert len(rows(sparql_select(triples, q))) == 3


def test_construct_constant_xsd_string_normalized(triples):
    # a ^^xsd:string template constant must dedup against the var-derived
    # plain spelling (both canonicalize to datatype NULL)
    q = """PREFIX ex: <http://ex/>
           PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
           CONSTRUCT { ?s ex:ssn2 "123-45-6789"^^xsd:string .
                       ?s ex:ssn2 ?v }
           WHERE { ?s ex:ssn ?v . FILTER(?s = <http://ex/Alice>) }"""
    got = sparql_select(triples, q).collect()
    assert len(got) == 1 and got[0]["obj_datatype"] is None


def test_bind_boolean_expression(triples):
    q = """PREFIX ex: <http://ex/>
           SELECT ?p ?adult WHERE {
             ?p ex:age ?a . BIND(?a >= 18 AS ?adult)
           }"""
    assert rows(sparql_select(triples, q)) == [("http://ex/Bob", "true")]


def test_sum_min_max_avg_aggregates(triples):
    # numeric SUM/AVG over the int-typed ages; lexical MIN over ssn
    q = """PREFIX ex: <http://ex/>
           SELECT (SUM(?a) AS ?total) (AVG(?a) AS ?mean)
                  (MIN(?a) AS ?lo) (MAX(?a) AS ?hi)
           WHERE { ?p ex:age ?a }"""
    row = sparql_select(triples, q).collect()[0]
    assert float(row["total"]) == 42.0 and float(row["mean"]) == 42.0
    assert row["lo"] == "42" and row["hi"] == "42"
    q2 = """PREFIX ex: <http://ex/>
            SELECT ?t (SUM(?a) AS ?s) WHERE {
              ?p a ?t . OPTIONAL { ?p ex:age ?a }
            } GROUP BY ?t ORDER BY ?t"""
    got = rows(sparql_select(triples, q2))
    assert got[0][0] == "http://ex/Company" and got[0][1] is None
    assert got[1][0] == "http://ex/Person" and float(got[1][1]) == 42.0
    with pytest.raises(SparqlError):
        parse_sparql("SELECT (SUM(*) AS ?t) WHERE { ?s ?p ?o }")
    with pytest.raises(SparqlUnsupported):
        parse_sparql("SELECT (AVG(DISTINCT ?o) AS ?t) WHERE { ?s ?p ?o }")


# --- closure paths in query position (r5 wave 3) -----------------------------


@pytest.fixture(scope="module")
def chain_triples(spark):
    EX = "http://ex/"
    rows = [
        # doc 1: chain a->b->c->d, a label on a
        (b"\x01", EX + "a", EX + "next", EX + "b", "iri", None, None),
        (b"\x01", EX + "b", EX + "next", EX + "c", "iri", None, None),
        (b"\x01", EX + "c", EX + "next", EX + "d", "iri", None, None),
        (b"\x01", EX + "a", EX + "label", "start", "literal", None, None),
        # doc 2: 2-cycle x<->y
        (b"\x02", EX + "x", EX + "next", EX + "y", "iri", None, None),
        (b"\x02", EX + "y", EX + "next", EX + "x", "iri", None, None),
    ]
    return spark.createDataFrame(rows, _SCHEMA)


def test_closure_plus_star_question(chain_triples):
    base = "SELECT ?r WHERE {{ <http://ex/a> <http://ex/next>{op} ?r . }} ORDER BY ?r"
    got = lambda op: [
        r.r.replace("http://ex/", "")
        for r in sparql_select(chain_triples, base.format(op=op)).collect()
    ]
    assert got("+") == ["b", "c", "d"]
    # * includes the zero step (the anchor itself)
    assert got("*") == ["a", "b", "c", "d"]
    # ? is identity plus ONE hop
    assert got("?") == ["a", "b"]


def test_closure_cycle_self_reachability_scoped(chain_triples):
    # ?s next+ ?s finds exactly the cycle members, per document
    q = """SELECT ?g ?s WHERE { GRAPH ?g { ?s <http://ex/next>+ ?s . } }
           ORDER BY ?s"""
    assert rows(sparql_select(chain_triples, q)) == [
        ("02", "http://ex/x"), ("02", "http://ex/y"),
    ]


def test_inverse_closure_and_composition(chain_triples):
    # ^next+ from d walks the chain backwards (closure of the inverse ==
    # inverse of the closure, handled by the endpoint swap)
    q = "SELECT ?r WHERE { <http://ex/d> ^<http://ex/next>+ ?r . } ORDER BY ?r"
    assert [r.r for r in sparql_select(chain_triples, q).collect()] == [
        "http://ex/a", "http://ex/b", "http://ex/c",
    ]
    # closure step inside a sequence path: reach the label over next*
    q2 = ("SELECT ?v WHERE { <http://ex/a> "
          "<http://ex/next>*/<http://ex/label> ?v . }")
    assert [r.v for r in sparql_select(chain_triples, q2).collect()] == [
        "start"
    ]


def test_composite_closure_paths(chain_triples):
    # (r5 wave 5) closure of a sequence: two-hop strides from a land on
    # c only (a->b->c; c+2 overruns the chain)
    q = ("SELECT ?r WHERE { <http://ex/a> "
         "(<http://ex/next>/<http://ex/next>)+ ?r . } ORDER BY ?r")
    assert [r.r for r in sparql_select(chain_triples, q).collect()] == [
        "http://ex/c"
    ]
    # the zero-step variant includes the anchor
    q2 = ("SELECT ?r WHERE { <http://ex/a> "
          "(<http://ex/next>/<http://ex/next>)* ?r . } ORDER BY ?r")
    assert [r.r for r in sparql_select(chain_triples, q2).collect()] == [
        "http://ex/a", "http://ex/c",
    ]
    # alternation with an inverse arm: undirected reachability from b —
    # the whole doc-1 chain, b itself included (b->a->b); GRAPH scoping
    # threads through the composite hop compile
    q3 = ("SELECT ?r WHERE { GRAPH <urn:doc:01> { <http://ex/b> "
          "(<http://ex/next>|^<http://ex/next>)+ ?r . } } ORDER BY ?r")
    assert [r.r for r in sparql_select(chain_triples, q3).collect()] == [
        "http://ex/a", "http://ex/b", "http://ex/c", "http://ex/d",
    ]


# --- string builtins (r5 wave 3) ---------------------------------------------


def test_string_builtins_in_bind_and_filter(triples):
    q = """PREFIX ex: <http://ex/>
        SELECT ?u ?pre ?post ?sub WHERE {
          ?s ex:ssn ?v . ?s a ex:Person .
          FILTER(strlen(?v) = 11)
          BIND(ucase(?v) AS ?u)
          BIND(strbefore(?v, "-") AS ?pre)
          BIND(strafter(?v, "-") AS ?post)
          BIND(substr(?v, 5, 2) AS ?sub)
        } ORDER BY ?u LIMIT 1"""
    assert rows(sparql_select(triples, q)) == [
        ("123-45-6789", "123", "45-6789", "45"),
    ]


def test_concat_replace_lcase(triples):
    q = """PREFIX ex: <http://ex/>
        SELECT ?who ?r WHERE {
          ?who ex:label ?l . FILTER(lang(?l) = "en")
          BIND(concat("[", replace(lcase(?l), "A", "@", "i"), "]") AS ?r)
        }"""
    assert rows(sparql_select(triples, q)) == [
        ("http://ex/Alice", "[@lice]"),
    ]


def test_strbefore_strafter_no_match_and_empty(triples):
    q = """PREFIX ex: <http://ex/>
        SELECT ?b ?a ?e WHERE {
          ?s ex:age ?v .
          BIND(strbefore(?v, "x") AS ?b)
          BIND(strafter(?v, "x") AS ?a)
          BIND(strafter(?v, "") AS ?e)
        }"""
    # no match -> empty string (spec); empty needle -> "" / whole string
    assert rows(sparql_select(triples, q)) == [("", "", "42")]


# --- HAVING / IN / conditionals / new aggregates (r5 wave 4) ------------------


@pytest.fixture(scope="module")
def num_triples(spark):
    EX = "http://ex/"
    rows = [
        (b"\x01", EX + "A", EX + "v", "3", "literal", XSD + "integer", None),
        (b"\x01", EX + "A", EX + "v", "5", "literal", XSD + "integer", None),
        (b"\x01", EX + "B", EX + "v", "7", "literal", XSD + "integer", None),
        (b"\x02", EX + "C", EX + "v", "2", "literal", XSD + "integer", None),
        (b"\x01", EX + "A", EX + "lbl", "hi", "literal", None, "en-GB"),
    ]
    return spark.createDataFrame(rows, _SCHEMA)


def test_having_filters_groups(num_triples):
    q = """PREFIX ex: <http://ex/>
        SELECT ?s (COUNT(?o) AS ?n) (SUM(?o) AS ?total)
        WHERE { ?s ex:v ?o }
        GROUP BY ?s
        HAVING (COUNT(?o) > 1) (SUM(?o) >= 8)"""
    got = rows(sparql_select(num_triples, q))
    assert len(got) == 1
    s, n, total = got[0]
    assert (s, n, float(total)) == ("http://ex/A", 2, 8.0)


def test_having_reuses_projected_aggregate_column(num_triples):
    # the HAVING COUNT(?o) must reuse ?n's column — exactly one count
    # in the aggregate, no __hav internal column in the final schema
    q = """PREFIX ex: <http://ex/>
        SELECT ?s (COUNT(?o) AS ?n) WHERE { ?s ex:v ?o }
        GROUP BY ?s HAVING (COUNT(?o) = 1) ORDER BY ?s"""
    df = sparql_select(num_triples, q)
    assert df.columns == ["s", "n"]
    assert rows(df) == [("http://ex/B", 1), ("http://ex/C", 1)]
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert plan.lower().count("count(") <= 2  # partial+final, not doubled


def test_having_unprojected_aggregate_and_disjunction(num_triples):
    q = """PREFIX ex: <http://ex/>
        SELECT ?s WHERE { ?s ex:v ?o }
        GROUP BY ?s
        HAVING ((SUM(?o) > 6) || (COUNT(?o) > 1)) ORDER BY ?s"""
    got = rows(sparql_select(num_triples, q))
    assert got == [("http://ex/A",), ("http://ex/B",)]


def test_having_over_graph_key_and_global_group(num_triples):
    q = """SELECT ?g (COUNT(*) AS ?n) WHERE { GRAPH ?g { ?s ?p ?o } }
           GROUP BY ?g HAVING (COUNT(*) > 1)"""
    assert rows(sparql_select(num_triples, q)) == [("01", 4)]
    # global (keyless) aggregate with HAVING acts as an all-or-nothing
    q2 = """PREFIX ex: <http://ex/>
        SELECT (COUNT(?o) AS ?n) WHERE { ?s ex:v ?o } HAVING (COUNT(?o) > 99)"""
    assert rows(sparql_select(num_triples, q2)) == []


def test_having_guards(num_triples):
    with pytest.raises(SparqlError):
        # HAVING with neither aggregates nor GROUP BY anywhere
        sparql_select(
            num_triples,
            'SELECT ?s WHERE { ?s ?p ?o } HAVING (?s = "x")',
        )
    with pytest.raises(SparqlUnsupported):
        # key-only HAVING on a key-only grouping: use WHERE instead
        sparql_select(
            num_triples,
            """SELECT ?s WHERE { ?s ?p ?o } GROUP BY ?s HAVING (?s = "x")""",
        )
    with pytest.raises(SparqlError):
        # a HAVING var must be a group key
        sparql_select(
            num_triples,
            """PREFIX ex: <http://ex/>
               SELECT ?s (COUNT(?o) AS ?n) WHERE { ?s ex:v ?o }
               GROUP BY ?s HAVING (?o > 1)""",
        )


def test_in_and_not_in(num_triples):
    q = """PREFIX ex: <http://ex/>
        SELECT ?s ?o WHERE { ?s ex:v ?o FILTER(?o IN (3, 7)) } ORDER BY ?o"""
    assert rows(sparql_select(num_triples, q)) == [
        ("http://ex/A", "3"), ("http://ex/B", "7"),
    ]
    q2 = """PREFIX ex: <http://ex/>
        SELECT ?s ?o WHERE { ?s ex:v ?o FILTER(?s NOT IN (ex:A)) }
        ORDER BY ?o"""
    assert rows(sparql_select(num_triples, q2)) == [
        ("http://ex/C", "2"), ("http://ex/B", "7"),
    ]
    # empty lists are compile-time constants
    q3 = """PREFIX ex: <http://ex/>
        SELECT ?o WHERE { ex:B ex:v ?o FILTER(?o IN ()) }"""
    assert rows(sparql_select(num_triples, q3)) == []
    q4 = """PREFIX ex: <http://ex/>
        SELECT ?o WHERE { ex:B ex:v ?o FILTER(?o NOT IN ()) }"""
    assert rows(sparql_select(num_triples, q4)) == [("7",)]
    with pytest.raises(SparqlUnsupported):
        parse_sparql(
            "SELECT ?o WHERE { ?s ?p ?o FILTER(?o IN (?s)) }"
        )


def test_if_coalesce_langmatches(num_triples):
    q = """PREFIX ex: <http://ex/>
        SELECT ?s ?x WHERE {
          ?s ex:v ?o .
          OPTIONAL { ?s ex:lbl ?l FILTER langMatches(LANG(?l), "EN") }
          BIND(IF(?o > 4, COALESCE(?l, "big"), "small") AS ?x)
        } ORDER BY ?s ?x"""
    assert rows(sparql_select(num_triples, q)) == [
        ("http://ex/A", "hi"), ("http://ex/A", "small"),
        ("http://ex/B", "big"), ("http://ex/C", "small"),
    ]
    # langMatches "*" matches any tagged literal; a bare range matches
    # extended subtags case-insensitively (en matches en-GB)
    q2 = """PREFIX ex: <http://ex/>
        SELECT ?l WHERE { ?s ex:lbl ?l FILTER langMatches(LANG(?l), "*") }"""
    assert rows(sparql_select(num_triples, q2)) == [("hi",)]
    with pytest.raises(SparqlError):
        # arity is checked at compile time
        sparql_select(
            num_triples, "SELECT ?o WHERE { ?s ?p ?o FILTER(IF(?o)) }"
        )


def test_group_concat_and_sample(num_triples):
    q = """PREFIX ex: <http://ex/>
        SELECT ?s (GROUP_CONCAT(?o; SEPARATOR="|") AS ?vals)
               (SAMPLE(?o) AS ?any)
        WHERE { ?s ex:v ?o } GROUP BY ?s ORDER BY ?s"""
    assert rows(sparql_select(num_triples, q)) == [
        ("http://ex/A", "3|5", "3"),
        ("http://ex/B", "7", "7"),
        ("http://ex/C", "2", "2"),
    ]
    # DISTINCT dedups terms before concatenation; default separator " "
    q2 = """PREFIX ex: <http://ex/>
        SELECT (GROUP_CONCAT(DISTINCT ?p) AS ?preds) WHERE { ?s ?p ?o }"""
    got = rows(sparql_select(num_triples, q2))
    assert got == [("http://ex/lbl http://ex/v",)]
    with pytest.raises(SparqlError):
        parse_sparql(
            'SELECT (SUM(?o; SEPARATOR=",") AS ?x) WHERE { ?s ?p ?o }'
        )


# --- sub-SELECT (r5 wave 4) ---------------------------------------------------


def test_subselect_aggregate_joins_outer_pattern(num_triples):
    # the grouped sub-select's ?n rides into the outer BGP join; the
    # outer ?o is a FRESH variable (the inner ?o is hidden — SPARQL
    # 18.2.2.8 projection scope)
    q = """PREFIX ex: <http://ex/>
        SELECT ?s ?n ?o WHERE {
          { SELECT ?s (COUNT(?o) AS ?n) WHERE { ?s ex:v ?o } GROUP BY ?s }
          ?s ex:v ?o .
          FILTER(?n > 1)
        } ORDER BY ?o"""
    assert rows(sparql_select(num_triples, q)) == [
        ("http://ex/A", 2, "3"), ("http://ex/A", 2, "5"),
    ]


def test_subselect_scope_hides_unprojected_vars(num_triples):
    # inner ?o (ex:v values) is unprojected -> invisible; the outer ?o
    # binds lbl values independently. The non-DISTINCT inner select
    # keeps multiset cardinality: A appears twice (two ex:v rows)
    q = """PREFIX ex: <http://ex/>
        SELECT ?s WHERE {
          { SELECT ?s WHERE { ?s ex:v ?o } }
          ?s ex:lbl ?o .
        }"""
    assert rows(sparql_select(num_triples, q)) == [
        ("http://ex/A",), ("http://ex/A",),
    ]


def test_subselect_inside_graph_scopes_per_document(num_triples):
    q = """SELECT ?g ?n WHERE {
          GRAPH ?g { SELECT ?g (COUNT(*) AS ?n) WHERE { ?s ?p ?o }
                     GROUP BY ?g }
        } ORDER BY ?g"""
    assert rows(sparql_select(num_triples, q)) == [("01", 4), ("02", 1)]


def test_subselect_distinct_order_slice(num_triples):
    # inner DISTINCT + ORDER + slice: the slice is ordered INSIDE; the
    # outer sequence order is unspecified, so compare as a set
    q = """PREFIX ex: <http://ex/>
        SELECT ?o WHERE {
          { SELECT DISTINCT ?o WHERE { ?s ex:v ?o }
            ORDER BY ?o LIMIT 2 OFFSET 1 }
        }"""
    assert sorted(rows(sparql_select(num_triples, q))) == [("3",), ("5",)]


def test_subselect_order_hoists_through_outer_slice(num_triples):
    # the reference pager shape: ORDER BY inside, LIMIT outside — the
    # inner sort must be observable through the outer slice
    q = """PREFIX ex: <http://ex/>
        SELECT ?o WHERE {
          { SELECT ?o WHERE { ?s ex:v ?o } ORDER BY DESC(?o) }
        } LIMIT 2"""
    assert rows(sparql_select(num_triples, q)) == [("7",), ("5",)]


def test_subselect_under_graph_var_groups_per_active_graph(num_triples):
    # NO explicit ?g inside the sub-select: the active graph implicitly
    # scopes the aggregate (SPARQL 13.3 — the group pattern, sub-queries
    # included, evaluates once per named graph) and the graph binding
    # propagates outward for the enclosing join. This is also what keeps
    # sh:sparql sub-selects per-document (shacl pass 7)
    q = """SELECT ?g ?n WHERE {
          GRAPH ?g { { SELECT (COUNT(*) AS ?n) WHERE { ?s ?p ?o } } }
        } ORDER BY ?g"""
    assert rows(sparql_select(num_triples, q)) == [("01", 4), ("02", 1)]


def test_subselect_slice_under_graph_var_rejected(num_triples):
    # LIMIT under a graph VARIABLE would apply per active graph — out of
    # the subset, must refuse loudly (constant-graph slices stay fine)
    q = """SELECT ?g ?o WHERE {
          GRAPH ?g { { SELECT ?o WHERE { ?s ?p ?o } LIMIT 1 } }
        }"""
    with pytest.raises(SparqlUnsupported):
        sparql_select(num_triples, q)


# --- DESCRIBE (r5 wave 5) -----------------------------------------------------


def test_describe_constant_iri(triples):
    got = rows(sparql_select(triples, "DESCRIBE <http://ex/Alice>"))
    assert len(got) == 4 and {r[0] for r in got} == {"http://ex/Alice"}
    # lang tags survive; xsd:string would normalize (none here)
    assert ("http://ex/Alice", "http://ex/label", "alice", "literal",
            None, "en") in got


def test_describe_var_with_where(triples):
    q = """PREFIX ex: <http://ex/>
           DESCRIBE ?c WHERE { ?p ex:worksFor ?c }"""
    got = rows(sparql_select(triples, q))
    assert {r[0] for r in got} == {"http://ex/Acme"} and len(got) == 2
    # DESCRIBE * describes every pattern var (here: the company too)
    q2 = """PREFIX ex: <http://ex/>
            DESCRIBE * WHERE { ?c a ex:Company }"""
    assert rows(sparql_select(triples, q2)) == got


def test_describe_follows_bnode_structure(spark):
    # CBD must include the nested bnode rows TRANSITIVELY, within the
    # same document only (doc 2 reuses the _:a label with other content)
    EX = "http://ex/"
    rows_in = [
        (b"\x01", EX + "P", EX + "addr", "_:a", "bnode", None, None),
        (b"\x01", "_:a", EX + "street", "Main st", "literal", None, None),
        (b"\x01", "_:a", EX + "geo", "_:g", "bnode", None, None),
        (b"\x01", "_:g", EX + "lat", "51.0", "literal", None, None),
        (b"\x01", EX + "Q", EX + "other", "_:q", "bnode", None, None),
        (b"\x01", "_:q", EX + "x", "no", "literal", None, None),
        (b"\x02", "_:a", EX + "street", "Other st", "literal", None, None),
    ]
    t = spark.createDataFrame(rows_in, _SCHEMA)
    got = rows(sparql_select(t, "DESCRIBE <http://ex/P>"))
    assert sorted(got) == sorted([
        (EX + "P", EX + "addr", "_:a", "bnode", None, None),
        ("_:a", EX + "street", "Main st", "literal", None, None),
        ("_:a", EX + "geo", "_:g", "bnode", None, None),
        ("_:g", EX + "lat", "51.0", "literal", None, None),
    ])


def test_describe_guards():
    with pytest.raises(SparqlError):
        parse_sparql("DESCRIBE")
    with pytest.raises(SparqlError):
        parse_sparql("DESCRIBE *")  # star needs a pattern


# --- EXISTS in expression position / var-disjoint EXISTS (r5 wave 5) ---------


def test_exists_as_boolean_operand(triples):
    # AND of two probes: only Alice has both worksFor and label
    q = """PREFIX ex: <http://ex/>
        SELECT ?p WHERE {
          ?p a ex:Person .
          FILTER(EXISTS { ?p ex:worksFor ?c } && EXISTS { ?p ex:label ?l })
        }"""
    assert rows(sparql_select(triples, q)) == [("http://ex/Alice",)]
    # OR mixes a probe with a plain comparison: Bob via age, Alice via probe
    q2 = """PREFIX ex: <http://ex/>
        SELECT ?p WHERE {
          ?p a ex:Person .
          OPTIONAL { ?p ex:age ?age }
          FILTER(?age > 40 || EXISTS { ?p ex:worksFor ?c })
        } ORDER BY ?p"""
    assert rows(sparql_select(triples, q2)) == [
        ("http://ex/Alice",), ("http://ex/Bob",),
    ]


def test_not_exists_in_expression(triples):
    q = """PREFIX ex: <http://ex/>
        SELECT ?p WHERE {
          ?p a ex:Person .
          FILTER(NOT EXISTS { ?p ex:worksFor ?c }
                 && EXISTS { ?p ex:age ?a })
        }"""
    assert rows(sparql_select(triples, q)) == [("http://ex/Bob",)]


def test_exists_marker_never_multiplies_rows(triples):
    # Alice matches the probe on FOUR inner rows; the deduplicated
    # marker join must keep her a single solution
    q = """PREFIX ex: <http://ex/>
        SELECT ?p WHERE {
          ?p a ex:Person . FILTER((EXISTS { ?p ?q ?o2 }))
        } ORDER BY ?p"""
    assert rows(sparql_select(triples, q)) == [
        ("http://ex/Alice",), ("http://ex/Bob",),
    ]


def test_exists_expression_scoped_inside_graph(triples):
    # per-document correlation: the probes share the graph var, so each
    # person is probed within their OWN document
    q = """PREFIX ex: <http://ex/>
        SELECT ?g ?p WHERE {
          GRAPH ?g { ?p a ex:Person .
            FILTER(EXISTS { ?p ex:worksFor ?c }
                   || EXISTS { ?p ex:knows ?k })
          }
        } ORDER BY ?g"""
    assert rows(sparql_select(triples, q)) == [
        ("01", "http://ex/Alice"), ("02", "http://ex/Bob"),
    ]


def test_var_disjoint_exists_broadcast_probe(triples):
    # the probe shares NO variable: one global any-match answer
    q = """PREFIX ex: <http://ex/>
        SELECT ?s WHERE { ?s a ex:Company .
                          FILTER EXISTS { ?x ex:age ?a } }"""
    assert rows(sparql_select(triples, q)) == [("http://ex/Acme",)]
    q2 = """PREFIX ex: <http://ex/>
        SELECT ?s WHERE { ?s a ex:Company .
                          FILTER EXISTS { ?x ex:missing ?a } }"""
    assert rows(sparql_select(triples, q2)) == []
    q3 = """PREFIX ex: <http://ex/>
        SELECT ?s WHERE { ?s a ex:Company .
                          FILTER NOT EXISTS { ?x ex:missing ?a } }"""
    assert rows(sparql_select(triples, q3)) == [("http://ex/Acme",)]


def test_exists_in_bind_position_rejected(triples):
    q = """PREFIX ex: <http://ex/>
        SELECT ?e WHERE { ?s ?p ?o .
                          BIND(EXISTS { ?s ex:age ?a } AS ?e) }"""
    with pytest.raises(SparqlUnsupported):
        sparql_select(triples, q)


def test_uses_graph_clause_sees_exists_expression():
    from harvesting_validator_spark.sparql import uses_graph_clause

    q = parse_sparql(
        "SELECT ?s WHERE { ?s ?p ?o . "
        "FILTER((EXISTS { GRAPH ?g { ?s ?p2 ?o2 } })) }"
    )
    assert uses_graph_clause(q)


def test_subselect_must_be_whole_group(num_triples):
    with pytest.raises(SparqlError):
        parse_sparql(
            "SELECT ?s WHERE { { SELECT ?s WHERE { ?s ?p ?o } ?s ?p2 ?o2 } }"
        )
    with pytest.raises(SparqlError):
        parse_sparql(
            "SELECT ?s WHERE { { ?s ?p ?o . SELECT ?s WHERE { ?s ?p ?o } } }"
        )


# --- numeric / term / hash / dateTime builtins (r5 wave 7) -------------------


@pytest.fixture(scope="module")
def dt_triples(spark):
    rows = [
        (b"\x01", "http://ex/a", "http://ex/when", "2021-03-19T16:02:05",
         "literal", XSD + "dateTime", None),
        (b"\x01", "http://ex/a", "http://ex/amt", "-2.5", "literal",
         XSD + "decimal", None),
        (b"\x02", "http://ex/b", "http://ex/when",
         "2020-12-01T09:30:59.5+02:00", "literal", XSD + "dateTime", None),
        (b"\x02", "http://ex/b", "http://ex/amt", "2.5", "literal",
         XSD + "decimal", None),
        (b"\x03", "http://ex/c", "http://ex/when", "1999-01-02T00:00:00Z",
         "literal", XSD + "dateTime", None),
        (b"\x03", "http://ex/c", "http://ex/amt", "plain", "literal",
         None, None),
    ]
    return spark.createDataFrame(rows, _SCHEMA)


def test_numeric_builtins(dt_triples):
    got = rows(sparql_select(dt_triples, """
        SELECT ?s ?a ?r ?c ?f WHERE {
          ?s <http://ex/amt> ?v . FILTER isNumeric(?v)
          BIND(ABS(?v) AS ?a) BIND(ROUND(?v) AS ?r)
          BIND(CEIL(?v) AS ?c) BIND(FLOOR(?v) AS ?f)
        } ORDER BY ?s
    """))
    # XPath fn:round: half goes toward POSITIVE infinity on both signs
    assert got == [
        ("http://ex/a", "2.5", "-2", "-2", "-3"),
        ("http://ex/b", "2.5", "3", "3", "2"),
    ]


def test_isnumeric_is_total(dt_triples):
    # plain literals and dateTimes read FALSE (not unbound/error)
    got = rows(sparql_select(dt_triples, """
        SELECT ?s ?n WHERE {
          ?s <http://ex/amt> ?v . BIND(isNumeric(?v) AS ?n)
        } ORDER BY ?s
    """))
    assert got == [
        ("http://ex/a", "true"), ("http://ex/b", "true"),
        ("http://ex/c", "false"),
    ]


def test_sameterm_distinguishes_spellings(triples):
    # Alice's plain ssn and Bob's xsd:string ssn are the SAME term
    # (RDF 1.1 — the scans normalize the spelling); the lang-tagged
    # label is NOT the same term as its plain spelling
    got = rows(sparql_select(triples, """
        PREFIX ex: <http://ex/>
        SELECT ?x WHERE {
          ?x ex:ssn ?a . FILTER sameTerm(?a, "123-45-6789")
        } ORDER BY ?x
    """))
    assert got == [("http://ex/Alice",), ("http://ex/Bob",)]
    got2 = rows(sparql_select(triples, """
        PREFIX ex: <http://ex/>
        SELECT ?x WHERE {
          ?x ex:label ?l . FILTER sameTerm(?l, "alice")
        }
    """))
    assert got2 == []  # "alice"@en != plain "alice"
    got3 = rows(sparql_select(triples, """
        PREFIX ex: <http://ex/>
        SELECT ?x WHERE {
          ?x ex:label ?l . FILTER sameTerm(?l, "alice"@en)
        }
    """))
    assert got3 == [("http://ex/Alice",)]


def test_hash_builtins(triples):
    import hashlib

    got = rows(sparql_select(triples, """
        PREFIX ex: <http://ex/>
        SELECT ?m ?s1 ?s2 WHERE {
          ?x ex:ssn ?v . FILTER (?x = ex:Alice)
          BIND(MD5(?v) AS ?m) BIND(SHA1(?v) AS ?s1)
          BIND(SHA256(?v) AS ?s2)
        }
    """))
    v = b"123-45-6789"
    assert got == [(
        hashlib.md5(v).hexdigest(), hashlib.sha1(v).hexdigest(),
        hashlib.sha256(v).hexdigest(),
    )]


def test_datetime_accessors(dt_triples):
    got = rows(sparql_select(dt_triples, """
        SELECT ?s ?y ?mo ?d ?h ?mi ?sec ?tz WHERE {
          ?s <http://ex/when> ?w .
          BIND(YEAR(?w) AS ?y) BIND(MONTH(?w) AS ?mo)
          BIND(DAY(?w) AS ?d) BIND(HOURS(?w) AS ?h)
          BIND(MINUTES(?w) AS ?mi) BIND(SECONDS(?w) AS ?sec)
          BIND(TZ(?w) AS ?tz)
        } ORDER BY ?s
    """))
    assert got == [
        ("http://ex/a", "2021", "3", "19", "16", "2", "5", ""),
        ("http://ex/b", "2020", "12", "1", "9", "30", "59.5", "+02:00"),
        ("http://ex/c", "1999", "1", "2", "0", "0", "0", "Z"),
    ]


@pytest.mark.parametrize("fn", ["NOW()", "RAND()", "UUID()", "STRUUID()"])
def test_nondeterministic_builtins_raise(triples, fn):
    with pytest.raises(SparqlUnsupported, match="deterministic"):
        sparql_select(
            triples, f"SELECT ?x WHERE {{ ?s ?p ?o BIND({fn} AS ?x) }}"
        )


# --- negated property sets (r5 wave 7) ---------------------------------------


def test_nps_forward(triples):
    # everything EXCEPT the enumerated predicates: only worksFor remains
    got = rows(sparql_select(triples, """
        PREFIX ex: <http://ex/>
        SELECT ?s ?o WHERE {
          ?s !(ex:ssn|a|ex:label|ex:age|ex:knows) ?o
        }
    """))
    assert got == [("http://ex/Alice", "http://ex/Acme")]


def test_nps_bare_and_empty(triples):
    # bare !a — every non-type edge of Bob
    got = rows(sparql_select(triples, """
        PREFIX ex: <http://ex/>
        SELECT ?o WHERE { ex:Bob !a ?o } ORDER BY ?o
    """))
    assert [o for (o,) in got] == ["123-45-6789", "42", "_:b0"]
    # !() — the unconstrained forward hop
    got2 = rows(sparql_select(triples, """
        PREFIX ex: <http://ex/>
        SELECT ?o WHERE { ex:Acme !() ?o } ORDER BY ?o
    """))
    assert [o for (o,) in got2] == ["http://ex/Company", "http://ex/Person"]


def test_nps_inverse_and_mixed(triples):
    # inverse-only: who reaches Acme by anything but ex:label
    got = rows(sparql_select(triples, """
        PREFIX ex: <http://ex/>
        SELECT ?s WHERE { ex:Acme !(^ex:label) ?s }
    """))
    assert got == [("http://ex/Alice",)]
    # mixed: forward non-type edges of Person UNION inverse non-ssn
    # reachers of Person — rdf:type arrives inverse, label text does not
    # (kind discrimination: doc 3's label literal spells the IRI)
    got2 = rows(sparql_select(triples, """
        PREFIX ex: <http://ex/>
        SELECT ?x WHERE { ex:Person !(a|^ex:label) ?x } ORDER BY ?x
    """))
    assert [x for (x,) in got2] == ["http://ex/Alice", "http://ex/Bob"]


def test_nps_in_sequence_and_closure(triples):
    # hop to an entity by anything but label/ssn/age/knows, then read
    # its type — the worksFor edge is the only survivor
    got = rows(sparql_select(triples, """
        PREFIX ex: <http://ex/>
        SELECT ?t WHERE {
          ex:Alice !(ex:label|ex:ssn|ex:age|ex:knows|a)/a ?t
        }
    """))
    assert got == [("http://ex/Company",)]
    # closure over an NPS rides the composite-closure fixpoint
    got2 = rows(sparql_select(triples, """
        PREFIX ex: <http://ex/>
        SELECT ?o WHERE { ex:Alice (!(ex:label|ex:ssn|a))+ ?o }
    """))
    assert got2 == [("http://ex/Acme",)]


def test_nps_guards():
    from harvesting_validator_spark.sparql import parse_sparql

    with pytest.raises(SparqlError):
        parse_sparql('SELECT ?o WHERE { ?s !("lit") ?o }')
    with pytest.raises(SparqlError):
        parse_sparql("SELECT ?o WHERE { ?s !(?v) ?o }")


# --- STRDT / STRLANG literal constructors (r5 wave 7) ------------------------


def test_strdt_builds_typed_literal(triples):
    # the constructed term is a first-class typed literal: numeric
    # filters apply and sameTerm agrees with a SCANNED xsd:integer
    got = rows(sparql_select(triples, """
        PREFIX ex: <http://ex/>
        PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
        SELECT ?dt ?big WHERE {
          ?s ex:age ?a .
          BIND(STRDT(str(?a), xsd:integer) AS ?t)
          BIND(datatype(?t) AS ?dt)
          BIND(?t > 40 AS ?big)
          FILTER sameTerm(?t, ?a)
        }
    """))
    assert got == [(XSD + "integer", "true")]


def test_strlang_builds_lang_literal(triples):
    got = rows(sparql_select(triples, """
        PREFIX ex: <http://ex/>
        SELECT ?l ?same WHERE {
          ?s ex:label ?v . FILTER(lang(?v) = "en")
          BIND(STRLANG("alice", "EN") AS ?t)
          BIND(lang(?t) AS ?l)
          BIND(sameTerm(?t, ?v) AS ?same)
        }
    """))
    # tag lowercases like the scans; the constructed term IS "alice"@en
    assert got == [("en", "true")]


def test_strdt_strlang_guards(triples):
    with pytest.raises(SparqlUnsupported, match="constant datatype"):
        sparql_select(triples, """
            SELECT ?t WHERE { ?s ?p ?o BIND(STRDT("x", ?o) AS ?t) }
        """)
    with pytest.raises(SparqlUnsupported, match="language tag"):
        sparql_select(triples, """
            SELECT ?t WHERE { ?s ?p ?o BIND(STRLANG("x", "") AS ?t) }
        """)
    # outside BIND the constructors raise (no datatype channel there)
    with pytest.raises(SparqlUnsupported, match="BIND position"):
        sparql_select(triples, """
            PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
            SELECT ?s WHERE {
              ?s ?p ?o FILTER(?o = STRDT("42", xsd:integer))
            }
        """)


# --- r5 review-wave fixes -----------------------------------------------------


def test_leading_values_undef_is_match_anything(triples):
    # VALUES first in the group: as the base frame its UNDEF cells used
    # to join later patterns by strict equality and match NOTHING; the
    # deferral (Join commutativity) routes them through the
    # compatibility join
    got = rows(sparql_select(triples, """
        PREFIX ex: <http://ex/>
        SELECT ?s ?v WHERE {
          VALUES ?v { UNDEF "42" }
          ?s ex:age ?v
        }
    """))
    # the UNDEF cell matches Bob's age row (plain "42" is a DIFFERENT
    # term from "42"^^xsd:integer, so that cell correctly adds nothing);
    # before the fix the whole query returned [] — UNDEF matched nothing
    assert got == [("http://ex/Bob", "42")]
    # and the same block with a matching typed cell yields both rows
    got2 = rows(sparql_select(triples, """
        PREFIX ex: <http://ex/>
        PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
        SELECT ?s WHERE {
          VALUES ?v { UNDEF "42"^^xsd:integer }
          ?s ex:age ?v
        }
    """))
    assert got2 == [("http://ex/Bob",), ("http://ex/Bob",)]


def test_top_level_group_by_is_term_level(spark):
    # "a"@en and "a"@fr are DIFFERENT terms: one group each, exactly
    # like the sub-select path (its docstring contract)
    t = spark.createDataFrame(
        [
            (b"\x01", "http://s1", "http://p", "a", "literal", None, "en"),
            (b"\x01", "http://s2", "http://p", "a", "literal", None, "fr"),
            (b"\x01", "http://s3", "http://p", "a", "literal", None, "en"),
        ],
        _SCHEMA,
    )
    got = rows(sparql_select(t, """
        SELECT ?v (COUNT(*) AS ?c) WHERE { ?s <http://p> ?v }
        GROUP BY ?v ORDER BY ?v
    """))
    assert sorted(c for _, c in got) == [1, 2]


def test_inner_order_dropped_when_outer_cannot_show_it(triples):
    # aggregating over an ordered sub-select: the order is unobservable
    # — it must be DROPPED, not hoisted into an 'ORDER BY vars must be
    # projected' error
    got = rows(sparql_select(triples, """
        SELECT (COUNT(?s) AS ?c) WHERE {
          { SELECT ?s WHERE { ?s ?p ?o } ORDER BY ?s }
        }
    """))
    assert got == [(10,)]


def test_describe_unbound_var_is_empty_graph(triples):
    df = sparql_select(triples, "DESCRIBE ?x")
    assert df.count() == 0
    assert df.columns == [
        "subj", "pred", "obj_value", "obj_kind", "obj_datatype", "obj_lang",
    ]


def test_type_tests_on_optional_unbound_are_position_independent(triples):
    # ?x binds in SUBJECT position inside the OPTIONAL: when the
    # OPTIONAL fails, isIRI(?x) must be an error (row dropped), not
    # true — the derived kind used to read 'iri' for NULL values
    got = rows(sparql_select(triples, """
        PREFIX ex: <http://ex/>
        SELECT ?s WHERE {
          ?s a ex:Person .
          OPTIONAL { ?x ex:worksFor ?s }
          FILTER isIRI(?x)
        }
    """))
    assert got == []  # nobody works for a person
    # sameTerm on an unbound arg is an error (drops), never a match
    got2 = rows(sparql_select(triples, """
        PREFIX ex: <http://ex/>
        SELECT ?s WHERE {
          ?s a ex:Person .
          OPTIONAL { ?s ex:worksFor ?c }
          FILTER sameTerm(?c, ?c)
        }
    """))
    assert got2 == [("http://ex/Alice",)]  # only the bound one


def test_select_star_with_having_raises_cleanly(triples):
    with pytest.raises(SparqlError, match="SELECT \\*"):
        sparql_select(
            triples,
            "SELECT * WHERE { ?s ?p ?o } GROUP BY ?s HAVING (COUNT(?o) > 1)",
        )


def test_default_prefix(triples):
    got = rows(sparql_select(triples, """
        PREFIX : <http://ex/>
        SELECT ?s WHERE { ?s a :Person ; :ssn ?v ; :worksFor :Acme }
    """))
    assert got == [("http://ex/Alice",)]
    with pytest.raises(SparqlError, match="undeclared default"):
        sparql_select(triples, "SELECT ?o WHERE { :A ?p ?o }")
    with pytest.raises(SparqlError, match="keyword"):
        sparql_select(
            triples,
            "PREFIX : <http://ex/> SELECT ?o WHERE { :A :filter ?o }",
        )


def test_nps_after_semicolon(triples):
    # the post-';' verb continuation accepts '!' (it used to break out
    # and fail with "expected a term")
    got = rows(sparql_select(triples, """
        PREFIX ex: <http://ex/>
        SELECT ?o WHERE {
          ?s a ex:Person ; !(a|ex:ssn|ex:label|ex:knows|ex:age) ?o
        }
    """))
    assert got == [("http://ex/Acme",)]


def test_query_closure_never_composes_through_a_literal(spark):
    # <a> :p "http://x" (string holding a URL) + <http://x> :p <c>:
    # textual dst==src matching used to add the phantom pair a -> c
    t = spark.createDataFrame(
        [
            (b"\x01", "http://e/a", "http://e/p", "http://x",
             "literal", None, None),
            (b"\x01", "http://x", "http://e/p", "http://e/c",
             "iri", None, None),
        ],
        _SCHEMA,
    )
    got = rows(sparql_select(
        t, "SELECT ?o WHERE { <http://e/a> <http://e/p>+ ?o }"
    ))
    assert got == [("http://x",)]  # the literal endpoint only, never c


def test_leading_values_defers_past_all_join_elements(triples):
    # vars bound by LATER triple patterns: the deferred VALUES must
    # flush after ALL consecutive join elements, not after the first —
    # an early flush strict-joined ?t (bound only by TP2) and dropped
    # the UNDEF row
    got = rows(sparql_select(triples, """
        PREFIX ex: <http://ex/>
        SELECT ?s ?c ?t WHERE {
          VALUES (?c ?t) { (ex:Acme UNDEF) }
          ?s ex:worksFor ?c .
          ?c a ?t
        }
    """))
    assert got == [("http://ex/Alice", "http://ex/Acme", "http://ex/Company")]


def test_leading_values_compatibility_with_subselect(triples):
    # VALUES before a sub-select: the sub-select is a join too, so the
    # VALUES defers past it and UNDEF stays match-anything
    got = rows(sparql_select(triples, """
        PREFIX ex: <http://ex/>
        SELECT ?s WHERE {
          VALUES ?s { UNDEF ex:Nope }
          { SELECT ?s WHERE { ?s a ex:Person } }
        } ORDER BY ?s
    """))
    assert got == [("http://ex/Alice",), ("http://ex/Bob",)]


def test_key_only_group_by_is_term_level(spark):
    t = spark.createDataFrame(
        [
            (b"\x01", "http://s1", "http://p", "a", "literal", None, "en"),
            (b"\x01", "http://s2", "http://p", "a", "literal", None, "fr"),
        ],
        _SCHEMA,
    )
    got = rows(sparql_select(
        t, "SELECT ?v WHERE { ?s <http://p> ?v } GROUP BY ?v"
    ))
    # two TERMS, two groups — even though both display as "a"
    assert got == [("a",), ("a",)]
