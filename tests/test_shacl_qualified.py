"""Shape-valued SHACL components and implicit target selectors:
sh:qualifiedValueShape (+ sh:qualifiedMin/MaxCount), node-level sh:not,
sh:targetSubjectsOf / sh:targetObjectsOf.

Handcrafted documents with EXACT expected violation identity sets (the
independent evaluator in tests/reference_shacl.py predates these
components, so this suite pins semantics with closed-form fixtures, the
same strategy as the golden validation tests). Covers the zero-value
qualifiedMinCount edge, the over-max edge, and one level of recursion
(a qualified shape whose body is itself a sh:not)."""

from __future__ import annotations

from harvesting_validator_spark.shacl.compile import validate
from harvesting_validator_spark.shacl.parse import parse_shapes_turtle
from harvesting_validator_spark.sources.rdf_parse import Triple

EX = "http://example.com/ns#"
SH = "http://www.w3.org/ns/shacl#"
XSD = "http://www.w3.org/2001/XMLSchema#"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

PROFILE = """
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.com/ns#> .

ex:PersonShape a sh:NodeShape ;
  sh:targetClass ex:Person ;
  sh:property [ sh:path ex:pet ;
                sh:qualifiedValueShape ex:DogShape ;
                sh:qualifiedMinCount 1 ; sh:qualifiedMaxCount 2 ] .

ex:DogShape a sh:NodeShape ;
  sh:property [ sh:path ex:species ; sh:hasValue "dog" ; sh:minCount 1 ] .

ex:BuyerShape a sh:NodeShape ;
  sh:targetSubjectsOf ex:orders ;
  sh:not ex:BannedShape .

ex:SellerShape a sh:NodeShape ;
  sh:targetObjectsOf ex:soldBy ;
  sh:property [ sh:path ex:rating ; sh:minCount 1 ] .

ex:BannedShape a sh:NodeShape ;
  sh:property [ sh:path ex:banned ; sh:hasValue "true" ; sh:minCount 1 ] .

ex:VipShape a sh:NodeShape ;
  sh:targetClass ex:Vip ;
  sh:property [ sh:path ex:friend ;
                sh:qualifiedValueShape ex:CleanShape ;
                sh:qualifiedMinCount 1 ] .

ex:CleanShape a sh:NodeShape ;
  sh:not ex:BannedShape .
"""

SHAPES = parse_shapes_turtle(PROFILE)


def _t(subj, pred, val, kind="literal", dt=XSD + "string", lang=None):
    if kind != "literal":
        dt = None
    return Triple(subj, pred, val, kind, dt, lang)


def _violations(spark, docs):
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
        (r.focus_node, r.shape, r.constraint_component, r.result_path)
        for r in viol.collect()
    }


def test_parse_shape_valued_constructs():
    by_iri = {s.iri: s for s in SHAPES.shapes}
    person = by_iri[EX + "PersonShape"].properties[0]
    assert person.qualified_shape == EX + "DogShape"
    assert person.qualified_min == 1 and person.qualified_max == 2
    buyer = by_iri[EX + "BuyerShape"]
    assert buyer.target_subjects_of == (EX + "orders",)
    assert buyer.not_shapes == (EX + "BannedShape",)
    assert by_iri[EX + "SellerShape"].target_objects_of == (EX + "soldBy",)
    # referenced sub-shapes are resolvable even without their own targets
    assert EX + "DogShape" in SHAPES.by_id
    assert EX + "CleanShape" in SHAPES.by_id


def test_qualified_value_shape_counts(spark):
    docs = {
        "d": [
            # alice: 2 pets, 1 conforming dog -> within [1, 2], conforms
            _t(EX + "alice", RDF_TYPE, EX + "Person", kind="iri"),
            _t(EX + "alice", EX + "pet", EX + "rex", kind="iri"),
            _t(EX + "alice", EX + "pet", EX + "fluffy", kind="iri"),
            _t(EX + "rex", EX + "species", "dog"),
            _t(EX + "fluffy", EX + "species", "cat"),
            # bob: 1 pet, 0 conforming -> qualifiedMinCount violation
            _t(EX + "bob", RDF_TYPE, EX + "Person", kind="iri"),
            _t(EX + "bob", EX + "pet", EX + "whiskers", kind="iri"),
            _t(EX + "whiskers", EX + "species", "cat"),
            # eve: 3 conforming dogs -> qualifiedMaxCount violation
            _t(EX + "eve", RDF_TYPE, EX + "Person", kind="iri"),
            _t(EX + "eve", EX + "pet", EX + "d1", kind="iri"),
            _t(EX + "eve", EX + "pet", EX + "d2", kind="iri"),
            _t(EX + "eve", EX + "pet", EX + "d3", kind="iri"),
            _t(EX + "d1", EX + "species", "dog"),
            _t(EX + "d2", EX + "species", "dog"),
            _t(EX + "d3", EX + "species", "dog"),
            # zed: NO pet triples at all -> zero conforming -> min violates
            _t(EX + "zed", RDF_TYPE, EX + "Person", kind="iri"),
        ]
    }
    got = _violations(spark, docs)
    shape = EX + "PersonShape"
    assert got == {
        (EX + "bob", shape, SH + "QualifiedMinCountConstraintComponent",
         EX + "pet"),
        (EX + "eve", shape, SH + "QualifiedMaxCountConstraintComponent",
         EX + "pet"),
        (EX + "zed", shape, SH + "QualifiedMinCountConstraintComponent",
         EX + "pet"),
    }


def test_not_and_implicit_targets(spark):
    docs = {
        "d": [
            # carol orders AND is banned -> conforms to BannedShape -> Not
            _t(EX + "carol", EX + "orders", EX + "o1", kind="iri"),
            _t(EX + "carol", EX + "banned", "true"),
            # dave orders, not banned -> conforms
            _t(EX + "dave", EX + "orders", EX + "o2", kind="iri"),
            # shop1 is an OBJECT of soldBy with no rating -> minCount via
            # targetObjectsOf; shop2 has a rating -> conforms
            _t(EX + "item1", EX + "soldBy", EX + "shop1", kind="iri"),
            _t(EX + "item2", EX + "soldBy", EX + "shop2", kind="iri"),
            _t(EX + "shop2", EX + "rating", "5"),
            # literal soldBy object: out of focus, must NOT violate
            _t(EX + "item3", EX + "soldBy", "unknown-seller"),
        ]
    }
    got = _violations(spark, docs)
    assert got == {
        (EX + "carol", EX + "BuyerShape", SH + "NotConstraintComponent",
         None),
        (EX + "shop1", EX + "SellerShape",
         SH + "MinCountConstraintComponent", EX + "rating"),
    }


LOGIC_PROFILE = """
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.com/ns#> .

ex:ContactShape a sh:NodeShape ;
  sh:targetClass ex:Contact ;
  sh:xone ( ex:EmailShape ex:PhoneShape ) .

ex:AuditedShape a sh:NodeShape ;
  sh:targetClass ex:Audited ;
  sh:and ( ex:EmailShape ex:PhoneShape ) .

ex:ReachableShape a sh:NodeShape ;
  sh:targetClass ex:Reachable ;
  sh:or ( ex:EmailShape ex:PhoneShape ) .

ex:EmailShape a sh:NodeShape ;
  sh:property [ sh:path ex:email ; sh:minCount 1 ] .

ex:PhoneShape a sh:NodeShape ;
  sh:property [ sh:path ex:phone ; sh:minCount 1 ] .
"""

LOGIC_SHAPES = parse_shapes_turtle(LOGIC_PROFILE)


def test_parse_logical_lists():
    by_iri = {s.iri: s for s in LOGIC_SHAPES.shapes}
    assert by_iri[EX + "ContactShape"].xone_shapes == (
        EX + "EmailShape", EX + "PhoneShape")
    assert by_iri[EX + "AuditedShape"].and_shapes == (
        EX + "EmailShape", EX + "PhoneShape")
    assert by_iri[EX + "ReachableShape"].or_shapes == (
        EX + "EmailShape", EX + "PhoneShape")


def test_logical_components(spark):
    rows = [
        # c1: email only -> exactly one member conforms -> ok
        ("d", EX + "c1", RDF_TYPE, EX + "Contact", "iri", None, None),
        ("d", EX + "c1", EX + "email", "a@b", "literal", XSD + "string", None),
        # c2: both -> xone violated (2 conforming)
        ("d", EX + "c2", RDF_TYPE, EX + "Contact", "iri", None, None),
        ("d", EX + "c2", EX + "email", "a@b", "literal", XSD + "string", None),
        ("d", EX + "c2", EX + "phone", "123", "literal", XSD + "string", None),
        # c3: neither -> xone violated (0 conforming)
        ("d", EX + "c3", RDF_TYPE, EX + "Contact", "iri", None, None),
        # a1: email only -> sh:and violated
        ("d", EX + "a1", RDF_TYPE, EX + "Audited", "iri", None, None),
        ("d", EX + "a1", EX + "email", "a@b", "literal", XSD + "string", None),
        # a2: both -> ok
        ("d", EX + "a2", RDF_TYPE, EX + "Audited", "iri", None, None),
        ("d", EX + "a2", EX + "email", "a@b", "literal", XSD + "string", None),
        ("d", EX + "a2", EX + "phone", "123", "literal", XSD + "string", None),
        # r1: neither -> sh:or violated
        ("d", EX + "r1", RDF_TYPE, EX + "Reachable", "iri", None, None),
        # r2: phone only -> ok
        ("d", EX + "r2", RDF_TYPE, EX + "Reachable", "iri", None, None),
        ("d", EX + "r2", EX + "phone", "123", "literal", XSD + "string", None),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id string, subj string, pred string, obj_value string, "
        "obj_kind string, obj_datatype string, obj_lang string",
    )
    viol = validate(df, LOGIC_SHAPES, spark, cache_intermediate=False)
    got = {
        (r.focus_node, r.constraint_component) for r in viol.collect()
    }
    assert got == {
        (EX + "c2", SH + "XoneConstraintComponent"),
        (EX + "c3", SH + "XoneConstraintComponent"),
        (EX + "a1", SH + "AndConstraintComponent"),
        (EX + "r1", SH + "OrConstraintComponent"),
    }


def test_deactivated_shape_is_neutral(spark):
    """sh:deactivated true: the shape's targets and constraints vanish,
    and a probe against it trivially conforms (so a sh:not of a
    deactivated shape always violates)."""
    ttl = """
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.com/ns#> .
ex:DeadShape a sh:NodeShape ;
  sh:deactivated true ;
  sh:targetClass ex:Thing ;
  sh:property [ sh:path ex:name ; sh:minCount 1 ] .
ex:LiveShape a sh:NodeShape ;
  sh:targetClass ex:Thing ;
  sh:not ex:DeadShape .
"""
    shapes = parse_shapes_turtle(ttl)
    dead = shapes.by_id[EX + "DeadShape"]
    assert dead.target_classes == () and dead.properties == ()
    rows = [("d", EX + "x", RDF_TYPE, EX + "Thing", "iri", None, None)]
    df = spark.createDataFrame(
        rows,
        "doc_id string, subj string, pred string, obj_value string, "
        "obj_kind string, obj_datatype string, obj_lang string",
    )
    got = {
        (r.shape, r.constraint_component)
        for r in validate(df, shapes, spark,
                          cache_intermediate=False).collect()
    }
    # no MinCount from the deactivated shape; the sh:not fires because
    # x trivially conforms to the neutralized DeadShape
    assert got == {(EX + "LiveShape", SH + "NotConstraintComponent")}


def test_differential_random_corpora(spark):
    """Seeded randomized sweep over the COMBINED profile (qualified, not,
    and/or/xone, implicit targets, recursion through CleanShape): Spark
    compiler == independent evaluator violation-for-violation. The two
    probe mechanisms are genuinely different (probe-join vs re-targeted
    re-validation), so agreement pins the semantics."""
    import random

    from tests.reference_shacl import validate_reference

    combined = parse_shapes_turtle(PROFILE + LOGIC_PROFILE)
    rng = random.Random(0xBEEF)
    species = ["dog", "cat", None]
    for trial in range(4):
        docs = {}
        for d in range(rng.randint(1, 4)):
            ts = []
            subjects = [f"{EX}S{d}_{i}" for i in range(rng.randint(2, 4))]
            for subj in subjects:
                typ = rng.choice(
                    ["Person", "Vip", "Contact", "Audited", "Reachable",
                     None])
                if typ:
                    ts.append(_t(subj, RDF_TYPE, EX + typ, kind="iri"))
                for p in range(rng.randint(0, 3)):
                    pet = f"{subj}_pet{p}"
                    ts.append(_t(subj, EX + "pet", pet, kind="iri"))
                    sp = rng.choice(species)
                    if sp:
                        ts.append(_t(pet, EX + "species", sp))
                if rng.random() < 0.5:
                    ts.append(_t(subj, EX + "friend",
                                 rng.choice(subjects), kind="iri"))
                if rng.random() < 0.5:
                    ts.append(_t(subj, EX + "orders", subj + "_o",
                                 kind="iri"))
                if rng.random() < 0.4:
                    ts.append(_t(subj, EX + "banned", "true"))
                if rng.random() < 0.5:
                    ts.append(_t(subj, EX + "email", "a@b"))
                if rng.random() < 0.5:
                    ts.append(_t(subj, EX + "phone", "123"))
            docs[f"doc{d}"] = ts
        rows = [
            (doc_id, t.subj, t.pred, t.obj_value, t.obj_kind,
             t.obj_datatype, t.obj_lang)
            for doc_id, ts in docs.items() for t in ts
        ]
        df = spark.createDataFrame(
            rows,
            "doc_id string, subj string, pred string, obj_value string, "
            "obj_kind string, obj_datatype string, obj_lang string",
        )
        got = {
            (r.doc_id, r.shape, r.focus_node, r.constraint_component,
             r.result_path, r.value)
            for r in validate(
                df, combined, spark, cache_intermediate=False
            ).collect()
        }
        want = validate_reference(docs, combined)
        assert got == want, f"trial {trial}: {got ^ want}"


def test_qualified_over_negated_shape_recurses(spark):
    docs = {
        "d": [
            # vip1's only friend is banned -> 0 conforming to CleanShape
            # (sh:not BannedShape) -> qualifiedMinCount violation
            _t(EX + "vip1", RDF_TYPE, EX + "Vip", kind="iri"),
            _t(EX + "vip1", EX + "friend", EX + "carol", kind="iri"),
            _t(EX + "carol", EX + "banned", "true"),
            # vip2's friend is clean -> conforms
            _t(EX + "vip2", RDF_TYPE, EX + "Vip", kind="iri"),
            _t(EX + "vip2", EX + "friend", EX + "dave", kind="iri"),
        ]
    }
    got = {v for v in _violations(spark, docs) if v[1] == EX + "VipShape"}
    assert got == {
        (EX + "vip1", EX + "VipShape",
         SH + "QualifiedMinCountConstraintComponent", EX + "friend"),
    }


NESTED_PROBE_PROFILE = """
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.com/ns#> .

ex:RootShape a sh:NodeShape ;
  sh:targetClass ex:T ;
  sh:not ex:GoodOwnerShape .

ex:GoodOwnerShape a sh:NodeShape ;
  sh:property [ sh:path ex:pet ; sh:node ex:ProbedDogShape ] .

ex:ProbedDogShape a sh:NodeShape ;
  sh:property [ sh:path ex:species ; sh:hasValue "dog" ; sh:minCount 1 ] .

ex:OwnerShape2 a sh:NodeShape ;
  sh:targetClass ex:O ;
  sh:property [ sh:path ex:pet ;
                sh:qualifiedValueShape ex:StrictDogShape ;
                sh:qualifiedMinCount 1 ] .

ex:StrictDogShape a sh:NodeShape ;
  sh:property [ sh:path ex:collar ; sh:node ex:TagShape ; sh:minCount 1 ] .

ex:TagShape a sh:NodeShape ;
  sh:property [ sh:path ex:id ; sh:minCount 1 ] .
"""

NESTED_PROBE_SHAPES = parse_shapes_turtle(NESTED_PROBE_PROFILE)


def _violations_for(spark, docs, shapes):
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
    viol = validate(df, shapes, spark, cache_intermediate=False)
    return {
        (r.focus_node, r.shape, r.constraint_component, r.result_path)
        for r in viol.collect()
    }


def test_probe_bubbles_nested_node_shape_via_not(spark):
    """ADVICE r4 #3: a sub-shape referenced via sh:not whose property
    nests sh:node must have the nested constraint COUNT toward the
    conformance probe — n1's dog-owning makes it conform to
    GoodOwnerShape (sh:not violated); n2's cat fails the nested
    ProbedDogShape, so n2 does NOT conform and sh:not is satisfied."""
    docs = {
        "d": [
            _t(EX + "n1", RDF_TYPE, EX + "T", kind="iri"),
            _t(EX + "n1", EX + "pet", EX + "p1", kind="iri"),
            _t(EX + "p1", EX + "species", "dog"),
            _t(EX + "n2", RDF_TYPE, EX + "T", kind="iri"),
            _t(EX + "n2", EX + "pet", EX + "p2", kind="iri"),
            _t(EX + "p2", EX + "species", "cat"),
        ]
    }
    got = _violations_for(spark, docs, NESTED_PROBE_SHAPES)
    not_viols = {
        v for v in got if v[2] == SH + "NotConstraintComponent"
    }
    assert not_viols == {
        (EX + "n1", EX + "RootShape", SH + "NotConstraintComponent", None)
    }, got


def test_probe_bubbles_nested_node_shape_via_qualified(spark):
    """Same bug through sh:qualifiedValueShape: d2's collar fails the
    sh:node-nested TagShape (no ex:id), so d2 does not count as a
    conforming value and o2 violates qualifiedMinCount; o1's fully
    tagged dog keeps o1 conforming."""
    docs = {
        "d": [
            _t(EX + "o1", RDF_TYPE, EX + "O", kind="iri"),
            _t(EX + "o1", EX + "pet", EX + "d1", kind="iri"),
            _t(EX + "d1", EX + "collar", EX + "c1", kind="iri"),
            _t(EX + "c1", EX + "id", "5"),
            _t(EX + "o2", RDF_TYPE, EX + "O", kind="iri"),
            _t(EX + "o2", EX + "pet", EX + "d2", kind="iri"),
            _t(EX + "d2", EX + "collar", EX + "c2", kind="iri"),
        ]
    }
    got = _violations_for(spark, docs, NESTED_PROBE_SHAPES)
    q_viols = {
        v for v in got
        if v[2] == SH + "QualifiedMinCountConstraintComponent"
    }
    assert q_viols == {
        (EX + "o2", EX + "OwnerShape2",
         SH + "QualifiedMinCountConstraintComponent", EX + "pet")
    }, got


DISJOINT_PROFILE = """
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.com/ns#> .

ex:HandShape a sh:NodeShape ;
  sh:targetClass ex:Hand ;
  sh:property [ sh:path ex:digit ;
                sh:qualifiedValueShape ex:ThumbShape ;
                sh:qualifiedMinCount 1 ;
                sh:qualifiedValueShapesDisjoint true ] ;
  sh:property [ sh:path ex:digit ;
                sh:qualifiedValueShape ex:FingerShape ;
                sh:qualifiedMinCount 4 ;
                sh:qualifiedValueShapesDisjoint true ] .

ex:ThumbShape a sh:NodeShape ;
  sh:property [ sh:path ex:isThumb ; sh:hasValue "true" ; sh:minCount 1 ] .

ex:FingerShape a sh:NodeShape ;
  sh:property [ sh:path ex:jointCount ; sh:minCount 1 ] .
"""

OVERLAP_PROFILE = DISJOINT_PROFILE.replace(
    "sh:qualifiedValueShapesDisjoint true ", ""
)


def _viols_cc(spark, docs, shapes):
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
    viol = validate(df, shapes, spark, cache_intermediate=False)
    return {
        (r.focus_node, r.constraint_component) for r in viol.collect()
    }


def _hand(hand, thumb_has_joints: bool):
    """A hand with one thumb and four fingers; when thumb_has_joints the
    thumb ALSO conforms to FingerShape (the overlap disjoint excludes)."""
    t = [
        _t(hand, RDF_TYPE, EX + "Hand", kind="iri"),
        _t(hand, EX + "digit", hand + "_t", kind="iri"),
        _t(hand + "_t", EX + "isThumb", "true"),
    ]
    if thumb_has_joints:
        t.append(_t(hand + "_t", EX + "jointCount", "2"))
    for i in range(4):
        t += [
            _t(hand, EX + "digit", f"{hand}_f{i}", kind="iri"),
            _t(f"{hand}_f{i}", EX + "jointCount", "3"),
        ]
    return t


def test_parse_qualified_disjoint_flag():
    shapes = parse_shapes_turtle(DISJOINT_PROFILE)
    hand = next(s for s in shapes.shapes if s.iri == EX + "HandShape")
    assert all(p.qualified_disjoint for p in hand.properties)
    overlap = parse_shapes_turtle(OVERLAP_PROFILE)
    hand2 = next(s for s in overlap.shapes if s.iri == EX + "HandShape")
    assert not any(p.qualified_disjoint for p in hand2.properties)


def test_qualified_disjoint_excludes_sibling_conforming_values(spark):
    """Spec §4.5.3: with disjoint true, a digit conforming to BOTH
    ThumbShape and FingerShape counts for NEITHER — the ambiguous thumb
    breaks qualifiedMinCount 1 on the thumb side (fingers still reach 4
    on their own). A pure thumb satisfies both constraints. Without the
    disjoint flag the same ambiguous hand conforms (the overlap value
    counts for both siblings)."""
    disjoint = parse_shapes_turtle(DISJOINT_PROFILE)
    overlap = parse_shapes_turtle(OVERLAP_PROFILE)
    docs = {
        "d": _hand(EX + "amb", thumb_has_joints=True)
        + _hand(EX + "pure", thumb_has_joints=False)
    }
    got = _viols_cc(spark, docs, disjoint)
    assert got == {
        (EX + "amb", SH + "QualifiedMinCountConstraintComponent"),
    }, got
    assert _viols_cc(spark, docs, overlap) == set()


def test_disjoint_sibling_set_excludes_same_shape(spark):
    # SHACL §4.5.3: the sibling set is the other qualified shape VALUES
    # minus this constraint's own — two properties sharing ONE shape
    # must not compete. Before the fix, the by-property-identity
    # exclusion put DogShape in its own sibling set, every conforming
    # pet was discounted as sibling-conforming, and a spurious
    # QualifiedMinCount violation fired.
    profile = """
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.com/ns#> .

ex:OwnerShape a sh:NodeShape ;
  sh:targetClass ex:Owner ;
  sh:property [ sh:path ex:pet ;
                sh:qualifiedValueShape ex:DogShape2 ;
                sh:qualifiedMinCount 1 ;
                sh:qualifiedValueShapesDisjoint true ] ;
  sh:property [ sh:path ex:backup ;
                sh:qualifiedValueShape ex:DogShape2 ;
                sh:qualifiedMinCount 1 ] .

ex:DogShape2 a sh:NodeShape ;
  sh:property [ sh:path ex:species ; sh:hasValue "dog" ;
                sh:minCount 1 ] .
"""
    shapes = parse_shapes_turtle(profile)
    docs = {
        "d1": [
            _t(EX + "o1", RDF_TYPE, EX + "Owner", kind="iri"),
            _t(EX + "o1", EX + "pet", EX + "rex", kind="iri"),
            _t(EX + "o1", EX + "backup", EX + "fido", kind="iri"),
            _t(EX + "rex", EX + "species", "dog"),
            _t(EX + "fido", EX + "species", "dog"),
        ],
    }
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
    viol = validate(df, shapes, spark, cache_intermediate=False)
    assert viol.count() == 0
