"""Independent pure-Python SHACL evaluator (test oracle only).

A from-first-principles re-implementation of the constraint subset, with
NO shared code with harvesting_validator_spark.shacl.compile — used by the
differential property test to cross-check the Spark compiler on random
corpora. Violation identity: (doc_id, shape, focus, component,
result_path, value) where value is None for cardinality/hasValue.
"""

from __future__ import annotations

import re

SH = "http://www.w3.org/ns/shacl#"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
XSD = "http://www.w3.org/2001/XMLSchema#"

LEXICAL = {
    XSD + "integer": r"^[+-]?\d+$",
    XSD + "int": r"^[+-]?\d+$",
    XSD + "long": r"^[+-]?\d+$",
    XSD + "decimal": r"^[+-]?(\d+(\.\d*)?|\.\d+)$",
    XSD + "double": r"^([+-]?(\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?|NaN|INF|-INF)$",
    XSD + "float": r"^([+-]?(\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?|NaN|INF|-INF)$",
    XSD + "boolean": r"^(true|false|0|1)$",
    XSD + "date": r"^-?\d{4}-\d{2}-\d{2}(Z|[+-]\d{2}:\d{2})?$",
    XSD + "dateTime": r"^-?\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(\.\d+)?(Z|[+-]\d{2}:\d{2})?$",
}

NUM_RE = r"^[+-]?(\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?$"


def _num(lex: str):
    """Numeric value iff NUM_RE matches (the same regex gate the Spark
    compiler uses before its DECIMAL cast); None otherwise."""
    import decimal

    if re.match(NUM_RE, lex):
        return decimal.Decimal(lex)
    return None


def _pair_ok(lv: str, rv: str, strict: bool) -> bool:
    ln, rn = _num(lv), _num(rv)
    if ln is not None and rn is not None:
        return ln < rn if strict else ln <= rn
    return lv < rv if strict else lv <= rv


NODEKIND = {
    SH + "IRI": {"iri"},
    SH + "BlankNode": {"bnode"},
    SH + "Literal": {"literal"},
    SH + "BlankNodeOrIRI": {"bnode", "iri"},
    SH + "BlankNodeOrLiteral": {"bnode", "literal"},
    SH + "IRIOrLiteral": {"iri", "literal"},
}


def _focus_set(doc_triples, shapes):
    """(focus, shape) pairs incl. nested sh:node derivation."""
    out = set()
    for s in shapes.shapes:
        for t in doc_triples:
            if t.pred == RDF_TYPE and t.obj_value in s.target_classes:
                out.add((t.subj, s.iri))
            if t.pred in s.target_subjects_of:
                out.add((t.subj, s.iri))
            if t.pred in s.target_objects_of and t.obj_kind != "literal":
                out.add((t.obj_value, s.iri))
        for n in s.target_nodes:
            out.add((n, s.iri))
    # nested: child focus = non-literal values of parent property
    changed = True
    guard = 0
    while changed and guard < 6:
        changed = False
        guard += 1
        for s in shapes.shapes:
            for ps in s.properties:
                if not ps.node_shape or ps.node_shape not in shapes.by_id:
                    continue
                for (focus, shape_iri) in list(out):
                    if shape_iri != s.iri:
                        continue
                    for t in doc_triples:
                        if (
                            t.subj == focus
                            and t.pred == ps.path
                            and t.obj_kind != "literal"
                            and (t.obj_value, ps.node_shape) not in out
                        ):
                            out.add((t.obj_value, ps.node_shape))
                            changed = True
    return out


def _shape_closure(shapes, root: str) -> set:
    """root plus every shape it reaches via sh:node / qualified / logical
    references (cycle-safe)."""
    keep = {root}
    frontier = {root}
    while frontier:
        nxt = set()
        for sid in frontier:
            s = shapes.by_id[sid]
            refs = (
                set(s.not_shapes) | set(s.and_shapes)
                | set(s.or_shapes) | set(s.xone_shapes)
            )
            for p in s.properties:
                if p.node_shape:
                    refs.add(p.node_shape)
                if p.qualified_shape:
                    refs.add(p.qualified_shape)
            nxt |= {r for r in refs if r in shapes.by_id}
        frontier = nxt - keep
        keep |= frontier
    return keep


def _conforms(doc_id, doc, node, shape_id, shapes, depth: int) -> bool:
    """Does `node` conform to `shape_id`? Probed by re-validating the doc
    against a derived shapes graph where the probed shape targets exactly
    this node (a mechanism deliberately different from the Spark
    compiler's probe-join). Conformance = NO violation anywhere in the
    probe run: the only focus rows the probe graph can produce are the
    probed (node, shape_id) and its transitively nested sh:node children
    over the node's value paths, so nested child findings bubble into
    the answer — the spec semantics (sh:node requires value-node
    conformance), matching the engine's _nested_closure probe."""
    import dataclasses as _dc

    if depth >= 5:
        return True
    ids = _shape_closure(shapes, shape_id)
    probe_shapes = []
    by_id = {}
    for sid in ids:
        s = shapes.by_id[sid]
        s2 = _dc.replace(
            s,
            target_classes=(),
            target_nodes=(node,) if sid == shape_id else (),
            target_subjects_of=(),
            target_objects_of=(),
        )
        probe_shapes.append(s2)
        by_id[sid] = s2
    pg = type(shapes)(shapes=tuple(probe_shapes), by_id=by_id)
    vs = validate_reference({doc_id: doc}, pg, _depth=depth + 1)
    return not vs


def validate_reference(triples_by_doc: dict, shapes, _depth: int = 0) -> set:
    """dict(doc_id -> list of Triple) -> set of violation identity tuples."""
    violations = set()
    for doc_id, doc in triples_by_doc.items():
        typed = {
            (t.subj, t.obj_value) for t in doc if t.pred == RDF_TYPE
        }
        for focus, shape_iri in _focus_set(doc, shapes):
            shape = shapes.by_id[shape_iri]
            own = [t for t in doc if t.subj == focus]
            for ps in shape.properties:
                vals = [t for t in own if t.pred == ps.path]
                for t in vals:
                    lit = t.obj_kind == "literal"
                    if ps.datatypes:
                        dt = t.obj_datatype or (XSD + "string")
                        ok = lit and t.obj_lang is None and dt in ps.datatypes
                        if ok:
                            rx = LEXICAL.get(dt)
                            if rx and not re.match(rx, t.obj_value):
                                ok = False
                        if not ok:
                            violations.add((doc_id, shape_iri, focus,
                                            SH + "DatatypeConstraintComponent",
                                            ps.path, t.obj_value))
                    if ps.pattern is not None:
                        if t.obj_kind == "bnode" or not re.search(
                            ps.pattern, t.obj_value
                        ):
                            violations.add((doc_id, shape_iri, focus,
                                            SH + "PatternConstraintComponent",
                                            ps.path, t.obj_value))
                    if ps.node_kind is not None and t.obj_kind not in NODEKIND.get(
                        ps.node_kind, {"iri", "bnode", "literal"}
                    ):
                        violations.add((doc_id, shape_iri, focus,
                                        SH + "NodeKindConstraintComponent",
                                        ps.path, t.obj_value))
                    if ps.min_length is not None and (
                        t.obj_kind == "bnode" or len(t.obj_value) < ps.min_length
                    ):
                        violations.add((doc_id, shape_iri, focus,
                                        SH + "MinLengthConstraintComponent",
                                        ps.path, t.obj_value))
                    if ps.max_length is not None and (
                        t.obj_kind == "bnode" or len(t.obj_value) > ps.max_length
                    ):
                        violations.add((doc_id, shape_iri, focus,
                                        SH + "MaxLengthConstraintComponent",
                                        ps.path, t.obj_value))
                    if ps.in_values and t.obj_value not in ps.in_values:
                        violations.add((doc_id, shape_iri, focus,
                                        SH + "InConstraintComponent",
                                        ps.path, t.obj_value))
                    if ps.class_ is not None and (
                        (t.obj_value, ps.class_) not in typed
                    ):
                        violations.add((doc_id, shape_iri, focus,
                                        SH + "ClassConstraintComponent",
                                        ps.path, t.obj_value))
                    for bound_lex, cmp_ok, comp in (
                        (ps.min_inclusive, lambda n, b: n >= b, "MinInclusive"),
                        (ps.max_inclusive, lambda n, b: n <= b, "MaxInclusive"),
                        (ps.min_exclusive, lambda n, b: n > b, "MinExclusive"),
                        (ps.max_exclusive, lambda n, b: n < b, "MaxExclusive"),
                    ):
                        if bound_lex is None:
                            continue
                        n = _num(t.obj_value) if lit else None
                        if n is None or not cmp_ok(n, _num(bound_lex)):
                            violations.add((doc_id, shape_iri, focus,
                                            SH + comp + "ConstraintComponent",
                                            ps.path, t.obj_value))
                    if ps.language_in and not (
                        lit and t.obj_lang in ps.language_in
                    ):
                        violations.add((doc_id, shape_iri, focus,
                                        SH + "LanguageInConstraintComponent",
                                        ps.path, t.obj_value))
                if ps.max_count is not None and len(vals) > ps.max_count:
                    violations.add((doc_id, shape_iri, focus,
                                    SH + "MaxCountConstraintComponent",
                                    ps.path, None))
                if ps.min_count is not None and len(vals) < ps.min_count:
                    violations.add((doc_id, shape_iri, focus,
                                    SH + "MinCountConstraintComponent",
                                    ps.path, None))
                if ps.has_value is not None and not any(
                    t.obj_value == ps.has_value for t in vals
                ):
                    violations.add((doc_id, shape_iri, focus,
                                    SH + "HasValueConstraintComponent",
                                    ps.path, None))
                if ps.unique_lang:
                    langs = [t.obj_lang for t in vals if t.obj_lang]
                    for lang in set(langs):
                        if langs.count(lang) > 1:
                            violations.add((doc_id, shape_iri, focus,
                                            SH + "UniqueLangConstraintComponent",
                                            ps.path, lang))
                for comp, other in (
                    ("Equals", ps.equals),
                    ("Disjoint", ps.disjoint),
                    ("LessThan", ps.less_than),
                    ("LessThanOrEquals", ps.less_than_or_equals),
                ):
                    if other is None:
                        continue
                    lvals = {t.obj_value for t in vals}
                    rvals = {t.obj_value for t in own if t.pred == other}
                    cc = SH + comp + "ConstraintComponent"
                    if comp == "Equals":
                        for v in lvals ^ rvals:  # both directions
                            violations.add((doc_id, shape_iri, focus,
                                            cc, ps.path, v))
                    elif comp == "Disjoint":
                        for v in lvals & rvals:
                            violations.add((doc_id, shape_iri, focus,
                                            cc, ps.path, v))
                    else:
                        strict = comp == "LessThan"
                        for lv in lvals:
                            if any(not _pair_ok(lv, rv, strict)
                                   for rv in rvals):
                                violations.add((doc_id, shape_iri, focus,
                                                cc, ps.path, lv))
            if shape.closed:
                allowed = {p.path for p in shape.properties} | set(
                    shape.ignored_properties
                )
                for t in own:
                    if t.pred not in allowed:
                        violations.add((doc_id, shape_iri, focus,
                                        SH + "ClosedConstraintComponent",
                                        t.pred, t.obj_value))
            # shape-valued components (depth-capped, SET semantics over
            # value nodes — mirrors the Spark probe contract)
            for ps in shape.properties:
                if (
                    ps.qualified_shape
                    and ps.qualified_shape in shapes.by_id
                    and (ps.qualified_min is not None
                         or ps.qualified_max is not None)
                    and _depth < 5
                ):
                    vset = {t.obj_value for t in own if t.pred == ps.path}
                    conf = {
                        v for v in vset
                        if _conforms(doc_id, doc, v, ps.qualified_shape,
                                     shapes, _depth)
                    }
                    if (ps.qualified_min is not None
                            and len(conf) < ps.qualified_min):
                        violations.add((
                            doc_id, shape_iri, focus,
                            SH + "QualifiedMinCountConstraintComponent",
                            ps.path, None))
                    if (ps.qualified_max is not None
                            and len(conf) > ps.qualified_max):
                        violations.add((
                            doc_id, shape_iri, focus,
                            SH + "QualifiedMaxCountConstraintComponent",
                            ps.path, None))
            if _depth < 5:
                for n in shape.not_shapes:
                    if n in shapes.by_id and _conforms(
                        doc_id, doc, focus, n, shapes, _depth
                    ):
                        violations.add((doc_id, shape_iri, focus,
                                        SH + "NotConstraintComponent",
                                        None, None))
                for comp, members in (
                    ("And", shape.and_shapes),
                    ("Or", shape.or_shapes),
                    ("Xone", shape.xone_shapes),
                ):
                    if not members or not all(
                        m in shapes.by_id for m in members
                    ):
                        continue
                    n_conf = sum(
                        1 for m in members
                        if _conforms(doc_id, doc, focus, m, shapes, _depth)
                    )
                    bad = (
                        (comp == "And" and n_conf < len(members))
                        or (comp == "Or" and n_conf == 0)
                        or (comp == "Xone" and n_conf != 1)
                    )
                    if bad:
                        violations.add((doc_id, shape_iri, focus,
                                        SH + comp + "ConstraintComponent",
                                        None, None))
    return violations
