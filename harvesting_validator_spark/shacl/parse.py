"""Parse a SHACL shapes document (Turtle text) into a ShapesGraph.

Driver-side, once per run — parity with the reference's startup
``Shapes.parse(shapesGraph)`` (`ApplicationConfig.java:44-50`). The shapes
file is tiny (an "application profile"), so plain Python over the parsed
triple list is appropriate; the compiled ShapesGraph is then broadcast to
executors implicitly via the DataFrame expressions built from it.
"""

from __future__ import annotations

import re

from collections import defaultdict

from harvesting_validator_spark.sources.rdf_parse import Triple, parse_turtle
from harvesting_validator_spark.shacl.model import (
    RDF,
    SH,
    NodeShape,
    PropertyShape,
    ShapesGraph,
    SparqlConstraint,
)

RDF_FIRST = RDF + "first"
RDF_REST = RDF + "rest"
RDF_NIL = RDF + "nil"


def _index(triples: list[Triple]):
    by_subj: dict[str, list[Triple]] = defaultdict(list)
    for t in triples:
        by_subj[t.subj].append(t)
    return by_subj


def _values(by_subj, subj: str, pred: str) -> list[Triple]:
    return [t for t in by_subj.get(subj, []) if t.pred == pred]

def _value(by_subj, subj: str, pred: str) -> Triple | None:
    vs = _values(by_subj, subj, pred)
    return vs[0] if vs else None


def _rdf_list(by_subj, head: str) -> list[str]:
    out: list[str] = []
    node = head
    seen: set[str] = set()
    while node and node != RDF_NIL and node not in seen:
        seen.add(node)
        first = _value(by_subj, node, RDF_FIRST)
        if first is not None:
            out.append(first.obj_value)
        rest = _value(by_subj, node, RDF_REST)
        node = rest.obj_value if rest is not None else RDF_NIL
    return out


def _int(t: Triple | None) -> int | None:
    if t is None:
        return None
    try:
        return int(t.obj_value)
    except ValueError:
        return None


_RECURSIVE_PATH_KINDS = {
    SH + "zeroOrMorePath": ("zero_or_more", "*"),
    SH + "oneOrMorePath": ("one_or_more", "+"),
}


def _step_list(
    by_subj, head: str, ctx: str
) -> list[tuple[str, bool]]:
    """Walk an rdf:list whose members are path STEPS: a plain IRI
    (forward hop) or ``[sh:inversePath <iri>]`` (inverse hop, r5 wave 3).
    Deeper nesting raises (the degrade-don't-guess contract)."""
    steps: list[tuple[str, bool]] = []
    cur = head
    seen: set[str] = set()
    while cur and cur != RDF_NIL:
        if cur in seen:
            # a cyclic rdf:rest chain is as malformed as a missing
            # rdf:first — truncating it would validate a shorter path
            raise NotImplementedError(
                f"cyclic rdf:list inside {ctx}: node {cur!r} repeats"
            )
        seen.add(cur)
        first = _value(by_subj, cur, RDF_FIRST)
        if first is None:
            # a list node without rdf:first is a MALFORMED list:
            # silently truncating would validate a shorter path than
            # declared (degrade-don't-guess)
            raise NotImplementedError(
                f"malformed rdf:list inside {ctx}: node {cur!r} has no "
                "rdf:first"
            )
        if first.obj_kind == "bnode":
            inv = _value(by_subj, first.obj_value, SH + "inversePath")
            if inv is None or inv.obj_kind == "bnode":
                raise NotImplementedError(
                    f"only IRI and [sh:inversePath <iri>] members are "
                    f"supported inside {ctx} (shacl/model.py)"
                )
            steps.append((inv.obj_value, True))
        elif first.obj_kind == "literal":
            # a literal can never be a predicate: treating its text as
            # one would silently match nothing
            raise NotImplementedError(
                f"literal {first.obj_value!r} is not a valid path step "
                f"inside {ctx}"
            )
        else:
            steps.append((first.obj_value, False))
        rest = _value(by_subj, cur, RDF_REST)
        if rest is None:
            # a list node without rdf:rest is malformed, not a quiet
            # end-of-list — same contract as the missing-rdf:first case
            raise NotImplementedError(
                f"malformed rdf:list inside {ctx}: node {cur!r} has no "
                "rdf:rest"
            )
        cur = rest.obj_value
    return steps


def _step_display(steps: list[tuple[str, bool]], sep: str) -> str:
    return sep.join(("^" + p) if inv else p for p, inv in steps)


def _parse_path(
    by_subj, path_t
) -> tuple[str, str, tuple[str, ...], tuple[bool, ...]]:
    """Resolve a sh:path object -> (display_id, kind, preds, dirs).

    Supported beyond the simple IRI the reference uses (SURVEY §2.6):
    ``[sh:inversePath <p>]``, sequence paths ``( s1 s2 ... )`` with >=2
    step members, ``[sh:alternativePath ( s1 s2 ... )]`` — where each
    step member is an IRI or ``[sh:inversePath <iri>]`` (r5 wave 3) —
    ``[sh:zeroOrOnePath <p>]``, and the recursive forms
    ``[sh:zeroOrMorePath <p>]`` / ``[sh:oneOrMorePath <p>]`` (evaluated
    by an iterative transitive-closure fixpoint, compile.py).
    ``[sh:inversePath (s1 .. sn)]`` and ``[sh:inversePath
    [sh:alternativePath (..)]]`` normalize here (^(p/q) == ^q/^p,
    ^(p|q) == ^p|^q). Deeper nesting raises — the degrade-don't-guess
    contract (silently skipping a constraint would under-validate).
    Display ids use SPARQL path syntax over raw IRIs ("^"+iri,
    "/"-joined steps, "|"-joined steps, iri+"?", iri+"*", iri+"+"); an
    IRI cannot start with "^" or contain a second full IRI joined by
    "/" or "|", and predicate IRIs ending in a bare "?"/"*"/"+" do not
    occur in practice, so the ids do not collide with real predicates
    in the data."""
    if path_t.obj_kind != "bnode":
        return path_t.obj_value, "iri", (), ()
    node = path_t.obj_value
    inv = _value(by_subj, node, SH + "inversePath")
    if inv is not None:
        if inv.obj_kind != "bnode":
            return "^" + inv.obj_value, "inverse", (inv.obj_value,), (True,)
        # inverse of an expression: normalize into the expression space
        inner = inv.obj_value
        if _value(by_subj, inner, RDF_FIRST) is not None:
            steps = [
                (p, not d)
                for p, d in reversed(
                    _step_list(by_subj, inner, "sh:inversePath(sequence)")
                )
            ]
            if len(steps) < 2:
                raise NotImplementedError("sequence path needs >=2 members")
            return (
                _step_display(steps, "/"), "sequence",
                tuple(p for p, _ in steps), tuple(d for _, d in steps),
            )
        inner_alt = _value(by_subj, inner, SH + "alternativePath")
        if inner_alt is not None and inner_alt.obj_kind == "bnode":
            steps = [
                (p, not d)
                for p, d in _step_list(
                    by_subj, inner_alt.obj_value,
                    "sh:inversePath(alternative)",
                )
            ]
            if len(steps) < 2:
                raise NotImplementedError(
                    "sh:alternativePath needs an rdf:list of >=2 members"
                )
            return (
                _step_display(steps, "|"), "alternative",
                tuple(p for p, _ in steps), tuple(d for _, d in steps),
            )
        raise NotImplementedError(
            "nested path expression under sh:inversePath is out of "
            "contract (shacl/model.py)"
        )
    alt = _value(by_subj, node, SH + "alternativePath")
    if alt is not None:
        if alt.obj_kind != "bnode":
            raise NotImplementedError(
                "sh:alternativePath needs an rdf:list of >=2 members"
            )
        steps = _step_list(by_subj, alt.obj_value, "sh:alternativePath")
        if len(steps) < 2:
            raise NotImplementedError(
                "sh:alternativePath needs an rdf:list of >=2 members"
            )
        return (
            _step_display(steps, "|"), "alternative",
            tuple(p for p, _ in steps), tuple(d for _, d in steps),
        )
    zoo = _value(by_subj, node, SH + "zeroOrOnePath")
    if zoo is not None:
        if zoo.obj_kind == "bnode":
            raise NotImplementedError(
                "nested path expression under sh:zeroOrOnePath is out of "
                "contract (shacl/model.py)"
            )
        return zoo.obj_value + "?", "zero_or_one", (zoo.obj_value,), (False,)
    for pred, (kind, suffix) in _RECURSIVE_PATH_KINDS.items():
        rec = _value(by_subj, node, pred)
        if rec is not None:
            if rec.obj_kind == "bnode":
                raise NotImplementedError(
                    f"nested path expression under <{pred}> is out of "
                    "contract (shacl/model.py)"
                )
            return rec.obj_value + suffix, kind, (rec.obj_value,), (False,)
    if _value(by_subj, node, RDF_FIRST) is not None:
        steps = _step_list(by_subj, node, "a sequence path")
        if len(steps) < 2:
            raise NotImplementedError(
                "sequence path needs >=2 members"
            )
        return (
            _step_display(steps, "/"), "sequence",
            tuple(p for p, _ in steps), tuple(d for _, d in steps),
        )
    raise NotImplementedError(
        "unrecognized sh:path blank-node expression is out of contract "
        "(shacl/model.py)"
    )


def _parse_property_shape(by_subj, ps_id: str) -> PropertyShape | None:
    path_t = _value(by_subj, ps_id, SH + "path")
    if path_t is None:
        return None
    path, path_kind, path_preds, path_dirs = _parse_path(by_subj, path_t)
    datatypes: list[str] = []
    dt = _value(by_subj, ps_id, SH + "datatype")
    if dt is not None:
        datatypes.append(dt.obj_value)
    # sh:or ( [sh:datatype d1] [sh:datatype d2] ... ) — the shaclc
    # `xsd:integer|xsd:string` union form (default.shaclc:13)
    or_t = _value(by_subj, ps_id, SH + "or")
    if or_t is not None:
        for alt in _rdf_list(by_subj, or_t.obj_value):
            alt_dt = _value(by_subj, alt, SH + "datatype")
            if alt_dt is not None:
                datatypes.append(alt_dt.obj_value)
    node_t = _value(by_subj, ps_id, SH + "node")
    in_t = _value(by_subj, ps_id, SH + "in")
    pattern_t = _value(by_subj, ps_id, SH + "pattern")
    class_t = _value(by_subj, ps_id, SH + "class")
    kind_t = _value(by_subj, ps_id, SH + "nodeKind")
    msg_t = _value(by_subj, ps_id, SH + "message")
    hv_t = _value(by_subj, ps_id, SH + "hasValue")

    def _lex(pred: str) -> str | None:
        t = _value(by_subj, ps_id, SH + pred)
        return t.obj_value if t else None

    lang_in_t = _value(by_subj, ps_id, SH + "languageIn")
    ul_t = _value(by_subj, ps_id, SH + "uniqueLang")
    sparql_cs: tuple = ()
    if _value(by_subj, ps_id, SH + "sparql") is not None:
        if path_kind != "iri":
            # $PATH substitution into a path EXPRESSION would need the
            # SPARQL engine to evaluate that expression — raising beats
            # silently under-validating
            raise NotImplementedError(
                "sh:sparql on a property shape with a non-IRI sh:path is "
                "out of contract (shacl/model.py)"
            )
        sparql_cs = _parse_sparql_constraints(by_subj, ps_id, path=path)
    if node_t is not None and path_kind != "iri":
        # compute_focus / _nested_closure derive child focus by joining
        # triples on the parent's SIMPLE path; wiring them through the
        # synthetic path rows is future work — raise, don't under-validate
        raise NotImplementedError(
            "sh:node under a non-IRI sh:path is out of contract "
            "(shacl/model.py)"
        )
    return PropertyShape(
        shape_id=ps_id,
        path=path,
        path_kind=path_kind,
        path_preds=path_preds,
        path_dirs=path_dirs,
        sparql_constraints=sparql_cs,
        min_count=_int(_value(by_subj, ps_id, SH + "minCount")),
        max_count=_int(_value(by_subj, ps_id, SH + "maxCount")),
        datatypes=tuple(datatypes),
        pattern=pattern_t.obj_value if pattern_t else None,
        class_=class_t.obj_value if class_t else None,
        node_kind=kind_t.obj_value if kind_t else None,
        min_length=_int(_value(by_subj, ps_id, SH + "minLength")),
        max_length=_int(_value(by_subj, ps_id, SH + "maxLength")),
        in_values=tuple(_rdf_list(by_subj, in_t.obj_value)) if in_t else (),
        has_value=hv_t.obj_value if hv_t else None,
        node_shape=node_t.obj_value if node_t else None,
        min_inclusive=_lex("minInclusive"),
        max_inclusive=_lex("maxInclusive"),
        min_exclusive=_lex("minExclusive"),
        max_exclusive=_lex("maxExclusive"),
        language_in=tuple(
            _rdf_list(by_subj, lang_in_t.obj_value)
        ) if lang_in_t else (),
        unique_lang=ul_t is not None and ul_t.obj_value == "true",
        equals=_lex("equals"),
        disjoint=_lex("disjoint"),
        less_than=_lex("lessThan"),
        less_than_or_equals=_lex("lessThanOrEquals"),
        qualified_shape=(
            _value(by_subj, ps_id, SH + "qualifiedValueShape").obj_value
            if _value(by_subj, ps_id, SH + "qualifiedValueShape") else None
        ),
        qualified_min=_int(_value(by_subj, ps_id, SH + "qualifiedMinCount")),
        qualified_max=_int(_value(by_subj, ps_id, SH + "qualifiedMaxCount")),
        qualified_disjoint=(
            (qd := _value(by_subj, ps_id,
                          SH + "qualifiedValueShapesDisjoint")) is not None
            and qd.obj_value == "true"
        ),
        message=msg_t.obj_value if msg_t else None,
    )


def _pattern_binds_this(elements: tuple) -> bool:
    """Does any triple pattern (at any nesting level) bind ?this?"""
    from harvesting_validator_spark.sparql import (
        Graph,
        Optional_,
        SubSelect,
        TriplePattern,
        Union_,
        Var,
    )

    for el in elements:
        if isinstance(el, TriplePattern):
            for term in (el.s, el.p, el.o):
                if isinstance(term, Var) and term.name == "this":
                    return True
        elif isinstance(el, Optional_):
            if _pattern_binds_this(el.pattern):
                return True
        elif isinstance(el, Graph):
            if _pattern_binds_this(el.pattern):
                return True
        elif isinstance(el, Union_):
            if _pattern_binds_this(el.left) or _pattern_binds_this(el.right):
                return True
        elif isinstance(el, SubSelect):
            # only the sub-select's PROJECTED vars are visible outward
            proj = el.query.projection
            if proj is None:  # SELECT * re-exposes everything it binds
                if _pattern_binds_this(el.query.pattern):
                    return True
            elif any(
                isinstance(p, Var) and p.name == "this" for p in proj
            ) and _pattern_binds_this(el.query.pattern):
                return True
    return False


def _parse_sparql_constraints(
    by_subj, sid: str, path: str | None = None
) -> tuple[SparqlConstraint, ...]:
    """Parse the ``sh:sparql`` constraints of one node or property shape
    (spec §5.3).

    Validation happens HERE, at profile-parse time (parity with the
    reference's startup ``Shapes.parse``, `ApplicationConfig.java:44-50`):
    the final query text — sh:prefixes inlined, ``$this`` rewritten to
    ``?this``, and on property shapes (``path`` given) the pre-bound
    ``$PATH`` substituted with ``<path-iri>`` per spec §5.3.1 — must
    parse within sparql.py's documented subset, be a SELECT, use no
    GRAPH clause (the compiler owns document scoping), pre-bind nothing
    else, and bind ``?this`` in at least one triple pattern. A
    constraint the engine cannot evaluate faithfully fails the run's
    startup instead of under-validating (the degrade-don't-guess
    contract)."""
    from harvesting_validator_spark.sparql import (
        parse_sparql,
        uses_graph_clause,
    )
    import hashlib

    out: list[SparqlConstraint] = []
    for t in _values(by_subj, sid, SH + "sparql"):
        node = t.obj_value
        deact = _value(by_subj, node, SH + "deactivated")
        if deact is not None and deact.obj_value == "true":
            continue
        sel = _value(by_subj, node, SH + "select")
        if sel is None:
            raise NotImplementedError(
                "sh:sparql without sh:select (sh:ask-only constraint "
                "validators) is out of contract (shacl/model.py)"
            )
        text = sel.obj_value
        px = _value(by_subj, node, SH + "prefixes")
        if px is not None:
            decls = []
            for d in _values(by_subj, px.obj_value, SH + "declare"):
                p = _value(by_subj, d.obj_value, SH + "prefix")
                ns = _value(by_subj, d.obj_value, SH + "namespace")
                if p is None or ns is None:
                    raise NotImplementedError(
                        "sh:declare needs both sh:prefix and sh:namespace"
                    )
                decls.append(f"PREFIX {p.obj_value}: <{ns.obj_value}>")
            if decls:
                text = "\n".join(decls) + "\n" + text
        if path is not None:
            text = text.replace("$PATH", f"<{path}>")
        other = sorted({
            m.group(0) for m in re.finditer(r"\$\w+", text)
            if m.group(0) != "$this"
        })
        if other:
            raise NotImplementedError(
                f"pre-bound variables {other} are out of contract "
                "(shacl/model.py); only $this is pre-bound"
            )
        if "$this" not in text:
            raise NotImplementedError(
                "sh:select must reference the pre-bound $this variable"
            )
        text = text.replace("$this", "?this")
        q = parse_sparql(text)  # SparqlUnsupported surfaces here
        if q.form != "select":
            raise NotImplementedError(
                "sh:select must hold a SELECT query"
            )
        if uses_graph_clause(q):
            raise NotImplementedError(
                "GRAPH clauses inside sh:sparql are out of contract "
                "(the compiler scopes the query to each document)"
            )
        from harvesting_validator_spark.sparql import Agg

        if (
            q.group_by
            or q.limit is not None
            or q.offset
            or q.order_by
            or any(isinstance(p, Agg) for p in q.projection or [])
        ):
            # a constraint emits one result PER SOLUTION; aggregates and
            # global solution modifiers have no per-focus meaning here
            raise NotImplementedError(
                "aggregates / GROUP BY / ORDER / LIMIT / OFFSET inside "
                "sh:sparql are out of contract (shacl/model.py)"
            )
        if not _pattern_binds_this(q.pattern):
            raise NotImplementedError(
                "sh:select must bind ?this in at least one triple pattern"
            )
        msg_t = _value(by_subj, node, SH + "message")
        source = node
        if source.startswith("_:"):
            key = f"{sid}\x1fsparql\x1f{text}".encode()
            source = (
                "urn:skolem:sparql:" + hashlib.sha256(key).hexdigest()
            )
        out.append(
            SparqlConstraint(
                source=source,
                select=text,
                message=msg_t.obj_value if msg_t else None,
            )
        )
    return tuple(out)


def parse_shapes_triples(triples: list[Triple]) -> ShapesGraph:
    by_subj = _index(triples)
    rdf_type = RDF + "type"
    node_shape_ids: list[str] = []
    seen: set[str] = set()
    for t in triples:
        is_decl = t.pred == rdf_type and t.obj_value == SH + "NodeShape"
        has_target = t.pred in (SH + "targetClass", SH + "targetNode")
        if (is_decl or has_target) and t.subj not in seen:
            seen.add(t.subj)
            node_shape_ids.append(t.subj)
    # also any object of sh:node / sh:qualifiedValueShape / sh:not is a
    # node shape (nested, qualified, or negated sub-shape), and every
    # member of a node-level sh:and / sh:or / sh:xone list
    for t in triples:
        if (
            t.pred in (SH + "node", SH + "qualifiedValueShape", SH + "not")
            and t.obj_value not in seen
        ):
            seen.add(t.obj_value)
            node_shape_ids.append(t.obj_value)
    logical_preds = (SH + "and", SH + "or", SH + "xone")
    declared = set(node_shape_ids)
    for t in triples:
        # node-LEVEL logical lists only: the subject must be a declared
        # node shape (property-level sh:or datatype unions live on
        # property bnodes and are consumed by _parse_property_shape)
        if t.pred in logical_preds and t.subj in declared:
            for member in _rdf_list(by_subj, t.obj_value):
                if member not in seen:
                    seen.add(member)
                    node_shape_ids.append(member)

    shapes: list[NodeShape] = []
    for sid in node_shape_ids:
        props: list[PropertyShape] = []
        for pt in _values(by_subj, sid, SH + "property"):
            ps = _parse_property_shape(by_subj, pt.obj_value)
            if ps is not None:
                props.append(ps)
        closed_t = _value(by_subj, sid, SH + "closed")
        ignored_t = _value(by_subj, sid, SH + "ignoredProperties")
        deact_t = _value(by_subj, sid, SH + "deactivated")
        if deact_t is not None and deact_t.obj_value == "true":
            # sh:deactivated: the shape validates NOTHING — no targets, no
            # constraints — and every node trivially conforms to it when
            # referenced as a sub-shape (probes find no violations).
            # Neutralizing at parse time gives both behaviors for free.
            shapes.append(NodeShape(iri=sid))
            continue
        shapes.append(
            NodeShape(
                iri=sid,
                target_classes=tuple(
                    t.obj_value for t in _values(by_subj, sid, SH + "targetClass")
                ),
                target_nodes=tuple(
                    t.obj_value for t in _values(by_subj, sid, SH + "targetNode")
                ),
                target_subjects_of=tuple(
                    t.obj_value
                    for t in _values(by_subj, sid, SH + "targetSubjectsOf")
                ),
                target_objects_of=tuple(
                    t.obj_value
                    for t in _values(by_subj, sid, SH + "targetObjectsOf")
                ),
                properties=tuple(props),
                closed=closed_t is not None and closed_t.obj_value == "true",
                ignored_properties=tuple(
                    _rdf_list(by_subj, ignored_t.obj_value)
                ) if ignored_t else (),
                not_shapes=tuple(
                    t.obj_value for t in _values(by_subj, sid, SH + "not")
                ),
                and_shapes=tuple(
                    m
                    for t in _values(by_subj, sid, SH + "and")
                    for m in _rdf_list(by_subj, t.obj_value)
                ),
                or_shapes=tuple(
                    m
                    for t in _values(by_subj, sid, SH + "or")
                    for m in _rdf_list(by_subj, t.obj_value)
                ),
                xone_shapes=tuple(
                    m
                    for t in _values(by_subj, sid, SH + "xone")
                    for m in _rdf_list(by_subj, t.obj_value)
                ),
                sparql_constraints=_parse_sparql_constraints(by_subj, sid),
            )
        )
    return ShapesGraph(
        shapes=tuple(shapes), by_id={s.iri: s for s in shapes}
    )


def parse_shapes_turtle(text: str) -> ShapesGraph:
    return parse_shapes_triples(parse_turtle(text))
