"""SHACL shapes -> violations DataFrame, as declarative Spark plans.

Reference analog: ``shaclService.validate(graph)`` running Jena's SHACL
engine per document model (`FilteringService.java:67-68`; SURVEY.md §2.6).
Here every constraint compiles to Catalyst-pushable DataFrame predicates
over the long/narrow triples table — no per-row Python anywhere:

* value constraints (datatype, pattern, nodeKind, class, length, in)
  -> ``filter`` over the focus-joined triples;
* cardinality constraints -> one ``groupBy(doc_id, focus, pred).count()``
  shared by every shape, joined against a broadcast spec table;
* closed shapes -> ``~pred.isin(allowed)`` filters;
* nested node shapes -> focus-set derivation, re-using the same machinery.

Scale notes (100 TB / 10^12 docs): the only shuffles are (1) the
focus⋈triples join, keyed (doc_id, node) — co-partitioned with every
other per-doc operation so the exchange is reused, and (2) the single
cardinality groupBy on the same key prefix. Shape/spec tables are tiny and
always broadcast. rdf:type skew (every doc has type triples) is bounded
because all joins carry doc_id in the key.

Violations schema (SURVEY §1.5):
    doc_id, shape, focus_node, result_path (null for node-level), value
    (null for cardinality), value_kind, constraint_component, severity,
    message
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from harvesting_validator_spark.shacl.model import (
    RDF_TYPE,
    SEVERITY_VIOLATION,
    SH,
    NodeShape,
    PropertyShape,
    ShapesGraph,
)

XSD = "http://www.w3.org/2001/XMLSchema#"

# lexical-form validity per common xsd datatype (Jena flags ill-formed
# literals as datatype violations; unknown datatypes pass through)
_LEXICAL_RE = {
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

_NODEKIND_ALLOWED = {
    SH + "IRI": ("iri",),
    SH + "BlankNode": ("bnode",),
    SH + "Literal": ("literal",),
    SH + "BlankNodeOrIRI": ("bnode", "iri"),
    SH + "BlankNodeOrLiteral": ("bnode", "literal"),
    SH + "IRIOrLiteral": ("iri", "literal"),
}

VIOLATIONS_COLUMNS = (
    "doc_id", "shape", "focus_node", "result_path", "value", "value_kind",
    "constraint_component", "severity", "message",
)

_MAX_NESTING_DEPTH = 5


def _viol(df: DataFrame, shape: str, component: str, message,
          path=None, value=None, value_kind=None) -> DataFrame:
    """Project a filtered focus-triples DF into the violations schema."""
    return df.select(
        F.col("doc_id"),
        F.lit(shape).alias("shape"),
        F.col("focus_node"),
        (F.lit(path) if isinstance(path, (str, type(None))) else path).alias("result_path"),
        (F.lit(value) if isinstance(value, (str, type(None))) else value).alias("value"),
        (F.lit(value_kind) if isinstance(value_kind, (str, type(None))) else value_kind).alias("value_kind"),
        F.lit(component).alias("constraint_component"),
        F.lit(SEVERITY_VIOLATION).alias("severity"),
        (F.lit(message) if isinstance(message, str) else message).alias("message"),
    )


def _union_all(dfs: list[DataFrame]) -> DataFrame | None:
    dfs = [d for d in dfs if d is not None]
    if not dfs:
        return None
    return functools.reduce(lambda a, b: a.unionByName(b), dfs)


def compute_focus(triples: DataFrame, shapes: ShapesGraph,
                  spark: SparkSession) -> DataFrame:
    """Focus-node table: (doc_id, focus_node, shape).

    targetClass focus = one broadcast join of the rdf:type slice against
    the tiny (class -> shape) spec; nested sh:node shapes derive child
    focus sets level by level (depth-bounded; the reference profiles nest
    at most once, `default.shaclc:12-15`).
    """
    frames: list[DataFrame] = []

    class_rows = [
        (s.iri, c) for s in shapes.shapes for c in s.target_classes
    ]
    if class_rows:
        spec = spark.createDataFrame(class_rows, "shape string, target_class string")
        typed = triples.filter(F.col("pred") == RDF_TYPE).select(
            "doc_id", F.col("subj").alias("focus_node"),
            F.col("obj_value").alias("cls"),
        )
        frames.append(
            typed.join(F.broadcast(spec), typed.cls == spec.target_class)
            .select("doc_id", "focus_node", "shape")
        )

    node_rows = [(s.iri, n) for s in shapes.shapes for n in s.target_nodes]
    if node_rows:
        spec_n = spark.createDataFrame(node_rows, "shape string, node string")
        docs = triples.select("doc_id").distinct()
        frames.append(
            docs.crossJoin(F.broadcast(spec_n)).select(
                "doc_id", F.col("node").alias("focus_node"), "shape"
            )
        )

    base = _union_all(frames)
    if base is None:
        return spark.createDataFrame(
            [], "doc_id string, focus_node string, shape string"
        )

    # nested sh:node: child focus = value nodes of the parent property
    all_frames = [base]
    frontier = base
    for _ in range(_MAX_NESTING_DEPTH):
        nest_rows = [
            (s.iri, p.path, p.node_shape)
            for s in shapes.shapes
            for p in s.properties
            if p.node_shape and p.node_shape in shapes.by_id
        ]
        if not nest_rows:
            break
        nspec = SparkSession.getActiveSession().createDataFrame(
            nest_rows, "parent_shape string, path string, child_shape string"
        )
        child = (
            frontier.alias("f")
            .join(
                triples.alias("t"),
                (F.col("f.doc_id") == F.col("t.doc_id"))
                & (F.col("f.focus_node") == F.col("t.subj")),
            )
            .join(
                F.broadcast(nspec),
                (F.col("f.shape") == F.col("parent_shape"))
                & (F.col("t.pred") == F.col("path")),
            )
            .filter(F.col("t.obj_kind") != "literal")
            .select(
                F.col("t.doc_id").alias("doc_id"),
                F.col("t.obj_value").alias("focus_node"),
                F.col("child_shape").alias("shape"),
            )
            .distinct()
        )
        if child.isEmpty():
            break
        all_frames.append(child)
        frontier = child
    return _union_all(all_frames).distinct()


def _value_constraint_violations(
    ftrip: DataFrame, shape: NodeShape, ps: PropertyShape
) -> list[DataFrame]:
    """Per-value constraint checks: pure Catalyst filters on the
    focus-joined triples (no shuffle)."""
    out: list[DataFrame] = []
    vals = ftrip.filter(
        (F.col("shape") == shape.iri) & (F.col("pred") == ps.path)
    )
    obj, kind = F.col("obj_value"), F.col("obj_kind")

    if ps.datatypes:
        is_literal = kind == "literal"
        dt_ok = F.coalesce(F.col("obj_datatype"), F.lit(XSD + "string")).isin(
            list(ps.datatypes)
        ) & F.col("obj_lang").isNull()
        lex_ok = F.lit(True)
        for dt in ps.datatypes:
            rx = _LEXICAL_RE.get(dt)
            if rx:
                lex_ok = lex_ok & F.when(
                    F.coalesce(F.col("obj_datatype"), F.lit(XSD + "string")) == dt,
                    obj.rlike(rx),
                ).otherwise(F.lit(True))
        bad = ~(is_literal & dt_ok & lex_ok)
        out.append(_viol(
            vals.filter(bad), shape.iri, SH + "DatatypeConstraintComponent",
            ps.message or f"value does not have datatype <{'|'.join(ps.datatypes)}>",
            path=ps.path, value=obj, value_kind=kind,
        ))

    if ps.pattern is not None:
        bad = (kind == "bnode") | ~obj.rlike(ps.pattern)
        out.append(_viol(
            vals.filter(bad), shape.iri, SH + "PatternConstraintComponent",
            ps.message or f"value does not match pattern '{ps.pattern}'",
            path=ps.path, value=obj, value_kind=kind,
        ))

    if ps.node_kind is not None:
        allowed = _NODEKIND_ALLOWED.get(ps.node_kind, ("iri", "bnode", "literal"))
        out.append(_viol(
            vals.filter(~kind.isin(list(allowed))), shape.iri,
            SH + "NodeKindConstraintComponent",
            ps.message or f"value is not of node kind <{ps.node_kind}>",
            path=ps.path, value=obj, value_kind=kind,
        ))

    if ps.min_length is not None:
        out.append(_viol(
            vals.filter((kind == "bnode") | (F.length(obj) < ps.min_length)),
            shape.iri, SH + "MinLengthConstraintComponent",
            ps.message or f"value shorter than {ps.min_length}",
            path=ps.path, value=obj, value_kind=kind,
        ))
    if ps.max_length is not None:
        out.append(_viol(
            vals.filter((kind == "bnode") | (F.length(obj) > ps.max_length)),
            shape.iri, SH + "MaxLengthConstraintComponent",
            ps.message or f"value longer than {ps.max_length}",
            path=ps.path, value=obj, value_kind=kind,
        ))

    if ps.in_values:
        out.append(_viol(
            vals.filter(~obj.isin(list(ps.in_values))), shape.iri,
            SH + "InConstraintComponent",
            ps.message or "value not in allowed list",
            path=ps.path, value=obj, value_kind=kind,
        ))
    return out


def _class_constraint_violations(
    triples: DataFrame, ftrip: DataFrame, shape: NodeShape, ps: PropertyShape
) -> DataFrame:
    """sh:class C: value node must carry rdf:type C *within the same
    document* (per-document models, SURVEY §2.6). left_anti join against
    the typed-node slice; literals always violate."""
    typed = (
        triples.filter(
            (F.col("pred") == RDF_TYPE) & (F.col("obj_value") == ps.class_)
        )
        .select(F.col("doc_id").alias("t_doc"), F.col("subj").alias("t_node"))
        .distinct()
    )
    vals = ftrip.filter(
        (F.col("shape") == shape.iri) & (F.col("pred") == ps.path)
    )
    bad = vals.join(
        typed,
        (vals.doc_id == typed.t_doc) & (vals.obj_value == typed.t_node),
        "left_anti",
    )
    return _viol(
        bad, shape.iri, SH + "ClassConstraintComponent",
        ps.message or f"value is not an instance of <{ps.class_}>",
        path=ps.path, value=F.col("obj_value"), value_kind=F.col("obj_kind"),
    )


def validate(
    triples: DataFrame, shapes: ShapesGraph, spark: SparkSession | None = None
) -> DataFrame:
    """All violations for all shapes: one DataFrame, computed with a
    single focus⋈triples join + a single cardinality groupBy, shared
    across every shape/constraint (union of filters over the cached
    intermediate)."""
    spark = spark or SparkSession.getActiveSession()
    focus = compute_focus(triples, shapes, spark)

    ftrip = (
        focus.alias("f")
        .join(
            triples.alias("t"),
            (F.col("f.doc_id") == F.col("t.doc_id"))
            & (F.col("f.focus_node") == F.col("t.subj")),
        )
        .select(
            F.col("t.doc_id").alias("doc_id"),
            "f.focus_node", "f.shape",
            "t.pred", "t.obj_value", "t.obj_kind", "t.obj_datatype", "t.obj_lang",
        )
    )

    frames: list[DataFrame] = []
    any_counts = any(
        p.min_count is not None or p.max_count is not None or p.has_value
        for s in shapes.shapes for p in s.properties
    )
    counts = None
    if any_counts:
        counts = ftrip.groupBy("doc_id", "focus_node", "shape", "pred").agg(
            F.count(F.lit(1)).alias("cnt")
        )

    for shape in shapes.shapes:
        for ps in shape.properties:
            frames.extend(_value_constraint_violations(ftrip, shape, ps))
            if ps.class_ is not None:
                frames.append(
                    _class_constraint_violations(triples, ftrip, shape, ps)
                )
            if ps.max_count is not None and counts is not None:
                over = counts.filter(
                    (F.col("shape") == shape.iri)
                    & (F.col("pred") == ps.path)
                    & (F.col("cnt") > ps.max_count)
                )
                frames.append(_viol(
                    over, shape.iri, SH + "MaxCountConstraintComponent",
                    ps.message or f"more than {ps.max_count} values",
                    path=ps.path,
                ))
            if ps.min_count is not None and counts is not None:
                have = counts.filter(
                    (F.col("shape") == shape.iri) & (F.col("pred") == ps.path)
                ).select("doc_id", "focus_node",
                         F.col("cnt").alias("have_cnt"))
                under = (
                    focus.filter(F.col("shape") == shape.iri)
                    .join(have, ["doc_id", "focus_node"], "left")
                    .filter(F.coalesce(F.col("have_cnt"), F.lit(0)) < ps.min_count)
                )
                frames.append(_viol(
                    under, shape.iri, SH + "MinCountConstraintComponent",
                    ps.message or f"fewer than {ps.min_count} values",
                    path=ps.path,
                ))
            if ps.has_value is not None:
                having = (
                    ftrip.filter(
                        (F.col("shape") == shape.iri)
                        & (F.col("pred") == ps.path)
                        & (F.col("obj_value") == ps.has_value)
                    )
                    .select("doc_id", "focus_node").distinct()
                    .withColumn("present", F.lit(1))
                )
                missing = (
                    focus.filter(F.col("shape") == shape.iri)
                    .join(having, ["doc_id", "focus_node"], "left")
                    .filter(F.col("present").isNull())
                )
                frames.append(_viol(
                    missing, shape.iri, SH + "HasValueConstraintComponent",
                    ps.message or f"missing required value {ps.has_value}",
                    path=ps.path,
                ))
        if shape.closed:
            allowed = (
                {p.path for p in shape.properties}
                | set(shape.ignored_properties)
            )
            extra = ftrip.filter(
                (F.col("shape") == shape.iri)
                & ~F.col("pred").isin(list(allowed))
            )
            frames.append(_viol(
                extra, shape.iri, SH + "ClosedConstraintComponent",
                "predicate not allowed by closed shape",
                path=F.col("pred"), value=F.col("obj_value"),
                value_kind=F.col("obj_kind"),
            ))

    result = _union_all(frames)
    if result is None:
        return spark.createDataFrame(
            [],
            "doc_id string, shape string, focus_node string, "
            "result_path string, value string, value_kind string, "
            "constraint_component string, severity string, message string",
        )
    return result
