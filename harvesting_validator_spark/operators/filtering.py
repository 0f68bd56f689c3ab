"""Valid/error triple split, per-doc conformance verdicts, report triples.

Reference analogs (SURVEY.md §2.5, §2.6, FIXTURES.md §2):

* ``shaclService.filter(model, report)`` — sub-model of conformant triples
  (`FilteringService.java:119-131`). Semantics pinned by the golden
  fixture's inline expectations
  (`test/config/migrations/202103191602-create-dummy-import.ttl:7-31`):
  - subjects not targeted by any shape are "completely filtered";
  - values implicated by a value-level violation (pattern/datatype/
    nodeKind/class/length/closed/in) are dropped;
  - a maxCount violation drops *all* values at that (focus, path) — the
    fixture marks both of Bob's ssns invalid;
  - absence violations (minCount / hasValue) implicate no existing triple;
  - rdf:type and other ignored/declared conforming values are kept.
* ``importedTriples.difference(validTriples)`` — error triples
  (`FilteringService.java:94-106`): Jena Models are *sets*, so this is a
  left_anti join on the full triple key, not ``exceptAll``.
* validation report model with skolemized blank nodes
  (`FilteringService.java:77-79`, `ModelUtils.replaceAnonNodes`): we mint
  deterministic ``urn:skolem:`` IRIs from sha2 of the violation identity so
  output is stable across runs/partitions (SURVEY §2.6, C4).

All joins are keyed on (doc_id, …) — co-partitioned with the validate
stage, so at cluster scale the exchange on doc_id is reused across
validate/filter/split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from harvesting_validator_spark.shacl.model import SH

TRIPLE_KEY = [
    "doc_id", "subj", "pred", "obj_value", "obj_kind", "obj_datatype", "obj_lang",
]

# components whose violations implicate the specific offending value
_VALUE_LEVEL = [
    SH + "DatatypeConstraintComponent",
    SH + "PatternConstraintComponent",
    SH + "NodeKindConstraintComponent",
    SH + "MinLengthConstraintComponent",
    SH + "MaxLengthConstraintComponent",
    SH + "InConstraintComponent",
    SH + "ClassConstraintComponent",
    SH + "ClosedConstraintComponent",
]
# components whose violations implicate every value at (focus, path)
_PATH_LEVEL = [SH + "MaxCountConstraintComponent"]


def split_valid_error(
    triples: DataFrame, focus: DataFrame, violations: DataFrame,
    strict: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """F1 + F2: (valid_triples, error_triples).

    valid = triples whose subject is a focus node of some shape, minus
    value-implicating violations; error = input − valid (set difference
    via left_anti on the full key, `FilteringService.java:97`).

    strict mirrors the reference's ``shacl.strictModeFiltering`` toggle
    (`ApplicationConfig.java:38-39,52-56`, default false at
    `application.yml:7`), which is passed straight to the mu-java lib's
    ``new ShaclService(shapes, strictModeFiltering)`` and consumed by
    ``shaclService.filter(model, report)`` (`FilteringService.java:122`).
    Chosen strict semantics (the lib source isn't vendored in the
    reference tree, so this is pinned here and fixture-tested): a focus
    node with ANY violation — value-level, cardinality, or absence
    (minCount/hasValue) — is dropped WHOLE (all its triples, including
    rdf:type), instead of dropping only the offending values.
    Non-targeted subjects are filtered in both modes; strict=False output
    is byte-identical to the pre-toggle behavior.
    """
    # classify ONCE: three left joins attach markers, then both outputs are
    # filters over the same classified plan — the error side never
    # recomputes the valid plan (the naive "input anti-join valid" costs a
    # second full evaluation + a 7-column shuffle at corpus scale).
    focus_any = (
        focus.select(
            F.col("doc_id").alias("f_doc"), F.col("focus_node").alias("f_node")
        )
        .distinct()
        .withColumn("_targeted", F.lit(True))
    )
    if strict:
        # strict: one marker join — every triple of a violated focus node
        # drops, regardless of which constraint fired or whether the
        # violation implicates an existing value
        bad_focus = (
            violations.select(
                F.col("doc_id").alias("b_doc"),
                F.col("focus_node").alias("b_subj"),
            )
            .distinct()
            .withColumn("_b_hit", F.lit(True))
        )
        classified = (
            triples.join(
                focus_any,
                (triples.doc_id == focus_any.f_doc)
                & (triples.subj == focus_any.f_node),
                "left",
            )
            .join(
                bad_focus,
                (triples.doc_id == bad_focus.b_doc)
                & (triples.subj == bad_focus.b_subj),
                "left",
            )
            .withColumn(
                "_valid",
                F.coalesce("_targeted", F.lit(False)) & F.col("_b_hit").isNull(),
            )
        )
        valid = classified.filter(F.col("_valid")).select(*TRIPLE_KEY)
        error = classified.filter(~F.col("_valid")).select(*TRIPLE_KEY)
        return valid, error

    drop_value = (
        violations.filter(F.col("constraint_component").isin(_VALUE_LEVEL))
        .select(
            F.col("doc_id").alias("v_doc"),
            F.col("focus_node").alias("v_subj"),
            F.col("result_path").alias("v_pred"),
            F.col("value").alias("v_obj"),
        )
        .distinct()
        .withColumn("_v_hit", F.lit(True))
    )
    drop_path = (
        violations.filter(F.col("constraint_component").isin(_PATH_LEVEL))
        .select(
            F.col("doc_id").alias("p_doc"),
            F.col("focus_node").alias("p_subj"),
            F.col("result_path").alias("p_pred"),
        )
        .distinct()
        .withColumn("_p_hit", F.lit(True))
    )

    classified = (
        triples.join(
            focus_any,
            (triples.doc_id == focus_any.f_doc) & (triples.subj == focus_any.f_node),
            "left",
        )
        .join(
            drop_value,
            (triples.doc_id == drop_value.v_doc)
            & (triples.subj == drop_value.v_subj)
            & (triples.pred == drop_value.v_pred)
            & (triples.obj_value == drop_value.v_obj),
            "left",
        )
        .join(
            drop_path,
            (triples.doc_id == drop_path.p_doc)
            & (triples.subj == drop_path.p_subj)
            & (triples.pred == drop_path.p_pred),
            "left",
        )
        .withColumn(
            "_valid",
            F.coalesce("_targeted", F.lit(False))
            & F.col("_v_hit").isNull()
            & F.col("_p_hit").isNull(),
        )
    )
    valid = classified.filter(F.col("_valid")).select(*TRIPLE_KEY)
    error = classified.filter(~F.col("_valid")).select(*TRIPLE_KEY)
    return valid, error


def conformance_verdicts(
    doc_ids: DataFrame, violations: DataFrame,
    parse_errors: DataFrame | None = None,
) -> DataFrame:
    """Per-document rollup (SURVEY §2.4 target-only aggregation):
    (doc_id, n_violations, parse_ok, conforms).

    conforms = NOT EXISTS(violation) AND parsed cleanly — a document the
    reference could not read would fail the whole task
    (`PipelineService.java:46-56`); we degrade per-document but must not
    report it conforming.
    """
    per_doc = violations.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_violations")
    )
    out = (
        doc_ids.select("doc_id").distinct()
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_violations"), F.lit(0)).alias("n_violations"),
        )
    )
    if parse_errors is not None:
        bad = parse_errors.select("doc_id").distinct().withColumn(
            "parse_failed", F.lit(True)
        )
        out = out.join(bad, "doc_id", "left").withColumn(
            "parse_ok", F.coalesce(~F.col("parse_failed"), F.lit(True))
        ).drop("parse_failed")
    else:
        out = out.withColumn("parse_ok", F.lit(True))
    return out.withColumn(
        "conforms", (F.col("n_violations") == 0) & F.col("parse_ok")
    )


def report_triples(violations: DataFrame) -> DataFrame:
    """Validation-report triples per SHACL vocabulary, blank nodes
    skolemized deterministically (`FilteringService.java:78`; SURVEY §2.6).

    Output: same 7-column triple shape as the data tables, one
    sh:ValidationResult node per violation + one sh:ValidationReport node
    per non-conforming doc.
    """
    xsd_bool = "http://www.w3.org/2001/XMLSchema#boolean"
    rdf_type = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

    # doc_id is binary pipeline-internally; skolem ids embed the HEX form
    # so result/report IRIs are byte-identical to the pre-binary engine
    doc_hex = F.lower(F.hex("doc_id"))
    v = violations.withColumn(
        "result_node",
        F.concat(
            F.lit("urn:skolem:result:"),
            F.sha2(
                F.concat_ws(
                    "\x1f", doc_hex, F.col("focus_node"),
                    F.coalesce("result_path", F.lit("")),
                    "constraint_component",
                    F.coalesce("value", F.lit("")),
                    F.coalesce("message", F.lit("")),
                ),
                256,
            ),
        ),
    ).withColumn(
        "report_node",
        F.concat(F.lit("urn:skolem:report:"), doc_hex),
    )

    def t(subj, pred, obj, kind, dtype=None):
        def c(x):
            if x is None:
                return F.lit(None).cast("string")
            return (F.lit(x) if isinstance(x, str) else x).cast("string")

        return F.struct(
            c(subj).alias("subj"),
            c(pred).alias("pred"),
            c(obj).alias("obj_value"),
            c(kind).alias("obj_kind"),
            c(dtype).alias("obj_datatype"),
            F.lit(None).cast("string").alias("obj_lang"),
        )

    rn, pn = F.col("result_node"), F.col("report_node")
    # all per-violation triples in one array -> one scan + one explode
    # (the naive per-triple-pattern union re-scans violations 9x)
    arr = F.array(
        t(pn, SH + "result", rn, "iri"),
        t(rn, rdf_type, SH + "ValidationResult", "iri"),
        t(rn, SH + "focusNode", F.col("focus_node"), "iri"),
        t(rn, SH + "resultSeverity", F.col("severity"), "iri"),
        t(rn, SH + "sourceConstraintComponent", F.col("constraint_component"), "iri"),
        # Jena names the PROPERTY shape for property-level violations;
        # node-level (closed) violations carry the node shape
        t(rn, SH + "sourceShape",
          F.coalesce(F.col("source_shape"), F.col("shape")), "iri"),
        t(rn, SH + "resultMessage", F.col("message"), "literal",
          "http://www.w3.org/2001/XMLSchema#string"),
        F.when(
            F.col("result_path").isNotNull(),
            t(rn, SH + "resultPath", F.col("result_path"), "iri"),
        ),
        F.when(
            F.col("value").isNotNull(),
            t(rn, SH + "value", F.col("value"),
              F.coalesce(F.col("value_kind"), F.lit("literal"))),
        ),
    )
    results = v.select(
        "doc_id",
        F.explode(F.filter(arr, lambda x: x.isNotNull())).alias("t"),
    ).select("doc_id", "t.*")

    headers = (
        v.select("doc_id", "report_node").distinct()
        .select(
            "doc_id",
            F.explode(F.array(
                t(F.col("report_node"), rdf_type, SH + "ValidationReport", "iri"),
                t(F.col("report_node"), SH + "conforms", "false", "literal", xsd_bool),
            )).alias("t"),
        )
        .select("doc_id", "t.*")
    )
    return results.unionByName(headers)


def nt_lines(triples: DataFrame) -> DataFrame:
    """N-Triples serialization as a single `line` column — the S4 sink
    (`TaskService.java:229`, `ModelUtils.toFile(..., RDFLanguages.NT)`)
    expressed as Catalyst string ops + a text write."""
    # N-Triples literal escaping. NB Java replacement-string semantics:
    # emitting one literal backslash needs `\\\\` in the replacement, and
    # a plain `\"` replacement emits just `"` (that bug shipped briefly —
    # caught by the hypothesis round-trip test).
    esc = F.col("obj_value")
    for pat, rep in (
        (r"\\", r"\\\\"),   # backslash first
        ('"', r'\\"'),
        ("\n", r"\\n"),
        ("\r", r"\\r"),
        ("\t", r"\\t"),
    ):
        esc = F.regexp_replace(esc, pat, rep)
    obj = (
        F.when(F.col("obj_kind") == "iri",
               F.concat(F.lit("<"), F.col("obj_value"), F.lit(">")))
        .when(F.col("obj_kind") == "bnode", F.col("obj_value"))
        .when(
            F.col("obj_lang").isNotNull(),
            F.concat(F.lit('"'), esc, F.lit('"@'), F.col("obj_lang")),
        )
        .when(
            F.col("obj_datatype").isNotNull()
            & (F.col("obj_datatype") != "http://www.w3.org/2001/XMLSchema#string"),
            F.concat(F.lit('"'), esc, F.lit('"^^<'), F.col("obj_datatype"), F.lit(">")),
        )
        .otherwise(F.concat(F.lit('"'), esc, F.lit('"')))
    )
    subj = F.when(
        F.col("subj").startswith("_:"), F.col("subj")
    ).otherwise(F.concat(F.lit("<"), F.col("subj"), F.lit(">")))
    return triples.select(
        "doc_id",
        F.concat_ws(
            " ", subj, F.concat(F.lit("<"), F.col("pred"), F.lit(">")), obj, F.lit(".")
        ).alias("line"),
    )
