"""Driver-checked queries exercising the SPARQL subset engine.

Reference analog: the reference issues all of its reads as SPARQL text
(`src/main/resources/sparql/*.sparql`; SURVEY.md §2.9). `sparql.py`
compiles that surface to DataFrame plans; these registry entries run
REAL SPARQL strings through the full stack — tokenizer -> parser ->
Catalyst plan — over the same cached validation-run triples the kg_*
queries share (one parse per (session, sf_dir)), with closed-form DuckDB
oracles derived from the synthetic corpus index (sources/synthetic.py:
mode = i%10; per-doc triples 2/3/4 for base/mode-8/mode-9 docs).

The queries cover the engine's feature matrix end to end:
GRAPH-var scoping + `a` + predicate-object lists + OPTIONAL + FILTER
regex (roster); GROUP BY + COUNT(*) (graph sizes); DISTINCT + ORDER BY
over an all-var pattern (predicates); ASK + isIRI (company ask);
SPARQL over the CONSTRUCTED canonical graph (kg entities); CONSTRUCT
derivation (employers); FILTER NOT EXISTS + MINUS negation (negation
roster); closure paths ex:broader+ via the per-predicate reachability
fixpoint (reachable rollup); HAVING + GROUP_CONCAT + SAMPLE (predicate
digest); nested `{ SELECT ... }` aggregation with implicit per-graph
scoping (multi-ssn audit). A hash match certifies parser, compiler, and
term semantics in one go.
"""

from __future__ import annotations

from harvesting_validator_spark.queries.kg import _ORACLE_BASE, _run
from harvesting_validator_spark.sparql import sparql_select

EX = "http://example.com/ns#"


def _triples(spark, sf_dir):
    """The cached validation run's triples frame (binary doc_id,
    repartitioned by doc_id — GRAPH-scoped BGP joins ride that one
    exchange, plans/pipeline.py)."""
    return _run(spark, sf_dir).triples


# --- full roster: BGP + OPTIONAL + FILTER regex + GRAPH var -----------------
_Q_ROSTER = r"""
PREFIX ex: <http://example.com/ns#>
SELECT ?g ?person ?ssn ?company WHERE {
  GRAPH ?g {
    ?person a ex:Person ;
            ex:ssn ?ssn .
    OPTIONAL { ?person ex:worksFor ?company }
    FILTER regex(?ssn, "^\\d{3}-")
  }
}
"""


def q_sparql_person_roster(spark, sf_dir):
    return sparql_select(_triples(spark, sf_dir), _Q_ROSTER)


# every ssn the corpus mints starts with 3 digits (the mode-7 corruption
# appends an X), so the regex keeps all rows; mode-8 docs contribute a
# second (ssn2) row; only mode-9 docs have a worksFor object
O_ROSTER = (
    _ORACLE_BASE
    + """
, base AS (
  SELECT i, doc_id, mode,
         printf('%03d-%02d-%04d', i % 1000, (i*7) % 100, (i*13) % 10000) AS ssn_ok,
         printf('%03d-%02d-%04d', (i+1) % 1000, (i*11) % 100, (i*17) % 10000) AS ssn2
  FROM idx
)
SELECT doc_id AS g,
       'http://example.com/ns#P' || i AS person,
       CASE WHEN mode = 7 THEN ssn_ok || 'X' ELSE ssn_ok END AS ssn,
       CASE WHEN mode = 9 THEN 'http://example.com/ns#NoSuchCompany'
            ELSE CAST(NULL AS VARCHAR) END AS company
FROM base
UNION ALL
SELECT doc_id, 'http://example.com/ns#P' || i, ssn2, CAST(NULL AS VARCHAR)
FROM base WHERE mode = 8
"""
)


# --- per-graph triple counts: GRAPH var + GROUP BY + COUNT(*) ---------------
_Q_GRAPH_SIZES = """
SELECT ?g (COUNT(*) AS ?n_triples) WHERE {
  GRAPH ?g { ?s ?p ?o }
} GROUP BY ?g
"""


def q_sparql_graph_sizes(spark, sf_dir):
    return sparql_select(_triples(spark, sf_dir), _Q_GRAPH_SIZES)


O_GRAPH_SIZES = (
    _ORACLE_BASE
    + """
SELECT doc_id AS g,
       CAST(CASE mode WHEN 8 THEN 3 WHEN 9 THEN 4 ELSE 2 END AS BIGINT)
         AS n_triples
FROM idx
"""
)


# --- distinct predicates: all-var BGP + DISTINCT + ORDER BY -----------------
_Q_DISTINCT_PREDS = """
SELECT DISTINCT ?p WHERE { GRAPH ?g { ?s ?p ?o } } ORDER BY ?p
"""


def q_sparql_distinct_preds(spark, sf_dir):
    return sparql_select(_triples(spark, sf_dir), _Q_DISTINCT_PREDS)


# hobby/worksFor appear iff some doc has mode 9, i.e. n_docs >= 10
O_DISTINCT_PREDS = """
SELECT p FROM (VALUES
  ('http://example.com/ns#hobby'),
  ('http://example.com/ns#ssn'),
  ('http://example.com/ns#worksFor'),
  ('http://www.w3.org/1999/02/22-rdf-syntax-ns#type')) t(p)
WHERE (SELECT count(*) FROM documents) >= 10
   OR p IN ('http://example.com/ns#ssn',
            'http://www.w3.org/1999/02/22-rdf-syntax-ns#type')
ORDER BY p
"""


# --- ASK + isIRI (is-task.sparql analog: existence probe) -------------------
_Q_COMPANY_ASK = """
PREFIX ex: <http://example.com/ns#>
ASK { GRAPH ?g { ?s ex:worksFor ?c . FILTER isIRI(?c) } }
"""


def q_sparql_company_ask(spark, sf_dir):
    return sparql_select(_triples(spark, sf_dir), _Q_COMPANY_ASK)


O_COMPANY_ASK = """
SELECT CAST((SELECT count(*) FROM documents) >= 10 AS BOOLEAN) AS ask
"""


# --- SPARQL over the CONSTRUCTED KG (the full user story) -------------------
# The canonical graph is the engine's OUTPUT (entity linking + union-find
# + (s,p,o) dedup, kg/graph.py); querying it with SPARQL text closes the
# loop a reference user runs daily: harvest -> validate -> construct ->
# query. No GRAPH clause — the canonical graph is the default graph
# (provenance intentionally dropped by the dedup, north_rule semantics).
_Q_KG_ENTITIES = """
PREFIX ex: <http://example.com/ns#>
SELECT ?e ?name WHERE {
  ?e a ex:Person ;
     ex:name ?name ;
     ex:ssn ?ssn .
  FILTER strstarts(?ssn, "0")
}
"""


def q_sparql_kg_entities(spark, sf_dir):
    from harvesting_validator_spark.queries.kg import _kg_run

    return sparql_select(_kg_run(spark, sf_dir).graph, _Q_KG_ENTITIES)


# closed form: K = n//10 canonical entities E%06d(r), ssn(r) starts with
# '0' iff r % 1000 < 100 (the %03d zero-padding)
O_KG_ENTITIES = """
WITH k AS (SELECT count(*) // 10 AS k FROM documents),
grp AS (SELECT DISTINCT doc_id % (SELECT k FROM k) AS r FROM documents)
SELECT printf('http://example.com/ns#E%06d', r) AS e,
       'Person ' || r || ' Name' AS name
FROM grp WHERE r % 1000 < 100
"""


# --- CONSTRUCT: rule-based triple derivation --------------------------------
# every mode-9 doc asserts (Pi worksFor NoSuchCompany); the rule derives
# the inverse edge and an Employee typing — the KG-construction shape
# (derive-then-materialize) as one SPARQL string
_Q_CONSTRUCT_EMPLOYERS = """
PREFIX ex: <http://example.com/ns#>
CONSTRUCT { ?c ex:employs ?p . ?p a ex:Employee }
WHERE { GRAPH ?g { ?p ex:worksFor ?c } }
"""


def q_sparql_construct_employers(spark, sf_dir):
    return sparql_select(_triples(spark, sf_dir), _Q_CONSTRUCT_EMPLOYERS)


O_CONSTRUCT_EMPLOYERS = (
    _ORACLE_BASE
    + """
SELECT 'http://example.com/ns#NoSuchCompany' AS subj,
       'http://example.com/ns#employs' AS pred,
       'http://example.com/ns#P' || i AS obj_value,
       'iri' AS obj_kind,
       CAST(NULL AS VARCHAR) AS obj_datatype,
       CAST(NULL AS VARCHAR) AS obj_lang
FROM idx WHERE mode = 9
UNION ALL
SELECT 'http://example.com/ns#P' || i,
       'http://www.w3.org/1999/02/22-rdf-syntax-ns#type',
       'http://example.com/ns#Employee', 'iri',
       CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
FROM idx WHERE mode = 9
"""
)


# --- negation: FILTER NOT EXISTS + MINUS (r5 wave 3) ------------------------
# persons with NO employer (NOT EXISTS probes absence per document),
# excluding persons whose ssn was corrupted (MINUS removes solutions
# compatible on the shared ?g/?p domain) — mode 9 docs have worksFor,
# mode 7 docs have the trailing-X ssn, so the closed form is
# mode NOT IN (7, 9)
_Q_NEGATION_ROSTER = """
PREFIX ex: <http://example.com/ns#>
SELECT ?g ?p WHERE {
  GRAPH ?g {
    ?p a ex:Person .
    FILTER NOT EXISTS { ?p ex:worksFor ?c . }
  }
  MINUS { GRAPH ?g { ?p ex:ssn ?s . FILTER regex(?s, "X$") } }
}
"""


def q_sparql_negation_roster(spark, sf_dir):
    return sparql_select(_triples(spark, sf_dir), _Q_NEGATION_ROSTER)


O_NEGATION_ROSTER = (
    _ORACLE_BASE
    + """
SELECT doc_id AS g,
       'http://example.com/ns#P' || i AS p
FROM idx WHERE mode NOT IN (7, 9)
"""
)


# --- closure paths in query position (r5 wave 3) ----------------------------
# per-doc ancestor counts over ex:broader+ on the category-hierarchy
# corpus (the one with real multi-hop chains AND a cycle mode, shared
# with kg_recursive_verdicts — same cached parse). Closed form by
# i%6: chain of 2 -> 2 ancestors, mode 1 chain of 3 -> 3, mode 2 has no
# broader edge (group absent), mode 5's 2-cycle reaches {B, K} -> 2.
_Q_REACHABLE = """
PREFIX ex: <http://example.com/ns#>
SELECT ?g (COUNT(?anc) AS ?n_ancestors) WHERE {
  GRAPH ?g { ?k a ex:Category . ?k ex:broader+ ?anc . }
} GROUP BY ?g
"""


def q_sparql_reachable_rollup(spark, sf_dir):
    # r6: triples-only accessor — this query never touches the validation
    # branch, so the REC-profile SHACL closure run is not materialized
    from harvesting_validator_spark.queries.kg import _rec_triples

    return sparql_select(_rec_triples(spark, sf_dir), _Q_REACHABLE)


O_REACHABLE = """
WITH idx AS (
  SELECT doc_id AS i,
         doc_id % 6 AS mode,
         sha256(
           printf('repo%d', doc_id % 16) || chr(31) ||
           ('data/recpaths/cat' || doc_id || '.ttl') || chr(31) ||
           substr(sha256(printf('commit%d', doc_id)), 1, 40)
         ) AS doc_id
  FROM documents
)
SELECT doc_id AS g,
       CAST(CASE mode WHEN 1 THEN 3 ELSE 2 END AS BIGINT) AS n_ancestors
FROM idx WHERE mode != 2
"""


# --- HAVING + GROUP_CONCAT + SAMPLE (r5 wave 4) ------------------------------
# graphs with more than two triples (modes 8 and 9 only), with their
# deduplicated predicate digest and a deterministic witness subject.
# Exercises the grouped-filter path (HAVING reusing the projected
# COUNT(*) column — one shuffle, no doubled aggregate), GROUP_CONCAT's
# pinned lexical-ascending order (the spec leaves order undefined; the
# engine pins it exactly so queries like this one are oracle-able), and
# SAMPLE's deterministic lexical-min choice.
_Q_PREDICATE_DIGEST = """
SELECT ?g (COUNT(*) AS ?n) (GROUP_CONCAT(DISTINCT ?p) AS ?preds)
       (SAMPLE(?s) AS ?witness)
WHERE { GRAPH ?g { ?s ?p ?o } }
GROUP BY ?g
HAVING (COUNT(*) > 2)
"""


def q_sparql_predicate_digest(spark, sf_dir):
    return sparql_select(_triples(spark, sf_dir), _Q_PREDICATE_DIGEST)


O_PREDICATE_DIGEST = (
    _ORACLE_BASE
    + """
SELECT doc_id AS g,
       CAST(CASE mode WHEN 8 THEN 3 ELSE 4 END AS BIGINT) AS n,
       CASE mode
         WHEN 8 THEN 'http://example.com/ns#ssn'
                  || ' http://www.w3.org/1999/02/22-rdf-syntax-ns#type'
         ELSE 'http://example.com/ns#hobby'
           || ' http://example.com/ns#ssn'
           || ' http://example.com/ns#worksFor'
           || ' http://www.w3.org/1999/02/22-rdf-syntax-ns#type'
       END AS preds,
       'http://example.com/ns#P' || i AS witness
FROM idx WHERE mode IN (8, 9)
"""
)


# --- sub-SELECT (r5 wave 5) ---------------------------------------------------
# persons asserting MORE THAN ONE ssn, found with a nested aggregate:
# the sub-select under GRAPH ?g implicitly groups per active graph
# (SPARQL 13.3 — also the mechanism scoping sh:sparql sub-selects per
# document), its projected ?s/?n join the enclosing typing pattern, and
# the outer FILTER reads the aggregate. Closed form: only mode-8 docs
# mint a second ssn triple on the same person, so n == 2 exactly there.
_Q_MULTI_SSN = """
PREFIX ex: <http://example.com/ns#>
SELECT ?g ?s ?n WHERE {
  GRAPH ?g {
    { SELECT ?s (COUNT(?v) AS ?n) WHERE { ?s ex:ssn ?v } GROUP BY ?s }
    ?s a ex:Person .
  }
  FILTER(?n >= 2)
}
"""


def q_sparql_multi_ssn_audit(spark, sf_dir):
    return sparql_select(_triples(spark, sf_dir), _Q_MULTI_SSN)


O_MULTI_SSN = (
    _ORACLE_BASE
    + """
SELECT doc_id AS g,
       'http://example.com/ns#P' || i AS s,
       CAST(2 AS BIGINT) AS n
FROM idx WHERE mode = 8
"""
)


# --- DESCRIBE (r5 wave 5) -----------------------------------------------------
# concise bounded description of every employed person: the WHERE binds
# the targets, the description emits their full subject rows (the
# corpus has no blank-node structures, so the CBD closure contributes
# nothing — tests/test_sparql.py pins the transitive bnode case).
# Closed form: mode-9 docs are exactly the employed persons, 4 triples
# each (type, ssn, hobby, worksFor).
_Q_DESCRIBE_EMPLOYED = """
PREFIX ex: <http://example.com/ns#>
DESCRIBE ?p WHERE { ?p ex:worksFor ?c }
"""


def q_sparql_describe_employed(spark, sf_dir):
    return sparql_select(_triples(spark, sf_dir), _Q_DESCRIBE_EMPLOYED)


O_DESCRIBE_EMPLOYED = (
    _ORACLE_BASE
    + """
, m9 AS (
  SELECT i,
         printf('%03d-%02d-%04d', i % 1000, (i*7) % 100, (i*13) % 10000)
           AS ssn_ok
  FROM idx WHERE mode = 9
)
SELECT 'http://example.com/ns#P' || i AS subj,
       'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' AS pred,
       'http://example.com/ns#Person' AS obj_value, 'iri' AS obj_kind,
       CAST(NULL AS VARCHAR) AS obj_datatype,
       CAST(NULL AS VARCHAR) AS obj_lang
FROM m9
UNION ALL
SELECT 'http://example.com/ns#P' || i, 'http://example.com/ns#ssn',
       ssn_ok, 'literal', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
FROM m9
UNION ALL
SELECT 'http://example.com/ns#P' || i, 'http://example.com/ns#hobby',
       'x', 'literal', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
FROM m9
UNION ALL
SELECT 'http://example.com/ns#P' || i, 'http://example.com/ns#worksFor',
       'http://example.com/ns#NoSuchCompany', 'iri',
       CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
FROM m9
"""
)


# --- SPARQL Update (r5 wave 6) ------------------------------------------------
# the reference's write surface (update-task-status / append-task-* /
# write-ttl-file / insert-data, SparqlQueryLoad.java) as a driver-checked
# number: a DELETE/INSERT WHERE redaction pass over the corpus (mode-7
# docs carry the corrupted trailing-X ssn) chained with an INSERT DATA
# audit stamp into an external sha256-named graph, then a per-predicate
# rollup of the UPDATED quad frame. The hash match certifies the whole
# update path — parser, pre-state WHERE snapshot, full-quad delete
# anti-join, novelty insert, graph minting — in one go.
_U_REDACT = """
PREFIX ex: <http://example.com/ns#>
DELETE { GRAPH ?g { ?p ex:ssn ?ssn } }
INSERT { GRAPH ?g { ?p ex:redacted "yes" } }
WHERE  { GRAPH ?g { ?p ex:ssn ?ssn . FILTER regex(?ssn, "X$") } }
;
INSERT DATA {
  GRAPH <http://example.com/graphs/audit> {
    <http://example.com/ns#AuditLog> a ex:Audit ;
      ex:policy "ssn-x-redaction"
  }
}
"""


def q_sparql_update_redaction(spark, sf_dir):
    from pyspark.sql import functions as F

    from harvesting_validator_spark.sparql import sparql_update

    out = sparql_update(_triples(spark, sf_dir), _U_REDACT)
    return out.groupBy("pred").agg(
        F.count(F.lit(1)).alias("n_quads"),
        F.countDistinct("doc_id").alias("n_graphs"),
    )


# closed form over the mode counts: every doc has a type row and (unless
# redacted: mode 7) its ssn row(s); mode-8 docs add a second ssn; mode-9
# docs add hobby + worksFor; redaction swaps c7 ssn rows for c7
# ex:redacted rows; the audit stamp adds one type row (its own graph)
# and the policy row
O_UPDATE_REDACTION = (
    _ORACLE_BASE
    + """
, m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN mode = 7 THEN 1 ELSE 0 END) AS BIGINT) AS c7,
         CAST(sum(CASE WHEN mode = 8 THEN 1 ELSE 0 END) AS BIGINT) AS c8,
         CAST(sum(CASE WHEN mode = 9 THEN 1 ELSE 0 END) AS BIGINT) AS c9
  FROM idx
)
SELECT 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' AS pred,
       n + 1 AS n_quads, n + 1 AS n_graphs FROM m
UNION ALL
SELECT 'http://example.com/ns#ssn', n - c7 + c8, n - c7 FROM m
UNION ALL
SELECT 'http://example.com/ns#redacted', c7, c7 FROM m
UNION ALL
SELECT 'http://example.com/ns#hobby', c9, c9 FROM m
UNION ALL
SELECT 'http://example.com/ns#worksFor', c9, c9 FROM m
UNION ALL
SELECT 'http://example.com/ns#policy', 1, 1 FROM m
"""
)



# --- hash builtin end-to-end (r5 wave 7) ---------------------------------------
# BIND(SHA256(...)) through the full stack with a DuckDB sha256 mirror:
# certifies the hash builtins produce byte-identical hex on both engines
# (the same digest family as the engine's deterministic-id rule)
_Q_HASHED_ROSTER = """
PREFIX ex: <http://example.com/ns#>
SELECT ?person ?h WHERE {
  GRAPH ?g {
    ?person a ex:Person ; ex:ssn ?ssn .
    FILTER (!isNumeric(?ssn) && STRLEN(?ssn) >= 11)
    BIND(SHA256(?ssn) AS ?h)
  }
}
"""


def q_sparql_hashed_roster(spark, sf_dir):
    return sparql_select(_triples(spark, sf_dir), _Q_HASHED_ROSTER)


# ssns are never numeric-typed (plain literals) and all spellings are
# >= 11 chars, so the filter keeps every ssn row: one per doc plus the
# mode-8 second ssn, hashed with the corpus spelling (mode-7 keeps its
# trailing X)
O_HASHED_ROSTER = (
    _ORACLE_BASE
    + """
, base AS (
  SELECT i, mode,
         printf('%03d-%02d-%04d', i % 1000, (i*7) % 100, (i*13) % 10000) AS ssn_ok,
         printf('%03d-%02d-%04d', (i+1) % 1000, (i*11) % 100, (i*17) % 10000) AS ssn2
  FROM idx
)
SELECT 'http://example.com/ns#P' || i AS person,
       sha256(CASE WHEN mode = 7 THEN ssn_ok || 'X' ELSE ssn_ok END) AS h
FROM base
UNION ALL
SELECT 'http://example.com/ns#P' || i, sha256(ssn2) FROM base WHERE mode = 8
"""
)



# --- negated property set end-to-end (r5 wave 7) -------------------------------
# GRAPH-scoped !(...) through the full stack: the NPS desugars to a
# fresh-var hop + NOT IN (18.2.2.4) inside the doc-scoped BGP, so the
# hash match certifies both the negation semantics and that the fresh
# path var stays hidden from the projection
_Q_NPS_EDGES = """
PREFIX ex: <http://example.com/ns#>
SELECT ?g ?s ?o WHERE {
  GRAPH ?g { ?s !(ex:ssn|a|ex:hobby) ?o }
}
"""


def q_sparql_nps_edges(spark, sf_dir):
    return sparql_select(_triples(spark, sf_dir), _Q_NPS_EDGES)


# the corpus' only predicates are rdf:type, ex:ssn, ex:hobby, and
# ex:worksFor — negating the first three leaves exactly the mode-9
# worksFor edges
O_NPS_EDGES = (
    _ORACLE_BASE
    + """
SELECT doc_id AS g,
       'http://example.com/ns#P' || i AS s,
       'http://example.com/ns#NoSuchCompany' AS o
FROM idx WHERE mode = 9
"""
)


QUERIES = {
    "sparql_person_roster": q_sparql_person_roster,
    "sparql_graph_sizes": q_sparql_graph_sizes,
    "sparql_distinct_preds": q_sparql_distinct_preds,
    "sparql_company_ask": q_sparql_company_ask,
    "sparql_kg_entities": q_sparql_kg_entities,
    "sparql_construct_employers": q_sparql_construct_employers,
    "sparql_negation_roster": q_sparql_negation_roster,
    "sparql_reachable_rollup": q_sparql_reachable_rollup,
    "sparql_predicate_digest": q_sparql_predicate_digest,
    "sparql_multi_ssn_audit": q_sparql_multi_ssn_audit,
    "sparql_describe_employed": q_sparql_describe_employed,
    "sparql_update_redaction": q_sparql_update_redaction,
    "sparql_hashed_roster": q_sparql_hashed_roster,
    "sparql_nps_edges": q_sparql_nps_edges,
}

ORACLES = {
    "sparql_person_roster": O_ROSTER,
    "sparql_graph_sizes": O_GRAPH_SIZES,
    "sparql_distinct_preds": O_DISTINCT_PREDS,
    "sparql_company_ask": O_COMPANY_ASK,
    "sparql_kg_entities": O_KG_ENTITIES,
    "sparql_construct_employers": O_CONSTRUCT_EMPLOYERS,
    "sparql_negation_roster": O_NEGATION_ROSTER,
    "sparql_reachable_rollup": O_REACHABLE,
    "sparql_predicate_digest": O_PREDICATE_DIGEST,
    "sparql_multi_ssn_audit": O_MULTI_SSN,
    "sparql_describe_employed": O_DESCRIBE_EMPLOYED,
    "sparql_update_redaction": O_UPDATE_REDACTION,
    "sparql_hashed_roster": O_HASHED_ROSTER,
    "sparql_nps_edges": O_NPS_EDGES,
}
