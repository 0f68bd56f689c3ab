"""End-to-end test of the sparql_job spark-submit entrypoint (in-process:
SparkSession.builder.getOrCreate attaches to the test session)."""

from __future__ import annotations

import json

from jobs.sparql_job import main as sparql_main


def _run(capsys, *argv) -> tuple[dict, list[dict]]:
    assert sparql_main(list(argv)) == 0
    out = capsys.readouterr().out.splitlines()
    rows = [json.loads(l) for l in out if l.startswith("{")]
    summary = next(
        r for r in reversed(rows)
        if str(r.get("mode", "")).startswith("sparql")
    )
    return summary, [r for r in rows if r is not summary]


def test_sparql_job_inline_query(spark, capsys):
    summary, rows = _run(
        capsys,
        "--sources", "synthetic:40",
        "--query",
        "PREFIX ex: <http://example.com/ns#> "
        "SELECT ?p ?ssn WHERE { GRAPH ?g { ?p a ex:Person ; ex:ssn ?ssn } } "
        "ORDER BY ?p LIMIT 5",
        "--show", "5",
    )
    # 40 docs: 4 mode-8 docs contribute a second ssn row, LIMIT caps at 5
    assert summary["solutions"] == 5
    assert summary["parse_errors"] == 0
    assert len(rows) == 5
    assert set(rows[0]) == {"p", "ssn"}


def test_sparql_job_file_query_and_parquet_output(spark, tmp_path, capsys):
    qf = tmp_path / "graph_sizes.sparql"
    qf.write_text(
        "SELECT ?g (COUNT(*) AS ?n) WHERE { GRAPH ?g { ?s ?p ?o } } "
        "GROUP BY ?g"
    )
    out = str(tmp_path / "answers")
    summary, _ = _run(
        capsys,
        "--sources", "synthetic:30",
        "--query", str(qf),
        "--output", out,
    )
    assert summary["solutions"] == 30
    df = spark.read.parquet(out)
    assert df.columns == ["g", "n"]
    # closed form: per-doc triples 2/3/4 for base/mode-8/mode-9 docs
    assert df.agg({"n": "sum"}).collect()[0][0] == 30 * 2 + 3 + 3 * 2


def test_sparql_job_canonical_mode(spark, capsys):
    summary, rows = _run(
        capsys,
        "--sources", "synthetic:30",
        "--canonical",
        "--query",
        "PREFIX ex: <http://example.com/ns#> "
        "SELECT ?s ?ssn WHERE { ?s a ex:Person ; ex:ssn ?ssn }",
        "--show", "40",
    )
    assert summary["mode"] == "sparql-canonical"
    assert summary["parse_errors"] == 0
    # 21 conforming docs (modes 0-6, 3 docs each) survive the conformance
    # gate; canonicalization dedups identical (s,p,o) rows, and every
    # conforming person keeps exactly one ssn triple
    assert summary["solutions"] == 21


def test_sparql_job_canonical_rejects_graph_queries_fast(spark, capsys):
    import pytest as _pytest

    from harvesting_validator_spark.sparql import SparqlUnsupported

    with _pytest.raises(SparqlUnsupported, match="GRAPH"):
        sparql_main([
            "--sources", "synthetic:10", "--canonical",
            "--query", "SELECT ?s WHERE { GRAPH ?g { ?s ?p ?o } }",
        ])


def test_sparql_job_flag_validation(capsys):
    import pytest as _pytest

    with _pytest.raises(SystemExit):
        sparql_main([
            "--sources", "synthetic:10",
            "--query", "ASK { ?s ?p ?o }",
            "--shapes", "/tmp/nope.ttl",
        ])
    capsys.readouterr()


def test_sparql_job_update_mode(spark, tmp_path, capsys):
    # the redaction shape: delete the mode-7 corrupted ssns, stamp each
    # touched person, mint an external audit graph — then the UPDATED
    # store (not a solution print) is the job's parquet deliverable
    out = str(tmp_path / "updated")
    summary, _ = _run(
        capsys,
        "--sources", "synthetic:40",
        "--query",
        "PREFIX ex: <http://example.com/ns#> "
        'DELETE { GRAPH ?g { ?p ex:ssn ?ssn } } '
        'INSERT { GRAPH ?g { ?p ex:redacted "yes" } } '
        'WHERE { GRAPH ?g { ?p ex:ssn ?ssn . FILTER regex(?ssn, "X$") } } ; '
        "INSERT DATA { GRAPH <http://g/audit> "
        '{ <http://g/log> ex:policy "redact" } }',
        "--update",
        "--output", out,
    )
    # 40 docs: 2/3/4 triples for base/mode-8/mode-9 = 80+4+8 = 92 quads;
    # redaction is count-neutral (4 deletes, 4 inserts); audit adds 1
    assert summary["mode"] == "sparql-update"
    assert summary["quads"] == 92 + 1
    df = spark.read.parquet(out)
    # doc ids re-hexed at the job edge, like every other sink
    assert df.schema["doc_id"].dataType.simpleString() == "string"
    assert df.filter(df.obj_value == "yes").count() == 4
    assert not [r for r in df.collect() if r.obj_value.endswith("X")]


def test_sparql_job_update_flag_validation(capsys):
    import pytest as _pytest

    # --update without --output: the updated store has nowhere to go
    with _pytest.raises(SystemExit):
        sparql_main([
            "--sources", "synthetic:10",
            "--query", 'INSERT DATA { GRAPH <http://g> { <s:a> <p:b> "v" } }',
            "--update",
        ])
    capsys.readouterr()
    # --update + --canonical: the canonical graph has no named graphs
    with _pytest.raises(SystemExit):
        sparql_main([
            "--sources", "synthetic:10",
            "--query", 'INSERT DATA { GRAPH <http://g> { <s:a> <p:b> "v" } }',
            "--update", "--canonical",
            "--output", "/tmp/nope",
        ])
    capsys.readouterr()
