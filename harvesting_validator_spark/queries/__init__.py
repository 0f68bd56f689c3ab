"""Driver-contract query registry.

Each submodule exposes ``QUERIES`` (name -> callable(spark, sf_dir) ->
DataFrame) and ``ORACLES`` (name -> DuckDB ANSI-SQL string over the
pre-registered parquet views). ``__spark_entry__.py`` re-exports the
merged registries. Names without an oracle entry get the driver's weaker
rows-only check (genuinely non-SQL-expressible ops only).

Every query here maps back to an operator row in SURVEY.md §2 or to the
training-data-pipeline extensions (dedup / similarity / text analysis);
the mapping is cited in each builder's docstring.
"""

from __future__ import annotations

from harvesting_validator_spark.queries import (
    corpusops,
    dedup,
    eventops,
    graphops,
    kg,
    mm,
    relational,
    similarity,
    sketches,
    sparqlq,
    textops,
    textprep,
)

# Registration order is DRIVER-VISIBLE: the correctness driver checks the
# first ~50 registered queries (registration order) out of the full
# registry. The flagship reference-parity families (kg, mm) stay PINNED
# first; the remaining slots ROTATE so every family earns a fresh driver
# row within two rounds (VERDICT r4 #1, executed again per VERDICT r5 #1).
# Round 6 window (exactly 50): kg(17) + mm(4) pinned, then the families
# whose internals changed this optimization round or that have NEVER had
# a driver row — all 14 sparqlq oracles (13 were tail-only in r5: UPDATE/
# DESCRIBE/sub-SELECT/closures/hash builtins/NPS), the full dedup family
# (lsh_verified_pairs was rewritten on token-set classes this round),
# graphops (pagerank_bipartite was rewritten), and the three r5-new
# queries that landed after slot 50: json_props_rollup,
# daily_rolling_events, doc_length_histogram. Tail this round: corpusops/
# textops/relational (r5-green in CORRECTNESS_r05.json), similarity +
# remaining eventops/textprep (r4-green), and the rows-only sketches
# (accuracy-bound tests; a driver row adds nothing) — all additionally
# gated locally by tests/test_oracle_tail.py (driver-fetch mimic), so
# "outside the driver window" never means "unchecked".
_BY_NAME_QUERIES = {}
_BY_NAME_ORACLES = {}
for _m in (
    kg,
    mm,
    corpusops,
    textops,
    relational,
    sparqlq,
    sketches,
    similarity,
    dedup,
    graphops,
    eventops,
    textprep,
):
    overlap = set(_BY_NAME_QUERIES) & set(_m.QUERIES)
    if overlap:
        raise ValueError(f"duplicate query names: {overlap}")
    _BY_NAME_QUERIES.update(_m.QUERIES)
    _BY_NAME_ORACLES.update(_m.ORACLES)

_missing = set(_BY_NAME_ORACLES) - set(_BY_NAME_QUERIES)
if _missing:
    raise ValueError(f"oracle without query: {_missing}")

_R6_WINDOW = (
    list(kg.QUERIES)
    + list(mm.QUERIES)
    + list(sparqlq.QUERIES)
    + list(dedup.QUERIES)
    + list(graphops.QUERIES)
    + ["json_props_rollup", "daily_rolling_events", "doc_length_histogram"]
)
if len(_R6_WINDOW) != 50:  # driver-visible guard — must survive python -O
    raise ValueError(f"driver window is {len(_R6_WINDOW)} slots, want 50")

ALL_QUERIES = {n: _BY_NAME_QUERIES[n] for n in _R6_WINDOW}
ALL_QUERIES.update(
    {n: q for n, q in _BY_NAME_QUERIES.items() if n not in ALL_QUERIES}
)
ALL_ORACLES = {
    n: _BY_NAME_ORACLES[n] for n in ALL_QUERIES if n in _BY_NAME_ORACLES
}
