"""IRI normalization (triple-extraction cleanup, SURVEY.md §7 stage 4).

Pure Catalyst string expressions — applied to subj/pred/obj_value IRI
columns before linking so trivially-different spellings of one IRI
(scheme/host case, default ports, trailing slash, /./ segments) collapse
without any linking machinery.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SCHEME_HOST = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)"


def normalize_iri(col: Column) -> Column:
    """Lowercase scheme+authority, drop default ports (scheme-matched:
    :80 only for http, :443 only for https — http://h:443/x is a REAL
    non-default port and must NOT merge with http://h/x during linking),
    collapse /./ segments, strip a single trailing slash after a
    non-empty path (the root slash http://h/ is kept)."""
    # Catalyst regexp_replace has no replace callback, so lowercase the
    # scheme://authority prefix by splitting it off explicitly:
    prefix = F.regexp_extract(col, _SCHEME_HOST, 0)
    rest = F.substring(col, F.length(prefix) + 1, F.lit(1 << 30))
    lowered = F.concat(F.lower(prefix), rest)
    c = F.when(prefix != "", lowered).otherwise(col)
    c = F.regexp_replace(c, r"^(http://[^/?#:]*):80(/|$)", "$1$2")
    c = F.regexp_replace(c, r"^(https://[^/?#:]*):443(/|$)", "$1$2")
    c = F.regexp_replace(c, r"/\./", "/")
    # trailing slash: only when a path segment precedes it, so the
    # authority-root form `scheme://host/` survives
    c = F.regexp_replace(c, r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*/.+?)/$", "$1")
    # non-hierarchical scheme IRIs (urn:a/) — [^/?#] keeps '//' authorities
    # out of this branch so scheme://host/ roots stay untouched above
    c = F.regexp_replace(c, r"^([A-Za-z][A-Za-z0-9+.-]*:[^/?#](?:.*[^/])?)/$", "$1")
    # relative IRIs, incl. multi-segment a/b/ (ADVICE r2: the r2 narrowing
    # silently un-merged these from their slash-less forms during linking)
    c = F.regexp_replace(c, r"^([^:?#]*[^/])/$", "$1")
    return c


def normalize_triples(triples: DataFrame) -> DataFrame:
    """Apply IRI normalization to subj/pred and IRI-kind objects."""
    return triples.withColumn("subj", normalize_iri(F.col("subj"))).withColumn(
        "pred", normalize_iri(F.col("pred"))
    ).withColumn(
        "obj_value",
        F.when(
            F.col("obj_kind") == "iri", normalize_iri(F.col("obj_value"))
        ).otherwise(F.col("obj_value")),
    )
