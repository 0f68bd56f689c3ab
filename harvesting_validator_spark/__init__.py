"""harvesting_validator_spark — a from-scratch PySpark-native KG-construction
pipeline with the capabilities of lblod/harvesting-validator.

Reference behavior is pinned in SURVEY.md (file:line cites into
/root/reference). Nothing here is a port: the reference is a Java/Spring
microservice looping over Jena models; this package re-expresses the same
computations (RDF parse, SHACL validate, valid/error split, report
emission, lineage) as declarative DataFrame plans plus Arrow-batched
kernels, extended with entity linking / canonicalization / dedup for the
KG-construction north star.
"""

__version__ = "0.1.0"
