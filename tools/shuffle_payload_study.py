"""Shuffle-payload narrowing study (VERDICT r3 ask #4).

Hypothesis (from the r3 scaling attribution): the validate slice's one
doc_id exchange is memory-bandwidth-bound — executor CPUs stall on the
UnsafeRow memcpy traffic of wide string rows, which is proportional to
the UNCOMPRESSED row width (wire compression doesn't help; the copies
happen before/after the codec). Narrowing the shuffled rows should
therefore lift the 8->32 core scaling on this single-socket box.

Variants, each a fresh-JVM run of the flagship validate slice
(synthesize -> parse -> repartition(doc_id) -> SHACL validate):

* base    — doc_id as the 64-char sha256 hex string (current engine)
* bindoc  — doc_id carried as 32-byte BINARY through parse + exchange +
            validate (hex<->binary is lossless; joins/groupBys key on
            binary identically)
* bindict — bindoc + pred/obj_datatype/obj_kind dictionary-encoded to
            int codes before the exchange (decode map broadcast), the
            full narrowing the ask describes
* edgecode (r5, VERDICT r4 ask #5) — bindoc + pred/obj_datatype as
            xxhash64 LONG codes THROUGH the doc_id exchange, decoded at
            the far edge by ONE broadcast hash join per dim (replacing
            bindict's per-row create_map scan, the measured cause of its
            null). Because validate is served by the single doc_id
            exchange (zero downstream exchanges, plan-guarded), the
            exchange IS the only byte mover — so this variant captures
            the full wire-width benefit of "codes through the whole
            graph"; pushing codes further into the constraint joins
            could only narrow in-memory operator buffers, not shuffles.

Usage: python tools/shuffle_payload_study.py [n_docs] [repeats] [variants,...]
Prints one JSON line per (variant, cores) sample plus a summary.
"""

from __future__ import annotations

import json
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")


def run_once(cores: int, n_docs: int, variant: str) -> dict:
    from pyspark.sql import functions as F

    from harvesting_validator_spark.session import get_spark
    from harvesting_validator_spark.shacl.compile import validate
    from harvesting_validator_spark.shacl.parse import parse_shapes_turtle
    from harvesting_validator_spark.sources.rdf_parse import parse_sources_to_triples
    from harvesting_validator_spark.sources.synthetic import (
        APPLICATION_PROFILE,
        generate_sources,
    )

    spark = get_spark(
        app_name=f"payload-{variant}-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=cores * 2,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )

    def narrow(parsed):
        # post-integration (r4): parse_sources_to_triples already emits
        # BINARY doc_id, so "bindoc" is the identity and "base"
        # reconstructs the old hex-string form for the A/B
        if variant == "base":
            return parsed.withColumn("doc_id", F.lower(F.hex("doc_id")))
        if variant == "bindoc":
            return parsed
        out = parsed
        if variant == "edgecode":
            out = (
                out.withColumn("pred_code", F.xxhash64("pred"))
                .withColumn(
                    "dt_code",
                    F.when(
                        F.col("obj_datatype").isNotNull(),
                        F.xxhash64("obj_datatype"),
                    ),
                )
                .drop("pred", "obj_datatype")
            )
        if variant == "bindict":
            out = (
                out.withColumn(
                    "pred_code", F.xxhash64("pred").cast("bigint")
                )
                .withColumn(
                    "dt_code",
                    F.when(
                        F.col("obj_datatype").isNotNull(),
                        F.xxhash64("obj_datatype"),
                    ),
                )
                .drop("pred", "obj_datatype")
            )
        return out

    def slice_run(sources):
        parsed = parse_sources_to_triples(sources)
        enc = narrow(parsed).repartition("doc_id")
        if variant == "edgecode":
            # decode at the exchange's far edge with ONE broadcast hash
            # join per dim (JVM codegen probe, amortized — not bindict's
            # O(|dict|)-per-row create_map). Dims from a head sample:
            # the synthetic vocabulary is closed; production would add a
            # string fallback column for unseen codes.
            sample = parse_sources_to_triples(generate_sources(spark, 512))
            pred_dim = (
                sample.select(
                    F.xxhash64("pred").alias("pred_code"),
                    F.col("pred"),
                ).distinct()
            )
            dt_dim = (
                sample.filter(F.col("obj_datatype").isNotNull())
                .select(
                    F.xxhash64("obj_datatype").alias("dt_code"),
                    F.col("obj_datatype"),
                ).distinct()
            )
            enc = (
                enc.join(F.broadcast(pred_dim), "pred_code")
                .join(F.broadcast(dt_dim), "dt_code", "left")
                .drop("pred_code", "dt_code")
            )
        if variant == "bindict":
            # decode via tiny broadcast maps built from a corpus sample
            # (the synthetic vocabulary is closed; a production integration
            # would build the dict from a head sample with a string
            # fallback column)
            sample = parse_sources_to_triples(
                generate_sources(spark, 512)
            )
            preds = {
                r[0]: r[1]
                for r in sample.select(
                    F.xxhash64("pred"), F.col("pred")
                ).distinct().collect()
            }
            dts = {
                r[0]: r[1]
                for r in sample.filter(F.col("obj_datatype").isNotNull())
                .select(F.xxhash64("obj_datatype"), F.col("obj_datatype"))
                .distinct()
                .collect()
            }
            pm = F.create_map(
                *[F.lit(x) for kv in preds.items() for x in kv]
            )
            dm = F.create_map(*[F.lit(x) for kv in dts.items() for x in kv])
            enc = enc.withColumn("pred", pm[F.col("pred_code")]).withColumn(
                "obj_datatype", dm[F.col("dt_code")]
            ).drop("pred_code", "dt_code")
        shapes = parse_shapes_turtle(APPLICATION_PROFILE)
        violations = validate(enc, shapes, spark)
        return violations.select("doc_id").distinct().count()

    try:
        # warm-up: full plan shape on a small slice
        slice_run(generate_sources(spark, 256))
        t0 = time.time()
        n = slice_run(generate_sources(spark, n_docs, n_partitions=cores * 3))
        wall = time.time() - t0
        return {
            "variant": variant,
            "cores": cores,
            "n_docs": n_docs,
            "wall_s": round(wall, 2),
            "docs_per_s": round(n_docs / wall, 1),
            "n_nonconforming_docs": n,
        }
    finally:
        spark.stop()


def run_sub(cores: int, n_docs: int, variant: str) -> dict:
    code = (
        "import sys, json; sys.path.insert(0, '/root/repo'); "
        "from tools.shuffle_payload_study import run_once; "
        f"print('RUN1 ' + json.dumps(run_once({cores}, {n_docs}, {variant!r})))"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=1800,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RUN1 "):
            return json.loads(line[5:])
    raise RuntimeError(out.stdout[-800:] + "\n" + out.stderr[-800:])


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    variants = (
        sys.argv[3].split(",") if len(sys.argv) > 3
        else ["base", "bindoc", "bindict"]
    )
    cores_list = [8, 32]
    samples: list[dict] = []
    for _ in range(repeats):
        for v in variants:
            for c in cores_list:
                try:
                    s = run_sub(c, n_docs, v)
                    samples.append(s)
                    print(f"# {v} local[{c}]: {s['wall_s']}s", file=sys.stderr)
                except RuntimeError as exc:
                    print(f"# dropped {v}/{c}: {exc}", file=sys.stderr)
    best: dict[tuple, dict] = {}
    for s in samples:
        k = (s["variant"], s["cores"])
        if k not in best or s["docs_per_s"] > best[k]["docs_per_s"]:
            best[k] = s
    summary = {}
    for v in variants:
        b8, b32 = best.get((v, 8)), best.get((v, 32))
        if b8 and b32:
            summary[v] = {
                "local8_docs_per_s": b8["docs_per_s"],
                "local32_docs_per_s": b32["docs_per_s"],
                "scaling_efficiency_8_32": round(
                    (b32["docs_per_s"] / b8["docs_per_s"]) / 4, 3
                ),
            }
    if "base" in summary and "bindoc" in summary:
        summary["bindoc_vs_base_local32"] = round(
            summary["bindoc"]["local32_docs_per_s"]
            / summary["base"]["local32_docs_per_s"],
            3,
        )
    if "base" in summary and "bindict" in summary:
        summary["bindict_vs_base_local32"] = round(
            summary["bindict"]["local32_docs_per_s"]
            / summary["base"]["local32_docs_per_s"],
            3,
        )
    if "bindoc" in summary and "edgecode" in summary:
        # bindoc IS the integrated engine; >=1.15 here is the keep bar
        summary["edgecode_vs_bindoc_local32"] = round(
            summary["edgecode"]["local32_docs_per_s"]
            / summary["bindoc"]["local32_docs_per_s"],
            3,
        )
    print(json.dumps({"samples": samples, "best": summary}, indent=2))


if __name__ == "__main__":
    main()
