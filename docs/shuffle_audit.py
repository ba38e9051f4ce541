#!/usr/bin/env python3
"""Shuffle-volume audit for the most expensive bench headliners
(round-10 VERDICT item 7): measure, don't assert, the "only the narrow
table shuffles" scale claims.

Runs each query in AUDIT_QUERIES once at $SPARK_GRAFT_SF_DIR (default
sf0.1) on a UI-enabled session and attributes per-stage shuffle metrics
(write bytes / write records / read bytes, from the Spark status REST
API — the same numbers a SparkListener sees) to the query via
before/after stage-set deltas. Driver-side sub-jobs (k-means centroid
sums, k-core round scalars, bounded_collect probes) land in the same
delta, so the numbers are whole-query, not final-action-only.

Writes docs/SHUFFLE_AUDIT.json and prints the SCALE.md table.
tests/test_shuffle_audit.py pins the committed JSON's top offenders so
a silent regression in shuffle volume (or a new top offender) fails the
suite until the table is consciously regenerated.

Usage: PYTHONPATH=/root/repo python3 docs/shuffle_audit.py
"""

from __future__ import annotations

import json
import os
import time
import urllib.request

# The most expensive headliners of the closing idle bench
# (docs/BENCH_FULL_latest.json), the population the audit is defined
# over; round 12 added embedding_pq_codes (the round-11 PQ/ADC
# headliner — k-means codebooks + code assignment is the newest
# shuffle-heavy family). Keep in sync with tests/test_shuffle_audit.py.
AUDIT_QUERIES = [
    "graph_triangles",
    "training_data_pipeline_full",
    "semantic_dedup",
    "training_data_pipeline",
    "k_core_peel",
    "dedup_lsh_minhash",
    "graph_mass_propagation",
    "substring_dedup_windows",
    "inverted_index",
    "sessionization",
    "embedding_pq_codes",
]

OUT = os.path.join(os.path.dirname(__file__), "SHUFFLE_AUDIT.json")


def _stage_metrics(sc) -> dict[int, tuple[int, int, int]]:
    """stageId -> (shuffleWriteBytes, shuffleWriteRecords,
    shuffleReadBytes) for every stage the app has run."""
    url = f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}/stages"
    with urllib.request.urlopen(url) as r:
        stages = json.load(r)
    return {
        s["stageId"]: (
            s.get("shuffleWriteBytes", 0),
            s.get("shuffleWriteRecords", 0),
            s.get("shuffleReadBytes", 0),
        )
        for s in stages
    }


def run_audit(spark, sf_dir: str, queries=None, warmup: bool = True) -> dict[str, dict]:
    from mapreduce__spark.plans import REGISTRY

    sc = spark.sparkContext
    out: dict[str, dict] = {}
    if warmup:
        # one unrecorded pass so the recorded `sec` is warm-JVM (codegen
        # and scan caches hot) — the round-11 audit recorded a 17.9s
        # graph_triangles that was really ~6s warm + cold-start; shuffle
        # bytes/records are plan-determined and unaffected either way
        for name in queries or AUDIT_QUERIES:
            REGISTRY[name].fn(spark, sf_dir).collect()
    for name in queries or AUDIT_QUERIES:
        before = _stage_metrics(sc)
        t0 = time.perf_counter()
        REGISTRY[name].fn(spark, sf_dir).collect()
        sec = time.perf_counter() - t0
        after = _stage_metrics(sc)
        new = [m for sid, m in after.items() if sid not in before]
        out[name] = {
            "w_bytes": sum(m[0] for m in new),
            "w_records": sum(m[1] for m in new),
            "r_bytes": sum(m[2] for m in new),
            "stages": len(new),
            "sec": round(sec, 3),
        }
        print(f"{name}: {out[name]}", flush=True)
    return out


def main() -> None:
    # UI must be ON for the status REST endpoint; everything else
    # mirrors the bench session (mapreduce__spark.session.get_spark).
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import SparkSession

    from mapreduce__spark.session import DEFAULT_CPUS, tune_session

    n = int(os.environ.get("SPARK_GRAFT_CPUS", DEFAULT_CPUS))
    spark = (
        SparkSession.builder.master(f"local[{n}]")
        .appName("shuffle-audit")
        .config("spark.ui.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .getOrCreate()
    )
    tune_session(spark)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    results = run_audit(spark, sf_dir)
    payload = {"sf_dir": sf_dir, "queries": results}
    with open(OUT, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    print(f"wrote {OUT}")
    # the SCALE.md table, ranked by shuffle write bytes
    rows = sorted(results.items(), key=lambda kv: -kv[1]["w_bytes"])
    print("| query | shuffle write | write records | shuffle read | stages |")
    print("|---|---|---|---|---|")
    for name, m in rows:
        print(
            f"| {name} | {m['w_bytes'] / 1e6:.1f} MB | "
            f"{m['w_records']:,} | {m['r_bytes'] / 1e6:.1f} MB | "
            f"{m['stages']} |"
        )


if __name__ == "__main__":
    main()
