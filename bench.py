#!/usr/bin/env python3
"""Benchmark the engine's headline queries.

Runs the 'bench'-tagged registry queries (plus the flagship) at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q": sec, ...}, "sf": <sf>}

Timing is per-query wall time of plan + execute + collect, after a warmup
action that absorbs JVM/session startup (the reference's benchmark also
excluded framework init — README:101-118 reports phase times only).
"""

from __future__ import annotations

import json
import os
import re
import time

from mapreduce__spark.plans import REGISTRY
from mapreduce__spark.session import get_spark

BENCH_QUERIES = [
    "search_count",        # flagship: filter→count→sort→expand
    "pricing_summary",     # wide aggregate scan (TPC-H Q1 shape)
    "join_broadcast_star", # broadcast dim star join
    "shipping_priority",   # 3-way fact join + top-k (TPC-H Q3 shape)
    "local_supplier_volume",  # 6-way join (TPC-H Q5 shape)
    "word_count",          # explode-heavy text path
    "dedup_lsh_minhash",   # MinHash LSH + exact verify
    "ann_topk_bruteforce", # vector math path
    "events_tumbling_window",  # streaming-twin window agg
    "sessionization",      # window-function chain
    "training_data_pipeline",  # composed end-to-end pipeline (quality →
                               # dedup → cluster removal → split → pack)
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark(app_name="mapreduce__spark-bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    # Warmup: touch the biggest table so JVM startup/codegen caches are
    # excluded from per-query numbers.
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    # min of two runs per query: the first run pays one-time codegen /
    # footer-read costs and OS noise; the min is the stable per-round
    # comparison number (both runs execute the full plan end-to-end).
    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        q = REGISTRY[name]
        runs = []
        for _ in range(2):
            t0 = time.perf_counter()
            q.fn(spark, sf_dir).collect()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(min(runs), 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
