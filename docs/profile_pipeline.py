#!/usr/bin/env python3
"""Stage-profile of training_data_pipeline_full at sf0.1 (round-8 verdict
item 7): PhaseTimer the five stages on an idle machine, print the table
recorded in docs/SCALE.md.

The profiled run forces each stage with a checkpoint/count (the `timer`
seam in plans/tier2.py), so stage sums exceed the production single-action
wall time — the table answers "which stage grew", not "how fast is the
query" (bench.py owns that number).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mapreduce__spark.metrics import PhaseTimer  # noqa: E402
from mapreduce__spark.plans.tier2 import training_data_pipeline_full  # noqa: E402
from mapreduce__spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    load1, _, _ = os.getloadavg()
    spark = get_spark(app_name="pipeline-profile", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    # warm: one full untimed run absorbs JVM/codegen startup
    training_data_pipeline_full(spark, sf_dir).collect()

    timer = PhaseTimer()
    t0 = time.perf_counter()
    training_data_pipeline_full(spark, sf_dir, timer=timer).collect()
    total = time.perf_counter() - t0
    print(f"# sf_dir={sf_dir} load1_at_start={load1:.2f} total={total:.3f}s")
    print(f"{'stage':<16} {'sec':>8}")
    for name, ns in sorted(
        timer.durations_ns().items(), key=lambda kv: -kv[1]
    ):
        print(f"{name:<16} {ns / 1e9:>8.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
