#!/usr/bin/env python3
"""Same-session A/B timer for registry queries (guide §1.4): times each
named query against the noop sink, median-of-N warm after one discarded
cold pass, and prints per-query seconds plus the Spark job count per
invocation (statusTracker job-id delta — the §2.4/§5 metric for
driver-loop-bound queries).

Usage: python3 docs/ab_time.py <query> [query ...] [--n 3] [--sf DIR]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduce__spark.plans import REGISTRY
from mapreduce__spark.session import get_spark


def main() -> None:
    args = [a for a in sys.argv[1:]]
    n = 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--n":
            n = int(args[i + 1]); i += 2
        elif args[i] == "--sf":
            sf_dir = args[i + 1]; i += 2
        else:
            names.append(args[i]); i += 1
    spark = get_spark(app_name="mapreduce__spark-ab")
    spark.sparkContext.setLogLevel("ERROR")
    st = spark.sparkContext.statusTracker()
    for name in names:
        times = []
        jobs = None
        for it in range(n + 1):
            spark.sparkContext.setJobDescription(f"ab:{name}:{it}")
            j0 = st.getJobIdsForGroup(None)
            nj0 = max(j0) if j0 else -1
            t0 = time.monotonic()
            df = REGISTRY[name].fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.monotonic() - t0
            j1 = st.getJobIdsForGroup(None)
            nj1 = max(j1) if j1 else -1
            if it > 0:
                times.append(dt)
                jobs = nj1 - nj0
        print(
            f"{name:35s} median {statistics.median(times):7.3f}s "
            f"runs {[round(t, 3) for t in times]} jobs/run {jobs}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
