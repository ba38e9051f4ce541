#!/usr/bin/env python3
"""Capture .explain("formatted") for bench headliner queries into
plans/$SPARK_GRAFT_PLANS_ROUND/<query>_<tag>.txt (default r15) — the optimization round's before/after
plan evidence (guide §1: measure first, keep the plan shape on record).

Usage: python3 docs/capture_plans.py <tag> [query ...]
  tag    = "before" / "after" (file suffix)
  query  = subset to capture (default: every bench headliner)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduce__spark.plans import REGISTRY
from mapreduce__spark.session import get_spark


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    from bench import BENCH_QUERIES

    names = sys.argv[2:] or BENCH_QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rnd = os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r15")
    out_dir = os.path.join(os.path.dirname(__file__), "..", "plans", rnd)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="mapreduce__spark-plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = REGISTRY[name].fn(spark, sf_dir)
        # public-API capture (df.explain prints to stdout) instead of the
        # former private PythonSQLUtils reach-in, which breaks across
        # PySpark versions (round-14 ADVICE item)
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
    spark.stop()


if __name__ == "__main__":
    main()
