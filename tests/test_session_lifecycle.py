"""Session lifecycle: the engine must survive a stop-and-recreate of the
SparkSession (the table cache must not hand a dead session's DataFrames to
the new one). Runs in a subprocess so the shared test session is untouched."""

from __future__ import annotations

import subprocess
import sys

SCRIPT = r"""
from pyspark.sql import SparkSession
from mapreduce__spark.plans import REGISTRY

def run_once():
    spark = (SparkSession.builder.master("local[2]")
             .config("spark.ui.enabled", "false").getOrCreate())
    n = REGISTRY["search_count"].fn(spark, "/root/testdata/sf0.001").count()
    spark.stop()
    return n

a = run_once()
b = run_once()  # brand-new session; cached plans from the dead one must not leak
assert a == b == 275, (a, b)
print("LIFECYCLE_OK")
"""


def test_session_stop_and_recreate():
    res = subprocess.run(
        [sys.executable, "-c", SCRIPT], capture_output=True, text=True,
        cwd="/root/repo", timeout=300,
    )
    assert res.returncode == 0, res.stderr[-800:]
    assert "LIFECYCLE_OK" in res.stdout
