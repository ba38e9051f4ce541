"""AQE skew-join plan gate (round-4 VERDICT item 8).

The engine's two skew answers are (a) AQE's runtime skew-join split
(`spark.sql.adaptive.skewJoin.enabled`, on in the engine session —
session.py) and (b) the explicit salted join for the single-hot-key
pathology AQE's partition splitting can't fix alone
(operators/skew.py). This file pins BOTH at the physical-plan level,
mirroring the Bloom plan gate (test_bloom.py) and the bucketed-join
no-Exchange gate (test_skew_and_buckets.py):

* on a deliberately skewed join, AQE's final adaptive plan must carry a
  sort-merge join marked ``skew=true`` (the runtime split actually
  fired, not merely the conf being set);
* the AQE plan and the salted plan must both produce exactly the plain
  join's result;
* the salted plan's shuffle must hash-partition on (key, salt) — the
  exchange shape that scatters the hot key across tasks.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import functions as F

from mapreduce__spark.operators.skew import salted_join


@contextmanager
def _confs(spark, overrides: dict[str, str]):
    """Set session confs, restoring prior values afterwards (the spark
    fixture is session-scoped — leaked confs would bleed into other
    tests)."""
    saved: dict[str, str | None] = {}
    for k, v in overrides.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, old in saved.items():
            if old is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, old)


# Thresholds scaled to a test-sized corpus: the hot key's shuffle
# partition (~90% of 60k padded rows ≈ several MB) dwarfs the 64 KB
# skew threshold and the 32 KB advisory size, so AQE must split it.
# Broadcast is disabled to force the sort-merge path skew-split applies
# to (with broadcast on, the small build side would just broadcast and
# no skew handling would be observable).
_SKEW_CONFS = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
}


def _skewed_sides(spark):
    """Probe: 60k rows, ~90% on key 1 (payload-padded so the hot
    partition crosses the skew byte threshold); build: small dim."""
    pad = "x" * 200
    probe = spark.range(0, 60_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(1)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("pv"),
        F.lit(pad).alias("pad"),
    )
    build = spark.range(0, 70_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("bv")
    )
    return probe, build


def test_aqe_skew_split_fires_and_matches_plain(spark):
    probe, build = _skewed_sides(spark)
    # Two deliberate shapes: (a) the checksum aggregates over pad so
    # column pruning cannot strip the payload from the shuffle — the
    # skew byte-threshold must see the real row width; (b) it is a
    # GLOBAL aggregate, not groupBy(k) — a downstream requirement of
    # hashpartitioning(k) would make AQE veto the skew split as
    # shuffle-introducing (OptimizeSkewedJoin's no-extra-shuffle rule).
    agg = [
        F.count("*").alias("n"),
        F.sum("pv").alias("pv_sum"),
        F.sum(F.length("pad")).alias("padlen"),
    ]
    want = probe.join(build, "k").agg(*agg).collect()[0]
    with _confs(spark, _SKEW_CONFS):
        j = probe.join(build, "k").agg(*agg)
        got = j.collect()[0]
        # executedPlan AFTER collect: AQE plans are finalized at runtime
        plan = j._jdf.queryExecution().executedPlan().toString()
    assert got == want
    assert "skew=true" in plan, (
        "AQE skew-join split did not fire on a hot-key join under "
        f"test thresholds — plan:\n{plan[:2000]}"
    )


def test_salted_join_matches_aqe_and_scatters_hot_key(spark):
    probe, build = _skewed_sides(spark)
    plain = probe.join(build, "k").groupBy("k").agg(F.count("*").alias("n"))
    want = {(r.k, r.n) for r in plain.collect()}

    salted = salted_join(probe, build, ["k"], salt=8).groupBy("k").agg(
        F.count("*").alias("n")
    )
    got = {(r.k, r.n) for r in salted.collect()}
    assert got == want

    # Exchange shape: both sides shuffle on (k, _salt) — the hot key's
    # rows land on `salt` reducers instead of one.
    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(k" in plan and "_salt" in plan, plan[:2000]

    # The scatter is real, not just planned: the hot key's probe rows
    # spread across ALL 8 salt values (xxhash64 over the full row).
    spread = (
        probe.where(F.col("k") == 1)
        .select(
            F.pmod(F.xxhash64("k", "pv", "pad"), F.lit(8)).alias("s")
        )
        .distinct()
        .count()
    )
    assert spread == 8
