"""Decontamination join-strategy tests (round-6 VERDICT finding 1).

The eval-gram join in ``decontaminate_eval_overlap`` and
``training_data_pipeline_full`` used to force ``F.broadcast(eval_grams)``.
The fixtured eval slice is ``doc_id % 50 == 0`` — 2% of the corpus — so
the broadcast payload grows linearly with data and OOMs the driver at
scale. The fix leaves the join UNHINTED: AQE broadcasts at runtime when
the built side is measured small, and keeps a shuffle equi-join otherwise.

These tests pin both halves of that contract:
* no broadcast hint survives in the logical plan (the scale-safety half);
* when the eval side exceeds the broadcast threshold (simulated by
  shrinking the threshold, which a forced hint would IGNORE), the
  executed plan is a shuffle join — the path that survives any eval size;
* with the default threshold and a genuinely tiny eval side, AQE still
  upgrades to a runtime broadcast — the fast path is not lost.
"""

from __future__ import annotations

from mapreduce__spark.plans import REGISTRY

_THRESH_KEYS = (
    "spark.sql.autoBroadcastJoinThreshold",
    "spark.sql.adaptive.autoBroadcastJoinThreshold",
)


def _analyzed(df) -> str:
    return df._jdf.queryExecution().analyzed().toString()


def _final_plan(df) -> str:
    df.collect()  # drive AQE to its final (runtime-re-planned) physical plan
    return df._jdf.queryExecution().executedPlan().toString()


def _set_thresholds(spark, value):
    old = {}
    for k in _THRESH_KEYS:
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        if value is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, value)
    return old


def _restore_thresholds(spark, old):
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_no_broadcast_hint_in_logical_plans(spark, sf_small):
    """Neither decontamination consumer may carry a join-strategy hint:
    a ResolvedHint(broadcast) overrides every size threshold, which is
    exactly the failure mode being prevented."""
    for name in ("decontaminate_eval_overlap", "training_data_pipeline_full"):
        plan = _analyzed(REGISTRY[name].fn(spark, sf_small))
        assert "ResolvedHint" not in plan, f"{name} still hints its joins:\n{plan}"


def test_shuffle_path_engages_when_eval_side_large(spark, sf_small):
    """With the broadcast threshold below the eval-gram size (standing in
    for an eval slice too big to ship), the gram join must run as a
    shuffle join. The old forced hint broadcast regardless of threshold,
    so this test fails against the pre-fix code."""
    old = _set_thresholds(spark, "1KB")
    try:
        plan = _final_plan(REGISTRY["decontaminate_eval_overlap"].fn(spark, sf_small))
    finally:
        _restore_thresholds(spark, old)
    assert "BroadcastHashJoin" not in plan, plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan


def test_aqe_still_broadcasts_tiny_eval_side(spark, sf_small):
    """Removing the hint must not lose the small-eval fast path: at
    sf0.001 the distinct eval-gram set is a few hundred rows, far under
    the default 10MB threshold, and AQE's runtime re-plan should upgrade
    the shuffle join to a broadcast from the measured exchange size."""
    plan = _final_plan(REGISTRY["decontaminate_eval_overlap"].fn(spark, sf_small))
    assert "BroadcastHashJoin" in plan, plan
