"""Two-scale oracle gate (round-11 VERDICT item 1): the FULL DuckDB
differential re-run at sf0.1 — 10x the driver's compare scale.

Running the oracle sweep at the larger scale is the only gate that has
caught whole-class correctness bugs the small scales cannot see:
physical-partition-id instability in the two-phase cumsum and a
seconds-truncated range-frame key (round 2), and the bigram_lm_score
decimal half-tie (round 11) all surfaced ONLY at sf0.1.

These tests are marked `twoscale` and DESELECTED by default (pyproject
addopts) — the default suite stays at its ~20-minute budget and the
driver's `pytest tests/ -x -q` invocation is unchanged. Run the gate
explicitly at round close:

    make oracle-sf01        # = pytest -m twoscale tests/test_oracle_sf01.py
"""

from __future__ import annotations

import pytest

from mapreduce__spark.plans import REGISTRY

from tests.oracle_harness import compare_with_oracle

SF_LARGE = "/root/testdata/sf0.1"

# Oracle FORMULATIONS documented as small-scale-only: the ENGINE sides
# complete at sf0.1 (and are bench-timed there), but these proof
# harnesses are quadratic-or-worse in DuckDB at 20k parts / 5k docs —
# it is the oracle, not the plan, that is scale-bound (each query's
# docstring states this; round-11 SCALE.md "Two-scale oracle gate").
SMALL_SCALE_ONLY = {
    # quadratic gram self-join baseline (the declared exact-Jaccard
    # oracle form; the scale path is dedup_lsh / dedup_jaccard_prefix)
    "dedup_jaccard_exact",
    # fuzzy-blocking + recursive-CTE oracles, unbounded at 20k parts
    "entity_resolution_parts",
    "fuzzy_join_parts",
}

TWO_SCALE_QUERIES = sorted(
    name
    for name, q in REGISTRY.items()
    if q.oracle is not None and name not in SMALL_SCALE_ONLY
)

# The gate must not silently collapse (mirror of test_oracle.py's floor)
# nor silently grow its exclusion list: every excluded name must still
# be a registered oracle-bearing query, and the compared set must cover
# all but those three.
assert SMALL_SCALE_ONLY <= {n for n, q in REGISTRY.items() if q.oracle is not None}
assert len(TWO_SCALE_QUERIES) >= 190, (
    f"two-scale gate collapsed: only {len(TWO_SCALE_QUERIES)} queries"
)

pytestmark = pytest.mark.twoscale


@pytest.mark.parametrize("name", TWO_SCALE_QUERIES)
def test_query_matches_oracle_at_sf01(spark, name):
    q = REGISTRY[name]
    df = q.fn(spark, SF_LARGE)
    ok, msg = compare_with_oracle(df, q.oracle, SF_LARGE)
    assert ok, f"{name}: {msg}"
    assert df.take(1), f"{name}: empty result at sf0.1 — vacuous gate"
