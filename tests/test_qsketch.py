"""Gates for the mergeable quantile sketches (operators/qsketch.py).

quantile_sketch_values is rows-only by design (log-gamma bucketing is
libm arithmetic, not cross-engine hash-checkable), so these tests carry
its guarantees instead of a SQL oracle — the heavy_hitters_approx
precedent:

1. the DDSketch relative-error bound |est - percentile_disc| <= alpha *
   |percentile_disc| — a HARD guarantee (bucket counts are exact), not a
   statistical one, checked on the fixture corpus and on an adversarial
   value set spanning signs and ~16 orders of magnitude;
2. the merge law: sketch(A ++ B) == merge(sketch(A), sketch(B))
   row-for-row (the commutative-monoid property the partition-parallel
   build and the streaming state fold both lean on);
3. the fixed-universe state bound: duplicating the data must not grow
   the sketch by a single row.

quantile_sketch_dyadic is fully oracle-checked by the driver and
tests/test_oracle.py; here we pin the semantic claim its [lo, hi]
output makes — the true discrete percentile lies INSIDE the bracket.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from mapreduce__spark.operators.qsketch import (
    dd_merge,
    dd_quantiles,
    dd_sketch,
    gamma_for_alpha,
)

ALPHA = 0.01
QS = [(1, 2), (9, 10), (99, 100)]


def _exact_disc(values: list[float], num: int, den: int) -> float:
    s = sorted(values)
    n = len(s)
    rank = -(-num * n // den)  # ceil(num*n/den)
    return s[max(rank, 1) - 1]


def _check_alpha_bound(spark, values: list[float], alpha: float = ALPHA) -> None:
    df = spark.createDataFrame([(v,) for v in values], "value double")
    sk = dd_sketch(df, "value", alpha=alpha)
    row = dd_quantiles(sk, QS, alpha=alpha).collect()[0]
    assert row.n_rows == len(values)
    for num, den in QS:
        est = row[f"q_{num}_{den}"]
        true = _exact_disc(values, num, den)
        if true == 0.0:
            assert est == 0.0, (num, den, est)
        else:
            rel = abs(est - true) / abs(true)
            assert rel <= alpha + 1e-12, (num, den, est, true, rel)


def test_dd_alpha_guarantee_on_fixture(spark, sf_oracle):
    from mapreduce__spark.plans.tier0 import load_table

    ev = load_table(spark, sf_oracle, "events").where(F.col("value").isNotNull())
    by_type: dict[str, list[float]] = {}
    for r in ev.select("event_type", "value").collect():
        by_type.setdefault(r.event_type, []).append(r.value)

    from mapreduce__spark.plans import REGISTRY

    got = {
        r.event_type: r
        for r in REGISTRY["quantile_sketch_values"].fn(spark, sf_oracle).collect()
    }
    assert set(got) == set(by_type)
    for et, vals in by_type.items():
        row = got[et]
        assert row.n_rows == len(vals)
        for (num, den), col in zip(QS, ("p50_est", "p90_est", "p99_est")):
            true = _exact_disc(vals, num, den)
            assert abs(row[col] - true) <= ALPHA * abs(true) + 1e-12, (
                et,
                col,
                row[col],
                true,
            )


def test_dd_alpha_guarantee_adversarial_values(spark):
    """Signs, zeros, denormal-ish tiny values, and huge values in one
    distribution — every section of the sketch (mirrored negative store,
    zero bucket, positive store) carries quantile mass at some q."""
    vals = (
        [-(10.0**k) for k in range(-8, 8)] * 3
        + [0.0] * 7
        + [10.0**k for k in range(-8, 8)] * 4
        + [1.0 + i / 997.0 for i in range(200)]
        + [-(1.0 + i / 31.0) for i in range(50)]
    )
    _check_alpha_bound(spark, vals)
    # a pure-negative and a pure-tiny distribution as edge regimes
    _check_alpha_bound(spark, [-(1.0 + i / 13.0) for i in range(97)])
    _check_alpha_bound(spark, [10.0 ** (-300 + i) for i in range(40)])


def test_dd_merge_law_is_exact(spark, sf_oracle):
    """sketch(A ++ B) == merge(sketch(A), sketch(B)) — exact row-set
    equality, not tolerance: bucket counts add. Split the fixture by a
    hash so both halves are nontrivial."""
    from mapreduce__spark.plans.tier0 import load_table

    ev = load_table(spark, sf_oracle, "events").where(F.col("value").isNotNull())
    a = ev.where(F.pmod(F.hash("event_id"), F.lit(2)) == 0)
    b = ev.where(F.pmod(F.hash("event_id"), F.lit(2)) == 1)
    assert a.count() > 0 and b.count() > 0

    keys = ["event_type"]
    whole = {
        tuple(r) for r in dd_sketch(ev, "value", keys, ALPHA).collect()
    }
    merged = {
        tuple(r)
        for r in dd_merge(
            dd_sketch(a, "value", keys, ALPHA),
            dd_sketch(b, "value", keys, ALPHA),
            keys,
        ).collect()
    }
    assert whole == merged
    assert len(whole) > 5  # anti-vacuity: a real multi-bucket sketch


def test_dd_state_bounded_by_universe_not_rows(spark):
    """Replicating every row 50x must not add a single sketch row (the
    fixed-universe property that makes the sketch a 100 TB primitive),
    and the universe bound itself holds: |idx| <= ceil(ln(DBL_MAX)/ln g)."""
    vals = [(1.0 + i / 101.0,) for i in range(300)]
    df = spark.createDataFrame(vals, "value double")
    big = df.crossJoin(spark.range(50))
    n_small = dd_sketch(df, "value", alpha=ALPHA).count()
    n_big = dd_sketch(big, "value", alpha=ALPHA).count()
    assert n_small == n_big
    gamma = gamma_for_alpha(ALPHA)
    idx_cap = math.ceil(math.log(1.7976931348623157e308) / math.log(gamma))
    rows = dd_sketch(df, "value", alpha=ALPHA).collect()
    assert all(abs(r.idx) <= idx_cap for r in rows)
    assert n_small <= 2 * idx_cap + 1


def test_dyadic_brackets_contain_true_percentiles(spark, sf_oracle):
    """The oracle pins the dyadic query's arithmetic; this pins its
    MEANING: the emitted [lo, hi] cent bounds bracket the true discrete
    percentile of the cents measure for every event_type."""
    from mapreduce__spark.plans import REGISTRY
    from mapreduce__spark.plans.tier0 import load_table

    ev = load_table(spark, sf_oracle, "events").where(F.col("value").isNotNull())
    cents: dict[str, list[int]] = {}
    for r in ev.select(
        "event_type", F.round(F.col("value") * 100, 0).cast("bigint").alias("c")
    ).collect():
        cents.setdefault(r.event_type, []).append(r.c)

    got = {
        r.event_type: r
        for r in REGISTRY["quantile_sketch_dyadic"].fn(spark, sf_oracle).collect()
    }
    assert set(got) == set(cents)
    for et, cs in cents.items():
        row = got[et]
        for (num, den), p in zip(QS, ("p50", "p90", "p99")):
            true = _exact_disc([float(c) for c in cs], num, den)
            lo, hi = row[f"{p}_lo_cents"], row[f"{p}_hi_cents"]
            assert lo <= true <= hi, (et, p, lo, true, hi)
            assert hi <= 2 * max(lo, 1)  # factor-2 bracket, as declared


def test_countmin_never_undercounts_and_bounds_overcount(spark):
    """The count-min guarantees on an ADVERSARIAL vocabulary sized to
    force collisions (vocab 3x the width): (a) est >= true for EVERY
    token — the deterministic one-sided bound; (b) est <= true + total
    colliding mass, checked via the classic eps*N bound with eps = e/w
    holding for the vast majority (the bound is probabilistic per row;
    with depth 3 the min blows past it only with vanishing frequency —
    we assert zero violations at 3x slack, a regression tripwire rather
    than the theorem)."""
    from collections import Counter

    from pyspark.sql import functions as F

    from mapreduce__spark.operators.qsketch import (
        CM_WIDTH,
        countmin_build,
        countmin_estimate,
    )

    words = []
    for i in range(3 * CM_WIDTH):
        words += [f"tok{i}"] * (1 + i % 7)
    truth = Counter(words)
    n_total = sum(truth.values())
    toks = spark.createDataFrame([(w,) for w in words], "tok string").repartition(8)
    sk = countmin_build(toks)
    assert sk.count() <= 3 * CM_WIDTH  # bounded cells
    probes = spark.createDataFrame(
        [(t,) for t in truth], "tok string"
    )
    est = {r.tok: r.n_est for r in countmin_estimate(sk, probes).collect()}
    assert set(est) == set(truth)
    under = [t for t in truth if est[t] < truth[t]]
    assert not under, under[:5]
    import math

    eps_bound = 3 * math.e / CM_WIDTH * n_total
    over = [t for t in truth if est[t] > truth[t] + eps_bound]
    assert not over, over[:5]
    # collisions must actually occur at 3x width, or the test is vacuous
    assert any(est[t] > truth[t] for t in truth)


def test_countmin_merge_law_is_exact(spark, sf_oracle):
    """Cell-wise addition is the sketch merge: building from the whole
    corpus equals summing the sketches of a 2-way split, row-for-row."""
    from pyspark.sql import functions as F

    from mapreduce__spark.operators.qsketch import countmin_build
    from mapreduce__spark.plans.tier0 import load_table

    docs = load_table(spark, sf_oracle, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).where(F.col("tok") != "")
    whole = {
        (r.row, r.col): r.n for r in countmin_build(toks).collect()
    }
    a = countmin_build(toks.where(F.pmod(F.hash("doc_id"), F.lit(2)) == 0))
    b = countmin_build(toks.where(F.pmod(F.hash("doc_id"), F.lit(2)) == 1))
    merged = {
        (r.row, r.col): r.n
        for r in a.unionAll(b)
        .groupBy("row", "col")
        .agg(F.sum("n").cast("bigint").alias("n"))
        .collect()
    }
    assert whole == merged and len(whole) > 10


def test_dd_handles_inf_and_nan(spark):
    """Infinities clamp into the outermost finite buckets (end-bucket
    convention — the long cast must never see an inf double) and NaN is
    dropped like NULL; finite quantiles stay within alpha."""
    vals = (
        [float("inf")] * 3
        + [float("-inf")] * 2
        + [float("nan")] * 4
        + [None]
        + [1.0 + i / 53.0 for i in range(90)]
    )
    df = spark.createDataFrame([(v,) for v in vals], "value double")
    sk = dd_sketch(df, "value", alpha=ALPHA)
    rows = sk.collect()
    gamma = gamma_for_alpha(ALPHA)
    idx_cap = math.ceil(math.log(1.7976931348623157e308) / math.log(gamma))
    assert all(abs(r.idx) <= idx_cap for r in rows)
    # 3 +inf at the top bucket, 2 -inf at the mirrored bottom bucket
    assert {(r.sgn, r.idx): r.n for r in rows}[(1, idx_cap)] == 3
    assert {(r.sgn, r.idx): r.n for r in rows}[(-1, idx_cap)] == 2
    # NaN and NULL dropped: total mass = 3 + 2 + 90
    assert sum(r.n for r in rows) == 95
    # the median of the finite mass is still alpha-exact: the finite
    # values dominate the middle ranks
    row = dd_quantiles(sk, [(1, 2)], alpha=ALPHA).collect()[0]
    finite = sorted([1.0 + i / 53.0 for i in range(90)])
    # rank ceil(95/2) = 48 lands inside the finite run (2 -inf below)
    true = finite[48 - 2 - 1]
    assert abs(row.q_1_2 - true) <= ALPHA * true


def _hll_corrected(v_empty: int, raw_est: float) -> float:
    """The standard FFGM small-range correction the query intentionally
    leaves to consumers (ln is libm — it would break the hash check):
    linear counting when the raw estimate is small and empty registers
    remain."""
    from mapreduce__spark.operators.qsketch import HLL_M

    if raw_est <= 2.5 * HLL_M and v_empty > 0:
        return HLL_M * math.log(HLL_M / v_empty)
    return raw_est


def test_hll_corrected_estimate_within_tolerance(spark, sf_small, sf_oracle):
    """Accuracy gate at BOTH verify scales: sf0.001 (~130 distinct per
    group — the linear-counting regime) and sf0.01 (~1300 — the raw
    estimator regime), each within 15% of exact COUNT(DISTINCT)
    (design error is 6.5% at m=256; 15% covers population-specific
    hash variance with margin)."""
    from mapreduce__spark.plans import REGISTRY
    from mapreduce__spark.plans.tier0 import load_table

    for sf in (sf_small, sf_oracle):
        truth = {
            r.o_orderpriority: r.d
            for r in load_table(spark, sf, "orders")
            .groupBy("o_orderpriority")
            .agg(F.countDistinct("o_custkey").alias("d"))
            .collect()
        }
        got = {
            r.o_orderpriority: _hll_corrected(r.v_empty, r.raw_est)
            for r in REGISTRY["hll_distinct_charfold"].fn(spark, sf).collect()
        }
        assert set(got) == set(truth) and len(truth) == 5
        for pr, t in truth.items():
            assert abs(got[pr] - t) <= 0.15 * t, (sf, pr, got[pr], t)


def test_hll_register_merge_law_is_max(spark, sf_oracle):
    """Registers merge by MAX: the register table of the whole relation
    equals the max-merge of the register tables of a disjoint split —
    exact row-for-row (the monoid the shard/stream merges rely on)."""
    from mapreduce__spark.operators.qsketch import hll_registers
    from mapreduce__spark.plans.tier0 import load_table

    o = load_table(spark, sf_oracle, "orders")
    item = F.col("o_custkey").cast("string")
    keys = ["o_orderpriority"]
    whole = {
        tuple(r) for r in hll_registers(o, item, keys).collect()
    }
    a = o.where(F.pmod(F.hash("o_orderkey"), F.lit(2)) == 0)
    b = o.where(F.pmod(F.hash("o_orderkey"), F.lit(2)) == 1)
    merged = {
        tuple(r)
        for r in hll_registers(a, item, keys)
        .unionAll(hll_registers(b, item, keys))
        .groupBy(*keys, "j")
        .agg(F.max("m_rank").cast("bigint").alias("m_rank"))
        .collect()
    }
    assert whole == merged and len(whole) > 100


def test_dd_alpha_guarantee_random_content(spark):
    """Hypothesis-style randomized gate (fixed seeds, multiple draws):
    the alpha bound must hold on arbitrary float populations, not just
    the fixture laws — mixtures of scales, signs, duplicates, and
    near-boundary values."""
    import random

    for seed in (11, 29, 47):
        rng = random.Random(seed)
        vals = []
        for _ in range(rng.randrange(50, 400)):
            kind = rng.randrange(5)
            if kind == 0:
                vals.append(rng.uniform(-1e6, 1e6))
            elif kind == 1:
                vals.append(rng.uniform(-1e-6, 1e-6))
            elif kind == 2:
                vals.append(float(rng.randrange(-100, 100)))
            elif kind == 3:
                vals.append(rng.choice([0.0, 1.0, -1.0]) * 10 ** rng.randrange(-30, 30))
            else:
                vals.append(rng.gauss(0, 1))
        _check_alpha_bound(spark, vals)


def test_countmin_never_undercounts_random_content(spark):
    """Randomized never-undercount gate: arbitrary token multisets over
    an alphabet sized to collide, shredded across partitions."""
    import random
    from collections import Counter

    from mapreduce__spark.operators.qsketch import countmin_build, countmin_estimate

    rng = random.Random(97)
    words = []
    for i in range(1200):
        words += [f"w{rng.randrange(3000)}"] * rng.randrange(1, 6)
    truth = Counter(words)
    toks = spark.createDataFrame([(w,) for w in words], "tok string").repartition(16)
    sk = countmin_build(toks)
    probes = spark.createDataFrame([(t,) for t in truth], "tok string")
    est = {r.tok: r.n_est for r in countmin_estimate(sk, probes).collect()}
    under = [t for t in truth if est[t] < truth[t]]
    assert not under, under[:5]


def test_dd_heavy_point_mass_and_boundary_values(spark):
    """A single value carrying most of the mass (every quantile lands on
    it) and values sitting exactly on gamma-power bucket boundaries —
    the rank-tie and ceil-edge regime. The alpha bound must hold at
    every probed quantile."""
    gamma = gamma_for_alpha(ALPHA)
    boundary = gamma ** 50  # representable, lands on a bucket edge
    vals = [5.0] * 900 + [0.5, 7.5, boundary, boundary, 2.0 * boundary] * 4
    _check_alpha_bound(spark, vals)
    # all-identical distribution: every quantile is the value itself
    _check_alpha_bound(spark, [42.0] * 257)


def test_hll_union_equals_sketch_of_concatenation(spark, sf_oracle):
    """|A ∪ B| via register max must be EXACTLY the sketch of A ++ B
    (not merely close): identical register tables, identical summaries —
    and the inclusion-exclusion intersection estimate lands within
    3x the design error of the true overlap on the fixture cohorts."""
    from mapreduce__spark.operators.qsketch import (
        HLL_M,
        hll_registers,
        hll_summary,
        hll_union,
    )
    from mapreduce__spark.plans.tier0 import load_table

    o = load_table(spark, sf_oracle, "orders")
    item = F.col("o_custkey").cast("string")
    a = o.where(F.col("o_orderpriority") == "1-URGENT")
    b = o.where(F.col("o_orderpriority") == "5-LOW")

    ra = hll_registers(a, item)
    rb = hll_registers(b, item)
    union_regs = {tuple(r) for r in hll_union(ra, rb).collect()}
    concat_regs = {
        tuple(r) for r in hll_registers(a.unionAll(b), item).collect()
    }
    assert union_regs == concat_regs and len(union_regs) > 50

    def est(regs):
        row = hll_summary(regs).collect()[0]
        return _hll_corrected(row.v_empty, row.raw_est)

    na, nb = est(ra), est(rb)
    nu = est(hll_union(ra, rb))
    inter_est = na + nb - nu
    true_a = {r.o_custkey for r in a.select("o_custkey").distinct().collect()}
    true_b = {r.o_custkey for r in b.select("o_custkey").distinct().collect()}
    true_inter = len(true_a & true_b)
    # 3 summaries x 6.5% design error on cohorts of ~1300 -> generous
    # absolute band of 3 * 0.065 * |A ∪ B|
    band = 3 * (1.04 / (HLL_M ** 0.5)) * len(true_a | true_b)
    assert abs(inter_est - true_inter) <= band, (inter_est, true_inter, band)


def test_dd_subnormal_values_keep_alpha_guarantee(spark):
    """Round-10 ADVICE: the bucket-index clamp was derived from DBL_MAX
    only, so |x| < DBL_MIN (subnormals, indexes below -idx_cap) used to
    collapse into one bucket with estimate ~1e-309 — violating the hard
    alpha guarantee. The floor now comes from the smallest positive
    subnormal (5e-324): every positive double's exact index is
    representable, so subnormal magnitudes estimate within alpha too."""
    vals = [1e-310, 5e-320, 1e-315, 2.5e-312, 4.9e-324, 2.2e-308]
    df = spark.createDataFrame([(v,) for v in vals], "value double")
    sk = dd_sketch(df, "value", alpha=ALPHA)
    n = len(vals)
    svals = sorted(vals)
    for num, den in [(1, 4), (1, 2), (3, 4), (1, 1)]:
        row = dd_quantiles(sk, [(num, den)], alpha=ALPHA).collect()[0]
        true = svals[-(-num * n // den) - 1]  # percentile_disc rank
        est = row[f"q_{num}_{den}"]
        assert abs(est - true) <= ALPHA * true, (num, den, est, true)


def test_hll_summary_of_empty_set_is_empty_sketch(spark):
    """Round-10 ADVICE: the register SUM over zero rows is NULL; the
    summary must coalesce it so an empty cohort reads as the CORRECT
    sketch of the empty set — all registers empty, v_empty = HLL_M,
    s_scaled = HLL_M * 2^50 — rather than NULL estimator components."""
    from mapreduce__spark.operators.qsketch import (
        HLL_ALPHA_NUM,
        HLL_M,
        HLL_SCALE,
        hll_registers,
        hll_summary,
    )

    empty = spark.createDataFrame([], "it string")
    row = hll_summary(hll_registers(empty, F.col("it"))).collect()[0]
    assert row.v_empty == HLL_M
    assert row.s_scaled == HLL_M * HLL_SCALE
    assert row.raw_est == HLL_ALPHA_NUM / (HLL_M * HLL_SCALE)  # near zero
