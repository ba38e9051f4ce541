"""Isotonic (PAV) calibration — monotone regression over a bounded
histogram.

The classic model-calibration primitive (Zadrozny & Elkan 2002; the
sklearn ``IsotonicRegression`` semantics): given per-bin (successes,
trials) counts ordered by a raw score, find the NON-DECREASING rate
curve minimizing squared error — computed by the Pool-Adjacent-Violators
algorithm, whose solution is equivalently the minimax formula
``f(i) = max_{j<=i} min_{k>=i} (sum_{j..k} p) / (sum_{j..k} t)``
(the form the DuckDB oracle unrolls, so the two sides are genuinely
independent computations of the same fixed point).

Everything is exact integer arithmetic: pooling decisions compare block
rates by cross-multiplication (``p1*t2 > p2*t1``), never by float
division, so the fit is a pure function of the input counts on every
engine; the emitted value is the established integral-scaled floor-div
idiom (``pooled_p * 1e6 // pooled_t``).

SCALE: the corpus never shuffles more than one map-side-combinable
groupBy(bin) — the histogram is bounded by the binning law (score range
/ bin width), PAV runs on the driver over those few rows
(bounded_collect-guarded), and the fitted curve broadcasts back as ONE
literal map probed in the scan stage. Same compaction pattern as
equidepth_deciles / quantile_rank_normalize.

Reference provenance: the reference engine has no calibration operators
(SURVEY §2b engine extensions); this is tier-2 LLM-pipeline surface
(quality-score calibration before mixture weighting).
"""

from __future__ import annotations


def pav_nondecreasing(
    pairs: list[tuple[int, int, int]],
) -> dict[int, tuple[int, int]]:
    """Weighted PAV over ``(key, successes, trials)`` rows sorted by key:
    returns ``key -> (pooled_successes, pooled_trials)`` for the
    non-decreasing isotonic fit. Violations (a block whose rate exceeds
    its successor's) merge by exact integer cross-multiplication; equal
    rates stay unpooled — their emitted values are identical either way,
    so the output is insensitive to the tie choice."""
    blocks: list[list] = []  # [successes, trials, [keys...]]
    prev_key = None
    for key, p, t in pairs:
        if prev_key is not None and key <= prev_key:
            raise ValueError("pav_nondecreasing: keys must be strictly increasing")
        prev_key = key
        if t <= 0 or p < 0 or p > t:
            raise ValueError(f"pav_nondecreasing: bad counts ({key}, {p}, {t})")
        blocks.append([p, t, [key]])
        while len(blocks) >= 2:
            p2, t2, k2 = blocks[-1]
            p1, t1, k1 = blocks[-2]
            if p1 * t2 > p2 * t1:  # prev rate > next rate: violator
                blocks[-2:] = [[p1 + p2, t1 + t2, k1 + k2]]
            else:
                break
    return {k: (p, t) for p, t, keys in blocks for k in keys}


def minimax_reference(
    pairs: list[tuple[int, int, int]],
) -> dict[int, tuple[int, int]]:
    """O(n^3) minimax form of the same fit — the independent reference
    the property tests (and, in SQL, the DuckDB oracle) check PAV
    against: for each i, the (p, t) of the window attaining
    max over j<=i of min over k>=i of p(j,k)/t(j,k). Fractions compare
    by cross-multiplication, exactly."""
    keys = [k for k, _p, _t in pairs]
    n = len(keys)
    ps = [p for _k, p, _t in pairs]
    ts = [t for _k, _p, t in pairs]
    out: dict[int, tuple[int, int]] = {}
    for i in range(n):
        best: tuple[int, int] | None = None  # argmax over j
        for j in range(i + 1):
            worst: tuple[int, int] | None = None  # argmin over k
            for k in range(i, n):
                p = sum(ps[j : k + 1])
                t = sum(ts[j : k + 1])
                if worst is None or p * worst[1] < worst[0] * t:
                    worst = (p, t)
            assert worst is not None
            if best is None or worst[0] * best[1] > best[0] * worst[1]:
                best = worst
        assert best is not None
        out[keys[i]] = best
    return out
