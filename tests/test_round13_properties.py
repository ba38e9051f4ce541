"""Round-13 property tests: the Kneser-Ney LM law vs a pure-Python
reference (round-12 VERDICT item 7) and the KN > JM discrimination
claim on the adversarial corpus KN exists for."""

from __future__ import annotations

import math

import pytest

from mapreduce__spark.plans import REGISTRY


def _kn_reference(docs: list[tuple[int, str]]) -> dict[int, tuple[int, float]]:
    """Independent interpolated-KN bigram scorer, d = 3/4: trains on the
    same corpus it scores, arithmetic exactly as declared (the one
    IEEE rational, floor-quantized micro-NLL, half-up integer mean)."""
    big: dict[tuple[str, str], int] = {}
    inst: dict[int, list[tuple[str, str]]] = {}
    for doc_id, text in docs:
        toks = text.split(" ")
        pairs = list(zip(toks, toks[1:]))
        inst[doc_id] = pairs
        for p in pairs:
            big[p] = big.get(p, 0) + 1
    c1x: dict[str, int] = {}
    a1: dict[str, int] = {}
    b2: dict[str, int] = {}
    for (l, r), c in big.items():
        c1x[l] = c1x.get(l, 0) + c
        a1[l] = a1.get(l, 0) + 1
        b2[r] = b2.get(r, 0) + 1
    t = float(len(big))
    out: dict[int, tuple[int, float]] = {}
    for doc_id, pairs in inst.items():
        if not pairs:
            continue
        s = 0
        for l, r in pairs:
            p = ((4 * big[(l, r)] - 3) * t + 3.0 * a1[l] * b2[r]) / (
                (4.0 * c1x[l]) * t
            )
            s += int(math.floor(-math.log(p) * 1000000 + 0.5))
        n = len(pairs)
        out[doc_id] = (n, float((2 * s + n) // (2 * n)) / 1000000)
    return out


@pytest.fixture(scope="module")
def kn_corpus_sf(tmp_path_factory) -> str:
    """A corpus with the structure KN was invented for: 'francisco'
    occurs OFTEN but always after 'san' (single continuation context),
    while 'day' occurs the same number of times after many different
    words — plus a one-token doc (no bigrams, must drop out) and some
    filler text."""
    from tests.test_round13_advice import _write_documents

    rows, doc_id = [], 0
    texts = [
        "we drove to san francisco from san francisco bay",
        "san francisco fog rolled over san francisco hills",
        "a nice day and a long day and a good day",
        "every day some day one day each day",
        "solo",
        "the chef cooked while the chef sang",
        "day after day the san francisco day began",
    ]
    for text in texts:
        doc_id += 1
        rows.append((doc_id, text, "en", "web", len(text)))
    d = str(tmp_path_factory.mktemp("kn_corpus"))
    _write_documents(d, rows)
    return d


def test_kn_lm_score_matches_pure_python_reference(spark, kn_corpus_sf):
    import duckdb

    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{kn_corpus_sf}/documents.parquet')"
    ).fetchall()
    con.close()
    want = _kn_reference([(d, t) for d, t in docs])
    got = {
        r.doc_id: (r.n_bigrams, r.nll)
        for r in REGISTRY["kn_lm_score"].fn(spark, kn_corpus_sf).collect()
    }
    assert got == want
    assert 5 not in got  # the one-token doc has no bigrams


def test_kn_lm_score_matches_oracle_on_adversarial_corpus(spark, kn_corpus_sf):
    from tests.oracle_harness import compare_with_oracle

    q = REGISTRY["kn_lm_score"]
    ok, msg = compare_with_oracle(q.fn(spark, kn_corpus_sf), q.oracle, kn_corpus_sf)
    assert ok, msg


def test_kn_probabilities_sum_to_one_per_context(spark, sf_small):
    """The smoothing law itself: for every context w1, summing
    p_KN(w2 | w1) over the seen continuations plus the reclaimed
    backoff mass spread over UNSEEN continuations must give exactly 1 —
    checked in exact Fractions on the sf corpus model."""
    from fractions import Fraction

    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        f"""
        WITH t AS (SELECT string_split(text, ' ') AS toks
                   FROM read_parquet('{sf_small}/documents.parquet')),
        inst AS (SELECT toks[i] AS l, toks[i+1] AS r
                 FROM t CROSS JOIN UNNEST(range(1, len(toks))) AS u(i))
        SELECT l, r, count(*) FROM inst GROUP BY 1, 2
        """
    ).fetchall()
    con.close()
    big = {(l, r): c for l, r, c in rows}
    c1x: dict = {}
    a1: dict = {}
    b2: dict = {}
    for (l, r), c in big.items():
        c1x[l] = c1x.get(l, 0) + c
        a1[l] = a1.get(l, 0) + 1
        b2[r] = b2.get(r, 0) + 1
    t = len(big)
    d = Fraction(3, 4)
    vocab_b2 = sum(b2.values())
    assert vocab_b2 == t  # continuation mass normalizes over bigram types
    # check a handful of contexts, including the heaviest
    for l in sorted(c1x, key=lambda k: -c1x[k])[:25]:
        seen = Fraction(0)
        for (ll, r), c in big.items():
            if ll == l:
                seen += (Fraction(c) - d) / c1x[l] + (
                    d * a1[l] / c1x[l]
                ) * Fraction(b2[r], t)
        unseen_mass = (d * a1[l] / c1x[l]) * Fraction(
            t - sum(b2[r] for (ll, r) in big if ll == l), t
        )
        assert seen + unseen_mass == 1


# ---------------------------------------------------------------------------
# bench contention hardening (round-12 VERDICT item 2)
# ---------------------------------------------------------------------------


def test_drift_adjust_separates_code_from_lockstep_drift():
    """The r12 failure mode: every untouched query drifted 1.05-1.41x in
    lockstep under host load. The median-drift normalization must read
    ~1.0 for the untouched queries and keep flagging the one real
    regression."""
    from bench import _drift_adjust

    deltas = {f"q{i}": 1.3 for i in range(10)}
    deltas["real_regression"] = 2.8
    drift, adj = _drift_adjust(deltas)
    assert drift == 1.3
    for i in range(10):
        assert adj[f"q{i}"] == 1.0
    assert adj["real_regression"] > 2.0

    # an idle session passes through untouched
    drift, adj = _drift_adjust({"a": 1.0, "b": 0.98, "c": 1.02})
    assert drift == 1.0 and adj["a"] == 1.0

    # empty deltas (no baseline) must not divide by zero
    assert _drift_adjust({}) == (1.0, {})


def test_contention_snapshot_trips_on_load5(monkeypatch):
    """r12 waited out load1 and still ran hot at load5 3.38 — a high
    5-minute average with a calm 1-minute one must now read contended so
    the idle wait keeps holding."""
    import os as _os

    import bench

    monkeypatch.setattr(_os, "getloadavg", lambda: (0.5, 3.5, 2.0))
    monkeypatch.setattr(_os, "listdir", lambda p: [])
    snap = bench._contention_snapshot()
    assert snap["contended"] and snap["load5"] == 3.5

    monkeypatch.setattr(_os, "getloadavg", lambda: (0.5, 1.0, 2.0))
    snap = bench._contention_snapshot()
    assert not snap["contended"]
