"""Hypothesis property tests for the round-8 operators — independent
pure-Python references over random inputs (the non-mirrored layer; see
test_round7_properties.py's header for the rationale)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _lev(a: str, b: str) -> int:
    """Textbook Wagner–Fischer — the third, independent implementation
    (Spark uses Commons Lang, DuckDB its own)."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


# tiny alphabet + short strings around the completeness floor (6 chars
# at k=2/q=2) — the regime where the gram filter's losslessness is
# easiest to break and gram collisions are densest; includes repetitive
# strings ("aaaaaa") whose DISTINCT gram count is far below their
# positional gram count, the case the completeness argument must not
# depend on
_name = st.text(alphabet="ab", min_size=6, max_size=9)
_names = st.lists(_name, min_size=2, max_size=8)


@given(_names)
@settings(
    max_examples=12, deadline=None, suppress_health_check=list(HealthCheck)
)
def test_fuzzy_join_lossless_on_random_strings(spark, names):
    """fuzzy_self_join == naive all-pairs Wagner–Fischer on random
    dense-collision strings at the completeness floor: the gram-count
    filter must drop NO true pair and the verify must add none."""
    from mapreduce__spark.operators.fuzzy import fuzzy_self_join

    rows = [(i, nm) for i, nm in enumerate(names)]
    df = spark.createDataFrame(rows, "id bigint, nm string")
    got = {
        (r.key1, r.key2, r.edit_distance)
        for r in fuzzy_self_join(df, "id", "nm", 2, q=2).collect()
    }
    want = {
        (i, j, _lev(a, b))
        for i, a in rows
        for j, b in rows
        if i < j and _lev(a, b) <= 2
    }
    assert got == want


def _kmeans_py(vecs, k, iters):
    """Pure-Python integer Lloyd's (the third implementation — Spark
    expressions and unrolled DuckDB SQL are the other two)."""
    import math

    OFF = 1 << 21
    q = {
        vid: [math.floor(float(x) * 1_000_000) + OFF for x in v]
        for vid, v in vecs.items()
    }
    cents = [list(q[vid]) for vid in sorted(q)[:k]]

    def assign():
        return {
            vid: min(
                (sum((a - b) * (a - b) for a, b in zip(eq, c)), j)
                for j, c in enumerate(cents)
            )
            for vid, eq in q.items()
        }

    for _ in range(iters):
        a = assign()
        for j in range(k):
            mem = [q[v] for v, (_, c) in a.items() if c == j]
            if mem:
                cents[j] = [sum(col) // len(mem) for col in zip(*mem)]
    return {v: (c, d) for v, (d, c) in assign().items()}


# coarse grid values force distance TIES (the argmin tie-break path)
# and duplicate vectors force EMPTY clusters
_vec = st.lists(
    st.sampled_from([-0.25, -0.1, 0.0, 0.1, 0.25]), min_size=3, max_size=3
)
_vecs = st.lists(_vec, min_size=4, max_size=10)


@given(_vecs, st.integers(min_value=2, max_value=3))
@settings(
    max_examples=10, deadline=None, suppress_health_check=list(HealthCheck)
)
def test_kmeans_matches_python_on_random_grids(spark, vecs, k):
    """kmeans_assign == pure-Python integer Lloyd's on random coarse-grid
    vectors: ties, duplicate seeds, and empty clusters all land on the
    same deterministic answer."""
    from mapreduce__spark.operators.clustering import kmeans_assign

    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    narrowed = {r.vec_id: list(r.embedding) for r in df.collect()}
    got = {
        r.vec_id: (r.cluster_id, r.dist2)
        for r in kmeans_assign(df, k, 2).collect()
    }
    assert got == _kmeans_py(narrowed, k, 2)


# -------------------------------------------------- prefix-filter jaccard

# Docs over a tiny vocabulary with lengths just past the 3-gram floor:
# distinct-gram sets collide densely and prefixes are 1-2 grams long —
# the regime where an off-by-one in the prefix length formula
# (|d| - ceil(t|d|) + 1) would actually drop a qualifying pair.
_doc = st.lists(
    st.sampled_from(["x", "y", "z"]), min_size=3, max_size=8
).map(" ".join)
_docs = st.lists(_doc, min_size=2, max_size=7)


def _grams3(text: str) -> frozenset[str]:
    toks = text.split(" ")
    return frozenset(
        " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
    )


@given(_docs)
@settings(
    max_examples=12, deadline=None, suppress_health_check=list(HealthCheck)
)
def test_prefix_filter_jaccard_lossless(spark, texts):
    """prefix_filter_jaccard_pairs == brute-force set Jaccard on random
    dense-collision docs: the prefix candidate join must drop NO
    qualifying pair (the two-sided prefix lemma) and the integer verify
    must admit none below threshold."""
    from mapreduce__spark.operators.dedup import prefix_filter_jaccard_pairs

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        (r.id1, r.id2, r.n_common, r.size_a, r.size_b)
        for r in prefix_filter_jaccard_pairs(df, 4, 5).collect()
    }
    want = set()
    for i, a in rows:
        for j, b in rows:
            if i >= j:
                continue
            ga, gb = _grams3(a), _grams3(b)
            inter = len(ga & gb)
            # J >= 4/5 as exact integers: 9*inter >= 4*(|A|+|B|)
            if ga and gb and 9 * inter >= 4 * (len(ga) + len(gb)):
                want.add((i, j, inter, len(ga), len(gb)))
    assert got == want
