"""Connected-components operator: known graphs, convergence, determinism."""

from __future__ import annotations

from mapreduce__spark.operators.graph import connected_components


def cc_dict(spark, edges):
    df = spark.createDataFrame(edges, "id1 bigint, id2 bigint")
    return {r.node: r.component for r in connected_components(df).collect()}


def test_two_components(spark):
    got = cc_dict(spark, [(1, 2), (2, 3), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_chain_needs_multiple_rounds(spark):
    """A long path graph exercises >1 propagation round."""
    chain = [(i, i + 1) for i in range(1, 12)]
    got = cc_dict(spark, chain)
    assert set(got.values()) == {1}
    assert len(got) == 12


def test_cycle_and_orientation_invariance(spark):
    """Cycles converge; flipping edge orientation changes nothing."""
    a = cc_dict(spark, [(5, 6), (6, 7), (7, 5)])
    b = cc_dict(spark, [(6, 5), (7, 6), (5, 7)])
    assert a == b == {5: 5, 6: 5, 7: 5}


def test_empty_edges(spark):
    df = spark.createDataFrame([], "id1 bigint, id2 bigint")
    assert connected_components(df).collect() == []


def test_driver_and_distributed_paths_agree(spark):
    """The union-find fast path and the label-propagation loop must
    produce identical components (force the loop via driver_threshold=0)."""
    edges = [(i, i + 1) for i in range(1, 9)] + [(20, 21), (21, 22), (30, 31)]
    df = spark.createDataFrame(edges, "id1 bigint, id2 bigint")
    fast = {(r.node, r.component) for r in connected_components(df).collect()}
    dist = {
        (r.node, r.component)
        for r in connected_components(df, driver_threshold=0).collect()
    }
    assert fast == dist and len(fast) == 14  # 9 + 3 + 2 nodes


def test_propagate_mass_matches_hand_fold(spark):
    """k-superstep integer mass propagation on a tiny bipartite graph,
    checked against a single-threaded fold for k=1..4 (odd k ends
    s-keyed, even k c-keyed; checkpoint_every=2 exercises the
    mid-loop lineage truncation at k>=3)."""
    from mapreduce__spark.operators.graph import propagate_mass

    edges = [(1, 10), (1, 11), (2, 10), (3, 12)]
    df = spark.createDataFrame(edges, "c bigint, s bigint")

    def fold(k, initial=1_000_000):
        from collections import Counter

        dc = Counter(c for c, _ in edges)
        ds = Counter(s for _, s in edges)
        mass = {c: initial for c in dc}
        for i in range(k):
            nxt: Counter = Counter()
            if i % 2 == 0:
                for c, s in edges:
                    nxt[s] += mass[c] // dc[c]
            else:
                for c, s in edges:
                    if s in mass:
                        nxt[c] += mass[s] // ds[s]
            mass = dict(nxt)
        return mass

    for k in range(1, 5):
        got = {tuple(r) for r in propagate_mass(df, k=k).collect()}
        assert got == set(fold(k).items()), f"k={k}"


def test_propagate_mass_rejects_bad_k(spark):
    import pytest

    from mapreduce__spark.operators.graph import propagate_mass

    df = spark.createDataFrame([(1, 10)], "c bigint, s bigint")
    with pytest.raises(ValueError, match="k must be"):
        propagate_mass(df, k=0)


def test_distributed_cc_raises_when_unconverged(spark):
    """A component whose diameter exceeds max_iter must fail loudly —
    returning the still-moving labels would report one real cluster as
    several components (dedup would keep multiple representatives)."""
    import pytest

    chain = [(i, i + 1) for i in range(10)]
    edges = spark.createDataFrame(chain, "id1 bigint, id2 bigint")
    with pytest.raises(RuntimeError, match="still changing"):
        connected_components(edges, driver_threshold=0, max_iter=2)
    # the same graph converges with an adequate budget
    ok = connected_components(edges, driver_threshold=0, max_iter=12)
    assert {r.component for r in ok.collect()} == {0}


def test_driver_path_widens_mixed_key_types(spark):
    """src INT / dst BIGINT: the driver path must return the same widened
    schema the distributed unionAll coercion produces, and accept dst
    ids above 2^31."""
    from pyspark.sql import functions as F

    big = 5_000_000_000  # > 2^31
    edges = spark.createDataFrame([(1, big), (2, 3)], "id1 bigint, id2 bigint").select(
        F.col("id1").cast("int").alias("id1"), F.col("id2").alias("id2")
    )
    out = connected_components(edges)
    assert dict(out.dtypes) == {"node": "bigint", "component": "bigint"}
    got = {(r.node, r.component) for r in out.collect()}
    assert got == {(1, 1), (big, 1), (2, 2), (3, 2)}


# ---------------------------------------------------------------- triangles


from itertools import combinations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mapreduce__spark.operators.graph import count_triangles


def tri_dict(spark, edges):
    df = spark.createDataFrame(edges, "u bigint, v bigint")
    return {r.node: r.n_triangles for r in count_triangles(df).collect()}


def brute_triangles(edges):
    """Per-node triangle counts by enumerating all node triples."""
    adj = {frozenset(e) for e in edges if e[0] != e[1]}
    nodes = sorted({n for e in adj for n in e})
    counts: dict = {}
    for a, b, c in combinations(nodes, 3):
        if (
            frozenset((a, b)) in adj
            and frozenset((a, c)) in adj
            and frozenset((b, c)) in adj
        ):
            for n in (a, b, c):
                counts[n] = counts.get(n, 0) + 1
    return counts


def test_k4_every_node_in_three_triangles(spark):
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    assert tri_dict(spark, edges) == {1: 3, 2: 3, 3: 3, 4: 3}


def test_path_graph_has_no_triangles(spark):
    assert tri_dict(spark, [(1, 2), (2, 3), (3, 4)]) == {}


def test_two_triangles_sharing_an_edge(spark):
    edges = [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)]
    assert tri_dict(spark, edges) == {1: 1, 2: 2, 3: 2, 4: 1}


def test_triangle_orientation_invariance(spark):
    """Undirected semantics: flipping every input pair changes nothing."""
    a = tri_dict(spark, [(1, 2), (2, 3), (3, 1)])
    b = tri_dict(spark, [(2, 1), (3, 2), (1, 3)])
    assert a == b == {1: 1, 2: 1, 3: 1}


def test_hub_with_leaf_fan_has_no_triangles(spark):
    """A star graph is all wedges and no closures — the exact shape the
    degree orientation exists for (the hub never becomes an apex)."""
    assert tri_dict(spark, [(0, i) for i in range(1, 9)]) == {}


@given(
    st.sets(
        st.tuples(st.integers(0, 7), st.integers(0, 7)).filter(
            lambda e: e[0] < e[1]
        ),
        min_size=0,
        max_size=16,
    )
)
@settings(
    max_examples=10, deadline=None, suppress_health_check=list(HealthCheck)
)
def test_triangles_match_bruteforce(spark, edges):
    """Property: on random <=8-node graphs the degree-oriented count
    equals brute-force triple enumeration, per node."""
    assert tri_dict(spark, sorted(edges)) == brute_triangles(edges)


@given(
    st.sets(
        st.tuples(
            st.integers(min_value=0, max_value=11),
            st.integers(min_value=0, max_value=11),
        ).filter(lambda e: e[0] != e[1]),
        max_size=25,
    )
)
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
def test_kcore_driver_path_matches_distributed(spark, edges):
    """The KCORE_DRIVER_MAX_EDGES fast path is a pure materialization
    choice: on random graphs the NumPy driver peel and the distributed
    loop return identical (node, layer, residual_degree) rows."""
    from mapreduce__spark.operators.graph import k_core_layers

    if not edges:
        return
    df = spark.createDataFrame(sorted(edges), "u bigint, v bigint")

    def rows(threshold):
        return {
            (r.node, r.layer, r.residual_degree)
            for r in k_core_layers(
                df, 2, max_rounds=6, driver_threshold=threshold
            ).collect()
        }

    assert rows(10**6) == rows(0)


def test_kcore_fixtures_converge_inside_the_unroll(spark, sf_small):
    """The declared semantics are an exactly-KCORE_ROUNDS peel; this gate
    asserts the fixtures actually converge well inside it (so the query
    IS the true k-core there), and that the layer structure is sane:
    one row per node, layers within [0, KCORE_ROUNDS], core members'
    residual degrees all >= K and peeled members' all < K."""
    from pyspark.sql import functions as F

    from mapreduce__spark.plans.tier1 import KCORE_K, KCORE_ROUNDS, k_core_peel

    out = k_core_peel(spark, sf_small).localCheckpoint(eager=True)
    n_nodes = out.count()
    assert out.select("node").distinct().count() == n_nodes
    mx = out.agg(F.max("layer")).first()[0]
    assert mx <= KCORE_ROUNDS - 2, (
        f"fixture needed {mx} rounds — too close to the {KCORE_ROUNDS} unroll"
    )
    bad_core = out.where(
        (F.col("layer") == 0) & (F.col("residual_degree") < KCORE_K)
    ).count()
    bad_peel = out.where(
        (F.col("layer") > 0) & (F.col("residual_degree") >= KCORE_K)
    ).count()
    assert bad_core == 0 and bad_peel == 0
