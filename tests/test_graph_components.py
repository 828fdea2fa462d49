"""connected_components (operators/graph.py) vs a pure-Python
union-find reference on adversarial graph shapes the corpus query
never produces: long chains (worst-case diameter for plain
propagation — the pointer-jump's reason to exist), stars, cycles,
disjoint singleton-rich forests, and random seeded graphs."""

from __future__ import annotations

import random

from log2sql_spark.operators.graph import connected_components


def _union_find(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min node id of the component
    comp = {}
    for n in nodes:
        r = find(n)
        comp.setdefault(r, []).append(n)
    return {n: min(members) for r, members in comp.items() for n in members}


def _check(spark, edges):
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    expect = _union_find(edges, nodes)
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {r.node: r.label for r in connected_components(df).collect()}
    assert got == expect


def test_long_chain(spark):
    # diameter 40: plain propagation needs 40 rounds, the jump ~log2
    _check(spark, [(i, i + 1) for i in range(40)])


def test_star_and_cycle_and_islands(spark):
    star = [(100, 100 + i) for i in range(1, 8)]
    cycle = [(200 + i, 200 + (i + 1) % 6) for i in range(6)]
    pair = [(900, 901)]
    _check(spark, star + cycle + pair)


def test_random_graphs_match_union_find(spark):
    rng = random.Random(42)
    for trial in range(3):
        n = 60
        nodes = list(range(trial * 1000, trial * 1000 + n))
        edges = [
            (rng.choice(nodes), rng.choice(nodes)) for _ in range(n // 2)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        if not edges:
            continue
        _check(spark, edges)


# ---------------------------------------------------------------------------
# kcore (operators/graph.py) vs a pure-Python parallel-peel reference
# ---------------------------------------------------------------------------

def _peel_ref(edges, k):
    """Reference parallel peel: drop ALL deg<k nodes per round until
    stable; return {node: core_degree} for survivors."""
    from collections import defaultdict

    adj = defaultdict(set)
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    alive = set(adj)
    while True:
        drop = {v for v in alive if len(adj[v] & alive) < k}
        if not drop:
            break
        alive -= drop
    return {v: len(adj[v] & alive) for v in alive}


def _check_kcore(spark, edges, k):
    from log2sql_spark.operators.graph import kcore

    expect = _peel_ref(edges, k)
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {r.node: r.core_degree for r in kcore(df, k=k).collect()}
    assert got == expect


def test_kcore_tree_has_no_2core(spark):
    # a tree peels to nothing at k=2 (no cycles), over many rounds
    _check_kcore(spark, [(i, (i - 1) // 2) for i in range(1, 32)], 2)


def test_kcore_cycle_plus_pendants(spark):
    # the cycle survives k=2 exactly; every pendant chain peels away
    cycle = [(i, (i + 1) % 6) for i in range(6)]
    pendants = [(i, 100 + i) for i in range(6)] + [(100 + i, 200 + i) for i in range(6)]
    _check_kcore(spark, cycle + pendants, 2)


def test_kcore_clique_keeps_full_degree(spark):
    # K5 is its own 4-core; also check k above the max degree empties it
    k5 = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    _check_kcore(spark, k5, 4)
    _check_kcore(spark, k5, 5)


def test_kcore_random_graphs_match_reference(spark):
    import random

    rng = random.Random(7)
    for trial in range(3):
        nodes = list(range(trial * 500, trial * 500 + 40))
        edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(70)]
        edges = [(a, b) for a, b in edges if a != b]
        for k in (2, 3):
            _check_kcore(spark, edges, k)


def test_kcore_self_loops_do_not_inflate_degree(spark):
    """A self-loop must not let a node count itself as a neighbor
    (standard k-core semantics, matching _peel_ref's a != b strip):
    a pendant with a self-loop still peels out of the 2-core."""
    cycle = [(i, (i + 1) % 4) for i in range(4)]
    edges = cycle + [(0, 100), (100, 100), (100, 100)]
    _check_kcore(spark, edges, 2)  # _peel_ref strips a==b itself


def test_kcore_raises_on_nonconvergence_and_bad_max_rounds(spark):
    """Non-convergence within max_rounds raises instead of silently
    returning an unconverged superset; max_rounds < 1 is rejected."""
    import pytest

    from log2sql_spark.operators.graph import kcore

    # a 32-node path peels one layer per round from each end: needs
    # ~16 rounds, so max_rounds=3 cannot converge
    chain = [(i, i + 1) for i in range(31)]
    df = spark.createDataFrame(chain, "src bigint, dst bigint")
    with pytest.raises(RuntimeError, match="did not converge"):
        kcore(df, k=2, max_rounds=3)
    with pytest.raises(ValueError, match="max_rounds"):
        kcore(df, k=2, max_rounds=0)
