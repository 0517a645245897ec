"""Graph-operator tests: connected components (transitive closure on
chains, multiple components, isolated nodes, determinism) and PageRank
(conservation, known closed forms, dangling mass). Cross-engine parity
is covered by the ns_dup_clusters recursive-CTE oracle and the
ns_pagerank_events unrolled-CTE oracle."""

from __future__ import annotations

import pytest

from map_reduce_framework_using_python_spark.operators.graph import (
    connected_components,
    dedup_clusters,
    pagerank,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_chain_collapses_to_one_component(spark):
    # 0-1-2-3-4-5: diameter 5 forces several propagation rounds.
    comp = {
        r["node"]: r["component"]
        for r in connected_components(_edges(spark, [(i, i + 1) for i in range(5)])).collect()
    }
    assert comp == {i: 0 for i in range(6)}


def test_two_components_and_direction_independence(spark):
    # Component {1,2,3} built with mixed edge directions; {10, 11} separate.
    comp = {
        r["node"]: r["component"]
        for r in connected_components(_edges(spark, [(2, 1), (2, 3), (11, 10)])).collect()
    }
    assert comp == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_dedup_clusters_covers_isolated_docs(spark):
    all_ids = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    pairs = spark.createDataFrame([(0, 3), (3, 5)], "doc_a long, doc_b long")
    got = {r["doc_id"]: r["cluster_id"] for r in dedup_clusters(pairs, all_ids).collect()}
    assert got == {0: 0, 3: 0, 5: 0, 1: 1, 2: 2, 4: 4}


def test_components_deterministic_across_runs(spark):
    edges = _edges(spark, [(i, (i * 7) % 50) for i in range(50)])
    a = sorted(tuple(r) for r in connected_components(edges).collect())
    b = sorted(tuple(r) for r in connected_components(edges).collect())
    assert a == b


def test_components_match_union_find_on_random_graphs(spark):
    """Property check: min-label propagation equals a union-find ground
    truth over a batch of pseudo-random graphs (fixed seeds — includes
    chains, stars, cycles, and disconnected pieces by construction)."""
    import random

    def union_find_components(n_nodes, pairs):
        parent = list(range(n_nodes))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        # Canonical label = min node id in component.
        label = {}
        for node in {x for p in pairs for x in p}:
            root = find(node)
            label.setdefault(root, min(
                n for n in range(n_nodes) if find(n) == root
            ))
        return {node: label[find(node)] for node in {x for p in pairs for x in p}}

    for seed in (7, 21, 99):
        rng = random.Random(seed)
        n = 60
        pairs = sorted({(rng.randrange(n), rng.randrange(n)) for _ in range(45)})
        pairs = [(a, b) for a, b in pairs if a != b]
        got = {
            r["node"]: r["component"]
            for r in connected_components(_edges(spark, pairs)).collect()
        }
        assert got == union_find_components(n, pairs), f"seed {seed}"


def _ranks(df):
    return {r["node"]: r["r"] for r in df.collect()}


def test_pagerank_conserves_total_mass(spark):
    # No dangling nodes (cycle) → total rank stays 1 each round up to
    # the per-round 9-dp snap (|nodes| · 5e-10 worst case).
    pr = _ranks(pagerank(_edges(spark, [(0, 1), (1, 2), (2, 0)])))
    assert sum(pr.values()) == pytest.approx(1.0, abs=1e-8)
    # Symmetric cycle → uniform ranks exactly.
    assert all(v == pytest.approx(1 / 3, abs=1e-8) for v in pr.values())


def test_pagerank_star_closed_form(spark):
    # Star 1..4 → 0: leaves keep only the base share, the hub gets
    # base + d·(leaf contribs + its own dangling mass / n).  Iterate the
    # closed-form recurrence in Python with the same 9-dp snapping.
    pr = _ranks(pagerank(_edges(spark, [(i, 0) for i in range(1, 5)]), iters=8))
    n, d = 5, 0.85

    def snap(x):
        import math

        return math.floor(x * 1e9 + 0.5) / 1e9

    leaf = hub = snap(1 / n)
    for _ in range(8):
        mass = hub  # node 0 has no out-edges
        new_leaf = snap((1 - d) / n + d * (mass / n))
        new_hub = snap((1 - d) / n + d * (4 * leaf + mass / n))
        leaf, hub = new_leaf, new_hub
    assert pr[0] == pytest.approx(hub, abs=1e-9)
    for i in range(1, 5):
        assert pr[i] == pytest.approx(leaf, abs=1e-9)
    assert pr[0] > pr[1]


def test_pagerank_weighted_split(spark):
    # 0 sends 3/4 of its rank to 1 and 1/4 to 2; 1 and 2 return to 0.
    # Heavier edge → strictly larger rank, and weights beat edge count.
    edges = spark.createDataFrame(
        [(0, 1, 3.0), (0, 2, 1.0), (1, 0, 1.0), (2, 0, 1.0)],
        "src long, dst long, w double",
    )
    pr = _ranks(pagerank(edges, weight="w"))
    assert pr[1] > pr[2]
    assert sum(pr.values()) == pytest.approx(1.0, abs=1e-8)


def test_pagerank_deterministic_across_runs(spark):
    edges = _edges(spark, [(i, (i * 7 + 3) % 23) for i in range(40)])
    a = sorted(_ranks(pagerank(edges)).items())
    b = sorted(_ranks(pagerank(edges)).items())
    assert a == b


def test_connected_components_raises_on_non_convergence(spark):
    """r7 review: a component whose diameter exceeds max_iter must FAIL
    loudly, not return silently split labels (which dedup_clusters
    would read as several distinct duplicate groups)."""
    import pytest

    chain = [(i, i + 1) for i in range(8)]  # path graph, diameter 8
    edges = spark.createDataFrame(chain, "src INT, dst INT")
    with pytest.raises(RuntimeError, match="not converged"):
        connected_components(edges, max_iter=3)
    # enough rounds: one component labeled by the min id
    ok = connected_components(edges, max_iter=10)
    assert {r["component"] for r in ok.collect()} == {0}


def test_pagerank_zero_weight_edges_are_dangling(spark):
    """r7 operators review: a source whose only out-edge has weight 0
    divided by zero under ANSI mode (task death) — zero-weight edges
    now drop, making such a node dangling, and ranks still sum to 1."""
    from map_reduce_framework_using_python_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [("a", "b", 0.0), ("b", "a", 1.0)], "src string, dst string, w double"
    )
    ranks = {r["node"]: r["r"] for r in
             pagerank(edges, src="src", dst="dst", weight="w", iters=3).collect()}
    assert set(ranks) == {"a", "b"}
    assert abs(sum(ranks.values()) - 1.0) < 1e-4
