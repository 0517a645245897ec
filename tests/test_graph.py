"""Connected-components tests: transitive closure on chains, multiple
components, isolated nodes, and determinism. Cross-engine parity is
covered by the ns_dup_clusters recursive-CTE oracle."""

from __future__ import annotations

from map_reduce_framework_using_python_spark.operators.graph import (
    connected_components,
    dedup_clusters,
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
