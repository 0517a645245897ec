"""Iterative graph operators: connected components (dup clustering).

Near-duplicate detection emits PAIRS (MinHash-LSH, SimHash —
:mod:`.dedup`); a pipeline needs CLUSTERS: "keep one doc per group of
transitively-connected duplicates". That closure is connected
components — the canonical iterative DataFrame algorithm.

Implementation: min-label propagation. Every node starts labeled with
its own id; each round takes the min label over itself and its
neighbors; fixpoint in O(component diameter) rounds. Each round is one
shuffle (join + groupBy-min) — the same plan GraphX/GraphFrames
executes, with two scale-critical details made explicit:

- ``localCheckpoint`` per round truncates the plan lineage. Without it
  the logical plan doubles every iteration and the driver dies in the
  optimizer long before the executors break a sweat.
- Convergence is detected with a count of changed labels (one cheap
  aggregate per round), not a fixed iteration budget — real graphs
  have small diameters, so rounds ≈ 3-6.

Not in the reference (it has no iterative jobs at all); part of the
north-star dedup story (SURVEY.md §2.B bottom rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Components of an undirected graph; returns (node, component)
    where ``component`` is the minimum node id in the component —
    a deterministic, engine-independent canonical labeling.

    ``edges`` needs one row per edge (either direction); isolated nodes
    that appear in no edge are by definition not in the output (callers
    left-join and coalesce to the node's own id).
    """
    # Checkpointed: the union+distinct shuffle is the heaviest input
    # and is re-read twice per round (nbr_min join + next round) — the
    # same doctrine pagerank below applies to its static inputs.
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).union(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    ).distinct().localCheckpoint()
    labels = (
        sym.select(F.col("a").alias("node")).distinct().withColumn("label", F.col("node"))
    ).localCheckpoint()
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym.b == labels.node)
            .select(F.col("a").alias("node"), "label")
            .groupBy("node")
            .agg(F.min("label").alias("nbr_label"))
        )
        updated = (
            labels.join(nbr_min, "node", "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("nbr_label", "label")).alias("new_label"),
                "label",
            )
        ).localCheckpoint()
        n_changed = updated.filter(F.col("new_label") != F.col("label")).count()
        labels = updated.select("node", F.col("new_label").alias("label"))
        if n_changed == 0:
            break
    else:
        # Exhausting max_iter with changes still in flight means the
        # labels have NOT converged (a component with diameter >
        # max_iter would come back split into several "components" —
        # silently wrong dedup clusters, r7 review). Fail loudly.
        raise RuntimeError(
            f"connected_components: not converged after {max_iter} "
            "iterations (component diameter exceeds max_iter) — raise "
            "max_iter, or switch to the doubling/large-star variant "
            "for graphs this deep"
        )
    return labels.select("node", F.col("label").alias("component"))


def dedup_clusters(
    pairs: DataFrame,
    all_ids: DataFrame,
    id_col: str = "doc_id",
    left_col: str = "doc_a",
    right_col: str = "doc_b",
) -> DataFrame:
    """Duplicate-cluster assignment from a near-dup PAIR list: every doc
    gets a cluster id (min doc id of its transitive dup group; docs with
    no duplicate are their own cluster). The "keep min-id per cluster"
    policy this enables is the standard deterministic dedup witness."""
    comp = connected_components(pairs, src=left_col, dst=right_col)
    return all_ids.select(id_col).join(
        comp, F.col(id_col) == comp.node, "left"
    ).select(
        id_col, F.coalesce("component", F.col(id_col)).alias("cluster_id")
    )


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    iters: int = 8,
    damping: float = 0.85,
    round_scale: int = 9,
) -> DataFrame:
    """Weighted PageRank with uniform dangling-mass redistribution,
    run for a FIXED ``iters`` rounds (deterministic output, unlike a
    tolerance stop whose round count could differ across engines).
    Returns (node, r).

    Each round is the classic update
    ``r'(v) = (1-d)/N + d·(Σ_{u→v} r(u)·w(u,v)/outw(u) + mass/N)``
    where ``mass`` is the rank sitting on dangling nodes. Ranks are
    snapped to a ``round_scale``-dp grid (explicit half-up floor
    arithmetic, plans/core.py doctrine) after EVERY round: engines sum
    double contributions in different orders, and the per-round snap
    keeps that ulp drift from compounding — the same structure an
    ANSI-SQL oracle can replay as unrolled CTEs.

    Scale shape: the rank table is |nodes| rows while the heavy side is
    the edge list; every round is one join-aggregate over edges
    (hash-partitioned on src/dst) plus two tiny aggregates. Like
    :func:`connected_components`, each round's rank table is
    ``localCheckpoint``-ed: without lineage truncation the logical plan
    re-derives the full prefix every round and the OPTIMIZER (not the
    executors) becomes the bottleneck. The edge list and its
    out-weight/node/count satellites are checkpointed once up front —
    they are re-read 2·iters times.
    """
    w = F.col(weight).cast("double") if weight else F.lit(1.0)
    # Zero-weight edges carry no mass and would put ow=0 sources into
    # outw: the per-edge division then hits DIVIDE_BY_ZERO under ANSI
    # mode, and the dangling-mass test (membership in outw) would miss
    # them (r7 review). Dropped BEFORE nodes are derived so an all-zero
    # source is treated as dangling — unless it also appears as a dst.
    all_nodes = edges.select(F.col(src).alias("node")).union(
        edges.select(F.col(dst).alias("node"))
    )
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"), w.alias("w"))
        .filter(F.col("w") != 0)
        .localCheckpoint()
    )
    outw = e.groupBy("src").agg(F.sum("w").alias("ow")).localCheckpoint()
    nodes = all_nodes.distinct().localCheckpoint()
    cnt = nodes.agg(F.count("*").alias("n"))

    m = float(10**round_scale)

    def snap(col):
        return F.floor(col * m + F.lit(0.5)) / m

    ranks = nodes.crossJoin(F.broadcast(cnt)).select(
        "node", snap(F.lit(1.0) / F.col("n")).alias("r")
    )
    base, d = 1.0 - damping, damping
    for _ in range(iters):
        contrib = (
            e.join(outw, "src")
            .join(ranks.select(F.col("node").alias("src"), "r"), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("r") * F.col("w") / F.col("ow")).alias("contrib"))
        )
        mass = (
            ranks.join(outw, ranks.node == outw.src, "left_anti")
            .agg(F.coalesce(F.sum("r"), F.lit(0.0)).alias("mass"))
        )
        ranks = (
            nodes.join(contrib.withColumnRenamed("dst", "node"), "node", "left")
            .crossJoin(F.broadcast(cnt))
            .crossJoin(F.broadcast(mass))
            .select(
                "node",
                snap(
                    F.lit(base) / F.col("n")
                    + F.lit(d)
                    * (
                        F.coalesce(F.col("contrib"), F.lit(0.0))
                        + F.col("mass") / F.col("n")
                    )
                ).alias("r"),
            )
        ).localCheckpoint()
    return ranks
