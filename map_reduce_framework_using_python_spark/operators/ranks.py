"""Scale-safe global ranking: bucketed row_number / ntile without a
single-partition window.

A global ``row_number() OVER (ORDER BY ...)`` funnels every row through
ONE task (`WindowExec: No Partition Defined`) — correct at sf0.1, dead
at 100 TB. The classic distributed form (what the reference's users
would hand-write as a two-pass MR job) is:

1. derive a **bucket** from the sort key itself with a deterministic,
   order-consistent function (``bucket(a) <= bucket(b)`` whenever ``a``
   sorts before ``b``) — no sampling pass, no RangePartitioner
   nondeterminism;
2. ``row_number`` *within* each bucket (hash-partitioned window — every
   executor ranks its own buckets);
3. per-bucket counts → prefix-sum offsets via a broadcast triangular
   self-join over the (tiny, bounded) bucket list;
4. ``global_rank = bucket_offset + local_rank``.

Everything stays lazy and JVM-side: the only extra exchanges are the
bucket-count aggregate (≤ a few hundred rows) and the window's hash
partitioning. No ``collect()``, no global window, no driver loop — the
plan survives a 1000-executor 100 TB run, where bucket count should be
scaled with the cluster (more md5-prefix chars / finer value widths).

Derived global functions on top of (rank, n_total):

- ``ntile(k)``  = SQL semantics: first ``n mod k`` tiles get one extra row
- ``percent_rank`` = (rank-1)/(n-1)    (total orders only — no tie groups)
- ``cume_dist``    = rank/n            (ditto)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "bucketed_rank",
    "bucketed_rank_grouped",
    "bucketed_cumsum",
    "ntile_from_rank",
]


def bucketed_rank(
    df: DataFrame,
    bucket: Column,
    order_by: list[Column],
    rank_col: str = "rn",
    total_col: str = "n_total",
) -> DataFrame:
    """Attach a global ``rank_col`` (1-based, dense ROW_NUMBER over the
    total order) and ``total_col`` (global row count) to ``df``.

    ``bucket`` must be an order-consistent function of the sort key:
    monotone non-decreasing along ``order_by``. For a DESC numeric key
    pass e.g. ``F.floor(-col / width)``; for an md5 hex key pass
    ``F.substring(key, 1, 2)`` (prefix order == full-string order).

    ``order_by`` must be a TOTAL order over the rows (include a unique
    tiebreak key) or downstream rank consumers become nondeterministic.

    Sort keys must be NON-NULL: a null key yields a null bucket, which
    the offset join and the triangular prefix-sum both exclude (null
    comparisons) — that would silently DROP those rows, so a null
    bucket fails fast instead (``raise_error`` inside the bucket
    expression; the global windows this replaces ranked NULLs first —
    callers that want ranked nulls must coalesce to a sentinel that
    sorts accordingly).
    """
    b = df.withColumn(
        "_rk_bucket",
        F.coalesce(
            bucket,
            F.raise_error(
                F.lit("bucketed_rank: NULL sort key/bucket — order keys must be non-null")
            ),
        ),
    )
    w = Window.partitionBy("_rk_bucket").orderBy(*order_by)
    local = b.withColumn("_rk_local", F.row_number().over(w))

    counts = b.groupBy("_rk_bucket").agg(F.count("*").alias("_rk_cnt"))
    ca = counts.select(
        F.col("_rk_bucket").alias("_rk_a"), F.col("_rk_cnt").alias("_rk_a_cnt")
    )
    cb = counts.select(
        F.col("_rk_bucket").alias("_rk_b"), F.col("_rk_cnt").alias("_rk_b_cnt")
    )
    # Prefix sum over the bounded bucket list: triangular broadcast join
    # (buckets × buckets, both tiny) — no window, stays fully lazy.
    offsets = (
        ca.join(F.broadcast(cb), F.col("_rk_b") < F.col("_rk_a"), "left")
        .groupBy("_rk_a")
        .agg(F.coalesce(F.sum("_rk_b_cnt"), F.lit(0)).alias("_rk_offset"))
    )
    total = counts.agg(F.sum("_rk_cnt").alias(total_col))

    return (
        local.join(F.broadcast(offsets), local["_rk_bucket"] == offsets["_rk_a"])
        .crossJoin(F.broadcast(total))
        .withColumn(rank_col, F.col("_rk_offset") + F.col("_rk_local"))
        .drop("_rk_bucket", "_rk_local", "_rk_a", "_rk_offset")
    )


def bucketed_rank_grouped(
    df: DataFrame,
    group_cols: list[str],
    bucket: Column,
    order_by: list[Column],
    rank_col: str = "rn",
    total_col: str = "n_total",
) -> DataFrame:
    """Per-group ``row_number`` + group row count without a per-group
    single-task window.

    ``PARTITION BY group`` windows are the grouped cousin of the global
    window scale-killer: with few, heavy groups (e.g. 5 event types over
    100 TB) each group funnels through ONE task. This composes the same
    two-pass shape as :func:`bucketed_rank` but keyed on
    (group, bucket): the window hash-partitions on the composite key
    (heavy groups split across ``bucket``), and the prefix-sum join is
    per-group over the bounded bucket list. Same contracts: ``bucket``
    order-consistent along ``order_by`` within every group, ``order_by``
    a total order, sort keys non-null (fail-fast).
    """
    if not group_cols:
        raise ValueError(
            "bucketed_rank_grouped: group_cols must be non-empty — "
            "use bucketed_rank for a global rank"
        )
    b = df.withColumn(
        "_rg_bucket",
        F.coalesce(
            bucket,
            F.raise_error(
                F.lit(
                    "bucketed_rank_grouped: NULL sort key/bucket — order keys must be non-null"
                )
            ),
        ),
    )
    w = Window.partitionBy(*group_cols, "_rg_bucket").orderBy(*order_by)
    local = b.withColumn("_rg_local", F.row_number().over(w))

    counts = b.groupBy(*group_cols, "_rg_bucket").agg(F.count("*").alias("_rg_cnt"))
    ca = counts.select(
        *[F.col(g).alias(f"_rg_ga_{g}") for g in group_cols],
        F.col("_rg_bucket").alias("_rg_a"),
        F.col("_rg_cnt").alias("_rg_a_cnt"),
    )
    cb = counts.select(
        *[F.col(g).alias(f"_rg_gb_{g}") for g in group_cols],
        F.col("_rg_bucket").alias("_rg_b"),
        F.col("_rg_cnt").alias("_rg_b_cnt"),
    )
    same_group = [
        F.col(f"_rg_ga_{g}").eqNullSafe(F.col(f"_rg_gb_{g}")) for g in group_cols
    ]
    lower = F.col("_rg_b") < F.col("_rg_a")
    cond = same_group[0]
    for c in same_group[1:]:
        cond = cond & c
    offsets = (
        ca.join(F.broadcast(cb), cond & lower, "left")
        .groupBy(*[f"_rg_ga_{g}" for g in group_cols], "_rg_a")
        .agg(F.coalesce(F.sum("_rg_b_cnt"), F.lit(0)).alias("_rg_offset"))
    )
    totals = counts.groupBy(*group_cols).agg(F.sum("_rg_cnt").alias(total_col))
    tot = totals.select(
        *[F.col(g).alias(f"_rg_gt_{g}") for g in group_cols], total_col
    )

    joined = local.join(
        F.broadcast(offsets),
        [local[g].eqNullSafe(offsets[f"_rg_ga_{g}"]) for g in group_cols]
        + [local["_rg_bucket"] == offsets["_rg_a"]],
    ).join(
        F.broadcast(tot),
        [local[g].eqNullSafe(tot[f"_rg_gt_{g}"]) for g in group_cols],
    )
    return joined.withColumn(rank_col, F.col("_rg_offset") + F.col("_rg_local")).drop(
        "_rg_bucket",
        "_rg_local",
        "_rg_a",
        "_rg_offset",
        *[f"_rg_ga_{g}" for g in group_cols],
        *[f"_rg_gt_{g}" for g in group_cols],
    )


def bucketed_cumsum(
    df: DataFrame,
    bucket: Column,
    order_by: list[Column],
    weight: Column,
    cum_col: str = "cum",
) -> DataFrame:
    """Attach a global inclusive running ``sum(weight)`` over the total
    order ``order_by`` — the cumulative-sum sibling of
    :func:`bucketed_rank` (same two-pass distributed shape: per-bucket
    window + broadcast triangular prefix-sum over bucket totals), with
    the same contracts: ``bucket`` order-consistent along ``order_by``,
    ``order_by`` a TOTAL order, sort keys non-null (fail-fast).

    ``bucketed_rank`` is the ``weight = 1`` special case; it stays a
    separate code path so the already-driver-verified rank queries keep
    their exact plan. ``weight`` must be non-negative integral for the
    exclusive-start use (``cum - weight``) to stay on the int grid.
    """
    b = df.withColumn(
        "_cs_bucket",
        F.coalesce(
            bucket,
            F.raise_error(
                F.lit("bucketed_cumsum: NULL sort key/bucket — order keys must be non-null")
            ),
        ),
    ).withColumn("_cs_w", weight)
    w = (
        Window.partitionBy("_cs_bucket")
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = b.withColumn("_cs_local", F.sum("_cs_w").over(w))

    totals = b.groupBy("_cs_bucket").agg(F.sum("_cs_w").alias("_cs_tot"))
    ta = totals.select(
        F.col("_cs_bucket").alias("_cs_a"), F.col("_cs_tot").alias("_cs_a_tot")
    )
    tb = totals.select(
        F.col("_cs_bucket").alias("_cs_b"), F.col("_cs_tot").alias("_cs_b_tot")
    )
    offsets = (
        ta.join(F.broadcast(tb), F.col("_cs_b") < F.col("_cs_a"), "left")
        .groupBy("_cs_a")
        .agg(F.coalesce(F.sum("_cs_b_tot"), F.lit(0)).alias("_cs_offset"))
    )
    return (
        local.join(F.broadcast(offsets), local["_cs_bucket"] == offsets["_cs_a"])
        .withColumn(cum_col, F.col("_cs_offset") + F.col("_cs_local"))
        .drop("_cs_bucket", "_cs_w", "_cs_local", "_cs_a", "_cs_offset")
    )


def ntile_from_rank(rank: Column, n: Column, k: int) -> Column:
    """SQL ``ntile(k)`` recomputed from a global (rank, total) pair:
    ``n div k`` base rows per tile, the first ``n mod k`` tiles take one
    extra. Exact integer arithmetic (doubles stay exact below 2^53)."""
    q = F.floor(n / k)  # base tile size
    r = n - q * k  # tiles that get one extra row
    big = q + 1
    # greatest(q, 1): when n < k the otherwise-branch is never selected,
    # but ANSI mode must still not see a divide-by-zero expression.
    return (
        F.when(rank <= r * big, F.floor((rank - 1) / big) + 1)
        .otherwise(r + F.floor((rank - r * big - 1) / F.greatest(q, F.lit(1))) + 1)
        .cast("int")
    )


def bucketed_cumsum_grouped(
    df: DataFrame,
    group_cols: list[str],
    bucket: Column,
    order_by: list[Column],
    weight: Column,
    cum_col: str = "cum",
) -> DataFrame:
    """Per-group inclusive running ``sum(weight)`` over the total order
    ``order_by`` within each group — the weighted sibling of
    :func:`bucketed_rank_grouped` (r15, the stats-lane histogram
    restructure): the window hash-partitions on (group, bucket) so a
    heavy group never funnels through one task, and the prefix-sum join
    is per-group over the bounded bucket list. Same contracts:
    ``bucket`` order-consistent along ``order_by`` within every group,
    ``order_by`` a total order, sort keys non-null (fail-fast);
    ``weight`` non-negative integral so exclusive starts
    (``cum - weight``) stay on the integer grid."""
    if not group_cols:
        raise ValueError(
            "bucketed_cumsum_grouped: group_cols must be non-empty — "
            "use bucketed_cumsum for a global running sum"
        )
    b = df.withColumn(
        "_cg_bucket",
        F.coalesce(
            bucket,
            F.raise_error(
                F.lit(
                    "bucketed_cumsum_grouped: NULL sort key/bucket — "
                    "order keys must be non-null"
                )
            ),
        ),
    ).withColumn("_cg_w", weight)
    w = (
        Window.partitionBy(*group_cols, "_cg_bucket")
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = b.withColumn("_cg_local", F.sum("_cg_w").over(w))

    totals = b.groupBy(*group_cols, "_cg_bucket").agg(
        F.sum("_cg_w").alias("_cg_tot")
    )
    ta = totals.select(
        *[F.col(g).alias(f"_cg_ga_{g}") for g in group_cols],
        F.col("_cg_bucket").alias("_cg_a"),
    )
    tb = totals.select(
        *[F.col(g).alias(f"_cg_gb_{g}") for g in group_cols],
        F.col("_cg_bucket").alias("_cg_b"),
        F.col("_cg_tot").alias("_cg_b_tot"),
    )
    cond = ta[f"_cg_ga_{group_cols[0]}"].eqNullSafe(tb[f"_cg_gb_{group_cols[0]}"])
    for g in group_cols[1:]:
        cond = cond & ta[f"_cg_ga_{g}"].eqNullSafe(tb[f"_cg_gb_{g}"])
    offsets = (
        ta.join(F.broadcast(tb), cond & (F.col("_cg_b") < F.col("_cg_a")), "left")
        .groupBy(*[f"_cg_ga_{g}" for g in group_cols], "_cg_a")
        .agg(F.coalesce(F.sum("_cg_b_tot"), F.lit(0)).alias("_cg_offset"))
    )
    joined = local.join(
        F.broadcast(offsets),
        [local[g].eqNullSafe(offsets[f"_cg_ga_{g}"]) for g in group_cols]
        + [local["_cg_bucket"] == offsets["_cg_a"]],
    )
    return joined.withColumn(cum_col, F.col("_cg_offset") + F.col("_cg_local")).drop(
        "_cg_bucket",
        "_cg_w",
        "_cg_local",
        "_cg_a",
        "_cg_offset",
        *[f"_cg_ga_{g}" for g in group_cols],
    )
