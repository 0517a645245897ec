"""Window functions: ranking, analytic (lag/lead/first/last), running
aggregates, row/range frames, ntile/percent_rank, top-k per group.

Reference equivalent: the per-partition sort (op 5, ``worker_v1.py:184-191``)
followed by a stateful streaming reducer (op 6) that remembers previous
lines — SURVEY.md §2.B "Window" rows. Spark's window exec does the same
sort-within-partition after hashing on the partition key, but with
spill-safe buffering and whole-stage codegen.

Every window rides on a TOTAL order (unique tiebreak keys) so results
are deterministic and oracle-comparable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from map_reduce_framework_using_python_spark.operators.ranks import bucketed_rank, ntile_from_rank
from map_reduce_framework_using_python_spark.plans.core import half_up, query, t


@query(
    "q_window_rank",
    oracle="""
        SELECT c_custkey, c_nationkey, c_acctbal,
               row_number()  OVER w AS rn,
               rank()        OVER w AS rnk,
               dense_rank()  OVER w AS drnk
        FROM customer
        WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
    """,
    tags=("window", "rank"),
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number/rank/dense_rank per nation by balance."""
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


@query(
    "q_window_lag_lead",
    oracle="""
        SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
               lag(l_extendedprice)  OVER w AS prev_price,
               lead(l_extendedprice) OVER w AS next_price
        FROM lineitem
        WINDOW w AS (PARTITION BY l_suppkey
                     ORDER BY l_shipdate, l_orderkey, l_linenumber,
                              l_extendedprice)
    """,
    tags=("window", "analytic"),
)
def q_window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead over a per-supplier shipment timeline.

    The synthetic lineitem does NOT keep (l_orderkey, l_linenumber)
    unique (11.8k dup pairs at sf0.01), so the ordering includes
    l_extendedprice to stay total over the OUTPUT columns — a non-total
    window order makes lag/lead run-to-run nondeterministic (caught by
    a repeated-sweep flake at sf0.1, one tie in 600k rows)."""
    w = Window.partitionBy("l_suppkey").orderBy(
        "l_shipdate", "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    return t(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        "l_extendedprice",
        F.lag("l_extendedprice").over(w).alias("prev_price"),
        F.lead("l_extendedprice").over(w).alias("next_price"),
    )


@query(
    "q_window_running",
    oracle="""
        SELECT o_custkey, o_orderkey,
               round(sum(o_totalprice) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend,
               count(*) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS order_seq
        FROM orders
    """,
    tags=("window", "frame"),
)
def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running (cumulative) aggregate with an explicit ROWS frame."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
        F.count("*").over(w).alias("order_seq"),
    )


@query(
    "q_window_range_frame",
    oracle="""
        SELECT o_orderkey, o_orderstatus, o_totalprice,
               count(*) OVER (
                   PARTITION BY o_orderstatus ORDER BY o_totalprice
                   RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW) AS n_within_10k
        FROM orders
    """,
    tags=("window", "frame", "range"),
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-based RANGE frame: peers within $10k below each order."""
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice").rangeBetween(-10000, 0)
    return t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.count("*").over(w).alias("n_within_10k"),
    )


@query(
    "q_window_ntile",
    oracle="""
        SELECT o_orderkey,
               ntile(4) OVER w AS quartile,
               floor(percent_rank() OVER w * 1e6 + 0.5) / 1e6 AS pct_rank,
               floor(cume_dist() OVER w * 1e6 + 0.5) / 1e6 AS cume
        FROM orders
        WINDOW w AS (ORDER BY o_totalprice DESC, o_orderkey)
    """,
    tags=("window", "rank"),
)
def q_window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile/percent_rank/cume_dist over a global ordering — WITHOUT a
    global window. The global rank is assembled scale-safely
    (operators/ranks.py): price-derived order-consistent buckets →
    per-bucket row_number → broadcast prefix-sum offsets; ntile/pct/cume
    are then pure expressions of (rank, n). Identical output to the
    single-partition form, but the heavy sort is hash-partitioned
    (~50 buckets here; widen with data volume)."""
    o = t(spark, sf_dir, "orders")
    # DESC price order → bucket on floor(-price/1e4) (monotone along it).
    ranked = bucketed_rank(
        o,
        bucket=F.floor(-F.col("o_totalprice") / 10000),
        order_by=[F.col("o_totalprice").desc(), F.col("o_orderkey")],
        rank_col="_rn",
        total_col="_n",
    )
    rn, n = F.col("_rn"), F.col("_n")
    # half_up, not round(): the rank quotients are identical doubles on
    # both engines (exact int division), but round()'s tie handling is
    # engine-divergent when the quotient terminates at exactly 6 dp
    # (r7 core-SQL review — half_up is pure IEEE ops on identical bits).
    return ranked.select(
        "o_orderkey",
        ntile_from_rank(rn, n, 4).alias("quartile"),
        half_up((rn - 1) / (n - 1), 6).alias("pct_rank"),
        half_up(rn / n, 6).alias("cume"),
    )


@query(
    "q_topk_per_group",
    oracle="""
        SELECT * FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey) AS rn
            FROM orders)
        WHERE rn <= 3
    """,
    tags=("window", "topk"),
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer (MR: per-key sorted reducer truncating).
    row_number + filter lets Spark's WindowGroupLimit push the limit
    below the sort — no full materialization per group."""
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        t(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
    )


@query(
    "q_topk_with_ties",
    oracle="""
        SELECT * FROM (
            SELECT o_custkey, o_orderkey, o_orderdate,
                   rank() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate) AS rk
            FROM orders)
        WHERE rk <= 2
    """,
    tags=("window", "topk"),
)
def q_topk_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ties-INCLUSIVE top-k per group (`FETCH FIRST k ROWS WITH TIES`
    semantics): every order on a customer's two earliest order DATES —
    rank() keeps all rows sharing a boundary value where
    q_topk_per_group's row_number() would arbitrarily truncate them.
    The semantic users reach for when the ordering key has real ties
    and dropping a tied row would be wrong (leaderboards, best-price
    matches). Same WindowGroupLimit pushdown as the row_number form —
    Spark plans rank-limit below the sort, so no group materializes
    fully."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate")
    return (
        t(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", "o_orderdate", F.rank().over(w).alias("rk"))
        .filter(F.col("rk") <= 2)
    )


@query(
    "q_window_first_last",
    oracle="""
        SELECT DISTINCT o_custkey,
               first_value(o_totalprice) OVER w AS first_price,
               last_value(o_totalprice)  OVER w AS last_price
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    tags=("window", "analytic"),
)
def q_window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last order price per customer over the full-partition frame."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        t(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            F.first("o_totalprice").over(w).alias("first_price"),
            F.last("o_totalprice").over(w).alias("last_price"),
        )
        .distinct()
    )
