"""UDF-surface queries: the Python UDF rungs under the oracle gate
(SURVEY.md §2.B UDF/UDAF rows — reference ops 3 & 6, where ALL compute
lived in user subprocess code).

Deterministic UDFs get real oracles: the gate then proves the
Arrow-vectorized Python path computes exactly what the SQL semantics
say, not just that it runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_framework_using_python_spark.functions.udfs import (
    discounted_price_pandas,
    weighted_avg_price,
    zscore_per_group,
)
from map_reduce_framework_using_python_spark.plans.core import query, t


@query(
    "q_udf_scalar_pandas",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               CAST(round(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT)
                   AS disc_price_cents
        FROM lineitem
        WHERE l_quantity >= 45
    """,
    tags=("udf", "pandas"),
)
def q_udf_scalar_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas UDF (Arrow-vectorized) computing the pricing
    expression — must match the pure-SQL oracle exactly. Output in
    integer cents: round-to-2-decimals differs between engines at .xx5
    representation boundaries (scale-multiply vs decimal-expansion
    rounding), whereas round-to-integer of identical doubles is
    deterministic. (Production code uses the built-in expression; this
    query keeps the Python rung itself under the correctness gate.)"""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 45)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(discounted_price_pandas(F.col("l_extendedprice"), F.col("l_discount")) * 100, 0)
        .cast("bigint")
        .alias("disc_price_cents"),
    )


@query(
    "q_udaf_weighted_avg",
    oracle="""
        SELECT l_returnflag,
               floor(
                 CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                          * CAST(l_quantity AS BIGINT)) * 100 AS DOUBLE)
                 / (100.0 * CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE))
                 * 100 + 0.5) / 100 AS w_avg_price
        FROM lineitem
        GROUP BY l_returnflag
    """,
    tags=("udf", "udaf", "pandas"),
)
def q_udaf_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDAF (quantity-weighted mean price) —
    the reference's sorted-streaming-reducer capability (op 6) as a
    vectorized per-group kernel, oracle-checked. The UDAF sums exact
    integer cents (see functions/udfs.py), so its division matches the
    oracle's DECIMAL-exact form bit-for-bit."""
    from map_reduce_framework_using_python_spark.plans.core import half_up

    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            half_up(
                weighted_avg_price(F.col("l_extendedprice"), F.col("l_quantity")), 2
            ).alias("w_avg_price")
        )
    )


@query(
    "q_udtf_grouped_map",
    oracle="""
        SELECT s_suppkey, s_nationkey, s_acctbal,
               round(CASE WHEN stddev_pop(s_acctbal) OVER (PARTITION BY s_nationkey) = 0
                          THEN 0.0
                          ELSE (s_acctbal - avg(s_acctbal) OVER (PARTITION BY s_nationkey))
                               / stddev_pop(s_acctbal) OVER (PARTITION BY s_nationkey)
                     END, 4) AS zscore
        FROM supplier
    """,
    tags=("udf", "udtf", "pandas"),
)
def q_udtf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas grouped map (whole group in / whole group out):
    per-nation z-score of supplier balances, matching the SQL window
    formulation."""
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey", "s_acctbal")
    z = zscore_per_group(s, "s_nationkey", "s_acctbal")
    return z.select("s_suppkey", "s_nationkey", "s_acctbal", F.round("zscore", 4).alias("zscore"))


@query(
    "q_intersect_all",
    oracle="""
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        INTERSECT ALL
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    """,
    tags=("setop", "bag"),
)
def q_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics INTERSECT ALL (multiplicity = min of the two
    sides), vs. the set-semantics q_intersect."""
    o = t(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderstatus") == "F")
        .select("o_custkey")
        .intersectAll(o.filter(F.col("o_orderstatus") == "P").select("o_custkey"))
    )


@query(
    "q_except_all",
    oracle="""
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        EXCEPT ALL
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    """,
    tags=("setop", "bag"),
)
def q_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics EXCEPT ALL (multiplicity subtraction)."""
    o = t(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderstatus") == "F")
        .select("o_custkey")
        .exceptAll(o.filter(F.col("o_orderstatus") == "P").select("o_custkey"))
    )
