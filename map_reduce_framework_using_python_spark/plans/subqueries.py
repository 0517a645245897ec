"""Nested-subquery patterns (TPC-H Q2/Q15/Q21/Q22 style, adapted to the
driver's star schema): argmin-per-group with join-back, CTE + global-max
filter, correlated EXISTS + NOT EXISTS on the same table, and scalar
subquery + anti-join composition.

These are the shapes where MR needs whole extra job stages per nesting
level; Catalyst decorrelates them into joins inside one plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from map_reduce_framework_using_python_spark.plans.core import dec, half_up, query, t


@query(
    "q02_min_cost_supplier",
    oracle="""
        WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
        ranked AS (
            SELECT ps.l_partkey, ps.l_suppkey, s.s_acctbal,
                   row_number() OVER (PARTITION BY ps.l_partkey
                                      ORDER BY s.s_acctbal, ps.l_suppkey) AS rn
            FROM ps JOIN supplier s ON s.s_suppkey = ps.l_suppkey)
        SELECT l_partkey, l_suppkey AS best_suppkey, s_acctbal AS best_acctbal
        FROM ranked WHERE rn = 1
    """,
    tags=("subquery", "argmin", "join"),
)
def q02_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-style argmin-per-group: cheapest (lowest-balance)
    supplier serving each part, deterministic tiebreak, via window
    rank-1 (one shuffle; the correlated-MIN subquery form would
    rescan)."""
    ps = t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    s = t(spark, sf_dir, "supplier")
    w = Window.partitionBy("l_partkey").orderBy("s_acctbal", "l_suppkey")
    return (
        ps.join(F.broadcast(s), ps.l_suppkey == s.s_suppkey)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "l_partkey",
            F.col("l_suppkey").alias("best_suppkey"),
            F.col("s_acctbal").alias("best_acctbal"),
        )
    )


@query(
    "q15_top_supplier",
    oracle="""
        WITH rev AS (
            SELECT l_suppkey,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                            * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
                       AS total_rev
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1996-04-01'
            GROUP BY l_suppkey)
        SELECT s.s_suppkey, s.s_name,
               floor(r.total_rev * 100 + 0.5) / 100 AS total_rev
        FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
        WHERE r.total_rev = (SELECT max(total_rev) FROM rev)
    """,
    tags=("subquery", "cte", "agg"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-style: CTE revenue view + filter to the global max
    (scalar subquery over the CTE). Revenue is DECIMAL-exact so the
    equality against max() is engine-independent."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(dec("l_extendedprice") * (1 - dec("l_discount")))
        .cast("double")
        .alias("total_rev")
    )
    max_rev = rev.agg(F.max("total_rev").alias("_max"))
    s = t(spark, sf_dir, "supplier")
    return (
        rev.crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_rev") == F.col("_max"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", half_up(F.col("total_rev")).alias("total_rev"))
    )


@query(
    "q21_sole_supplier",
    oracle="""
        SELECT s.s_suppkey, s.s_name, count(DISTINCT l1.l_orderkey) AS n_sole_orders
        FROM supplier s
        JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
        WHERE EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_returnflag = 'R')
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey)
        GROUP BY s.s_suppkey, s.s_name
    """,
    tags=("subquery", "semi", "anti", "agg"),
)
def q21_sole_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-style correlated EXISTS + NOT EXISTS against the same
    fact table: orders served by exactly one supplier AND containing a
    returned line, counted per supplier. The EXISTS is genuinely
    constraining (TPC-H Q21's late-receipt predicate has no synthetic
    column, so the returned-line predicate stands in) — the prior form's
    EXISTS was a tautology satisfied by l2 = l1, so only the anti half
    was exercised (r7 TPC-H review). Decorrelated form: per-order
    distinct-supplier count == 1 plus a semi join on returned orders —
    no per-row rescans."""
    li = t(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supps")
    )
    sole = per_order.filter(F.col("n_supps") == 1).select("l_orderkey")
    returned = li.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    sole_returned = sole.join(returned, "l_orderkey", "left_semi")
    s = t(spark, sf_dir, "supplier")
    return (
        li.join(sole_returned, "l_orderkey")
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.countDistinct("l_orderkey").alias("n_sole_orders"))
    )


@query(
    "q22_idle_customers",
    oracle="""
        WITH avg_bal AS (
            SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                   / count(*) AS v
            FROM customer WHERE c_acctbal > 0.0)
        SELECT c.c_custkey % 10 AS cntry_code,
               count(*) AS n_custs,
               floor(CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                     * 100 + 0.5) / 100 AS total_bal
        FROM customer c, avg_bal
        WHERE c.c_acctbal > avg_bal.v
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
        GROUP BY 1
    """,
    tags=("subquery", "anti", "agg"),
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-style: scalar subquery threshold (avg positive balance,
    DECIMAL-exact) + anti-join (no open orders) + derived grouping key."""
    c = t(spark, sf_dir, "customer")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (F.sum(dec("c_acctbal")).cast("double") / F.count("*")).alias("_avg")
        )
    )
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy((F.col("c_custkey") % 10).alias("cntry_code"))
        .agg(
            F.count("*").alias("n_custs"),
            half_up(F.sum(dec("c_acctbal")).cast("double")).alias("total_bal"),
        )
    )
