"""Bucketed-storage variants of the shuffle-heavy fact joins.

Same answers as their scan-based twins (same DuckDB oracles — the
driver hash-checks both), different physical story: lineitem/orders are
read from the bucketed warehouse (:mod:`..sources.warehouse`), so the
orderkey join edge — the one that cannot broadcast at 100 TB — plans as
SortMergeJoin with NO Exchange on either side, and q18's pre-join
aggregate on the bucket key needs no shuffle at all. Our 50× probe put
the scan-based variants at 6.4× for 50× data; these pay the shuffle
once at write time instead of per query.

The explicit ``hint("merge")`` keeps the plan on the SMJ-over-buckets
path at test scale, where AQE would otherwise happily broadcast the
filtered orders side (at real scale it can't).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_framework_using_python_spark.plans import joins  # noqa: F401 — registers q05/q18
from map_reduce_framework_using_python_spark.plans.core import REGISTRY, dec, half_up, query, t
from map_reduce_framework_using_python_spark.sources.warehouse import bucketed_table


@query("q05_local_supplier_bucketed", oracle=REGISTRY["q05_local_supplier"].oracle,
       tags=("join", "star", "agg", "bucketed"))
def q05_local_supplier_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 over bucketed facts: the lineitem↔orders edge is a
    zero-Exchange SortMergeJoin over co-located buckets; the BOUNDED
    dims broadcast, while customer — corpus-sized at 100 TB — carries
    no forced hint (the same r7 rule as the scan-based twin; Catalyst
    still auto-broadcasts it at test SFs)."""
    c = t(spark, sf_dir, "customer")
    o = bucketed_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    li = bucketed_table(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.hint("merge").join(o.hint("merge"), li.l_orderkey == o.o_orderkey)
        # No forced broadcast on corpus-sized customer (r7 rule).
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (s.s_nationkey == c.c_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            half_up(F.sum(dec("l_extendedprice") * (1 - dec("l_discount")))).alias("revenue")
        )
    )


@query("q05_local_supplier_smj", oracle=REGISTRY["q05_local_supplier"].oracle,
       tags=("join", "star", "agg", "smj"))
def q05_local_supplier_smj(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 with the fact edge FORCED to SortMergeJoin over plain
    (unbucketed) scans — the control for the bucketing experiment.

    q05_local_supplier lets AQE broadcast the filtered orders side,
    which wins at bench scale but is impossible at 100 TB where both
    sides exceed any broadcast threshold; there the planner is forced
    onto exactly this shuffle-both-sides SMJ. Comparing this variant
    against q05_local_supplier_bucketed isolates what bucketing buys:
    the same join minus both Exchanges (bench scale10x section)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.hint("merge").join(o.hint("merge"), li.l_orderkey == o.o_orderkey)
        # No forced broadcast on corpus-sized customer (r7 rule).
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (s.s_nationkey == c.c_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            half_up(F.sum(dec("l_extendedprice") * (1 - dec("l_discount")))).alias("revenue")
        )
    )


@query("q18_large_orders_bucketed", oracle=REGISTRY["q18_large_orders"].oracle,
       tags=("join", "agg", "having", "bucketed"))
def q18_large_orders_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 over bucketed facts: the groupBy(l_orderkey) aggregates
    WITHIN buckets (zero shuffle — the scan already delivers the hash
    distribution), and the orders join is bucket-co-located SMJ."""
    o = bucketed_table(spark, sf_dir, "orders")
    big = (
        bucketed_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    return (
        o.hint("merge")
        .join(big.hint("merge"), o.o_orderkey == big.l_orderkey)
        .select("o_orderkey", "o_custkey", "total_qty")
    )
