"""Second TPC-H coverage batch: Q8, Q9, Q11, Q12, Q13, Q16, Q20 shapes.

Adapted to this corpus's schema the same way Q2 was (plans/subqueries.py):
there is no ``partsupp`` table, so supplier↔part relationships derive
from distinct ``lineitem`` pairs; there is no ``l_shipmode``/comment
column, so the categorical filters use the columns that exist
(``l_returnflag``, ``o_orderpriority``). The *query shapes* — market
share with conditional aggregation, profit decomposition, global-scalar
threshold filter, outer-join histogram, grouped distinct-count
exclusion, semi-join on a correlated quantity threshold — are the
reference workload's; every one carries a DuckDB oracle.

Money discipline (plans/core.py): 1e-4-grid sums go through DECIMAL →
cast double → half_up; ratios round at 4dp like q14; quantity
comparisons stay in exact DECIMAL on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_framework_using_python_spark.plans.core import dec, half_up, query, t

_REV_SQL = "CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))"


@query(
    "q08_market_share",
    oracle=f"""
        SELECT year(o.o_orderdate) AS o_year,
               floor(CAST(sum(CASE WHEN n2.n_name = 'NATION_7' THEN {_REV_SQL} ELSE 0 END) AS DOUBLE)
                     / CAST(sum({_REV_SQL}) AS DOUBLE) * 10000 + 0.5) / 10000 AS mkt_share
        FROM lineitem l
        JOIN orders o    ON l.l_orderkey = o.o_orderkey
        JOIN customer c  ON o.o_custkey = c.c_custkey
        JOIN nation n1   ON c.c_nationkey = n1.n_nationkey
        JOIN region r    ON n1.n_regionkey = r.r_regionkey
        JOIN supplier s  ON l.l_suppkey = s.s_suppkey
        JOIN nation n2   ON s.s_nationkey = n2.n_nationkey
        JOIN part p      ON l.l_partkey = p.p_partkey
        WHERE r.r_name = 'EUROPE' AND p.p_type = 'PROMO'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY 1
    """,
    tags=("join", "star", "conditional", "tpch"),
)
def q08_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-style market share: one nation's fraction of a region's
    promo-part revenue per order-year. 7-table star — every dim
    broadcasts; lineitem shuffles once for the orders edge."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    c = t(spark, sf_dir, "customer")
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    s = t(spark, sf_dir, "supplier")
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    p = t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    rev = dec("l_extendedprice") * (1 - dec("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(r), F.col("c_rk") == F.col("r_regionkey"))
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            half_up(
                F.sum(F.when(F.col("supp_nation") == "NATION_7", rev).otherwise(F.lit(0)))
                .cast("double")
                / F.sum(rev).cast("double"),
                4,
            ).alias("mkt_share")
        )
    )


@query(
    "q09_product_profit",
    oracle=f"""
        SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
               floor(CAST(sum({_REV_SQL}
                         - CAST(p.p_retailprice AS DECIMAL(18,2)) * CAST(0.6 AS DECIMAL(2,1))
                           * CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) * 100 + 0.5) / 100 AS profit
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        JOIN part p     ON l.l_partkey = p.p_partkey
        WHERE p.p_type = 'STANDARD'
        GROUP BY 1, 2
    """,
    tags=("join", "star", "agg", "tpch"),
)
def q09_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-style product-type profit by supplier nation and year.
    Without partsupp, supply cost is modeled as 60% of retail price —
    the profit-decomposition aggregate is the shape under test. All
    amounts sum in exact DECIMAL (1e-4 grid) before the one half-up."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    p = t(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    amount = dec("l_extendedprice") * (1 - dec("l_discount")) - dec(
        "p_retailprice"
    ) * F.lit(0.6).cast("decimal(2,1)") * dec("l_quantity")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(half_up(F.sum(amount)).alias("profit"))
    )


@query(
    "q11_important_stock",
    oracle="""
        WITH v AS (
            SELECT l.l_partkey,
                   sum(CAST(l.l_quantity AS DECIMAL(18,2)) * CAST(p.p_retailprice AS DECIMAL(18,2))) AS val
            FROM lineitem l
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation n   ON s.s_nationkey = n.n_nationkey
            JOIN part p     ON l.l_partkey = p.p_partkey
            WHERE n.n_name = 'NATION_3'
            GROUP BY 1)
        SELECT l_partkey, floor(CAST(val AS DOUBLE) * 100 + 0.5) / 100 AS stock_value
        FROM v
        WHERE val > (SELECT CAST(sum(val) AS DECIMAL(28,4)) * CAST(0.001 AS DECIMAL(4,3)) FROM v)
    """,
    tags=("subquery", "scalar", "agg", "tpch"),
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11-style important stock: parts whose inventory value
    (shipped qty × retail price, one nation's suppliers) exceeds a
    fraction of the global total — grouped agg + global-scalar
    threshold. The comparison stays in exact DECIMAL on both engines;
    only the reported value is rounded. The total is cast to
    DECIMAL(28,4) BEFORE the 0.001 multiply: decimal(38,4) × decimal(4,3)
    needs (43,7), which Spark's allowPrecisionLoss half-up rounds to
    (38,6) while DuckDB keeps exact — (28,4) × (4,3) = (33,7) is exact
    on both (r7 TPC-H review, divergence reproduced live)."""
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    p = t(spark, sf_dir, "part")
    v = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_partkey")
        .agg(F.sum(dec("l_quantity") * dec("p_retailprice")).alias("val"))
    )
    total = v.agg(
        (F.sum("val").cast("decimal(28,4)") * F.lit(0.001).cast("decimal(4,3)")).alias(
            "threshold"
        )
    )
    return (
        v.crossJoin(F.broadcast(total))
        .filter(F.col("val") > F.col("threshold"))
        .select("l_partkey", half_up(F.col("val")).alias("stock_value"))
    )


@query(
    "q12_priority_by_returnflag",
    oracle="""
        SELECT l.l_returnflag,
               CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
          AND l.l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY 1
    """,
    tags=("join", "conditional", "tpch"),
)
def q12_priority_by_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipmode → returnflag, which exists here):
    priority-class conditional counts per category over the orderkey
    join."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    o = t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q13_customer_distribution",
    oracle="""
        SELECT c_count, count(*) AS custdist
        FROM (SELECT c.c_custkey, count(o.o_orderkey) AS c_count
              FROM customer c
              LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                                AND o.o_orderpriority <> '4-NOT SPECIFIED'
              GROUP BY 1)
        GROUP BY 1
    """,
    tags=("join", "outer", "histogram", "tpch"),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-style customer order-count histogram: LEFT join with a
    join-side predicate (customers with zero qualifying orders count as
    0 — the classic outer-join-then-histogram trap)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@query(
    "q16_parts_supplier_count",
    oracle="""
        SELECT p.p_brand, p.p_type, p.p_size,
               count(DISTINCT ps.l_suppkey) AS supplier_cnt
        FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
        JOIN part p ON p.p_partkey = ps.l_partkey
        WHERE p.p_brand <> 'Brand#19' AND p.p_type <> 'PROMO'
          AND p.p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
        GROUP BY 1, 2, 3
    """,
    tags=("join", "distinct", "agg", "tpch"),
)
def q16_parts_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-style supplier counts per part category with exclusion
    predicates (partsupp derived from distinct lineitem pairs, as in
    the Q2 adaptation)."""
    ps = t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#19")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    )
    return (
        ps.join(F.broadcast(p), ps.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q20_part_promotion",
    oracle="""
        WITH part_total AS (
            SELECT l.l_partkey, sum(l.l_quantity) AS total_qty
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            WHERE p.p_type = 'SMALL'
              AND l.l_shipdate >= TIMESTAMP '1997-01-01'
              AND l.l_shipdate < TIMESTAMP '1998-01-01'
            GROUP BY 1),
        supp_part AS (
            SELECT l.l_suppkey, l.l_partkey, sum(l.l_quantity) AS supp_qty
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            WHERE p.p_type = 'SMALL'
              AND l.l_shipdate >= TIMESTAMP '1997-01-01'
              AND l.l_shipdate < TIMESTAMP '1998-01-01'
            GROUP BY 1, 2)
        SELECT DISTINCT s.s_suppkey, s.s_name
        FROM supp_part sp
        JOIN part_total pt ON sp.l_partkey = pt.l_partkey
        JOIN supplier s ON s.s_suppkey = sp.l_suppkey
        WHERE sp.supp_qty > 0.5 * pt.total_qty
    """,
    tags=("subquery", "semi", "agg", "tpch"),
)
def q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-style: suppliers holding a dominant (>50%) share of any
    small-part's 1997 shipments — correlated quantity threshold
    expressed as agg-join-agg (no correlated rescan). Quantity halves
    are exact in binary, so the comparison is engine-stable."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    p = t(spark, sf_dir, "part").filter(F.col("p_type") == "SMALL")
    small = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    supp_part = small.groupBy("l_suppkey", "l_partkey").agg(
        F.sum("l_quantity").alias("supp_qty")
    )
    # Roll part totals up FROM the finer aggregate — aggregating `small`
    # twice would scan lineitem and re-run the part join twice (Spark
    # does not dedupe shared lineage). Integer-valued quantities sum
    # exactly in any order, so the rollup is value-identical.
    part_total = supp_part.groupBy("l_partkey").agg(
        F.sum("supp_qty").alias("total_qty")
    )
    s = t(spark, sf_dir, "supplier")
    dominant = supp_part.join(part_total, "l_partkey").filter(
        F.col("supp_qty") > 0.5 * F.col("total_qty")
    )
    return (
        s.join(dominant, s.s_suppkey == dominant.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .distinct()
    )
