"""Relational core: scans, filter/project, aggregation, distinct,
cube/rollup/grouping sets, set ops, scalar functions, subqueries.

These are the SURVEY.md §2.B capabilities the reference can only express
through user mapper/reducer code over its §2.A primitives (e.g. filters
live inside opaque mappers, ``Worker/worker_v1.py:113-116``; grouped
aggregation is the shuffle+sorted-reduce pattern,
``Worker/worker_v1.py:124-218``). Here each is a declarative DataFrame
plan, so Catalyst does pushdown/pruning/partial-agg — the map-side
combine the reference lacks entirely (``worker_v1.py:131-144``,
SURVEY.md §4) comes free from hash-agg partial/final.

Determinism rules for oracle parity: every money aggregate is rounded
to a fixed scale in BOTH engines (parallel double summation is
order-dependent in the last ulp); raw column passthroughs stay unrounded
(bit-identical parquet values on both sides); every LIMIT rides on a
total order with a unique tiebreak key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_framework_using_python_spark.plans.core import dec, half_up, query, t


# --------------------------------------------------------------------------
# Scan / filter / project
# --------------------------------------------------------------------------


@query(
    "q00_scan_count",
    oracle="SELECT count(*) AS n_rows FROM lineitem",
    tags=("scan",),
)
def q00_scan_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bare fact-table scan + count (reference READ, op 2). Parquet
    footer statistics make this metadata-only at any scale."""
    return t(spark, sf_dir, "lineitem").agg(F.count("*").alias("n_rows"))


@query(
    "q02_filter_project",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        FROM lineitem
        WHERE l_quantity >= 48 AND l_discount >= 0.05
          AND l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
    """,
    tags=("filter", "project"),
)
def q02_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter + projection (reference: mapper dropping/trimming lines).
    Both the predicate and the 4-column ReadSchema push into the scan."""
    li = t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_quantity") >= 48)
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")


# --------------------------------------------------------------------------
# Aggregation
# --------------------------------------------------------------------------


@query(
    "q01_pricing_summary",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               sum(l_quantity) AS sum_qty,
               floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) * 100 + 0.5) / 100 AS sum_base_price,
               floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) * 100 + 0.5) / 100 AS sum_disc_price,
               floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) * 100 + 0.5) / 100 AS sum_charge,
               floor(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) * 100 + 0.5) / 100 AS avg_qty,
               floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) * 100 + 0.5) / 100 AS avg_price,
               floor(CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*) * 10000 + 0.5) / 10000 AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg", "flagship"),
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary — the flagship grouped aggregation.

    The reference computes this shape as word-count-style MR (shuffle all
    map output, sort, fold in a reducer, ``worker_v1.py:124-218``); Spark
    runs partial hash-agg before the exchange, so only G groups/partition
    cross the network at 100 TB.

    Money sums are DECIMAL-exact then half_up-rounded — see the
    determinism note in plans/core.py (revenue grids tie at .xx5).
    """
    li = t(spark, sf_dir, "lineitem")
    disc_price = dec("l_extendedprice") * (1 - dec("l_discount"))
    n = F.count("*")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            half_up(F.sum(dec("l_extendedprice"))).alias("sum_base_price"),
            half_up(F.sum(disc_price)).alias("sum_disc_price"),
            half_up(F.sum(disc_price * (1 + dec("l_tax")))).alias("sum_charge"),
            half_up(F.sum(dec("l_quantity")).cast("double") / n).alias("avg_qty"),
            half_up(F.sum(dec("l_extendedprice")).cast("double") / n).alias("avg_price"),
            half_up(F.sum(dec("l_discount")).cast("double") / n, 4).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


@query(
    "q06_forecast_revenue",
    oracle="""
        SELECT floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                              * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
                     * 100 + 0.5) / 100 AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.02 AND 0.06
          AND l_quantity < 24
    """,
    tags=("agg", "filter"),
)
def q06_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-style selective scan-agg: all predicates push to parquet;
    no shuffle at all beyond the final single-row reduction."""
    li = t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_discount").between(0.02, 0.06))
        & (F.col("l_quantity") < 24)
    ).agg(half_up(F.sum(dec("l_extendedprice") * dec("l_discount"))).alias("revenue"))


@query(
    "q_agg_stats",
    oracle="""
        SELECT l_returnflag,
               count(*) AS n_rows,
               count(DISTINCT l_partkey) AS n_parts,
               min(l_extendedprice) AS min_price,
               max(l_extendedprice) AS max_price,
               floor(sqrt((CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                           - CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) * CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / CAST(count(*) AS DOUBLE))
                          / (CAST(count(*) AS DOUBLE) - 1)) * 100 + 0.5) / 100 AS sd_price
        FROM lineitem
        GROUP BY l_returnflag
    """,
    tags=("agg",),
)
def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min/max/count/count-distinct/stddev in one pass.

    sd_price is computed from EXACT decimal moments (sum(x), sum(x²) on
    the 1e-4 grid) cast to double, then the identical IEEE expression on
    both engines — native stddev_samp accumulates doubles in
    engine-specific order, so its pre-round bits differ in the last ulps
    and round(...,2) can flip at a .xx5 boundary (r7 core-SQL review)."""
    x = dec("l_extendedprice")
    nd = F.count("*").cast("double")
    s1 = F.sum(x).cast("double")
    s2 = F.sum(x * x).cast("double")
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_rows"),
            F.countDistinct("l_partkey").alias("n_parts"),
            F.min("l_extendedprice").alias("min_price"),
            F.max("l_extendedprice").alias("max_price"),
            half_up(F.sqrt((s2 - s1 * s1 / nd) / (nd - 1))).alias("sd_price"),
        )
    )


@query(
    "q_having",
    oracle="""
        SELECT o_custkey, round(sum(o_totalprice), 2) AS total_spent,
               count(*) AS n_orders
        FROM orders
        GROUP BY o_custkey
        HAVING sum(CAST(o_totalprice AS DECIMAL(18,2))) > 3000000
    """,
    tags=("agg", "having"),
)
def q_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation filter (MR: a second reducer pass).

    The HAVING boundary compares an EXACT decimal sum — a double sum's
    order-dependent last-ulp error could straddle the on-grid 3,000,000
    threshold differently per engine (r7 core-SQL review). total_spent
    itself is safe as a plain 2-dp round (2-dp-grid sum, NOTES lesson 2)."""
    return (
        t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("total_spent"),
            F.count("*").alias("n_orders"),
            F.sum(dec("o_totalprice")).alias("_raw"),
        )
        .filter(F.col("_raw") > 3000000)
        .drop("_raw")
    )


@query(
    "q_case_expr",
    oracle="""
        SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
                    WHEN o_totalprice < 200000 THEN 'mid'
                    ELSE 'high' END AS price_band,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS band_total
        FROM orders
        GROUP BY 1
    """,
    tags=("expr", "agg"),
)
def q_case_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE/WHEN expression algebra feeding an aggregation."""
    band = (
        F.when(F.col("o_totalprice") < 50000, "low")
        .when(F.col("o_totalprice") < 200000, "mid")
        .otherwise("high")
    )
    return (
        t(spark, sf_dir, "orders")
        .groupBy(band.alias("price_band"))
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("band_total"),
        )
    )


# --------------------------------------------------------------------------
# Distinct / duplicate elimination
# --------------------------------------------------------------------------


@query(
    "q_distinct",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    tags=("distinct",),
)
def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT (MR: emit (row, Ø), reducer outputs each key once)."""
    return t(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@query(
    "q_distinct_subset",
    oracle="""
        SELECT o_orderstatus, o_orderpriority,
               min(o_orderkey) AS o_orderkey, count(*) AS n_orders
        FROM orders
        GROUP BY o_orderstatus, o_orderpriority
    """,
    tags=("distinct",),
)
def q_distinct_subset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic dropDuplicates-on-subset: keep the min-key witness
    per (status, priority) instead of Spark's arbitrary-row semantics."""
    return (
        t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(F.min("o_orderkey").alias("o_orderkey"), F.count("*").alias("n_orders"))
    )


@query(
    "q_count_distinct",
    oracle="""
        SELECT l_returnflag,
               count(DISTINCT l_suppkey) AS n_supps,
               count(DISTINCT l_partkey) AS n_parts
        FROM lineitem
        GROUP BY l_returnflag
    """,
    tags=("distinct", "agg"),
)
def q_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple exact COUNT(DISTINCT) (expand + two-phase agg in Spark)."""
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supps"),
            F.countDistinct("l_partkey").alias("n_parts"),
        )
    )


# --------------------------------------------------------------------------
# Multi-dimensional aggregation
# --------------------------------------------------------------------------


@query(
    "q_cube",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               sum(l_quantity) AS sum_qty, count(*) AS n
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    tags=("agg", "cube"),
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE (MR would need 4 separate jobs; one shuffle here)."""
    return (
        t(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.sum("l_quantity").alias("sum_qty"), F.count("*").alias("n"))
    )


@query(
    "q_rollup",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               sum(l_quantity) AS sum_qty, count(*) AS n
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    tags=("agg", "rollup"),
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals."""
    return (
        t(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.sum("l_quantity").alias("sum_qty"), F.count("*").alias("n"))
    )


@query(
    "q_grouping_sets",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               sum(l_quantity) AS sum_qty, count(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    """,
    tags=("agg", "grouping_sets"),
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via Spark SQL. The DataFrame binds through
    the ``{li}`` template (Spark 3.4+), not a session-global temp view —
    a view named ``lineitem`` would race with sqlapi's registrations for
    a different sf_dir and leak for the session lifetime (r7 core-SQL
    review)."""
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               sum(l_quantity) AS sum_qty, count(*) AS n
        FROM {li}
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        """,
        li=t(spark, sf_dir, "lineitem"),
    )


@query(
    "q_pivot",
    oracle="""
        SELECT l_returnflag,
               sum(l_quantity) FILTER (WHERE l_linestatus = 'O') AS qty_o,
               sum(l_quantity) FILTER (WHERE l_linestatus = 'F') AS qty_f
        FROM lineitem
        GROUP BY l_returnflag
    """,
    tags=("agg", "pivot"),
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot linestatus → columns."""
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum("l_quantity"))
        .withColumnRenamed("O", "qty_o")
        .withColumnRenamed("F", "qty_f")
    )


# --------------------------------------------------------------------------
# Sort / limit / top-k
# --------------------------------------------------------------------------


@query(
    "q03_global_topn",
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 10
    """,
    tags=("sort", "limit"),
)
def q03_global_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-N (MR: single-reducer job). Spark plans TakeOrderedAndProject —
    per-partition heaps, no global sort, no single-node bottleneck.
    Unique tiebreak (o_orderkey) keeps the row set deterministic."""
    return (
        t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# Set operations
# --------------------------------------------------------------------------


@query(
    "q_union",
    oracle="""
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        UNION
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
    tags=("setop",),
)
def q_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) — MR: write both inputs to one file + distinct job."""
    o = t(spark, sf_dir, "orders")
    f_keys = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    o_keys = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return f_keys.union(o_keys).distinct()


@query(
    "q_intersect",
    oracle="""
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        INTERSECT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    """,
    tags=("setop",),
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT — MR: tagged-union reducer requiring both tags."""
    o = t(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderstatus") == "F")
        .select("o_custkey")
        .intersect(o.filter(F.col("o_orderstatus") == "P").select("o_custkey"))
    )


@query(
    "q_except",
    oracle="""
        SELECT c_custkey FROM customer
        EXCEPT
        SELECT o_custkey AS c_custkey FROM orders
    """,
    tags=("setop",),
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct) — customers that never ordered."""
    c = t(spark, sf_dir, "customer").select("c_custkey")
    o = t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return c.subtract(o)


# --------------------------------------------------------------------------
# Scalar function surface (reference: arbitrary code inside mappers)
# --------------------------------------------------------------------------


@query(
    "q_string_funcs",
    oracle="""
        SELECT p_partkey,
               upper(p_name) AS name_upper,
               length(p_name) AS name_len,
               substring(p_name, 1, 5) AS name_pre,
               concat_ws('-', p_brand, p_type) AS brand_type,
               replace(p_type, ' ', '_') AS type_us,
               lpad(CAST(p_size AS VARCHAR), 3, '0') AS size_pad
        FROM part
    """,
    tags=("functions", "string"),
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function surface (upper/length/substr/concat_ws/replace/lpad)."""
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_pre"),
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
        F.regexp_replace("p_type", " ", "_").alias("type_us"),
        F.lpad(F.col("p_size").cast("string"), 3, "0").alias("size_pad"),
    )


@query(
    "q_date_funcs",
    oracle="""
        SELECT o_orderkey,
               year(o_orderdate) AS o_year,
               month(o_orderdate) AS o_month,
               day(o_orderdate) AS o_day,
               quarter(o_orderdate) AS o_quarter,
               CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
               date_diff('day', o_orderdate, TIMESTAMP '2002-01-01') AS days_to_2002,
               last_day(CAST(o_orderdate AS DATE)) AS month_end
        FROM orders
    """,
    tags=("functions", "date"),
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function surface."""
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("o_year"),
        F.month("o_orderdate").alias("o_month"),
        F.dayofmonth("o_orderdate").alias("o_day"),
        F.quarter("o_orderdate").alias("o_quarter"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate")).alias("days_to_2002"),
        F.last_day("o_orderdate").alias("month_end"),
    )


@query(
    "q_math_funcs",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               round(l_extendedprice, 0) AS price_r0,
               round(abs(l_discount - 0.05), 4) AS disc_dev,
               CAST(l_quantity * l_quantity AS DOUBLE) AS qty_sq,
               round(sqrt(l_extendedprice), 6) AS price_sqrt,
               floor(ln(l_extendedprice) * 100 + 0.5) / 100 AS price_ln,
               CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
               CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
               l_orderkey % 7 AS key_mod
        FROM lineitem
    """,
    tags=("functions", "math"),
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math function surface. ceil/floor cast to BIGINT on both sides
    (Spark returns LONG, DuckDB DOUBLE — normalize the type)."""
    li = t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 0).alias("price_r0"),
        F.round(F.abs(F.col("l_discount") - 0.05), 4).alias("disc_dev"),
        (F.col("l_quantity") * F.col("l_quantity")).alias("qty_sq"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        # ln at 2 dp, not 6: IEEE sqrt is correctly rounded (bit-identical
        # across engines, safe at 6 dp) but log is not — JVM Math.log and
        # libm can differ by 1 ulp, so a fine-grained round can straddle a
        # boundary (~1e-3/run exposure at 6 dp, ~1e-7 at 2 dp).
        half_up(F.log("l_extendedprice")).alias("price_ln"),
        F.ceil("l_extendedprice").cast("bigint").alias("price_ceil"),
        F.floor("l_extendedprice").cast("bigint").alias("price_floor"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
    )


# --------------------------------------------------------------------------
# Subqueries
# --------------------------------------------------------------------------


@query(
    "q_scalar_subquery",
    oracle="""
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_totalprice > 1.9 * (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / CAST(count(*) AS DOUBLE) FROM orders)
    """,
    tags=("subquery",),
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery: single-row agg broadcast-joined
    against the fact side (no driver round-trip). The average comes from
    an EXACT decimal sum divided in double — a native avg(double) is
    order-dependent in its last ulp, so boundary rows at exactly
    1.9*avg could flip between engines (r7 core-SQL review)."""
    o = t(spark, sf_dir, "orders")
    avg_all = o.agg(
        (F.sum(dec("o_totalprice")).cast("double") / F.count("*").cast("double")).alias(
            "_avg_price"
        )
    )
    return (
        o.crossJoin(F.broadcast(avg_all))
        .filter(F.col("o_totalprice") > 1.9 * F.col("_avg_price"))
        .select("o_orderkey", "o_totalprice")
    )


@query(
    "q17_small_quantity",
    oracle="""
        SELECT floor(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 * 100 + 0.5) / 100 AS avg_yearly
        FROM lineitem l
        JOIN (SELECT l_partkey, avg(l_quantity) AS avg_qty
              FROM lineitem GROUP BY l_partkey) p
          ON l.l_partkey = p.l_partkey
        WHERE l.l_quantity < 0.4 * p.avg_qty
    """,
    tags=("subquery", "join", "agg"),
)
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-style correlated scalar subquery, decorrelated into a
    per-key aggregate + equi-join (what Catalyst does to the SQL form)."""
    li = t(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(F.avg("l_quantity").alias("avg_qty"))
    return (
        li.join(per_part, "l_partkey")
        .filter(F.col("l_quantity") < 0.4 * F.col("avg_qty"))
        .agg(half_up(F.sum(dec("l_extendedprice")).cast("double") / 7.0).alias("avg_yearly"))
    )
