"""Second relational batch: correlated EXISTS aggregation, promo-share
and disjunctive-predicate joins (TPC-H Q4/Q14/Q19/Q7 style), statistical
aggregates, boolean aggregates, list aggregation, regexp/array/null
expression surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_framework_using_python_spark.plans.core import dec, half_up, query, t


@query(
    "q04_priority_exists",
    oracle="""
        SELECT o_orderpriority, count(*) AS n_orders
        FROM orders o
        WHERE EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49)
        GROUP BY o_orderpriority
    """,
    tags=("subquery", "semi", "agg"),
)
def q04_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-style: correlated EXISTS decorrelated to a semi-join,
    then aggregated."""
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 49)
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


@query(
    "q14_promo_share",
    oracle="""
        SELECT floor(
                 100.0 * CAST(sum(CASE WHEN p.p_type = 'PROMO'
                                  THEN CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                                  ELSE 0 END) AS DOUBLE)
                 / CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) * 10000 + 0.5) / 10000 AS promo_share
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
          AND l.l_shipdate < TIMESTAMP '1997-07-01'
    """,
    tags=("join", "agg", "conditional"),
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-style promotion revenue share (conditional aggregation
    over a broadcast join)."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp_ntz"))
    )
    p = t(spark, sf_dir, "part")
    rev = dec("l_extendedprice") * (1 - dec("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            half_up(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))).cast("double")
                / F.sum(rev).cast("double"),
                4,
            ).alias("promo_share")
        )
    )


@query(
    "q19_disjunctive",
    oracle="""
        SELECT floor(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) * 100 + 0.5) / 100 AS revenue,
               count(*) AS n_items
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE (p.p_brand = 'Brand#12' AND l.l_quantity BETWEEN 1 AND 11 AND p.p_size <= 25)
           OR (p.p_brand = 'Brand#23' AND l.l_quantity BETWEEN 10 AND 20 AND p.p_size <= 40)
           OR (p.p_brand = 'Brand#34' AND l.l_quantity BETWEEN 20 AND 30)
    """,
    tags=("join", "disjunctive"),
)
def q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-style disjunctive mixed join/filter predicates — the
    planner keeps the equi-key join and evaluates the OR residual
    post-join."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("l_quantity").between(1, 11) & (F.col("p_size") <= 25))
        | ((F.col("p_brand") == "Brand#23") & F.col("l_quantity").between(10, 20) & (F.col("p_size") <= 40))
        | ((F.col("p_brand") == "Brand#34") & F.col("l_quantity").between(20, 30))
    )
    return j.filter(cond).agg(
        half_up(F.sum(dec("l_extendedprice") * (1 - dec("l_discount")))).alias("revenue"),
        F.count("*").alias("n_items"),
    )


@query(
    "q07_nation_volume",
    oracle="""
        SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
               year(l.l_shipdate) AS l_year,
               floor(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) * 100 + 0.5) / 100 AS revenue
        FROM lineitem l
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
        JOIN nation cn  ON cn.n_nationkey = c.c_nationkey
        WHERE sn.n_nationkey < 13 AND cn.n_nationkey < 13
          AND sn.n_nationkey <> cn.n_nationkey
        GROUP BY 1, 2, 3
    """,
    tags=("join", "star", "agg"),
)
def q07_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-style cross-nation trade volume: two aliases of the same
    dim (nation) on different join paths, inequality between them."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation").filter(F.col("n_nationkey") < 13)
    sn = n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    cn = n.select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(F.col("sn_key") != F.col("cn_key"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            half_up(F.sum(dec("l_extendedprice") * (1 - dec("l_discount")))).alias("revenue")
        )
    )


@query(
    "q_corr_stats",
    oracle="""
        WITH comp AS (
            SELECT l_returnflag,
                   CAST(count(*) AS DOUBLE) AS n,
                   CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
                   CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy,
                   CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy,
                   CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS su,
                   CAST(sum(CAST(l_tax AS DECIMAL(18,2))) AS DOUBLE) AS sv,
                   CAST(sum(CAST(l_discount AS DECIMAL(18,2)) * CAST(l_tax AS DECIMAL(18,2))) AS DOUBLE) AS suv
            FROM lineitem
            GROUP BY l_returnflag
        )
        SELECT l_returnflag,
               floor((n * sxy - sx * sy)
                     / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
                     * 1000000.0 + 0.5) / 1000000.0 AS qty_price_corr,
               floor((n * suv - su * sv) / (n * n)
                     * 1000000.0 + 0.5) / 1000000.0 AS disc_tax_covar
        FROM comp
    """,
    tags=("agg", "stats"),
)
def q_corr_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: Pearson correlation + population
    covariance.

    Tie-hardened (VERDICT r2 #2): raw ``corr()``/``covar_pop()`` are
    float sums whose addition order differs per engine/run, so rounding
    near the grid flips. Instead both engines sum the exact DECIMAL
    components (n, Σx, Σy, Σxy, Σx², Σy² — all columns live on 2-dp
    grids, products on the exact 1e-4 grid), cast those identical exact
    sums to double, and evaluate the textbook formulas with identical
    IEEE expression structure — bit-identical doubles on both sides, so
    the half-up grid round is deterministic.
    """
    li = t(spark, sf_dir, "lineitem")
    comp = li.groupBy("l_returnflag").agg(
        F.count("*").cast("double").alias("n"),
        F.sum(dec("l_quantity")).cast("double").alias("sx"),
        F.sum(dec("l_extendedprice")).cast("double").alias("sy"),
        F.sum(dec("l_quantity") * dec("l_extendedprice")).cast("double").alias("sxy"),
        F.sum(dec("l_quantity") * dec("l_quantity")).cast("double").alias("sxx"),
        F.sum(dec("l_extendedprice") * dec("l_extendedprice")).cast("double").alias("syy"),
        F.sum(dec("l_discount")).cast("double").alias("su"),
        F.sum(dec("l_tax")).cast("double").alias("sv"),
        F.sum(dec("l_discount") * dec("l_tax")).cast("double").alias("suv"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    corr = (n * F.col("sxy") - sx * sy) / (
        F.sqrt(n * F.col("sxx") - sx * sx) * F.sqrt(n * F.col("syy") - sy * sy)
    )
    covar = (n * F.col("suv") - F.col("su") * F.col("sv")) / (n * n)
    return comp.select(
        "l_returnflag",
        half_up(corr, 6).alias("qty_price_corr"),
        half_up(covar, 6).alias("disc_tax_covar"),
    )


@query(
    "q_bool_agg",
    oracle="""
        SELECT o_orderpriority,
               bool_or(o_totalprice > 400000) AS any_jumbo,
               bool_and(o_totalprice > 2000) AS all_above_2k
        FROM orders
        GROUP BY o_orderpriority
    """,
    tags=("agg", "bool"),
)
def q_bool_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregates (every/any)."""
    return (
        t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.bool_or(F.col("o_totalprice") > 400000).alias("any_jumbo"),
            F.bool_and(F.col("o_totalprice") > 2000).alias("all_above_2k"),
        )
    )


@query(
    "q_collect_sorted",
    oracle="""
        SELECT l_returnflag,
               array_to_string(list_sort(list_distinct(list(l_suppkey)))[1:5], ',')
                   AS first_supps,
               len(list_distinct(list(l_suppkey))) AS n_supps
        FROM lineitem
        GROUP BY l_returnflag
    """,
    tags=("agg", "collect", "array"),
)
def q_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """List aggregation made deterministic: collect_set → sort → slice →
    join (collect order is nondeterministic, the sorted digest isn't —
    same rule as SQL's string_agg ORDER BY)."""
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.concat_ws(
                ",", F.slice(F.sort_array(F.collect_set("l_suppkey")), 1, 5)
            ).alias("first_supps"),
            F.size(F.collect_set("l_suppkey")).alias("n_supps"),
        )
    )


@query(
    "q_regexp_funcs",
    oracle="""
        SELECT p_partkey,
               len(regexp_extract_all(p_name, '[a-z]+')) AS n_words,
               array_to_string(regexp_extract_all(p_name, '[a-z]+'), '|') AS words_joined,
               split_part(p_type, ' ', 1) AS type_head,
               instr(p_name, 'a') AS first_a,
               translate(p_brand, '#', '-') AS brand_dash
        FROM part
    """,
    tags=("functions", "string", "regex"),
)
def q_regexp_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp + positional string functions."""
    p = t(spark, sf_dir, "part")
    words = F.regexp_extract_all("p_name", F.lit("[a-z]+"), 0)
    return p.select(
        "p_partkey",
        F.size(words).alias("n_words"),
        F.concat_ws("|", words).alias("words_joined"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_head"),
        F.instr("p_name", "a").alias("first_a"),
        F.translate("p_brand", "#", "-").alias("brand_dash"),
    )


@query(
    "q_array_ops",
    oracle="""
        SELECT vec_id,
               len(embedding) AS dim,
               round(CAST(embedding[1] AS DOUBLE), 6) AS first_val,
               round(CAST(list_max(embedding) AS DOUBLE), 6) AS max_val,
               round(CAST(list_min(embedding) AS DOUBLE), 6) AS min_val,
               len(list_filter(embedding, x -> x > 0)) AS n_positive
        FROM embeddings
    """,
    tags=("array", "functions"),
)
def q_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-column expression surface: size / index / min / max /
    filter-count — all codegen'd, no UDF."""
    e = t(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("first_val"),
        F.round(F.array_max("embedding").cast("double"), 6).alias("max_val"),
        F.round(F.array_min("embedding").cast("double"), 6).alias("min_val"),
        F.size(F.filter(F.col("embedding"), lambda x: x > 0)).alias("n_positive"),
    )


@query(
    "q_null_handling",
    oracle="""
        SELECT c.c_custkey,
               coalesce(nullif(c.c_mktsegment, 'BUILDING'), 'SUPPRESSED') AS segment,
               count(o.o_orderkey) AS n_orders,
               count(*) AS n_rows,
               CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_null_rows
        FROM customer c
        LEFT JOIN orders o ON o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P'
        GROUP BY 1, 2
    """,
    tags=("null", "join", "expr"),
)
def q_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL semantics: nullif/coalesce, count(col) vs count(*) over
    outer-join nulls, and a join condition with an extra predicate on
    the null-producing side."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy(
            "c_custkey",
            F.coalesce(
                F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("SUPPRESSED")
            ).alias("segment"),
        )
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.count("*").alias("n_rows"),
            F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0)).alias("n_null_rows"),
        )
    )
