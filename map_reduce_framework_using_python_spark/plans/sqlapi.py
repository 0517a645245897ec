"""SQL front-end queries — plans declared as raw ``spark.sql`` text.

Everything else in plans/ uses the DataFrame DSL; these exercise the
other half of the public surface (SURVEY.md §2.B "SQL"), including two
capabilities the DSL cannot express at all:

* **Recursive CTEs** (``WITH RECURSIVE``, Spark 4.0+) — bounded
  iterative expansion inside one declarative plan.
* **LATERAL correlated subqueries** (Spark 3.2+) — per-row dependent
  joins with ORDER BY + LIMIT (top-k per driving row).

The oracle strings are near-identical SQL (dialect-adjusted only for
date arithmetic), which is the point: the SQL front-end is the
portability layer, so the same text runs on any ANSI engine.
"""

from __future__ import annotations

# pandas must be MODULE-level: with future-annotations the pandas_udf
# type hints are strings that resolve against this module's globals at
# decoration time — a function-local import leaves 'pd.Series'
# unresolvable and the UDF rejects its own signature (caught by the
# round-closing sweep after the r7 review deferred it).
import pandas as pd  # noqa: F401
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_framework_using_python_spark.plans.core import query, t


def _view(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        t(spark, sf_dir, n).createOrReplaceTempView(n)


@query(
    "q_sql_recursive_months",
    oracle="""
        WITH RECURSIVE months AS (
            SELECT CAST('1992-01-01' AS DATE) AS month_start
            UNION ALL
            SELECT CAST(month_start + INTERVAL 1 MONTH AS DATE)
            FROM months WHERE month_start < CAST('1998-12-01' AS DATE)
        )
        SELECT month_start, count(o_orderkey) AS n_orders
        FROM months LEFT JOIN orders
          ON date_trunc('month', o_orderdate) = month_start
        GROUP BY 1
    """,
    tags=("sql", "recursive"),
)
def q_sql_recursive_months(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive month spine (84 rows, depth < Spark's default
    recursion limit of 100) left-joined to per-month order counts —
    gap-filling via WITH RECURSIVE instead of sequence() (q_gap_fill
    is the DSL twin). The spine is one row per month, so the join
    broadcasts it; orders aggregates map-side first."""
    _view(spark, sf_dir, "orders")
    return spark.sql("""
        WITH RECURSIVE months AS (
            SELECT CAST('1992-01-01' AS DATE) AS month_start
            UNION ALL
            SELECT add_months(month_start, 1)
            FROM months WHERE month_start < CAST('1998-12-01' AS DATE)
        )
        SELECT month_start, count(o_orderkey) AS n_orders
        FROM months LEFT JOIN orders
          ON trunc(o_orderdate, 'month') = month_start
        GROUP BY 1
    """)


@query(
    "q_sql_lateral_topk",
    oracle="""
        SELECT n.n_name, o.o_orderkey, o.o_totalprice
        FROM nation n,
        LATERAL (SELECT o_orderkey, o_totalprice
                 FROM orders JOIN customer ON o_custkey = c_custkey
                 WHERE c_nationkey = n.n_nationkey
                 ORDER BY o_totalprice DESC, o_orderkey
                 LIMIT 2) o
    """,
    tags=("sql", "lateral"),
)
def q_sql_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 orders by price per nation via a LATERAL correlated
    subquery — identical text on both engines (ties broken by
    o_orderkey for determinism; o_totalprice is a raw column
    passthrough, so no rounding). Catalyst rewrites the lateral into
    a ranked window over the join, i.e. the same physical plan as
    q_topk_per_group — per-row re-execution is never materialized."""
    _view(spark, sf_dir, "nation", "orders", "customer")
    return spark.sql("""
        SELECT n.n_name, o.o_orderkey, o.o_totalprice
        FROM nation n,
        LATERAL (SELECT o_orderkey, o_totalprice
                 FROM orders JOIN customer ON o_custkey = c_custkey
                 WHERE c_nationkey = n.n_nationkey
                 ORDER BY o_totalprice DESC, o_orderkey
                 LIMIT 2) o
    """)


@query(
    "q_sql_group_by_all",
    oracle="""
        SELECT o_orderpriority, o_orderstatus, count(*) AS n,
               min(o_orderdate) AS first_order
        FROM orders
        GROUP BY ALL
    """,
    tags=("sql",),
)
def q_sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL (Spark 3.4+ / DuckDB): every non-aggregate select
    item becomes a grouping key — byte-identical query text on both
    engines. Plain partial+final hash aggregate underneath."""
    _view(spark, sf_dir, "orders")
    return spark.sql("""
        SELECT o_orderpriority, o_orderstatus, count(*) AS n,
               min(o_orderdate) AS first_order
        FROM orders
        GROUP BY ALL
    """)


@query(
    "q_sql_udf",
    oracle="""
        SELECT l_returnflag,
               CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                             / 100 AS DECIMAL(18,2))) AS DOUBLE) AS disc_revenue
        FROM lineitem
        GROUP BY 1
    """,
    tags=("sql", "udf"),
)
def q_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A Python function registered into the SQL namespace
    (``spark.udf.register``) and invoked from query TEXT — the SQL
    user's path to custom logic (the reference's mapper, callable from
    SQL). The UDF rounds per ROW to the 2-dp grid with the explicit
    half-up formula (pandas .round is half-EVEN and the product sits on
    the 1e-4 tie grid — plans/core.py lesson), so the DECIMAL sum is
    exact on both engines and needs no final rounding. Arrow-batched
    (pandas) under the hood; same partial+final agg around it."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def disc_price(price: pd.Series, discount: pd.Series) -> pd.Series:
        return np.floor(price * (1 - discount) * 100 + 0.5) / 100

    spark.udf.register("disc_price", disc_price)
    _view(spark, sf_dir, "lineitem")
    return spark.sql("""
        SELECT l_returnflag,
               CAST(sum(CAST(disc_price(l_extendedprice, l_discount)
                             AS DECIMAL(18,2))) AS DOUBLE) AS disc_revenue
        FROM lineitem
        GROUP BY 1
    """)


@query(
    "q_sql_pipe_syntax",
    oracle="""
        SELECT o_orderstatus,
               count(*) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS total_price
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
    """,
    tags=("sql", "pipe"),
)
def q_sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (`|>`, Spark 4.0+): the linear dataflow dialect
    — each stage feeds the next top-to-bottom, the way the DataFrame
    DSL (and the reference's MAP → SHUFFLE → REDUCE chain) composes.
    Catalyst parses it into exactly the plan the nested form produces;
    the oracle is the classic-syntax twin. o_totalprice sums ride the
    exact DECIMAL grid as always."""
    _view(spark, sf_dir, "orders")
    return spark.sql("""
        FROM orders
        |> WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |> AGGREGATE count(*) AS n_orders,
                     CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                         AS total_price
           GROUP BY o_orderstatus
        |> SELECT o_orderstatus, n_orders, total_price
        |> ORDER BY o_orderstatus
    """)


@query(
    "q_sql_star_except",
    oracle="""
        SELECT * EXCLUDE (c_name, c_mktsegment) FROM customer
    """,
    tags=("sql", "projection"),
)
def q_sql_star_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``SELECT * EXCEPT (...)`` (Spark 4 star-except; DuckDB spells it
    EXCLUDE) — wide-table hygiene at 100 TB: dropping the heavy text
    columns by NAME keeps the scan's ReadSchema narrow without
    enumerating the dozens of columns you keep. Raw column passthrough,
    so nothing is rounded (plans/core.py rule)."""
    _view(spark, sf_dir, "customer")
    return spark.sql("SELECT * EXCEPT (c_name, c_mktsegment) FROM customer")


@query(
    "q_sql_lateral_alias",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               l_orderkey * 100 + l_linenumber AS line_code,
               line_code % 7 AS line_bucket
        FROM lineitem WHERE l_orderkey < 200
    """,
    tags=("sql", "projection"),
)
def q_sql_lateral_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral column aliases (Spark 3.4+/DuckDB): a SELECT item
    referencing an alias defined earlier in the SAME select list —
    derived-column chains without nested subqueries or repeated
    expressions. All-integer arithmetic, so both engines compute the
    identical chain with no float grid in sight."""
    _view(spark, sf_dir, "lineitem")
    return spark.sql("""
        SELECT l_orderkey, l_linenumber,
               l_orderkey * 100 + l_linenumber AS line_code,
               line_code % 7 AS line_bucket
        FROM lineitem WHERE l_orderkey < 200
    """)


@query(
    "q_sql_parameterized",
    oracle="""
        SELECT n_name, count(*) AS n_cust
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        WHERE c_acctbal > 100.0
        GROUP BY n_name
    """,
    tags=("sql", "api"),
)
def q_sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL (Spark 3.4+ named parameter markers) with an
    ``IDENTIFIER()`` clause (Spark 3.5+) resolving the table name from
    a parameter — the injection-safe template API: values bind as
    literals, identifiers bind as identifiers, and neither ever splices
    into the SQL text. The oracle is simply the resolved query. The
    acctbal predicate compares the STORED doubles exactly on both
    engines (no derived float crosses rows)."""
    _view(spark, sf_dir, "customer", "nation")
    return spark.sql(
        """
        SELECT n_name, count(*) AS n_cust
        FROM IDENTIFIER(:tab) JOIN nation ON c_nationkey = n_nationkey
        WHERE c_acctbal > :min_bal
        GROUP BY n_name
        """,
        args={"tab": "customer", "min_bal": 100.0},
    )


@query(
    "q_sql_collation",
    oracle="""
        SELECT n_name, count(*) AS n_sup
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name COLLATE NOCASE IN ('nation_1', 'nation_7', 'nation_20')
        GROUP BY n_name
    """,
    tags=("sql", "collation"),
)
def q_sql_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collated string comparison (Spark 4 collation support): the
    lowercase literals match the stored upper-case names under a
    case-insensitive collation (``UNICODE_CI``; DuckDB spells it
    ``COLLATE NOCASE``) — no ``lower()`` rewrite, so at scale the
    optimizer keeps the ORIGINAL column for statistics and pruning
    instead of wrapping every row in a function. ASCII-only values, so
    the two engines' CI rules agree exactly; output passes the stored
    names through unchanged."""
    _view(spark, sf_dir, "supplier", "nation")
    return spark.sql("""
        SELECT n_name, count(*) AS n_sup
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name COLLATE UNICODE_CI IN ('nation_1', 'nation_7', 'nation_20')
        GROUP BY n_name
    """)


@query(
    "q_sql_listagg",
    oracle="""
        SELECT n_name,
               string_agg(s_name, ',' ORDER BY s_name) AS suppliers
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        GROUP BY n_name
    """,
    tags=("sql", "aggregate"),
)
def q_sql_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI ``LISTAGG ... WITHIN GROUP (ORDER BY ...)`` (new in Spark
    4.0; DuckDB spells it ``string_agg(..., ORDER BY)``) — the
    SQL-standard sibling of the DSL's sorted collect_list
    (q_collect_sorted). The explicit WITHIN GROUP order makes the
    concatenation deterministic on both engines; group payloads are
    supplier-name-sized, so the aggregate state stays bounded (listagg
    over unbounded-cardinality groups is the thing to avoid at 100 TB,
    same rule as collect_list)."""
    _view(spark, sf_dir, "supplier", "nation")
    return spark.sql("""
        SELECT n_name,
               listagg(s_name, ',') WITHIN GROUP (ORDER BY s_name) AS suppliers
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        GROUP BY n_name
    """)


@query(
    "q_sql_variables",
    oracle="""
        SELECT o_orderpriority, count(*) AS n_orders,
               max(o_totalprice) AS max_price
        FROM orders
        WHERE o_totalprice > 150000.0
        GROUP BY o_orderpriority
    """,
    tags=("sql", "variables"),
)
def q_sql_variables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session variables (Spark 4 ``DECLARE VARIABLE`` / ``SET VAR``):
    the threshold lives in typed session state and the query references
    it by name — the parameterization layer for SQL-only clients (no
    Python ``args=`` available), resolved at plan time so predicate
    pushdown sees the literal exactly as if it were inlined. DECLARE OR
    REPLACE keeps the query idempotent per session. The oracle is the
    resolved query; max(o_totalprice) passes a STORED double through
    (exact on both engines), no float accumulation."""
    _view(spark, sf_dir, "orders")
    spark.sql(
        "DECLARE OR REPLACE VARIABLE min_price DOUBLE DEFAULT 0.0"
    )
    spark.sql("SET VAR min_price = 150000.0")
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS n_orders,
               max(o_totalprice) AS max_price
        FROM orders
        WHERE o_totalprice > min_price
        GROUP BY o_orderpriority
        """
    )


@query(
    "q_sql_exec_immediate",
    oracle="""
        SELECT n_name, count(*) AS n_cust
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        WHERE c_acctbal > 100.0
        GROUP BY n_name
    """,
    tags=("sql", "variables"),
)
def q_sql_exec_immediate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``EXECUTE IMMEDIATE`` (Spark 4): the query TEXT arrives in a
    session variable (the dynamic-SQL path a SQL-only ETL framework
    uses) and positional parameters bind via ``USING`` — injection-safe
    like q_sql_parameterized, but driven entirely from SQL. The oracle
    is the resolved query (same shape as q_sql_parameterized's, which
    pins that dynamic and static execution agree)."""
    _view(spark, sf_dir, "customer", "nation")
    spark.sql("DECLARE OR REPLACE VARIABLE qtext STRING")
    spark.sql(
        """SET VAR qtext =
           'SELECT n_name, count(*) AS n_cust
            FROM customer JOIN nation ON c_nationkey = n_nationkey
            WHERE c_acctbal > ? GROUP BY n_name'"""
    )
    return spark.sql("EXECUTE IMMEDIATE qtext USING 100.0")


@query(
    "q_sql_scripting",
    oracle="""
        SELECT o_orderpriority, count(*) AS n_orders
        FROM orders
        WHERE o_totalprice > 175000.0
        GROUP BY o_orderpriority
    """,
    tags=("sql", "scripting"),
)
def q_sql_scripting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL scripting (Spark 4 compound statements): a BEGIN..END block
    with local DECLAREs and a WHILE loop computes the cutoff
    procedurally (100k + 3 × 25k = 175k), then the final SELECT is the
    block's result set — control flow INSIDE the SQL surface, no
    Python driver loop. The oracle inlines the loop's fixed point; the
    script's arithmetic is integral-step double math, identical on any
    engine."""
    _view(spark, sf_dir, "orders")
    spark.conf.set("spark.sql.scripting.enabled", "true")
    return spark.sql(
        """
        BEGIN
            DECLARE cutoff DOUBLE DEFAULT 100000.0;
            DECLARE i INT DEFAULT 0;
            WHILE i < 3 DO
                SET cutoff = cutoff + 25000.0;
                SET i = i + 1;
            END WHILE;
            SELECT o_orderpriority, count(*) AS n_orders
            FROM orders
            WHERE o_totalprice > cutoff
            GROUP BY o_orderpriority;
        END
        """
    )


@query(
    "q_transpose",
    oracle="""
        WITH a AS (
            SELECT o_orderpriority,
                   count(*) AS n_orders,
                   count(DISTINCT o_custkey) AS n_cust
            FROM orders GROUP BY 1
        )
        SELECT 'n_orders' AS key,
               (SELECT n_orders FROM a WHERE o_orderpriority = '1-URGENT') AS "1-URGENT",
               (SELECT n_orders FROM a WHERE o_orderpriority = '2-HIGH') AS "2-HIGH",
               (SELECT n_orders FROM a WHERE o_orderpriority = '3-MEDIUM') AS "3-MEDIUM",
               (SELECT n_orders FROM a WHERE o_orderpriority = '4-NOT SPECIFIED') AS "4-NOT SPECIFIED",
               (SELECT n_orders FROM a WHERE o_orderpriority = '5-LOW') AS "5-LOW"
        UNION ALL
        SELECT 'n_cust',
               (SELECT n_cust FROM a WHERE o_orderpriority = '1-URGENT'),
               (SELECT n_cust FROM a WHERE o_orderpriority = '2-HIGH'),
               (SELECT n_cust FROM a WHERE o_orderpriority = '3-MEDIUM'),
               (SELECT n_cust FROM a WHERE o_orderpriority = '4-NOT SPECIFIED'),
               (SELECT n_cust FROM a WHERE o_orderpriority = '5-LOW')
    """,
    tags=("relational", "reshape"),
)
def q_transpose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``DataFrame.transpose`` (Spark 4.0): a 5-row priority aggregate
    flipped so metrics become rows and priorities become columns — the
    matrix-reshape report layout (the inverse of q_unpivot's melt).
    Spark derives the output columns from the index column's VALUES, so
    the frame is ordered first (column order = row order, determinism)
    and both metrics share BIGINT (transpose requires a least common
    type across transposed columns). The oracle builds the same matrix
    with scalar subqueries — column NAMES must match the data values
    exactly, which is itself a pin that transpose names columns from
    the data."""
    o = t(spark, sf_dir, "orders")
    agg = (
        o.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_cust"),
        )
        .orderBy("o_orderpriority")
    )
    return agg.transpose()


@query(
    "q_lateral_join_api",
    oracle="""
        SELECT c_custkey, o_orderkey, o_totalprice
        FROM customer,
             LATERAL (SELECT o_orderkey, o_totalprice
                      FROM orders
                      WHERE o_custkey = c_custkey
                      ORDER BY o_totalprice DESC, o_orderkey
                      LIMIT 2) top2
        WHERE c_acctbal > 9000.0
    """,
    tags=("relational", "join", "lateral"),
)
def q_lateral_join_api(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``DataFrame.lateralJoin`` (Spark 4.0): per-customer top-2 orders
    by price, expressed as a correlated lateral subquery in the
    DataFrame DSL — ``F.col(...).outer()`` marks the outer reference,
    ORDER BY + LIMIT run PER DRIVING ROW. The API twin of
    q_sql_lateral_topk (which pins the SQL front-end form); at scale
    Catalyst rewrites the lateral limit into a partitioned window — no
    per-row subquery execution survives the plan. The (o_totalprice
    DESC, o_orderkey) order is total, so the top-2 set is
    deterministic; o_totalprice is a stored double passthrough."""
    c = t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000.0)
    o = t(spark, sf_dir, "orders")
    return c.lateralJoin(
        o.where(F.col("c_custkey").outer() == F.col("o_custkey"))
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(2)
    ).select("c_custkey", "o_orderkey", "o_totalprice")
