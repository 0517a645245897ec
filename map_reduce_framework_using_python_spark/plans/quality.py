"""Operational-quality queries on the driver surface: a column profiler
(ANALYZE-TABLE-style statistics) and a declarative expectations run.

The reference's only metadata is the per-partition ``filename,filesize,
header`` manifest (`Master/masterhandler.py:154-155`) — it has no
notion of column statistics or data contracts. These queries are the
warehouse-side counterpart: the stats a cost-based optimizer or a data
catalog would collect, and the dbt-test/Deequ-style contract check a
pipeline runs before publishing, each as ONE aggregation pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_framework_using_python_spark.plans.core import query, t

# Column → expression that renders min/max on an engine-stable string
# grid (bigints and 2-dp decimals print identically on both engines;
# raw doubles would not).
_PROFILE_COLS = {
    "o_orderkey": "CAST({c} AS VARCHAR)",
    "o_custkey": "CAST({c} AS VARCHAR)",
    "o_orderstatus": "{c}",
    "o_totalprice": "CAST(CAST({c} AS DECIMAL(18,2)) AS VARCHAR)",
    "o_orderdate": "CAST({c} AS VARCHAR)",
    "o_orderpriority": "{c}",
}


def _profile_oracle() -> str:
    # min/max aggregate the TYPED column (numeric order), then render
    # the single result value on the stable string grid — stringifying
    # before the aggregate would report lexicographic extremes
    # ("99" > "100").
    parts = [
        f"""SELECT '{c}' AS column_name,
                   count(*) AS n_rows,
                   count(*) - count({c}) AS n_nulls,
                   count(DISTINCT {c}) AS n_distinct,
                   {expr.format(c=f"min({c})")} AS min_str,
                   {expr.format(c=f"max({c})")} AS max_str
            FROM orders"""
        for c, expr in _PROFILE_COLS.items()
    ]
    return " UNION ALL ".join(parts)


@query(
    "q_profile_stats",
    oracle=_profile_oracle(),
    tags=("agg", "quality", "maintenance"),
)
def q_profile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level profile of ``orders`` — row count, null count,
    distinct count, and TYPED min/max rendered on an engine-stable
    string grid (ints and 2-dp decimals; raw doubles are never
    stringified, and the aggregate runs on the typed column so numeric
    extremes are numeric, not lexicographic).

    One wide aggregate computes every column's stats in a single scan
    (the profiler never runs one job per column), then unpivots to the
    long (column_name, stats…) form a catalog stores. min/max over
    strings use binary ordering on ASCII data — identical in both
    engines. This is the input ANALYZE TABLE feeds a CBO.
    """
    o = t(spark, sf_dir, "orders")
    aggs = []
    for c, expr in _PROFILE_COLS.items():
        spark_expr = expr.replace("VARCHAR", "STRING")
        aggs += [
            F.count("*").alias(f"{c}__n"),
            (F.count("*") - F.count(c)).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            F.expr(spark_expr.format(c=f"min({c})")).alias(f"{c}__min"),
            F.expr(spark_expr.format(c=f"max({c})")).alias(f"{c}__max"),
        ]
    wide = o.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__n, {c}__nulls, {c}__distinct, {c}__min, {c}__max"
        for c in _PROFILE_COLS
    )
    return wide.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack_args}) AS "
            "(column_name, n_rows, n_nulls, n_distinct, min_str, max_str)"
        )
    )


@query(
    "q_data_quality",
    oracle="""
        SELECT 'not_null_l_orderkey' AS rule,
               CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS violations
        FROM lineitem
        UNION ALL
        SELECT 'in_range_l_quantity',
               CAST(sum(CASE WHEN l_quantity IS NOT NULL
                              AND NOT (l_quantity BETWEEN 1 AND 50)
                             THEN 1 ELSE 0 END) AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'in_range_l_discount',
               CAST(sum(CASE WHEN l_discount IS NOT NULL
                              AND NOT (l_discount BETWEEN 0.0 AND 0.1)
                             THEN 1 ELSE 0 END) AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'in_set_l_returnflag',
               CAST(sum(CASE WHEN l_returnflag IS NOT NULL
                              AND l_returnflag NOT IN ('A', 'N', 'R')
                             THEN 1 ELSE 0 END) AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'unique_l_orderkey_l_linenumber',
               CAST(coalesce(sum(cnt - 1), 0) AS BIGINT)
        FROM (SELECT count(*) AS cnt FROM lineitem
              GROUP BY l_orderkey, l_linenumber)
    """,
    tags=("agg", "quality"),
)
def q_data_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The declarative expectations suite (operators/expectations.py
    semantics — value rules skip NULLs, nullability is ``not_null``'s
    job) as a LAZY long-form result: (rule, violations).

    All scalar rules evaluate in ONE conditional-aggregate scan; the
    uniqueness rule is the only one needing a key shuffle. The
    (l_orderkey, l_linenumber) uniqueness rule is deliberately a
    NON-zero row: the synthetic lineitem has duplicate pairs (NOTES.md
    lesson #10) and a contract check that can only ever print zeros
    proves nothing.
    """
    # Compose the SAME Column builders the eager suite uses
    # (operators/expectations.py) instead of re-implementing
    # "violation" locally — two definitions were free to drift
    # (r7 review); now the claim of expectations semantics is
    # mechanically true.
    from map_reduce_framework_using_python_spark.operators.expectations import (
        _viol,
        _viol_skip_nulls,
    )

    l = t(spark, sf_dir, "lineitem")
    scalar = l.agg(
        _viol(F.col("l_orderkey").isNotNull())
        .cast("bigint")
        .alias("not_null_l_orderkey"),
        _viol_skip_nulls(F.col("l_quantity").between(1, 50), "l_quantity")
        .cast("bigint")
        .alias("in_range_l_quantity"),
        _viol_skip_nulls(F.col("l_discount").between(0.0, 0.1), "l_discount")
        .cast("bigint")
        .alias("in_range_l_discount"),
        _viol_skip_nulls(F.col("l_returnflag").isin("A", "N", "R"), "l_returnflag")
        .cast("bigint")
        .alias("in_set_l_returnflag"),
    ).select(
        F.expr(
            "stack(4, 'not_null_l_orderkey', not_null_l_orderkey, "
            "'in_range_l_quantity', in_range_l_quantity, "
            "'in_range_l_discount', in_range_l_discount, "
            "'in_set_l_returnflag', in_set_l_returnflag) AS (rule, violations)"
        )
    )
    uniq = (
        l.groupBy("l_orderkey", "l_linenumber")
        .count()
        .agg(
            F.coalesce(F.sum(F.col("count") - 1), F.lit(0))
            .cast("bigint")
            .alias("violations")
        )
        .select(F.lit("unique_l_orderkey_l_linenumber").alias("rule"), "violations")
    )
    return scalar.unionByName(uniq)
