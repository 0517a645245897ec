"""Predicate & misc scalar surface: LIKE patterns, IN lists,
greatest/least, bitwise ops, BETWEEN, IS DISTINCT FROM."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_framework_using_python_spark.plans.core import query, t


@query(
    "q_predicates_misc",
    oracle="""
        SELECT p_partkey,
               greatest(p_size, 25) AS size_hi,
               least(p_size, 25) AS size_lo,
               p_name LIKE '%ar%' AS has_ar,
               p_brand IN ('Brand#1', 'Brand#2', 'Brand#3') AS is_top_brand,
               p_size & 7 AS size_and7,
               p_size | 8 AS size_or8,
               xor(p_size, 21) AS size_xor,
               p_size BETWEEN 10 AND 20 AS size_mid,
               p_type IS DISTINCT FROM 'PROMO' AS not_promo
        FROM part
    """,
    tags=("predicates", "expr"),
)
def q_predicates_misc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE / IN / greatest / least / bitwise / BETWEEN / null-safe
    inequality — the remaining predicate algebra in one pass."""
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.greatest("p_size", F.lit(25)).alias("size_hi"),
        F.least("p_size", F.lit(25)).alias("size_lo"),
        F.col("p_name").like("%ar%").alias("has_ar"),
        F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3").alias("is_top_brand"),
        F.col("p_size").bitwiseAND(F.lit(7)).alias("size_and7"),
        F.col("p_size").bitwiseOR(F.lit(8)).alias("size_or8"),
        F.col("p_size").bitwiseXOR(F.lit(21)).alias("size_xor"),
        F.col("p_size").between(10, 20).alias("size_mid"),
        (~F.col("p_type").eqNullSafe("PROMO")).alias("not_promo"),
    )
