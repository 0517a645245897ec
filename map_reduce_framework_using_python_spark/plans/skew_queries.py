"""Oracle-gated skew-mitigation query (operators/skew.py).

The reference's hand-rolled partitioner (``Worker/shuffler.py:6-10``)
lands hot keys on one worker and the job serializes — the 100 TB
version of that failure is a straggler reducer on a hot key. The salted
path spreads each hot key over ``n_salts`` reducers and MUST be
result-identical to the unsalted plan; registering it with a plain-SQL
DuckDB oracle makes that equivalence a driver-hard signal instead of a
pytest-only pin (VERDICT r2 item 8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_framework_using_python_spark.operators.skew import salted_agg, salted_join
from map_reduce_framework_using_python_spark.plans.core import dec, query, t


@query(
    "q_skew_salted",
    oracle="""
        SELECT o.o_orderpriority,
               CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               count(*) AS n_items
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        GROUP BY 1
    """,
    tags=("skew", "join", "agg"),
)
def q_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈dim join + aggregation routed ENTIRELY through the salted
    operators: ``salted_join`` spreads each l_orderkey over 8 salt
    buckets (small side replicated 8×), then ``salted_agg`` two-phase
    aggregates the 5-value hot key o_orderpriority over (key, salt)
    partials. The oracle is the plain unsalted SQL — salting must be
    invisible in the result. Sums ride the exact DECIMAL grid
    (plans/core.py) so partial re-aggregation is tie-free."""
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    dim = t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    j = salted_join(li, dim, "l_orderkey", n_salts=8)
    out = salted_agg(
        j,
        "o_orderpriority",
        {"sum_qty": F.sum(dec("l_quantity")), "n_items": F.count("*")},
        n_salts=8,
    )
    return out.select(
        "o_orderpriority",
        F.col("sum_qty").cast("double").alias("sum_qty"),
        "n_items",
    )
