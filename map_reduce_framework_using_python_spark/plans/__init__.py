"""Query plan library — the engine's public query surface.

Every capability row of SURVEY.md §2.B is realized here as a named query:
a Spark DataFrame builder plus (where SQL-expressible) a DuckDB oracle
string over the same parquet tables. The driver's correctness gate runs
both sides and hash-compares (BASELINE.md).

Import side effects register queries into :data:`REGISTRY`.
"""

from map_reduce_framework_using_python_spark.plans.core import REGISTRY, Query, get_query, query

# Register all query modules (import order = display order).
from map_reduce_framework_using_python_spark.plans import relational  # noqa: E402,F401
from map_reduce_framework_using_python_spark.plans import joins  # noqa: E402,F401
from map_reduce_framework_using_python_spark.plans import windows  # noqa: E402,F401
from map_reduce_framework_using_python_spark.plans import events  # noqa: E402,F401
from map_reduce_framework_using_python_spark.plans import northstar  # noqa: E402,F401
from map_reduce_framework_using_python_spark.plans import mrcompat  # noqa: E402,F401
from map_reduce_framework_using_python_spark.plans import extras  # noqa: E402,F401
from map_reduce_framework_using_python_spark.plans import streaming_queries  # noqa: E402,F401
from map_reduce_framework_using_python_spark.plans import udf_queries  # noqa: E402,F401
from map_reduce_framework_using_python_spark.plans import relational2  # noqa: E402,F401
from map_reduce_framework_using_python_spark.plans import udtf_queries  # noqa: E402,F401
from map_reduce_framework_using_python_spark.plans import subqueries  # noqa: E402,F401
from map_reduce_framework_using_python_spark.plans import extras2  # noqa: E402,F401
from map_reduce_framework_using_python_spark.plans import predicates  # noqa: E402,F401
from map_reduce_framework_using_python_spark.plans import ann_queries  # noqa: E402,F401
from map_reduce_framework_using_python_spark.plans import tpch2  # noqa: E402,F401
from map_reduce_framework_using_python_spark.plans import bucketed  # noqa: E402,F401
from map_reduce_framework_using_python_spark.plans import pipeline_queries  # noqa: E402,F401
from map_reduce_framework_using_python_spark.plans import funnel  # noqa: E402,F401
from map_reduce_framework_using_python_spark.plans import pipeline2  # noqa: E402,F401
from map_reduce_framework_using_python_spark.plans import sqlapi  # noqa: E402,F401
from map_reduce_framework_using_python_spark.plans import clustering_queries  # noqa: E402,F401
from map_reduce_framework_using_python_spark.plans import maintenance  # noqa: E402,F401
from map_reduce_framework_using_python_spark.plans import skew_queries  # noqa: E402,F401
from map_reduce_framework_using_python_spark.plans import pipeline3  # noqa: E402,F401
from map_reduce_framework_using_python_spark.plans import pipeline4  # noqa: E402,F401
from map_reduce_framework_using_python_spark.plans import graph_queries  # noqa: E402,F401
from map_reduce_framework_using_python_spark.plans import pipeline5  # noqa: E402,F401
from map_reduce_framework_using_python_spark.plans import pipeline6  # noqa: E402,F401
from map_reduce_framework_using_python_spark.plans import analytics  # noqa: E402,F401
from map_reduce_framework_using_python_spark.plans import partitioned  # noqa: E402,F401
from map_reduce_framework_using_python_spark.plans import quality  # noqa: E402,F401
from map_reduce_framework_using_python_spark.plans import stats2  # noqa: E402,F401
from map_reduce_framework_using_python_spark.plans import pipeline7  # noqa: E402,F401
from map_reduce_framework_using_python_spark.plans import pipeline8  # noqa: E402,F401

__all__ = ["REGISTRY", "Query", "get_query", "query"]
