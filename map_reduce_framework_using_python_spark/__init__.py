"""PySpark-native analytics engine — capability port of YaMR.

A brand-new engine with the query/data-processing capabilities of
NeerajG03/Map-Reduce-Framework-Using-Python (reference at /root/reference,
analyzed in SURVEY.md), re-expressed idiomatically on Apache Spark:

- Lane A ("MR-compat", :mod:`.mr`): the reference's literal model —
  partitioned line-text files, streaming mapper/reducer subprocesses,
  hash shuffle on the first comma-field, lexicographic per-partition
  sort — on RDD ``pipe``/``repartitionAndSortWithinPartitions``.
- Lane B ("relational", :mod:`.plans` + :mod:`.operators`): the full
  MapReduce-expressible algebra (SURVEY.md §2.B) as first-class
  DataFrame/SQL operators, plus the north-star LLM-pipeline extensions
  (dedup, similarity search, text analysis, multimodal columns) and
  Structured Streaming.

Everything is designed for multi-executor scale: declarative plans for
Catalyst (pushdown/pruning/join selection), broadcast for small dims,
AQE for skew, no driver-side collect in any operator path.
"""

from map_reduce_framework_using_python_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
