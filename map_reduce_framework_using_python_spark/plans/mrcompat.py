"""Lane-A queries: the reference's literal streaming-UDF model, driven
through the same registry/oracle gate as the relational lane.

``mr_wordcount_pipe`` is the reference's canonical job (word count via
mapper/reducer subprocesses, ``Worker/worker_v1.py:109``) executed with
bit-compatible semantics — subprocess pipes, first-comma-field hash
shuffle, lexicographic raw-line sort — and its output must equal the
Lane-B DataFrame word count (``ns_wordcount``) and the DuckDB oracle.
That three-way agreement is SURVEY.md §5's MR-equivalence gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_framework_using_python_spark.mr.job import (
    WORDCOUNT_MAPPER,
    WORDCOUNT_REDUCER,
    MRJob,
)
from map_reduce_framework_using_python_spark.plans.core import query, t


@query(
    "mr_wordcount_pipe",
    oracle="""
        SELECT word, count(*) AS n
        FROM (SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents)
        WHERE word <> ''
        GROUP BY word
    """,
    tags=("mr_compat", "pipe"),
)
def mr_wordcount_pipe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word count through the Lane-A pipeline: ``pipe(mapper.py) →
    hash-shuffle(first comma field) → lexicographic sort →
    pipe(reducer.py)`` (reference ops 3-6, SURVEY.md §2.A)."""
    lines = t(spark, sf_dir, "documents").select("text")
    job = MRJob(spark, WORDCOUNT_MAPPER, WORDCOUNT_REDUCER, n_partitions=8)
    kv = job.run_to_kv_df(lines, key_name="word", value_name="n")
    return kv.select("word", F.col("n").cast("bigint").alias("n"))
