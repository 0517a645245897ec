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
        WHERE word <> '' AND word NOT LIKE '%,%'
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


@query(
    "st_mrtext_stream",
    oracle="""
        SELECT text FROM documents WHERE lang = 'de'
    """,
    tags=("mr_compat", "streaming"),
)
def st_mrtext_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream the reference's DFS layout as micro-batches: the 'de'
    document texts land as mrtext part files (the reference's WRITE,
    op 1), then ``readStream.format("mrtext")`` drains them through
    the Spark 4 Python streaming DataSource
    (sources/mrfs.py:MRTextStreamReader) — offsets are manifest
    positions, so the checkpoint gives exactly-once per part (resume
    pinned in tests/test_mrfs.py). FULL oracle: the round trip must
    reproduce exactly the filtered text column (documents are
    single-line, so lines ⇔ rows); the part index is dropped from the
    output because line→part placement follows the writer's physical
    partitioning, which no ANSI engine can replay."""
    from map_reduce_framework_using_python_spark.plans.ann_queries import (
        _scratch_dir,
    )
    from map_reduce_framework_using_python_spark.sources import mrfs
    from map_reduce_framework_using_python_spark.streaming.windows import (
        run_available_now,
    )

    # atexit-reclaimed scratch (r7 review: one full 'de'-corpus copy
    # leaked to /tmp per invocation).
    work = _scratch_dir("st_mrtext_")
    dfs_dir = f"{work}/dfs"

    # Both resolution points (batch write, stream read) run under
    # register + active-session pin + retry: in a FOREIGN session (the
    # driver's) earlier streaming queries leave stale session clones on
    # the serving Py4J thread and `mrtext` resolution intermittently
    # throws ClassNotFoundException (NOTES lesson 12; the round-11
    # driver red row). mrfs.with_resolution_retry makes the query
    # self-sufficient in any session.
    def _write():
        (
            t(spark, sf_dir, "documents")
            .filter(F.col("lang") == "de")
            .repartition(3)
            .select(F.lit(0).alias("part"), F.col("text").alias("value"))
            .write.format("mrtext")
            .mode("append")
            .save(dfs_dir)
        )

    mrfs.with_resolution_retry(spark, _write)

    import uuid

    def _drain():
        stream = (
            spark.readStream.format("mrtext")
            .load(dfs_dir)
            .select(F.col("value").alias("text"))
        )
        return run_available_now(
            stream, f"st_mrtext_{uuid.uuid4().hex[:8]}", output_mode="append"
        )

    return mrfs.with_resolution_retry(spark, _drain)


@query(
    "st_mrtext_sink",
    oracle="""
        SELECT text FROM documents WHERE lang = 'de'
    """,
    tags=("mr_compat", "streaming"),
)
def st_mrtext_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DFS layout as a streaming SINK (r12 —
    sources/mrfs.MRTextStreamWriter, the Spark 4 Python
    DataSourceStreamWriter API): the 'de' document stream lands as
    mrtext part files named ``part_{batch:06d}_{i:04d}``, commit
    replacing the batch's own parts so at-least-once replay is
    exactly-once on disk. FULL oracle: the landed parts batch-read
    back must reproduce exactly the filtered text column (documents
    are single-line). The inverse of st_mrtext_stream — together they
    close the relay topology (stream INTO the reference's layout,
    stream OUT of it). Same resolution hardening (the driver-session
    clone race) on both the stream start and the read-back."""
    from map_reduce_framework_using_python_spark.plans.ann_queries import (
        _scratch_dir,
    )
    from map_reduce_framework_using_python_spark.sources import mrfs
    from map_reduce_framework_using_python_spark.streaming.ingest import (
        read_documents_stream,
    )

    work = _scratch_dir("st_mrtext_sink_")
    dfs_dir = f"{work}/dfs"

    def _drain():
        q = (
            read_documents_stream(spark, sf_dir)
            .filter(F.col("lang") == "de")
            .select(F.lit(0).alias("part"), F.col("text").alias("value"))
            .writeStream.format("mrtext")
            .option("path", dfs_dir)
            .option("checkpointLocation", f"{work}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    mrfs.with_resolution_retry(spark, _drain)
    return mrfs.with_resolution_retry(
        spark,
        lambda: spark.read.format("mrtext")
        .load(dfs_dir)
        .select(F.col("value").alias("text")),
    )
