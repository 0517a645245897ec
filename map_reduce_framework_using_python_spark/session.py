"""SparkSession factory — the engine's analog of the reference's cluster
bootstrap (``Master/start-all.py:7-24`` + ``Master/info.txt``).

Where the reference spawns ``worker_count`` single-threaded HTTP servers on
``base_port``+i and a master on :8031, we configure one SparkSession whose
scheduler/shuffle-service subsume all of that. Parallelism is decoupled from
"cluster size" (the reference hard-wires partitions == workers,
``masterhandler.py:24``): shuffle partitioning is a config, and AQE
re-plans it at runtime.

Scale notes (100 TB design): every config here is sized for local[32]
testing but chosen so the same code runs on a 1000-executor cluster —
AQE (coalescing + skew-join splitting), 128 MiB scan partitions, Arrow
for any Python exchange, UTC session time.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(
    app_name: str = "map_reduce_framework_using_python_spark",
    master: str | None = None,
    shuffle_partitions: int = DEFAULT_SHUFFLE_PARTITIONS,
    driver_memory: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine session.

    AQE is on: at 100 TB the static shuffle-partition count is always
    wrong somewhere, so we let Spark coalesce small post-shuffle
    partitions and split skewed ones (the reference's ``myHash`` skew
    lesson, ``Worker/shuffler.py:6-10`` — see SURVEY.md §4).
    """
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Let AQE re-plan (coalesce) the shuffles INSIDE a cached-plan
        # materialization (default false pins a cached subtree to the
        # static shuffle-partition count for output-partitioning
        # stability). Our lazily-persisted intermediates (the capstone
        # curated table, the r14 bigram-model/score caches) are bounded
        # model state whose consumers never rely on their partitioning,
        # and without AQE their materialization runs every tiny shuffle
        # at the full static partition count (r14: measured 32 near-
        # empty tasks per cached stage at bench scale; at cluster scale
        # the static count is just as wrong in the other direction).
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
        # Partition-discovery strategy for the persisted index layouts
        # (LSH/IVF/IVF-PQ dirs are partitionBy(bucket|centroid_id) —
        # 64–5000 directories): above this many paths Spark launches a
        # DISTRIBUTED listing job, which on a local filesystem costs
        # ~0.5–3 s of job overhead per spark.read (r14: measured 0.6–
        # 0.8 s warm per probe plan-build at 256 dirs, 0.07–0.16 s with
        # driver-serial listing — a 10× cut on every indexed-probe
        # call). Local default lists serially up to 8192 dirs; override
        # for object-store clusters where distributed listing wins
        # (SPARK_GRAFT_PARTITION_DISCOVERY_THRESHOLD).
        .config(
            "spark.sql.sources.parallelPartitionDiscovery.threshold",
            os.environ.get("SPARK_GRAFT_PARTITION_DISCOVERY_THRESHOLD", "8192"),
        )
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # Real Trigger.AvailableNow for sources that don't declare
        # SupportsTriggerAvailableNow (the Python DataSource bridge,
        # PythonMicroBatchStream, never does): Spark's AvailableNow
        # wrapper pins the end offset once at query start and drains to
        # it, instead of the warned single-batch fallback (r13; the
        # mrtext stream reader relies on it — sources/mrfs.py).
        .config("spark.sql.streaming.triggerAvailableNowWrapper.enabled", "true")
        .config("spark.ui.enabled", "false")
    )
    if master is not None:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{DEFAULT_CPUS}]")
    # Local mode = single JVM: spark.driver.memory is the ONLY memory
    # knob. The 1g default dies on multi-GB writes (measured at a 50×
    # scale probe); 8g is safe for every workload in this repo.
    builder = builder.config(
        "spark.driver.memory",
        driver_memory or os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    # Register the custom Python data source at SESSION BUILD, not
    # first use. The JVM resolves Python sources through the ACTIVE
    # session of whatever thread serves the call, and streaming
    # execution clones the session per query — a Py4J thread that
    # inherited a clone made BEFORE a later registration resolves
    # against the clone's (stale) manager and throws
    # DATA_SOURCE_NOT_FOUND intermittently. Registering before any
    # stream can run means every clone inherits the source.
    if not getattr(spark, "_mrtext_registered", False):
        from map_reduce_framework_using_python_spark.sources import mrfs

        mrfs.register(spark)
        spark._mrtext_registered = True
    return spark
