"""Partitioned-layout queries: dynamic partition pruning (DPP) on a
date-partitioned events layout.

The reference ships every partition to every job unconditionally — READ
pings all owning workers (`Master/masterhandler.py:53-57`) and MAPREDUCE
runs the mapper on every partition (`masterhandler.py:83-92`); there is
no partition elimination of any kind. Hive-style `partitionBy(day)`
layouts + Spark's static AND dynamic partition pruning are the scale
counterpart: a 100 TB events table partitioned by day serves a 3-day
query by LISTING three directories, and when the day set comes from a
JOIN (not a literal), DPP turns the broadcast dim into a runtime
partition filter.

The layout is a derived cache (like the ANN index and Z-order layouts):
built once per (sf_dir, row-count) under /tmp, manifest-validated, and
rebuilt when the source generation changes.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_framework_using_python_spark.plans.core import query, t

#: Days whose purchases the query rolls up; the dim side arrives as a
#: DataFrame (join → DPP), not a literal IN-list (→ static pruning).
_DPP_DAYS = ("2024-01-05", "2024-01-12", "2024-01-19")


def events_by_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events table in a Hive-partitioned-by-day parquet layout
    (built on first use, manifest-guarded against testdata refreshes)."""
    e = t(spark, sf_dir, "events")
    root = os.path.join(
        os.environ.get("SPARK_GRAFT_PART_ROOT", "/tmp/spark_graft_part"),
        os.path.basename(sf_dir.rstrip("/")) or "default",
    )
    path = os.path.join(root, "events_by_day")
    manifest = os.path.join(root, "_manifest.json")
    # Source-generation fingerprint via the SHARED helper (r7 review:
    # this file hand-rolled a weaker variant whose pq.ParquetFile(src)
    # crashed when events.parquet is a DIRECTORY of part files — a
    # layout sources/io.py explicitly supports). source_fingerprint
    # pins bytes + mtime + footer row count; no Spark job runs.
    from map_reduce_framework_using_python_spark.sources.io import (
        source_fingerprint,
    )

    src = os.path.join(sf_dir, "events.parquet")
    want = {
        "sf_dir": sf_dir,
        "src": source_fingerprint(src),
    }
    have = None
    if os.path.exists(manifest):
        with open(manifest) as fh:
            have = json.load(fh)
    if have != want:
        (
            e.withColumn("event_day", F.to_date("ts"))
            .write.mode("overwrite")
            .partitionBy("event_day")
            .parquet(path)
        )
        os.makedirs(root, exist_ok=True)
        with open(manifest, "w") as fh:
            json.dump(want, fh)
    return spark.read.parquet(path)


@query(
    "q_dpp_partitioned",
    oracle=f"""
        SELECT CAST(date_trunc('day', ts) AS DATE) AS event_day,
               event_type, count(*) AS n_events,
               round(sum(value), 2) AS total_value
        FROM events
        WHERE CAST(date_trunc('day', ts) AS DATE) IN
              ({", ".join(f"DATE '{d}'" for d in _DPP_DAYS)})
        GROUP BY 1, 2
    """,
    tags=("io", "partitioning", "analytics"),
)
def q_dpp_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type daily rollup for three days, answered from the
    date-partitioned layout via a JOIN against a tiny day dim — the
    shape that triggers **dynamic partition pruning**: the broadcast
    dim becomes a runtime `dynamicpruningexpression` on the partition
    column, and the scan lists only the 3 matching directories
    (PartitionFilters in EXPLAINS.md; pinned by
    tests/test_partitioned.py). At 100 TB this is the difference
    between reading ~3/90 of the table and reading it all — and unlike
    a literal IN-list (static pruning), it holds when the day set is
    data-driven.

    The oracle answers the same question from the raw table; results
    are layout-invariant.
    """
    part = events_by_day(spark, sf_dir)
    # A day-dim SPINE with a selective filter — DPP requires the build
    # side to carry a real predicate (a bare 3-row literal relation has
    # none, so the optimizer sees no pruning benefit to reuse).
    days = (
        spark.range(0, 366)
        .select(
            F.date_add(F.lit("2024-01-01").cast("date"), F.col("id").cast("int")).alias(
                "event_day"
            )
        )
        .filter(F.col("event_day").isin([F.lit(d).cast("date") for d in _DPP_DAYS]))
    )
    return (
        part.join(F.broadcast(days), "event_day")
        .groupBy("event_day", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )
