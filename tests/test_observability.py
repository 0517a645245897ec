"""Pipeline observability surface: ``df.observe`` (named metrics piggy-
backed on a job — data-quality counters with zero extra passes) and
schema evolution on parquet reads (``mergeSchema`` — the long-lived
table whose shards gained a column mid-stream, routine at 100 TB)."""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from map_reduce_framework_using_python_spark.plans.core import t
from tests.conftest import SF_SMOKE


def test_observe_quality_metrics_single_pass(spark, tmp_path):
    """observe() collects row/null/sum metrics during the SAME job that
    writes the output — the scalable replacement for a separate
    validation scan (at 100 TB a second pass costs as much as the
    pipeline stage itself)."""
    obs = Observation("quality")
    d = (
        t(spark, SF_SMOKE, "events")
        .observe(
            obs,
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("value").isNull().cast("long")).alias("n_null_value"),
            F.min("ts").alias("min_ts"),
        )
        .filter(F.col("event_type") == "purchase")
    )
    out = str(tmp_path / "purchases")
    d.write.mode("overwrite").parquet(out)

    got = obs.get
    # metrics describe the observed frame (pre-filter), from the one job
    assert got["n_rows"] == t(spark, SF_SMOKE, "events").count()
    assert got["n_null_value"] == 0
    assert got["min_ts"] is not None
    assert spark.read.parquet(out).count() > 0


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Old shards lack a column newer shards carry; mergeSchema unions
    the schemas and backfills nulls — no rewrite of historical data."""
    base = str(tmp_path / "tbl")
    spark.range(0, 10).select(
        F.col("id"), F.lit("old").alias("src")
    ).write.parquet(base + "/batch=1")
    spark.range(10, 20).select(
        F.col("id"), F.lit("new").alias("src"), (F.col("id") * 2).alias("extra")
    ).write.parquet(base + "/batch=2")

    merged = spark.read.option("mergeSchema", "true").parquet(base)
    assert set(merged.columns) == {"id", "src", "extra", "batch"}
    assert merged.count() == 20
    old = merged.filter(F.col("batch") == 1)
    assert old.filter(F.col("extra").isNull()).count() == 10
    new_sum = merged.filter(F.col("batch") == 2).agg(F.sum("extra")).first()[0]
    assert new_sum == sum(i * 2 for i in range(10, 20))


def test_dynamic_partition_overwrite(spark, tmp_path):
    """partitionOverwriteMode=dynamic replaces ONLY the partitions the
    write touches — the incremental-backfill contract (static mode
    would truncate the whole table first)."""
    path = str(tmp_path / "tbl")
    spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "id long, day string"
    ).write.partitionBy("day").parquet(path)

    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        spark.createDataFrame(
            [(99, "b")], "id long, day string"
        ).write.mode("overwrite").partitionBy("day").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    got = {(r["id"], r["day"]) for r in spark.read.parquet(path).collect()}
    # day=a untouched, day=b replaced
    assert got == {(1, "a"), (2, "a"), (99, "b")}
