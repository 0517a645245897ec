"""Dynamic partition pruning evidence for q_dpp_partitioned, plus the
runtime bloom-filter injection config check (both are plan-level scale
features — results are layout-invariant and oracle-gated separately)."""

from __future__ import annotations

from pyspark.sql import functions as F

from map_reduce_framework_using_python_spark.plans.core import REGISTRY
from tests.conftest import SF_SMOKE


def test_dpp_partition_filters_in_plan(spark):
    df = REGISTRY["q_dpp_partitioned"].fn(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    # The scan must carry partition filters (the DPP subquery), not
    # read the whole layout.
    assert "PartitionFilters" in plan


def test_dpp_reads_only_matching_partitions(spark):
    # Materialize and compare against the unpartitioned computation.
    from map_reduce_framework_using_python_spark.plans.partitioned import (
        _DPP_DAYS,
        events_by_day,
    )
    from map_reduce_framework_using_python_spark.plans.core import t

    got = {
        (str(r["event_day"]), r["event_type"]): (r["n_events"], r["total_value"])
        for r in REGISTRY["q_dpp_partitioned"].fn(spark, SF_SMOKE).collect()
    }
    want = {
        (str(r["event_day"]), r["event_type"]): (r["n_events"], r["total_value"])
        for r in (
            t(spark, SF_SMOKE, "events")
            .withColumn("event_day", F.to_date("ts"))
            .filter(F.col("event_day").isin(list(_DPP_DAYS)))
            .groupBy("event_day", "event_type")
            .agg(
                F.count("*").alias("n_events"),
                F.round(F.sum("value"), 2).alias("total_value"),
            )
        ).collect()
    }
    assert got == want and got
    # Sanity: the layout itself holds many more days than the query reads.
    n_days = events_by_day(spark, SF_SMOKE).select("event_day").distinct().count()
    assert n_days > len(_DPP_DAYS)


def test_runtime_bloom_filter_injection(spark):
    # Spark's InjectRuntimeFilter: a selective fact↔fact join (too big
    # to broadcast both sides) gets a bloom-filter semi-reduction on
    # the probe side — the row-level cousin of DPP, and the 100 TB
    # answer when the join key is NOT the partition column.
    prev = spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    prev_thresh = spark.conf.get(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10MB"
    )
    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "512MB"
        )
        # Local testdata is far below the 10GB production default.
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        # Force a non-broadcast join so the runtime filter is the only
        # reduction available (local testdata is tiny).
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        from map_reduce_framework_using_python_spark.plans.core import t

        o = (
            t(spark, SF_SMOKE, "orders")
            .filter(F.col("o_orderpriority") == "1-URGENT")
            .select("o_orderkey")
        )
        l = t(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_quantity")
        j = l.join(o, l["l_orderkey"] == o["o_orderkey"]).agg(
            F.sum("l_quantity").alias("q")
        )
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom" in plan.lower(), plan[:2000]
    finally:
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", prev)
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", prev_thresh
        )
        spark.conf.unset(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)
