"""Bucketed-table co-located join: writing both sides bucketed by the
join key lets Spark plan a SortMergeJoin with NO Exchange on either side
— the 100 TB answer to 'this join shuffles every time' (pre-partitioning
amortized across every later join, SURVEY.md §7 P7 / pyspark guide
'Bucketing')."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from map_reduce_framework_using_python_spark.sources.io import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    # saveAsTable needs a warehouse; session fixture already set one up
    # (spark.sql.warehouse.dir defaults under cwd/spark-warehouse).
    for tbl in ("b_lineitem", "b_orders"):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    li = load_table(spark, SF_SMOKE, "lineitem")
    o = load_table(spark, SF_SMOKE, "orders")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable(
        "b_lineitem"
    )
    o.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable(
        "b_orders"
    )
    yield
    for tbl in ("b_lineitem", "b_orders"):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_bucketed_join_has_no_exchange(spark, warehouse):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    try:
        j = (
            spark.table("b_lineitem")
            .join(spark.table("b_orders"), F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderstatus")
            .agg(F.count("*").alias("n"))
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        n = {r["o_orderstatus"]: r["n"] for r in j.collect()}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    # Join itself runs without a shuffle on either side: the only
    # Exchange in the plan is the final tiny aggregation's.
    join_part = plan.split("HashAggregate")[-1]  # below the agg: join subtree
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning(l_orderkey" not in plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan
    assert "Exchange" not in join_part or "bucketed: true" in plan
    # And the answer is right.
    li = load_table(spark, SF_SMOKE, "lineitem")
    o = load_table(spark, SF_SMOKE, "orders")
    expected = {
        r["o_orderstatus"]: r["n"]
        for r in li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert n == expected


def test_bucket_pruning_metadata(spark, warehouse):
    """The scan reports its bucketing — the physical property later joins
    and aggs on the same key reuse."""
    plan = spark.table("b_lineitem")._jdf.queryExecution().executedPlan().toString()
    assert "Bucketed: true" in plan or "SelectedBucketsCount" in plan or "bucket" in plan.lower()


def test_bucketed_q18_zero_exchange_plan(spark):
    """q18 over bucketed facts: agg on the bucket key + co-located SMJ →
    NO Exchange anywhere in the plan (write-time shuffle, amortized)."""
    from map_reduce_framework_using_python_spark.plans.core import REGISTRY

    df = REGISTRY["q18_large_orders_bucketed"].fn(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan
    # Same answer as the scan-based twin.
    got = {tuple(r) for r in df.collect()}
    want = {tuple(r) for r in REGISTRY["q18_large_orders"].fn(spark, SF_SMOKE).collect()}
    assert got == want


def test_bucketed_q05_join_edge_has_no_orderkey_exchange(spark):
    """q05 over bucketed facts: the lineitem↔orders edge (the only
    non-broadcastable join at 100 TB) runs shuffle-free; the single
    remaining Exchange is the final tiny groupBy(n_name)."""
    from map_reduce_framework_using_python_spark.plans.core import REGISTRY

    df = REGISTRY["q05_local_supplier_bucketed"].fn(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning(l_orderkey" not in plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan
    got = {tuple(r) for r in df.collect()}
    want = {tuple(r) for r in REGISTRY["q05_local_supplier"].fn(spark, SF_SMOKE).collect()}
    assert got == want
