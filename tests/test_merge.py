"""MERGE / SCD2 / CDC emulation tests on crafted frames."""

from __future__ import annotations

from pyspark.sql import functions as F

from map_reduce_framework_using_python_spark.operators.merge import (
    changes_between,
    merge_delete,
    merge_upsert,
    scd2_apply,
)


def test_merge_upsert(spark):
    target = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], ["id", "v"])
    source = spark.createDataFrame([(2, "B"), (4, "D")], ["id", "v"])
    out = {r["id"]: r["v"] for r in merge_upsert(target, source, "id").collect()}
    assert out == {1: "a", 2: "B", 3: "c", 4: "D"}


def test_merge_delete(spark):
    target = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"])
    deletes = spark.createDataFrame([(2,)], ["id"])
    out = {r["id"] for r in merge_delete(target, deletes, "id").collect()}
    assert out == {1}


def test_scd2_apply(spark):
    dim = spark.createDataFrame(
        [(1, "addr_v1", "2020-01-01", None, True), (2, "addr_x", "2020-01-01", None, True)],
        "id long, addr string, valid_from string, valid_to string, is_current boolean",
    ).select(
        "id",
        "addr",
        F.col("valid_from").cast("timestamp").alias("valid_from"),
        F.col("valid_to").cast("timestamp").alias("valid_to"),
        "is_current",
    )
    updates = spark.createDataFrame(
        [(1, "addr_v2", "2023-06-01")], "id long, addr string, valid_from string"
    ).withColumn("valid_from", F.col("valid_from").cast("timestamp"))
    out = scd2_apply(dim, updates, "id")
    rows = sorted(
        ((r["id"], r["addr"], r["is_current"], str(r["valid_to"])) for r in out.collect())
    )
    assert rows == [
        (1, "addr_v1", False, "2023-06-01 00:00:00"),  # closed out
        (1, "addr_v2", True, "None"),                  # new current
        (2, "addr_x", True, "None"),                   # untouched
    ]
    # Exactly one current row per key.
    cur = out.filter("is_current").groupBy("id").count().collect()
    assert all(r["count"] == 1 for r in cur)


def test_changes_between(spark):
    before = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], ["id", "v"])
    after = spark.createDataFrame([(2, "B"), (3, "c"), (4, "d")], ["id", "v"])
    out = {r["id"]: r["change_type"] for r in changes_between(before, after, "id").collect()}
    assert out == {1: "delete", 2: "update", 4: "insert"}  # 3 unchanged → absent