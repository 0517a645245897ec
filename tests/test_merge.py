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

def test_scd2_two_updates_one_key_chain_without_fanout(spark):
    """r7 review: two updates for one key in a batch must CHAIN (first
    closes the current row and is itself closed by the second; only the
    second stays current) — the old per-update left join duplicated
    every dim row of that key."""
    from datetime import datetime

    dim = spark.createDataFrame(
        [(1, "a", datetime(2020, 1, 1), None, True),
         (2, "z", datetime(2020, 1, 1), None, True)],
        "k INT, attr STRING, valid_from TIMESTAMP, valid_to TIMESTAMP,"
        " is_current BOOLEAN",
    )
    updates = spark.createDataFrame(
        [(1, "b", datetime(2021, 1, 1)), (1, "c", datetime(2022, 1, 1))],
        "k INT, attr STRING, valid_from TIMESTAMP",
    )
    out = scd2_apply(dim, updates, "k")
    rows = sorted(
        ((r["k"], r["attr"], r["valid_from"], r["valid_to"], r["is_current"])
         for r in out.collect()),
        key=lambda x: (x[0], x[2]),
    )
    assert len(rows) == 4  # no fan-out: 2 dim rows + 2 chained updates
    k1 = [r for r in rows if r[0] == 1]
    assert k1[0][1] == "a" and k1[0][3] == datetime(2021, 1, 1) and not k1[0][4]
    assert k1[1][1] == "b" and k1[1][3] == datetime(2022, 1, 1) and not k1[1][4]
    assert k1[2][1] == "c" and k1[2][3] is None and k1[2][4]
    k2 = [r for r in rows if r[0] == 2]
    assert k2 == [(2, "z", datetime(2020, 1, 1), None, True)]


def test_scd2_same_instant_updates_deterministic_and_end_type(spark):
    """r7 operators review: two updates with equal (key, valid_from)
    had unspecified lead() order — the chain now tiebreaks over the
    remaining columns; and end_col takes the DIM's type instead of a
    hard-coded timestamp cast."""
    from map_reduce_framework_using_python_spark.operators.merge import scd2_apply

    dim = spark.createDataFrame(
        [(1, "x", "2024-01-01", None, True)],
        "k long, attr string, valid_from string, valid_to string, is_current boolean",
    )
    upd = spark.createDataFrame(
        [(1, "zz", "2024-02-01"), (1, "aa", "2024-02-01")],
        "k long, attr string, valid_from string",
    )
    outs = [
        sorted(
            (r["attr"], r["is_current"])
            for r in scd2_apply(dim, upd, key="k").collect()
        )
        for _ in range(3)
    ]
    assert outs[0] == outs[1] == outs[2]  # deterministic under ties
    current = [a for a, cur in outs[0] if cur]
    assert current == ["zz"]  # lexicographic tiebreak: 'zz' sorts last
    # end_col keeps the dim's string type (no timestamp coercion)
    out_df = scd2_apply(dim, upd, key="k")
    assert dict(out_df.dtypes)["valid_to"] == "string"


def test_changes_between_null_keys_classify_correctly(spark):
    """r7 operators review: presence was tested via the key VALUE being
    NULL, so a before-only NULL-key row reported 'insert' — marker
    columns now classify it as the delete it is."""
    from map_reduce_framework_using_python_spark.operators.merge import (
        changes_between,
    )

    before = spark.createDataFrame([(None, "gone"), (1, "same")], "k long, v string")
    after = spark.createDataFrame([(1, "same")], "k long, v string")
    out = [(r["k"], r["change_type"]) for r in changes_between(before, after, "k").collect()]
    assert out == [(None, "delete")]
