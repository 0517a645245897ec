"""bucketed_rank / ntile_from_rank: exact equivalence to the
single-partition global window they replace, plus plan-shape proof that
no single-partition exchange remains (VERDICT r2 item 4)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from map_reduce_framework_using_python_spark.operators.ranks import (
    bucketed_rank,
    ntile_from_rank,
)


@pytest.fixture(scope="module")
def df(spark):
    # Deliberately skewed + duplicate values; unique id as tiebreak.
    rows = [(i, (i * 37) % 50 + (1000 if i % 7 == 0 else 0)) for i in range(997)]
    return spark.createDataFrame(rows, "id long, v long")


def test_rank_matches_global_window(spark, df):
    want = df.select(
        "id", F.row_number().over(Window.orderBy("v", "id")).alias("rn")
    )
    got = bucketed_rank(
        df, bucket=F.floor(F.col("v") / 100), order_by=[F.col("v"), F.col("id")]
    ).select("id", F.col("rn").cast("int").alias("rn"))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_rank_desc_order(spark, df):
    want = df.select(
        "id",
        F.row_number().over(Window.orderBy(F.col("v").desc(), F.col("id"))).alias("rn"),
    )
    got = bucketed_rank(
        df,
        bucket=F.floor(-F.col("v") / 100),
        order_by=[F.col("v").desc(), F.col("id")],
    ).select("id", F.col("rn").cast("int").alias("rn"))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


@pytest.mark.parametrize("k", [1, 3, 4, 7])
def test_ntile_matches_sql_semantics(spark, df, k):
    want = df.select(
        "id", F.ntile(k).over(Window.orderBy("v", "id")).alias("tile")
    )
    ranked = bucketed_rank(
        df, bucket=F.floor(F.col("v") / 100), order_by=[F.col("v"), F.col("id")]
    )
    got = ranked.select(
        "id", ntile_from_rank(F.col("rn"), F.col("n_total"), k).alias("tile")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_ntile_fewer_rows_than_tiles(spark):
    small = spark.createDataFrame([(i, i) for i in range(3)], "id long, v long")
    want = small.select(
        "id", F.ntile(8).over(Window.orderBy("v", "id")).alias("tile")
    )
    ranked = bucketed_rank(small, bucket=F.lit(0), order_by=[F.col("v"), F.col("id")])
    got = ranked.select(
        "id", ntile_from_rank(F.col("rn"), F.col("n_total"), 8).alias("tile")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_window_is_partitioned(spark, df):
    """The whole point: every Window in the ranked plan must carry a
    partition spec (the bucket) — no `WindowExec: No Partition Defined`
    path anywhere."""
    ranked = bucketed_rank(
        df, bucket=F.floor(F.col("v") / 100), order_by=[F.col("v"), F.col("id")]
    )
    plan = ranked._jdf.queryExecution().executedPlan().toString()
    window_lines = [ln for ln in plan.splitlines() if "Window [" in ln]
    assert window_lines, f"expected a Window operator in:\n{plan}"
    for ln in window_lines:
        assert "_rk_bucket" in ln, f"unpartitioned window: {ln}"


def test_null_sort_key_fails_fast(spark):
    """A NULL bucket would silently drop rows from the offset join —
    it must raise instead (the replaced global windows ranked NULLs)."""
    df = spark.createDataFrame([(1, 1.0), (2, None)], "id long, v double")
    with pytest.raises(Exception, match="NULL sort key"):
        bucketed_rank(
            df, bucket=F.floor(F.col("v")), order_by=[F.col("v"), F.col("id")]
        ).collect()


# ---------------------------------------------------------------- cumsum


def test_cumsum_matches_global_window(spark, df):
    from map_reduce_framework_using_python_spark.operators.ranks import bucketed_cumsum

    w = (
        Window.orderBy("v", "id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = df.select("id", F.sum("v").over(w).alias("cum"))
    got = bucketed_cumsum(
        df,
        bucket=F.floor(F.col("v") / 100),
        order_by=[F.col("v"), F.col("id")],
        weight=F.col("v"),
    ).select("id", "cum")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_cumsum_null_key_fails_fast(spark):
    from map_reduce_framework_using_python_spark.operators.ranks import bucketed_cumsum

    df = spark.createDataFrame([(1, 10), (2, None)], "id long, v long")
    bad = bucketed_cumsum(
        df,
        bucket=F.floor(F.col("v") / 100),
        order_by=[F.col("v"), F.col("id")],
        weight=F.coalesce(F.col("v"), F.lit(0)),
    )
    with pytest.raises(Exception, match="NULL sort key"):
        bad.collect()


def test_cumsum_no_single_partition_window(spark, df):
    from map_reduce_framework_using_python_spark.operators.ranks import bucketed_cumsum

    plan = bucketed_cumsum(
        df,
        bucket=F.floor(F.col("v") / 100),
        order_by=[F.col("v"), F.col("id")],
        weight=F.col("v"),
    )._jdf.queryExecution().executedPlan().toString()
    assert "No Partition Defined" not in plan
