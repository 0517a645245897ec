"""Pins for the datasketches set-algebra query
(ns_sketch_set_algebra): HLL mergeability must be EXACT (union of
per-group sketches == one whole-corpus sketch — the same algorithm on
the same values), and every Theta set-operation estimate must land
within 5% of the exact COUNT DISTINCT it approximates."""

from __future__ import annotations

from pyspark.sql import functions as F

from map_reduce_framework_using_python_spark.plans import REGISTRY
from map_reduce_framework_using_python_spark.sources.io import load_table
from tests.conftest import SF_SMOKE


def test_hll_mergeable_and_theta_within_tolerance(spark):
    row = REGISTRY["ns_sketch_set_algebra"].fn(spark, SF_SMOKE).collect()[0]
    # mergeability: union-of-group-sketches == whole-corpus sketch
    assert row["hll_union_of_groups"] == row["hll_whole"]

    e = load_table(spark, SF_SMOKE, "events")
    a = {r["user_id"] for r in e.filter(F.col("event_type") == "purchase")
         .select("user_id").distinct().collect()}
    b = {r["user_id"] for r in e.filter(F.col("event_type") == "view")
         .select("user_id").distinct().collect()}
    exact = {
        "n_union": len(a | b),
        "n_intersect": len(a & b),
        "n_diff": len(a - b),
    }
    for k, want in exact.items():
        got = row[k]
        assert abs(got - want) <= max(1, 0.05 * want), (k, got, want)
    # HLL estimate also within 5% of exact distinct users
    n_users = e.select("user_id").distinct().count()
    assert abs(row["hll_whole"] - n_users) <= max(1, 0.05 * n_users)


def test_bucketed_cumsum_grouped_matches_window(spark):
    """The r15 grouped weighted cumsum (the stats-lane histogram
    restructure) must equal the plain per-group running sum on a frame
    small enough for a single-task window."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from map_reduce_framework_using_python_spark.operators.ranks import (
        bucketed_cumsum_grouped,
    )

    rows = [
        ("a", 1.0, 3), ("a", 2.0, 1), ("a", 9.0, 4), ("a", 17.0, 2),
        ("b", 0.0, 5), ("b", 8.0, 1), ("b", 8.5, 2),
        ("c", -4.0, 7),
    ]
    df = spark.createDataFrame(rows, "g string, v double, w long")
    got = {
        (r["g"], r["v"]): r["cum"]
        for r in bucketed_cumsum_grouped(
            df, ["g"], F.floor(F.col("v") / 8), [F.col("v")], F.col("w")
        ).collect()
    }
    w = (
        Window.partitionBy("g")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = {
        (r["g"], r["v"]): r["cum"]
        for r in df.withColumn("cum", F.sum("w").over(w)).collect()
    }
    assert got == want

    import pytest

    with pytest.raises(Exception, match="group_cols must be non-empty"):
        bucketed_cumsum_grouped(df, [], F.floor(F.col("v") / 8), [F.col("v")], F.col("w"))
