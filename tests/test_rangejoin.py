"""Bucketed big-big range join (operators/rangejoin.py): exact
equivalence to the naive cross-join + filter, incl. boundary pairs."""

from __future__ import annotations

from pyspark.sql import functions as F

from map_reduce_framework_using_python_spark.operators.rangejoin import (
    range_join_candidates,
)


def test_matches_naive_cross_join(spark):
    left = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate([0, 10, 99, 100, 101, 250, 555, 999])],
        "lid long, lk double",
    )
    right = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate([5, 100, 102, 199, 200, 201, 554, 1000])],
        "rid long, rk double",
    )
    tol = 100.0
    got = {
        (r["lid"], r["rid"])
        for r in range_join_candidates(
            left, right, F.col("lk"), F.col("rk"), tol
        ).collect()
    }
    want = {
        (r["lid"], r["rid"])
        for r in left.crossJoin(right)
        .filter(F.abs(F.col("lk") - F.col("rk")) <= tol)
        .collect()
    }
    assert got == want and got  # non-empty, includes |diff| == tol boundaries


def test_no_duplicate_pairs(spark):
    # Keys straddling bucket boundaries must not double-count.
    left = spark.createDataFrame([(1, 100.0), (2, 200.0)], "lid long, lk double")
    right = spark.createDataFrame([(1, 100.0), (2, 199.9)], "rid long, rk double")
    out = range_join_candidates(left, right, F.col("lk"), F.col("rk"), 100.0)
    pairs = [(r["lid"], r["rid"]) for r in out.collect()]
    assert len(pairs) == len(set(pairs))


def test_negative_keys(spark):
    left = spark.createDataFrame([(1, -250.0), (2, -50.0)], "lid long, lk double")
    right = spark.createDataFrame([(1, -300.0), (2, 20.0)], "rid long, rk double")
    got = {
        (r["lid"], r["rid"])
        for r in range_join_candidates(left, right, F.col("lk"), F.col("rk"), 100.0).collect()
    }
    assert got == {(1, 1), (2, 2)}
