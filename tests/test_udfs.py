"""UDF-ladder tests: every rung computes the same answer as the built-in
expression (so the fast path is provably interchangeable), plus approx
sketch sanity bounds."""

from __future__ import annotations

from pyspark.sql import functions as F

from map_reduce_framework_using_python_spark.functions import (
    discounted_price_builtin,
    discounted_price_pandas,
    discounted_price_rowudf,
    weighted_avg_price,
    zscore_per_group,
)
from map_reduce_framework_using_python_spark.plans import REGISTRY
from map_reduce_framework_using_python_spark.sources.io import load_table
from tests.conftest import SF_SMOKE


def test_scalar_rungs_agree(spark):
    li = load_table(spark, SF_SMOKE, "lineitem").limit(200)
    built_in = [
        r["v"]
        for r in li.select(
            discounted_price_builtin(F.col("l_extendedprice"), F.col("l_discount")).alias("v")
        ).collect()
    ]
    pandas_v = [
        r["v"]
        for r in li.select(
            discounted_price_pandas("l_extendedprice", "l_discount").alias("v")
        ).collect()
    ]
    assert built_in == pandas_v  # identical double arithmetic, same order
    row_v = [
        r["v"]
        for r in li.select(
            discounted_price_rowudf(F.col("l_extendedprice"), F.col("l_discount")).alias("v")
        ).collect()
    ]
    assert row_v == built_in  # even the anti-pattern rung agrees

    from map_reduce_framework_using_python_spark.functions.udfs import (
        discounted_price_arrow,
    )

    ordered = li.select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount")
    arrow_v = {
        (r["l_orderkey"], r["l_linenumber"]): r["disc_price"]
        for r in discounted_price_arrow(ordered).collect()
    }
    want = {
        (r["l_orderkey"], r["l_linenumber"]): r["v"]
        for r in li.select(
            "l_orderkey",
            "l_linenumber",
            discounted_price_builtin(
                F.col("l_extendedprice"), F.col("l_discount")
            ).alias("v"),
        ).collect()
    }
    assert arrow_v == want  # mapInArrow rung agrees keyed by row identity


def test_grouped_agg_udaf_matches_expression(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    udaf = {
        r["l_returnflag"]: r["w"]
        for r in li.groupBy("l_returnflag")
        .agg(weighted_avg_price("l_extendedprice", "l_quantity").alias("w"))
        .collect()
    }
    expr = {
        r["l_returnflag"]: r["w"]
        for r in li.groupBy("l_returnflag")
        .agg(
            (
                F.sum(F.col("l_extendedprice") * F.col("l_quantity")) / F.sum("l_quantity")
            ).alias("w")
        )
        .collect()
    }
    for k in expr:
        assert abs(udaf[k] - expr[k]) < 1e-6


def test_zscore_per_group(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 5.0)], ["g", "v"]
    )
    out = {(r["g"], r["v"]): r["zscore"] for r in zscore_per_group(df, "g", "v").collect()}
    assert abs(out[("a", 2.0)]) < 1e-12  # mean of group a
    assert out[("b", 5.0)] == 0.0  # singleton group → std 0 → 0
    assert abs(out[("a", 3.0)] - 1.224744871391589) < 1e-9


def test_approx_sketches_within_bounds(spark):
    """approx_count_distinct within 10% of exact; approx p50 between
    group min/max (sketch outputs are engine-specific → no SQL oracle,
    bounded here instead)."""
    li = load_table(spark, SF_SMOKE, "lineitem")
    approx = {r["l_returnflag"]: r for r in REGISTRY["q_approx_stats"].fn(spark, SF_SMOKE).collect()}
    exact = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n"),
            F.min("l_extendedprice").alias("lo"),
            F.max("l_extendedprice").alias("hi"),
        )
        .collect()
    }
    for k, e in exact.items():
        a = approx[k]
        assert abs(a["approx_parts"] - e["n"]) <= 0.1 * e["n"]
        assert e["lo"] <= a["approx_p50"] <= e["hi"]
