"""Skew-helper tests: salted aggregation and salted join produce the
same answers as their unsalted forms, while actually spreading keys."""

from __future__ import annotations

from pyspark.sql import functions as F

from map_reduce_framework_using_python_spark.operators.skew import (
    salted,
    salted_agg,
    salted_join,
)


def _skewed(spark):
    # 90% of rows share one hot key.
    hot = [("hot", float(i % 7)) for i in range(900)]
    cold = [(f"k{i}", float(i)) for i in range(100)]
    return spark.createDataFrame(hot + cold, ["k", "v"])


def test_salt_spreads_hot_key(spark):
    df = salted(_skewed(spark), n_salts=8)
    n_buckets = df.filter("k = 'hot'").select("_salt").distinct().count()
    assert n_buckets >= 6  # hot key now spans nearly all salt buckets


def test_salted_agg_matches_plain(spark):
    df = _skewed(spark)
    plain = {
        r["k"]: (r["s"], r["n"], r["mn"], r["mx"])
        for r in df.groupBy("k")
        .agg(
            F.sum("v").alias("s"),
            F.count("*").alias("n"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    saltedr = {
        r["k"]: (r["s"], r["n"], r["mn"], r["mx"])
        for r in salted_agg(
            df,
            "k",
            {
                "s": F.sum("v"),
                "n": F.count("*"),
                "mn": F.min("v"),
                "mx": F.max("v"),
            },
            n_salts=8,
        ).collect()
    }
    assert saltedr == plain


def test_salted_agg_rejects_non_decomposable(spark):
    # avg does not decompose as partial-avg-then-final-avg; the helper
    # must refuse rather than silently re-aggregate with sum.
    import pytest

    with pytest.raises(ValueError, match="not\\s+decomposable"):
        salted_agg(_skewed(spark), "k", {"a": F.avg("v")}, n_salts=4).collect()


def test_salted_join_matches_plain(spark):
    big = _skewed(spark)
    small = spark.createDataFrame(
        [("hot", "HOT"), ("k1", "K1"), ("k2", "K2")], ["k", "label"]
    )
    plain = sorted(map(str, big.join(small, "k").select("k", "v", "label").collect()))
    slt = sorted(map(str, salted_join(big, small, "k", n_salts=8).select("k", "v", "label").collect()))
    assert slt == plain


def test_salted_join_left_keeps_unmatched(spark):
    big = _skewed(spark)
    small = spark.createDataFrame([("hot", "HOT")], ["k", "label"])
    out = salted_join(big, small, "k", n_salts=4, how="left")
    assert out.count() == big.count()
    assert out.filter("label IS NULL").count() == 100  # all cold keys unmatched
