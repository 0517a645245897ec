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


def test_salting_bounds_max_partition_skew(spark):
    """The reference's myHash lesson (Worker/shuffler.py:6-10) at probe
    scale: hash-partitioning a hot key sends ~all rows to ONE reducer —
    the straggler that serializes the job at 100 TB. Salting bounds the
    max partition to ~1/n_salts of the hot key's rows."""
    n_rows, n_parts = 200_000, 16
    df = (
        spark.range(n_rows)
        .withColumn("k", F.when(F.col("id") % 10 < 9, "hot").otherwise(F.col("id").cast("string")))
        .withColumn("v", F.col("id").cast("double"))
    )

    def max_partition_rows(d):
        sizes = (
            d.groupBy(F.spark_partition_id().alias("p")).count().collect()
        )
        return max(r["count"] for r in sizes)

    unsalted = max_partition_rows(df.repartition(n_parts, "k"))
    # Many more salts than partitions, so (k, salt) cells distribute
    # smoothly over reducers instead of colliding balls-in-bins.
    saltedd = max_partition_rows(
        salted(df, n_salts=8 * n_parts).repartition(n_parts, "k", "_salt")
    )
    ideal = n_rows / n_parts
    # Unsalted: the hot key's 180k rows land on one reducer.
    assert unsalted >= 0.9 * n_rows * 0.9
    # Salted: no reducer holds more than 2× the ideal share.
    assert saltedd <= 2 * ideal
    # And the salted aggregate still gets the exact answer.
    got = {
        r["k"]: (r["s"], r["n"])
        for r in salted_agg(df, "k", {"s": F.sum("v"), "n": F.count("*")},
                            n_salts=n_parts).collect()
        if r["k"] == "hot"
    }
    exact = df.filter("k = 'hot'").agg(F.sum("v"), F.count("*")).collect()[0]
    assert got["hot"] == (exact[0], exact[1])


def test_salted_agg_allows_columns_named_distinct(spark):
    """r7 operators review: the DISTINCT guard matched the whole
    rendered expression as a substring, so a column NAMED
    'distinct_ratio' (which quality_scores emits) was falsely
    rejected — the keyword-token check must accept it and still
    reject real DISTINCT aggregates."""
    import pytest
    from pyspark.sql import functions as F

    from map_reduce_framework_using_python_spark.operators.skew import salted_agg

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 3.0)], "k string, distinct_ratio double"
    )
    out = {
        r["k"]: r["s"]
        for r in salted_agg(df, "k", {"s": F.sum("distinct_ratio")}).collect()
    }
    assert out == {"a": 3.0, "b": 3.0}
    with pytest.raises(ValueError, match="DISTINCT"):
        salted_agg(df, "k", {"n": F.count_distinct("distinct_ratio")})
