"""pandas-on-Spark API interop: the engine's tables drive the pandas
API (``pyspark.pandas``) and agree with the DataFrame-API answers —
the migration surface for pandas-speaking users (NOTES round-1 idea).

The pandas API plans through the same Catalyst/Tungsten pipeline, so
nothing here changes the scale story; it's an alternate front-end."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from map_reduce_framework_using_python_spark.sources.io import load_table
from tests.conftest import SF_SMOKE

ps = pytest.importorskip("pyspark.pandas")


@pytest.fixture(autouse=True)
def _ps_compat(spark):
    # pandas-on-Spark requires non-arrow fallback for some ops; keep
    # defaults but pin the option that controls frame size warnings.
    ps.set_option("compute.ops_on_diff_frames", True)
    yield
    ps.reset_option("compute.ops_on_diff_frames")


def test_groupby_agg_matches_dataframe_api(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    want = {
        (r["l_returnflag"], r["n"], round(r["s"], 2))
        for r in li.groupBy("l_returnflag")
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("s"))
        .collect()
    }
    pdf = li.select("l_returnflag", "l_quantity").pandas_api()
    grp = pdf.groupby("l_returnflag")["l_quantity"]
    counts = grp.count().to_pandas()
    sums = grp.sum().to_pandas()
    got = {
        (flag, int(counts[flag]), round(float(sums[flag]), 2)) for flag in counts.index
    }
    assert got == want


def test_filter_sort_head_matches(spark):
    o = load_table(spark, SF_SMOKE, "orders")
    want = [
        (r["o_orderkey"], r["o_totalprice"])
        for r in o.filter(F.col("o_totalprice") > 50000)
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(5)
        .collect()
    ]
    pdf = o.select("o_orderkey", "o_totalprice").pandas_api()
    top = (
        pdf[pdf.o_totalprice > 50000]
        .sort_values(["o_totalprice", "o_orderkey"], ascending=[False, True])
        .head(5)
        .to_pandas()
    )
    got = [(int(r.o_orderkey), float(r.o_totalprice)) for r in top.itertuples()]
    assert got == want
