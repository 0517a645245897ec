"""KLL quantile + theta set sketches (plans/pipeline3.py): estimates
pinned against exact ground truth. At these SFs the theta sketch is in
exact mode (< k entries), so set-algebra results must EQUAL the exact
digest joins; KLL estimates must land within a rank envelope of the
exact distribution."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from map_reduce_framework_using_python_spark.plans.core import REGISTRY, t
from tests.conftest import SF_SMOKE


def test_kll_quantiles_within_rank_envelope(spark):
    row = REGISTRY["ns_kll_quantiles"].fn(spark, SF_SMOKE).first()
    prices = np.array(
        [r["l_extendedprice"] for r in t(spark, SF_SMOKE, "lineitem")
         .select("l_extendedprice").collect()]
    )
    prices.sort()
    n = len(prices)
    assert row["n_rows"] == n
    eps = 0.02  # KLL default-k normalized rank error is ~1.3%
    for q, col in ((0.5, "p50_est"), (0.9, "p90_est"), (0.99, "p99_est")):
        lo = prices[max(0, int(np.floor((q - eps) * n)) - 1)]
        hi = prices[min(n - 1, int(np.ceil((q + eps) * n)) - 1)]
        assert lo <= row[col] <= hi, (col, row[col], lo, hi)


def test_theta_set_algebra_exact_below_k(spark):
    row = REGISTRY["ns_theta_overlap"].fn(spark, SF_SMOKE).first()
    d = t(spark, SF_SMOKE, "documents").select("source", F.md5("text").alias("dg"))
    a = d.filter(F.col("source") == row["source_a"]).select("dg").distinct()
    b = d.filter(F.col("source") == row["source_b"]).select("dg").distinct()
    exact_union = a.union(b).distinct().count()
    exact_inter = a.join(b, "dg").count()
    assert int(round(row["union_est"])) == exact_union
    assert int(round(row["inter_est"])) == exact_inter


def test_theta_overlap_builds_lazily(spark):
    """Driver contract: building the ns_theta_overlap callable must
    launch NO Spark job (the pre-round-4 version collected the source
    pair at plan-build time). Job count is read from the app status
    store before and after building the plan."""
    t(spark, SF_SMOKE, "documents")  # warm the io.py schema cache
    store = spark.sparkContext._jsc.sc().statusStore()
    before = store.jobsList(None).size()
    df = REGISTRY["ns_theta_overlap"].fn(spark, SF_SMOKE)
    after = store.jobsList(None).size()
    assert after == before, "building the callable launched a Spark job"
    assert df.columns == ["source_a", "source_b", "union_est", "inter_est"]


def test_cms_bounds_vs_exact(spark):
    out = {r["word"]: (r["est_count"], r["n_total"])
           for r in REGISTRY["ns_cms_word_freq"].fn(spark, SF_SMOKE).collect()}
    words = (
        t(spark, SF_SMOKE, "documents")
        .select(F.explode(F.split(F.trim(F.col("text")), " +")).alias("w"))
    )
    exact = {r["w"]: r["n"] for r in
             words.groupBy("w").agg(F.count("*").alias("n")).collect()}
    for w, (est, n_total) in out.items():
        ex = exact.get(w, 0)
        assert est >= ex, (w, est, ex)               # CMS never undercounts
        assert est <= ex + 0.001 * n_total * 3, (w, est, ex)  # 3x slack on eps*N
