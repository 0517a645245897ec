"""Similarity-search tests: brute-force cosine against a NumPy oracle,
LSH recall against brute force."""

from __future__ import annotations

import numpy as np

from map_reduce_framework_using_python_spark.operators.similarity import (
    cosine_topk_bruteforce,
    lsh_cosine_topk,
)
from map_reduce_framework_using_python_spark.sources.io import load_table
from tests.conftest import SF_SMOKE


def test_bruteforce_matches_numpy(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    rows = emb.collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}
    q = vecs[0]
    sims = {
        vid: float(v @ q / (np.linalg.norm(v) * np.linalg.norm(q)))
        for vid, v in vecs.items()
        if vid != 0
    }
    expected = sorted(sims, key=lambda vid: (-sims[vid], vid))[:10]
    got = [r["vec_id"] for r in cosine_topk_bruteforce(emb, query_vec_id=0, k=10).collect()]
    assert got == expected
    # Scores agree to rounding precision.
    got_scores = {
        r["vec_id"]: r["cosine"]
        for r in cosine_topk_bruteforce(emb, query_vec_id=0, k=10).collect()
    }
    for vid, s in got_scores.items():
        assert abs(s - sims[vid]) < 1e-5


def test_lsh_finds_planted_near_duplicate(spark):
    """LSH's guarantee is for *high*-similarity items: a near-duplicate
    of the query (cosine ≈ 1) shares its sign pattern and must be
    retrieved as the top hit. (On this corpus of near-orthogonal random
    vectors, mid-similarity recall is inherently probabilistic — that's
    the documented trade; the planted neighbor pins the contract.)"""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    q = emb.filter("vec_id = 0").collect()[0]["embedding"]
    planted = spark.createDataFrame(
        [(999999, [float(x) * 1.01 for x in q], 0)], emb.schema
    )
    corpus = emb.unionByName(planted)
    got = lsh_cosine_topk(corpus, query_vec_id=0, k=10).collect()
    assert got[0]["vec_id"] == 999999
    assert got[0]["cosine"] > 0.999


def test_lsh_overlap_with_bruteforce_nonzero(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    exact = {r["vec_id"] for r in cosine_topk_bruteforce(emb, query_vec_id=0, k=10).collect()}
    approx = {r["vec_id"] for r in lsh_cosine_topk(emb, query_vec_id=0, k=10, probe_hamming=3).collect()}
    assert approx & exact, "LSH found none of the true top-10"


def test_ivf_topk_recall(spark):
    """IVF with n_probe=4/16 must recover a solid share of the true
    top-10 (cosine neighbors concentrate in nearby k-means cells), and
    the full-probe configuration must equal brute force exactly."""
    from map_reduce_framework_using_python_spark.operators.similarity import ivf_topk

    emb = load_table(spark, SF_SMOKE, "embeddings")
    exact = [r["vec_id"] for r in cosine_topk_bruteforce(emb, query_vec_id=0, k=10).collect()]
    approx = [r["vec_id"] for r in ivf_topk(emb, query_vec_id=0, k=10, n_probe=4).collect()]
    assert len(set(approx) & set(exact)) >= 3
    full = [
        r["vec_id"]
        for r in ivf_topk(emb, query_vec_id=0, k=10, n_centroids=16, n_probe=16).collect()
    ]
    assert full == exact  # probing every cell == brute force


def test_lsh_results_are_subset_of_corpus(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    res = lsh_cosine_topk(emb, query_vec_id=0, k=10).collect()
    assert len(res) <= 10
    assert all(r["vec_id"] != 0 for r in res)


def test_bucket_expr_bit_equal_to_column_path(spark):
    """The generated-SQL bucket build (fast path, r7: kills the ~0.7 s
    driver-side Column construction that round 6 misread as an
    execution regression) must be BIT-equal to the Column-API path for
    both the raw-sign and grid forms — same planes, same fold order,
    same literals after repr round-trip."""
    from pyspark.sql import functions as F

    from map_reduce_framework_using_python_spark.operators.similarity import (
        hyperplanes,
        lsh_bucket,
        lsh_bucket_grid,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    planes = hyperplanes(64, 8, seed=42)
    for fn in (lsh_bucket, lsh_bucket_grid):
        got = [
            (r[0], r[1])
            for r in emb.select(
                "vec_id", fn("embedding", planes)
            ).orderBy("vec_id").collect()
        ]
        want = [
            (r[0], r[1])
            for r in emb.select(
                "vec_id", fn(F.col("embedding"), planes)
            ).orderBy("vec_id").collect()
        ]
        assert got == want
    # and the underlying grid dots themselves are bit-equal, not just
    # the coarse sign pattern
    from map_reduce_framework_using_python_spark.operators.similarity import (
        _as_double,
        _plane_dot_sql,
        dot,
    )

    p0 = planes[0]
    sqld = [
        r[1]
        for r in emb.select("vec_id", F.expr(_plane_dot_sql("`embedding`", p0)))
        .orderBy("vec_id")
        .collect()
    ]
    cold = [
        r[1]
        for r in emb.select(
            "vec_id",
            dot(_as_double(F.col("embedding")), F.array(*[F.lit(x) for x in p0])),
        )
        .orderBy("vec_id")
        .collect()
    ]
    assert sqld == cold


def test_sql_and_column_bucket_paths_agree_on_edges(spark):
    """r7 functions/similarity review: the fast generated-SQL build and
    the Column build must agree on edge inputs — empty planes (lit 0,
    not an unparseable '()'), and a backticked column name must quote
    through the string path. Non-finite plane values raise up front."""
    import pytest
    from pyspark.sql import functions as F

    from map_reduce_framework_using_python_spark.operators.similarity import (
        hyperplanes,
        lsh_bucket,
        lsh_bucket_grid,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings").limit(5)
    # empty planes: both paths give bucket 0 for every row
    got = emb.select(lsh_bucket("embedding", []).alias("b")).collect()
    want = emb.select(lsh_bucket(F.col("embedding"), []).alias("b")).collect()
    assert [r["b"] for r in got] == [r["b"] for r in want] == [0] * 5
    # backtick in the column name survives the string fast path (same
    # data under a plain name is the expected value — F.col would itself
    # need manual escaping for such a name)
    planes = hyperplanes(64, 4, seed=7)
    weird = emb.select("vec_id", F.col("embedding").alias("e`mb"))
    got = [
        r[1]
        for r in weird.select("vec_id", lsh_bucket("e`mb", planes))
        .orderBy("vec_id")
        .collect()
    ]
    want = [
        r[1]
        for r in emb.select("vec_id", lsh_bucket("embedding", planes))
        .orderBy("vec_id")
        .collect()
    ]
    assert got == want
    # non-finite plane values are rejected at build time, not parse time
    bad = [[float("nan")] * 64]
    with pytest.raises(ValueError):
        lsh_bucket("embedding", bad)
    with pytest.raises(ValueError):
        lsh_bucket_grid("embedding", bad)


def test_probe_batch_emit_misses_surfaces_empty_queries(spark):
    """r7 functions/similarity review: a query whose Hamming ball hits
    no corpus bucket silently vanished from lsh_probe_batch output;
    emit_misses=True must surface it as one all-NULL row while hit
    queries are unchanged."""
    from pyspark.sql import functions as F

    from map_reduce_framework_using_python_spark.operators.similarity import (
        lsh_probe_batch,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    corpus = emb.filter(F.col("vec_id") % 7 != 0)
    # One real query + one adversarial all-(-1000) vector far from every
    # corpus bucket under radius-0 probing.
    real = emb.filter(F.col("vec_id") == 7).select("vec_id", "embedding")
    alien = spark.createDataFrame(
        [(999999, [-1000.0] * 64)], "vec_id long, embedding array<double>"
    )
    queries = real.unionByName(alien)
    base = lsh_probe_batch(
        corpus, queries, dim=64, k=3, probe_hamming=0, id_col="vec_id"
    )
    with_misses = lsh_probe_batch(
        corpus, queries, dim=64, k=3, probe_hamming=0, id_col="vec_id",
        emit_misses=True,
    )
    base_rows = base.collect()
    m_rows = with_misses.collect()
    base_qids = {r["q_id"] for r in base_rows}
    m_qids = {r["q_id"] for r in m_rows}
    assert 999999 in m_qids  # surfaced
    if 999999 not in base_qids:  # the designed scenario: silent drop
        null_rows = [r for r in m_rows if r["q_id"] == 999999]
        assert len(null_rows) == 1 and null_rows[0]["vec_id"] is None
    # hit queries identical between the two forms
    assert sorted(
        (r["q_id"], r["vec_id"], r["rn"]) for r in base_rows
    ) == sorted(
        (r["q_id"], r["vec_id"], r["rn"]) for r in m_rows if r["vec_id"] is not None
    )
