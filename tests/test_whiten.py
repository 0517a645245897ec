"""ZCA whitening: distributed moments == numpy moments, the whitened
sample covariance is ~identity, and the Spark projection equals the
numpy reference."""

from __future__ import annotations

import numpy as np

from map_reduce_framework_using_python_spark.operators.whiten import (
    embedding_moments,
    whiten,
    zca_matrix,
)
from map_reduce_framework_using_python_spark.sources.io import load_table
from tests.conftest import SF_SMOKE


def _matrix(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    rows = emb.select("vec_id", "embedding").collect()
    ids = [r["vec_id"] for r in rows]
    x = np.array([[float(v) for v in r["embedding"]] for r in rows])
    return emb, ids, x


def test_moments_match_numpy(spark):
    emb, _, x = _matrix(spark)
    n, mean, cov = embedding_moments(emb)
    assert n == len(x)
    np.testing.assert_allclose(mean, x.mean(axis=0), rtol=0, atol=1e-12)
    np.testing.assert_allclose(cov, np.cov(x.T, bias=True), rtol=0, atol=1e-10)


def test_whitened_covariance_is_identity(spark):
    emb, ids, x = _matrix(spark)
    n, mean, cov = embedding_moments(emb)
    w = zca_matrix(cov, eps=1e-8)
    out = {r["vec_id"]: np.asarray(r["whitened"])
           for r in whiten(emb, mean, w).collect()}
    y = np.stack([out[i] for i in ids])
    np.testing.assert_allclose(
        np.cov(y.T, bias=True), np.eye(x.shape[1]), atol=5e-3
    )
    # projection equals the numpy reference bit-for-bit-ish
    ref = (x - x.mean(axis=0)) @ w.T
    np.testing.assert_allclose(y, ref, rtol=0, atol=1e-10)


def test_moments_respect_partitioning(spark):
    emb, _, x = _matrix(spark)
    n1, m1, c1 = embedding_moments(emb)
    n2, m2, c2 = embedding_moments(emb.repartition(13))
    assert n1 == n2
    np.testing.assert_allclose(m1, m2, atol=1e-12)
    np.testing.assert_allclose(c1, c2, atol=1e-10)
