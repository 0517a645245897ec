"""Pins for product quantization (operators/pq.py): code shape and
bounds, loud degenerate-input failures, ADC-shortlist recall against
the brute-force baseline with EXACT reranked cosines, and fit
determinism — the same contract family as the IVF/LSH ANN lanes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from map_reduce_framework_using_python_spark.operators.pq import (
    pq_encode,
    pq_topk,
    pq_train,
)
from map_reduce_framework_using_python_spark.operators.similarity import (
    cosine_topk_bruteforce,
)
from map_reduce_framework_using_python_spark.sources.io import load_table
from tests.conftest import SF_SMOKE


def test_codes_shape_bounds_and_guards(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    books = pq_train(emb, m=8, k=4, max_iter=2)
    assert len(books) == 8 and all(len(b) == 4 for b in books)
    assert all(len(cv) == 8 for b in books for cv in b)  # 64/8 dims
    codes = pq_encode(emb, books).select("vec_id", "codes").collect()
    assert len(codes) == emb.count()
    for r in codes:
        assert len(r["codes"]) == 8
        assert all(0 <= c < 4 for c in r["codes"])

    with pytest.raises(ValueError, match="not divisible"):
        pq_train(emb, m=7, k=4, max_iter=1)
    empty = spark.createDataFrame(
        [], "vec_id long, embedding array<double>, label int"
    )
    with pytest.raises(ValueError, match="empty"):
        pq_train(empty, m=8, k=4)


def test_pq_topk_recall_exact_rerank_and_determinism(spark):
    """End-to-end at the registry settings: ADC-shortlist recall ≥ 0.9
    vs brute force (measured 1.0 at the fixed seeds on this corpus —
    unstructured vectors, PQ's worst case), every returned cosine
    EQUAL to the brute-force cosine for that id (the rerank is exact),
    and two runs identical (seeded fits)."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    got = pq_topk(emb, query_vec_id=0, k=10).collect()
    exact = cosine_topk_bruteforce(emb, query_vec_id=0, k=10).collect()
    g = {r["vec_id"]: r["cosine"] for r in got}
    e = {r["vec_id"]: r["cosine"] for r in exact}
    assert len(g.keys() & e.keys()) / 10 >= 0.9
    for i in g.keys() & e.keys():
        assert abs(g[i] - e[i]) < 1e-9, i
    again = pq_topk(emb, query_vec_id=0, k=10).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))


def test_registry_query_runs(spark):
    from map_reduce_framework_using_python_spark.plans.core import REGISTRY

    rows = REGISTRY["ns_pq_topk"].fn(spark, SF_SMOKE).collect()
    assert len(rows) == 10
    cos = [r["cosine"] for r in rows]
    assert cos == sorted(cos, reverse=True)  # _topk_tail's contract


def test_pq_index_persisted_equals_inline(spark, tmp_path):
    """The persisted artifact (codes parquet + codebook JSON) must
    answer queries identically to the inline form at the same
    (m, k, seed) — no fit, no encode in the query path; a non-artifact
    path fails loudly."""
    import os

    from map_reduce_framework_using_python_spark.operators.pq import (
        build_pq_index,
        pq_topk_indexed,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    path = os.path.join(str(tmp_path), "pq")
    build_pq_index(emb, path)
    inline = sorted(map(tuple, pq_topk(emb, query_vec_id=0, k=10).collect()))
    indexed = sorted(
        map(tuple, pq_topk_indexed(emb, path, query_vec_id=0, topk=10).collect())
    )
    assert indexed == inline and len(indexed) == 10

    with pytest.raises(ValueError, match="not a PQ index"):
        pq_topk_indexed(emb, str(tmp_path), query_vec_id=0)
