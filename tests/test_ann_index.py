"""Storage-backed ANN index tests: the index changes the ACCESS PATH,
never the answer — indexed queries equal their inline counterparts
exactly, and the parquet scan is genuinely partition-pruned
(PartitionFilters in the plan, probe set opens a small fraction of the
bucket directories)."""

from __future__ import annotations

from pyspark.sql import functions as F

from map_reduce_framework_using_python_spark.operators.ann_index import (
    _hamming_ball,
    build_ivf_index,
    build_lsh_index,
    ivf_topk_indexed,
    lsh_topk_indexed,
    scan_fraction,
)
from map_reduce_framework_using_python_spark.operators.similarity import (
    cosine_topk_bruteforce,
    ivf_topk,
    lsh_cosine_topk,
)
from map_reduce_framework_using_python_spark.sources.io import load_table
from tests.conftest import SF_SMOKE


def _query_vec(emb, vid=0):
    return [float(x) for x in emb.filter(F.col("vec_id") == vid).head()["embedding"]]


def test_hamming_ball_sizes():
    assert len(set(_hamming_ball(0, 8, 0))) == 1
    assert len(set(_hamming_ball(0, 8, 1))) == 1 + 8
    assert len(set(_hamming_ball(0, 8, 2))) == 1 + 8 + 28
    assert len(set(_hamming_ball(0b1010, 8, 2))) == 37  # center-independent


def test_lsh_indexed_equals_inline(spark, tmp_path):
    """Same planes/seed/probe radius → identical rows to the inline
    full-scan variant (the index is an access path, not an algorithm)."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    path = str(tmp_path / "lsh_idx")
    build_lsh_index(emb, path, n_planes=8, seed=42)
    q = _query_vec(emb)
    inline = lsh_cosine_topk(emb, query_vec_id=0, k=10, n_planes=8, seed=42,
                             probe_hamming=2).collect()
    indexed = lsh_topk_indexed(spark, path, q, k=10, probe_hamming=2,
                               exclude_id=0).collect()
    assert [tuple(r) for r in indexed] == [tuple(r) for r in inline]


def test_probe_grid_defaults_from_build_meta(spark, tmp_path):
    """r13 ADVICE: probing a grid-built LSH index with no explicit
    ``grid=`` must rank on the grid too (the build's persisted flag is
    the default), never bucket-on-grid / rank-raw — and an explicit
    override still wins. A raw-built index keeps the raw default."""
    emb = load_table(spark, SF_SMOKE, "embeddings").limit(300)
    q = _query_vec(emb)

    gpath = str(tmp_path / "lsh_grid")
    build_lsh_index(emb, gpath, n_planes=8, seed=42, grid=True)
    default_rows = lsh_topk_indexed(
        spark, gpath, q, k=10, probe_hamming=2, exclude_id=0).collect()
    grid_rows = lsh_topk_indexed(
        spark, gpath, q, k=10, probe_hamming=2, exclude_id=0,
        grid=True).collect()
    assert [tuple(r) for r in default_rows] == [tuple(r) for r in grid_rows]
    # the grid-ranked cosine lies exactly on the 1e-6 grid
    assert all(
        abs(r["cosine"] * 1e6 - round(r["cosine"] * 1e6)) < 1e-6
        for r in default_rows
    )
    # explicit override on the same layout still reaches the raw ranker
    raw_rows = lsh_topk_indexed(
        spark, gpath, q, k=10, probe_hamming=2, exclude_id=0,
        grid=False).collect()
    assert {r["vec_id"] for r in raw_rows}  # runs; convention is caller's

    rpath = str(tmp_path / "lsh_raw")
    build_lsh_index(emb, rpath, n_planes=8, seed=42)
    raw_default = lsh_topk_indexed(
        spark, rpath, q, k=10, probe_hamming=2, exclude_id=0).collect()
    raw_explicit = lsh_topk_indexed(
        spark, rpath, q, k=10, probe_hamming=2, exclude_id=0,
        grid=False).collect()
    assert [tuple(r) for r in raw_default] == [tuple(r) for r in raw_explicit]


def test_lsh_indexed_scan_is_partition_pruned(spark, tmp_path):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    path = str(tmp_path / "lsh_idx")
    build_lsh_index(emb, path, n_planes=8, seed=42)
    q = _query_vec(emb)
    plan = lsh_topk_indexed(spark, path, q, k=10)._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [bucket" in plan.replace("#", " ").replace("L", "") or \
        "PartitionFilters" in plan
    # The probe ball (37 of 256 possible buckets) opens ≤ 37 directories;
    # with this corpus far fewer buckets even exist, but the fraction of
    # EXISTING directories opened must still be well below 1.
    import json as _json
    import os as _os

    meta = _json.load(open(_os.path.join(path, "_ann_meta.json")))
    qbits = 0
    for i, p in enumerate(meta["planes"]):
        if sum(x * y for x, y in zip(q, p)) >= 0:
            qbits |= 1 << i
    probe = sorted(set(_hamming_ball(qbits, 8, 2)))
    assert scan_fraction(path, probe, "bucket") < 0.5


def test_ivf_indexed_equals_inline(spark, tmp_path):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    path = str(tmp_path / "ivf_idx")
    build_ivf_index(emb, path, n_centroids=16, seed=42)
    q = _query_vec(emb)
    inline = ivf_topk(emb, query_vec_id=0, k=10, n_centroids=16, n_probe=4,
                      seed=42).collect()
    indexed = ivf_topk_indexed(spark, path, q, k=10, n_probe=4,
                               exclude_id=0).collect()
    assert [tuple(r) for r in indexed] == [tuple(r) for r in inline]


def test_ivf_indexed_full_probe_equals_bruteforce(spark, tmp_path):
    """Probing every centroid partition == exact brute force: the index
    covers the corpus with no loss."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    path = str(tmp_path / "ivf_idx")
    build_ivf_index(emb, path, n_centroids=16, seed=42)
    q = _query_vec(emb)
    exact = [r["vec_id"] for r in cosine_topk_bruteforce(emb, query_vec_id=0, k=10).collect()]
    full = [r["vec_id"] for r in ivf_topk_indexed(spark, path, q, k=10, n_probe=16,
                                                  exclude_id=0).collect()]
    assert full == exact


def test_ivf_indexed_scan_is_partition_pruned(spark, tmp_path):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    path = str(tmp_path / "ivf_idx")
    build_ivf_index(emb, path, n_centroids=16, seed=42)
    q = _query_vec(emb)
    plan = ivf_topk_indexed(spark, path, q, k=10, n_probe=4)._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    import json as _json
    import os as _os

    centroids = _json.load(open(_os.path.join(path, "_ann_meta.json")))["centroids"]
    probe = sorted(
        range(len(centroids)),
        key=lambda i: sum((a - b) ** 2 for a, b in zip(q, centroids[i])),
    )[:4]
    # 4 probed cells of however many non-empty centroid dirs exist.
    assert scan_fraction(path, probe, "centroid_id") <= 4 / 10


def test_r7_ann_review_guards(spark, tmp_path):
    """r7 ANN review pins: (a) empty-corpus build fails loudly, (b) a
    wrong-dimension query raises instead of zip-truncating to garbage,
    (c) the src fingerprint is dropped BEFORE the append write (a crash
    mid-append must not leave a mutated index claiming pristine), and
    (d) the index cache key distinguishes same-basename corpora."""
    import json
    import os

    import pytest

    from map_reduce_framework_using_python_spark.operators.ann_index import (
        build_lsh_index,
        append_to_lsh_index,
        ivf_topk_indexed,
        lsh_topk_indexed,
        build_ivf_index_lloyd,
    )
    from map_reduce_framework_using_python_spark.plans.ann_queries import _index_path
    from map_reduce_framework_using_python_spark.sources.io import load_table
    from tests.conftest import SF_SMOKE

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="empty corpus"):
        build_lsh_index(empty, str(tmp_path / "e"))

    emb = load_table(spark, SF_SMOKE, "embeddings")
    lsh_path = build_lsh_index(emb.limit(60), str(tmp_path / "lsh"))
    with pytest.raises(ValueError, match="dim"):
        lsh_topk_indexed(spark, lsh_path, [1.0] * 32)
    ivf_path = build_ivf_index_lloyd(emb.limit(60), str(tmp_path / "ivf"), k=4, n_iter=1)
    with pytest.raises(ValueError, match="dim"):
        ivf_topk_indexed(spark, ivf_path, [1.0] * 32)

    # (c) src drops even when the append itself fails mid-way
    meta_path = os.path.join(lsh_path, "_ann_meta.json")
    meta = json.load(open(meta_path))
    meta["src"] = "pristine-fingerprint"
    json.dump(meta, open(meta_path, "w"))
    bad_batch = spark.createDataFrame([(1,)], "vec_id long")  # no embedding col
    with pytest.raises(Exception):
        append_to_lsh_index(bad_batch, lsh_path)
    assert "src" not in json.load(open(meta_path))

    # (d) same basename, different parents → different cache slots
    assert _index_path("/tmp/a/sf0.1", "lsh") != _index_path("/tmp/b/sf0.1", "lsh")
