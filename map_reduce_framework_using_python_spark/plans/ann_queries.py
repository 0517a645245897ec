"""Registered queries for the storage-backed ANN indexes.

These are the partition-pruned scale paths for similarity search
(VERDICT r1 item 2): the corpus is written ONCE partitioned by LSH
bucket / IVF centroid id, and each query's parquet scan opens only the
probed partition directories (``PartitionFilters`` — EXPLAINS.md §ANN).

Sketch-based → registered rows-only (no ANSI-SQL oracle); pytest
(tests/test_ann_index.py) pins exact equivalence with the inline
variants and with brute force under full probe.

Index builds are cached per (sf_dir, params) under
:data:`~map_reduce_framework_using_python_spark.operators.ann_index.INDEX_ROOT`
so repeated query calls reuse the layout — mirroring real operation,
where the index is built once per corpus version, not per query.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_framework_using_python_spark.operators.ann_index import (
    INDEX_ROOT,
    build_ivf_index,
    build_lsh_index,
    ivf_topk_indexed,
    lsh_topk_indexed,
)
from map_reduce_framework_using_python_spark.plans.core import query, t


def _index_path(sf_dir: str, kind: str) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir)) or "default"
    return os.path.join(INDEX_ROOT, tag, kind)


def _ensure(spark: SparkSession, sf_dir: str, kind: str, build) -> str:
    """Build-or-reuse a storage-backed index, guarded by a SOURCE
    fingerprint in the meta file: a regenerated embeddings.parquet
    (even same-cardinality) invalidates the index — the same
    refresh-hazard rule as the partitioned/Z-order layouts."""
    import json

    from map_reduce_framework_using_python_spark.sources.io import source_fingerprint

    path = _index_path(sf_dir, kind)
    meta_path = os.path.join(path, "_ann_meta.json")
    src = source_fingerprint(os.path.join(sf_dir, "embeddings.parquet"))
    if os.path.exists(meta_path):
        with open(meta_path) as fh:
            if json.load(fh).get("src") == src:
                return path
    build(path)
    with open(meta_path) as fh:
        meta = json.load(fh)
    meta["src"] = src
    with open(meta_path, "w") as fh:
        json.dump(meta, fh)
    return path


def _ensure_lsh(spark: SparkSession, sf_dir: str) -> str:
    return _ensure(
        spark, sf_dir, "lsh8_seed42",
        lambda p: build_lsh_index(
            t(spark, sf_dir, "embeddings"), p, n_planes=8, seed=42
        ),
    )


def _ensure_ivf(spark: SparkSession, sf_dir: str) -> str:
    return _ensure(
        spark, sf_dir, "ivf16_seed42",
        lambda p: build_ivf_index(
            t(spark, sf_dir, "embeddings"), p, n_centroids=16, seed=42
        ),
    )


def _qvec(spark: SparkSession, sf_dir: str, vid: int = 0) -> list[float]:
    row = (
        t(spark, sf_dir, "embeddings").filter(F.col("vec_id") == vid).head()
    )
    return [float(x) for x in row["embedding"]]


@query("ns_lsh_topk_indexed", oracle=None, tags=("northstar", "similarity", "sketch", "index"))
def ns_lsh_topk_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-pruned LSH cosine top-10 (storage-backed index): reads
    only the 37/256 Hamming-ball bucket directories. Pinned equal to
    ns_lsh_cosine_topk (tests/test_ann_index.py)."""
    path = _ensure_lsh(spark, sf_dir)
    return lsh_topk_indexed(
        spark, path, _qvec(spark, sf_dir), k=10, probe_hamming=2, exclude_id=0
    )


@query("ns_ivf_topk_indexed", oracle=None, tags=("northstar", "similarity", "sketch", "index"))
def ns_ivf_topk_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-pruned IVF cosine top-10 (storage-backed index): reads
    the 4/16 nearest centroid partitions. Pinned equal to ns_ivf_topk
    and to brute force under full probe (tests/test_ann_index.py)."""
    path = _ensure_ivf(spark, sf_dir)
    return ivf_topk_indexed(
        spark, path, _qvec(spark, sf_dir), k=10, n_probe=4, exclude_id=0
    )
