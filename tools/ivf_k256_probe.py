"""IVF probe at production-ish centroid counts: is the centroid ranking
plan k-independent?

Round 7 root-caused a latency cluster to driver-side plan CONSTRUCTION
(per-element literal expression trees); round 8's ivf_probe_index_batch
therefore ranks centroids via a broadcast join against a k-row centroid
DataFrame once k exceeds MAX_LITERAL_CENTROIDS. This probe charts both
forms at k=16 and k=256 on a replicated corpus, split into plan-build
time (call → DataFrame) and execution time (collect), the r7
measurement discipline. NOTES.md records the latest run.

Usage: python tools/ivf_k256_probe.py [replicas=100] [n_queries=64]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from map_reduce_framework_using_python_spark.operators import ann_index
from map_reduce_framework_using_python_spark.session import get_spark
from map_reduce_framework_using_python_spark.sources.io import load_table

SRC = "/root/testdata/sf0.1"
ROOT = "/tmp/spark_graft_ivf_probe"


def main() -> int:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    spark = get_spark(app_name="ivf_k256_probe")
    emb = load_table(spark, SRC, "embeddings")
    # Replicate with vec_id offsets and a tiny per-replica rotation of
    # the vector (element roll) so k-means at k=256 sees 200k DISTINCT
    # points, not 2k points duplicated 100× (which would collapse many
    # centroids onto identical coordinates).
    rep = spark.range(replicas).select(F.col("id").alias("_r"))
    corpus = (
        emb.crossJoin(F.broadcast(rep))
        .select(
            (F.col("vec_id") + F.col("_r") * 10_000_000).alias("vec_id"),
            F.concat(
                F.slice(F.col("embedding"), (F.col("_r") % 64) + 1, 64),
                F.slice(F.col("embedding"), 1, F.col("_r") % 64),
            ).alias("embedding"),
            F.col("label"),
        )
    )
    n = corpus.count()
    queries = emb.filter(F.col("vec_id") < n_queries)
    print(f"corpus={n} vectors, {n_queries} queries")
    for k in (16, 256):
        path = os.path.join(ROOT, f"ivf{k}")
        shutil.rmtree(path, ignore_errors=True)
        t0 = time.perf_counter()
        ann_index.build_ivf_index(corpus, path, n_centroids=k, seed=42)
        t_build_idx = time.perf_counter() - t0
        for form, thresh in (("literal", 1 << 20), ("join", 0)):
            ann_index.MAX_LITERAL_CENTROIDS = thresh
            t0 = time.perf_counter()
            df = ann_index.ivf_probe_index_batch(
                spark, queries, path, k=10, n_probe=8
            )
            t_plan = time.perf_counter() - t0
            t0 = time.perf_counter()
            rows = df.count()
            t_exec = time.perf_counter() - t0
            print(
                f"k={k:4d} form={form:7s} plan_build={t_plan:6.2f}s "
                f"exec={t_exec:6.2f}s rows={rows} (index_build={t_build_idx:.1f}s)"
            )
    shutil.rmtree(ROOT, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
