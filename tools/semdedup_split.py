"""Split-measure the scale10x SemDeDup rows (r8: VERDICT item 2).

r6→r7 showed ns_semdedup_scaled_samplefit 3.74→5.50 s (1.47×) and
_sqrtk 5.38→6.65 s (1.24×) with NO changelog entry touching the path —
the r6-cluster smell whose root-cause rule says: no noise claims
without a build/exec split. semdedup_pairs_scaled has three phases
with different cost models, measured here separately on the same 10×
corpus the bench uses:

  fit     — spark.ml KMeans training (eager; many small driver-
            coordinated jobs: k=√n centers, maxIter rounds)
  assign  — model.transform + persist of the assignment (one pass)
  pairing — within-cluster self-join + threshold count (the only
            phase that scales with output)

Usage: python tools/semdedup_split.py [replicas=10] [reps=3]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from pyspark.sql import functions as F

from map_reduce_framework_using_python_spark.operators.clustering import (
    cluster_cosine_pairs,
)
from map_reduce_framework_using_python_spark.operators.similarity import _as_double
from map_reduce_framework_using_python_spark.session import get_spark
from map_reduce_framework_using_python_spark.sources.io import load_table


def main() -> int:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(app_name="semdedup_split")
    from scale_probe import DST, build

    build(spark, replicas)
    emb = load_table(spark, DST, "embeddings")
    k = int((replicas * 2000) ** 0.5)
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    for fit_fraction in (None, 0.15):
        tag = "samplefit" if fit_fraction else "sqrtk"
        for rep in range(reps):
            vecs = emb.select(
                F.col("vec_id"), _as_double(F.col("embedding")).alias("v")
            )
            feats = vecs.withColumn("features", array_to_vector("v"))
            train = feats
            if fit_fraction is not None:
                train = feats.filter(
                    F.pmod(F.xxhash64(F.col("vec_id"), F.lit(42)), F.lit(1_000_000))
                    < F.lit(int(fit_fraction * 1_000_000))
                )
            t0 = time.perf_counter()
            model = KMeans(k=k, seed=42, maxIter=4, featuresCol="features").fit(
                train
            )
            t_fit = time.perf_counter() - t0
            t0 = time.perf_counter()
            assigned = model.transform(feats).select(
                F.col("vec_id"), "v", F.col("prediction").alias("cluster")
            )
            assigned = assigned.persist()
            assigned.count()
            t_assign = time.perf_counter() - t0
            t0 = time.perf_counter()
            n = cluster_cosine_pairs(assigned, 0.4).count()
            t_pair = time.perf_counter() - t0
            assigned.unpersist()
            total = t_fit + t_assign + t_pair
            print(
                f"{tag} rep={rep} fit={t_fit:6.2f}s assign={t_assign:5.2f}s "
                f"pair={t_pair:5.2f}s total={total:6.2f}s ({n} pairs, k={k})"
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
