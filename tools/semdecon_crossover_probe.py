"""Where the k-means-routed decontamination form WINS: the large-
benchmark regime.

The standing bench row (bench.py:_semdecon_probe) holds a FIXED
125-item benchmark, where the spark.ml fit dominates and the exact
broadcast-fold is rightly faster — that row guards latency/recall, not
a race. This probe measures the CROSSOVER the routed form exists for:
a 10k-item benchmark (real decontamination sweeps carry 10k–100k eval
items) against a 20k-vector corpus, both generated DETERMINISTICALLY
JVM-side (md5-derived coordinates — no RNG, no data files), timing the
exact form vs benchmark_max_cosine_kmeans at production-ish knobs and
recording flag recall at a genuinely low τ.

Usage: python tools/semdecon_crossover_probe.py [n_bench n_corpus dim]
Prints one JSON line per configuration; results recorded in NOTES.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from map_reduce_framework_using_python_spark.operators.similarity import (
    benchmark_max_cosine,
    benchmark_max_cosine_kmeans,
)
from map_reduce_framework_using_python_spark.session import get_spark


def synth_vectors(spark, n: int, dim: int, salt: str):
    """n deterministic dim-wide vectors: coordinate j of row i is an
    md5-derived uniform in [-0.5, 0.5) — reproducible across runs and
    partitionings (the ns_hash_sample rule applied to a fixture)."""
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.expr(
            f"transform(sequence(0, {dim - 1}), j -> "
            "CAST((CAST(conv(substring(md5(concat("
            f"'{salt}', '_', id, '_', j)), 1, 8),"
            " 16, 10) AS BIGINT) % 100000) AS DOUBLE) / 100000.0 - 0.5)"
        ).alias("embedding"),
    )


def main() -> None:
    n_bench = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    n_corpus = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    dim = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    # On random 64-d vectors the max cosine over a 10k bench is ~0.45
    # for EVERY corpus vector, so τ=0.30 flags everything and recall is
    # trivially 1.0 — pick τ near the max-cosine distribution's center
    # for a selective flag set (the timings are τ-independent; the
    # recall column is only meaningful at a selective τ).
    tau6 = int(sys.argv[4]) if len(sys.argv) > 4 else 450_000

    spark = get_spark(app_name="semdecon_crossover")
    bench = synth_vectors(spark, n_bench, dim, "b").persist()
    corpus = synth_vectors(spark, n_corpus, dim, "c").persist()
    bench.count(), corpus.count()

    def run(df):
        t0 = time.perf_counter()
        rows = df.filter("contaminated").select("vec_id").collect()
        return round(time.perf_counter() - t0, 3), {r["vec_id"] for r in rows}

    # Warm spark.ml (the MLlib first-fit premium, bench.py lesson).
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    KMeans(k=2, seed=1, maxIter=1, featuresCol="f").fit(
        bench.limit(100).select(array_to_vector("embedding").alias("f"))
    )

    t_exact, exact_flags = run(
        benchmark_max_cosine(corpus, bench, tau6, label_col=None)
    )
    print(json.dumps({
        "form": "exact", "n_bench": n_bench, "n_corpus": n_corpus,
        "dim": dim, "sec": t_exact, "flags": len(exact_flags),
    }))
    for k, n_probe in ((100, 50), (100, 25), (316, 158)):
        t_km, km_flags = run(
            benchmark_max_cosine_kmeans(
                corpus, bench, tau6, k=k, n_probe=n_probe, label_col=None
            )
        )
        rec = (
            len(km_flags & exact_flags) / len(exact_flags)
            if exact_flags else 1.0
        )
        print(json.dumps({
            "form": "kmeans", "k": k, "n_probe": n_probe, "sec": t_km,
            "flags": len(km_flags), "recall": round(rec, 3),
            "false_pos": len(km_flags - exact_flags),
            "speedup_vs_exact": round(t_exact / t_km, 2) if t_km else None,
        }))

    # The deployment shape: quantizer persisted at benchmark-freeze
    # time, NO fit in the query path (build timed separately).
    import tempfile

    from map_reduce_framework_using_python_spark.operators.similarity import (
        benchmark_max_cosine_kmeans_indexed,
        build_semdecon_kmeans_bench,
    )

    with tempfile.TemporaryDirectory(prefix="semdecon_kb") as root:
        for k, n_probe in ((100, 50), (100, 25)):
            p = os.path.join(root, f"kb{k}")
            t0 = time.perf_counter()
            build_semdecon_kmeans_bench(bench, p, k=k)
            t_build = round(time.perf_counter() - t0, 3)
            t_ix, ix_flags = run(
                benchmark_max_cosine_kmeans_indexed(
                    corpus, p, tau6, n_probe=n_probe, label_col=None
                )
            )
            rec = (
                len(ix_flags & exact_flags) / len(exact_flags)
                if exact_flags else 1.0
            )
            print(json.dumps({
                "form": "kmeans_indexed", "k": k, "n_probe": n_probe,
                "build_sec": t_build, "probe_sec": t_ix,
                "recall": round(rec, 3),
                "false_pos": len(ix_flags - exact_flags),
                "speedup_vs_exact": round(t_exact / t_ix, 2) if t_ix else None,
            }))


if __name__ == "__main__":
    main()
