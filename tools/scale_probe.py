"""Scale probe: synthesize a 10× copy of sf0.1 (~6M lineitem rows) under
/tmp and time the headline queries against it vs sf0.1.

Fact tables are replicated with key offsets (so join cardinalities scale
linearly, not quadratically); dims stay fixed — the realistic shape of a
growing warehouse. Results go to stdout; NOTES.md records the latest run.

Usage: python tools/scale_probe.py [replicas]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from map_reduce_framework_using_python_spark.plans import REGISTRY
from map_reduce_framework_using_python_spark.session import get_spark
from map_reduce_framework_using_python_spark.sources.io import TABLES, load_table

SRC = "/root/testdata/sf0.1"
DST = "/tmp/spark_graft_sfbig"

#: fact table → columns to offset per replica (dims replicate unchanged
#: keys only via their fact-side references; dim tables are NOT scaled).
OFFSETS = {
    "orders": {"o_orderkey": 10_000_000},
    "lineitem": {"l_orderkey": 10_000_000},
    "events": {"event_id": 10_000_000},
    "documents": {"doc_id": 10_000_000},
    "embeddings": {"vec_id": 10_000_000},
}

PROBE = (
    "q01_pricing_summary",
    "q06_forecast_revenue",
    "q05_local_supplier",
    "q18_large_orders",
    "q_topk_per_group",
    "ns_dedup_exact",
    "ns_minhash_lsh_pairs",
    "ns_wordcount",
    "ns_cosine_topk",
    "q_funnel",
    "ns_chunk_documents",
    "ns_decontaminate",
    "ns_tfidf",
    "ns_kmeans_sizes",
    # round 3: bucketed-rank rewrites of the former global windows,
    # the corpus capstone, and the salted skew path
    "q_window_ntile",
    "q_equidepth_histogram",
    "ns_seeded_shuffle",
    "q_funnel_latency",
    "ns_corpus_build",
    "q_skew_salted",
    # one-pass sketch aggregates + map-heavy repetition signals
    # (q_join_range_bigbig is deliberately NOT probed on replicas:
    # replicas clone timestamps, so per-bucket density — and the true
    # pair count the query answers with — grows quadratically; that's
    # the replica artifact, not the operator)
    "ns_kll_quantiles",
    "ns_repetition_signals",
    "q_session_dynamic_gap",
    # round 3, second half: graph + analytics batch (q_fuzzy_match is
    # not probed — `part` is a dim table, unscaled by replicas)
    "q_triangle_count",
    "q_attribution_last_touch",
    "q_assoc_rules",
    "q_mad_outliers",
    "q_rolling_ewma",
    "ns_span_dedup",
    "ns_bm25_topk",
    "ns_pagerank_events",
    "q_wau_rolling",
    "q_bfs_distance",
    "q_kcore",
    # round 4: quantization (map-only), bigram LM (vocab-bounded
    # exchanges), containment decontamination (digest shuffle)
    "ns_int8_quantize",
    "ns_bigram_lm_score",
    "ns_shingle_containment",
    "ns_weighted_sample",
    "q_scd2_point_in_time",
    # round 5: real merge-table BPE (broadcast vocab, map-only) and the
    # persisted-index ingest probe (index build amortized via the
    # fingerprint cache — the probe row is the per-ingest cost)
    "ns_token_count_bpe",
    "ns_incremental_dedup",
    "ns_hash_embed",
    "ns_token_entropy",
    "ns_source_overlap",
    # round 5, part 7: DSIR (fixed 256-row model — exchanges are
    # bucket- or doc-keyed, never wider), CCNet terciles (LM + per-lang
    # window), BPE training (corpus pass once, then vocab-sized rounds)
    "ns_dsir_weights",
    "ns_ccnet_buckets_scaled",
    "ns_bpe_train",
    "ns_temperature_mixture",
    "ns_corpus_drift",
    # round 5, closing: batched ANN probe — the query batch is
    # id-bounded (fixed 14 queries), so replicas scale the CORPUS only:
    # expected growth is candidates-per-bucket, ~linear
    "ns_ann_probe_batch",
    # round 6: sub-document boilerplate stats (digest-only shuffles,
    # shuffle-hash frequency join) and the realized CCNet cut (rides
    # the histogram-threshold assignment; the cut adds zero exchanges)
    "ns_paragraph_dedup",
    "ns_ccnet_sample",
)


def build(spark, replicas: int) -> None:
    # A cached dataset is only reusable for the SAME replica count AND
    # the same SOURCE testdata — a manifest guards against silently
    # probing stale data (round-1's 50× leftovers made a "10×" bench
    # section measure 50×; r7 tools review added the source
    # fingerprint: a regenerated same-cardinality sf0.1 must rebuild).
    from map_reduce_framework_using_python_spark.sources.io import (
        read_json_guarded,
        source_fingerprint,
        write_json_atomic,
    )

    manifest = os.path.join(DST, "_replicas.json")
    want = {
        "replicas": replicas,
        "src": {n: source_fingerprint(os.path.join(SRC, f"{n}.parquet"))
                for n in TABLES},
    }
    if read_json_guarded(manifest) != want and os.path.exists(DST):
        import shutil

        shutil.rmtree(DST)
    for name in TABLES:
        out = os.path.join(DST, f"{name}.parquet")
        # _SUCCESS marks a COMPLETE Spark write: a directory left by an
        # interrupted incremental write must rebuild, not serve partial
        # part files (r7 tools review).
        if os.path.exists(os.path.join(out, "_SUCCESS")):
            continue
        df = load_table(spark, SRC, name)
        if name in OFFSETS:
            parts = []
            for i in range(replicas):
                p = df
                for col, step in OFFSETS[name].items():
                    p = p.withColumn(col, F.col(col) + F.lit(i * step))
                parts.append(p)
            df = parts[0]
            for p in parts[1:]:
                df = df.unionByName(p)
        df.write.mode("overwrite").parquet(out)
        print(f"built {name}: {spark.read.parquet(out).count()} rows", file=sys.stderr)
    write_json_atomic(manifest, want)


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    only = set(sys.argv[2:])  # optional query-name filter
    spark = get_spark(app_name="scale_probe")
    build(spark, replicas)
    REGISTRY["q00_scan_count"].fn(spark, DST).collect()  # warm
    REGISTRY["q01_pricing_summary"].fn(spark, SRC).collect()
    print(f"{'query':28s} {'sf0.1':>8s} {'10x':>8s} {'ratio':>6s}")
    for name in PROBE:
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        n_small = REGISTRY[name].fn(spark, SRC).count()
        t_small = time.perf_counter() - t0
        t0 = time.perf_counter()
        n_big = REGISTRY[name].fn(spark, DST).count()
        t_big = time.perf_counter() - t0
        print(
            f"{name:28s} {t_small:8.2f} {t_big:8.2f} {t_big / max(t_small, 1e-9):5.1f}x"
            f"   rows {n_small}->{n_big}"
        )


if __name__ == "__main__":
    main()
