"""One-off 100×-embeddings probe for the r12 maintenance shapes: the
lifecycle verbs (append / delete / compact / rebuild) and the planner
against a 2M-vector IVF-PQ index — does the cost model measured at 10×
(scale10x_rebuild) hold two orders of magnitude up?

Replicates sf0.1's 20k embeddings 100× (vec_id offset + 64-dim slice
roll per replica, the bench _ivfpq_rolled convention, so k-means sees
distinct points) into its own fingerprint-guarded dir — deliberately
NOT scale_probe.DST (a different replica count would rmtree the 10×
cache the standing bench rows reuse).

Knobs scale with the corpus: n_centroids=256 (≈7.8k codes/cell),
fit_fraction=0.02 (≈40k-vector quantizer sample — the sampled-fit
path whose exactness is pinned in test_ivfpq).

SDC pair mining at corpus-proportional cells (r13 — the r12 probe
documented this as the one missing scale lane): the within-cell
quadratic needs n_cells ∝ n (6400 cells for ~312 codes/cell at 2M),
and a flat 6400-centroid spark.ml fit is not a probe — but the
TWO-LEVEL coarse quantizer (build_ivfpq_index_hier, 80×80 leaf cells
from two 80-centroid sampled fits) is: the `sdc_hier_*` keys time the
hier build and the SDC mining over its leaf cells, the row that shows
the quadratic stays bounded two orders up.

Usage: python tools/maint100x_probe.py [replicas=100]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from map_reduce_framework_using_python_spark.operators import ivfpq
from map_reduce_framework_using_python_spark.operators.ann_index import (
    delete_from_index,
    plan_maintenance,
)
from map_reduce_framework_using_python_spark.session import get_spark
from map_reduce_framework_using_python_spark.sources.io import (
    read_json_guarded,
    source_fingerprint,
    write_json_atomic,
)

SRC = "/root/testdata/sf0.1/embeddings.parquet"
DST = "/tmp/spark_graft_maint100x"


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    spark = get_spark(app_name="maint100x_probe")
    out: dict = {"replicas": replicas, "vectors": replicas * 20_000}

    emb_path = os.path.join(DST, "embeddings.parquet")
    manifest = os.path.join(DST, "_manifest.json")
    want = {"replicas": replicas, "src": source_fingerprint(SRC)}
    if read_json_guarded(manifest) != want:
        shutil.rmtree(DST, ignore_errors=True)
        base = spark.read.parquet(SRC)
        t0 = time.time()
        frames = []
        for r in range(replicas):
            roll = r % 64
            frames.append(
                base.select(
                    (F.col("vec_id") + r * 10_000_000).alias("vec_id"),
                    F.concat(
                        F.slice(F.col("embedding"), roll + 1, 64 - roll),
                        F.slice(F.col("embedding"), 1, roll),
                    ).alias("embedding"),
                    "label",
                )
            )
        df = frames[0]
        for f in frames[1:]:
            df = df.unionByName(f)
        df.repartition(64).write.mode("overwrite").parquet(emb_path)
        out["dataset_build"] = round(time.time() - t0, 3)
        write_json_atomic(manifest, want)
    vecs = spark.read.parquet(emb_path)

    idx = os.path.join(DST, "idx")
    t0 = time.time()
    ivfpq.build_ivfpq_index(
        vecs, idx, n_centroids=256, m=16, k=16, seed=42, fit_fraction=0.02
    )
    out["index_build"] = round(time.time() - t0, 3)

    # probe latency on the big index (the number maintenance must not hurt)
    queries = vecs.filter(F.col("vec_id") < 64)
    t0 = time.time()
    n = ivfpq.ivfpq_probe_index_batch(
        spark, queries, idx, vecs, k=10, n_probe=16, shortlist=100
    ).count()
    out["probe_exec"] = round(time.time() - t0, 3)
    out["probe_rows"] = n

    # SDC pair mining at corpus-proportional cells via the TWO-LEVEL
    # coarse quantizer: √6400 × √6400 leaf cells from two 80-centroid
    # sampled fits (a flat k=6400 fit is the documented non-starter)
    # total cells ≈ n/312; each LEVEL fits √cells centroids
    k_side = max(2, int(round((replicas * 20_000 / 312) ** 0.5)))
    hier_idx = os.path.join(DST, "idx_hier")
    t0 = time.time()
    ivfpq.build_ivfpq_index_hier(
        vecs, hier_idx, n_cells_l1=k_side, n_cells_l2=k_side,
        m=16, k=16, seed=42, fit_fraction=0.02,
    )
    out["sdc_hier_build"] = round(time.time() - t0, 3)
    out["sdc_hier_cells"] = (
        spark.read.parquet(hier_idx).select("centroid_id").distinct().count()
    )
    t0 = time.time()
    out["sdc_hier_pairs"] = ivfpq.sdc_near_pairs(
        spark, hier_idx, vecs, tau=0.4, margin=0.2
    ).count()
    out["sdc_hier_pairs_exec"] = round(time.time() - t0, 3)

    # IMI multi-sequence routing vs composed-centroid ranking (r14 —
    # the r13 NOTES crossover, measured): cell selection is pure
    # driver math, so time it directly on the REAL hier meta
    # (k_side² leaves) and on a synthetic 250×250 grid (the past-10⁵
    # regime the composed sort cannot reach). The walk must pick
    # near-identical cells at the real scale (overlap row) and stay
    # flat where the composed sort grows with k1·k2.
    from map_reduce_framework_using_python_spark.operators.ann_index import (
        _read_meta,
    )
    from map_reduce_framework_using_python_spark.operators.ivfpq import (
        _hier_probe_cells,
        _normalize_query,
    )

    meta = _read_meta(hier_idx)
    qn = _normalize_query(
        [float(x) for x in vecs.filter(F.col("vec_id") == 0)
         .head()["embedding"]]
    )
    n_probe_cells = 64

    def composed_rank(centroids, reps=1):
        t = time.time()
        for _ in range(reps):
            sel = sorted(
                range(len(centroids)),
                key=lambda i: (
                    sum((a - b) ** 2 for a, b in zip(qn, centroids[i])), i
                ),
            )[:n_probe_cells]
        return sel, (time.time() - t) / reps

    sel_c, t_c = composed_rank(meta["centroids"])
    t = time.time()
    sel_i = _hier_probe_cells(qn, meta, n_probe_cells, n_probe1=16)
    t_i = time.time() - t
    out["imi_real_leaves"] = len(meta["centroids"])
    out["imi_real_composed_sec"] = round(t_c, 4)
    out["imi_real_walk_sec"] = round(t_i, 4)
    out["imi_real_cell_overlap"] = round(
        len(set(sel_c) & set(sel_i)) / n_probe_cells, 3
    )

    # synthetic 250×250 grid: deterministic pseudo-centroids (values
    # never matter for routing COST, only the eval count does)
    import math

    dim = len(qn)
    k_big = 250
    c1 = [[math.sin(i * dim + d) for d in range(dim)] for i in range(k_big)]
    c2 = [[math.cos(j * dim + d) * 0.1 for d in range(dim)]
          for j in range(k_big)]
    big_meta = {"hier": {"centroids_l1": c1, "centroids_l2": c2}}
    composed_big = [
        [a + b for a, b in zip(c1[i], c2[j])]
        for i in range(k_big) for j in range(k_big)
    ]
    _, t_cb = composed_rank(composed_big)
    t = time.time()
    _hier_probe_cells(qn, big_meta, n_probe_cells, n_probe1=16)
    t_ib = time.time() - t
    out["imi_big_leaves"] = k_big * k_big
    out["imi_big_composed_sec"] = round(t_cb, 4)
    out["imi_big_walk_sec"] = round(t_ib, 4)

    # end-to-end single-query probe against the REAL hier index, both
    # routes (the recall surface is the exact rerank either way; the
    # routing difference is where the time goes at big leaf counts)
    t0 = time.time()
    n_comp = ivfpq.ivfpq_topk_indexed(
        vecs, hier_idx, 0, topk=10, n_probe=64, shortlist=200
    ).count()
    out["imi_probe_composed_exec"] = round(time.time() - t0, 3)
    t0 = time.time()
    n_imi = ivfpq.ivfpq_topk_indexed(
        vecs, hier_idx, 0, topk=10, n_probe=64, shortlist=200, n_probe1=16
    ).count()
    out["imi_probe_walk_exec"] = round(time.time() - t0, 3)
    out["imi_probe_rows"] = (n_comp, n_imi)

    shutil.rmtree(hier_idx, ignore_errors=True)

    # append 1% (re-delivery) then compact
    batch = vecs.filter(F.col("vec_id") % 97 == 1)
    t0 = time.time()
    ivfpq.append_to_ivfpq_index(batch, idx)
    out["append_sec"] = round(time.time() - t0, 3)
    t0 = time.time()
    ivfpq.compact_ivfpq_index(spark, idx)
    out["compact_sec"] = round(time.time() - t0, 3)

    # delete 10% — the O(|deleted|) claim at 200k ids
    t0 = time.time()
    delete_from_index(vecs.filter(F.col("vec_id") % 10 == 3).select("vec_id"), idx)
    out["delete_sec"] = round(time.time() - t0, 3)
    t0 = time.time()
    n = ivfpq.ivfpq_probe_index_batch(
        spark, queries, idx, vecs, k=10, n_probe=16, shortlist=100
    ).count()
    out["probe_tombstoned_exec"] = round(time.time() - t0, 3)

    # planner over the mutated layout (listing + footer reads only)
    t0 = time.time()
    plan = plan_maintenance({"idx": idx})[0]
    out["planner_sec"] = round(time.time() - t0, 3)
    out["planner_decision"] = plan["decision"]
    out["tombstone_frac"] = plan["tombstone_frac"]

    # rebuild from the filtered survivors (the verb the planner asks for)
    survivors = vecs.filter(F.col("vec_id") % 10 != 3)
    t0 = time.time()
    ivfpq.rebuild_ivfpq_index(
        survivors, idx, fit_fraction=0.02, ids_already_filtered=True
    )
    out["rebuild_sec"] = round(time.time() - t0, 3)
    out["planner_after"] = plan_maintenance({"idx": idx})[0]["decision"]

    print(json.dumps(out))


if __name__ == "__main__":
    main()
