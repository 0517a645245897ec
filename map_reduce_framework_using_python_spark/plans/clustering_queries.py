"""Registered k-means clustering queries (operators/clustering.py).

The oracle is the interesting part: fixed-iteration Lloyd k-means IS
SQL-expressible, so rather than settling for a rows-only check the
oracle unrolls the iterations into a CTE chain (assignment = argmin via
lexicographic struct-min over a cross join with the k centroids; update
= per-(cluster, dimension) mean re-assembled with an ordered list
aggregate). Both engines round centroids half-up to 6 dp per iteration
(the determinism contract in operators/clustering.py), so cluster
assignments — and the final sizes — match exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_framework_using_python_spark.operators.clustering import kmeans_fit
from map_reduce_framework_using_python_spark.operators.similarity import dot, l2_norm
from map_reduce_framework_using_python_spark.plans.core import half_up, query, t

_K, _N_ITER, _DIM = 8, 2, 64


def _r6(x: str) -> str:
    return (
        f"CASE WHEN ({x}) >= 0 THEN floor(({x}) * 1000000 + 0.5) / 1000000 "
        f"ELSE -floor(-({x}) * 1000000 + 0.5) / 1000000 END"
    )


def _sqdist_sql(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(list_zip({a}, {b}), "
        f"p -> (p[1] - p[2]) * (p[1] - p[2])))"
    )


def _kmeans_ctes(
    k: int,
    n_iter: int,
    dim: int,
    pfx: str = "",
    vexpr: str = "list_transform(embedding, x -> CAST(x AS DOUBLE))",
    src: str = "embeddings",
) -> list[str]:
    """CTE chain replaying operators/clustering.kmeans_fit exactly
    (k-smallest-id init, half-up 1e-6 centroid rounding per iteration,
    min-struct (dist, cluster) assignment, empty clusters keep their
    previous centroid). ``pfx`` prefixes every CTE name so multiple
    chains compose in ONE query (the IVF-PQ oracle runs a coarse chain
    plus one chain per PQ subspace); ``vexpr`` is the vector expression
    the chain clusters — default the full embedding, a subspace chain
    passes a list slice. ``src`` is the FROM source — a table by
    default, or an earlier CTE, which is what lets chains STACK (the
    r14 hier-lloyd oracle clusters a residual CTE computed from a
    previous chain's output). Defaults generate byte-identical SQL to
    the pre-r11 single-chain form (every existing oracle unchanged)."""
    ctes = [
        f"{pfx}v AS (SELECT vec_id, {vexpr} AS v"
        f" FROM {src})",
        f"{pfx}cent0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster,"
        f" list_transform(v, x -> {_r6('x')}) AS cent"
        f" FROM (SELECT vec_id, v FROM {pfx}v ORDER BY vec_id LIMIT {k}))",
    ]
    for i in range(n_iter + 1):  # n_iter updates + the final assignment
        ctes.append(
            f"{pfx}a{i} AS (SELECT vec_id, v,"
            f" min(struct_pack(d := {_sqdist_sql('v', 'cent')}, c := cluster))['c']"
            f" AS cluster FROM {pfx}v CROSS JOIN {pfx}cent{i} GROUP BY vec_id, v)"
        )
        if i < n_iter:
            # LEFT JOIN back onto the previous centroid list: a cluster
            # with zero assigned points keeps its old centroid — the
            # exact rule kmeans_fit applies (it only overwrites entries
            # present in the update aggregate), so the two engines stay
            # in lockstep even if a cluster empties mid-run.
            ctes.append(
                f"{pfx}upd{i} AS (SELECT cluster, list({_r6('s / n')} ORDER BY i) AS cent"
                f" FROM (SELECT cluster, i, sum(v[i]) AS s, count(*) AS n"
                f" FROM {pfx}a{i} CROSS JOIN range(1, {dim + 1}) t(i)"
                f" GROUP BY cluster, i) GROUP BY cluster)"
            )
            ctes.append(
                f"{pfx}cent{i + 1} AS (SELECT p.cluster,"
                f" coalesce(u.cent, p.cent) AS cent"
                f" FROM {pfx}cent{i} p LEFT JOIN {pfx}upd{i} u ON u.cluster = p.cluster)"
            )
    return ctes


def _kmeans_oracle(k: int, n_iter: int, dim: int) -> str:
    ctes = _kmeans_ctes(k, n_iter, dim)
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT cluster, count(*) AS n_vecs FROM a{n_iter} GROUP BY cluster"
    )


def _semdedup_oracle(k: int, n_iter: int, dim: int, thr: float) -> str:
    ctes = _kmeans_ctes(k, n_iter, dim)
    # Quantize the cosine to the half_up 1e-6 grid BEFORE thresholding
    # (repo determinism rule): both engines compare the same quantized
    # number, so a last-ulp float divergence at the threshold (or a
    # .xxxxxx5 rounding boundary) can't flip a pair in or out.
    return (
        "WITH " + ",\n".join(ctes)
        + f""",
        pairs AS (
            SELECT a.cluster,
                   a.vec_id AS vec_a, b.vec_id AS vec_b,
                   floor(list_cosine_similarity(a.v, b.v) * 1000000.0 + 0.5)
                     / 1000000.0 AS cosine
            FROM a{n_iter} a JOIN a{n_iter} b
              ON a.cluster = b.cluster AND a.vec_id < b.vec_id
        )
        SELECT cluster, vec_a, vec_b, cosine FROM pairs
        WHERE cosine >= {thr}
        """
    )


@query(
    "ns_kmeans_sizes",
    oracle=_kmeans_oracle(_K, _N_ITER, _DIM),
    tags=("northstar", "clustering"),
)
def ns_kmeans_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster sizes after 2 deterministic Lloyd iterations (k=8,
    init = vectors of the 8 smallest vec_ids). Each iteration is one
    scan + one bounded aggregate (see operators/clustering.py for the
    scale analysis); the DuckDB oracle unrolls the same algorithm as a
    CTE chain."""
    assigned, _ = kmeans_fit(
        t(spark, sf_dir, "embeddings"), k=_K, n_iter=_N_ITER
    )
    return assigned.groupBy("cluster").agg(F.count("*").alias("n_vecs"))


_SEM_THR = 0.4


@query(
    "ns_semdedup_pairs",
    oracle=_semdedup_oracle(_K, _N_ITER, _DIM, _SEM_THR),
    tags=("northstar", "clustering", "dedup", "similarity"),
)
def ns_semdedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic near-duplicate pairs
    found by k-means bucketing — cluster the embeddings (same
    deterministic Lloyd run as ns_kmeans_sizes), then compare vectors
    only WITHIN a cluster and keep pairs with cosine ≥ 0.4. The drop
    rule downstream keeps min(vec_id) per near-group, exactly
    ns_dedup_keep_best's representative pattern.

    This is the cluster-bucketed scale path for embedding dedup — the
    k-means twin of MinHash-LSH banding: quadratic work happens only
    inside a cluster (expected n/k rows each; production runs
    k ≈ √n), so the all-pairs blow-up ns_embedding_near_pairs is
    tagged oracle_tier for never materializes. Join + cosine are pure
    JVM expressions; pytest pins recall against the exact all-pairs
    ground truth restricted to co-clustered pairs (= 1.0 by
    construction)."""
    from map_reduce_framework_using_python_spark.operators.clustering import (
        cluster_cosine_pairs,
    )

    assigned, _ = kmeans_fit(t(spark, sf_dir, "embeddings"), k=_K, n_iter=_N_ITER)
    # Shared pairing block (r7 review): the operator persists the
    # assignment, so the scan + k×64-term argmin run ONCE — the
    # un-persisted self-join here evaluated them twice. The half_up
    # 1e-6 quantize-then-threshold grid lives in the operator.
    return cluster_cosine_pairs(assigned, _SEM_THR, id_col="vec_id")


@query("ns_whiten_embeddings", oracle=None, tags=("northstar", "embedding", "rows_only"))
def ns_whiten_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ZCA-whitened embeddings (operators/whiten.py): one moments pass
    (mapInPandas partials, O(partitions) model-state rows to the
    driver), a d×d eig on the driver, and a map-only broadcast
    projection — the decorrelation step retrieval/clustering pipelines
    run before cosine math. Rows-only for the driver (eigendecomposition
    has no ANSI-SQL twin); numpy-pinned in tests/test_whiten.py
    (whitened covariance == identity, projection == reference). Emits
    the leading 8 components (half_up 1e-6) as typed scalars plus the
    full whitened L2 norm."""
    from map_reduce_framework_using_python_spark.operators.whiten import (
        embedding_moments,
        whiten,
        zca_matrix,
    )

    emb = t(spark, sf_dir, "embeddings")
    _, mean, cov = embedding_moments(emb)
    out = whiten(emb.select("vec_id", "embedding"), mean, zca_matrix(cov))
    comp = [
        half_up(F.col("whitened").getItem(i), 6).alias(f"w{i}") for i in range(8)
    ]
    nrm = F.sqrt(
        F.aggregate(
            F.transform("whitened", lambda x: x * x), F.lit(0.0), lambda a, x: a + x
        )
    )
    return out.select("vec_id", *comp, half_up(nrm, 6).alias("wnorm"))
