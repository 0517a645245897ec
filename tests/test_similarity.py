"""Similarity-search tests: brute-force cosine against a NumPy oracle,
LSH recall against brute force."""

from __future__ import annotations

import numpy as np

from map_reduce_framework_using_python_spark.operators.similarity import (
    cosine_topk_bruteforce,
    lsh_cosine_topk,
)
from map_reduce_framework_using_python_spark.sources.io import load_table
from tests.conftest import SF_SMOKE


def test_bruteforce_matches_numpy(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    rows = emb.collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}
    q = vecs[0]
    sims = {
        vid: float(v @ q / (np.linalg.norm(v) * np.linalg.norm(q)))
        for vid, v in vecs.items()
        if vid != 0
    }
    expected = sorted(sims, key=lambda vid: (-sims[vid], vid))[:10]
    got = [r["vec_id"] for r in cosine_topk_bruteforce(emb, query_vec_id=0, k=10).collect()]
    assert got == expected
    # Scores agree to rounding precision.
    got_scores = {
        r["vec_id"]: r["cosine"]
        for r in cosine_topk_bruteforce(emb, query_vec_id=0, k=10).collect()
    }
    for vid, s in got_scores.items():
        assert abs(s - sims[vid]) < 1e-5


def test_lsh_finds_planted_near_duplicate(spark):
    """LSH's guarantee is for *high*-similarity items: a near-duplicate
    of the query (cosine ≈ 1) shares its sign pattern and must be
    retrieved as the top hit. (On this corpus of near-orthogonal random
    vectors, mid-similarity recall is inherently probabilistic — that's
    the documented trade; the planted neighbor pins the contract.)"""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    q = emb.filter("vec_id = 0").collect()[0]["embedding"]
    planted = spark.createDataFrame(
        [(999999, [float(x) * 1.01 for x in q], 0)], emb.schema
    )
    corpus = emb.unionByName(planted)
    got = lsh_cosine_topk(corpus, query_vec_id=0, k=10).collect()
    assert got[0]["vec_id"] == 999999
    assert got[0]["cosine"] > 0.999


def test_lsh_overlap_with_bruteforce_nonzero(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    exact = {r["vec_id"] for r in cosine_topk_bruteforce(emb, query_vec_id=0, k=10).collect()}
    approx = {r["vec_id"] for r in lsh_cosine_topk(emb, query_vec_id=0, k=10, probe_hamming=3).collect()}
    assert approx & exact, "LSH found none of the true top-10"


def test_ivf_topk_recall(spark):
    """IVF with n_probe=4/16 must recover a solid share of the true
    top-10 (cosine neighbors concentrate in nearby k-means cells), and
    the full-probe configuration must equal brute force exactly."""
    from map_reduce_framework_using_python_spark.operators.similarity import ivf_topk

    emb = load_table(spark, SF_SMOKE, "embeddings")
    exact = [r["vec_id"] for r in cosine_topk_bruteforce(emb, query_vec_id=0, k=10).collect()]
    approx = [r["vec_id"] for r in ivf_topk(emb, query_vec_id=0, k=10, n_probe=4).collect()]
    assert len(set(approx) & set(exact)) >= 3
    full = [
        r["vec_id"]
        for r in ivf_topk(emb, query_vec_id=0, k=10, n_centroids=16, n_probe=16).collect()
    ]
    assert full == exact  # probing every cell == brute force


def test_lsh_results_are_subset_of_corpus(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    res = lsh_cosine_topk(emb, query_vec_id=0, k=10).collect()
    assert len(res) <= 10
    assert all(r["vec_id"] != 0 for r in res)


def test_bucket_expr_bit_equal_to_column_path(spark):
    """The generated-SQL bucket build (fast path, r7: kills the ~0.7 s
    driver-side Column construction that round 6 misread as an
    execution regression) must be BIT-equal to the Column-API path for
    both the raw-sign and grid forms — same planes, same fold order,
    same literals after repr round-trip."""
    from pyspark.sql import functions as F

    from map_reduce_framework_using_python_spark.operators.similarity import (
        hyperplanes,
        lsh_bucket,
        lsh_bucket_grid,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    planes = hyperplanes(64, 8, seed=42)
    for fn in (lsh_bucket, lsh_bucket_grid):
        got = [
            (r[0], r[1])
            for r in emb.select(
                "vec_id", fn("embedding", planes)
            ).orderBy("vec_id").collect()
        ]
        want = [
            (r[0], r[1])
            for r in emb.select(
                "vec_id", fn(F.col("embedding"), planes)
            ).orderBy("vec_id").collect()
        ]
        assert got == want
    # and the underlying grid dots themselves are bit-equal, not just
    # the coarse sign pattern
    from map_reduce_framework_using_python_spark.operators.similarity import (
        _as_double,
        _plane_dot_sql,
        dot,
    )

    p0 = planes[0]
    sqld = [
        r[1]
        for r in emb.select("vec_id", F.expr(_plane_dot_sql("`embedding`", p0)))
        .orderBy("vec_id")
        .collect()
    ]
    cold = [
        r[1]
        for r in emb.select(
            "vec_id",
            dot(_as_double(F.col("embedding")), F.array(*[F.lit(x) for x in p0])),
        )
        .orderBy("vec_id")
        .collect()
    ]
    assert sqld == cold


def test_sql_and_column_bucket_paths_agree_on_edges(spark):
    """r7 functions/similarity review: the fast generated-SQL build and
    the Column build must agree on edge inputs — empty planes (lit 0,
    not an unparseable '()'), and a backticked column name must quote
    through the string path. Non-finite plane values raise up front."""
    import pytest
    from pyspark.sql import functions as F

    from map_reduce_framework_using_python_spark.operators.similarity import (
        hyperplanes,
        lsh_bucket,
        lsh_bucket_grid,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings").limit(5)
    # empty planes: both paths give bucket 0 for every row
    got = emb.select(lsh_bucket("embedding", []).alias("b")).collect()
    want = emb.select(lsh_bucket(F.col("embedding"), []).alias("b")).collect()
    assert [r["b"] for r in got] == [r["b"] for r in want] == [0] * 5
    # backtick in the column name survives the string fast path (same
    # data under a plain name is the expected value — F.col would itself
    # need manual escaping for such a name)
    planes = hyperplanes(64, 4, seed=7)
    weird = emb.select("vec_id", F.col("embedding").alias("e`mb"))
    got = [
        r[1]
        for r in weird.select("vec_id", lsh_bucket("e`mb", planes))
        .orderBy("vec_id")
        .collect()
    ]
    want = [
        r[1]
        for r in emb.select("vec_id", lsh_bucket("embedding", planes))
        .orderBy("vec_id")
        .collect()
    ]
    assert got == want
    # non-finite plane values are rejected at build time, not parse time
    bad = [[float("nan")] * 64]
    with pytest.raises(ValueError):
        lsh_bucket("embedding", bad)
    with pytest.raises(ValueError):
        lsh_bucket_grid("embedding", bad)


def test_probe_batch_emit_misses_surfaces_empty_queries(spark):
    """r7 functions/similarity review: a query whose Hamming ball hits
    no corpus bucket silently vanished from lsh_probe_batch output;
    emit_misses=True must surface it as one all-NULL row while hit
    queries are unchanged."""
    from pyspark.sql import functions as F

    from map_reduce_framework_using_python_spark.operators.similarity import (
        lsh_probe_batch,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    corpus = emb.filter(F.col("vec_id") % 7 != 0)
    # One real query + one adversarial all-(-1000) vector far from every
    # corpus bucket under radius-0 probing.
    real = emb.filter(F.col("vec_id") == 7).select("vec_id", "embedding")
    alien = spark.createDataFrame(
        [(999999, [-1000.0] * 64)], "vec_id long, embedding array<double>"
    )
    queries = real.unionByName(alien)
    base = lsh_probe_batch(
        corpus, queries, dim=64, k=3, probe_hamming=0, id_col="vec_id"
    )
    with_misses = lsh_probe_batch(
        corpus, queries, dim=64, k=3, probe_hamming=0, id_col="vec_id",
        emit_misses=True,
    )
    base_rows = base.collect()
    m_rows = with_misses.collect()
    base_qids = {r["q_id"] for r in base_rows}
    m_qids = {r["q_id"] for r in m_rows}
    assert 999999 in m_qids  # surfaced
    if 999999 not in base_qids:  # the designed scenario: silent drop
        null_rows = [r for r in m_rows if r["q_id"] == 999999]
        assert len(null_rows) == 1 and null_rows[0]["vec_id"] is None
    # hit queries identical between the two forms
    assert sorted(
        (r["q_id"], r["vec_id"], r["rn"]) for r in base_rows
    ) == sorted(
        (r["q_id"], r["vec_id"], r["rn"]) for r in m_rows if r["vec_id"] is not None
    )


def test_semdecon_lsh_flags_subset_with_measured_recall(spark):
    """The bucketed decontamination path vs the exact form on the same
    slice split: candidate cosines are exact, so the LSH flags must be
    a SUBSET of the exact flags (no false positives possible), every
    non-null max_cosine must EQUAL the exact max (a bucketed candidate
    either is the argmax or loses to it... it can also be a weaker
    candidate when the true argmax's bucket wasn't probed — so ≤, with
    equality whenever the argmax collided), and recall at τ is pinned
    at the fixed seed (deterministic — a plane/bucket change that
    silently craters recall fails here)."""
    from map_reduce_framework_using_python_spark.plans.core import REGISTRY

    exact = {
        r["vec_id"]: r
        for r in REGISTRY["ns_semantic_decontaminate"].fn(spark, SF_SMOKE).collect()
    }
    lsh = {
        r["vec_id"]: r
        for r in REGISTRY["ns_semantic_decontaminate_lsh"]
        .fn(spark, SF_SMOKE)
        .collect()
    }
    assert set(lsh) == set(exact)  # misses emit (NULL, false), never vanish
    exact_flags = {k for k, r in exact.items() if r["contaminated"]}
    lsh_flags = {k for k, r in lsh.items() if r["contaminated"]}
    assert lsh_flags <= exact_flags  # no false positives
    for k, r in lsh.items():
        if r["max_cosine"] is not None:
            assert r["max_cosine"] <= exact[k]["max_cosine"] + 1e-9, k
    # τ=0.30 is the LOW-similarity regime (per-plane collision ≈0.60);
    # the registry query probes radius 3 and measures 0.694 here at the
    # fixed seed — deterministic, so 0.6 is a real floor, not a hope.
    recall = len(lsh_flags) / len(exact_flags)
    assert recall >= 0.6, (len(lsh_flags), len(exact_flags))


def test_semdecon_lsh_near_duplicate_regime_recall(spark):
    """The regime the scale path EXISTS for: benchmark items leaked
    near-verbatim (cosine ≥ 0.95). Planted: 32 deterministic benchmark
    vectors; corpus = small perturbations of each (the leaks) + 200
    decoys. At τ=0.90 and the DEFAULT radius-2 ball, the exact and LSH
    forms must flag the same leaks minus at most the theory's bucket
    misses (per-plane p ≈ 0.9 → ball recall ≈ 0.96; measured and
    pinned at the fixed seed), and zero decoys."""
    import numpy as np

    from map_reduce_framework_using_python_spark.operators.similarity import (
        benchmark_max_cosine,
        benchmark_max_cosine_lsh,
    )

    rs = np.random.RandomState(7)
    bench_vecs = rs.randn(32, 64)
    leaks = bench_vecs + 0.05 * rs.randn(32, 64)  # cosine ≈ 0.995
    decoys = rs.randn(200, 64)
    bench = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(bench_vecs)],
        "vec_id long, embedding array<double>",
    )
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(leaks)]
        + [(1000 + i, [float(x) for x in v]) for i, v in enumerate(decoys)],
        "vec_id long, embedding array<double>",
    )
    exact = {
        r["vec_id"]
        for r in benchmark_max_cosine(
            corpus, bench, 900_000, label_col=None
        ).collect()
        if r["contaminated"]
    }
    got = {
        r["vec_id"]
        for r in benchmark_max_cosine_lsh(
            corpus, bench, 900_000, label_col=None
        ).collect()
        if r["contaminated"]
    }
    assert exact == set(range(32))  # all leaks, no decoys, exactly
    assert got <= exact
    assert len(got) / len(exact) >= 0.9, sorted(exact - got)


def test_semdecon_kmeans_low_tau_recall(spark):
    """The r10 low-threshold scale path: centroid-routed candidates vs
    the exact form AT the registry τ=0.30 — the regime where the
    hyperplane form's pinned floor is only 0.6. Same subset guarantee
    (candidates score exactly ⇒ no false positives, non-null max ≤
    exact max), full per-vector surface, and recall ≥ 0.9 at the fixed
    seed — the guarantee that closes the r9 'silently lose ~1/3 of
    flags' gap. Measured 0.93–1.0 across (k, n_probe=k/2) settings."""
    from map_reduce_framework_using_python_spark.plans.core import REGISTRY

    exact = {
        r["vec_id"]: r
        for r in REGISTRY["ns_semantic_decontaminate"].fn(spark, SF_SMOKE).collect()
    }
    km = {
        r["vec_id"]: r
        for r in REGISTRY["ns_semantic_decontaminate_kmeans"]
        .fn(spark, SF_SMOKE)
        .collect()
    }
    assert set(km) == set(exact)  # misses emit (NULL, false), never vanish
    exact_flags = {k for k, r in exact.items() if r["contaminated"]}
    km_flags = {k for k, r in km.items() if r["contaminated"]}
    assert km_flags <= exact_flags  # no false positives
    for k, r in km.items():
        if r["max_cosine"] is not None:
            assert r["max_cosine"] <= exact[k]["max_cosine"] + 1e-9, k
    assert len(km_flags) / len(exact_flags) >= 0.9, (
        len(km_flags),
        len(exact_flags),
    )


def test_semdecon_lsh_warns_below_pinned_regime(spark):
    """The loud guard beside the honest contract: tau6 below the
    pinned-recall regime emits a RuntimeWarning naming the kmeans
    form; tau6 inside the regime stays silent."""
    import warnings

    from map_reduce_framework_using_python_spark.operators.similarity import (
        benchmark_max_cosine_lsh,
    )

    vecs = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id long, embedding array<double>"
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        benchmark_max_cosine_lsh(vecs, vecs, 300_000, label_col=None, dim=2)
        assert any(
            issubclass(x.category, RuntimeWarning)
            and "benchmark_max_cosine_kmeans" in str(x.message)
            for x in w
        )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        benchmark_max_cosine_lsh(vecs, vecs, 950_000, label_col=None, dim=2)
        assert not any(issubclass(x.category, RuntimeWarning) for x in w)
    # A KNOWING low-τ caller can opt out (the registry query documents
    # this regime deliberately — r10 advice): same call, no warning.
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        benchmark_max_cosine_lsh(
            vecs, vecs, 300_000, label_col=None, dim=2,
            suppress_regime_warning=True,
        )
        assert not any(issubclass(x.category, RuntimeWarning) for x in w)


def test_semdecon_scale_forms_empty_bench_full_surface(spark):
    """An EMPTY benchmark must keep the documented per-vector output
    surface on every scale form — one row per corpus vector with
    max_cosine NULL / contaminated false — not silently collapse to
    zero rows (the r9 advice finding on the LSH fallback)."""
    from map_reduce_framework_using_python_spark.operators.similarity import (
        benchmark_max_cosine_kmeans,
        benchmark_max_cosine_lsh,
    )

    vecs = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id long, embedding array<double>"
    )
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    for form in (benchmark_max_cosine_lsh, benchmark_max_cosine_kmeans):
        rows = {
            r["vec_id"]: r
            for r in form(vecs, empty, 900_000, label_col=None).collect()
        }
        assert set(rows) == {1, 2}, form.__name__
        assert all(
            r["max_cosine"] is None and r["contaminated"] is False
            for r in rows.values()
        ), form.__name__


def test_semdecon_kmeans_indexed_equals_inline(spark, tmp_path):
    """The artifact-backed routed form (quantizer persisted at
    benchmark-freeze time, NO fit in the query path) must score
    identically to the inline form at the same (k, seed) — build and
    probe share _kmeans_route_score, and this pins the persisted ball
    + centroid JSON round trip. Also: a non-artifact path fails
    loudly, and the default n_probe derives from the stored k."""
    import os

    import pytest

    from map_reduce_framework_using_python_spark.operators.similarity import (
        benchmark_max_cosine_kmeans,
        benchmark_max_cosine_kmeans_indexed,
        build_semdecon_kmeans_bench,
    )
    from map_reduce_framework_using_python_spark.sources.io import load_table
    from tests.conftest import SF_SMOKE

    e = load_table(spark, SF_SMOKE, "embeddings")
    corpus = e.filter("vec_id % 16 != 7")
    bench = e.filter("vec_id % 16 == 7")
    path = os.path.join(str(tmp_path), "kb")
    build_semdecon_kmeans_bench(bench, path, k=6)
    inline = sorted(
        map(
            tuple,
            benchmark_max_cosine_kmeans(
                corpus, bench, 300_000, k=6, n_probe=3
            ).collect(),
        )
    )
    indexed = sorted(
        map(
            tuple,
            benchmark_max_cosine_kmeans_indexed(
                corpus, path, 300_000, n_probe=3
            ).collect(),
        )
    )
    assert indexed == inline and len(indexed) > 0
    # default n_probe = ceil(k/2) = 3 at k=6 — same result
    assert sorted(
        map(
            tuple,
            benchmark_max_cosine_kmeans_indexed(corpus, path, 300_000).collect(),
        )
    ) == inline
    with pytest.raises(ValueError, match="semdecon kmeans"):
        benchmark_max_cosine_kmeans_indexed(corpus, str(tmp_path), 300_000)


def test_registry_indexed_kmeans_equals_inline_query(spark):
    """The registry deployment form must emit the inline registry
    form's exact verdict table (fingerprint-cached artifact round
    trip included)."""
    from map_reduce_framework_using_python_spark.plans.core import REGISTRY

    a = sorted(
        map(
            tuple,
            REGISTRY["ns_semantic_decontaminate_kmeans"]
            .fn(spark, SF_SMOKE)
            .collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            REGISTRY["ns_semantic_decontaminate_kmeans_indexed"]
            .fn(spark, SF_SMOKE)
            .collect(),
        )
    )
    assert a == b and len(a) > 0


def test_semdecon_kmeans_lloyd_subset_and_recall(spark):
    """The r14 LLOYD-fit routed form (the oracle-gated variant): same
    subset guarantee as the spark.ml form — candidates score exactly,
    so flags ⊆ the exact form's and non-null max ≤ exact max — with
    recall ≥ 0.9 at the registry τ (the deterministic fit routes at
    least as well as the seeded one on this corpus)."""
    from map_reduce_framework_using_python_spark.plans.core import REGISTRY

    exact = {
        r["vec_id"]: r
        for r in REGISTRY["ns_semantic_decontaminate"].fn(spark, SF_SMOKE).collect()
    }
    km = {
        r["vec_id"]: r
        for r in REGISTRY["ns_semantic_decontaminate_kmeans_lloyd"]
        .fn(spark, SF_SMOKE)
        .collect()
    }
    assert set(km) == set(exact)
    exact_flags = {k for k, r in exact.items() if r["contaminated"]}
    km_flags = {k for k, r in km.items() if r["contaminated"]}
    assert km_flags <= exact_flags
    for k, r in km.items():
        if r["max_cosine"] is not None:
            assert r["max_cosine"] <= exact[k]["max_cosine"] + 1e-9, k
    assert len(km_flags) / len(exact_flags) >= 0.9, (
        len(km_flags),
        len(exact_flags),
    )


def test_kmeans_route_score_kernel_bitwise_equals_fold(spark):
    """The r15 Arrow routing/scoring kernel must be BIT-identical to
    the retired r14 JVM-fold plan (_kmeans_route_score_fold) — the
    routing dots, centroid norms, and candidate cosines replay the
    fold's IEEE evaluation order, and the top-n_probe selection
    replicates array_sort's struct ordering (±0.0 ties and NaNs break
    to the lowest cid). Verified here over sf0.001 for both fit
    flavors; the r15 close record extends it to sf0.01/sf0.1 and the
    19,875-vector 10× probe."""
    import struct

    from pyspark.sql import functions as F

    from map_reduce_framework_using_python_spark.operators import (
        similarity as S,
    )
    from map_reduce_framework_using_python_spark.operators.clustering import (
        kmeans_fit,
    )
    from map_reduce_framework_using_python_spark.plans.core import t

    e = t(spark, SF_SMOKE, "embeddings")
    corpus = e.filter(F.col("vec_id") % 16 != 7)
    bench = e.filter(F.col("vec_id") % 16 == 7)
    assigned, cents_list = kmeans_fit(
        bench, k=6, n_iter=2, vec_col="embedding", id_col="vec_id"
    )
    ball = assigned.select(
        "cluster", F.col("v").alias("bv"), S.l2_norm(F.col("v")).alias("bn")
    )
    cents = list(enumerate(cents_list))

    def canon(df):
        return {
            (r["vec_id"], r["label"]): (
                None
                if r["max_cosine"] is None
                else struct.pack(">d", r["max_cosine"]).hex(),
                bool(r["contaminated"]),
            )
            for r in df.collect()
        }

    args = (corpus, ball, cents, 300_000, 4, "embedding", ["vec_id", "label"])
    new = canon(S._kmeans_route_score(*args))
    old = canon(S._kmeans_route_score_fold(*args))
    assert new == old


def test_kmeans_route_score_kernel_plan_shape(spark):
    """The kernel plan is scan → MapInArrow → project: no joins, no
    exchanges, no BatchEvalPython — the guide-§4.2 shape the exact
    decontamination scorer established in r14."""
    from map_reduce_framework_using_python_spark.plans.core import REGISTRY

    df = REGISTRY["ns_semantic_decontaminate_kmeans_lloyd"].fn(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInArrow" in plan
    for node in ("Join", "Exchange", "BatchEvalPython", "CartesianProduct"):
        assert node not in plan, (node, plan)
