"""Dedup operator tests: exact semantics on crafted frames, MinHash-LSH
recall against the exact-Jaccard ground truth, SimHash sanity."""

from __future__ import annotations

from map_reduce_framework_using_python_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from map_reduce_framework_using_python_spark.sources.io import load_table
from tests.conftest import SF_SMOKE


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup_keeps_min_id(spark):
    df = _docs(
        spark,
        [(3, "same text"), (1, "same text"), (2, "other text"), (7, "same text")],
    )
    out = {r["keeper_id"]: r["n_copies"] for r in exact_dedup(df).collect()}
    assert out == {1: 3, 2: 1}


def test_ngram_jaccard_identical_docs(spark):
    df = _docs(
        spark,
        [
            (1, "a b c d e f g h"),
            (2, "a b c d e f g h"),       # identical → jaccard 1.0
            (3, "z y x w v u t s"),       # disjoint
        ],
    )
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in ngram_jaccard_pairs(df).collect()}
    assert pairs == {(1, 2): 1.0}


def test_minhash_lsh_matches_exact_on_documents(spark):
    """On the synthetic corpus the 32×2 banding should recover every
    exact pair at the 0.6 threshold (P(candidate) ≈ 1-(1-0.36)^32)."""
    docs = load_table(spark, SF_SMOKE, "documents")
    exact = {(r["doc_a"], r["doc_b"]) for r in ngram_jaccard_pairs(docs).collect()}
    lsh = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(docs, num_hashes=64, bands=32).collect()
    }
    assert lsh <= exact  # verification step guarantees no false positives
    recall = len(lsh & exact) / max(len(exact), 1)
    assert recall >= 0.9, f"LSH recall {recall} ({len(lsh)}/{len(exact)})"


def test_ml_backend_matches_custom(spark):
    """spark.ml MinHashLSH backend and the hand-rolled sketch agree with
    the exact ground truth (cross-implementation check)."""
    from map_reduce_framework_using_python_spark.operators.dedup_ml import (
        minhash_lsh_pairs_ml,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    exact = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in ngram_jaccard_pairs(docs).collect()}
    ml = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in minhash_lsh_pairs_ml(docs).collect()}
    assert set(ml) <= set(exact)
    assert len(set(ml) & set(exact)) / max(len(exact), 1) >= 0.9
    for k, j in ml.items():
        assert abs(j - exact[k]) < 1e-9  # same exact-verification math


def test_minhash_hot_bucket_short_circuits_to_anchor_star(spark):
    """The 100 TB boilerplate failure mode: a bucket holding far more
    docs than ``max_bucket`` (here 2000 identical template docs vs a
    cap of 64) must complete with O(|bucket|) candidates — star edges
    to the min-id anchor — never materializing the bucket's id list or
    its O(n²) pairs. The star still exact-verifies (jaccard 1.0 here)
    and still spans the whole duplicate cluster for downstream
    connected-components."""
    template = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, template) for i in range(2000)]
    rows += [(9001, "completely different text one two three four five"),
             (9002, "completely different text one two three four five")]
    df = _docs(spark, rows)
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in minhash_lsh_pairs(df, max_bucket=64).collect()
    }
    # hot cluster: exactly the anchor star (0, i) for every member,
    # all verified at jaccard 1.0
    star = {(0, i) for i in range(1, 2000)}
    small_pair = {(9001, 9002)}
    assert set(pairs) == star | small_pair
    assert all(abs(j - 1.0) < 1e-9 for j in pairs.values())


def test_minhash_hot_bucket_k_anchor_star(spark):
    """``anchor_k=3`` on the same hot bucket emits star edges from the
    THREE min-id anchors — O(K·|bucket|) candidates — so a single
    non-duplicate anchor can no longer sever the cluster. On an
    all-identical bucket the result is exactly the union of the three
    stars (anchor pairs included once, doc_a < doc_b)."""
    template = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, template) for i in range(500)]
    df = _docs(spark, rows)
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(df, max_bucket=64, anchor_k=3).collect()
    }
    expect = {(a, i) for a in (0, 1, 2) for i in range(500) if a < i}
    assert pairs == expect


def test_minhash_default_cap_leaves_small_corpus_untouched(spark):
    """At the default max_bucket=1024 the synthetic corpus has no
    oversize bucket, so the bounded operator emits exactly what an
    uncapped run emits (recall vs exact stays pinned by
    test_minhash_lsh_matches_exact_on_documents)."""
    docs = load_table(spark, SF_SMOKE, "documents")
    capped = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in minhash_lsh_pairs(docs, num_hashes=64, bands=32).collect()
    }
    uncapped = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in minhash_lsh_pairs(
            docs, num_hashes=64, bands=32, max_bucket=1_000_000_000
        ).collect()
    }
    assert capped == uncapped


def test_simhash_identical_docs_distance_zero(spark):
    df = _docs(
        spark,
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon zeta"),
            (3, "totally different words here now ok"),
        ],
    )
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in simhash_pairs(df).collect()}
    assert pairs.get((1, 2)) == 0
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_simhash_rejects_radius_beyond_pigeonhole_bound(spark):
    """r7 dedup review: 4-chunk blocking is only complete to Hamming 3;
    larger radii must raise instead of silently losing recall."""
    import pytest

    from map_reduce_framework_using_python_spark.operators.dedup import simhash_pairs
    from map_reduce_framework_using_python_spark.sources.io import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents").limit(5)
    with pytest.raises(ValueError, match="pigeonhole"):
        simhash_pairs(docs, max_hamming=4)


def test_word_shingles_quotes_identifiers(spark):
    """r7 dedup review: a column name needing quoting must resolve in
    the generated shingle SQL (the assign_clusters convention)."""
    from pyspark.sql import functions as F

    from map_reduce_framework_using_python_spark.operators.dedup import word_shingles

    df = spark.createDataFrame([("a b c d",)], "`doc text` string")
    got = df.select(word_shingles("doc text", 2).alias("sh")).head()["sh"]
    assert got == ["a b", "b c", "c d"]
