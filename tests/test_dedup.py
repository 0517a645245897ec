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
    connected-components. ``anchor_k=1`` passed explicitly: this pins
    the MINIMAL star bound (the default is 3 as of r8 — see the
    planted-collider test below)."""
    template = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, template) for i in range(2000)]
    rows += [(9001, "completely different text one two three four five"),
             (9002, "completely different text one two three four five")]
    df = _docs(spark, rows)
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in minhash_lsh_pairs(df, max_bucket=64, anchor_k=1).collect()
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


def _collider_for(spark, base_text: str, num_hashes: int = 2):
    """Craft a LOW-Jaccard doc whose full MinHash signature equals
    ``base_text``'s: concatenate the per-hash-function ARGMIN shingles
    (they force each min to tie) plus junk words, retrying junk seeds
    until no bridge/junk shingle hashes below a base minimum. Returns
    (collider_text, jaccard_vs_base). Deterministic: xxhash64 is seeded,
    so the first clean junk seed is always the same."""
    from pyspark.sql import functions as F

    from map_reduce_framework_using_python_spark.operators.dedup import (
        minhash_signatures,
        word_shingles,
    )

    base = spark.createDataFrame([(0, base_text)], ["doc_id", "text"])
    sh = base.select(F.explode(word_shingles("text", 3)).alias("shingle"))
    argmins = [
        sh.select(F.expr(f"min_by(shingle, xxhash64({i}, shingle))")).head()[0]
        for i in range(num_hashes)
    ]
    want = tuple(
        minhash_signatures(base, num_hashes=num_hashes).head()[f"h{i}"]
        for i in range(num_hashes)
    )
    for seed in range(40):
        # Seed-dependent separators BETWEEN the argmin 3-grams too, so
        # every bridge shingle varies per retry (a fixed bridge hashing
        # below a base minimum would otherwise fail all seeds).
        text = f" zz{seed}s ".join(argmins) + " " + " ".join(
            f"zz{seed}x{j}" for j in range(4)
        )
        cand = spark.createDataFrame([(0, text)], ["doc_id", "text"])
        got = tuple(
            minhash_signatures(cand, num_hashes=num_hashes).head()[f"h{i}"]
            for i in range(num_hashes)
        )
        if got == want:
            both = spark.createDataFrame(
                [(0, base_text), (1, text)], ["doc_id", "text"]
            )
            jac = (
                ngram_jaccard_pairs(both, threshold=0.0).head()["jaccard"]
                if ngram_jaccard_pairs(both, threshold=0.0).count()
                else 0.0
            )
            return text, jac
    raise AssertionError("no clean collider found in 40 junk seeds")


def test_anchor_star_collider_severs_at_k1_and_k3_rescues(spark):
    """The documented anchor-star recall cliff, planted (r8: VERDICT
    item 6). A hot bucket whose MIN-ID member is a low-similarity
    collider (signature-equal to the cluster — small r makes this real
    on boilerplate corpora — but exact-Jaccard far below threshold):

    - ``anchor_k=1``: every star edge routes through the collider,
      every one fails verification, the WHOLE 20-doc duplicate cluster
      is severed — 0 of its 190 true pairs survive.
    - ``anchor_k=3``: anchors 2 and 3 are genuine members; their star
      edges verify, the cluster reconnects (37 spanning pairs, full
      single-component connectivity for downstream dup-clusters).

    bands=1 makes the poisoned bucket the ONLY meeting place — the
    adversarial worst case; with more bands a clean bucket can rescue a
    pair, but nothing guarantees one. This measurement is why the
    operator default is now ``anchor_k=3``."""
    base_text = " ".join(f"w{i:03d}" for i in range(120))
    collider, jac = _collider_for(spark, base_text, num_hashes=2)
    assert jac < 0.1  # genuinely low-similarity
    rows = [(0, collider)] + [(1000 + i, base_text) for i in range(20)]
    df = _docs(spark, rows)

    def pairs(anchor_k):
        return {
            (r["doc_a"], r["doc_b"])
            for r in minhash_lsh_pairs(
                df, n=3, num_hashes=2, bands=1, threshold=0.5,
                max_bucket=8, anchor_k=anchor_k,
            ).collect()
        }

    assert pairs(1) == set()  # the cliff: cluster fully severed
    k3 = pairs(3)
    expect = {(1000, 1000 + i) for i in range(1, 20)} | {
        (1001, 1000 + i) for i in range(2, 20)
    }
    assert k3 == expect  # genuine anchors reconnect every member
