"""Property-based tests (SURVEY.md §5.4, hypothesis): partitioning
invariants, aggregation linearity, and join-cardinality bounds over
randomized small inputs. Few examples, tiny frames — each example runs
real Spark jobs."""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from map_reduce_framework_using_python_spark.mr.job import MRJob, mr_keyby

KEYS = st.sampled_from(["a", "b", "c", "9", "10", "k-long", ""])
LINES = st.lists(
    st.tuples(KEYS, st.integers(0, 99)).map(lambda kv: f"{kv[0]},{kv[1]}"),
    min_size=0,
    max_size=30,
)

IDENTITY = "import sys\nfor line in sys.stdin:\n    sys.stdout.write(line)\n"

prop = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


@prop
@given(lines=LINES)
def test_partition_union_equals_input(spark, lines):
    """Union of output partitions == input multiset, and every key lives
    in exactly one partition (the reference's WRITE/shuffle invariants,
    client_v1.py:102-109 + worker_v1.py:133)."""
    job = MRJob(spark, IDENTITY, IDENTITY, n_partitions=4)
    parts = job.run(spark.sparkContext.parallelize(lines, 3)).glom().collect()
    assert len(parts) == 4
    flat = [l for p in parts for l in p]
    assert Counter(flat) == Counter(lines)
    key_home: dict[str, int] = {}
    for i, p in enumerate(parts):
        for line in p:
            k = mr_keyby(line)
            assert key_home.setdefault(k, i) == i


@prop
@given(
    a=st.lists(st.tuples(st.sampled_from("xyz"), st.floats(0, 100)), max_size=25),
    b=st.lists(st.tuples(st.sampled_from("xyz"), st.floats(0, 100)), max_size=25),
)
def test_agg_linearity(spark, a, b):
    """sum(A ∪ B) == sum(A) + sum(B) per group (re-aggregability — what
    makes partial/final hash-agg and salted_agg correct)."""

    def sums(rows):
        if not rows:
            return {}
        df = spark.createDataFrame(rows, ["k", "v"])
        return {
            r["k"]: r["s"]
            for r in df.groupBy("k").agg(F.sum("v").alias("s")).collect()
        }

    sa, sb, su = sums(a), sums(b), sums(a + b)
    for k in set(sa) | set(sb):
        assert abs(sa.get(k, 0.0) + sb.get(k, 0.0) - su[k]) < 1e-6


@prop
@given(
    a=st.lists(st.integers(0, 5), min_size=0, max_size=20),
    b=st.lists(st.integers(0, 5), min_size=0, max_size=20),
)
def test_join_cardinality(spark, a, b):
    """|A ⋈_k B| == Σ_k cnt_A(k)·cnt_B(k), and semi ≤ |A|, anti ==
    |A| − |semi matches|."""
    ca, cb = Counter(a), Counter(b)
    expected = sum(ca[k] * cb[k] for k in ca)
    da = spark.createDataFrame([(k,) for k in a], ["k"]) if a else None
    db = spark.createDataFrame([(k,) for k in b], ["k"]) if b else None
    if da is None or db is None:
        return
    assert da.join(db, "k").count() == expected
    n_semi = da.join(db, "k", "left_semi").count()
    n_anti = da.join(db, "k", "left_anti").count()
    assert n_semi == sum(c for k, c in ca.items() if k in cb)
    assert n_semi + n_anti == len(a)


TEXTS = st.lists(
    st.text(alphabet="ab cd", min_size=0, max_size=40),
    min_size=1,
    max_size=8,
)


@prop
@given(texts=TEXTS)
def test_hash_embed_invariants(spark, texts):
    """Feature-hashing embedder properties on arbitrary text: emitted
    vectors are unit-L2 (up to the 1e-6 quantization grid) whenever the
    signed votes don't fully cancel, components lie in [-1, 1], and the
    result is invariant under repartitioning (hash-derived, no
    partition-order dependence)."""
    from map_reduce_framework_using_python_spark.plans.core import REGISTRY

    fn = REGISTRY["ns_hash_embed"].fn
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
        )
        df.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
        rows = fn(spark, d).collect()
        ecols = [f"e{i}" for i in range(16)]
        for r in rows:
            comps = [r[c] for c in ecols]
            assert all(-1.0 <= c <= 1.0 for c in comps)
            nrm2 = sum(c * c for c in comps)
            # zero vector only when every bucket's votes cancelled
            assert nrm2 == 0.0 or abs(nrm2 - 1.0) < 1e-4
        again = {
            r["doc_id"]: tuple(r[c] for c in ecols)
            for r in fn(spark, d).collect()
        }
        spread = spark.read.parquet(os.path.join(d, "documents.parquet")).repartition(7)
        spread.write.mode("overwrite").parquet(os.path.join(d, "documents2.parquet"))
        os.rename(os.path.join(d, "documents.parquet"), os.path.join(d, "gone"))
        os.rename(os.path.join(d, "documents2.parquet"), os.path.join(d, "documents.parquet"))
        respread = {
            r["doc_id"]: tuple(r[c] for c in ecols)
            for r in fn(spark, d).collect()
        }
        assert respread == again


_DOC_WORDS = st.sampled_from(
    ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]
)
_DOCS = st.lists(
    st.lists(_DOC_WORDS, min_size=3, max_size=8).map(" ".join),
    min_size=2,
    max_size=12,
)


@prop
@given(texts=_DOCS, cap=st.sampled_from([2, 4, 1_000_000]))
def test_minhash_lsh_subset_of_exact_at_any_cap(spark, texts, cap):
    """For ANY max_bucket (tiny caps force the anchor-star path on a
    tiny word alphabet that collides constantly), every emitted pair
    must be a true exact-Jaccard pair at the threshold — the
    verification step makes false positives impossible regardless of
    how candidates were generated — and the anchor-star short-circuit
    may only reduce recall, never invent pairs."""
    from map_reduce_framework_using_python_spark.operators.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
    )

    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, n=2, threshold=0.5).collect()
    }
    lsh = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in minhash_lsh_pairs(
            df, n=2, num_hashes=16, bands=8, threshold=0.5, max_bucket=cap
        ).collect()
    }
    assert set(lsh) <= set(exact)
    for pair, j in lsh.items():
        assert abs(j - exact[pair]) < 1e-9
    # identical-text pairs always collide on every band; with an
    # uncapped run they must all be recovered (banding prob = 1)
    if cap == 1_000_000:
        by_text: dict[str, list[int]] = {}
        for i, t in enumerate(texts):
            by_text.setdefault(t, []).append(i)
        for ids in by_text.values():
            for x in ids:
                for y in ids:
                    if x < y:
                        assert (x, y) in lsh


def test_range_join_exact_buckets_beyond_double_precision(spark):
    """r7 review: integral keys above 2^53 must bucket exactly — the
    double floor(key/width) path can shift a bucket and silently drop
    a within-tolerance pair. Plant epoch-nanosecond-scale keys 999
    apart (tolerance 1000) near a bucket edge."""
    from map_reduce_framework_using_python_spark.operators.rangejoin import (
        range_join_candidates,
    )
    from pyspark.sql import functions as F

    base = 1_700_000_000_000_000_000  # ~2^60.6, ulp = 256
    rows_l = [(1, base + 120), (2, base + 5_000_000)]
    rows_r = [(10, base + 120 + 999), (20, base + 999_999_999)]
    left = spark.createDataFrame(rows_l, "lid INT, lts BIGINT")
    right = spark.createDataFrame(rows_r, "rid INT, rts BIGINT")
    got = {
        (r["lid"], r["rid"])
        for r in range_join_candidates(
            left, right, F.col("lts"), F.col("rts"), tolerance=1000
        ).collect()
    }
    assert got == {(1, 10)}  # the 999-apart pair survives; nothing else
