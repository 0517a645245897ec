"""Pins for the part-7 pipeline ops (plans/pipeline7.py).

``ns_dsir_weights`` / ``ns_ccnet_buckets`` get their exact-equivalence
coverage from the oracle-parity gate (tests/test_oracle_parity.py);
here we pin the SEMANTIC properties the oracles can't express — the
importance weights actually point at the target slice, the terciles
actually stratify by score — plus the full reference-equivalence pin
for ``ns_bpe_train``, whose iterative argmax loop has no SQL twin.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from map_reduce_framework_using_python_spark.plans import REGISTRY
from map_reduce_framework_using_python_spark.plans.pipeline7 import bpe_train
from tests.conftest import SF_SMOKE


# ---------------------------------------------------------------- BPE


def _reference_bpe(word_counts: dict[str, int], rounds: int):
    """Pure-Python Sennrich et al. BPE: the single-node ground truth
    the distributed loop must reproduce exactly, tie-break included
    (max pair count, then lexicographically smallest `left‖SEP‖right`)."""
    vocab = {tuple(w): c for w, c in word_counts.items()}
    merges = []
    for r in range(1, rounds + 1):
        pc: dict[tuple[str, str], int] = {}
        for syms, c in vocab.items():
            for x, y in zip(syms, syms[1:]):
                pc[(x, y)] = pc.get((x, y), 0) + c
        if not pc:
            break
        (a, b), c = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0] + "\x01" + kv[0][1])
        )
        merges.append((r, a, b, c))
        new: dict[tuple[str, ...], int] = {}
        for syms, cnt in vocab.items():
            out: list[str] = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            tk = tuple(out)
            new[tk] = new.get(tk, 0) + cnt
        vocab = new
    return merges


def test_bpe_train_matches_reference(spark, duck):
    rows = duck.sql(
        "SELECT w, count(*) FROM (SELECT unnest(string_split_regex(trim(text),"
        " ' +')) AS w FROM documents) GROUP BY 1"
    ).fetchall()
    expected = _reference_bpe(dict(rows), rounds=8)
    got = [
        (r["rank"], r["left"], r["right"], r["pair_count"])
        for r in REGISTRY["ns_bpe_train"].fn(spark, SF_SMOKE).collect()
    ]
    assert got == expected


def test_bpe_merge_fold_is_greedy_left_to_right(spark):
    """The fold must not re-merge across a just-merged token: with the
    merge (a,a), 'aaa' → [aa, a] (NOT [a, aa] and NOT [aaa]), and
    'aaaa' → [aa, aa] — the standard greedy BPE contract."""
    words = spark.createDataFrame(
        [("aaa", 5), ("aaaa", 1)], "w string, cnt bigint"
    )
    merges = bpe_train(words, rounds=1)
    # pair (a,a) appears 2× in 'aaa' (weight 5) and 3× in 'aaaa' → 13
    assert merges == [(1, "a", "a", 13)]
    # second round merges (aa, a) from 'aaa' (5) — 'aaaa' is [aa, aa],
    # contributing to (aa, aa) with count 1 only
    merges2 = bpe_train(words, rounds=2)
    assert merges2[1] == (2, "aa", "a", 5)


def test_bpe_tie_break_is_lexicographic(spark):
    words = spark.createDataFrame(
        [("zy", 3), ("ab", 3)], "w string, cnt bigint"
    )
    merges = bpe_train(words, rounds=1)
    assert merges == [(1, "a", "b", 3)]


# --------------------------------------------------------------- DSIR


def test_dsir_weights_point_at_the_target_slice(spark):
    """The whole point of the importance weight: documents FROM the
    target distribution (lang='en') must score higher on average than
    documents off it."""
    w = REGISTRY["ns_dsir_weights"].fn(spark, SF_SMOKE)
    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select("doc_id", "lang")
    per_lang = (
        w.join(d, "doc_id")
        .withColumn("is_en", F.col("lang") == "en")
        .groupBy("is_en")
        .agg(F.avg(F.col("log_weight") / F.col("n_tokens")).alias("mean_lw"))
        .collect()
    )
    means = {r["is_en"]: r["mean_lw"] for r in per_lang}
    assert means[True] > means[False]


def test_dsir_covers_every_document(spark):
    w = REGISTRY["ns_dsir_weights"].fn(spark, SF_SMOKE)
    n_docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").count()
    assert w.count() == n_docs


# -------------------------------------------------------- CCNet buckets


def test_ccnet_buckets_stratify_and_balance(spark):
    rows = REGISTRY["ns_ccnet_buckets"].fn(spark, SF_SMOKE).collect()
    by_lang: dict[str, dict[str, tuple[int, float]]] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], {})[r["bucket"]] = (r["n_docs"], r["mean_logp"])
    assert by_lang  # at least one language scored
    for lang, buckets in by_lang.items():
        assert set(buckets) == {"head", "middle", "tail"}, lang
        sizes = [buckets[b][0] for b in ("head", "middle", "tail")]
        # NTILE(3): bucket sizes differ by at most one, larger first
        assert max(sizes) - min(sizes) <= 1, (lang, sizes)
        assert sizes == sorted(sizes, reverse=True), (lang, sizes)
        # terciles are ordered by the score they stratify
        assert buckets["head"][1] >= buckets["middle"][1] >= buckets["tail"][1], lang


# ---------------------------------------------------------- edge cases


def test_bpe_train_empty_vocabulary(spark):
    words = spark.createDataFrame([], "w string, cnt bigint")
    assert bpe_train(words, rounds=3) == []


def test_bpe_train_single_char_words_only(spark):
    # no adjacent pairs anywhere → the loop must stop, not spin
    words = spark.createDataFrame([("a", 9), ("b", 4)], "w string, cnt bigint")
    assert bpe_train(words, rounds=3) == []


def test_bpe_train_stops_when_pairs_run_out(spark):
    # 'ab' fully merges in one round; round 2 has no pair left
    words = spark.createDataFrame([("ab", 7)], "w string, cnt bigint")
    assert bpe_train(words, rounds=5) == [(1, "a", "b", 7)]


def test_dsir_resample_prefers_target_like_docs(spark):
    """Gumbel top-k ∝ exp(log_weight): the resampled set's mean weight
    must exceed the corpus mean (noise can pick low-weight docs, but
    k=25 in aggregate has to lean target-ward)."""
    w = REGISTRY["ns_dsir_weights"].fn(spark, SF_SMOKE)
    s = REGISTRY["ns_dsir_resample"].fn(spark, SF_SMOKE)
    corpus_mean = w.agg(F.avg("log_weight")).first()[0]
    sample_mean = s.agg(F.avg("log_weight")).first()[0]
    assert sample_mean > corpus_mean
    assert s.count() == 25
    # without replacement: all distinct
    assert s.select("doc_id").distinct().count() == 25


# ----------------------------------------------- property: BPE ≡ reference

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_WORDS = st.lists(
    st.tuples(
        st.text(alphabet="abcd", min_size=1, max_size=6),
        st.integers(min_value=1, max_value=9),
    ),
    min_size=1,
    max_size=12,
)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(entries=_WORDS)
def test_bpe_train_matches_reference_on_random_vocabs(spark, entries):
    """Distributed BPE == single-node reference on arbitrary small
    vocabularies (a tiny alphabet forces heavy pair collisions and
    ties, stressing the tie-break and the greedy fold)."""
    counts: dict[str, int] = {}
    for w, c in entries:
        counts[w] = counts.get(w, 0) + c
    words = spark.createDataFrame(list(counts.items()), "w string, cnt bigint")
    assert bpe_train(words, rounds=4) == _reference_bpe(counts, rounds=4)


def test_bpe_train_reproduces_the_frozen_merge_table_prefix(spark, duck):
    """functions/bpe.py's frozen MERGES artifact was learned offline
    with this same procedure on the sf0.001 corpus — the distributed
    trainer must reproduce its prefix exactly, tying the tokenizer-
    APPLICATION op (ns_token_count_bpe) to the tokenizer-TRAINING op."""
    from map_reduce_framework_using_python_spark.functions.bpe import MERGES

    got = [
        (r["left"], r["right"])
        for r in REGISTRY["ns_bpe_train"].fn(spark, SF_SMOKE).collect()
    ]
    assert got == MERGES[: len(got)]


def test_temperature_mixture_flattens_without_inverting(spark):
    """τ = 0.5 must BOOST minority sources and DOWNWEIGHT majority ones
    relative to natural share — but never invert the order (p_target is
    monotone in share), and rates are in (0, 1] with the max at 1."""
    rows = REGISTRY["ns_temperature_mixture"].fn(spark, SF_SMOKE).collect()
    assert len(rows) >= 2
    by_share = sorted(rows, key=lambda r: r["share"])
    p = [r["p_target"] for r in by_share]
    assert p == sorted(p)  # monotone: bigger share → bigger target p
    for r in rows:
        assert 0 < r["sample_rate"] <= 1.0
    assert max(r["sample_rate"] for r in rows) == 1.0
    # flattening: the smallest source's target share exceeds its natural
    # share; the largest source's is below it
    assert by_share[0]["p_target"] > by_share[0]["share"]
    assert by_share[-1]["p_target"] < by_share[-1]["share"]


def test_corpus_drift_psi_is_nonnegative_per_source(spark):
    """Every PSI term (p−q)·ln(p/q) is ≥ 0, so per-source PSI must be
    ≥ 0 (within one 1e-6 grid step for the quantized sum) and cover
    every source."""
    rows = REGISTRY["ns_corpus_drift"].fn(spark, SF_SMOKE).collect()
    n_sources = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("source")
        .distinct()
        .count()
    )
    assert len(rows) == n_sources
    for r in rows:
        assert r["psi"] >= -1e-6, r


def test_ccnet_scaled_matches_exact_terciles_up_to_ties(spark):
    """The histogram-thresholded production form must reproduce the
    exact NTILE tercile sizes up to boundary ties: per (lang, bucket),
    sizes differ by at most the multiplicity of the tercile-boundary
    score values (distinct scores → exact agreement), because threshold
    assignment keeps boundary tie classes whole where NTILE splits
    them by doc_id."""
    exact = {
        (r["lang"], r["bucket"]): r["n_docs"]
        for r in REGISTRY["ns_ccnet_buckets"].fn(spark, SF_SMOKE).collect()
    }
    approx = {
        (r["lang"], r["bucket"]): r["n_docs"]
        for r in REGISTRY["ns_ccnet_buckets_scaled"].fn(spark, SF_SMOKE).collect()
    }
    assert set(a for a, _ in exact) == set(a for a, _ in approx)
    for lang in {k[0] for k in exact}:
        n_exact = sum(v for k, v in exact.items() if k[0] == lang)
        n_approx = sum(v for k, v in approx.items() if k[0] == lang)
        assert n_exact == n_approx, lang  # same docs, just re-bucketed
        for b in ("head", "middle", "tail"):
            # ±2: at most the two boundary tie classes can migrate
            assert abs(exact[(lang, b)] - approx.get((lang, b), 0)) <= 2, (lang, b)


def test_bpe_batched_equals_sequential_on_disjoint_corpus(spark):
    """On a vocabulary whose top pairs are pairwise symbol-disjoint and
    where no merge creates a higher-count pair, the batched trainer
    must equal the sequential one exactly — ranks, pairs, counts (the
    exactness condition bpe_train_batched documents)."""
    from map_reduce_framework_using_python_spark.plans.pipeline7 import (
        bpe_train_batched,
    )

    # Each top pair is a complete 2-char word: merging one produces a
    # single-symbol word, so no merge can create a new pair at all.
    rows = [("ab", 40), ("cd", 30), ("ef", 20), ("gh", 10)]
    words = spark.createDataFrame(rows, "w string, cnt long")
    seq = bpe_train(words, rounds=4)
    bat = bpe_train_batched(words, rounds=4, batch_size=4)
    assert bat == seq
    assert [m[1] + m[2] for m in bat] == ["ab", "cd", "ef", "gh"]


def test_bpe_batched_skips_conflicting_pairs_within_a_round(spark):
    """Overlapping pairs must not co-apply in one round: with pairs
    (a,b):50 (b,q):50 (b,c):30 (c,q):30, the round accepts (a,b),
    skips the two b-sharing pairs, and accepts the disjoint (c,q) —
    and each accepted pair's recorded count is its true pre-round
    count (disjoint ⇒ invariant under the co-applied merge)."""
    from map_reduce_framework_using_python_spark.plans.pipeline7 import (
        bpe_train_batched,
    )

    rows = [("abq", 50), ("bcq", 30)]
    words = spark.createDataFrame(rows, "w string, cnt long")
    bat = bpe_train_batched(words, rounds=2, batch_size=4)
    assert bat[0] == (1, "a", "b", 50)
    assert bat[1] == (2, "c", "q", 30)


def test_bpe_synthetic_curve_corpus_does_not_saturate(spark):
    """The r9 bench-curve corpus (tools/bpe_curve.synthetic_words):
    deterministic (pure JVM md5 expressions — identical across runs),
    all-distinct words of 16–32 chars over a 16-letter alphabet, and
    deep enough that merge rounds do NOT exhaust — the property the 10×
    document corpus lacks (saturates at ~88 merges), which is why the
    r8 production-merge-count curve had to extrapolate."""
    import sys as _sys

    _sys.path.insert(0, "/root/repo/tools")
    from bpe_curve import synthetic_words

    from map_reduce_framework_using_python_spark.plans.pipeline7 import (
        bpe_train_batched,
    )

    w = synthetic_words(spark, 200)
    rows = sorted((r["w"], r["cnt"]) for r in w.collect())
    rows2 = sorted((r["w"], r["cnt"]) for r in synthetic_words(spark, 200).collect())
    assert rows == rows2  # deterministic
    assert len({x for x, _ in rows}) == 200  # all distinct
    assert all(16 <= len(x) <= 32 for x, _ in rows)
    merges = bpe_train_batched(w, rounds=16, batch_size=4)
    assert len(merges) == 16  # no saturation at the test depth
    assert [m[0] for m in merges] == list(range(1, 17))


def test_bpe_batched_registry_query_contract(spark):
    """The batched table's guaranteed invariants on the real corpus:
    8 merges ranked 1..8; the first merge equals the sequential
    argmax; within the single batch_size=8 round (the r9 default — the
    non-saturating curve moved it from 4, see bpe_train_batched) the
    accepted pairs are pairwise compatible (disjoint symbols + merged
    tokens) with non-increasing counts. (Full equality with the
    sequential table is NOT guaranteed — a mid-round merge can create
    a pair the sequential trainer would interleave; pinned exactly on
    the no-new-pair corpus above.)"""
    seq = [tuple(r) for r in REGISTRY["ns_bpe_train"].fn(spark, SF_SMOKE).collect()]
    bat = [
        tuple(r)
        for r in REGISTRY["ns_bpe_train_batched"].fn(spark, SF_SMOKE).collect()
    ]
    assert [m[0] for m in bat] == list(range(1, 9))
    assert bat[0] == seq[0]  # round-leading argmax is exact
    # Round boundaries aren't observable from the table (conflict skips
    # can close a round early, and a new round re-sorts), so the
    # structural pin is boundary-free: every merge rule must be
    # producible (symbols are single chars or earlier merges — the
    # well-formedness that makes the table APPLICABLE) and no merged
    # token repeats. Per-round compatibility/count order is pinned with
    # explicit boundaries in the two bpe_train_batched unit tests above.
    producible: set[str] = set()
    for _rank, a, b, merged, _c in bat:
        for sym in (a, b):
            assert len(sym) == 1 or sym in producible, (a, b, sym)
        assert merged == a + b and merged not in producible
        producible.add(merged)
