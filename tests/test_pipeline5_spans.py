"""Planted-repeat pins for the variable-length ExactSubstr operator
(plans/pipeline5.exact_substring_spans) — exact boundary recovery,
intra-document repeats, the sub-threshold negative, the short-doc
truncation convention, and the demonstration that a BLOCKED (stride-k)
fingerprint scheme provably misses a misaligned repeat the stride-1
island merge recovers exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from map_reduce_framework_using_python_spark.plans.pipeline5 import (
    exact_substring_spans,
)

K = 12


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _uniq(prefix: str, n: int) -> list[str]:
    return [f"{prefix}{i:03d}" for i in range(n)]


def test_planted_repeat_exact_boundaries(spark):
    """A 20-token passage planted at token 6 of doc 1 and token 11 of
    doc 2 (offset difference 5, NOT a multiple of K) comes back as
    exactly one maximal span per doc with the planted extents."""
    rep = _uniq("rep", 20)
    d1 = _uniq("a", 5) + rep + _uniq("b", 7)
    d2 = _uniq("c", 10) + rep + _uniq("d", 4)
    got = sorted(
        map(
            tuple,
            exact_substring_spans(
                _docs(spark, [(1, " ".join(d1)), (2, " ".join(d2))]), K
            ).collect(),
        )
    )
    assert got == [(1, 6, 25, 20), (2, 11, 30, 20)]


def test_intra_document_repeat_and_subthreshold_negative(spark):
    """The same 15-token phrase twice INSIDE one document yields two
    maximal spans (Lee et al. counts intra-doc sites); an 8-token
    shared phrase (< K) yields nothing."""
    rep = _uniq("rep", 15)
    doc = rep + _uniq("mid", 6) + rep + _uniq("tail", 3)
    got = sorted(
        map(tuple, exact_substring_spans(_docs(spark, [(1, " ".join(doc))]), K).collect())
    )
    assert got == [(1, 1, 15, 15), (1, 22, 36, 15)]

    short = _uniq("s", 8)
    none = exact_substring_spans(
        _docs(
            spark,
            [
                (1, " ".join(short + _uniq("x", 10))),
                (2, " ".join(_uniq("y", 10) + short)),
            ],
        ),
        K,
    ).collect()
    assert none == []


def test_blocked_stride_provably_misses_misaligned_repeat(spark):
    """The cheap alternative — non-overlapping stride-K block digests —
    finds NO shared block when the planted repeat sits at misaligned
    offsets (difference 5 mod K), while the stride-1 island merge
    recovers the span exactly. This is the pin the r9 verdict asked
    for: the blocked fixed-width form provably misses what the
    variable-length form catches."""
    rep = _uniq("rep", 20)
    d1 = _uniq("a", 5) + rep + _uniq("b", 7)   # repeat at 6..25
    d2 = _uniq("c", 10) + rep + _uniq("d", 4)  # repeat at 11..30
    docs = _docs(spark, [(1, " ".join(d1)), (2, " ".join(d2))])

    blocked = (
        docs.select(
            "doc_id",
            F.posexplode(
                F.expr(
                    # non-overlapping K-token blocks: positions 1, K+1, ...
                    f"transform(sequence(1, size(split(text, ' ')) - {K - 1}, {K}),"
                    f" g -> md5(concat_ws(' ', slice(split(text, ' '), g, {K}))))"
                )
            ).alias("i", "h"),
        )
    )
    h1 = {r["h"] for r in blocked.filter("doc_id = 1").collect()}
    h2 = {r["h"] for r in blocked.filter("doc_id = 2").collect()}
    assert h1 & h2 == set()  # the blocked scheme sees nothing

    got = sorted(map(tuple, exact_substring_spans(docs, K).collect()))
    assert got == [(1, 6, 25, 20), (2, 11, 30, 20)]


def test_short_doc_truncation_convention(spark):
    """Documents shorter than K tokens contribute their single
    truncated shingle (the ns_span_dedup convention): two identical
    5-token docs still surface, with the nominal K-wide extent."""
    text = " ".join(_uniq("t", 5))
    got = sorted(
        map(
            tuple,
            exact_substring_spans(_docs(spark, [(1, text), (2, text)]), K).collect(),
        )
    )
    assert got == [(1, 1, K, K), (2, 1, K, K)]


def test_apply_keep_one_semantics(spark):
    """The rewrite keeps the canonical (lexicographically first) site
    verbatim and trims exactly the duplicated tokens everywhere else:
    with docs 1, 2, 3 sharing a 20-token passage, doc 1 is untouched
    and docs 2/3 lose exactly those 20 tokens; a partial (15-token)
    copy in doc 4 trims exactly its shared prefix; the intra-doc twin
    keeps the first occurrence."""
    from map_reduce_framework_using_python_spark.plans.pipeline5 import (
        exact_substring_apply,
    )

    rep = _uniq("rep", 20)
    d1 = _uniq("a", 5) + rep + _uniq("b", 7)
    d2 = _uniq("c", 10) + rep + _uniq("d", 4)
    d3 = rep + _uniq("e", 6)
    d4 = _uniq("f", 3) + rep[:15] + _uniq("g", 5)
    out = {
        r["doc_id"]: (r["clean_text"], r["n_removed"])
        for r in exact_substring_apply(
            _docs(
                spark,
                [(1, " ".join(d1)), (2, " ".join(d2)),
                 (3, " ".join(d3)), (4, " ".join(d4))],
            ),
            K,
        ).collect()
    }
    assert out[1] == (" ".join(d1), 0)  # canonical site untouched
    assert out[2] == (" ".join(_uniq("c", 10) + _uniq("d", 4)), 20)
    assert out[3] == (" ".join(_uniq("e", 6)), 20)
    assert out[4] == (" ".join(_uniq("f", 3) + _uniq("g", 5)), 15)

    # Intra-doc repeat: first occurrence survives, second trims.
    phrase = _uniq("ph", 15)
    doc = phrase + _uniq("mid", 6) + phrase + _uniq("tail", 3)
    got = exact_substring_apply(_docs(spark, [(9, " ".join(doc))]), K).collect()
    assert (got[0]["clean_text"], got[0]["n_removed"]) == (
        " ".join(phrase + _uniq("mid", 6) + _uniq("tail", 3)),
        15,
    )


def test_xxhash64_digest_is_equivalent(spark):
    """The production digest (xxhash64 BIGINT, ~4× less shuffle than
    the 32-char md5 hex the oracles need) must produce identical spans
    and rewrites — on the real sf0.001 corpus for spans, on the
    planted corpus for the apply."""
    from map_reduce_framework_using_python_spark.plans.pipeline5 import (
        exact_substring_apply,
    )
    from tests.conftest import SF_SMOKE

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    a = sorted(map(tuple, exact_substring_spans(docs, K).collect()))
    b = sorted(map(tuple, exact_substring_spans(docs, K, digest="xxhash64").collect()))
    assert a == b and len(a) > 0

    rep = _uniq("rep", 20)
    planted = _docs(
        spark,
        [(1, " ".join(_uniq("a", 5) + rep)), (2, " ".join(rep + _uniq("b", 4)))],
    )
    x = sorted(map(tuple, exact_substring_apply(planted, K).collect()))
    y = sorted(
        map(tuple, exact_substring_apply(planted, K, digest="xxhash64").collect())
    )
    assert x == y


def test_property_spans_and_apply_match_python_reference(spark):
    """Property test (the test_properties.py discipline, inlined here
    with a fixed seed bank instead of hypothesis — each example runs
    real Spark jobs, so the budget is a handful of SEEDED random
    corpora): exact_substring_spans and exact_substring_apply must
    match a brute-force Python reference on random small-alphabet
    corpora (alphabet of 4 tokens at k=3 forces dense shingle
    collisions, including overlapping and self-overlapping repeats —
    the regime hand-planted fixtures undercover)."""
    import random

    from map_reduce_framework_using_python_spark.plans.pipeline5 import (
        exact_substring_apply,
    )

    K3 = 3

    def ref(docs: dict[int, list[str]]):
        sites: dict[str, list[tuple[int, int]]] = {}
        for d, toks in docs.items():
            n = len(toks)
            top = max(n - K3 + 1, 1)
            for g in range(1, top + 1):
                h = " ".join(toks[g - 1 : g - 1 + K3])
                sites.setdefault(h, []).append((d, g))
        dup = {h for h, s in sites.items() if len(s) >= 2}
        spans, removed = [], {d: set() for d in docs}
        for d, toks in docs.items():
            n = len(toks)
            top = max(n - K3 + 1, 1)
            gs = sorted(
                g for g in range(1, top + 1)
                if " ".join(toks[g - 1 : g - 1 + K3]) in dup
            )
            run: list[int] = []
            for g in gs + [None]:
                if run and (g is None or g != run[-1] + 1):
                    spans.append((d, run[0], run[-1] + K3 - 1,
                                  run[-1] + K3 - run[0]))
                    run = []
                if g is not None:
                    run.append(g)
            for g in range(1, top + 1):
                h = " ".join(toks[g - 1 : g - 1 + K3])
                if h in dup and min(sites[h]) != (d, g):
                    removed[d].update(range(g, g + K3))
        applies = {}
        for d, toks in docs.items():
            kept = [t for p, t in enumerate(toks, 1) if p not in removed[d]]
            applies[d] = (" ".join(kept), len(toks) - len(kept))
        return sorted(spans), applies

    for seed in range(6):
        rng = random.Random(seed)
        docs = {
            d: [rng.choice("wxyz") for _ in range(rng.randint(1, 24))]
            for d in range(rng.randint(1, 6))
        }
        frame = _docs(spark, [(d, " ".join(t)) for d, t in docs.items()])
        got_spans = sorted(
            map(tuple, exact_substring_spans(frame, K3).collect())
        )
        got_apply = {
            r["doc_id"]: (r["clean_text"], r["n_removed"])
            for r in exact_substring_apply(frame, K3).collect()
        }
        exp_spans, exp_apply = ref(docs)
        assert got_spans == exp_spans, (seed, got_spans, exp_spans)
        assert got_apply == exp_apply, (seed, got_apply, exp_apply)
