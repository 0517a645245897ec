"""Semantic pins for the round-4 pipeline operators (pipeline4.py):
BM25 vs a brute-force Python reference, phrase search vs a list scan,
bigram rarity vs exact integer recomputation, and sequence-packing
invariants (gap-free global layout). The DuckDB oracle gate covers
engine parity; these pin the SEMANTICS against independent references.
"""

from __future__ import annotations

import math

import pytest

from map_reduce_framework_using_python_spark.plans import REGISTRY
from tests.conftest import SF_SMOKE

CTX = 2048
K1, B = 1.2, 0.75
TERMS = ("spark", "window", "join")


@pytest.fixture(scope="module")
def corpus(spark):
    rows = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    return {r.doc_id: r.text.split(" ") for r in rows}


def test_bm25_matches_bruteforce(spark, corpus):
    n = len(corpus)
    avgdl = sum(len(w) for w in corpus.values()) / n
    df = {t: sum(1 for w in corpus.values() if t in w) for t in TERMS}
    scores = {}
    for doc_id, words in corpus.items():
        s = 0.0
        for t in TERMS:
            tf = words.count(t)
            if tf == 0:
                continue
            idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * (tf * (K1 + 1)) / (tf + K1 * (1 - B + B * len(words) / avgdl))
        scores[doc_id] = s
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = REGISTRY["ns_bm25_topk"].fn(spark, SF_SMOKE).collect()
    assert [r.doc_id for r in got] == [d for d, _ in want]
    for r, (_, s) in zip(got, want):
        assert abs(r.bm25 - s) < 5e-5  # 4-dp rounding + float assoc


def test_phrase_search_matches_scan(spark, corpus):
    want = {}
    for doc_id, words in corpus.items():
        hits = [
            i + 1
            for i in range(len(words) - 1)
            if words[i] == "hash" and words[i + 1] == "join"
        ]
        if hits:
            want[doc_id] = (len(hits), hits[0])
    got = {
        r.doc_id: (r.n_hits, r.first_pos)
        for r in REGISTRY["ns_phrase_search"].fn(spark, SF_SMOKE).collect()
    }
    assert got == want


def test_bigram_rarity_exact_integers(spark, corpus):
    from collections import Counter

    freq: Counter[tuple[str, str]] = Counter()
    per_doc: dict[int, list[tuple[str, str]]] = {}
    for doc_id, words in corpus.items():
        bgs = list(zip(words, words[1:]))
        per_doc[doc_id] = bgs
        freq.update(bgs)
    got = REGISTRY["ns_bigram_rarity"].fn(spark, SF_SMOKE).collect()
    assert len(got) == len(per_doc)
    for r in got:
        bgs = per_doc[r.doc_id]
        assert r.n_bigrams == len(bgs)
        assert r.sum_freq == sum(freq[b] for b in bgs)


def test_sequence_packing_gap_free(spark, corpus):
    rows = REGISTRY["ns_sequence_packing"].fn(spark, SF_SMOKE).collect()
    assert len(rows) == len(corpus)
    total = sum(len(w) for w in corpus.values())
    by_offset = sorted(rows, key=lambda r: r.offset_start)
    # Gap-free concatenation: offsets tile [0, total) exactly.
    assert by_offset[0].offset_start == 0
    pos = 0
    for r in by_offset:
        assert r.offset_start == pos
        assert r.n_tokens == len(corpus[r.doc_id])
        assert r.context_id == pos // CTX
        last_token = pos + r.n_tokens - 1
        assert r.n_boundaries_crossed == last_token // CTX - pos // CTX
        pos += r.n_tokens
    assert pos == total
