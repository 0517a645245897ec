"""Semantic pins for the exact substring-span dedup pass
(pipeline5.py): the registered query is recomputed brute-force in
Python over the same corpus — every 8-token window, exact cross-doc
occurrence sets — so the Spark digest/join pipeline is checked against
an independent reference, not just the DuckDB oracle restatement.
"""

from __future__ import annotations

from collections import Counter

from map_reduce_framework_using_python_spark.plans import REGISTRY
from tests.conftest import SF_SMOKE

W = 8


def _spans(words):
    n = max(len(words) - (W - 1), 1)
    return [" ".join(words[i : i + W]) for i in range(n)]


def test_span_dedup_matches_bruteforce(spark):
    rows = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    corpus = {r.doc_id: r.text.split(" ") for r in rows}
    span_docs: dict[str, set[int]] = {}
    for doc_id, words in corpus.items():
        for s in _spans(words):
            span_docs.setdefault(s, set()).add(doc_id)
    want = {}
    for doc_id, words in corpus.items():
        sp = _spans(words)
        dup = sum(1 for s in sp if len(span_docs[s]) >= 2)
        want[doc_id] = (len(sp), dup)

    got = {
        r.doc_id: (r.n_spans, r.n_dup_spans)
        for r in REGISTRY["ns_span_dedup"].fn(spark, SF_SMOKE).collect()
    }
    assert got == want
    # The statistic is non-degenerate on the synthetic corpus: some
    # documents carry shared spans, most don't.
    dup_docs = sum(1 for _, d in got.values() if d > 0)
    assert 0 < dup_docs < len(got)


def test_span_dedup_short_docs_single_span(spark):
    # Documents shorter than W tokens still contribute exactly one
    # (truncated) span — slice() truncation parity with list_slice.
    rows = REGISTRY["ns_span_dedup"].fn(spark, SF_SMOKE).collect()
    counts = Counter(r.n_spans for r in rows)
    assert min(counts) >= 1
