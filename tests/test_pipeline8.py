"""Pins for the part-8 pipeline ops: paragraph-level exact dedup stats
and the CCNet stratified-sampling realization (both also under the full
DuckDB oracle gate at sf0.001/0.01/0.1)."""

from __future__ import annotations

from pyspark.sql import functions as F

from map_reduce_framework_using_python_spark.plans.core import REGISTRY
from map_reduce_framework_using_python_spark.plans.pipeline8 import (
    _CCNET_KEEP,
    _PARA_WORDS,
    paragraph_dedup_stats,
)
from tests.conftest import SF_SMOKE


def _words(n: int, tag: str) -> str:
    return " ".join(f"{tag}{i}" for i in range(n))


def test_paragraph_dedup_planted_shared_paragraph(spark):
    """Two docs sharing exactly one 10-word paragraph: that instance is
    a duplicate in BOTH docs; everything else is unique."""
    shared = _words(_PARA_WORDS, "s")
    a = shared + " " + _words(_PARA_WORDS, "a")   # paras: [shared, a...]
    b = shared + " " + _words(_PARA_WORDS, "b")
    c = _words(2 * _PARA_WORDS, "c")
    df = spark.createDataFrame([(1, a), (2, b), (3, c)], ["doc_id", "text"])
    out = {r["doc_id"]: r for r in paragraph_dedup_stats(df).collect()}
    assert out[1]["n_paras"] == 2 and out[1]["n_dup"] == 1
    assert out[2]["n_paras"] == 2 and out[2]["n_dup"] == 1
    assert out[3]["n_paras"] == 2 and out[3]["n_dup"] == 0
    assert abs(out[1]["dup_frac"] - 0.5) < 1e-9
    assert out[3]["dup_frac"] == 0.0


def test_paragraph_dedup_within_doc_repeat_counts(spark):
    """A paragraph repeated INSIDE one document is boilerplate too —
    both instances count as duplicates (global occurrence ≥ 2)."""
    p = _words(_PARA_WORDS, "x")
    df = spark.createDataFrame([(1, p + " " + p)], ["doc_id", "text"])
    row = paragraph_dedup_stats(df).collect()[0]
    assert row["n_paras"] == 2 and row["n_dup"] == 2
    assert abs(row["dup_frac"] - 1.0) < 1e-9


def test_paragraph_dedup_short_tail_paragraph(spark):
    """A final short window (fewer than 10 words) is still a paragraph
    — coverage is every word exactly once, no window dropped."""
    df = spark.createDataFrame([(1, _words(25, "w"))], ["doc_id", "text"])
    row = paragraph_dedup_stats(df).collect()[0]
    assert row["n_paras"] == 3  # 10 + 10 + 5
    assert row["n_dup"] == 0


def test_paragraph_dedup_covers_every_document(spark):
    out = REGISTRY["ns_paragraph_dedup"].fn(spark, SF_SMOKE)
    n_docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").count()
    assert out.count() == n_docs
    for r in out.collect():
        assert 0 <= r["n_dup"] <= r["n_paras"]
        assert 0.0 <= r["dup_frac"] <= 1.0


def test_paragraph_dedup_apply_keeps_first_occurrence(spark, tmp_path):
    """Planted corpus: doc 1 = [S, A], doc 2 = [S, B], doc 3 = [S] —
    S's first occurrence is (doc 1, g=0), so doc 1 keeps [S, A], doc 2
    keeps only [B], and doc 3 (pure boilerplate) vanishes."""
    import os

    shared = _words(_PARA_WORDS, "s")
    a, b = _words(_PARA_WORDS, "a"), _words(_PARA_WORDS, "b")
    df = spark.createDataFrame(
        [(1, shared + " " + a, "en", "src1", 1),
         (2, shared + " " + b, "en", "src1", 1),
         (3, shared, "en", "src1", 1)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    sf_dir = str(tmp_path)
    df.write.parquet(os.path.join(sf_dir, "documents.parquet"))
    out = {
        r["doc_id"]: (r["n_kept"], r["clean_text"])
        for r in REGISTRY["ns_paragraph_dedup_apply"].fn(spark, sf_dir).collect()
    }
    assert out == {1: (2, shared + " " + a), 2: (1, b)}


def test_paragraph_dedup_apply_is_identity_without_duplicates(spark):
    """On the synthetic corpus, docs with dup_frac == 0 must round-trip
    byte-identically (word-normalized), and kept counts always equal
    n_paras − n_dup_removed consistency with the stats op."""
    stats = {
        r["doc_id"]: r
        for r in REGISTRY["ns_paragraph_dedup"].fn(spark, SF_SMOKE).collect()
    }
    applied = {
        r["doc_id"]: r
        for r in REGISTRY["ns_paragraph_dedup_apply"].fn(spark, SF_SMOKE).collect()
    }
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    }
    import re

    for doc_id, s in stats.items():
        if s["n_dup"] == 0:
            # no paragraph of this doc duplicates anything → everything kept
            assert applied[doc_id]["n_kept"] == s["n_paras"]
            norm = " ".join(re.split(r" +", docs[doc_id].strip()))
            assert applied[doc_id]["clean_text"] == norm
        else:
            # a dup instance may still be the kept FIRST occurrence, so
            # only the bound holds: kept ≥ paras − dups, kept ≤ paras
            n_kept = applied[doc_id]["n_kept"] if doc_id in applied else 0
            assert s["n_paras"] - s["n_dup"] <= n_kept <= s["n_paras"]


def test_ccnet_sample_realizes_the_stratified_cut(spark):
    """head keeps everything; middle/tail keep fractions statistically
    near 1/2 and 1/10; counts per (lang, bucket) agree with the
    stratification query; repeated runs are bit-identical (hash-derived
    randomness, no rand())."""
    rows = REGISTRY["ns_ccnet_sample"].fn(spark, SF_SMOKE).collect()
    strat = {
        (r["lang"], r["bucket"]): r["n_docs"]
        for r in REGISTRY["ns_ccnet_buckets_scaled"].fn(spark, SF_SMOKE).collect()
    }
    assert {(r["lang"], r["bucket"]) for r in rows} == set(strat)
    mids, tails = [0, 0], [0, 0]
    for r in rows:
        assert r["n_docs"] == strat[(r["lang"], r["bucket"])]
        assert 0 <= r["n_kept"] <= r["n_docs"]
        if r["bucket"] == "head":
            assert r["n_kept"] == r["n_docs"]
        elif r["bucket"] == "middle":
            mids[0] += r["n_kept"]; mids[1] += r["n_docs"]
        else:
            tails[0] += r["n_kept"]; tails[1] += r["n_docs"]
    # aggregate rates across languages: loose 3-sigma-ish bands
    assert 0.3 <= mids[0] / mids[1] <= 0.7
    assert tails[0] / tails[1] <= 0.3
    again = REGISTRY["ns_ccnet_sample"].fn(spark, SF_SMOKE).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, rows))


def test_epoch_plan_budget_and_flattening_invariants(spark):
    """The plan must (a) spend the whole budget: Σ epochs_s·tokens_s ≈
    B = 2·Σ tokens (within per-source rounding), (b) flatten without
    inverting: smaller sources get MORE epochs, ordering preserved,
    and (c) boost minorities above the budget's uniform 2.0 while
    dominant sources fall below it."""
    rows = REGISTRY["ns_epoch_plan"].fn(spark, SF_SMOKE).collect()
    assert len(rows) >= 2
    total = sum(r["tokens"] for r in rows)
    spent = sum(r["epochs"] * r["tokens"] for r in rows)
    assert abs(spent - 2.0 * total) < 1e-4 * total
    by_tokens = sorted(rows, key=lambda r: r["tokens"])
    ep = [r["epochs"] for r in by_tokens]
    assert ep == sorted(ep, reverse=True)  # fewer tokens → more epochs
    assert by_tokens[0]["epochs"] > 2.0    # minority repeated beyond budget
    assert by_tokens[-1]["epochs"] < 2.0   # majority subsampled
    for r in rows:
        assert r["epochs"] > 0


def test_ccnet_keep_thresholds_are_exact_integers():
    assert _CCNET_KEEP["head"] == 2**32
    assert _CCNET_KEEP["middle"] * 2 == 2**32
    assert _CCNET_KEEP["tail"] == (2**32) // 10


def test_epoch_realize_matches_plan_budget_and_structure(spark):
    """The realized stream must implement the plan exactly: per source,
    every doc appears floor(e_s) times plus a deterministic hash-
    selected extra (replicas are 0..n_rep-1, no gaps), and the realized
    token mass tracks e_s · tokens_s (binomial remainder selection —
    tolerance scales with the remainder mass). Re-running produces the
    identical stream (no rand())."""
    plan = {r["source"]: r for r in REGISTRY["ns_epoch_plan"].fn(spark, SF_SMOKE).collect()}
    rows = REGISTRY["ns_epoch_realize"].fn(spark, SF_SMOKE).collect()
    again = REGISTRY["ns_epoch_realize"].fn(spark, SF_SMOKE).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))

    from collections import defaultdict

    per_doc = defaultdict(list)
    for r in rows:
        per_doc[(r["source"], r["doc_id"])].append(r["replica"])
    for (src, _doc), reps in per_doc.items():
        e = plan[src]["epochs"]
        full = int(e * 1_000_000 + 1e-9) // 1_000_000
        assert sorted(reps) in (list(range(full)), list(range(full + 1)))

    tok_by_src = defaultdict(int)
    for r in rows:
        tok_by_src[r["source"]] += r["n_tokens"]
    import math

    for src, p in plan.items():
        want = p["epochs"] * p["tokens"]
        frac = p["epochs"] - int(p["epochs"])
        # selection noise only lives in the fractional remainder: the
        # extra-copy count is Binomial(n_docs, frac) — bound at 4σ in
        # token units plus one doc of grid slack
        avg = p["tokens"] / p["n_docs"]
        sigma = math.sqrt(max(frac * (1.0 - frac) * p["n_docs"], 0.0))
        slack = 4.0 * sigma * avg + avg
        assert abs(tok_by_src[src] - want) <= slack, (src, tok_by_src[src], want)


def test_epoch_shards_pack_the_realized_stream(spark):
    """Shard manifest invariants: ids are contiguous from 0; total
    tokens equal the realized stream's; every shard except the last
    holds ≥ the budget minus one straddling copy and < budget + max
    copy size (the exclusive-prefix DIV rule); reruns are identical."""
    from map_reduce_framework_using_python_spark.plans.pipeline8 import (
        _SHARD_TOKENS,
    )

    rows = REGISTRY["ns_epoch_shards"].fn(spark, SF_SMOKE).collect()
    again = REGISTRY["ns_epoch_shards"].fn(spark, SF_SMOKE).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    realized_tokens = sum(
        r["n_tokens"] for r in REGISTRY["ns_epoch_realize"].fn(spark, SF_SMOKE).collect()
    )
    assert sum(r["n_tokens"] for r in rows) == realized_tokens

    from collections import defaultdict

    per_shard = defaultdict(int)
    max_nt = max(r["n_tokens"] for r in rows)
    for r in rows:
        per_shard[r["shard_id"]] += r["n_tokens"]
    ids = sorted(per_shard)
    assert ids == list(range(len(ids)))
    for sid in ids[:-1]:
        assert _SHARD_TOKENS - max_nt < per_shard[sid] < _SHARD_TOKENS + max_nt


def test_capstone_corpus_scans_confined_to_curated_table_build(spark):
    """The training capstone's composition claim (r8): ALL corpus
    FileScans live inside persisted subtrees (the curated token table,
    and — since the r14 optimization round — the nested bigram-model
    and score-proxy caches inside its build); the mixture plan,
    realize, and shard-packing stages consume cached tables through
    InMemoryTableScan and add ZERO corpus scans. Asserted
    STRUCTURALLY (r14): the old textual count (cap FileScans ==
    cache_reads × tokc subtree scans) relied on the plan printer
    reprinting each cached child exactly once, which nested caches
    break combinatorially. Walking the physical tree — where a cached
    subtree is NOT a child of its InMemoryTableScan — proves the claim
    directly: zero file scans anywhere outside a cache boundary."""
    from map_reduce_framework_using_python_spark.plans.core import REGISTRY

    root = (
        REGISTRY["ns_training_capstone"]
        .fn(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
    )
    if root.nodeName() == "AdaptiveSparkPlan":
        root = root.initialPlan()

    def walk(node):
        yield node
        for i in range(node.children().size()):
            yield from walk(node.children().apply(i))

    names = [n.nodeName() for n in walk(root)]
    n_cache_reads = sum(1 for n in names if "InMemoryTableScan" in n)
    n_file_scans = sum(1 for n in names if "Scan parquet" in n or "FileScan" in n)
    assert n_cache_reads > 0, names  # the curated table IS cached
    assert n_file_scans == 0, names  # no scan outside a cache boundary


def test_paragraph_trim_is_intra_doc_only(spark, tmp_path):
    """Planted corpus: doc 1 = [S, A, S] trims to [S, A] (within-doc
    repeat removed, first kept in position order); doc 2 = [S, B] is
    UNTOUCHED even though S also lives in doc 1 — the trim must never
    consult other documents (that's the corpus-wide apply's job); doc
    3 = [S, S, S] collapses to [S], never to empty."""
    import os

    shared = _words(_PARA_WORDS, "s")
    a, b = _words(_PARA_WORDS, "a"), _words(_PARA_WORDS, "b")
    df = spark.createDataFrame(
        [(1, " ".join([shared, a, shared]), "en", "src1", 1),
         (2, " ".join([shared, b]), "en", "src1", 1),
         (3, " ".join([shared, shared, shared]), "en", "src1", 1)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    sf_dir = str(tmp_path)
    df.write.parquet(os.path.join(sf_dir, "documents.parquet"))
    out = {
        r["doc_id"]: (r["n_paras"], r["n_kept"], r["clean_text"])
        for r in REGISTRY["ns_paragraph_trim"].fn(spark, sf_dir).collect()
    }
    assert out == {
        1: (3, 2, shared + " " + a),
        2: (2, 2, shared + " " + b),
        3: (3, 1, shared),
    }


def test_paragraph_trim_null_and_empty_text(spark, tmp_path):
    """Null-text docs vanish on BOTH engines (explode of a null
    sequence / LATERAL unnest of NULL — verified consistent with the
    DuckDB oracle); empty text survives as one empty paragraph. Pinned
    so a future null-guard 'fix' on one side can't silently diverge
    from the oracle."""
    import os

    spark.createDataFrame(
        [(1, None, "en", "s", 0), (2, "", "en", "s", 0), (3, "a b", "en", "s", 3)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(os.path.join(str(tmp_path), "documents.parquet"))
    out = sorted(
        (r["doc_id"], r["n_paras"], r["n_kept"], r["clean_text"])
        for r in REGISTRY["ns_paragraph_trim"].fn(spark, str(tmp_path)).collect()
    )
    assert out == [(2, 1, 1, ""), (3, 1, 1, "a b")]
