"""Paragraph-digest ingest index (r7, VERDICT r6 item 2): the
incremental screen must return EXACTLY the one-shot
paragraph_dedup_stats(corpus ∪ batch) verdicts restricted to batch
docs; the streaming screen composes that per micro-batch with
first-occurrence-wins ordering across batches."""

from __future__ import annotations

from pyspark.sql import functions as F

from map_reduce_framework_using_python_spark.operators.dedup_index import (
    append_paragraphs_to_index,
    build_paragraph_index,
    compact_paragraph_index,
    incremental_paragraph_stats,
    read_meta,
)
from map_reduce_framework_using_python_spark.plans.pipeline8 import (
    paragraph_dedup_stats,
)
from map_reduce_framework_using_python_spark.sources.io import load_table
from tests.conftest import SF_SMOKE

MOD, REM = 16, 7

_DOCS_SCHEMA = "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"


def _split(docs):
    return (
        docs.filter(F.col("doc_id") % MOD == REM),
        docs.filter(F.col("doc_id") % MOD != REM),
    )


def _stats_rows(df):
    return {
        r["doc_id"]: (r["n_paras"], r["n_dup"], r["dup_frac"]) for r in df.collect()
    }


def test_incremental_equals_oneshot_restricted(spark, tmp_path):
    """The oracle contract in operator form: screen(batch, index(corpus))
    == paragraph_dedup_stats(corpus ∪ batch) restricted to batch docs."""
    docs = load_table(spark, SF_SMOKE, "documents")
    batch, corpus = _split(docs)
    path = build_paragraph_index(corpus, str(tmp_path / "idx"))
    got = _stats_rows(incremental_paragraph_stats(spark, batch, path))
    want = _stats_rows(
        paragraph_dedup_stats(docs).join(
            batch.select("doc_id"), "doc_id", "semi"
        )
    )
    assert got == want
    assert got  # non-vacuous


def test_append_commutes_with_build(spark, tmp_path):
    docs = load_table(spark, SF_SMOKE, "documents").limit(120)
    batch, corpus = _split(docs)
    full = build_paragraph_index(docs, str(tmp_path / "full"))
    grown = build_paragraph_index(corpus, str(tmp_path / "grown"))
    append_paragraphs_to_index(batch, grown)
    read = lambda p: {
        tuple(r)
        for r in spark.read.parquet(f"{p}/digests")
        .select("doc_id", "g", "h")
        .collect()
    }
    assert read(grown) == read(full)


def test_replayed_batch_does_not_self_match(spark, tmp_path):
    """exclude_own: a batch that ALREADY appended itself (crash between
    append and checkpoint commit) must screen identically to the first
    attempt — its own instance rows are anti-joined out of the index."""
    docs = load_table(spark, SF_SMOKE, "documents")
    batch, corpus = _split(docs)
    path = build_paragraph_index(corpus, str(tmp_path / "idx"))
    before = _stats_rows(incremental_paragraph_stats(spark, batch, path))
    append_paragraphs_to_index(batch, path)  # the crash-replay shape
    after = _stats_rows(incremental_paragraph_stats(spark, batch, path))
    assert after == before
    # control: WITHOUT the exclusion every batch paragraph self-matches
    naive = _stats_rows(
        incremental_paragraph_stats(spark, batch, path, exclude_own=False)
    )
    assert all(n_dup == n_paras for (n_paras, n_dup, _f) in naive.values())


def test_stream_screens_across_batches_first_occurrence_wins(spark, tmp_path):
    """Cross-batch semantics: a paragraph first seen in batch 1 is clean
    there and flagged in batch 2 (extend_index), and each drained
    batch's stats equal the one-shot stats over (corpus ∪ batches ≤ i)
    restricted to that batch — the sequential-fold ground truth."""
    import os
    import time

    from map_reduce_framework_using_python_spark.streaming.ingest import (
        paragraph_screen_stream,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    corpus = docs.filter(F.col("doc_id") % MOD != REM).limit(50)
    path = build_paragraph_index(corpus, str(tmp_path / "idx"))
    # 10-word paragraphs: para A shared between b1 and b2 (first
    # occurrence in b1), para B unique to b2.
    para_a = "aq bq cq dq eq fq gq hq iq jq"
    para_b = "kq lq mq nq oq pq qq rq sq tq"
    b1_text = para_a
    b2_text = para_a + " " + para_b
    land = tmp_path / "landing"
    land.mkdir()
    now = time.time()
    for name, row, ts in (
        ("b1.parquet", (900001, b1_text, "en", "srcA", len(b1_text)), now - 60),
        ("b2.parquet", (900002, b2_text, "en", "srcA", len(b2_text)), now),
    ):
        d = tmp_path / f"_w_{name}"
        spark.createDataFrame([row], _DOCS_SCHEMA).coalesce(1).write.parquet(str(d))
        part = next(p for p in os.listdir(d) if p.endswith(".parquet"))
        os.rename(d / part, land / name)
        os.utime(land / name, (ts, ts))
    stream = (
        spark.readStream.schema(_DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(land))
    )
    got = _stats_rows(
        paragraph_screen_stream(
            stream,
            path,
            out_dir=str(tmp_path / "out" / "stats"),
            checkpoint_dir=str(tmp_path / "out" / "ckpt"),
            extend_index=True,
        )
    )
    # batch 1: its single paragraph is a first occurrence → clean
    assert got[900001] == (1, 0, 0.0)
    # batch 2: para A was seen in batch 1 → dup; para B is novel
    assert got[900002] == (2, 1, 0.5)
    # and the fold ground truth, stated generally:
    b1 = spark.createDataFrame(
        [(900001, b1_text, "en", "srcA", len(b1_text))], _DOCS_SCHEMA
    )
    b2 = spark.createDataFrame(
        [(900002, b2_text, "en", "srcA", len(b2_text))], _DOCS_SCHEMA
    )
    for i, (bi, seen) in enumerate(
        ((b1, corpus.unionByName(b1)), (b2, corpus.unionByName(b1).unionByName(b2)))
    ):
        want = _stats_rows(
            paragraph_dedup_stats(seen).join(bi.select("doc_id"), "doc_id", "semi")
        )
        for doc_id, stats in want.items():
            assert got[doc_id] == stats, (i, doc_id)


def test_compact_paragraph_index_single_file_sheds_replays(spark, tmp_path):
    import glob

    docs = load_table(spark, SF_SMOKE, "documents").limit(80)
    batch, corpus = _split(docs)
    path = build_paragraph_index(corpus, str(tmp_path / "idx"))
    append_paragraphs_to_index(batch, path)
    append_paragraphs_to_index(batch, path)  # replayed append
    live = str(tmp_path / "idx" / "digests")
    df = spark.read.parquet(live)
    assert df.count() > df.distinct().count()
    before = {
        tuple(r) for r in df.select("doc_id", "g", "h", "pb").collect()
    }
    compact_paragraph_index(spark, path)
    after_df = spark.read.parquet(live)
    assert after_df.count() == after_df.distinct().count()
    assert {
        tuple(r) for r in after_df.select("doc_id", "g", "h", "pb").collect()
    } == before
    for b in range(read_meta(path)["buckets"]):
        assert len(glob.glob(f"{live}/pb={b}/*.parquet")) <= 1


def test_compact_paragraph_index_committed_crash_does_not_remerge(spark, tmp_path):
    import os
    import shutil

    docs = load_table(spark, SF_SMOKE, "documents").limit(80)
    path = build_paragraph_index(docs, str(tmp_path / "idx"))
    live = str(tmp_path / "idx" / "digests")
    compact_paragraph_index(spark, path)
    before = spark.read.parquet(live).count()
    shutil.copytree(live, live + "__old")
    open(os.path.join(live + "__old", "_swap_pending"), "w").close()
    open(os.path.join(live, "_swap_committed"), "w").close()
    compact_paragraph_index(spark, path)
    assert spark.read.parquet(live).count() == before
    assert not os.path.isdir(live + "__old")
    assert not os.path.exists(os.path.join(live, "_swap_committed"))


def test_incremental_apply_equals_oneshot_restricted(spark, tmp_path):
    """Apply on ingest: incremental_paragraph_apply(batch, index(corpus))
    == the one-shot first-occurrence rewrite over (corpus ∪ batch)
    restricted to batch docs — and a replayed batch (already appended)
    rewrites identically thanks to the own-id exclusion."""
    from map_reduce_framework_using_python_spark.operators.dedup_index import (
        incremental_paragraph_apply,
    )
    from map_reduce_framework_using_python_spark.plans.core import REGISTRY

    docs = load_table(spark, SF_SMOKE, "documents")
    batch, corpus = _split(docs)
    path = build_paragraph_index(corpus, str(tmp_path / "idx"))
    got = {
        r["doc_id"]: (r["n_kept"], r["clean_text"])
        for r in incremental_paragraph_apply(spark, batch, path).collect()
    }
    want = {
        r["doc_id"]: (r["n_kept"], r["clean_text"])
        for r in REGISTRY["ns_paragraph_dedup_apply"]
        .fn(spark, SF_SMOKE)
        .join(batch.select("doc_id"), "doc_id", "semi")
        .collect()
    }
    assert got == want
    assert got
    append_paragraphs_to_index(batch, path)  # crash-replay shape
    again = {
        r["doc_id"]: (r["n_kept"], r["clean_text"])
        for r in incremental_paragraph_apply(spark, batch, path).collect()
    }
    assert again == got


def test_pruned_paragraph_index_probes_equal_full(spark, tmp_path):
    """Witness-capped pruned layout: screen AND apply against the
    pruned index equal the full index exactly for a disjoint batch
    (existence + global-min preserved by min-key rows), while the
    stored row count shrinks on a corpus with repeated paragraphs."""
    from map_reduce_framework_using_python_spark.operators.dedup_index import (
        incremental_paragraph_apply,
        prune_paragraph_index,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    batch, corpus = _split(docs)
    # plant heavy boilerplate in the corpus so the cap actually bites
    para = "zz " * 9 + "zz"
    boiler = spark.createDataFrame(
        [(800000 + i, para, "en", "srcB", len(para)) for i in range(20)],
        _DOCS_SCHEMA,
    )
    corpus = corpus.unionByName(boiler)
    full = build_paragraph_index(corpus, str(tmp_path / "full"))
    pruned = prune_paragraph_index(
        spark, full, str(tmp_path / "pruned"), cap=2
    )
    n_full = spark.read.parquet(f"{full}/digests").count()
    n_pruned = spark.read.parquet(f"{pruned}/digests").count()
    assert n_pruned < n_full  # the boilerplate cluster collapsed
    s_full = _stats_rows(incremental_paragraph_stats(spark, batch, full))
    s_pruned = _stats_rows(incremental_paragraph_stats(spark, batch, pruned))
    assert s_pruned == s_full
    a_full = {
        r["doc_id"]: (r["n_kept"], r["clean_text"])
        for r in incremental_paragraph_apply(spark, batch, full).collect()
    }
    a_pruned = {
        r["doc_id"]: (r["n_kept"], r["clean_text"])
        for r in incremental_paragraph_apply(spark, batch, pruned).collect()
    }
    assert a_pruned == a_full
    assert read_meta(pruned)["witness_cap"] == 2
    import pytest

    with pytest.raises(ValueError, match="separate location"):
        prune_paragraph_index(spark, full, full + "/digests__x", cap=2)


def test_apply_stream_first_occurrence_wins_across_batches(spark, tmp_path):
    """Streaming APPLY: a paragraph first seen in batch 1 survives
    there and is removed from batch 2 (extend_index), and each drained
    batch's rewrite equals the one-shot apply over (corpus ∪ batches
    ≤ i) restricted to that batch — the sequential fold."""
    import os
    import time

    from map_reduce_framework_using_python_spark.streaming.ingest import (
        paragraph_apply_stream,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    corpus = docs.filter(F.col("doc_id") % MOD != REM).limit(50)
    path = build_paragraph_index(corpus, str(tmp_path / "idx"))
    para_a = "aq bq cq dq eq fq gq hq iq jq"
    para_b = "kq lq mq nq oq pq qq rq sq tq"
    b1_text = para_a
    b2_text = para_a + " " + para_b
    land = tmp_path / "landing"
    land.mkdir()
    now = time.time()
    for name, row, ts in (
        ("b1.parquet", (900001, b1_text, "en", "srcA", len(b1_text)), now - 60),
        ("b2.parquet", (900002, b2_text, "en", "srcA", len(b2_text)), now),
    ):
        d = tmp_path / f"_w_{name}"
        spark.createDataFrame([row], _DOCS_SCHEMA).coalesce(1).write.parquet(str(d))
        part = next(p for p in os.listdir(d) if p.endswith(".parquet"))
        os.rename(d / part, land / name)
        os.utime(land / name, (ts, ts))
    stream = (
        spark.readStream.schema(_DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(land))
    )
    got = {
        r["doc_id"]: (r["n_kept"], r["clean_text"])
        for r in paragraph_apply_stream(
            stream,
            path,
            out_dir=str(tmp_path / "out" / "clean"),
            checkpoint_dir=str(tmp_path / "out" / "ckpt"),
            extend_index=True,
        ).collect()
    }
    # batch 1: first occurrence of A → kept verbatim
    assert got[900001] == (1, para_a)
    # batch 2: A first seen in batch 1 → removed; only B survives
    assert got[900002] == (1, para_b)
