"""Streaming dedup-on-ingest: the drained stream's pairs must equal the
one-shot batch probe over the same documents — micro-batch boundaries
cannot change a verdict that depends only on (doc, corpus index)."""

from __future__ import annotations

from pyspark.sql import functions as F

from map_reduce_framework_using_python_spark.operators.dedup_index import (
    build_minhash_index,
    incremental_dedup_pairs,
)
from map_reduce_framework_using_python_spark.streaming.ingest import (
    read_documents_stream,
    screen_stream,
)
from map_reduce_framework_using_python_spark.sources.io import load_table
from tests.conftest import SF_SMOKE

MOD, REM = 16, 7


def test_stream_screen_equals_batch_probe(spark, tmp_path):
    docs = load_table(spark, SF_SMOKE, "documents")
    batch = docs.filter(F.col("doc_id") % MOD == REM)
    corpus = docs.filter(F.col("doc_id") % MOD != REM)
    path = build_minhash_index(
        corpus, str(tmp_path / "idx"), n=3, num_hashes=32, bands=16
    )
    streamed = screen_stream(
        read_documents_stream(spark, SF_SMOKE).filter(F.col("doc_id") % MOD == REM),
        corpus,
        path,
        out_dir=str(tmp_path / "pairs"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        threshold=0.6,
    )
    got = {tuple(r) for r in streamed.collect()}
    want = {
        tuple(r)
        for r in incremental_dedup_pairs(
            spark, batch, corpus, path, threshold=0.6
        ).collect()
    }
    assert got == want
    assert got  # the fixture must actually contain near-dup pairs to pin


def test_stream_screen_empty_batch_yields_empty_frame(spark, tmp_path):
    docs = load_table(spark, SF_SMOKE, "documents")
    corpus = docs.filter(F.col("doc_id") % MOD != REM)
    path = build_minhash_index(
        corpus, str(tmp_path / "idx"), n=3, num_hashes=32, bands=16
    )
    streamed = screen_stream(
        # impossible predicate → stream drains with zero batch rows
        read_documents_stream(spark, SF_SMOKE).filter(F.col("doc_id") < 0),
        corpus,
        path,
        out_dir=str(tmp_path / "pairs"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    assert streamed.columns == ["batch_doc", "corpus_doc", "jaccard"]
    assert streamed.count() == 0


def test_extend_index_dedups_across_batches(spark, tmp_path):
    """Continuous-dedup semantics: with extend_index=True, batch 2 is
    screened against batch 1's documents (appended to the index after
    batch 1 was screened), not just the original corpus."""
    import os
    import time

    from map_reduce_framework_using_python_spark.streaming.ingest import _DOCS_SCHEMA

    docs = load_table(spark, SF_SMOKE, "documents")
    corpus = docs.filter(F.col("doc_id") % MOD != REM).limit(50)
    path = build_minhash_index(
        corpus, str(tmp_path / "idx"), n=3, num_hashes=32, bands=16
    )
    novel = "zq wq vq uq tq sq rq qq pq oq nq mq"  # matches nothing in corpus
    land = tmp_path / "landing"
    land.mkdir()
    # the file source wants plain FILES (a Spark write dir would be
    # skipped as a non-partition subdirectory) — hoist the part file
    now = time.time()
    for name, row, ts in (
        ("b1.parquet", (900001, novel, "en", "srcA", len(novel)), now - 60),
        ("b2.parquet", (900002, novel + " extra", "en", "srcA", len(novel) + 6), now),
    ):
        d = tmp_path / f"_w_{name}"
        spark.createDataFrame([row], _DOCS_SCHEMA).coalesce(1).write.parquet(str(d))
        part = next(p for p in os.listdir(d) if p.endswith(".parquet"))
        os.rename(d / part, land / name)
        # file source orders by mtime: force b1 strictly older
        os.utime(land / name, (ts, ts))
    stream = (
        spark.readStream.schema(_DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(land))
    )
    got = screen_stream(
        stream,
        corpus,
        path,
        out_dir=str(tmp_path / "out" / "pairs"),
        checkpoint_dir=str(tmp_path / "out" / "ckpt"),
        threshold=0.6,
        extend_index=True,
    )
    pairs = {(r["batch_doc"], r["corpus_doc"]) for r in got.collect()}
    # doc2 (batch 2) must have been caught against doc1 (batch 1),
    # which is in no corpus — only the extended index knows it.
    assert (900002, 900001) in pairs


def test_replayed_batch_does_not_self_match_minhash(spark, tmp_path):
    """r7 streaming review: the MinHash lane now carries the same
    exclude-own-ids replay guard as the ANN and paragraph lanes. A
    batch that ALREADY appended itself (crash between the extend-index
    append and the checkpoint commit) must screen identically to the
    first attempt — no (d, d) self-pairs, no intra-batch cross-pairs
    from its own replayed band buckets."""
    from map_reduce_framework_using_python_spark.operators.dedup_index import (
        append_to_index,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    batch = docs.filter(F.col("doc_id") % MOD == REM)
    corpus = docs.filter(F.col("doc_id") % MOD != REM)
    path = build_minhash_index(
        corpus, str(tmp_path / "idx"), n=3, num_hashes=32, bands=16
    )
    before = {
        tuple(r)
        for r in incremental_dedup_pairs(spark, batch, corpus, path).collect()
    }
    append_to_index(batch, path)  # the crash-replay shape
    seen = corpus.unionByName(batch)  # seen/ side store holds the batch too
    after = {
        tuple(r)
        for r in incremental_dedup_pairs(spark, batch, seen, path).collect()
    }
    assert after == before
    assert not any(a == b for a, b, _j in after)
    # control: WITHOUT the exclusion every batch doc self-pairs at 1.0
    naive = {
        (r["batch_doc"], r["corpus_doc"])
        for r in incremental_dedup_pairs(
            spark, batch, seen, path, exclude_own=False
        ).collect()
    }
    batch_ids = {r["doc_id"] for r in batch.select("doc_id").collect()}
    assert {(d, d) for d in batch_ids} <= naive


def test_screen_stream_maintenance_ledger_answers_unchanged(
    spark, tmp_path
):
    """r14 (the r13 ledger unification completed): the dedup ingest
    lanes' maintain_every tick writes the SAME parquet ledger schema as
    curate_stream and the ANN ingest loops — one reader for every
    self-maintaining stream — and ledgering/maintenance never changes
    the drained answer (maintenance is layout-only)."""
    import os

    from map_reduce_framework_using_python_spark.operators.ann_index import (
        MAINTENANCE_LEDGER_SCHEMA,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    corpus = docs.filter(F.col("doc_id") % MOD != REM)
    with_m = build_minhash_index(
        corpus, str(tmp_path / "idx_m"), n=3, num_hashes=32, bands=16
    )
    without = build_minhash_index(
        corpus, str(tmp_path / "idx_n"), n=3, num_hashes=32, bands=16
    )
    ledger = str(tmp_path / "ledger")

    def stream():
        return read_documents_stream(spark, SF_SMOKE).filter(
            F.col("doc_id") % MOD == REM
        )

    got = screen_stream(
        stream(), corpus, with_m,
        out_dir=str(tmp_path / "p1"), checkpoint_dir=str(tmp_path / "c1"),
        threshold=0.6, extend_index=True,
        maintain_every=1, maintain_ledger_dir=ledger,
    )
    want = screen_stream(
        stream(), corpus, without,
        out_dir=str(tmp_path / "p2"), checkpoint_dir=str(tmp_path / "c2"),
        threshold=0.6, extend_index=True,
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    assert os.path.isdir(ledger)
    rows = spark.read.schema(MAINTENANCE_LEDGER_SCHEMA).parquet(ledger).collect()
    assert rows and all(r["index"] == "ingest" for r in rows)
    assert all(r["kind"] == "minhash" for r in rows)
    acted = [r for r in rows if r["action"] != "noop"]
    assert all(
        r["decision_after"] == "noop" or "deferred" in r["action"]
        for r in acted
    )
