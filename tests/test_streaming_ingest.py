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
