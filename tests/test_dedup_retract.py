"""Pins for document RETRACTION across the dedup index lanes
(operators/dedup_index.retract_docs_from_index) — the takedown verb:

* a retracted doc stops matching in every incremental probe (MinHash
  pairs, paragraph screen, span screen) without any data rewrite;
* retract == never-indexed: the probe against a retracted index
  returns exactly the probe against build(corpus minus retracted);
* compaction physically purges the retracted docs' instance rows AND
  retires the tombstone log in the same swap — post-purge the layout
  row set equals build(corpus minus retracted)'s exactly;
* witness-capped derived layouts refuse retraction (retract the exact
  index, re-prune); pruning a retracted exact index never lets a
  retracted witness into the derived layout;
* a retraction landing mid-compaction aborts the swap (the snapshot
  guard covers tombstone files), and the quiesced retry purges it.

Full-oracle form: ns_paragraph_retract_screen (plans/pipeline8.py)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from map_reduce_framework_using_python_spark.operators.ann_index import (
    TOMBSTONE_DIR,
)
from map_reduce_framework_using_python_spark.operators.dedup_index import (
    build_minhash_index,
    build_paragraph_index,
    build_shingle_index,
    compact_paragraph_index,
    incremental_dedup_pairs,
    incremental_paragraph_stats,
    incremental_span_stats,
    prune_index_witnesses,
    retract_docs_from_index,
)
from map_reduce_framework_using_python_spark.sources.io import load_table
from tests.conftest import SF_SMOKE

MOD, REM = 16, 7


def _split(docs):
    return (
        docs.filter(F.col("doc_id") % MOD == REM),
        docs.filter(F.col("doc_id") % MOD != REM),
    )


def _pair_rows(df):
    return sorted(
        (r["batch_doc"], r["corpus_doc"], r["jaccard"]) for r in df.collect()
    )


def _stats_rows(df):
    return {
        r[0]: tuple(r[1:]) for r in df.collect()
    }


def test_retract_minhash_removes_pairs_and_equals_never_indexed(spark, tmp_path):
    docs = load_table(spark, SF_SMOKE, "documents")
    batch, corpus = _split(docs)
    p1 = build_minhash_index(corpus, str(tmp_path / "full"))
    before = _pair_rows(incremental_dedup_pairs(spark, batch, corpus, p1))
    assert before  # non-vacuous: the planted near-dups straddle the split
    victim = before[0][1]
    retract_docs_from_index([victim], p1, spark=spark)
    after = _pair_rows(incremental_dedup_pairs(spark, batch, corpus, p1))
    assert all(c != victim for _b, c, _j in after)
    # retract == never-indexed, exactly.
    survivors = corpus.filter(F.col("doc_id") != victim)
    p2 = build_minhash_index(survivors, str(tmp_path / "minus"))
    want = _pair_rows(incremental_dedup_pairs(spark, batch, survivors, p2))
    assert after == want


def test_retract_paragraph_screen_purge_and_oneshot_equality(spark, tmp_path):
    from map_reduce_framework_using_python_spark.operators.dedup_index import (
        _paragraph_instances,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    batch, corpus = _split(docs)
    path = build_paragraph_index(corpus, str(tmp_path / "idx"))
    before = _stats_rows(incremental_paragraph_stats(spark, batch, path))
    # Retract EVERY corpus dup-partner of the batch (the content-derived
    # takedown set — the ns_paragraph_retract_screen rule without the
    # even-id half-split, so every cross-split duplicate must flip).
    inst = _paragraph_instances(docs)
    bh = inst.filter(F.col("doc_id") % MOD == REM).select("h").distinct()
    rx = (
        inst.join(bh, "h")
        .filter(F.col("doc_id") % MOD != REM)
        .select("doc_id")
        .distinct()
    )
    retracted = {r["doc_id"] for r in rx.collect()}
    assert retracted  # non-vacuous
    retract_docs_from_index(rx, path)
    after = _stats_rows(incremental_paragraph_stats(spark, batch, path))
    assert after != before
    # retract == never-indexed: equality with a fresh index on survivors.
    survivors = corpus.filter(~F.col("doc_id").isin(list(retracted)))
    p2 = build_paragraph_index(survivors, str(tmp_path / "minus"))
    assert after == _stats_rows(incremental_paragraph_stats(spark, batch, p2))
    # Compaction: physical purge + log retirement; verdicts unchanged.
    compact_paragraph_index(spark, path)
    live = os.path.join(path, "digests")
    assert not os.path.isdir(os.path.join(live, TOMBSTONE_DIR))
    left = {r["doc_id"] for r in spark.read.parquet(live).select("doc_id").distinct().collect()}
    assert not (left & retracted)
    rows = sorted(
        tuple(r) for r in spark.read.parquet(live)
        .select("doc_id", "g", "h").collect()
    )
    want_rows = sorted(
        tuple(r) for r in spark.read.parquet(os.path.join(str(tmp_path / "minus"), "digests"))
        .select("doc_id", "g", "h").collect()
    )
    assert rows == want_rows
    assert _stats_rows(incremental_paragraph_stats(spark, batch, path)) == after


def test_retract_span_lane_equals_never_indexed(spark, tmp_path):
    docs = load_table(spark, SF_SMOKE, "documents")
    batch, corpus = _split(docs)
    path = build_shingle_index(corpus, str(tmp_path / "sp"), digest="xxhash64")
    before = _stats_rows(incremental_span_stats(spark, batch, path))
    dup_docs = [k for k, v in before.items() if v[1] > 0]
    if not dup_docs:
        pytest.skip("no cross-split span duplicates in this slice")
    # Retract every even-id corpus doc — a blunt set that provably
    # intersects some dup source or leaves the verdicts identical to
    # the never-indexed build either way (the equality is the pin).
    rx = corpus.filter(F.col("doc_id") % 2 == 0).select("doc_id")
    retract_docs_from_index(rx, path)
    after = _stats_rows(incremental_span_stats(spark, batch, path))
    survivors = corpus.filter(F.col("doc_id") % 2 != 0)
    p2 = build_shingle_index(
        survivors, str(tmp_path / "sp2"), digest="xxhash64"
    )
    assert after == _stats_rows(incremental_span_stats(spark, batch, p2))


def test_retract_refuses_capped_layout_and_prune_applies_tombstones(
    spark, tmp_path
):
    docs = load_table(spark, SF_SMOKE, "documents").limit(200)
    batch, corpus = _split(docs)
    path = build_minhash_index(corpus, str(tmp_path / "full"))
    capped = prune_index_witnesses(
        spark, path, str(tmp_path / "capped"), cap=4
    )
    with pytest.raises(ValueError, match="witness-capped DERIVED"):
        retract_docs_from_index([1], capped, spark=spark)
    # Retract from the exact index, re-prune: the fresh derived layout
    # must not resurrect the retracted witness.
    victim = corpus.select("doc_id").head()[0]
    retract_docs_from_index([victim], path, spark=spark)
    capped2 = prune_index_witnesses(
        spark, path, str(tmp_path / "capped2"), cap=4
    )
    ids = {
        r["doc_id"]
        for r in spark.read.parquet(os.path.join(capped2, "buckets"))
        .select("doc_id").distinct().collect()
    }
    assert victim not in ids


def test_retraction_during_compaction_aborts_swap(spark, tmp_path):
    docs = load_table(spark, SF_SMOKE, "documents").limit(200)
    _batch, corpus = _split(docs)
    path = build_paragraph_index(corpus, str(tmp_path / "idx"))
    ids = [r["doc_id"] for r in corpus.select("doc_id").head(2)]
    retract_docs_from_index([ids[0]], path, spark=spark)

    def racer():
        retract_docs_from_index([ids[1]], path, spark=spark)

    with pytest.raises(RuntimeError, match="landed during the swap|changed during"):
        compact_paragraph_index(spark, path, _test_hook_pre_swap=racer)
    live = os.path.join(path, "digests")
    left = {
        r["doc_id"] for r in spark.read.parquet(live)
        .select("doc_id").distinct().collect()
    }
    assert ids[0] in left and ids[1] in left  # rolled back, rows intact
    compact_paragraph_index(spark, path)  # quiesced retry purges BOTH
    left = {
        r["doc_id"] for r in spark.read.parquet(live)
        .select("doc_id").distinct().collect()
    }
    assert ids[0] not in left and ids[1] not in left
    assert not os.path.isdir(os.path.join(live, TOMBSTONE_DIR))


def test_retract_list_requires_spark(spark, tmp_path):
    docs = load_table(spark, SF_SMOKE, "documents").limit(50)
    path = build_paragraph_index(docs, str(tmp_path / "idx"))
    with pytest.raises(ValueError, match="needs spark"):
        retract_docs_from_index([1], path)


def test_retract_stream_multibatch_equals_bulk_and_replay(spark, tmp_path):
    """Takedown QUEUE semantics: three micro-batches of retraction ids
    drain to the same screen as one bulk retraction (tombstone logs
    union), and re-draining the same ids with a fresh checkpoint (the
    at-least-once replay shape) changes nothing."""
    from map_reduce_framework_using_python_spark.streaming.ingest import (
        retract_stream,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    batch, corpus = _split(docs)
    bulk = build_paragraph_index(corpus, str(tmp_path / "bulk"))
    streamed = build_paragraph_index(corpus, str(tmp_path / "streamed"))
    victims = [r["doc_id"] for r in corpus.select("doc_id").head(9)]
    retract_docs_from_index(victims, bulk, spark=spark)
    # Land the ids as three files -> three AvailableNow micro-batches.
    ids_dir = str(tmp_path / "ids")
    for i in range(3):
        spark.createDataFrame(
            [(v,) for v in victims[i * 3:(i + 1) * 3]], "doc_id bigint"
        ).coalesce(1).write.mode("append").parquet(ids_dir)
    stream = (
        spark.readStream.schema("doc_id bigint")
        .option("maxFilesPerTrigger", 1)
        .parquet(ids_dir)
    )
    retract_stream(stream, streamed, str(tmp_path / "ckpt1"))
    got = _stats_rows(incremental_paragraph_stats(spark, batch, streamed))
    want = _stats_rows(incremental_paragraph_stats(spark, batch, bulk))
    assert got == want
    # Replay with a fresh checkpoint: idempotent.
    retract_stream(stream, streamed, str(tmp_path / "ckpt2"))
    assert _stats_rows(incremental_paragraph_stats(spark, batch, streamed)) == want
