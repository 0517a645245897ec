"""Streaming ingest dedup: screen a document stream against the
persisted MinHash index (:mod:`..operators.dedup_index`) as it arrives.

The batch query ``ns_incremental_dedup`` answers "which of these NEW
docs near-duplicate the corpus?" for one ingest; this module runs the
same screen CONTINUOUSLY: a file-source stream of arriving documents,
``foreachBatch`` probing each micro-batch against the index, appending
the verified pairs to a parquet sink. The corpus is never re-sketched —
per micro-batch cost is (sketch the batch) + (scan the fixed-width
index), which is what makes dedup-on-ingest viable at 100 TB.

Correctness contract (pinned in tests/test_streaming_ingest.py): the
result over a fully-drained bounded stream equals the one-shot batch
probe of the same documents — legitimate because each batch doc's
verdict depends only on (doc, corpus index), never on other batch docs,
so micro-batch boundaries cannot change the answer.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from map_reduce_framework_using_python_spark.operators.dedup_index import (
    incremental_dedup_pairs,
)

#: documents.parquet schema (file-source streams need it declared).
_DOCS_SCHEMA = "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"

_PAIRS_SCHEMA = "batch_doc BIGINT, corpus_doc BIGINT, jaccard DOUBLE"


def read_documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``documents`` as a file-source stream — ONE file per AvailableNow
    micro-batch (``maxFilesPerTrigger=1``, r7 review: without it every
    landing file coalesces into a single batch and the extend-index
    screen never sees cross-file duplicates, since intra-batch dedup is
    documented out of scope). A real deployment points this at the
    landing dir."""
    return (
        spark.readStream.schema(_DOCS_SCHEMA)
        .option("pathGlobFilter", "documents.parquet")
        .option("maxFilesPerTrigger", 1)
        .parquet(sf_dir)
    )


def _maybe_maintain(
    spark: SparkSession,
    index_path: str,
    batch_id: int,
    maintain_every: int | None,
    maintain_thresholds: dict | None,
    maintain_ledger_dir: str | None,
) -> None:
    """The self-maintenance tick every ingest lane shares (r14,
    completing the r13 ledger unification): after every Nth batch's
    sinks land — inside the foreachBatch quiescence window, the one
    place the stream owns the layout — run
    :func:`~..operators.ann_index.auto_maintain` over the probed index
    and, when ``maintain_ledger_dir`` is set, append the
    decision/action/decision_after rows to the SAME parquet ledger
    schema curate_stream and the ANN ingest loops write
    (:data:`~..operators.ann_index.MAINTENANCE_LEDGER_SCHEMA`), so
    plan-vs-effect drift is observable with one reader across every
    ``maintain_every=`` loop. Maintenance is layout-only (compaction
    sheds replay duplicates and retires tombstone logs the probes
    already anti-join) — drained answers are pinned unchanged. Thin
    lane-facing shim over the ONE shared
    :func:`~..operators.ann_index.maintenance_tick`."""
    from map_reduce_framework_using_python_spark.operators.ann_index import (
        maintenance_tick,
    )

    maintenance_tick(
        spark, {"ingest": index_path}, batch_id, maintain_every,
        maintain_thresholds, maintain_ledger_dir,
    )


def screen_stream(
    batch_stream: DataFrame,
    corpus: DataFrame,
    index_path: str,
    out_dir: str,
    checkpoint_dir: str,
    threshold: float = 0.6,
    extend_index: bool = False,
    maintain_every: int | None = None,
    maintain_thresholds: dict | None = None,
    maintain_ledger_dir: str | None = None,
) -> DataFrame:
    """Drain ``batch_stream`` (AvailableNow) through the index probe and
    return all pairs found: ``(batch_doc, corpus_doc, jaccard)``.

    ``foreachBatch`` + parquet append + checkpoint: a replayed batch
    (restart between append and checkpoint commit) re-appends its pairs,
    so readers dedup on the pair key — the standard at-least-once
    append sink contract (exactly-once MERGE lives in streaming/cdc.py;
    pairs are idempotent facts, so ``distinct`` is enough here).

    ``extend_index=True`` closes the ingest loop: after screening, each
    batch's band buckets are APPENDED to the index (and its text to a
    ``seen/`` side store for verification), so batch N+1 dedups against
    batches 1..N as well as the corpus — continuous dedup, not just
    corpus screening. Screen-then-append ordering means a batch never
    matches itself; intra-batch duplicates are the one-shot operator's
    job (run it per batch if batches are large enough to self-dup).
    """
    spark = batch_stream.sparkSession
    seen_dir = os.path.join(os.path.dirname(out_dir.rstrip("/")), "seen")

    def probe(batch_df: DataFrame, batch_id: int) -> None:
        from map_reduce_framework_using_python_spark.operators.dedup_index import (
            append_to_index,
        )

        corpus_now = corpus
        if extend_index and os.path.isdir(seen_dir):
            corpus_now = corpus.unionByName(
                spark.read.schema(_DOCS_SCHEMA).parquet(seen_dir)
            )
        pairs = incremental_dedup_pairs(
            spark, batch_df, corpus_now, index_path, threshold=threshold
        )
        pairs.write.mode("append").parquet(out_dir)
        if extend_index:
            append_to_index(batch_df, index_path)
            batch_df.write.mode("append").parquet(seen_dir)
        _maybe_maintain(spark, index_path, batch_id, maintain_every,
                        maintain_thresholds, maintain_ledger_dir)

    q = (
        batch_stream.writeStream.foreachBatch(probe)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if not os.path.isdir(out_dir):
        return spark.createDataFrame([], _PAIRS_SCHEMA)
    return (
        spark.read.schema(_PAIRS_SCHEMA).parquet(out_dir)
        .select("batch_doc", "corpus_doc", "jaccard")
        .distinct()
    )


_PSTATS_SCHEMA = "doc_id BIGINT, n_paras BIGINT, n_dup BIGINT, dup_frac DOUBLE"


def paragraph_screen_stream(
    batch_stream: DataFrame,
    index_path: str,
    out_dir: str,
    checkpoint_dir: str,
    extend_index: bool = True,
    maintain_every: int | None = None,
    maintain_thresholds: dict | None = None,
    maintain_ledger_dir: str | None = None,
) -> DataFrame:
    """Paragraph-level exact-dedup screen on ingest: drain
    ``batch_stream`` (AvailableNow) through the paragraph-digest index
    probe and return every batch document's
    ``(doc_id, n_paras, n_dup, dup_frac)``.

    Per micro-batch: :func:`~..operators.dedup_index
    .incremental_paragraph_stats` (index scan semi-pruned by the
    broadcast batch digest set; the batch's own doc ids are anti-joined
    out of the index first, so a crash-REPLAYED batch that already
    appended itself never self-matches), then — under ``extend_index``
    — :func:`append_paragraphs_to_index`, so batch N+1's paragraphs
    dedup against batches 1..N as well as the corpus. Screen-then-
    append ordering means FIRST occurrences stay clean and every later
    cross-batch instance is flagged (pinned in
    tests/test_paragraph_ingest.py: drained == the one-shot
    paragraph_dedup_stats over (corpus ∪ batches ≤ i) restricted to
    batch-i docs, for every i).

    Sink contract: parquet append + checkpoint (at-least-once); stats
    rows are idempotent per (doc_id), so readers dedup on it."""
    spark = batch_stream.sparkSession

    def probe(batch_df: DataFrame, batch_id: int) -> None:
        from map_reduce_framework_using_python_spark.operators.dedup_index import (
            append_paragraphs_to_index,
            incremental_paragraph_stats,
        )

        stats = incremental_paragraph_stats(spark, batch_df, index_path)
        stats.write.mode("append").parquet(out_dir)
        if extend_index:
            append_paragraphs_to_index(batch_df, index_path)
        _maybe_maintain(spark, index_path, batch_id, maintain_every,
                        maintain_thresholds, maintain_ledger_dir)

    q = (
        batch_stream.writeStream.foreachBatch(probe)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if not os.path.isdir(out_dir):
        return spark.createDataFrame([], _PSTATS_SCHEMA)
    return (
        spark.read.schema(_PSTATS_SCHEMA).parquet(out_dir)
        .select("doc_id", "n_paras", "n_dup", "dup_frac")
        .dropDuplicates(["doc_id"])
    )


_PAPPLY_SCHEMA = "doc_id BIGINT, n_kept BIGINT, clean_text STRING"


def paragraph_apply_stream(
    batch_stream: DataFrame,
    index_path: str,
    out_dir: str,
    checkpoint_dir: str,
    extend_index: bool = True,
    maintain_every: int | None = None,
    maintain_thresholds: dict | None = None,
    maintain_ledger_dir: str | None = None,
) -> DataFrame:
    """APPLY-on-ingest twin of :func:`paragraph_screen_stream`: drain
    the stream rewriting each batch document to keep only paragraphs
    whose FIRST occurrence (min composite key across indexed corpus ∪
    batch) is their own — ``(doc_id, n_kept, clean_text)``; fully-
    boilerplate docs vanish. Screen-then-append ordering makes the
    rule temporal across micro-batches: a paragraph first seen in
    batch 1 survives there and is removed from every later batch
    (pinned against the sequential one-shot fold in
    tests/test_paragraph_ingest.py). The own-id exclusion makes a
    crash-replayed batch rewrite identically."""
    spark = batch_stream.sparkSession

    def rewrite(batch_df: DataFrame, batch_id: int) -> None:
        from map_reduce_framework_using_python_spark.operators.dedup_index import (
            append_paragraphs_to_index,
            incremental_paragraph_apply,
        )

        out = incremental_paragraph_apply(spark, batch_df, index_path)
        out.write.mode("append").parquet(out_dir)
        if extend_index:
            append_paragraphs_to_index(batch_df, index_path)
        _maybe_maintain(spark, index_path, batch_id, maintain_every,
                        maintain_thresholds, maintain_ledger_dir)

    q = (
        batch_stream.writeStream.foreachBatch(rewrite)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if not os.path.isdir(out_dir):
        return spark.createDataFrame([], _PAPPLY_SCHEMA)
    return (
        spark.read.schema(_PAPPLY_SCHEMA).parquet(out_dir)
        .dropDuplicates(["doc_id"])
    )


_SSTATS_SCHEMA = (
    "doc_id BIGINT, n_positions BIGINT, n_dup BIGINT, dup_frac DOUBLE"
)


def span_screen_stream(
    batch_stream: DataFrame,
    index_path: str,
    out_dir: str,
    checkpoint_dir: str,
    extend_index: bool = True,
    maintain_every: int | None = None,
    maintain_thresholds: dict | None = None,
    maintain_ledger_dir: str | None = None,
) -> DataFrame:
    """Exact-substring (ExactSubstr) screen on ingest — the span-level
    twin of :func:`paragraph_screen_stream`: drain ``batch_stream``
    (AvailableNow) through the shingle-digest index probe and return
    every batch document's ``(doc_id, n_positions, n_dup, dup_frac)``.

    Per micro-batch: :func:`~..operators.dedup_index
    .incremental_span_stats` (index scan semi-pruned by the broadcast
    batch digest set; the batch's own ids are anti-joined out first,
    so a crash-replayed batch never self-matches), then — under
    ``extend_index`` — :func:`append_shingles_to_index`, so batch
    N+1's spans dedup against batches 1..N as well as the corpus.
    Screen-then-append keeps first occurrences clean and flags every
    later cross-batch repeat (pinned in tests/test_span_ingest.py:
    drained == per-batch one-shot, cross-batch phrase flagged).

    Sink contract: parquet append + checkpoint (at-least-once); stats
    rows are idempotent per (doc_id), so readers dedup on it."""
    spark = batch_stream.sparkSession

    def probe(batch_df: DataFrame, batch_id: int) -> None:
        from map_reduce_framework_using_python_spark.operators.dedup_index import (
            append_shingles_to_index,
            incremental_span_stats,
        )

        stats = incremental_span_stats(spark, batch_df, index_path)
        stats.write.mode("append").parquet(out_dir)
        if extend_index:
            append_shingles_to_index(batch_df, index_path)
        _maybe_maintain(spark, index_path, batch_id, maintain_every,
                        maintain_thresholds, maintain_ledger_dir)

    q = (
        batch_stream.writeStream.foreachBatch(probe)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if not os.path.isdir(out_dir):
        return spark.createDataFrame([], _SSTATS_SCHEMA)
    return (
        spark.read.schema(_SSTATS_SCHEMA).parquet(out_dir)
        .select("doc_id", "n_positions", "n_dup", "dup_frac")
        .dropDuplicates(["doc_id"])
    )


def retract_stream(
    ids_stream: DataFrame,
    index_path: str,
    checkpoint_dir: str,
    maintain_every: int | None = None,
    maintain_thresholds: dict | None = None,
    maintain_ledger_dir: str | None = None,
) -> None:
    """Takedown requests on a STREAM: drain ``ids_stream`` (AvailableNow;
    first column = doc id) and retract each micro-batch's ids from the
    dedup index at ``index_path`` via
    :func:`~..operators.dedup_index.retract_docs_from_index` — the
    continuous form of the deletion-request queue a real training
    pipeline services. Per-batch cost is O(|batch ids|) (a tombstone
    append; no data rewrite), and because retraction is IDEMPOTENT
    (probes read the DISTINCT tombstone set), the foreachBatch
    at-least-once replay contract needs no extra machinery: a
    crash-replayed batch re-appends the same ids and nothing changes.
    Drained == one-shot (the union of per-batch tombstones equals one
    bulk retraction — pinned in tests/test_dedup_retract.py).

    Ordering note: retraction and index-extending screens share the
    layout; run takedown drains OUTSIDE screen callbacks (the same
    quiescence discipline as compaction). A doc retracted in batch i
    stays invisible to every screen from batch i+1 on; re-appending it
    later (before a compaction purge) keeps it hidden — the tombstone
    wins until compact-then-re-append, the documented un-delete."""

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        from map_reduce_framework_using_python_spark.operators.dedup_index import (
            retract_docs_from_index,
        )

        # No emptiness pre-check: head(1) was a FULL Spark job paid by
        # every batch (the common, non-empty case included) just to
        # skip the rare empty one — and an empty tombstone append is
        # harmless (probes read the DISTINCT set; an empty parquet part
        # adds nothing). The remaining per-batch cost is the advertised
        # O(|batch ids|) append plus driver-side meta/fingerprint file
        # touches (r11 review).
        retract_docs_from_index(batch_df, index_path)
        # The takedown loop is where tombstone_frac actually grows —
        # a maintain tick here lets the stream compact its own delete
        # log once the planner says so (same ledger as every other
        # maintain_every loop). Outer stream session, NOT the
        # micro-batch clone (the sibling lanes' rule; session clones
        # are the r11 resolution-race class).
        _maybe_maintain(
            ids_stream.sparkSession, index_path, batch_id, maintain_every,
            maintain_thresholds, maintain_ledger_dir,
        )

    q = (
        ids_stream.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
