"""Similarity-on-ingest: arriving embedding vectors probed per
micro-batch against the PERSISTED LSH index (operators/ann_index.py) —
the similarity-lane sibling of the dedup screen in streaming/ingest.py.

A 100 TB retrieval/curation pipeline does this continuously: the corpus
index is built ONCE (partitioned by bucket on storage), and each
arriving batch pays only (bucket the batch) + (scan the probed
partition directories) — the corpus embeddings are never re-scanned
outside the probe set, and nothing is re-derived at large.

Sink contract is the ingest-lane standard: ``foreachBatch`` + parquet
append + checkpoint = at-least-once appends of idempotent facts
(a (q_id, vec_id) neighbor edge with its rank); readers dedup on the
pair key. INDEX appends under ``extend_index=True`` are also
at-least-once — a replayed batch re-appends its vectors — which is
why the probe dedups candidates on (query, vector) after scoring,
keeping the max-cosine copy (exact-duplicate rows can never displace
a true neighbor; ``operators/ann_index.py:lsh_probe_index_batch``),
and ``compact_lsh_index`` sheds the duplicate rows from storage during
the quiesce window. Under ``extend_index=True`` a crash between append
and checkpoint commit replays a batch against an index that already
holds the batch's own vectors — so the probe then anti-joins the index
scan against the batch's ids (``exclude_query_ids``), making every
neighbor list a function of (query vector, index-minus-this-batch):
"a batch never matches itself" holds on the first run AND under
replay. Correctness pin (tests/test_ann_batch.py): the drained stream
equals the one-shot batch probe over the same vectors — micro-batch
boundaries cannot change any neighbor list.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from map_reduce_framework_using_python_spark.operators.ann_index import (
    lsh_probe_index_batch,
)

_EMB_SCHEMA = "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT"

_NEIGHBORS_SCHEMA = (
    "q_id BIGINT, vec_id BIGINT, label INT, cosine DOUBLE, rn INT"
)


def read_embeddings_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``embeddings`` as a file-source stream (one file → one
    AvailableNow micro-batch; a real deployment points this at the
    landing directory for freshly embedded documents)."""
    return (
        spark.readStream.schema(_EMB_SCHEMA)
        .option("pathGlobFilter", "embeddings.parquet")
        .option("maxFilesPerTrigger", 1)
        .parquet(sf_dir)
    )


def probe_stream(
    batch_stream: DataFrame,
    index_path: str,
    out_dir: str,
    checkpoint_dir: str,
    k: int = 5,
    probe_hamming: int = 2,
    extend_index: bool = False,
    maintain_every: int | None = None,
    maintain_thresholds: dict | None = None,
    maintain_ledger_dir: str | None = None,
) -> DataFrame:
    """Drain ``batch_stream`` (AvailableNow) through the index probe and
    return every arriving vector's top-k corpus neighbors
    ``(q_id, vec_id, label, cosine, rn)``.

    ``maintain_ledger_dir`` (r13): when set (with ``maintain_every``),
    each tick's decision/action/decision_after rows append to a parquet
    ledger keyed by batch id (the curate_stream observability contract
    — :func:`~.ann_index.write_maintenance_ledger`), so deferred growth
    rebuilds and degradations are visible in the loop's own output.

    ``extend_index=True`` closes the retrieval loop: after probing,
    each batch's vectors are APPENDED to the index
    (:func:`~.ann_index.append_to_lsh_index`), so batch N+1 retrieves
    against batches 1..N as well as the corpus — continuous similarity,
    not just corpus lookup. Probe-then-append ordering plus the
    ``exclude_query_ids`` anti-join means a batch never matches itself
    — including a REPLAYED batch probing an index it already appended
    itself to (the at-least-once crash window between append and
    checkpoint commit).

    ``maintain_every=N`` (r12) makes the loop SELF-MAINTAINING: after
    every Nth batch's append, :func:`~.ann_index.auto_maintain` runs
    against the index — the planner's listing-only signals decide
    compact/noop (a planned rebuild degrades to compact here: the loop
    has no authoritative vector table, and freshness is deferred to an
    offline rebuild), executed INSIDE the sequential foreachBatch
    callback, which is exactly the quiescence window the verbs demand
    (no append can land mid-swap). Maintenance is layout-only, so the
    drained neighbor lists are IDENTICAL with and without it (pinned in
    tests/test_ann_batch.py) — what changes is the layout the NEXT
    batch probes: bounded files per bucket instead of one file per
    (bucket, append) forever."""
    spark = batch_stream.sparkSession

    def probe(batch_df: DataFrame, batch_id: int) -> None:
        from map_reduce_framework_using_python_spark.operators.ann_index import (
            append_to_lsh_index,
            maintenance_tick,
        )

        lsh_probe_index_batch(
            spark, batch_df, index_path, k=k, probe_hamming=probe_hamming,
            exclude_query_ids=extend_index,
        ).write.mode("append").parquet(out_dir)
        if extend_index:
            append_to_lsh_index(batch_df, index_path)
        # the ONE shared self-maintenance tick (r14 dedup of the
        # per-lane copies), inside the sequential callback — the
        # quiescence window
        maintenance_tick(
            spark, {"ingest": index_path}, batch_id, maintain_every,
            maintain_thresholds, maintain_ledger_dir,
        )

    return _drain_probe_stream(batch_stream, probe, out_dir, checkpoint_dir)


def _drain_probe_stream(
    batch_stream: DataFrame,
    probe,
    out_dir: str,
    checkpoint_dir: str,
) -> DataFrame:
    """Shared sink/replay contract for both index layouts: drain the
    AvailableNow stream through ``probe`` per micro-batch, then read
    the neighbor sink back deduped on the (q_id, vec_id) pair key —
    one copy of the trigger/checkpoint/empty-sink/read-back wiring so
    the LSH and IVF loops can never drift apart."""
    spark = batch_stream.sparkSession
    q = (
        batch_stream.writeStream.foreachBatch(probe)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if not os.path.isdir(out_dir):
        return spark.createDataFrame([], _NEIGHBORS_SCHEMA)
    return (
        spark.read.schema(_NEIGHBORS_SCHEMA)
        .parquet(out_dir)
        .dropDuplicates(["q_id", "vec_id"])
    )


def ivf_probe_stream(
    batch_stream: DataFrame,
    index_path: str,
    out_dir: str,
    checkpoint_dir: str,
    k: int = 5,
    n_probe: int = 4,
    extend_index: bool = False,
) -> DataFrame:
    """IVF twin of :func:`probe_stream` — same sink/replay contract,
    same ``(q_id, vec_id, label, cosine, rn)`` read-back, against a
    persisted IVF index (``operators/ann_index.py``). With
    ``extend_index=True`` each probed batch is appended via the
    frozen-quantizer :func:`~.ann_index.append_to_ivf_index` (the
    coarse quantizer is never refit mid-stream — routing stays
    consistent across the whole ingest history), and the probe
    anti-joins the batch's own ids (``exclude_query_ids``) so a
    crash-replayed batch never matches itself."""
    from map_reduce_framework_using_python_spark.operators.ann_index import (
        ivf_probe_index_batch,
    )

    spark = batch_stream.sparkSession

    def probe(batch_df: DataFrame, batch_id: int) -> None:
        from map_reduce_framework_using_python_spark.operators.ann_index import (
            append_to_ivf_index,
        )

        ivf_probe_index_batch(
            spark, batch_df, index_path, k=k, n_probe=n_probe,
            exclude_query_ids=extend_index,
        ).write.mode("append").parquet(out_dir)
        if extend_index:
            append_to_ivf_index(batch_df, index_path)

    return _drain_probe_stream(batch_stream, probe, out_dir, checkpoint_dir)


def ivfpq_probe_stream(
    batch_stream: DataFrame,
    index_path: str,
    vectors: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    k: int = 5,
    n_probe: int = 8,
    shortlist: int = 100,
    extend_index: bool = False,
    maintain_every: int | None = None,
    maintain_thresholds: dict | None = None,
    maintain_ledger_dir: str | None = None,
    n_probe1: int | None = None,
) -> DataFrame:
    """IVF-PQ twin of :func:`probe_stream` — same sink/replay contract,
    same ``(q_id, vec_id, label, cosine, rn)`` read-back, against a
    persisted IVF-PQ index (``operators/ivfpq.py``): per-batch cost is
    (normalize + route + build the per-query ADC tables, all JVM-side)
    + (scan the probed ``centroid_id=`` directories of the m-byte
    CODES — ~3% of the raw embedding bytes) + (rerank the shortlist
    against ``vectors``, the full-vector table the index deliberately
    does not store). With ``extend_index=True`` each probed batch is
    appended via the frozen-quantizer
    :func:`~.ivfpq.append_to_ivfpq_index` (neither quantizer is ever
    refit mid-stream — routing AND codes stay consistent across the
    whole ingest history), and the probe anti-joins the batch's own
    ids (``exclude_query_ids``) so a crash-replayed batch never
    matches itself — the exact LSH/IVF ingest contract."""
    from map_reduce_framework_using_python_spark.operators.ivfpq import (
        ivfpq_probe_index_batch,
    )

    spark = batch_stream.sparkSession

    def probe(batch_df: DataFrame, batch_id: int) -> None:
        from map_reduce_framework_using_python_spark.operators.ivfpq import (
            append_to_ivfpq_index,
        )

        ivfpq_probe_index_batch(
            spark, batch_df, index_path, vectors, k=k, n_probe=n_probe,
            shortlist=shortlist, exclude_query_ids=extend_index,
            # hier indexes may route via the distributed IMI walk (r14)
            n_probe1=n_probe1,
        ).write.mode("append").parquet(out_dir)
        if extend_index:
            append_to_ivfpq_index(batch_df, index_path)
        # the probe_stream self-maintenance contract, composed-lane
        # twin: layout-only (answers identical — the LSH pin's
        # argument holds verbatim), via the ONE shared tick
        from map_reduce_framework_using_python_spark.operators.ann_index import (
            maintenance_tick,
        )

        maintenance_tick(
            spark, {"ingest": index_path}, batch_id, maintain_every,
            maintain_thresholds, maintain_ledger_dir,
        )

    return _drain_probe_stream(batch_stream, probe, out_dir, checkpoint_dir)


def delete_stream(
    ids_stream: DataFrame,
    index_path: str,
    checkpoint_dir: str,
) -> None:
    """Takedown requests for an ANN index on a STREAM: drain
    ``ids_stream`` (AvailableNow; first column = vector id) and
    tombstone each micro-batch's ids via
    :func:`~.ann_index.delete_from_index` — the similarity-lane twin of
    :func:`~.ingest.retract_stream`, closing the loop the ingest
    probes opened: the index the ``st_ann_ingest*`` queries extend can
    now also shed vectors continuously.

    Same contract as the dedup-lane retraction queue: per-batch cost is
    O(|batch ids|) (a tombstone append under ``_tombstones/``; no data
    file rewrite), deletion is IDEMPOTENT (probes anti-join the
    DISTINCT tombstone set), so at-least-once foreachBatch replay needs
    no extra machinery, and the union of per-batch tombstones equals
    one bulk delete — drained == one-shot (pinned in
    tests/test_ann_takedown_stream.py). A tombstone beats copies of
    the id appended AFTER the delete; un-deleting is compact (purge)
    then re-append — the ANN lifecycle's documented semantics."""

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        from map_reduce_framework_using_python_spark.operators.ann_index import (
            delete_from_index,
        )

        delete_from_index(batch_df, index_path)

    q = (
        ids_stream.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
