"""Streaming quality gate: score arriving documents against FROZEN
corpus statistics (a persisted DSIR bucket model) as they land.

The batch query ``ns_dsir_weights`` derives the model and scores the
same corpus in one plan. A real ingest pipeline cannot do that — the
corpus statistics must be trained once, frozen, and applied to data
they never saw, or every arriving batch would shift the yardstick it
is being measured with. This module runs that shape continuously:

- :func:`map_reduce_framework_using_python_spark.operators.dsir.build_dsir_model`
  trains and persists the 256-row model (fingerprint-guarded against
  corpus refresh, like every derived layout in this repo);
- ``gate_stream`` drains a document stream through ``foreachBatch``,
  scoring each micro-batch with the broadcast model and appending
  ``(doc_id, n_tokens, log_weight, keep)`` verdicts to a parquet sink.

Per-micro-batch cost is one map-side tokenize + a broadcast join + a
doc-keyed agg over THE BATCH ONLY — the corpus is never touched after
training, which is what makes quality gating at ingest viable at
100 TB (same argument as dedup-on-ingest, streaming/ingest.py).

Correctness contract (pinned in tests/test_quality_gate.py): the
drained-stream verdicts equal the one-shot batch scoring of the same
documents under the same model — legitimate because each verdict
depends only on (doc, frozen model), never on other batch docs, so
micro-batch boundaries cannot change the answer; and the keep verdict
itself is an exact BIGINT comparison (Σ li ≥ 0), immune to float
reassociation across batches.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_framework_using_python_spark.operators.dsir import (
    dsir_gate,
    load_dsir_model,
)

_VERDICT_SCHEMA = (
    "doc_id BIGINT, n_tokens BIGINT, log_weight DOUBLE, keep BOOLEAN"
)


def gate_stream(
    batch_stream: DataFrame,
    model_path: str,
    out_dir: str,
    checkpoint_dir: str,
) -> DataFrame:
    """Drain ``batch_stream`` (AvailableNow) through the persisted-model
    gate and return all verdicts.

    ``foreachBatch`` + parquet append + checkpoint: a replayed batch
    re-appends its verdicts, so the read-back dedups on doc_id — the
    at-least-once append contract (verdicts are idempotent facts;
    exactly-once MERGE lives in streaming/cdc.py)."""
    spark = batch_stream.sparkSession
    model = load_dsir_model(spark, model_path)

    def score(batch_df: DataFrame, batch_id: int) -> None:
        dsir_gate(batch_df, model, unscored="reject").write.mode(
            "append"
        ).parquet(out_dir)

    q = (
        batch_stream.writeStream.foreachBatch(score)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if not os.path.isdir(out_dir):
        return spark.createDataFrame([], _VERDICT_SCHEMA)
    return (
        spark.read.schema(_VERDICT_SCHEMA)
        .parquet(out_dir)
        .dropDuplicates(["doc_id"])
    )


_DRIFT_SCHEMA = "batch_id BIGINT, n_tokens BIGINT, psi DOUBLE"


def drift_stream(
    batch_stream: DataFrame,
    model_path: str,
    out_dir: str,
    checkpoint_dir: str,
) -> DataFrame:
    """Per-micro-batch drift alarm: PSI of each arriving batch against
    the FROZEN corpus bucket counts persisted with the model
    (operators/dsir.py:psi_vs_counts) — the monitor that notices a feed
    delivering different text than the corpus the models were trained
    on, while it happens rather than at the next full corpus report.

    Emits ``(batch_id, n_tokens, psi)`` per non-empty batch. The PSI
    VALUE is batch-deterministic (integer-grid terms), but batch
    BOUNDARIES are a property of the stream, not the data — so this op
    is pinned against the one-shot computation per batch (rows-only,
    never SQL-oracled). Cost per batch: one map-side tokenize + a
    256-row broadcast join; the corpus is never touched."""
    spark = batch_stream.sparkSession
    from map_reduce_framework_using_python_spark.operators.dsir import (
        load_bucket_counts,
        psi_vs_counts,
    )

    counts = load_bucket_counts(spark, model_path)

    def measure(batch_df: DataFrame, batch_id: int) -> None:
        psi_vs_counts(batch_df, counts).select(
            F.lit(batch_id).cast("bigint").alias("batch_id"),
            "n_tokens",
            "psi",
        ).write.mode("append").parquet(out_dir)

    q = (
        batch_stream.writeStream.foreachBatch(measure)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if not os.path.isdir(out_dir):
        return spark.createDataFrame([], _DRIFT_SCHEMA)
    return (
        spark.read.schema(_DRIFT_SCHEMA)
        .parquet(out_dir)
        .dropDuplicates(["batch_id"])
    )


def semdecon_stream(
    vec_stream: DataFrame,
    bench: DataFrame,
    tau6: int,
    out_dir: str,
    checkpoint_dir: str,
) -> DataFrame:
    """Semantic decontamination on ingest: score each arriving
    micro-batch of vectors against the FROZEN benchmark suite with the
    same shared core the batch query uses
    (operators/similarity.benchmark_max_cosine) and append the
    verdicts. The benchmark is fixed by construction (an eval suite,
    not the corpus), so unlike the DSIR gate there is no model to
    train — the suite itself broadcasts into every batch's map-side
    scoring pass.

    Drained == one-shot batch (pinned in tests/test_quality_gate.py)
    because each verdict depends only on (vector, bench, τ) — never on
    other batch members — and the flag is a BIGINT grid comparison,
    immune to float reassociation across batches. Same at-least-once
    append + read-back-dedup contract as :func:`gate_stream`."""
    from map_reduce_framework_using_python_spark.operators.similarity import (
        benchmark_max_cosine,
    )

    spark = vec_stream.sparkSession
    bench = bench.persist()  # re-broadcast per batch, re-scan never
    # Read-back schema derived from the scoring plan itself (an empty
    # frame with the stream's schema through the shared core — a plan
    # build, no action), not a hardcoded string: a caller whose
    # embeddings carry a BIGINT label (or different key types) gets
    # its own types back instead of a read-back schema mismatch.
    out_schema = benchmark_max_cosine(
        spark.createDataFrame([], vec_stream.schema), bench, tau6
    ).schema

    def score(batch_df: DataFrame, batch_id: int) -> None:
        benchmark_max_cosine(batch_df, bench, tau6).write.mode(
            "append"
        ).parquet(out_dir)

    q = (
        vec_stream.writeStream.foreachBatch(score)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    bench.unpersist()
    if not os.path.isdir(out_dir):
        return spark.createDataFrame([], out_schema)
    return (
        spark.read.schema(out_schema)
        .parquet(out_dir)
        .dropDuplicates(["vec_id"])
    )


_TAG_SCHEMA = "doc_id BIGINT, p_toxic DOUBLE, flagged BOOLEAN"


def tagger_stream(
    batch_stream: DataFrame,
    model,
    out_dir: str,
    checkpoint_dir: str,
    tau: float = 0.3,
) -> DataFrame:
    """Drain ``batch_stream`` through a PRE-FITTED toxicity tagger
    (operators/quality_model.score_tagger) and return all verdicts —
    the tagger twin of :func:`gate_stream`: the model is trained once
    and FROZEN before the stream starts (or every arriving batch would
    shift the yardstick), each micro-batch costs one map-side
    hashed-featurize + the broadcast-coefficient fold, and the corpus
    is never touched after training. The fitted model object lives in
    the foreachBatch closure, which runs DRIVER-side — scoring embeds
    only the 256 coefficient literals in the plan, so nothing
    non-serializable ever reaches a task (the score_quality rule).
    Same at-least-once sink contract as gate_stream (verdicts are
    idempotent facts keyed by doc_id; read-back dedups); drained ==
    one-shot pinned in tests/test_quality_model.py — each verdict
    depends only on (doc, frozen model), and the flag compares the
    1e-6-quantized probability to tau, immune to batch boundaries."""
    spark = batch_stream.sparkSession
    from map_reduce_framework_using_python_spark.operators.quality_model import (
        score_tagger,
    )

    def score(batch_df: DataFrame, batch_id: int) -> None:
        score_tagger(batch_df, model, tau=tau).write.mode("append").parquet(
            out_dir
        )

    q = (
        batch_stream.writeStream.foreachBatch(score)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if not os.path.isdir(out_dir):
        return spark.createDataFrame([], _TAG_SCHEMA)
    return (
        spark.read.schema(_TAG_SCHEMA)
        .parquet(out_dir)
        .dropDuplicates(["doc_id"])
    )
