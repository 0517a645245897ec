"""One-pass ingest curation: the capstone composition of the round-5
ingest lane. Per arriving micro-batch, against artifacts all FROZEN at
corpus-build time:

1. **near-dup screen** — probe the persisted MinHash band-bucket index
   (operators/dedup_index.py); batch docs that collide-and-verify
   against the corpus are rejected as ``duplicate``;
2. **quality gate** — score survivors with the persisted DSIR bucket
   model (operators/dsir.py); Σ li < 0 rejects as ``low_quality``;
3. **drift alarm** — the batch's PSI against the frozen corpus bucket
   counts, recorded per batch whether or not anything was rejected.

Outputs three append sinks under one root: ``curated/`` (accepted docs
with their scores), ``rejected/`` (doc_id + reason, duplicate taking
precedence), ``metrics/`` (batch_id, volume, rejection counts, psi).

This is the pipeline a 100 TB ingest actually runs: every per-batch
cost is (sketch the batch) + (scan the fixed-width index) + (broadcast
a 256-row model) — the corpus text is touched only to verify dedup
CANDIDATES, and nothing is ever re-derived from the corpus at large.

Correctness contract (tests/test_curation.py): the drained stream's
curated/rejected/metrics sets equal the one-shot composition of the
three batch operators over the same documents — every verdict depends
only on (doc, frozen artifacts), so micro-batch boundaries cannot
change any of them.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_framework_using_python_spark.operators.dedup_index import (
    incremental_dedup_pairs,
)
from map_reduce_framework_using_python_spark.operators.dsir import (
    dsir_gate,
    load_bucket_counts,
    load_dsir_model,
    model_meta,
    psi_vs_counts,
)

_CURATED_SCHEMA = "doc_id BIGINT, n_tokens BIGINT, log_weight DOUBLE"
_REJECTED_SCHEMA = "doc_id BIGINT, reason STRING"
# r11: n_span_duplicate joined the partition (the ExactSubstr reject
# leg). Metrics written by earlier rounds lack the column — see
# README "Migration notes".
_METRICS_SCHEMA = (
    "batch_id BIGINT, n_in BIGINT, n_duplicate BIGINT, n_boilerplate BIGINT,"
    " n_span_duplicate BIGINT, n_contaminated BIGINT, n_low_quality BIGINT,"
    " n_curated BIGINT, psi DOUBLE"
)


def curate_batch(
    spark: SparkSession,
    batch: DataFrame,
    corpus: DataFrame,
    index_path: str,
    model_path: str,
    threshold: float = 0.6,
    witness_cap: int | None = None,
    paragraph_index_path: str | None = None,
    max_dup_frac: float = 0.3,
    decon_bench_path: str | None = None,
    decon_tau6: int = 900_000,
    span_index_path: str | None = None,
    max_span_dup_frac: float = 0.5,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """One-shot curation of a document frame: returns (curated,
    rejected, metrics-without-batch_id). The streaming path calls this
    per micro-batch; tests call it directly as the ground truth.

    ``witness_cap`` (None = exact) passes through to the dedup screen —
    the screen only needs ONE verified corpus witness per batch doc, so
    a boilerplate-hot persisted bucket can be represented by its
    ``witness_cap`` min-id members. The verdict guarantee is
    PROBABILISTIC, not absolute (operators/dedup_index.py): a bucket
    certifies agreement on one band's r hashes, so a batch doc whose
    only true near-duplicate ranks above the K witnesses in EVERY
    shared bucket is missed. In the regime the cap targets — oversize
    buckets are true boilerplate clusters — any witness verifies and
    verdicts are preserved; size r (num_hashes/bands) and K per the
    dedup_index guidance rather than defaulting to a tiny cap. Set it
    in 100 TB deployments; the pinned drained==one-shot contract holds
    for any value because both paths share it.

    ``paragraph_index_path`` (r7) adds the sub-document leg: docs whose
    paragraph duplicate fraction against the paragraph-digest index
    (operators/dedup_index.incremental_paragraph_stats) exceeds
    ``max_dup_frac`` are rejected as ``boilerplate`` — the RefinedWeb
    "mostly template" removal the document-level screen cannot see.

    ``decon_bench_path`` (r9) adds the semantic-decontamination leg:
    the batch is hash-embedded (the same frozen featurizer that built
    the persisted benchmark table —
    operators/similarity.build_semdecon_bench) and any doc whose max
    cosine against that table clears ``decon_tau6`` on the 1e-6 grid is
    rejected as ``contaminated`` — the paraphrased-eval-leak screen the
    n-gram dedup legs cannot see. The default ``decon_tau6=900_000`` is
    the DOC-SPACE calibration (plans/pipeline6._DOC_DECON_TAU6): this
    leg always scores in the crowded 16-dim hash-embed bag-of-words
    space, where unrelated documents routinely reach cosine 0.3–0.6 —
    measured on the synthetic corpus, τ=0.30 flags 207 organic docs
    (tools/curation_probe.py). Lower it only with a benchmark embedded
    in a roomier space. Per-batch cost: one map-side embed +
    a broadcast of the fixed-size benchmark table; docs the embedder
    cannot score (no tokens) pass the leg unflagged (the quality gate
    rejects them downstream).

    ``span_index_path`` (r11) adds the ExactSubstr leg: docs whose
    fraction of stride-1 token-shingle positions duplicated against
    the persisted shingle index
    (operators/dedup_index.incremental_span_stats — the Lee et al.
    variable-length grid) exceeds ``max_span_dup_frac`` reject as
    ``span_duplicate`` — the "mostly verbatim-copied runs" page the
    document-level MinHash screen (different overall 3-gram profile)
    and the paragraph leg (copy offsets break fixed-chunk alignment)
    both miss. Per-batch cost mirrors the paragraph leg: only the
    batch is shingled, one scan of the fixed-width instance table
    semi-pruned by the broadcast batch digest set, one batch-sized
    digest window. Reason precedence:
    duplicate > boilerplate > span_duplicate > contaminated >
    low_quality (the three n-gram/dedup legs ahead of the semantic
    one, document-level before sub-document)."""
    dups = (
        incremental_dedup_pairs(
            spark, batch, corpus, index_path, threshold=threshold,
            witness_cap=witness_cap,
        )
        .select(F.col("batch_doc").alias("doc_id"))
        .distinct()
    )
    # Gate at the model's frozen operating point (the corpus median
    # per-token ratio calibrated at build time), not the absolute axis.
    # unscored="reject": a doc the gate cannot score (empty text /
    # uncovered buckets) gates to keep=False instead of silently
    # vanishing between curated and rejected — the partition invariant
    # lives in the OPERATOR now (operators/dsir.dsir_gate), shared by
    # every gate consumer.
    scored = dsir_gate(
        batch,
        load_dsir_model(spark, model_path),
        tau=model_meta(model_path).get("tau", 0.0),
        unscored="reject",
    )
    dup_flagged = scored.join(
        dups.withColumn("_dup", F.lit(True)), "doc_id", "left"
    ).withColumn("_dup", F.coalesce(F.col("_dup"), F.lit(False)))
    if paragraph_index_path is not None:
        from map_reduce_framework_using_python_spark.operators.dedup_index import (
            incremental_paragraph_stats,
        )

        boiler = (
            incremental_paragraph_stats(spark, batch, paragraph_index_path)
            .filter(F.col("dup_frac") > max_dup_frac)
            .select("doc_id")
            .withColumn("_boiler", F.lit(True))
        )
        dup_flagged = dup_flagged.join(boiler, "doc_id", "left").withColumn(
            "_boiler", F.coalesce(F.col("_boiler"), F.lit(False))
        )
    else:
        dup_flagged = dup_flagged.withColumn("_boiler", F.lit(False))
    if span_index_path is not None:
        from map_reduce_framework_using_python_spark.operators.dedup_index import (
            incremental_span_stats,
        )

        span_hot = (
            incremental_span_stats(spark, batch, span_index_path)
            .filter(F.col("dup_frac") > max_span_dup_frac)
            .select("doc_id")
            .withColumn("_span", F.lit(True))
        )
        dup_flagged = dup_flagged.join(span_hot, "doc_id", "left").withColumn(
            "_span", F.coalesce(F.col("_span"), F.lit(False))
        )
    else:
        dup_flagged = dup_flagged.withColumn("_span", F.lit(False))
    if decon_bench_path is not None:
        from map_reduce_framework_using_python_spark.operators.similarity import (
            benchmark_max_cosine,
            hash_embed_array,
        )

        contaminated = (
            benchmark_max_cosine(
                hash_embed_array(batch),
                spark.read.parquet(decon_bench_path),
                decon_tau6,
                vec_col="emb",
                id_col="doc_id",
                label_col=None,
            )
            .filter(F.col("contaminated"))
            .select("doc_id")
            .withColumn("_contam", F.lit(True))
        )
        dup_flagged = dup_flagged.join(contaminated, "doc_id", "left").withColumn(
            "_contam", F.coalesce(F.col("_contam"), F.lit(False))
        )
    else:
        dup_flagged = dup_flagged.withColumn("_contam", F.lit(False))
    # The three outputs below all derive from this frame; persisted
    # (lazily) so the dedup text verification, DSIR scoring, and
    # paragraph screen run ONCE per batch instead of once per sink
    # action (r7 streaming review measured 3×; the ContextCleaner
    # reclaims it when the outputs are dereferenced).
    dup_flagged = dup_flagged.persist()
    ok = (
        ~F.col("_dup") & ~F.col("_boiler") & ~F.col("_span") & ~F.col("_contam")
    )
    curated = dup_flagged.filter(ok & F.col("keep")).select(
        "doc_id", "n_tokens", "log_weight"
    )
    rejected = dup_flagged.filter(~ok | ~F.col("keep")).select(
        "doc_id",
        F.when(F.col("_dup"), "duplicate")
        .when(F.col("_boiler"), "boilerplate")
        .when(F.col("_span"), "span_duplicate")
        .when(F.col("_contam"), "contaminated")
        .otherwise("low_quality")
        .alias("reason"),
    )
    psi = psi_vs_counts(batch, load_bucket_counts(spark, model_path))
    metrics = (
        dup_flagged.agg(
            F.count("*").alias("n_in"),
            F.sum(F.col("_dup").cast("long")).alias("n_duplicate"),
            F.sum((~F.col("_dup") & F.col("_boiler")).cast("long")).alias(
                "n_boilerplate"
            ),
            F.sum(
                (~F.col("_dup") & ~F.col("_boiler") & F.col("_span")).cast("long")
            ).alias("n_span_duplicate"),
            F.sum(
                (
                    ~F.col("_dup") & ~F.col("_boiler") & ~F.col("_span")
                    & F.col("_contam")
                ).cast("long")
            ).alias("n_contaminated"),
            F.sum((ok & ~F.col("keep")).cast("long")).alias("n_low_quality"),
            F.sum((ok & F.col("keep")).cast("long")).alias("n_curated"),
        )
        # LEFT join on TRUE, not crossJoin: psi_vs_counts returns zero
        # rows for an EMPTY batch (its n_tokens>0 filter), and a cross
        # join would annihilate the metrics row exactly when the
        # accounting gap matters (r7 streaming review) — the row
        # survives with psi NULL instead.
        .join(psi.select("psi"), F.lit(True), "left")
    )
    return curated, rejected, metrics


def _takedown_id_col(columns: list[str]) -> str:
    """Which queue-file column carries the doc ids: a NAMED ``doc_id``
    column wins when present; otherwise the FIRST column, positionally
    (the documented contract, matching delete_from_index's first-column
    rule — a queue file whose id column carries another name must not
    abort the drain mid-run after some indexes were already retracted).
    The name-first rule (r13 ADVICE) keeps a queue file that gained a
    leading non-id column (e.g. a prepended timestamp) from silently
    retracting the wrong values."""
    return "doc_id" if "doc_id" in columns else columns[0]


def curate_stream(
    batch_stream: DataFrame,
    corpus: DataFrame,
    index_path: str,
    model_path: str,
    out_root: str,
    checkpoint_dir: str,
    threshold: float = 0.6,
    witness_cap: int | None = None,
    paragraph_index_path: str | None = None,
    max_dup_frac: float = 0.3,
    decon_bench_path: str | None = None,
    decon_tau6: int = 900_000,
    span_index_path: str | None = None,
    max_span_dup_frac: float = 0.5,
    takedown_queue_dir: str | None = None,
    maintain_every: int | None = None,
    maintain_thresholds: dict | None = None,
) -> DataFrame:
    """Drain ``batch_stream`` (AvailableNow) through the full curation
    pass and return the curated read-back. Sinks are at-least-once
    appends (idempotent facts; readers dedup on doc_id / batch_id —
    the streaming/ingest.py contract).

    ``takedown_queue_dir``: optional landing directory of parquet id
    files (first column = doc id) — the deletion-request queue serviced
    AS MAINTENANCE BETWEEN MICRO-BATCHES (r12): before each batch is
    screened, any id file not yet consumed this run is retracted from
    every index the screens probe (dedup, paragraph, span — via
    :func:`~..operators.dedup_index.retract_docs_from_index`), so a
    doc taken down in the queue stops influencing every LATER batch's
    verdicts. Consumption is tracked per RUN only; a restart re-reads
    the whole queue, which is safe because retraction is idempotent
    (tombstone appends; probes read the DISTINCT set). Witness-capped
    (pruned) index layouts refuse retraction by design — route
    takedowns at the exact layout and re-prune. The metrics schema is
    unchanged: takedown is index maintenance, not a verdict class.

    ``maintain_every=N`` (r13) closes the loop the takedown queue
    opened: after every Nth batch's sinks land —
    inside the foreachBatch quiescence window (micro-batches are
    serial per stream), the ann_ingest self-maintenance pattern —
    :func:`~..operators.ann_index.auto_maintain` runs over every index
    the screens probe (dedup / paragraph / span), so queue-driven
    tombstone growth and append fan-out are compacted by the stream
    itself instead of waiting for an operator. Each decision /
    action / decision_after row is appended to an
    ``out_root/maintenance`` sidecar keyed by batch_id
    (:func:`read_maintenance`); the verdict metrics schema stays
    untouched. Maintenance is layout-only (compaction sheds replay
    duplicates and retires tombstone logs the probes already
    anti-join), so drained results are byte-identical with or without
    it — pinned in tests/test_curation.py."""
    spark = batch_stream.sparkSession
    consumed: set[str] = set()

    def _drain_takedowns() -> None:
        if not takedown_queue_dir or not os.path.isdir(takedown_queue_dir):
            return
        import glob as _glob

        from map_reduce_framework_using_python_spark.operators.dedup_index import (
            retract_docs_from_index,
        )

        files = sorted(
            f
            for f in _glob.glob(os.path.join(takedown_queue_dir, "*.parquet"))
            if f not in consumed
        )
        if not files:
            return
        queued = spark.read.parquet(*files)
        ids = queued.select(
            F.col(_takedown_id_col(queued.columns)).alias("doc_id")
        )
        for target in (index_path, paragraph_index_path, span_index_path):
            if target is not None:
                retract_docs_from_index(ids, target)
        consumed.update(files)

    def _maintain(batch_id: int) -> None:
        from map_reduce_framework_using_python_spark.operators.ann_index import (
            maintenance_tick,
        )

        targets = {
            name: p
            for name, p in (
                ("dedup", index_path),
                ("paragraph", paragraph_index_path),
                ("span", span_index_path),
            )
            if p is not None
        }
        # the ONE shared tick (r14); curate_stream's ledger is always
        # on — it lives in the stream's own out_root
        maintenance_tick(
            spark, targets, batch_id, maintain_every,
            maintain_thresholds, os.path.join(out_root, "maintenance"),
        )

    def curate(batch_df: DataFrame, batch_id: int) -> None:
        _drain_takedowns()
        curated, rejected, metrics = curate_batch(
            spark, batch_df, corpus, index_path, model_path,
            threshold=threshold, witness_cap=witness_cap,
            paragraph_index_path=paragraph_index_path,
            max_dup_frac=max_dup_frac,
            decon_bench_path=decon_bench_path,
            decon_tau6=decon_tau6,
            span_index_path=span_index_path,
            max_span_dup_frac=max_span_dup_frac,
        )
        curated.write.mode("append").parquet(os.path.join(out_root, "curated"))
        rejected.write.mode("append").parquet(os.path.join(out_root, "rejected"))
        metrics.select(
            F.lit(batch_id).cast("bigint").alias("batch_id"),
            "n_in",
            "n_duplicate",
            "n_boilerplate",
            "n_span_duplicate",
            "n_contaminated",
            "n_low_quality",
            "n_curated",
            "psi",
        ).write.mode("append").parquet(os.path.join(out_root, "metrics"))
        if maintain_every and (batch_id + 1) % maintain_every == 0:
            # after the batch's sinks land = the quiescence window
            # (micro-batches are serial per stream; nothing appends or
            # probes the indexes until the next batch starts)
            _maintain(batch_id)

    q = (
        batch_stream.writeStream.foreachBatch(curate)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    path = os.path.join(out_root, "curated")
    if not os.path.isdir(path):
        return spark.createDataFrame([], _CURATED_SCHEMA)
    return (
        spark.read.schema(_CURATED_SCHEMA).parquet(path).dropDuplicates(["doc_id"])
    )


def read_rejected(spark: SparkSession, out_root: str) -> DataFrame:
    path = os.path.join(out_root, "rejected")
    if not os.path.isdir(path):
        return spark.createDataFrame([], _REJECTED_SCHEMA)
    return spark.read.schema(_REJECTED_SCHEMA).parquet(path).dropDuplicates(["doc_id"])


def read_metrics(spark: SparkSession, out_root: str) -> DataFrame:
    path = os.path.join(out_root, "metrics")
    if not os.path.isdir(path):
        return spark.createDataFrame([], _METRICS_SCHEMA)
    return spark.read.schema(_METRICS_SCHEMA).parquet(path).dropDuplicates(["batch_id"])


from map_reduce_framework_using_python_spark.operators.ann_index import (  # noqa: E402
    MAINTENANCE_LEDGER_SCHEMA as _MAINTENANCE_SCHEMA,
)


def read_maintenance(spark: SparkSession, out_root: str) -> DataFrame:
    """The self-maintenance ledger ``curate_stream(maintain_every=N)``
    appends: one row per (maintenance tick, probed index) with the
    planner's decision, the action taken, and the post-action re-plan
    — drift between plan and effect stays observable in the stream's
    own output, the auto_maintain contract."""
    path = os.path.join(out_root, "maintenance")
    if not os.path.isdir(path):
        return spark.createDataFrame([], _MAINTENANCE_SCHEMA)
    return spark.read.schema(_MAINTENANCE_SCHEMA).parquet(path)
