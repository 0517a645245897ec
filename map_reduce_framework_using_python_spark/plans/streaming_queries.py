"""Streaming queries in the driver contract: each runs a Structured
Streaming job to completion (Trigger.AvailableNow over the events
parquet) and returns the materialized result.

Because complete-mode windowed aggregation over a fully-replayed bounded
stream equals the batch aggregation, these carry real DuckDB oracles —
the streaming engine itself is under the correctness gate, not just the
expression logic. Only the watermark-dependent dedup is rows-only (its
output depends on micro-batch boundaries by design).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_framework_using_python_spark.plans.core import query
from map_reduce_framework_using_python_spark.streaming.stateful import stateful_user_totals
from map_reduce_framework_using_python_spark.streaming.windows import (
    dedup_within_watermark,
    interval_join_clicks_purchases,
    read_events_stream,
    run_available_now,
    session_window_counts,
    sliding_window_agg,
    tumbling_window_agg,
)


def _uniq(prefix: str) -> str:
    return f"{prefix}_{uuid.uuid4().hex[:8]}"


@query(
    "st_tumbling_window",
    oracle="""
        SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
               event_type,
               count(*) AS n_events,
               round(sum(value), 2) AS total_value
        FROM events
        GROUP BY 1, 2
    """,
    tags=("streaming", "window_time"),
)
def st_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling windows computed BY THE STREAMING ENGINE
    (AvailableNow replay, complete mode) — must equal the batch oracle."""
    return run_available_now(
        tumbling_window_agg(read_events_stream(spark, sf_dir)),
        _uniq("st_tumbling"),
        output_mode="complete",
    )


@query(
    "st_sliding_window",
    oracle="""
        SELECT ws AS window_start, count(*) AS n_events, round(sum(value), 2) AS total_value
        FROM (
            SELECT unnest([date_trunc('hour', CAST(ts AS TIMESTAMP)),
                           date_trunc('hour', CAST(ts AS TIMESTAMP)) - INTERVAL 1 HOUR]) AS ws,
                   value
            FROM events)
        GROUP BY ws
    """,
    tags=("streaming", "window_time"),
)
def st_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2h/1h sliding windows via the streaming engine."""
    return run_available_now(
        sliding_window_agg(read_events_stream(spark, sf_dir)),
        _uniq("st_sliding"),
        output_mode="complete",
    )


@query(
    "st_session_window",
    oracle="""
        WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        g AS (
            SELECT user_id, ts,
                   CASE WHEN lag(ts) OVER w IS NULL
                          OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END AS is_new
            FROM e
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        s AS (
            SELECT user_id, ts,
                   sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
            FROM g)
        SELECT min(ts) AS session_start,
               max(ts) + INTERVAL 30 MINUTE AS session_end,
               user_id,
               count(*) AS n_events
        FROM s
        GROUP BY user_id, sid
    """,
    tags=("streaming", "session"),
)
def st_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native ``session_window`` sessionization (30-min gap) via the
    streaming engine. Session semantics are half-open: a gap of exactly
    the threshold starts a new session (hence ``>=`` in the oracle), and
    session_end = last event + gap."""
    return run_available_now(
        session_window_counts(read_events_stream(spark, sf_dir)),
        _uniq("st_session"),
        output_mode="complete",
    )


@query(
    "st_stateful_totals",
    oracle="""
        SELECT user_id, count(*) AS n_events, round(sum(value), 2) AS total_value
        FROM events
        GROUP BY user_id
    """,
    tags=("streaming", "stateful"),
)
def st_stateful_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandasWithState running totals, replayed to completion —
    final state per user must equal the batch aggregate. (Update-mode
    sink may hold one row per micro-batch per user; AvailableNow over a
    single parquet file yields exactly one.)"""
    from pyspark.sql import functions as F

    out = run_available_now(
        stateful_user_totals(read_events_stream(spark, sf_dir)),
        _uniq("st_state"),
        output_mode="update",
    )
    # Keep the latest state per user (robust to multi-batch replays).
    # n_events is monotonic by construction (one increment per event),
    # so max_by picks the most recent state; max(total_value) would be
    # wrong if values could be negative (a stale larger intermediate
    # total would win).
    return out.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max_by("total_value", "n_events").alias("total_value"),
    )


@query(
    "st_stream_join",
    oracle="""
        SELECT c.user_id,
               c.event_id AS click_id,
               p.event_id AS purchase_id,
               p.value AS purchase_value
        FROM events c JOIN events p ON c.user_id = p.user_id
        WHERE c.event_type = 'click' AND p.event_type = 'purchase'
          AND CAST(p.ts AS TIMESTAMP) >= CAST(c.ts AS TIMESTAMP)
          AND CAST(p.ts AS TIMESTAMP) <= CAST(c.ts AS TIMESTAMP) + INTERVAL 30 MINUTE
    """,
    tags=("streaming", "join"),
)
def st_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (click → purchase attribution within
    30 min) executed BY THE STREAMING ENGINE over two independent file
    streams; inner-join semantics make the AvailableNow replay equal the
    batch join, so this carries a full oracle. purchase_value is a raw
    column passthrough (no rounding)."""
    return run_available_now(
        interval_join_clicks_purchases(
            read_events_stream(spark, sf_dir), read_events_stream(spark, sf_dir)
        ),
        _uniq("st_join"),
        output_mode="append",
    )


@query(
    "st_stream_join_left",
    oracle="""
        WITH e AS (SELECT user_id, event_id, event_type, value,
                          CAST(ts AS TIMESTAMP) AS ts FROM events),
        c AS (SELECT user_id, event_id AS click_id, ts AS click_ts
              FROM e WHERE event_type = 'click'),
        p AS (SELECT user_id AS p_user_id, event_id AS purchase_id,
                     ts AS purchase_ts, value AS purchase_value
              FROM e WHERE event_type = 'purchase'),
        wm AS (SELECT least((SELECT max(click_ts) FROM c),
                            (SELECT max(purchase_ts) FROM p))
                      - INTERVAL 1 HOUR AS w),
        j AS (SELECT c.user_id, c.click_id, c.click_ts,
                     p.purchase_id, p.purchase_value
              FROM c LEFT JOIN p ON p.p_user_id = c.user_id
                 AND p.purchase_ts >= c.click_ts
                 AND p.purchase_ts <= c.click_ts + INTERVAL 30 MINUTE)
        SELECT user_id, click_id, purchase_id, purchase_value
        FROM j, wm
        WHERE purchase_id IS NOT NULL
           OR click_ts + INTERVAL 30 MINUTE < wm.w
    """,
    tags=("streaming", "join", "outer"),
)
def st_stream_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER interval join: matched rows emit
    immediately; an unmatched click's NULL row emits only when the
    global watermark (min of both sides') passes click_ts + horizon —
    earlier, a matching purchase could still arrive. The oracle encodes
    that rule exactly: batch left join, null-extended rows restricted to
    ``click_ts + horizon < least(max_click, max_purchase) − delay``
    (tail clicks inside the closing window stay withheld on a bounded
    replay — state-cleanup semantics the inner join never exposes)."""
    return run_available_now(
        interval_join_clicks_purchases(
            read_events_stream(spark, sf_dir),
            read_events_stream(spark, sf_dir),
            how="left_outer",
        ),
        _uniq("st_join_left"),
        output_mode="append",
    )


@query(
    "st_stream_join_full",
    oracle="""
        WITH e AS (SELECT user_id, event_id, event_type, value,
                          CAST(ts AS TIMESTAMP) AS ts FROM events),
        c AS (SELECT user_id, event_id AS click_id, ts AS click_ts
              FROM e WHERE event_type = 'click'),
        p AS (SELECT user_id AS p_user_id, event_id AS purchase_id,
                     ts AS purchase_ts, value AS purchase_value
              FROM e WHERE event_type = 'purchase'),
        wm AS (SELECT least((SELECT max(click_ts) FROM c),
                            (SELECT max(purchase_ts) FROM p))
                      - INTERVAL 1 HOUR AS w),
        m AS (SELECT c.user_id, c.click_id, c.click_ts,
                     p.purchase_id, p.purchase_value
              FROM c JOIN p ON p.p_user_id = c.user_id
                 AND p.purchase_ts >= c.click_ts
                 AND p.purchase_ts <= c.click_ts + INTERVAL 30 MINUTE)
        SELECT user_id, click_id, purchase_id, purchase_value FROM m
        UNION ALL
        SELECT c.user_id, c.click_id, NULL, NULL
        FROM c, wm
        WHERE NOT EXISTS (SELECT 1 FROM m WHERE m.click_id = c.click_id)
          AND c.click_ts + INTERVAL 30 MINUTE < wm.w
        UNION ALL
        SELECT p.p_user_id, NULL, p.purchase_id, p.purchase_value
        FROM p, wm
        WHERE NOT EXISTS (SELECT 1 FROM m WHERE m.purchase_id = p.purchase_id)
          AND p.purchase_ts < wm.w
    """,
    tags=("streaming", "join", "outer"),
)
def st_stream_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream FULL OUTER interval join — completes the
    inner/left/full set: matched rows emit immediately; each side's
    unmatched rows null-extend when the global watermark closes THAT
    side's match window, and the windows are asymmetric because the
    range condition is: a click waits out the forward horizon
    (``click_ts + horizon < W``, the left join's rule) while a
    purchase — whose latest matching click is at purchase_ts itself —
    closes at ``purchase_ts < W``. Both rules fitted and verified
    empirically at sf0.01, where the candidate predicates diverge
    (streaming/windows.py docstring); the oracle encodes them exactly,
    with user_id coalesced so purchase-only rows keep theirs."""
    return run_available_now(
        interval_join_clicks_purchases(
            read_events_stream(spark, sf_dir),
            read_events_stream(spark, sf_dir),
            how="full_outer",
        ),
        _uniq("st_join_full"),
        output_mode="append",
    )


@query(
    "st_stream_join_semi",
    oracle="""
        WITH e AS (SELECT user_id, event_id, event_type, value,
                          CAST(ts AS TIMESTAMP) AS ts FROM events),
        c AS (SELECT user_id, event_id AS click_id, ts AS click_ts
              FROM e WHERE event_type = 'click'),
        p AS (SELECT user_id AS p_user_id, ts AS purchase_ts
              FROM e WHERE event_type = 'purchase')
        SELECT c.user_id, c.click_id
        FROM c
        WHERE EXISTS (SELECT 1 FROM p
                      WHERE p.p_user_id = c.user_id
                        AND p.purchase_ts >= c.click_ts
                        AND p.purchase_ts <= c.click_ts + INTERVAL 30 MINUTE)
    """,
    tags=("streaming", "join", "semi"),
)
def st_stream_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT SEMI interval join — the conversion screen
    ("clicks that led to a purchase within the horizon", each click at
    most once) closing the join matrix: inner, left, full, semi. No
    null-emission rule exists to fit: a semi row emits as soon as the
    first match arrives and state expiry only DROPS unmatched state,
    so a bounded AvailableNow replay equals the batch EXISTS exactly —
    which is why this one gets a plain full oracle while the outer
    twins needed their watermark-gating predicates fitted."""
    clicks = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            "user_id",
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    purchases = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr("INTERVAL 30 minutes")
        ),
        "left_semi",
    ).select("user_id", "click_id")
    return run_available_now(joined, _uniq("st_join_semi"), output_mode="append")


@query(
    "st_stream_static_enrich",
    oracle="""
        WITH dim AS (SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS first_seen
                     FROM events GROUP BY 1)
        SELECT e.event_type,
               CAST(date_trunc('day', d.first_seen) AS DATE) AS cohort_day,
               count(*) AS n
        FROM events e JOIN dim d ON e.user_id = d.user_id
        GROUP BY 1, 2
    """,
    tags=("streaming", "join"),
)
def st_stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment: the event stream joined to a STATIC
    dimension (per-user first-seen day, computed batch-side) — the
    standard lookup-enrichment shape. The static side needs no
    watermark and no state: each micro-batch joins against it directly
    (broadcast at this size), so state stays zero no matter how long
    the stream runs. Complete-mode replay equals the batch join."""
    from map_reduce_framework_using_python_spark.plans.core import t as _t

    dim = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.min(F.col("ts").cast("timestamp")).alias("first_seen"))
    )
    stream = read_events_stream(spark, sf_dir)
    agg = (
        stream.join(dim, "user_id")
        .groupBy(
            "event_type",
            F.date_trunc("day", "first_seen").cast("date").alias("cohort_day"),
        )
        .agg(F.count("*").alias("n"))
    )
    return run_available_now(agg, _uniq("st_enrich"), output_mode="complete")


@query("st_dedup_watermark", oracle=None, tags=("streaming", "dedup", "rows_only"))
def st_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicatesWithinWatermark over (user_id, event_type):
    rows-only — the exact surviving row per key depends on micro-batch
    arrival order by design; pytest pins the invariants (no dup keys in
    a batch, ≥ global distinct count)."""
    return run_available_now(
        dedup_within_watermark(read_events_stream(spark, sf_dir)),
        _uniq("st_dedup"),
        output_mode="append",
    )


@query("st_incremental_dedup", oracle=None, tags=("streaming", "dedup", "index", "rows_only"))
def st_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-on-ingest: a document stream screened against the PERSISTED
    MinHash index via foreachBatch (streaming/ingest.py) — the
    continuous form of ns_incremental_dedup, and the shape a 100 TB
    ingest pipeline actually runs: per micro-batch cost is sketch-the-
    batch + scan-the-fixed-width-index; the corpus text is never
    re-read. Pinned equal to the one-shot batch probe over the same
    docs (tests/test_streaming_ingest.py); rows-only for the driver —
    pair content depends on xxhash64 banding, not SQL-expressible."""
    import tempfile

    from map_reduce_framework_using_python_spark.plans.core import t

    from map_reduce_framework_using_python_spark.plans.northstar import (
        _BATCH_MOD,
        _BATCH_REM,
        _ensure_dedup_index,
    )
    from map_reduce_framework_using_python_spark.streaming.ingest import (
        read_documents_stream,
        screen_stream,
    )

    path = _ensure_dedup_index(spark, sf_dir)
    corpus = t(spark, sf_dir, "documents").filter(
        F.col("doc_id") % _BATCH_MOD != _BATCH_REM
    )
    work = tempfile.mkdtemp(prefix="st_ingest_dedup_")
    return screen_stream(
        read_documents_stream(spark, sf_dir).filter(
            F.col("doc_id") % _BATCH_MOD == _BATCH_REM
        ),
        corpus,
        path,
        out_dir=f"{work}/pairs",
        checkpoint_dir=f"{work}/ckpt",
        threshold=0.6,
    )


from map_reduce_framework_using_python_spark.plans.pipeline7 import (  # noqa: E402
    _DSIR_GATE_ORACLE,
)


@query("st_dsir_gate", oracle=_DSIR_GATE_ORACLE, tags=("streaming", "pipeline", "dsir"))
def st_dsir_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality gating on ingest: arriving documents (doc_id ≡ 7 mod 16)
    scored per micro-batch against the PERSISTED DSIR bucket model
    trained on the rest of the corpus (streaming/quality_gate.py) —
    corpus statistics frozen once, then broadcast into each batch's
    map-side scoring pass; the corpus itself is never re-read.

    The rare streaming query with a FULL DuckDB oracle: every emitted
    value is either an exact integer, a 1e-6-grid quantized double, or
    the Σ li ≥ 0 BIGINT comparison — nothing depends on micro-batch
    boundaries, so the drained-stream result is SQL-expressible.
    Drained-equals-batch is additionally pinned in
    tests/test_quality_gate.py."""
    import tempfile

    from map_reduce_framework_using_python_spark.plans.northstar import (
        _BATCH_MOD,
        _BATCH_REM,
    )
    from map_reduce_framework_using_python_spark.plans.pipeline7 import (
        _ensure_dsir_model,
    )
    from map_reduce_framework_using_python_spark.streaming.ingest import (
        read_documents_stream,
    )
    from map_reduce_framework_using_python_spark.streaming.quality_gate import (
        gate_stream,
    )

    model_path = _ensure_dsir_model(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="st_dsir_gate_")
    return gate_stream(
        read_documents_stream(spark, sf_dir).filter(
            F.col("doc_id") % _BATCH_MOD == _BATCH_REM
        ),
        model_path,
        out_dir=f"{work}/verdicts",
        checkpoint_dir=f"{work}/ckpt",
    )


from map_reduce_framework_using_python_spark.plans.pipeline6 import (  # noqa: E402
    _SEMDECON_ORACLE,
    _SEMDECON_TAU6,
)


@query(
    "st_semantic_decontaminate",
    oracle=_SEMDECON_ORACLE,
    tags=("streaming", "pipeline", "decontamination", "similarity"),
)
def st_semantic_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic decontamination on ingest: arriving training vectors
    (vec_id % 16 != 7 — everything that is not the benchmark slice)
    scored per micro-batch against the FROZEN benchmark suite
    (streaming/quality_gate.py:semdecon_stream). Shares its scoring
    core AND its full DuckDB oracle with the batch
    ns_semantic_decontaminate: every verdict depends only on (vector,
    benchmark, τ) on the 1e-6 grid, so micro-batch boundaries cannot
    change the answer and the drained stream is SQL-expressible.
    Drained-equals-batch is additionally pinned in
    tests/test_quality_gate.py."""
    import tempfile

    from map_reduce_framework_using_python_spark.plans.core import t
    from map_reduce_framework_using_python_spark.streaming.ann_ingest import (
        read_embeddings_stream,
    )
    from map_reduce_framework_using_python_spark.streaming.quality_gate import (
        semdecon_stream,
    )

    bench = t(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 16 == 7)
    work = tempfile.mkdtemp(prefix="st_semdecon_")
    return semdecon_stream(
        read_embeddings_stream(spark, sf_dir).filter(F.col("vec_id") % 16 != 7),
        bench,
        _SEMDECON_TAU6,
        out_dir=f"{work}/verdicts",
        checkpoint_dir=f"{work}/ckpt",
    )


@query("st_ingest_drift", oracle=None, tags=("streaming", "pipeline", "drift", "rows_only"))
def st_ingest_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest drift alarm: per-micro-batch PSI of arriving documents
    (doc_id ≡ 7 mod 16) against the corpus bucket counts frozen with
    the persisted DSIR model (streaming/quality_gate.py:drift_stream).
    Rows-only: the PSI value is integer-grid deterministic, but batch
    BOUNDARIES belong to the stream, not the data — pinned against the
    one-shot psi_vs_counts of the same docs in
    tests/test_quality_gate.py."""
    import tempfile

    from map_reduce_framework_using_python_spark.plans.northstar import (
        _BATCH_MOD,
        _BATCH_REM,
    )
    from map_reduce_framework_using_python_spark.plans.pipeline7 import (
        _ensure_dsir_model,
    )
    from map_reduce_framework_using_python_spark.streaming.ingest import (
        read_documents_stream,
    )
    from map_reduce_framework_using_python_spark.streaming.quality_gate import (
        drift_stream,
    )

    model_path = _ensure_dsir_model(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="st_ingest_drift_")
    return drift_stream(
        read_documents_stream(spark, sf_dir).filter(
            F.col("doc_id") % _BATCH_MOD == _BATCH_REM
        ),
        model_path,
        out_dir=f"{work}/drift",
        checkpoint_dir=f"{work}/ckpt",
    )


@query(
    "st_curation_pipeline",
    oracle=None,
    tags=("streaming", "pipeline", "dedup", "quality", "rows_only"),
)
def st_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ingest curation pass (streaming/curation.py): arriving
    documents (doc_id ≡ 7 mod 16) screened against the persisted
    MinHash index, gated by the persisted DSIR model, and drift-
    monitored against the frozen bucket counts — one foreachBatch, three
    sinks (curated / rejected-with-reason / per-batch metrics), corpus
    artifacts all frozen at build time. Returns the curated documents.
    Rows-only (the dedup leg rides xxhash64 banding); pinned equal to
    the one-shot curate_batch composition in tests/test_curation.py."""
    import tempfile

    from map_reduce_framework_using_python_spark.plans.core import t
    from map_reduce_framework_using_python_spark.plans.northstar import (
        _BATCH_MOD,
        _BATCH_REM,
        _ensure_dedup_index,
    )
    from map_reduce_framework_using_python_spark.plans.pipeline7 import (
        _ensure_dsir_model,
    )
    from map_reduce_framework_using_python_spark.streaming.curation import (
        curate_stream,
    )
    from map_reduce_framework_using_python_spark.streaming.ingest import (
        read_documents_stream,
    )

    index_path = _ensure_dedup_index(spark, sf_dir)
    model_path = _ensure_dsir_model(spark, sf_dir)
    corpus = t(spark, sf_dir, "documents").filter(
        F.col("doc_id") % _BATCH_MOD != _BATCH_REM
    )
    work = tempfile.mkdtemp(prefix="st_curation_")
    return curate_stream(
        read_documents_stream(spark, sf_dir).filter(
            F.col("doc_id") % _BATCH_MOD == _BATCH_REM
        ),
        corpus,
        index_path,
        model_path,
        out_root=work,
        checkpoint_dir=f"{work}/ckpt",
    )


@query(
    "st_curation_takedown",
    oracle=None,
    tags=("streaming", "pipeline", "dedup", "index", "rows_only"),
)
def st_curation_takedown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """st_curation_pipeline with the takedown QUEUE serviced inside the
    drain (r12): the dedup index is copied to scratch (the
    fingerprint-cached layout stays pristine), a deletion-request file
    — every corpus doc the arriving batch would have screened as a
    near-dup PARTNER (content-derived, the ns_paragraph_retract_screen
    convention) — lands in the queue dir, and curate_stream retracts it
    as maintenance BEFORE the batch screens (an O(|ids|) tombstone
    append per file; idempotent, so a restart re-reading the queue is
    safe). With every partner taken down the duplicate leg must go
    QUIET for the batch: the returned curated set is the one-shot
    curate_batch over the retracted index, and n_duplicate drops to 0
    while the metrics SCHEMA stays byte-identical (takedown is index
    maintenance, not a verdict class). Multi-drain flip semantics and
    within-run queue consumption are pinned in tests/test_curation.py."""
    import shutil

    from map_reduce_framework_using_python_spark.operators.dedup_index import (
        incremental_dedup_pairs,
    )
    from map_reduce_framework_using_python_spark.plans.ann_queries import (
        _scratch_dir,
    )
    from map_reduce_framework_using_python_spark.plans.core import t
    from map_reduce_framework_using_python_spark.plans.northstar import (
        _BATCH_MOD,
        _BATCH_REM,
        _ensure_dedup_index,
    )
    from map_reduce_framework_using_python_spark.plans.pipeline7 import (
        _ensure_dsir_model,
    )
    from map_reduce_framework_using_python_spark.streaming.curation import (
        curate_stream,
    )
    from map_reduce_framework_using_python_spark.streaming.ingest import (
        read_documents_stream,
    )

    d = t(spark, sf_dir, "documents")
    corpus = d.filter(F.col("doc_id") % _BATCH_MOD != _BATCH_REM)
    batch = d.filter(F.col("doc_id") % _BATCH_MOD == _BATCH_REM)
    model_path = _ensure_dsir_model(spark, sf_dir)
    work = _scratch_dir("st_curation_takedown_")
    index_path = f"{work}/idx"
    shutil.copytree(_ensure_dedup_index(spark, sf_dir), index_path)
    queue = f"{work}/queue"
    (
        incremental_dedup_pairs(spark, batch, corpus, index_path)
        .select(F.col("corpus_doc").alias("doc_id"))
        .distinct()
        .write.parquet(f"{queue}/takedown.parquet")
    )
    return curate_stream(
        read_documents_stream(spark, sf_dir).filter(
            F.col("doc_id") % _BATCH_MOD == _BATCH_REM
        ),
        corpus,
        index_path,
        model_path,
        out_root=f"{work}/out",
        checkpoint_dir=f"{work}/ckpt",
        takedown_queue_dir=queue,
    )


@query(
    "st_state_read",
    oracle="""
        SELECT event_type, count(*) AS n_events,
               round(sum(value), 2) AS total_value
        FROM events
        GROUP BY event_type
    """,
    tags=("streaming", "stateful", "ops"),
)
def st_state_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checkpoint-state OBSERVABILITY (Spark 4 state data source): a
    built-in streaming aggregation drains to a NOOP sink — the result
    is read from the CHECKPOINT instead, via
    ``spark.read.format("statestore")``, projecting the state rows'
    (key, value) structs back to columns. The ops move a real pipeline
    needs: inspect (or repair-audit) a stream's state without touching
    the query or its sink. FULL oracle: the state of a grouped
    aggregation IS the aggregate over everything ingested, so DuckDB's
    one-shot GROUP BY must hash-match the state store's contents
    exactly (count long; sum rounded on read with the st_ lane's
    convention — the store holds the raw accumulator)."""
    import os

    from map_reduce_framework_using_python_spark.plans.ann_queries import (
        _scratch_dir,
    )
    from map_reduce_framework_using_python_spark.streaming.windows import (
        read_events_stream,
    )

    work = _scratch_dir("st_state_read_")
    ckpt = os.path.join(work, "ckpt")
    agg = (
        read_events_stream(spark, sf_dir)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("noop")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.read.format("statestore")
        .load(ckpt)
        .select(
            F.col("key.event_type").alias("event_type"),
            F.col("value.count").alias("n_events"),
            F.round(F.col("value.sum"), 2).alias("total_value"),
        )
    )
