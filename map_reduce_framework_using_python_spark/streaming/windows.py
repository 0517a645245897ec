"""Streaming windows: tumbling / sliding / session, watermarks, and
streaming dedup over the ``events`` table.

Design: the transformations are *shared* with the batch twins — a
windowed agg is the same ``groupBy(window(...))`` expression whether its
input is a static or streaming DataFrame. Watermarks bound state at
scale: a 1000-executor job over an unbounded stream holds only
(watermark horizon / slide) × |keys| rows of state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

import os

from map_reduce_framework_using_python_spark.sources.io import (
    _EVENTS_RAW_SCHEMA,
    _ts_micros_expr,
)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``events`` as a file-source stream (same raw-INT64 schema-on-read
    workaround as the batch loader, normalized to µs by the footer's
    actual unit — testdata generations have shipped both ns and µs).

    Streaming watermarks require TIMESTAMP (tz-aware), so unlike the
    batch loader this keeps ``ts`` as TIMESTAMP_LTZ — the session is
    pinned to UTC, so values align with the NTZ batch twin.
    """
    micros = _ts_micros_expr(os.path.join(sf_dir, "events.parquet"))
    return (
        spark.readStream.schema(_EVENTS_RAW_SCHEMA)
        # file source needs a directory; glob-filter to the events table
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .withColumn("ts", F.timestamp_micros(F.expr(micros)))
    )


def tumbling_window_agg(events: DataFrame, size: str = "1 hour", watermark: str = "10 minutes") -> DataFrame:
    """Streaming twin of ``q_event_window_tumbling``."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", size), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("window.start").alias("window_start"), "event_type", "n_events", "total_value")
    )


def sliding_window_agg(
    events: DataFrame, size: str = "2 hours", slide: str = "1 hour", watermark: str = "10 minutes"
) -> DataFrame:
    """Streaming twin of ``q_event_window_sliding``."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", size, slide))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("window.start").alias("window_start"), "n_events", "total_value")
    )


def session_window_counts(events: DataFrame, gap: str = "30 minutes", watermark: str = "10 minutes") -> DataFrame:
    """Native streaming sessionization (``session_window``) — the
    streaming analog of ``q_event_sessionize``'s lag+cumsum composition."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def dedup_within_watermark(events: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Streaming dedup on (user_id, event_type) with bounded state —
    ``dropDuplicatesWithinWatermark`` keeps a key's fingerprint only
    until the watermark passes it (the scalable form of global
    dropDuplicates, whose state grows without bound)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["user_id", "event_type"]
    )


#: Spark version the outer-join null-emission rules below (and the
#: st_stream_join_left/full oracles that encode them) were FITTED on.
#: Watermark-gated null extension is under-documented engine behavior:
#: the asymmetric ``click_ts + horizon < W`` / ``purchase_ts < W``
#: predicates were chosen by running the drained stream against every
#: candidate rule and taking the one with an empty symdiff (r9, sf0.01,
#: where the candidates diverge) — re-runnable via
#: ``tools/fit_stream_join_rules.py``. A Spark upgrade can silently
#: shift emission timing, so tests/test_streaming.py pins the running
#: version against this constant: a version bump fails ONE clearly
#: named test demanding a re-fit instead of a mystery oracle mismatch.
FITTED_NULL_EMISSION_SPARK = "4.1.2"


def interval_join_clicks_purchases(
    clicks_stream: DataFrame,
    purchases_stream: DataFrame,
    horizon: str = "30 minutes",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream interval join: attribute each purchase to every
    click by the same user in the preceding ``horizon``.

    The canonical two-stream join shape: watermarks on BOTH sides plus
    a range predicate on the event-time columns let the engine expire
    buffered rows — state is bounded by (watermark + horizon) × arrival
    rate instead of growing with the stream. Inner join, so rows emit
    as soon as both sides arrive; an AvailableNow replay over a bounded
    source therefore yields exactly the batch join (the DuckDB oracle).

    ``how="left_outer"`` adds watermark-gated null-extension: an
    unmatched click emits its NULL row only once the global watermark
    (min of both sides' = ``least(max_click_ts, max_purchase_ts) −
    watermark``) passes ``click_ts + horizon`` — before that a matching
    purchase could still arrive. Tail clicks inside that closing window
    are withheld forever on a bounded replay; st_stream_join_left's
    oracle encodes exactly this rule (verified empirically: emitted
    NULL set == the ``click_ts + horizon < W`` predicate).

    ``how="full_outer"`` additionally null-extends unmatched PURCHASES,
    gated by ``purchase_ts < W`` — asymmetric from the click side
    because the range condition is asymmetric: a purchase's latest
    possible matching click has ``click_ts = purchase_ts``, so its
    state closes when W passes purchase_ts itself, while a click waits
    out the full forward horizon (r9, fitted empirically at sf0.01
    where the candidate rules diverge: symdiff 0 for ``ts < W``, 1–2
    for the ±horizon variants). The output key coalesces both sides'
    user_id so purchase-only rows keep theirs.
    """
    clicks = (
        clicks_stream.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        purchases_stream.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {horizon}")),
        how,
    )
    uid = (
        F.coalesce(F.col("user_id"), F.col("p_user_id")).alias("user_id")
        if how == "full_outer"
        else F.col("user_id")
    )
    return joined.select(uid, "click_id", "purchase_id", "purchase_value")


def run_available_now(
    stream_df: DataFrame, query_name: str, output_mode: str = "complete"
) -> DataFrame:
    """Execute a streaming DataFrame to completion over the currently
    available input (Trigger.AvailableNow → memory sink) and return the
    materialized result — the deterministic replay harness from
    SURVEY.md §5.

    ``output_mode``: "complete" for aggregations (append would withhold
    windows the final watermark hasn't passed); "append" for row-level
    ops like dedup.
    """
    spark = stream_df.sparkSession
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)
