"""Event analytics: JSON extraction, time-window aggregation (tumbling /
sliding / session) in batch form, and event dedup.

The reference is batch-only text MR; this whole surface is a north-star
extension (SURVEY.md §2.B "Streaming" rows). Batch semantics here are
the oracle-checkable twins of the Structured Streaming versions in
:mod:`map_reduce_framework_using_python_spark.streaming` — same window
math, no watermark cut-off.

events.ts is nanosecond parquet; the engine reads it truncated to
microseconds (sources/io.py), and every oracle casts TIMESTAMP_NS →
TIMESTAMP the same way, so both sides compare at µs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from map_reduce_framework_using_python_spark.plans.core import query, t


@query(
    "q_json_extract",
    oracle="""
        SELECT event_type,
               count(*) AS n_events,
               CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS k_total
        FROM events
        GROUP BY event_type
    """,
    tags=("json", "agg"),
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction from the ``props`` payload column
    (SURVEY.md §2.B array/map/JSON row; MR: json.loads inside a mapper)."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.get_json_object("props", "$.k").cast("int")).alias("k_total"),
        )
    )


@query(
    "q_event_window_tumbling",
    oracle="""
        SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
               event_type,
               count(*) AS n_events,
               round(sum(value), 2) AS total_value
        FROM events
        GROUP BY 1, 2
    """,
    tags=("window_time", "agg"),
)
def q_event_window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling window aggregation (batch twin of the streaming
    version). Uses Spark's ``window()`` — identical bucketing to the
    streaming path."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour"), "event_type")
        # round(sum(double), 2) is SAFE here, unlike money sums
        # (plans/core.py): events.value sits exactly on the 2-dp grid
        # (verified corpus-wide), so every window's EXACT sum is a grid
        # point 0.005 away from any rounding boundary — float
        # accumulation error (~n·ulp ≈ 1e-5 at this scale) can never
        # flip the rounded value on either engine.
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@query(
    "q_event_window_sliding",
    oracle="""
        SELECT ws AS window_start, count(*) AS n_events, round(sum(value), 2) AS total_value
        FROM (
            SELECT unnest([date_trunc('hour', CAST(ts AS TIMESTAMP)),
                           date_trunc('hour', CAST(ts AS TIMESTAMP)) - INTERVAL 1 HOUR]) AS ws,
                   value
            FROM events)
        GROUP BY ws
    """,
    tags=("window_time", "agg"),
)
def q_event_window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-hour window sliding every 1 hour: each event lands in exactly two
    buckets (the oracle materializes both bucket starts per row)."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "2 hours", "1 hour"))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("window.start").alias("window_start"), "n_events", "total_value")
    )


@query(
    "q_event_sessionize",
    oracle="""
        WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        gaps AS (
            SELECT user_id, event_id, ts,
                   CASE WHEN date_diff('second',
                             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                             ts) > 1800
                        OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                        THEN 1 ELSE 0 END AS is_new
            FROM e),
        sess AS (
            SELECT user_id, ts,
                   sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
            FROM gaps)
        SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
               min(ts) AS session_start, count(*) AS n_events
        FROM sess
        GROUP BY user_id, session_id
    """,
    tags=("window_time", "session"),
)
def q_event_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization, 30-minute inactivity gap (lag + cumulative
    flag-sum — the classic two-window composition; streaming twin is
    ``session_window`` in the streaming module)."""
    e = t(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = e.withColumn(
        "is_new",
        F.when(
            F.lag("ts").over(w).isNull()
            # NTZ → epoch seconds (floor): matches the oracle's
            # date_diff('second', …) boundary-count semantics.
            | (
                F.col("ts").cast("timestamp").cast("long")
                - F.lag("ts").over(w).cast("timestamp").cast("long")
                > 1800
            ),
            1,
        ).otherwise(0),
    )
    sess = gaps.withColumn(
        "session_id",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"), F.count("*").alias("n_events")
    )


@query(
    "q_event_session_native",
    oracle="""
        WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        g AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN lag(ts) OVER w IS NULL
                          OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END AS is_new
            FROM e
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        s AS (
            -- event_id tiebreak matches g's window order (r7 review):
            -- without it, tied microsecond timestamps let the running
            -- sum order diverge from the flag-assignment order and
            -- split a session nondeterministically
            SELECT user_id, ts,
                   sum(is_new) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
            FROM g)
        SELECT min(ts) AS session_start,
               max(ts) + INTERVAL 30 MINUTE AS session_end,
               user_id,
               count(*) AS n_events
        FROM s
        GROUP BY user_id, sid
    """,
    tags=("window_time", "session"),
)
def q_event_session_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native ``session_window`` on a BATCH DataFrame (same operator the
    streaming path uses; the lag+cumsum twin is q_event_sessionize)."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


@query(
    "q_event_dedup",
    oracle="""
        SELECT user_id, event_type,
               min(CAST(ts AS TIMESTAMP)) AS first_ts,
               count(*) AS n_dupes
        FROM events
        GROUP BY user_id, event_type
    """,
    tags=("dedup",),
)
def q_event_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic event dedup on (user, type): keep the earliest
    occurrence (the batch twin of dropDuplicatesWithinWatermark)."""
    return (
        t(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.min("ts").alias("first_ts"), F.count("*").alias("n_dupes"))
    )


@query(
    "q_variant_extract",
    oracle="""
        SELECT CAST(json_extract(props, '$.k') AS INTEGER) % 10 AS k_mod,
               count(*) AS n,
               CAST(sum(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT)
                   AS k_total
        FROM events
        GROUP BY 1
    """,
    tags=("json", "variant"),
)
def q_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT path (Spark 4): ``parse_json`` once into
    the binary VARIANT encoding, then typed ``variant_get`` paths — the
    shredded-at-scan successor to per-access string re-parsing
    (get_json_object twin: q_json_extract). Same partial+final agg
    shape; the parse happens once per row in the scan projection."""
    e = t(spark, sf_dir, "events")
    v = e.select(F.parse_json("props").alias("v"))
    k = F.variant_get("v", "$.k", "int")
    return (
        v.select((k % 10).alias("k_mod"), k.alias("k"))
        .groupBy("k_mod")
        .agg(F.count("*").alias("n"), F.sum("k").cast("bigint").alias("k_total"))
    )
