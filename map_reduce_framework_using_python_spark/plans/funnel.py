"""Event-analytics queries: ordered funnels, cohort retention, histograms.

The product-analytics layer every event warehouse grows on top of the
raw `events` stream (reference parity: the reference's MAP-REDUCE is
the only tool its users have for these — `Readme.md:3-6` — so each is
re-expressed here as declarative Spark the optimizer can own).

Scale notes: every query below aggregates per `user_id` first, so the
single shuffle is on the natural key, partial aggregation runs map-side,
and nothing ever materializes per-event state wider than (user, ts).
At 100 TB the funnel's three stage frames reuse one exchange when the
source is bucketed by user_id (see sources/warehouse.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_framework_using_python_spark.operators.ranks import bucketed_rank, ntile_from_rank
from map_reduce_framework_using_python_spark.plans.core import query, t


#: The ONE copy of the stage-pipeline ORACLE CTEs (r7 review: q_funnel
#: and q_funnel_latency carried byte-identical SQL copies — the same
#: drift hazard _funnel_stages fixed on the Spark side).
_FUNNEL_STAGES_SQL = """
        WITH s1 AS (SELECT user_id, min(ts) AS t1
                    FROM events WHERE event_type = 'view' GROUP BY 1),
             s2 AS (SELECT e.user_id, min(e.ts) AS t2
                    FROM events e JOIN s1 ON e.user_id = s1.user_id
                    WHERE e.event_type = 'click' AND e.ts >= s1.t1 GROUP BY 1),
             s3 AS (SELECT e.user_id, min(e.ts) AS t3
                    FROM events e JOIN s2 ON e.user_id = s2.user_id
                    WHERE e.event_type = 'purchase' AND e.ts >= s2.t2 GROUP BY 1)"""


def asof_match(
    point: DataFrame,
    lookup: DataFrame,
    key: str,
    ts_col: str,
    match_col: str,
    direction: str,
) -> DataFrame:
    """The ONE as-of-join composition (r7 review: three hand-rolled
    union-tag copies had already drifted on the tag's timestamp type):
    union-tag both sides, one (key, ts, tag) window, running
    first/last(ignorenulls).

    ``direction='backward'`` matches each point row to the lookup
    side's latest ``ts_col`` at-or-before it; ``'forward'`` to the
    earliest at-or-after. Ties at equal ts MATCH in both directions
    (the tag makes the lookup row sort on the inclusive side). Returns
    every point row with all its columns plus ``match_col`` (NULL when
    no match exists). One shuffle on ``key``; no pairwise blow-up."""
    from pyspark.sql import Window

    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward, got {direction!r}")
    ts_type = dict(lookup.dtypes)[ts_col]
    point_types = dict(point.dtypes)
    pt_tag = 1 if direction == "backward" else 0
    tagged = point.select(
        *point.columns,
        F.lit(pt_tag).alias("_is_pt"),
        F.lit(None).cast(ts_type).alias(match_col),
    ).unionByName(
        lookup.select(
            *[
                F.col(c) if c in (key, ts_col)
                else F.lit(None).cast(point_types[c]).alias(c)
                for c in point.columns
            ],
            F.lit(1 - pt_tag).alias("_is_pt"),
            F.col(ts_col).alias(match_col),
        )
    )
    if direction == "backward":
        w = (
            Window.partitionBy(key)
            .orderBy(ts_col, "_is_pt")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        matched = F.last(match_col, ignorenulls=True).over(w)
    else:
        w = (
            Window.partitionBy(key)
            .orderBy(ts_col, "_is_pt")
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        matched = F.first(match_col, ignorenulls=True).over(w)
    return (
        tagged.withColumn(match_col, matched)
        .filter(F.col("_is_pt") == pt_tag)
        .drop("_is_pt")
    )


def _funnel_stages(e):
    """The ONE copy of the view→click→purchase stage pipeline (r7
    review: q_funnel and q_funnel_latency carried byte-identical
    copies whose tie semantics could drift apart): per-user first-view
    t1, first click ≥ t1 as t2, first purchase ≥ t2 as t3 — each stage
    a user_id-keyed min aggregate joined to the previous."""
    s1 = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        e.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") >= F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        e.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") >= F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return s1, s2, s3


@query(
    "q_funnel",
    oracle=_FUNNEL_STAGES_SQL + """
        SELECT (SELECT count(*) FROM s1) AS n_view,
               (SELECT count(*) FROM s2) AS n_click_after_view,
               (SELECT count(*) FROM s3) AS n_purchase_after_click
    """,
    tags=("events", "funnel"),
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered 3-step funnel (view → click → purchase): a user counts
    for step N only with an event at or after their step-N−1 time.

    Each stage is a per-user min-ts aggregate joined to the previous
    stage — shuffles stay on user_id, stage frames shrink monotonically,
    and the final counts are three scalar aggregates cross-joined (1×1×1
    rows, no data movement)."""
    e = t(spark, sf_dir, "events")

    s1, s2, s3 = _funnel_stages(e)
    return (
        s1.agg(F.count("*").alias("n_view"))
        .crossJoin(s2.agg(F.count("*").alias("n_click_after_view")))
        .crossJoin(s3.agg(F.count("*").alias("n_purchase_after_click")))
    )


@query(
    "q_retention",
    oracle="""
        WITH first AS (SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
                       FROM events GROUP BY 1)
        SELECT CAST(date_trunc('week', f.cohort_day) AS DATE) AS cohort_week,
               CAST(floor(date_diff('day', f.cohort_day, CAST(e.ts AS DATE)) / 7)
                    AS BIGINT) AS week_offset,
               count(DISTINCT e.user_id) AS n_active
        FROM events e JOIN first f ON e.user_id = f.user_id
        GROUP BY 1, 2
    """,
    tags=("events", "retention"),
)
def q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: cohort = week of a user's first event;
    n_active = distinct users from that cohort active N weeks later.

    The cohort frame is one row per user (tiny next to the event log),
    so Spark broadcasts it back onto events; the only wide exchange is
    the final (cohort_week, week_offset) distinct-count aggregate."""
    e = t(spark, sf_dir, "events")
    first = e.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("cohort_day"))
    return (
        e.select("user_id", F.to_date("ts").alias("day"))
        .join(first, "user_id")
        .select(
            F.date_trunc("week", F.col("cohort_day")).cast("date").alias("cohort_week"),
            F.floor(F.datediff(F.col("day"), F.col("cohort_day")) / 7)
            .cast("bigint")
            .alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct("user_id").alias("n_active"))
    )


@query(
    "q_value_histogram",
    oracle="""
        SELECT CAST(floor(value / 25) AS BIGINT) AS bin,
               count(*) AS n,
               min(value) AS min_v,
               max(value) AS max_v
        FROM events
        GROUP BY 1
    """,
    tags=("events", "histogram"),
)
def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of event values (bin width 25) with exact
    per-bin extrema. min/max select existing doubles (no accumulation),
    so the output is bit-exact across engines with no rounding step.
    One partial+final hash aggregate; bin count is bounded (~20), so
    the reduce side is trivial at any scale."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.floor(F.col("value") / 25).cast("bigint").alias("bin"))
        .agg(
            F.count("*").alias("n"),
            F.min("value").alias("min_v"),
            F.max("value").alias("max_v"),
        )
    )


@query(
    "q_funnel_latency",
    oracle=_FUNNEL_STAGES_SQL + """,
             lat AS (SELECT s3.user_id,
                            date_diff('microsecond', CAST(s1.t1 AS TIMESTAMP),
                                      CAST(s3.t3 AS TIMESTAMP)) AS us
                     FROM s3 JOIN s1 ON s3.user_id = s1.user_id),
             r AS (SELECT us, row_number() OVER (ORDER BY us) AS rn,
                          count(*) OVER () AS n
                   FROM lat)
        SELECT count(*) AS n_converted,
               max(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT) THEN us END) AS p50_us,
               max(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT) THEN us END) AS p90_us
        FROM r
    """,
    tags=("events", "funnel", "percentile"),
)
def q_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert through the full view→click→purchase funnel:
    exact discrete p50/p90 of (first-qualifying-purchase − first-view)
    per converted user, in microseconds (integer arithmetic end to end
    — raw stored timestamps, no float rounding anywhere). The percentile
    frame is one row per CONVERTED user — small next to the event log
    but still unbounded, so the global rank is assembled scale-safely
    (operators/ranks.py: 6-hour latency buckets → per-bucket row_number
    → broadcast prefix-sum offsets) instead of a single-partition
    window."""
    e = t(spark, sf_dir, "events")
    s1, s2, s3 = _funnel_stages(e)
    lat = s3.join(s1, "user_id").select(
        (
            F.unix_micros(F.col("t3").cast("timestamp"))
            - F.unix_micros(F.col("t1").cast("timestamp"))
        ).alias("us")
    )
    # Ties in `us` across users are harmless: the rank only selects the
    # `us` value itself, so any tie resolution yields the same output.
    r = bucketed_rank(
        lat,
        bucket=F.floor(F.col("us") / 21_600_000_000),  # 6 h in µs
        order_by=[F.col("us")],
        rank_col="rn",
        total_col="n",
    )
    return r.agg(
        F.count("*").alias("n_converted"),
        F.max(F.when(F.col("rn") == F.ceil(0.5 * F.col("n")), F.col("us"))).alias("p50_us"),
        F.max(F.when(F.col("rn") == F.ceil(0.9 * F.col("n")), F.col("us"))).alias("p90_us"),
    )


@query(
    "q_join_asof_forward",
    oracle="""
        WITH e AS (SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
                   FROM events)
        SELECT c.event_id, c.ts,
               CASE WHEN p.ts <= c.ts + INTERVAL 1 HOUR THEN p.ts END
                   AS next_purchase_ts
        FROM (SELECT * FROM e WHERE event_type = 'click') c
        ASOF LEFT JOIN (SELECT * FROM e WHERE event_type = 'purchase') p
          ON c.user_id = p.user_id AND c.ts <= p.ts
    """,
    tags=("join", "asof", "events"),
)
def q_join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join with tolerance: each click matched to the
    user's NEXT purchase at-or-after it, nulled beyond a 1-hour horizon.

    Same scalable composition as q_join_asof mirrored in time: union-tag
    both sides, one (user, time) window with a current-row→following
    frame and ``first(ignorenulls)`` — one shuffle, no pairwise blow-up.
    The tolerance is a post-hoc CASE, NOT a join predicate, so the plan
    shape is identical with or without it. (Purchases sort after clicks
    at equal ts so 'at or after' includes same-instant matches — the
    mirror of the backward variant's tie rule.)"""
    e = t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", F.col("ts").cast("timestamp").alias("ts")
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = e.filter(F.col("event_type") == "purchase").select("user_id", "ts")
    matched = asof_match(
        clicks, purchases, key="user_id", ts_col="ts",
        match_col="next_p", direction="forward",
    )
    return matched.select(
        "event_id",
        "ts",
        F.when(
            F.col("next_p") <= F.col("ts") + F.expr("INTERVAL 1 HOUR"),
            F.col("next_p"),
        ).alias("next_purchase_ts"),
    )


@query(
    "q_join_asof_nearest",
    oracle="""
        WITH e AS (SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
                   FROM events),
             p AS (SELECT * FROM e WHERE event_type = 'purchase'),
             c AS (SELECT * FROM e WHERE event_type = 'click'),
             b AS (SELECT p.event_id, p.ts, c.ts AS back_ts
                   FROM p ASOF LEFT JOIN c
                     ON p.user_id = c.user_id AND p.ts >= c.ts),
             f AS (SELECT p.event_id, c.ts AS fwd_ts
                   FROM p ASOF LEFT JOIN c
                     ON p.user_id = c.user_id AND p.ts < c.ts)
        SELECT b.event_id, b.ts,
               CASE WHEN back_ts IS NULL THEN fwd_ts
                    WHEN fwd_ts IS NULL THEN back_ts
                    WHEN epoch_us(b.ts) - epoch_us(back_ts)
                         <= epoch_us(fwd_ts) - epoch_us(b.ts) THEN back_ts
                    ELSE fwd_ts END AS nearest_click_ts,
               CASE WHEN back_ts IS NULL AND fwd_ts IS NULL THEN NULL
                    WHEN fwd_ts IS NULL THEN 'back'
                    WHEN back_ts IS NULL THEN 'fwd'
                    WHEN epoch_us(b.ts) - epoch_us(back_ts)
                         <= epoch_us(fwd_ts) - epoch_us(b.ts) THEN 'back'
                    ELSE 'fwd' END AS direction
        FROM b JOIN f USING (event_id)
    """,
    tags=("join", "asof", "events"),
)
def q_join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of join: each purchase matched to the user's closest
    click in EITHER direction (at-or-before vs strictly-after; ties on
    distance go to the earlier click) — the merge_asof
    ``direction='nearest'`` semantics, which neither Spark nor the
    backward/forward pair alone provides.

    Scalable composition: ONE union-tag + ONE (user, time) sort carries
    both window passes (``last`` over preceding for the backward match,
    ``first`` over following for the forward match share the partition
    and ordering, so Spark plans a single Exchange+Sort); the nearest
    pick is a post-hoc CASE on exact microsecond deltas. Clicks sort
    before purchases at equal ts, so same-instant clicks belong to the
    backward match only — mirroring the DuckDB double-ASOF oracle."""
    e = t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", F.col("ts").cast("timestamp").alias("ts")
    )
    purchases = e.filter(F.col("event_type") == "purchase")
    clicks = e.filter(F.col("event_type") == "click")
    tagged = purchases.select(
        "event_id", "user_id", "ts", F.lit(1).alias("is_p"),
        F.lit(None).cast("timestamp").alias("c_ts"),
    ).unionByName(
        clicks.select(
            "event_id", "user_id", "ts", F.lit(0).alias("is_p"),
            F.col("ts").alias("c_ts"),
        )
    )
    from pyspark.sql import Window

    order = Window.partitionBy("user_id").orderBy("ts", "is_p")
    w_back = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_fwd = order.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    back, fwd = F.col("back_ts"), F.col("fwd_ts")
    d_back = F.unix_micros(F.col("ts")) - F.unix_micros(back)
    d_fwd = F.unix_micros(fwd) - F.unix_micros(F.col("ts"))
    return (
        tagged.withColumn("back_ts", F.last("c_ts", ignorenulls=True).over(w_back))
        .withColumn("fwd_ts", F.first("c_ts", ignorenulls=True).over(w_fwd))
        .filter(F.col("is_p") == 1)
        .select(
            "event_id",
            "ts",
            F.when(back.isNull(), fwd)
            .when(fwd.isNull(), back)
            .when(d_back <= d_fwd, back)
            .otherwise(fwd)
            .alias("nearest_click_ts"),
            F.when(back.isNull() & fwd.isNull(), F.lit(None).cast("string"))
            .when(fwd.isNull(), "back")
            .when(back.isNull(), "fwd")
            .when(d_back <= d_fwd, "back")
            .otherwise("fwd")
            .alias("direction"),
        )
    )


@query(
    "q_equidepth_histogram",
    oracle="""
        WITH b AS (SELECT value,
                          ntile(4) OVER (ORDER BY value, event_id) AS bucket
                   FROM events)
        SELECT bucket, count(*) AS n, min(value) AS min_v, max(value) AS max_v
        FROM b GROUP BY 1
    """,
    tags=("events", "histogram", "window"),
)
def q_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (quartile) histogram: ntile over a deterministic
    (value, event_id) order, then per-bucket extrema — the data-driven
    complement of q_value_histogram's fixed-width bins. All outputs are
    raw stored values; no rounding anywhere.

    The global ntile runs over the full events table, so it uses the
    bucketed-rank composition (operators/ranks.py): fixed-width value
    buckets (width 5 → ~100 over this value domain; r7 review — width
    25 capped the window at ~20 tasks, a data-bounded parallelism
    ceiling; the bucket must stay a monotone function of the sort key,
    so distinct-key count over the width is the inherent bound — size
    the width to the cluster) → per-bucket row_number → broadcast
    offsets → ntile recomputed from (rank, n). No single-partition
    window anywhere in the plan."""
    e = t(spark, sf_dir, "events")
    ranked = bucketed_rank(
        e.select("value", "event_id"),
        bucket=F.floor(F.col("value") / 5),
        order_by=[F.col("value"), F.col("event_id")],
        rank_col="_rn",
        total_col="_n",
    )
    b = ranked.select(
        "value", ntile_from_rank(F.col("_rn"), F.col("_n"), 4).alias("bucket")
    )
    return b.groupBy("bucket").agg(
        F.count("*").alias("n"),
        F.min("value").alias("min_v"),
        F.max("value").alias("max_v"),
    )
