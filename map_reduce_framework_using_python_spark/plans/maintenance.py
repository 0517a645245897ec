"""Materialized-state maintenance + time-series queries.

* **Incremental aggregate maintenance** — the invariant behind every
  materialized view / rollup pipeline: merging yesterday's partial
  aggregate with today's delta must equal recomputing from scratch.
  The Spark side computes the merge (union of partials → re-aggregate);
  the DuckDB oracle recomputes from the raw table — the query passing
  the hash gate IS the invariant. Sums use DECIMAL partials (exact,
  associative — plans/core.py), so merge order cannot drift; at 100 TB
  this is what lets an hourly rollup avoid rescanning the corpus.
* **Time-weighted average** — duration-weighted mean, the correct
  aggregate for sampled gauges (a value holds until the next reading).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from map_reduce_framework_using_python_spark.plans.core import dec, half_up, query, t

_CUT = "2024-01-20"


@query(
    "q_incremental_agg",
    oracle=f"""
        SELECT user_id, count(*) AS n_events,
               floor(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) * 100 + 0.5)
                   / 100 AS total_value
        FROM events
        GROUP BY 1
    """,
    tags=("maintenance", "incremental"),
)
def q_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-of-partials == full recompute. base = events before the
    2024-01-20 cut pre-aggregated (the stored rollup); delta = events
    at/after it; the merge unions the two partial states and
    re-aggregates. DECIMAL partial sums make the merge exact regardless
    of grouping or order, which is precisely why mergeable state works
    at scale; the oracle recomputes over all of events directly."""
    e = t(spark, sf_dir, "events")
    cut = F.lit(_CUT).cast("timestamp")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("user_id").agg(
            F.count("*").alias("n_events"),
            F.sum(dec("value")).alias("total_dec"),
        )

    base = partial(e.filter(F.col("ts") < cut))
    delta = partial(e.filter(F.col("ts") >= cut))
    return (
        base.unionByName(delta)
        .groupBy("user_id")
        .agg(
            F.sum("n_events").alias("n_events"),
            half_up(F.sum("total_dec")).alias("total_value"),
        )
    )


@query(
    "q_time_weighted_avg",
    oracle="""
        WITH x AS (
            SELECT user_id, value,
                   date_diff('microsecond', CAST(ts AS TIMESTAMP),
                             lead(CAST(ts AS TIMESTAMP))
                                 OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id)) AS dur_us
            FROM events)
        SELECT user_id,
               floor(CAST(sum(CAST(floor(value * 100 + 0.5) AS DECIMAL(19,0))
                              * CAST(dur_us AS DECIMAL(19,0)))
                          AS DOUBLE)
                     / CAST(sum(dur_us) AS DOUBLE) / 100 * 10000 + 0.5) / 10000
                   AS tw_avg
        FROM x WHERE dur_us IS NOT NULL
        GROUP BY 1
    """,
    tags=("events", "timeseries"),
)
def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duration-weighted mean event value per user: each reading is
    weighted by how long it 'held' (time to the user's next event; the
    final open-ended reading is excluded). One window pass for the
    durations, then a plain hash aggregate — shuffles only on user_id.

    Determinism: value sits on the 2-dp grid, so (cents × µs) is exact
    integer arithmetic; the sums are exact (DECIMAL accumulators — no
    float summation-order jitter run-to-run or engine-to-engine), and
    only the final division happens in double on bit-identical inputs.
    Rounded half-up 4dp on both engines."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # batch ts is TIMESTAMP_NTZ; unix_micros needs LTZ (session is UTC,
    # so the cast is value-preserving)
    ts_ltz = F.col("ts").cast("timestamp")
    dur = (
        F.unix_micros(F.lead(ts_ltz).over(w)) - F.unix_micros(ts_ltz)
    ).alias("dur_us")
    x = e.select("user_id", "value", dur).filter(F.col("dur_us").isNotNull())
    # Multiply IN decimal, not int64-then-cast: a large gap (years in
    # µs) times cents can exceed 2^63, which aborts under ANSI mode —
    # the post-hoc decimal cast protected nothing (r7 review).
    # (19,0)×(19,0) needs precision 38/39, exact on both engines for
    # any value this data can hold.
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("decimal(19,0)")
    weighted = cents * F.col("dur_us").cast("decimal(19,0)")
    return x.groupBy("user_id").agg(
        half_up(
            F.sum(weighted).cast("double")
            / F.sum(F.col("dur_us").cast("decimal(38,0)")).cast("double")
            / 100,
            4,
        ).alias("tw_avg")
    )


@query(
    "q_regression_stats",
    oracle="""
        SELECT event_type,
               floor(regr_slope(value, (epoch(CAST(ts AS TIMESTAMP))
                                - epoch(TIMESTAMP '2024-01-01')) / 86400.0)
                         * 10000 + 0.5) / 10000 AS slope_per_day,
               floor(regr_intercept(value, epoch(CAST(ts AS TIMESTAMP))
                                    - epoch(TIMESTAMP '2024-01-01')) * 100 + 0.5)
                   / 100 AS intercept,
               count(*) AS n
        FROM events
        GROUP BY 1
    """,
    tags=("agg", "statistics"),
)
def q_regression_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-SQL least-squares per group: regr_slope / regr_intercept of
    event value over time (is the metric drifting?). Both engines
    implement the same closed-form moments, computed in one partial+
    final aggregate pass. The slope is per DAY rounded 4dp — per-second
    slope is ~1e-6, the same order as any sane rounding grid, so every
    run would sit near a tie boundary; per-day keeps the value orders of
    magnitude above the grid. Intercept 2dp; both half-up."""
    e = t(spark, sf_dir, "events")
    # center the regressor on the epoch of interest: slope is invariant,
    # the intercept becomes 'value at 2024-01-01' instead of an
    # extrapolation to 1970 (catastrophic cancellation at scale)
    t0 = 1_704_067_200.0  # 2024-01-01 UTC
    epoch_s = (
        F.unix_micros(F.col("ts").cast("timestamp")).cast("double") / 1e6 - t0
    )
    return e.groupBy("event_type").agg(
        half_up(F.regr_slope(F.col("value"), epoch_s / 86400.0), 4).alias(
            "slope_per_day"
        ),
        half_up(F.regr_intercept(F.col("value"), epoch_s), 2).alias("intercept"),
        F.count("*").alias("n"),
    )


@query("q_hll_sketch_merge", oracle=None, tags=("agg", "sketch", "rows_only"))
def q_hll_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches (Apache DataSketches HLL,
    Spark 3.5+): build one sketch PER SOURCE, then union-merge the
    binary sketches into a corpus-wide estimate — without ever
    re-touching raw data. This is the scale contract materialized
    rollups rely on: per-day/per-partition sketches merge associatively,
    so a 100 TB backfill never rescans history. Rows-only (sketch
    estimates are engine-specific); tests/test_edge_cases.py pins the
    merged and direct whole-corpus estimates within
    3% of the exact count (union merges can shift sketch mode, so the
    merged estimate differs from the direct one by a hair — both stay
    inside the envelope)."""
    d = t(spark, sf_dir, "documents")
    per_source = d.groupBy("source").agg(
        F.hll_sketch_agg(F.md5("text")).alias("sk"),
        F.count("*").alias("n_docs"),
    )
    return per_source.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("merged_distinct_texts"),
        F.sum("n_docs").alias("n_docs"),
    )


@query(
    "q_scd2_point_in_time",
    oracle="""
        WITH dim AS (
            SELECT c_custkey, c_mktsegment AS segment,
                   TIMESTAMP '1992-01-01' AS valid_from,
                   TIMESTAMP '1996-01-01' AS valid_to,
                   FALSE AS is_current
            FROM customer
            UNION ALL
            SELECT c_custkey, c_mktsegment || '_R',
                   TIMESTAMP '1996-01-01', NULL, TRUE
            FROM customer)
        SELECT d.segment,
               count(*) AS n_orders,
               count(DISTINCT o.o_custkey) AS n_custs,
               floor(CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                     * 100 + 0.5) / 100 AS total_price
        FROM orders o
        JOIN dim d
          ON d.c_custkey = o.o_custkey
         AND CAST(o.o_orderdate AS TIMESTAMP) >= d.valid_from
         AND (d.valid_to IS NULL OR CAST(o.o_orderdate AS TIMESTAMP) < d.valid_to)
        GROUP BY 1
    """,
    tags=("warehouse", "scd2", "join", "temporal"),
)
def q_scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join against an SCD2 dimension — the warehouse
    correctness test for slowly-changing dimensions: every order must
    see the customer-segment VERSION that was valid on its order date,
    not the current one. The dimension's version history is built with
    ``operators/merge.py:scd2_apply`` (a deterministic mid-1996
    re-segmentation), so the operator itself sits under the oracle
    gate; the DuckDB twin writes the same two versions directly.

    Scale shape: the dim is per-key-bounded (versions ≪ facts), so the
    join hashes on custkey with the validity interval as a residual
    filter — never an interval blow-up; the oracle's is_current flag
    lives on through scd2_apply untouched."""
    from map_reduce_framework_using_python_spark.operators.merge import scd2_apply

    c = t(spark, sf_dir, "customer")
    base = c.select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        F.lit("1992-01-01").cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    updates = c.select(
        "c_custkey",
        F.concat(F.col("c_mktsegment"), F.lit("_R")).alias("segment"),
        F.lit("1996-01-01").cast("timestamp").alias("valid_from"),
    )
    dim = scd2_apply(base, updates, "c_custkey")
    o = t(spark, sf_dir, "orders").select(
        "o_custkey",
        F.col("o_orderdate").cast("timestamp").alias("odate"),
        "o_totalprice",
    )
    j = o.join(
        dim,
        (dim.c_custkey == o.o_custkey)
        & (F.col("odate") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("odate") < F.col("valid_to"))),
    )
    return j.groupBy("segment").agg(
        F.count("*").alias("n_orders"),
        F.count_distinct("o_custkey").alias("n_custs"),
        half_up(F.sum(dec("o_totalprice"))).alias("total_price"),
    )
