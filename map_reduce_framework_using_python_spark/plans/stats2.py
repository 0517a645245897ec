"""Rank statistics and weighted sampling — exact-arithmetic additions
to the statistical surface.

Spearman correlation is the rank twin of q_corr_stats: because ranks
(and tie-averaged ranks scaled by 2) are INTEGERS, every component sum
is exact DECIMAL, and the final rho is one identical IEEE expression on
identical operands in both engines — no float-grid hazard anywhere.
Systematic PPS sampling (probability proportional to size) is the
classic production weighted sampler (one pass, exact integer
arithmetic), built on the scale-safe ``bucketed_cumsum``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_framework_using_python_spark.operators.ranks import (
    bucketed_cumsum,
)
from map_reduce_framework_using_python_spark.plans.core import query, t

# ---------------------------------------------------------------------------
# Spearman rank correlation
# ---------------------------------------------------------------------------

#: Shared by the Spark plan and the DuckDB oracle, so the arithmetic
#: can never drift between engines. Products are taken in DOUBLE, not
#: DECIMAL(38,0) (r7 review): n·sxx overflows 38 digits for groups
#: beyond ~2e9 rows (n ≈ 2e11 at 100 TB ⇒ 4n⁴ ≈ 1e46) and would
#: silently NULL the statistic; the SUMS stay exact decimals, and the
#: correctly-rounded double products are bit-identical on both engines.
_RHO_EXPR = (
    "round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / "
    "sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    " * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)"
    " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)"
)


@query(
    "q_spearman",
    oracle=f"""
        WITH r AS (
            SELECT l_returnflag AS g,
                   2 * rank() OVER (PARTITION BY l_returnflag
                                    ORDER BY l_quantity)
                     + count(*) OVER (PARTITION BY l_returnflag, l_quantity)
                     - 1 AS rx,
                   2 * rank() OVER (PARTITION BY l_returnflag
                                    ORDER BY l_extendedprice)
                     + count(*) OVER (PARTITION BY l_returnflag, l_extendedprice)
                     - 1 AS ry
            FROM lineitem),
        s AS (SELECT g, CAST(count(*) AS DECIMAL(38,0)) AS n,
                     CAST(sum(CAST(rx AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
                     CAST(sum(CAST(ry AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sy,
                     CAST(sum(CAST(rx AS DECIMAL(38,0)) * ry) AS DECIMAL(38,0)) AS sxy,
                     CAST(sum(CAST(rx AS DECIMAL(38,0)) * rx) AS DECIMAL(38,0)) AS sxx,
                     CAST(sum(CAST(ry AS DECIMAL(38,0)) * ry) AS DECIMAL(38,0)) AS syy
              FROM r GROUP BY g)
        SELECT g, CAST(n AS BIGINT) AS n_rows, {_RHO_EXPR} AS spearman_rho
        FROM s
    """,
    tags=("agg", "stats", "analytics"),
)
def q_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation of quantity vs extended price per
    return flag, with textbook tie handling (average ranks).

    2·avg_rank = 2·min_rank + tie_count − 1 is an INTEGER, so the whole
    statistic reduces to exact DECIMAL sums of integer products; the
    final rho is one identical double expression (sqrt is
    correctly-rounded IEEE) — the q_corr_stats doctrine, extended to
    rank statistics.

    The oracle's per-group rank windows are the textbook form. The
    Spark side (r15 restructure, guide §2.3/§2.4) computes the scaled
    rank per distinct VALUE from the marginal histogram instead of
    ranking rows: 2·avg_rank(v) = 2·cum(v) − c(v) + 1, where cum is
    the per-group inclusive running count along the value order
    (``bucketed_cumsum_grouped`` — windows touch only histogram rows,
    never the corpus). The r14-era row form ranked the full table
    twice and tie-joined each rank back, so Catalyst re-derived the
    scan+window subtree combinatorially (measured: 43 parquet scans in
    the physical plan, 5.1 s at sf0.1); the histogram form joins two
    value-rank tables onto ONE corpus pass (~1.2 s, 4 scans). The
    attached ranks are identical integers, so the exact decimal sums
    and the final rho are bit-identical.
    """
    from map_reduce_framework_using_python_spark.operators.ranks import (
        bucketed_cumsum_grouped,
    )

    l = t(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("g"),
        F.col("l_quantity").alias("x"),
        F.col("l_extendedprice").alias("y"),
    )

    def value_rank(col: str, bucket, out: str) -> DataFrame:
        """2·avg_rank for every distinct (g, col) value, from the
        marginal histogram: min_rank(v) = cum(v) − c(v) + 1, so
        2·avg_rank = 2·min_rank + c − 1 = 2·cum − c + 1 (all BIGINT)."""
        hist = l.groupBy("g", col).agg(F.count("*").alias("_c"))
        cum = bucketed_cumsum_grouped(
            hist, ["g"], bucket, [F.col(col)], F.col("_c"), cum_col="_cum"
        )
        return cum.select(
            "g", col, (2 * F.col("_cum") - F.col("_c") + 1).alias(out)
        )

    rxx = value_rank("x", F.floor(F.col("x") / 8), "rx")
    rxy = value_rank("y", F.floor(F.col("y") / 8192), "ry")
    # The y-rank table is value-histogram-bounded but too big to be
    # worth broadcasting (A/B at sf0.1: broadcast 2.26 s vs SMJ 2.02 s
    # vs shuffled-hash 1.42 s — the SMJ's two 600k-row sorts are pure
    # overhead when the build side hashes per-partition; guide §3.1).
    s = (
        l.join(rxx, ["g", "x"])
        .join(rxy.hint("shuffle_hash"), ["g", "y"])
        .groupBy("g")
        .agg(
        F.count("*").cast("decimal(38,0)").alias("n"),
        F.sum(F.col("rx").cast("decimal(38,0)")).cast("decimal(38,0)").alias("sx"),
        F.sum(F.col("ry").cast("decimal(38,0)")).cast("decimal(38,0)").alias("sy"),
        F.sum(F.col("rx").cast("decimal(38,0)") * F.col("ry"))
        .cast("decimal(38,0)")
        .alias("sxy"),
        F.sum(F.col("rx").cast("decimal(38,0)") * F.col("rx"))
        .cast("decimal(38,0)")
        .alias("sxx"),
        F.sum(F.col("ry").cast("decimal(38,0)") * F.col("ry"))
        .cast("decimal(38,0)")
        .alias("syy"),
        )
    )
    return s.select(
        "g",
        F.col("n").cast("bigint").alias("n_rows"),
        F.expr(_RHO_EXPR).alias("spearman_rho"),
    )


# ---------------------------------------------------------------------------
# Systematic PPS (probability-proportional-to-size) sampling
# ---------------------------------------------------------------------------

_PPS_K = 25


@query(
    "ns_pps_sample",
    oracle=f"""
        WITH w AS (SELECT doc_id, n_chars,
                          md5(CAST(doc_id AS VARCHAR)) AS h
                   FROM documents),
             c AS (SELECT doc_id, n_chars,
                          sum(n_chars) OVER (ORDER BY h, doc_id
                                             ROWS BETWEEN UNBOUNDED PRECEDING
                                             AND CURRENT ROW) AS cum,
                          sum(n_chars) OVER () AS total
                   FROM w)
        SELECT doc_id, n_chars, CAST(cum AS BIGINT) AS cum
        FROM c
        WHERE cum // greatest(total // {_PPS_K}, 1) > (cum - n_chars) // greatest(total // {_PPS_K}, 1)
    """,
    tags=("pipeline", "sampling", "northstar"),
)
def ns_pps_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic PPS sample of ~_PPS_K (25) documents, inclusion probability
    proportional to ``n_chars``: order by a content-hash key (stable,
    engine-shared pseudo-random order), take the running weight sum,
    and select every document whose weight interval crosses a stride
    boundary (stride = total // k). Long documents are proportionally
    more likely to be picked — the sampler a training pipeline uses for
    size-weighted corpus subsampling — and everything is INTEGER
    arithmetic, exact on both engines.

    The running sum comes from ``bucketed_cumsum`` (md5-prefix buckets
    + broadcast prefix-sum), so there is no single-task global window;
    the only full-table pass is one hash-partitioned window + two tiny
    broadcasts — the identical shape to ns_seeded_shuffle.
    """
    d = t(spark, sf_dir, "documents").select(
        "doc_id", "n_chars", F.md5(F.col("doc_id").cast("string")).alias("h")
    )
    c = bucketed_cumsum(
        d,
        F.substring("h", 1, 2),
        [F.col("h"), F.col("doc_id")],
        F.col("n_chars"),
        cum_col="cum",
    )
    total = d.agg(F.sum("n_chars").alias("total"))
    return (
        c.crossJoin(F.broadcast(total))
        .filter(
            # greatest(...,1): a corpus with < K total chars makes the
            # stride 0 — Spark's div-by-0 NULLs (silently empty sample)
            # while DuckDB's // raises; both sides guard identically
            # (r7 review), degenerating to "every doc sampled".
            F.expr(f"cum div greatest(total div {_PPS_K}, 1)")
            > F.expr(f"(cum - n_chars) div greatest(total div {_PPS_K}, 1)")
        )
        .select("doc_id", "n_chars", "cum")
    )


@query(
    "q_ohlc_bars",
    oracle="""
        WITH r AS (SELECT date_trunc('hour', ts) AS bar,
                          value, ts, event_id,
                          row_number() OVER (PARTITION BY date_trunc('hour', ts)
                                             ORDER BY ts, event_id) AS rn_a,
                          row_number() OVER (PARTITION BY date_trunc('hour', ts)
                                             ORDER BY ts DESC, event_id DESC) AS rn_z
                   FROM events)
        SELECT bar,
               max(CASE WHEN rn_a = 1 THEN value END) AS open,
               max(value) AS high,
               min(value) AS low,
               max(CASE WHEN rn_z = 1 THEN value END) AS close,
               count(*) AS volume
        FROM r GROUP BY bar
    """,
    tags=("events", "timeseries", "analytics"),
)
def q_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC resampling of the event value stream — the financial
    bar aggregation (open/high/low/close/volume per bucket).

    open/close are deterministic endpoint picks over the total order
    (ts, event_id): Spark uses struct-min/max argmin (order-insensitive,
    composes with partial aggregation — ONE hash aggregate, no window);
    the oracle spells the same pick with row_number. high/low/volume are
    plain aggregates. All outputs are raw column passthroughs or
    counts — nothing rounded. Scale: one shuffle on the bar key; the
    struct-min trick keeps the endpoint pick inside the map-side
    combine, which a window-based form would forfeit.
    """
    e = t(spark, sf_dir, "events").select(
        F.date_trunc("hour", "ts").alias("bar"), "value", "ts", "event_id"
    )
    key = F.struct(F.col("ts"), F.col("event_id"), F.col("value"))
    return e.groupBy("bar").agg(
        F.min(key)["value"].alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(key)["value"].alias("close"),
        F.count("*").alias("volume"),
    )
