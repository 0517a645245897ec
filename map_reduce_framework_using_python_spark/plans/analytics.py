"""Advanced analytics batch: triangle counting, marketing attribution,
association rules, robust (MAD) outliers, rolling EWMA, rolling
DAU/WAU, windowed distinct counts, and blocked fuzzy matching.

Each is a workload the reference's users would express as a chain of
mapper/reducer jobs over the §2.A primitives (`Readme.md:6`) — e.g.
triangle counting is the canonical three-round MR graph job (edge list →
two-paths keyed on the middle vertex → closing-edge join), association
rules are two counting rounds over baskets, and the MAD pass is the
classic "median of medians" two-job pattern. Here each is ONE lazy
DataFrame plan with a DuckDB oracle.

Scale doctrine carried through from the rest of the repo:

- no global or few-partition windows — the per-type medians use
  ``bucketed_rank_grouped`` (operators/ranks.py), which splits heavy
  groups across value-derived buckets;
- triangle counting uses the degree-ordered orientation (each edge
  directed toward its higher-degree endpoint), which bounds the
  two-path fan-out by O(m^1.5) instead of Σ deg² — the standard
  distributed-triangle bound (Suri & Vassilvitskii, WWW'11);
- every float the oracle hash sees is either a raw column passthrough
  (identical bits both engines) or derived from exact integer/decimal
  components by one identical IEEE expression (plans/core.py doctrine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from map_reduce_framework_using_python_spark.plans.core import query, t


# --------------------------------------------------------------------------
# Triangle counting (degree-ordered orientation)
# --------------------------------------------------------------------------


@query(
    "q_triangle_count",
    oracle="""
        WITH items AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
                       FROM lineitem),
             e AS (SELECT DISTINCT a.p AS u, b.p AS v
                   FROM items a JOIN items b ON a.o = b.o AND a.p < b.p),
             verts AS (SELECT u AS x FROM e UNION SELECT v FROM e),
             tri AS (SELECT count(*) AS n_triangles
                     FROM e e1
                     JOIN e e2 ON e2.u = e1.v
                     JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v)
        SELECT (SELECT count(*) FROM verts) AS n_vertices,
               (SELECT count(*) FROM e) AS n_edges,
               n_triangles
        FROM tri
    """,
    tags=("graph", "analytics"),
)
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangles in the part co-purchase graph (parts are adjacent when
    some order contains both).

    The oracle counts with the textbook ``u < v < w`` three-way
    self-join. The Spark plan counts the SAME triangles but orients
    each edge toward its higher-(degree, id) endpoint first: every
    triangle then has exactly one vertex with two out-edges, and the
    two-path fan-out is Σ outdeg² = O(m^1.5) — on a skewed 100 TB graph
    the a<b orientation's hub vertices would each fan out deg² paths,
    while the degree ordering caps every out-degree at O(√m). Three
    hash shuffles (edge build, two-path, closing join), no windows.
    """
    items = (
        t(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    other = items.select(F.col("o").alias("o2"), F.col("p").alias("q"))
    edges = (
        items.join(other, (F.col("o") == F.col("o2")) & (F.col("p") < F.col("q")))
        .select(F.col("p").alias("u"), F.col("q").alias("v"))
        .distinct()
    )
    deg = (
        edges.select(F.col("u").alias("x"))
        .unionAll(edges.select(F.col("v").alias("x")))
        .groupBy("x")
        .agg(F.count("*").alias("d"))
    )
    du = deg.select(F.col("x").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("x").alias("v"), F.col("d").alias("dv"))
    # Orient toward the higher (degree, id) endpoint: src ≺ dst. Carry
    # the dst's degree so wedges can be canonicalized in the SAME total
    # order — that keeps the closing join a pure equi-join (an OR of
    # the two endpoint permutations would plan as a nested-loop join).
    oriented = (
        edges.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(
                (F.col("du") < F.col("dv"))
                | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
                F.struct(
                    F.col("u").alias("s"), F.col("v").alias("t"), F.col("dv").alias("dt")
                ),
            )
            .otherwise(
                F.struct(
                    F.col("v").alias("s"), F.col("u").alias("t"), F.col("du").alias("dt")
                )
            )
            .alias("e")
        )
        .select("e.s", "e.t", "e.dt")
    )
    a = oriented.select(F.col("s").alias("c"), F.col("t").alias("x"), F.col("dt").alias("dx"))
    b = oriented.select(F.col("s").alias("c"), F.col("t").alias("y"), F.col("dt").alias("dy"))
    # Two out-edges of the pivot c, the pair canonicalized by ≺ so the
    # closing edge (always oriented ≺-small → ≺-large) matches exactly.
    wedges = a.join(b, "c").filter(
        (F.col("dx") < F.col("dy"))
        | ((F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y")))
    )
    closing = oriented.select(F.col("s").alias("x"), F.col("t").alias("y"))
    tri = wedges.join(closing, ["x", "y"]).agg(F.count("*").alias("n_triangles"))
    n_v = deg.agg(F.count("*").alias("n_vertices"))
    n_e = edges.agg(F.count("*").alias("n_edges"))
    return n_v.crossJoin(n_e).crossJoin(tri)


# --------------------------------------------------------------------------
# Last-touch attribution
# --------------------------------------------------------------------------

_ATTR_TOL_DAYS = 3


@query(
    "q_attribution_last_touch",
    oracle=f"""
        WITH p AS (SELECT event_id, user_id, ts, value FROM events
                   WHERE event_type = 'purchase'),
             c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
             m AS (SELECT p.event_id, p.value, c.ts AS click_ts
                   FROM p ASOF LEFT JOIN c
                     ON p.user_id = c.user_id AND c.ts <= p.ts),
             a AS (SELECT value,
                          CASE WHEN click_ts IS NOT NULL
                                AND click_ts >= ts_sub
                               THEN CAST(date_trunc('day', click_ts)
                                         AS TIMESTAMP) END AS click_day
                   FROM (SELECT m.*,
                                (SELECT p2.ts - INTERVAL {_ATTR_TOL_DAYS} DAY
                                 FROM p p2 WHERE p2.event_id = m.event_id) AS ts_sub
                         FROM m))
        SELECT click_day, count(*) AS n_purchases,
               round(sum(value), 2) AS attributed_value
        FROM a GROUP BY 1
    """,
    tags=("events", "asof", "analytics"),
)
def q_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: every purchase is credited to
    the user's most recent click no older than _ATTR_TOL_DAYS (3) days; revenue is
    rolled up by the credited click's calendar day (NULL day = organic /
    out-of-window purchases).

    Spark has no native as-of join; the scalable composition (union-tag
    + running ``last(ignorenulls)`` over the per-user timeline — one
    user_id shuffle, no pairwise blow-up) is the same shape as
    q_join_asof, extended with the attribution-window filter before the
    rollup. ``events.value`` sits on the 2-dp grid, so the 2-dp rounded
    sum is grid-exact on both engines.

    Tie semantics pinned on both sides: a click at exactly the
    purchase's timestamp wins ("at or before"), and of equal-ts clicks
    the one DuckDB's ASOF picks is the max ts — equal ts collapse to
    one value, so the choice is value-identical.
    """
    e = t(spark, sf_dir, "events").select("event_id", "user_id", "event_type", "ts", "value")
    purchases = e.filter(F.col("event_type") == "purchase")
    clicks = e.filter(F.col("event_type") == "click")
    tagged = purchases.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.lit(1).alias("is_p"),
        F.lit(None).cast("timestamp_ntz").alias("click_ts"),
    ).unionByName(
        clicks.select(
            "event_id",
            "user_id",
            "ts",
            F.lit(None).cast("double").alias("value"),
            F.lit(0).alias("is_p"),
            F.col("ts").alias("click_ts"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_p")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    attributed = (
        tagged.withColumn("last_click_ts", F.last("click_ts", ignorenulls=True).over(w))
        .filter(F.col("is_p") == 1)
        .withColumn(
            "click_day",
            F.when(
                F.col("last_click_ts")
                >= F.col("ts") - F.expr(f"INTERVAL {_ATTR_TOL_DAYS} DAY"),
                F.date_trunc("day", F.col("last_click_ts")),
            ),
        )
    )
    return attributed.groupBy("click_day").agg(
        F.count("*").alias("n_purchases"),
        F.round(F.sum("value"), 2).alias("attributed_value"),
    )


# --------------------------------------------------------------------------
# Association rules (market basket)
# --------------------------------------------------------------------------


@query(
    "q_assoc_rules",
    oracle="""
        WITH b AS (SELECT DISTINCT l.l_orderkey AS o, p.p_brand AS item
                   FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
             n AS (SELECT count(DISTINCT o) AS n_baskets FROM b),
             cnt AS (SELECT item, count(*) AS n_item FROM b GROUP BY 1),
             pair AS (SELECT a.item AS item_a, c.item AS item_b,
                             count(*) AS n_both
                      FROM b a JOIN b c ON a.o = c.o AND a.item < c.item
                      GROUP BY 1, 2)
        SELECT item_a, item_b, n_both,
               round(CAST(n_both AS DOUBLE) / ca.n_item, 6) AS conf_a_b,
               round(CAST(n_both AS DOUBLE) / cb.n_item, 6) AS conf_b_a,
               round(CAST(n_both AS DOUBLE) * n.n_baskets
                     / (CAST(ca.n_item AS DOUBLE) * cb.n_item), 6) AS lift
        FROM pair
        JOIN cnt ca ON ca.item = pair.item_a
        JOIN cnt cb ON cb.item = pair.item_b
        CROSS JOIN n
        WHERE n_both >= 5
    """,
    tags=("agg", "analytics", "pipeline"),
)
def q_assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over order baskets (items = part brands):
    support count, both confidences, and lift for every brand pair
    co-occurring in ≥5 orders.

    Counts are exact integers; each ratio is ONE double division /
    multiply chain applied to identical integers on both engines, so
    the 6-dp round sees bit-identical inputs. Scale shape (r15
    restructure, guide §2.4): baskets shuffle ONCE on orderkey into a
    per-order item array, and pairs are generated MAP-SIDE from the
    array (value-compared, so collect_list's order is irrelevant —
    fan-out bounded by items-per-basket², here ≤ brands-per-order ~7)
    instead of the r14-era self-join, which shuffled the basket table
    a second time and re-derived the lineitem⋈part distinct for every
    consumer (measured: 10 parquet scans in the plan → 6). Basket
    count and per-item counts re-aggregate the same grouped table; the
    tiny per-item count table broadcasts into the final join.
    """
    b = (
        t(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("pk"))
        .join(
            t(spark, sf_dir, "part").select(
                F.col("p_partkey").alias("pk"), F.col("p_brand").alias("item")
            ),
            "pk",
        )
        .select("o", "item")
        .distinct()
    )
    baskets = b.groupBy("o").agg(F.collect_list("item").alias("items"))
    n_baskets = baskets.agg(F.count("*").alias("n_baskets"))
    cnt = (
        baskets.select(F.explode("items").alias("item"))
        .groupBy("item")
        .agg(F.count("*").alias("n_item"))
    )
    pair = (
        baskets.select(
            F.explode(
                F.expr(
                    "flatten(transform(items, a -> "
                    "filter(transform(items, b2 -> CASE WHEN a < b2 THEN "
                    "struct(a AS item_a, b2 AS item_b) END), "
                    "p -> p IS NOT NULL)))"
                )
            ).alias("p")
        )
        .select("p.item_a", "p.item_b")
        .groupBy("item_a", "item_b")
        .agg(F.count("*").alias("n_both"))
        .filter(F.col("n_both") >= 5)
    )
    ca = cnt.select(F.col("item").alias("item_a"), F.col("n_item").alias("n_a"))
    cb = cnt.select(F.col("item").alias("item_b"), F.col("n_item").alias("n_b"))
    return (
        pair.join(F.broadcast(ca), "item_a")
        .join(F.broadcast(cb), "item_b")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "item_a",
            "item_b",
            "n_both",
            F.round(F.col("n_both").cast("double") / F.col("n_a"), 6).alias("conf_a_b"),
            F.round(F.col("n_both").cast("double") / F.col("n_b"), 6).alias("conf_b_a"),
            F.round(
                F.col("n_both").cast("double")
                * F.col("n_baskets")
                / (F.col("n_a").cast("double") * F.col("n_b")),
                6,
            ).alias("lift"),
        )
    )


# --------------------------------------------------------------------------
# Robust outliers: median absolute deviation
# --------------------------------------------------------------------------

#: Bucket width for the value-derived rank buckets (events.value spans
#: ~0..500 → ~32 buckets per event type).
_MAD_BUCKET_W = 16


@query(
    "q_mad_outliers",
    oracle="""
        WITH r AS (SELECT event_type, value, event_id,
                          row_number() OVER (PARTITION BY event_type
                                             ORDER BY value, event_id) AS rn,
                          count(*) OVER (PARTITION BY event_type) AS n
                   FROM events),
             med AS (SELECT event_type, value AS med, n
                     FROM r WHERE rn = (n + 1) // 2),
             d AS (SELECT r.event_type, r.event_id, med.n, med.med,
                          abs(r.value - med.med) AS dev
                   FROM r JOIN med USING (event_type)),
             r2 AS (SELECT *, row_number() OVER (PARTITION BY event_type
                                                 ORDER BY dev, event_id) AS rn2
                    FROM d),
             mad AS (SELECT event_type, dev AS mad FROM r2 WHERE rn2 = (n + 1) // 2)
        SELECT d.event_type, max(d.n) AS n_events,
               max(d.med) AS med, max(mad.mad) AS mad,
               CAST(sum(CASE WHEN d.dev > 3 * mad.mad THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_outliers
        FROM d JOIN mad USING (event_type)
        GROUP BY 1
    """,
    tags=("agg", "window_rank", "analytics"),
)
def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-event-type outlier counts: lower-median of ``value``,
    MAD (lower-median of |value − med|), and how many events sit more
    than 3 MADs from the median.

    Discrete (value-at-position) medians — lesson #3: interpolating
    percentiles differ per engine. The oracle's per-type windows are
    the textbook form. The Spark side (r15 restructure, guide §2.3):
    every statistic is a function of the per-(type, value) HISTOGRAM —
    the median is the value whose inclusive running count straddles
    position (n+1) div 2, the deviation histogram re-aggregates the
    value histogram under dev = |value − med|, and the outlier count
    is a weighted histogram sum — so the corpus is aggregated ONCE and
    every window touches only histogram rows
    (``bucketed_cumsum_grouped``; no type ever funnels through a
    single task). The r14-era row form ranked the full table twice
    (measured: 25 parquet scans in the plan, 1.8 s at sf0.1 → 0.8 s).
    med and mad are raw column passthroughs; dev = one identical IEEE
    subtract/abs on identical doubles, so the ``> 3·mad`` comparison
    and the counts agree bit-for-bit with the row form and the oracle.
    """
    from map_reduce_framework_using_python_spark.operators.ranks import (
        bucketed_cumsum_grouped,
    )

    e = t(spark, sf_dir, "events").select("event_type", "value")
    h = e.groupBy("event_type", "value").agg(F.count("*").alias("c"))
    n = h.groupBy("event_type").agg(F.sum("c").alias("n"))
    cum = bucketed_cumsum_grouped(
        h,
        ["event_type"],
        F.floor(F.col("value") / _MAD_BUCKET_W),
        [F.col("value")],
        F.col("c"),
        cum_col="_cum",
    )
    pos = F.expr("(n + 1) div 2")
    med = (
        cum.join(F.broadcast(n), "event_type")
        .filter((F.col("_cum") >= pos) & (F.col("_cum") - F.col("c") < pos))
        .select("event_type", F.col("value").alias("med"), "n")
    )
    hd = h.join(F.broadcast(med), "event_type").withColumn(
        "dev", F.abs(F.col("value") - F.col("med"))
    )
    hdev = hd.groupBy("event_type", "dev").agg(F.sum("c").alias("c2"))
    cum2 = bucketed_cumsum_grouped(
        hdev,
        ["event_type"],
        F.floor(F.col("dev") / _MAD_BUCKET_W),
        [F.col("dev")],
        F.col("c2"),
        cum_col="_cum2",
    )
    mad = (
        cum2.join(F.broadcast(n), "event_type")
        .filter((F.col("_cum2") >= pos) & (F.col("_cum2") - F.col("c2") < pos))
        .select("event_type", F.col("dev").alias("mad"))
    )
    return (
        hd.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.max("n").alias("n_events"),
            F.max("med").alias("med"),
            F.max("mad").alias("mad"),
            F.sum(F.when(F.col("dev") > 3 * F.col("mad"), F.col("c")).otherwise(0))
            .cast("bigint")
            .alias("n_outliers"),
        )
    )


# --------------------------------------------------------------------------
# Rolling 7-day distinct users (DAU/WAU)
# --------------------------------------------------------------------------


@query(
    "q_wau_rolling",
    oracle="""
        WITH pairs AS (SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS d,
                                       user_id
                       FROM events),
             days AS (SELECT DISTINCT d FROM pairs)
        SELECT days.d AS day,
               count(DISTINCT CASE WHEN pairs.d = days.d
                                   THEN pairs.user_id END) AS dau,
               count(DISTINCT pairs.user_id) AS wau
        FROM days
        JOIN pairs ON pairs.d BETWEEN days.d - INTERVAL 6 DAY AND days.d
        GROUP BY 1
    """,
    tags=("events", "agg", "analytics"),
)
def q_wau_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily and trailing-7-day distinct active users (DAU/WAU) — the
    canonical product-analytics metric whose trailing DISTINCT does NOT
    decompose into a sliding-window aggregate.

    The scalable rewrite: dedup to (user, day) pairs first (one
    shuffle, output bounded by users × days), then range-join the
    bounded pair set against the tiny day spine and count distinct per
    day. The corpus-sized events table is touched exactly once; at
    100 TB the pair table is orders of magnitude smaller than the
    events it summarizes (the same pre-aggregation shape Spark's
    own approx `count_distinct` rollups use).
    """
    e = t(spark, sf_dir, "events")
    pairs = e.select(
        F.to_date("ts").alias("d"), "user_id"
    ).distinct()
    days = pairs.select("d").distinct().withColumnRenamed("d", "day")
    j = pairs.join(
        F.broadcast(days),
        (F.col("d") <= F.col("day")) & (F.col("d") >= F.date_sub(F.col("day"), 6)),
    )
    return j.groupBy("day").agg(
        F.countDistinct(
            F.when(F.col("d") == F.col("day"), F.col("user_id"))
        ).alias("dau"),
        F.countDistinct("user_id").alias("wau"),
    )


# --------------------------------------------------------------------------
# Windowed distinct count
# --------------------------------------------------------------------------


@query(
    "q_window_count_distinct",
    oracle="""
        SELECT event_id,
               count(DISTINCT event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS n_types_seen
        FROM events
    """,
    tags=("window_analytic", "analytics"),
)
def q_window_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running DISTINCT count over a window — how many distinct event
    types each user has produced up to each event.

    Spark's window aggregates reject DISTINCT; the standard rewrite is
    ``size(collect_set(x))`` over the running frame. State per row is
    the set of types seen (bounded by |event_type| = 5 here; for
    high-cardinality columns the scalable rewrite is instead a
    first-occurrence flag (row_number per (user, type) == 1) summed
    over the running window — same hash-partitioned single shuffle).
    """
    e = t(spark, sf_dir, "events").select("event_id", "user_id", "event_type", "ts")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "event_id",
        F.size(F.collect_set("event_type").over(w)).cast("bigint").alias("n_types_seen"),
    )


# --------------------------------------------------------------------------
# Fuzzy string match (blocked edit-distance join)
# --------------------------------------------------------------------------


@query(
    "q_fuzzy_match",
    oracle="""
        WITH probe AS (SELECT p_partkey, p_brand, p_name FROM part
                       WHERE p_size = 1),
             cand AS (SELECT pr.p_partkey, c.p_partkey AS match_partkey,
                             levenshtein(pr.p_name, c.p_name) AS dist
                      FROM probe pr
                      JOIN part c ON c.p_brand = pr.p_brand
                                 AND c.p_partkey <> pr.p_partkey),
             best AS (SELECT *, row_number() OVER (
                          PARTITION BY p_partkey
                          ORDER BY dist, match_partkey) AS rn
                      FROM cand)
        SELECT p_partkey, match_partkey, dist FROM best WHERE rn = 1
    """,
    tags=("join", "string", "analytics"),
)
def q_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy entity match: for every size-1 part, the closest OTHER part
    name (Levenshtein) within the same brand; deterministic tie-break on
    the smaller candidate key.

    Edit distance is exact integer DP — identical in both engines — so
    this is hash-stable with zero float hazard. The scale story is the
    BLOCKING: candidates come only from the same brand (an equi-join),
    never an all-pairs cross join, which is how fuzzy entity resolution
    survives 100 TB (block key cardinality grows with data; here brand
    stands in for the usual sorted-neighborhood / phonetic block). The
    per-probe argmin window partitions on p_partkey — maximal key
    cardinality, no skew.
    """
    p = t(spark, sf_dir, "part")
    probe = p.filter(F.col("p_size") == 1).select(
        "p_partkey", "p_brand", F.col("p_name").alias("probe_name")
    )
    cand = probe.join(
        p.select(
            F.col("p_partkey").alias("match_partkey"),
            "p_brand",
            F.col("p_name").alias("cand_name"),
        ),
        "p_brand",
    ).filter(F.col("match_partkey") != F.col("p_partkey"))
    scored = cand.select(
        "p_partkey",
        "match_partkey",
        F.levenshtein("probe_name", "cand_name").alias("dist"),
    )
    w = Window.partitionBy("p_partkey").orderBy("dist", "match_partkey")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("p_partkey", "match_partkey", "dist")
    )


# --------------------------------------------------------------------------
# Rolling EWMA (dyadic truncated kernel)
# --------------------------------------------------------------------------

_EWMA_K = 8


def _ewma_terms() -> tuple[str, str]:
    """SQL num/den expressions shared verbatim by both engines: lag i
    carries weight 2^(K-1-i) over cents (exact integers), so num/den is
    ONE bigint division in doubles — bit-identical across engines."""
    num, den = [], []
    for i in range(_EWMA_K):
        w = 2 ** (_EWMA_K - 1 - i)
        c = "c" if i == 0 else f"lag(c, {i}) OVER uw"
        num.append(f"coalesce({c}, 0) * {w}")
        den.append(f"CASE WHEN {c} IS NOT NULL THEN {w} ELSE 0 END")
    return " + ".join(num), " + ".join(den)


_EWMA_NUM, _EWMA_DEN = _ewma_terms()


@query(
    "q_rolling_ewma",
    oracle=f"""
        WITH c AS (SELECT user_id, event_id, ts,
                          CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
                   FROM events),
             s AS (SELECT user_id, event_id,
                          ({_EWMA_NUM}) AS num, ({_EWMA_DEN}) AS den
                   FROM c
                   WINDOW uw AS (PARTITION BY user_id ORDER BY ts, event_id))
        SELECT user_id, event_id,
               round(CAST(num AS DOUBLE) / (CAST(den AS DOUBLE) * 100), 6) AS ewma
        FROM s
    """,
    tags=("window_analytic", "analytics", "timeseries"),
)
def q_rolling_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average of ``value`` per user
    timeline, truncated to the last _EWMA_K (8) events with dyadic weights
    2^(K-1-i) (α = 1/2 kernel — the weights beyond 8 lags are < 1% and
    the truncation makes the operator a fixed-frame window instead of
    an unbounded recurrence).

    All arithmetic until the final division is exact: cents are
    half-up-rounded BIGINTs, weights are powers of two, num/den are
    bigint dot products. The single double division then sees identical
    operands on both engines, so the 6-dp round never straddles an ulp.
    Scale: one hash window per user_id — the per-user frame is 8 rows,
    state is O(K), no global ordering anywhere.
    """
    e = t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("c"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    num = F.lit(0).cast("bigint")
    den = F.lit(0).cast("bigint")
    for i in range(_EWMA_K):
        wt = 2 ** (_EWMA_K - 1 - i)
        c = F.col("c") if i == 0 else F.lag("c", i).over(w)
        num = num + F.coalesce(c, F.lit(0)) * wt
        den = den + F.when(c.isNotNull(), F.lit(wt)).otherwise(F.lit(0))
    return e.select(
        "user_id",
        "event_id",
        F.round(num.cast("double") / (den.cast("double") * 100), 6).alias("ewma"),
    )
