"""Join surface: inner/outer/semi/anti, broadcast, theta/range, as-of,
multi-way star joins, and join-driven TPC-H-style analytics.

The reference can only join via the repartition ("tagged union") MR
pattern — mappers emit ``(key, tag+payload)`` from both inputs, the
reducer pairs tags per key (SURVEY.md §2.B); a broadcast join is
impossible there (no distributed cache). Here every variant is a
declarative join and Catalyst picks broadcast-hash / shuffled-hash /
sort-merge per side sizes; at 100 TB the BOUNDED dims (region, nation,
supplier) stay broadcast, while corpus-sized tables (customer, part —
billions of rows at that scale) carry no forced hint: Catalyst
broadcasts them below the threshold and shuffles them above, so the
same plan code survives the scale-up (q_join_broadcast keeps its hint
deliberately — it demonstrates the explicit map-side join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from map_reduce_framework_using_python_spark.plans.core import dec, half_up, query, t


@query(
    "q_join_inner",
    oracle="""
        SELECT o.o_orderkey, c.c_name, o.o_totalprice
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE o.o_orderstatus = 'F'
    """,
    tags=("join",),
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi inner join fact→dim (reference: repartition join via tagged
    union). customer is dim-sized → Catalyst broadcasts it."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    c = t(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey).select("o_orderkey", "c_name", "o_totalprice")


@query(
    "q_join_broadcast",
    oracle="""
        SELECT p.p_brand,
               floor(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) * 100 + 0.5) / 100 AS revenue,
               count(*) AS n_items
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY p.p_brand
    """,
    tags=("join", "broadcast", "agg"),
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast (map-side) join — impossible in the reference
    (no distributed cache, SURVEY.md §2.B). The fact side never shuffles
    for the join; only the final small agg exchanges."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            half_up(F.sum(dec("l_extendedprice") * (1 - dec("l_discount")))).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "q_join_left",
    oracle="""
        SELECT c.c_custkey, c.c_name,
               count(o.o_orderkey) AS n_orders,
               round(coalesce(sum(o.o_totalprice), 0), 2) AS total_spent
        FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey, c.c_name
    """,
    tags=("join", "outer"),
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join keeping order-less customers (reference MR: reducer
    emits nulls for the missing tag)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_spent"),
        )
    )


@query(
    "q_join_full",
    oracle="""
        SELECT coalesce(s.nk, c.nk) AS n_nationkey,
               coalesce(s.n_supps, 0) AS n_supps,
               coalesce(c.n_custs, 0) AS n_custs
        FROM (SELECT s_nationkey AS nk, count(*) AS n_supps FROM supplier GROUP BY 1) s
        FULL JOIN (SELECT c_nationkey AS nk, count(*) AS n_custs FROM customer GROUP BY 1) c
          ON s.nk = c.nk
    """,
    tags=("join", "outer"),
)
def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two aggregates (nations with suppliers but no
    customers and vice versa both survive)."""
    s = t(spark, sf_dir, "supplier").groupBy(F.col("s_nationkey").alias("nk")).agg(
        F.count("*").alias("n_supps")
    )
    c = t(spark, sf_dir, "customer").groupBy(F.col("c_nationkey").alias("nk")).agg(
        F.count("*").alias("n_custs")
    )
    return (
        s.join(c, "nk", "full")
        .select(
            F.col("nk").alias("n_nationkey"),
            F.coalesce("n_supps", F.lit(0)).alias("n_supps"),
            F.coalesce("n_custs", F.lit(0)).alias("n_custs"),
        )
    )


@query(
    "q_join_semi",
    oracle="""
        SELECT c_custkey, c_name FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
    """,
    tags=("join", "semi"),
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join ≡ EXISTS (reference MR: reducer emits key iff the
    other tag is present)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "q_join_anti",
    oracle="""
        SELECT c_custkey, c_name FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    tags=("join", "anti"),
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join ≡ NOT EXISTS."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "q_join_range",
    oracle="""
        SELECT b.band_id,
               count(*) AS n_items,
               round(sum(l.l_extendedprice), 2) AS band_revenue
        FROM lineitem l
        JOIN (VALUES (1, 0.0, 25000.0), (2, 25000.0, 50000.0),
                     (3, 50000.0, 75000.0), (4, 75000.0, 110000.0)
             ) AS b(band_id, lo, hi)
          ON l.l_extendedprice >= b.lo AND l.l_extendedprice < b.hi
        GROUP BY b.band_id
    """,
    tags=("join", "range"),
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join against a banding table — a non-equi join the
    reference could only express as a degenerate single-key shuffle.
    The band table is tiny → broadcast nested-loop, fact side unshuffled."""
    li = t(spark, sf_dir, "lineitem")
    bands = spark.createDataFrame(
        [(1, 0.0, 25000.0), (2, 25000.0, 50000.0), (3, 50000.0, 75000.0), (4, 75000.0, 110000.0)],
        "band_id int, lo double, hi double",
    )
    return (
        li.join(
            F.broadcast(bands),
            (li.l_extendedprice >= bands.lo) & (li.l_extendedprice < bands.hi),
        )
        .groupBy("band_id")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum("l_extendedprice"), 2).alias("band_revenue"),
        )
    )


@query(
    "q_join_theta",
    oracle="""
        SELECT s.s_nationkey AS n_nationkey, count(*) AS n_pairs
        FROM supplier s JOIN customer c
          ON s.s_nationkey = c.c_nationkey AND s.s_acctbal > c.c_acctbal
        GROUP BY s.s_nationkey
    """,
    tags=("join", "theta"),
)
def q_join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta join: equi key + inequality residual (planned as a hash join
    on the equi part with the inequality as a post-filter)."""
    s = t(spark, sf_dir, "supplier")
    c = t(spark, sf_dir, "customer")
    return (
        s.join(c, (s.s_nationkey == c.c_nationkey) & (s.s_acctbal > c.c_acctbal))
        .groupBy(F.col("s_nationkey").alias("n_nationkey"))
        .agg(F.count("*").alias("n_pairs"))
    )


@query(
    "q_join_asof",
    oracle="""
        WITH e AS (SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events)
        SELECT p.event_id, p.ts, c.ts AS last_click_ts
        FROM (SELECT * FROM e WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT * FROM e WHERE event_type = 'click') c
          ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    tags=("join", "asof"),
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's latest click at or
    before it. Spark lacks a native as-of join; the scalable composition
    is union-tag + running ``last(ignorenulls)`` over a (user, time)
    window — one shuffle, no pairwise blow-up (vs. the naive
    join-then-max which is O(purchases × clicks) per user).
    """
    from map_reduce_framework_using_python_spark.plans.funnel import asof_match

    e = t(spark, sf_dir, "events").select("event_id", "user_id", "event_type", "ts")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts")
    return asof_match(
        purchases, clicks, key="user_id", ts_col="ts",
        match_col="last_click_ts", direction="backward",
    ).select("event_id", "ts", "last_click_ts")


@query(
    "q05_local_supplier",
    oracle="""
        SELECT n.n_name,
               floor(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) * 100 + 0.5) / 100 AS revenue
        FROM customer c
        JOIN orders o   ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        JOIN region r   ON r.r_regionkey = n.n_regionkey
        WHERE r.r_name = 'ASIA'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY n.n_name
    """,
    tags=("join", "star", "agg"),
)
def q05_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style 6-table star join. Bounded dims (supplier, nation,
    region) carry broadcast hints; customer does NOT — it grows with the
    corpus (~15B rows at 100 TB), so a forced broadcast would OOM; the
    hint-free join lets Catalyst broadcast it at small SFs and shuffle
    it at scale (r7 core-SQL review). lineitem — the 100 TB-scale table
    — shuffles exactly once (on l_orderkey for the orders join)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (s.s_nationkey == c.c_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            half_up(F.sum(dec("l_extendedprice") * (1 - dec("l_discount")))).alias("revenue")
        )
    )


@query(
    "q03_shipping_priority",
    oracle="""
        SELECT l.l_orderkey,
               floor(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) * 100 + 0.5) / 100 AS revenue,
               o.o_orderdate
        FROM customer c
        JOIN orders o   ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1997-01-01'
          AND l.l_shipdate > TIMESTAMP '1997-01-01'
        GROUP BY l.l_orderkey, o.o_orderdate
        ORDER BY revenue DESC, l.l_orderkey
        LIMIT 10
    """,
    tags=("join", "agg", "limit"),
)
def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style shipping priority: selective dim filter, star join,
    grouped revenue, global top-10 (TakeOrderedAndProject)."""
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz")
    )
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-01-01").cast("timestamp_ntz")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        # No broadcast hint on customer: it scales with the corpus —
        # Catalyst auto-broadcasts it below the threshold, shuffles above.
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            half_up(F.sum(dec("l_extendedprice") * (1 - dec("l_discount")))).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@query(
    "q18_large_orders",
    oracle="""
        SELECT o.o_orderkey, o.o_custkey, q.total_qty
        FROM orders o
        JOIN (SELECT l_orderkey, sum(l_quantity) AS total_qty
              FROM lineitem GROUP BY l_orderkey
              HAVING sum(l_quantity) > 300) q
          ON q.l_orderkey = o.o_orderkey
    """,
    tags=("join", "agg", "having"),
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-style large-volume orders: agg-then-join (aggregate
    before the join so only qualifying keys participate)."""
    o = t(spark, sf_dir, "orders")
    big = (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    return o.join(big, o.o_orderkey == big.l_orderkey).select(
        "o_orderkey", "o_custkey", "total_qty"
    )


@query(
    "q10_returned_items",
    oracle="""
        SELECT c.c_custkey, c.c_name,
               floor(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) * 100 + 0.5) / 100 AS revenue
        FROM customer c
        JOIN orders o   ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE l.l_returnflag = 'R'
        GROUP BY c.c_custkey, c.c_name
        ORDER BY revenue DESC, c.c_custkey
        LIMIT 20
    """,
    tags=("join", "agg", "limit"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-style: revenue lost to returns, top-20 customers."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        # Same rationale as q05: customer is corpus-sized, no forced hint.
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            half_up(F.sum(dec("l_extendedprice") * (1 - dec("l_discount")))).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@query(
    "q_join_shuffle_hash",
    oracle="""
        SELECT o.o_orderkey, c.c_name, o.o_totalprice
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE o.o_orderstatus = 'F'
    """,
    tags=("join", "shuffle_hash"),
)
def q_join_shuffle_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_join_inner under the SHUFFLE_HASH hint — the fourth join
    strategy beside broadcast (q_join_broadcast), sort-merge
    (q05_local_supplier_smj), and bucketed zero-exchange SMJ
    (q05_local_supplier_bucketed), completing the matrix. At 100 TB
    shuffle-hash is the right call when BOTH sides exceed the broadcast
    threshold but one side's PER-PARTITION hash table fits in executor
    memory: it shuffles like SMJ but skips both sorts (build + probe
    instead). Results are strategy-invariant — the oracle is
    q_join_inner's verbatim; the ShuffledHashJoin plan node is pinned
    in tests/test_plan_shapes.py."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    c = t(spark, sf_dir, "customer")
    return (
        o.join(c.hint("shuffle_hash"), o.o_custkey == c.c_custkey)
        .select("o_orderkey", "c_name", "o_totalprice")
    )
