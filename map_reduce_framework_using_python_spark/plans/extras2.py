"""Edge-semantics batch: explicit cross join, generator null semantics
(explode vs explode_outer), and nth_value window frames."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from map_reduce_framework_using_python_spark.plans.core import query, t


@query(
    "q_cross_join",
    oracle="""
        SELECT r.r_name, n.n_name
        FROM region r CROSS JOIN nation n
    """,
    tags=("join", "cross"),
)
def q_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cartesian product (dim × dim — the only place a cross
    join belongs; MR: the degenerate single-key shuffle)."""
    r = t(spark, sf_dir, "region").select("r_name")
    n = t(spark, sf_dir, "nation").select("n_name")
    return r.crossJoin(n)


@query(
    "q_explode_outer",
    oracle="""
        WITH d AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 5 = 0 THEN []
                        ELSE string_split(text, ' ')[1:3] END AS arr
            FROM documents WHERE doc_id < 50)
        SELECT doc_id,
               unnest(CASE WHEN len(arr) = 0 THEN [NULL] ELSE arr END) AS word
        FROM d
    """,
    tags=("udtf", "array", "null"),
)
def q_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer: rows with empty arrays survive with a NULL element
    (plain explode would drop them) — the outer-lateral-view semantics."""
    d = t(spark, sf_dir, "documents").filter("doc_id < 50").select(
        "doc_id",
        F.when(F.col("doc_id") % 5 == 0, F.array().cast("array<string>"))
        .otherwise(F.slice(F.split("text", " "), 1, 3))
        .alias("arr"),
    )
    return d.select("doc_id", F.explode_outer("arr").alias("word"))


@query(
    "q_window_nth",
    oracle="""
        SELECT DISTINCT o_custkey,
               nth_value(o_totalprice, 2) OVER w AS second_price,
               count(*) OVER (PARTITION BY o_custkey) AS n_orders
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    tags=("window", "analytic"),
)
def q_window_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value over the full-partition frame (NULL when the partition
    is shorter than n)."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        t(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
            F.count("*").over(Window.partitionBy("o_custkey")).alias("n_orders"),
        )
        .distinct()
    )


@query(
    "q_window_pct",
    oracle="""
        SELECT o_orderkey, o_orderpriority,
               percent_rank() OVER w AS pct_rank,
               cume_dist() OVER w AS cume
        FROM orders
        WHERE o_totalprice > 400000
        WINDOW w AS (PARTITION BY o_orderpriority
                     ORDER BY o_totalprice, o_orderkey)
    """,
    tags=("window", "ranking"),
)
def q_window_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist over a deterministic (price, key)
    ordering — WITHOUT a PARTITION BY o_orderpriority window:
    o_orderpriority has 5 values, so the native window funnels each
    heavy group through ONE task at scale (the few-heavy-groups
    pathology operators/ranks.py exists for; r7 review). The grouped
    bucketed-rank composition splits each group across price buckets;
    the order is TOTAL (price, key), so every row is its own peer group
    and percent_rank = (rn-1)/(n-1), cume_dist = rn/n exactly — exact
    rationals of integer rank/count, identical per engine, raw double
    passthrough (single-row groups pin percent_rank to 0, the SQL
    definition)."""
    from map_reduce_framework_using_python_spark.operators.ranks import (
        bucketed_rank_grouped,
    )

    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    ranked = bucketed_rank_grouped(
        o.select("o_orderkey", "o_orderpriority", "o_totalprice"),
        group_cols=["o_orderpriority"],
        bucket=F.floor(F.col("o_totalprice") / 10000),
        order_by=[F.col("o_totalprice"), F.col("o_orderkey")],
        rank_col="_rn",
        total_col="_n",
    )
    rn, n = F.col("_rn"), F.col("_n")
    return ranked.select(
        "o_orderkey",
        "o_orderpriority",
        F.when(n > 1, (rn - 1) / (n - 1)).otherwise(F.lit(0.0)).alias("pct_rank"),
        (rn / n).alias("cume"),
    )


@query(
    "q_mode_by_group",
    oracle="""
        SELECT user_id, event_type, n
        FROM (SELECT user_id, event_type, count(*) AS n,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY count(*) DESC, event_type) AS rn
              FROM events GROUP BY user_id, event_type)
        WHERE rn = 1
    """,
    tags=("agg", "mode"),
)
def q_mode_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group mode (modal event_type per user, ties →
    lexicographically smallest) — built-in mode() leaves tie order
    engine-defined, so the portable form is count + ranked window with
    an explicit tie-break. Partial agg shrinks events to (user, type)
    pairs before the window's shuffle."""
    e = t(spark, sf_dir, "events")
    cnt = e.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    w = Window.partitionBy("user_id").orderBy(F.col("n").desc(), "event_type")
    return (
        cnt.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "n")
    )


@query(
    "q_argmax_struct",
    oracle="""
        SELECT o_orderstatus,
               max(struct_pack(p := o_totalprice, k := o_orderkey))['k']
                   AS top_orderkey,
               max(o_totalprice) AS top_price
        FROM orders
        GROUP BY 1
    """,
    tags=("agg", "argmax"),
)
def q_argmax_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic argmax: the orderkey of each status's priciest
    order, ties resolved to the LARGEST key by lexicographic struct
    comparison — the portable form of max_by, whose tie choice is
    engine-defined. One partial+final aggregate; struct-max is
    order-insensitive so it composes with partial aggregation."""
    o = t(spark, sf_dir, "orders")
    s = F.struct(F.col("o_totalprice").alias("p"), F.col("o_orderkey").alias("k"))
    return o.groupBy("o_orderstatus").agg(
        F.max(s)["k"].alias("top_orderkey"),
        F.max("o_totalprice").alias("top_price"),
    )


@query(
    "q_try_arithmetic",
    oracle="""
        SELECT doc_id,
               TRY_CAST(substr(text, 1, 3) AS INTEGER) AS maybe_int,
               CASE WHEN (doc_id % 7) = 0 THEN NULL
                    ELSE CAST(n_chars AS DOUBLE) / nullif(doc_id % 7, 0) END
                   AS safe_div
        FROM documents
        WHERE doc_id < 100
    """,
    tags=("predicates", "null", "error_safe"),
)
def q_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe expression semantics: try_cast of non-numeric text →
    NULL (not a job abort — at 100 TB one malformed row must never
    kill a stage), and try_divide's divide-by-zero → NULL. The oracle
    mirrors with TRY_CAST/nullif."""
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    # try_cast, not try_to_number('999'): the format form rejects
    # signs/whitespace that TRY_CAST (both engines) accepts, so the two
    # sides would diverge the moment text starts with e.g. '-12'
    # (r7 review — today both sides are NULL on every row, so the
    # format mismatch was latent).
    return d.select(
        "doc_id",
        F.substring("text", 1, 3).try_cast("int").alias("maybe_int"),
        F.try_divide(F.col("n_chars").cast("double"), F.col("doc_id") % 7).alias("safe_div"),
    )


@query(
    "q_pandas_api_agg",
    oracle="""
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               floor(SUM(n_chars) * 1.0 / COUNT(*) * 10000 + 0.5) / 10000
                   AS avg_chars
        FROM documents
        WHERE lang IS NOT NULL
        GROUP BY lang
    """,
    tags=("api", "pandas"),
)
def q_pandas_api_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pandas-on-Spark API surface (``DataFrame.pandas_api()`` →
    pandas-style groupby/agg → ``to_spark()``), under the SAME oracle
    gate as every DataFrame query: users migrating pandas pipelines
    get the pandas dialect while Catalyst still owns the plan — the
    groupby compiles to the ordinary partial+final HashAggregate, NOT
    driver-side pandas.

    Two scale rules baked in: ``index_col='doc_id'`` at the conversion
    (the DEFAULT 'sequence' index attaches a row number via an
    UNPARTITIONED window — the single-task straggler the repo bans;
    an explicit index column keeps the plan distributed), and NULL
    groups are filtered explicitly on BOTH engines (pandas groupby
    drops NaN keys where SQL GROUP BY keeps NULL — a silent semantic
    divergence otherwise). The mean quantizes half-up to the 1e-4 grid
    on both sides (exact-integer division in double on both engines)."""
    psdf = t(spark, sf_dir, "documents").pandas_api(index_col="doc_id")
    psdf = psdf[psdf["lang"].notnull()]
    g = psdf.groupby("lang").agg(
        n_docs=("source", "count"),
        total_chars=("n_chars", "sum"),
        avg_chars=("n_chars", "mean"),
    )
    sdf = g.reset_index().to_spark()
    return sdf.select(
        "lang",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("total_chars").cast("long").alias("total_chars"),
        (F.floor(F.col("avg_chars") * 1e4 + F.lit(0.5)) / 1e4).alias(
            "avg_chars"
        ),
    )


@query(
    "q_pandas_api_cumsum",
    oracle="""
        SELECT doc_id, lang, n_chars,
               CAST(SUM(n_chars) OVER (PARTITION BY lang ORDER BY doc_id)
                    AS BIGINT) AS running_chars
        FROM documents
        WHERE lang IS NOT NULL
    """,
    tags=("api", "pandas", "window"),
)
def q_pandas_api_cumsum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas-on-Spark CUMULATIVE op under the oracle gate: per-language
    running character totals via ``groupby().cumsum()`` — the pandas
    dialect's window function. pandas cumulative semantics are
    ROW-ORDER semantics, and pandas-on-Spark implements them over its
    internal natural-order column (whatever order rows happened to load
    in) — so the frame is ``orderBy("doc_id")``-ed FIRST, making the
    order explicit and the result deterministic instead of
    storage-layout-dependent. The oracle is the equivalent SQL window
    (SUM OVER PARTITION BY lang ORDER BY doc_id); BIGINT sums, no float
    accumulation. Catalyst still owns the plan: the cumsum compiles to
    an ordinary partitioned running-sum Window, not driver pandas."""
    psdf = (
        t(spark, sf_dir, "documents")
        .orderBy("doc_id")
        .pandas_api(index_col="doc_id")
    )
    psdf = psdf[["lang", "n_chars"]][psdf["lang"].notnull()]
    psdf["running_chars"] = psdf.groupby("lang")["n_chars"].cumsum()
    sdf = psdf.reset_index().to_spark()
    return sdf.select(
        "doc_id",
        "lang",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.col("running_chars").cast("long").alias("running_chars"),
    )


@query(
    "q_observe_metrics",
    oracle="""
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(CASE WHEN lang IS NULL THEN 1 END) AS BIGINT)
                   AS n_null_lang,
               CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM documents
    """,
    tags=("api", "observability"),
)
def q_observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``Observation`` API under the oracle gate: data-quality
    counters (row count, null-key count, byte mass) ride the SAME pass
    as the consuming action via ``df.observe`` — zero extra scans,
    which is the whole point at 100 TB (a separate metrics query would
    re-read the corpus). The observed values are returned as a
    one-row frame; the oracle recomputes them declaratively, pinning
    that observe's accumulator semantics equal the aggregate (exactly
    once per row, integer sums — no float accumulation)."""
    from pyspark.sql import Observation

    obs = Observation("doc_metrics")
    d = t(spark, sf_dir, "documents").observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("lang").isNull(), 1)).alias("n_null_lang"),
        F.sum("n_chars").alias("total_chars"),
    )
    d.write.format("noop").mode("overwrite").save()  # the consuming action
    m = obs.get
    return spark.createDataFrame(
        [(m["n_rows"], m["n_null_lang"], m["total_chars"])],
        "n_rows bigint, n_null_lang bigint, total_chars bigint",
    )


@query(
    "ns_sketch_set_algebra",
    oracle=None,
    tags=("northstar", "sketch", "approx", "rows_only"),
)
def ns_sketch_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datasketches set algebra (Spark 4 HLL + Theta families) — the
    100 TB shape for audience/overlap questions: per-partition sketches
    (KBs) merge associatively instead of shuffling raw ids, and Theta
    sketches answer |A∩B| / |A\\\\B| WITHOUT the join an exact COUNT
    DISTINCT would need.

    One row: HLL distinct users unioned across per-source group
    sketches vs sketched whole (MERGEABILITY — identical by
    construction, the distributed-rollup property, pinned equal), and
    Theta union/intersection/difference estimates over the purchase—
    view user sets (each pinned within 5% of exact in
    tests/test_extras2_sketches.py). Rows-only: DuckDB's
    approx_count_distinct is a different sketch."""
    e = t(spark, sf_dir, "events")
    hll_groups = (
        e.groupBy("event_type")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
        )
    )
    hll_whole = e.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est")
    )
    legs = (
        e.filter(F.col("event_type").isin("purchase", "view"))
        .groupBy("event_type")
        .agg(F.theta_sketch_agg("user_id").alias("sk"))
        .agg(
            F.max(F.when(F.col("event_type") == "purchase", F.col("sk"))).alias("a"),
            F.max(F.when(F.col("event_type") == "view", F.col("sk"))).alias("b"),
        )
        .select(
            F.theta_sketch_estimate(F.theta_union(F.col("a"), F.col("b"))).alias("n_union"),
            F.theta_sketch_estimate(F.theta_intersection(F.col("a"), F.col("b"))).alias("n_intersect"),
            F.theta_sketch_estimate(F.theta_difference(F.col("a"), F.col("b"))).alias("n_diff"),
        )
    )
    return (
        hll_groups.select(F.col("est").alias("hll_union_of_groups"))
        .crossJoin(hll_whole.select(F.col("est").alias("hll_whole")))
        .crossJoin(legs)
    )


@query(
    "ns_corpus_snapshot_diff",
    oracle="""
        WITH v1 AS (SELECT doc_id, md5(text) AS fp FROM documents),
             v2 AS (SELECT doc_id,
                           md5(CASE WHEN doc_id % 7 = 0
                                    THEN text || ' [rev2]' ELSE text END) AS fp
                    FROM documents
                    WHERE doc_id % 11 <> 3)
        SELECT CASE WHEN v1.doc_id IS NULL THEN 'added'
                    WHEN v2.doc_id IS NULL THEN 'removed'
                    WHEN v1.fp <> v2.fp THEN 'changed'
                    ELSE 'unchanged' END AS status,
               count(*) AS n_docs
        FROM v1 FULL JOIN v2 ON v1.doc_id = v2.doc_id
        GROUP BY 1
    """,
    tags=("northstar", "pipeline", "versioning"),
)
def ns_corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus VERSION DIFF — the dataset-release audit a training
    pipeline runs between snapshots: full outer join on doc id,
    content compared by fingerprint (never by text equality — the
    fingerprint column is what a manifest actually stores), each doc
    classified added / removed / changed / unchanged. The v2 snapshot
    is derived deterministically (every 7th doc revised, every
    11th ≡ 3 dropped) so the oracle replays the same derivation; a real
    deployment points the two sides at two manifest tables. Scale
    shape: one fingerprint scan per side, one doc_id-keyed full outer
    exchange, counts only — no text leaves the scan (md5 computes
    map-side; the join carries 16-byte fingerprints)."""
    d = t(spark, sf_dir, "documents")
    v1 = d.select("doc_id", F.md5("text").alias("fp"))
    v2 = (
        d.filter(F.col("doc_id") % 11 != 3)
        .select(
            "doc_id",
            F.md5(
                F.when(
                    F.col("doc_id") % 7 == 0,
                    F.concat(F.col("text"), F.lit(" [rev2]")),
                ).otherwise(F.col("text"))
            ).alias("fp"),
        )
    )
    j = v1.alias("a").join(
        v2.alias("b"), F.col("a.doc_id") == F.col("b.doc_id"), "full"
    )
    status = (
        F.when(F.col("a.doc_id").isNull(), "added")
        .when(F.col("b.doc_id").isNull(), "removed")
        .when(F.col("a.fp") != F.col("b.fp"), "changed")
        .otherwise("unchanged")
    )
    return j.groupBy(status.alias("status")).agg(F.count("*").alias("n_docs"))


@query(
    "q_map_higher_order",
    oracle="""
        SELECT o_custkey,
               'S_' || o_orderstatus AS status_key,
               count(*) AS n_orders,
               max(o_totalprice) AS max_price
        FROM orders
        GROUP BY o_custkey, o_orderstatus
        HAVING count(*) >= 2
    """,
    tags=("functions", "map", "higher_order"),
)
def q_map_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order MAP functions end to end: per-customer maps built
    with map_from_entries, fused with map_zip_with (count map ⊕
    max-price map → struct values), keys rewritten with transform_keys,
    entries pruned with map_filter, and the survivors exploded back to
    rows — the map-column algebra q_map_funcs' scalar lookups don't
    reach. Everything stays in whole-stage codegen (lambda functions
    compile to JVM expressions, no Python). The oracle is the flat
    equivalent (GROUP BY + HAVING with a stored-double passthrough),
    which is the point: map algebra must not change the relational
    answer."""
    o = t(spark, sf_dir, "orders")
    g = o.groupBy("o_custkey", "o_orderstatus").agg(
        F.count("*").alias("n"), F.max("o_totalprice").alias("mx")
    )
    per_cust = g.groupBy("o_custkey").agg(
        F.map_from_entries(
            F.collect_list(F.struct("o_orderstatus", "n"))
        ).alias("n_map"),
        F.map_from_entries(
            F.collect_list(F.struct("o_orderstatus", "mx"))
        ).alias("m_map"),
    )
    zipped = F.map_zip_with(
        "n_map", "m_map",
        lambda k, n, mx: F.struct(n.alias("n"), mx.alias("mx")),
    )
    renamed = F.transform_keys(zipped, lambda k, v: F.concat(F.lit("S_"), k))
    pruned = F.map_filter(renamed, lambda k, v: v["n"] >= 2)
    return (
        per_cust.select("o_custkey", F.explode(pruned).alias("status_key", "_v"))
        .select(
            "o_custkey",
            "status_key",
            F.col("_v.n").alias("n_orders"),
            F.col("_v.mx").alias("max_price"),
        )
    )
