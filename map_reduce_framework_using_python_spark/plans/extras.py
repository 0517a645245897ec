"""Coverage extensions: UDTF/explode, map & typed-JSON functions, union
by name, exact percentiles, approx sketches, binary functions, unpivot,
date spines, and embedding near-dup pairs.

Fills the remaining SURVEY.md §2.B rows (array/map/JSON functions,
UDTF 1→many, approx_count_distinct) plus north-star items that earn an
oracle (embedding-cosine near-dup, binary-column functions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_framework_using_python_spark.operators.similarity import embedding_near_pairs
from map_reduce_framework_using_python_spark.plans.core import query, t


@query(
    "q_explode_udtf",
    oracle="""
        SELECT p_partkey, unnest(string_split(p_type, ' ')) AS type_word
        FROM part
    """,
    tags=("udtf", "array"),
)
def q_explode_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1→many UDTF shape (MR: mapper emitting multiple lines per input)
    as a generator expression — ``explode`` runs inside codegen."""
    return t(spark, sf_dir, "part").select(
        "p_partkey", F.explode(F.split("p_type", " ")).alias("type_word")
    )


@query(
    "q_map_funcs",
    oracle="""
        SELECT p_partkey, p_brand AS brand_val, 2 AS n_keys,
               'brand' AS first_key
        FROM part
    """,
    tags=("map",),
)
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType round-trip: build a map column, read it back via
    element_at / map_keys / size (the oracle states the identities)."""
    m = F.create_map(
        F.lit("brand"), F.col("p_brand"), F.lit("type"), F.col("p_type")
    )
    return t(spark, sf_dir, "part").select(
        "p_partkey",
        F.element_at(m, "brand").alias("brand_val"),
        F.size(m).alias("n_keys"),
        F.element_at(F.map_keys(m), 1).alias("first_key"),
    )


@query(
    "q_from_json",
    oracle="""
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val
        FROM events
    """,
    tags=("json",),
)
def q_from_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed JSON parsing: ``from_json`` into a struct column, then a
    field projection (vs. the stringly get_json_object path in
    q_json_extract)."""
    return t(spark, sf_dir, "events").select(
        "event_id",
        F.from_json("props", "k INT")["k"].alias("k_val"),
    )


@query(
    "q_union_byname",
    oracle="""
        SELECT o_orderkey, o_totalprice, 'open' AS src
        FROM orders WHERE o_orderstatus = 'O'
        UNION ALL
        SELECT o_orderkey, o_totalprice, 'done' AS src
        FROM orders WHERE o_orderstatus = 'F'
    """,
    tags=("setop",),
)
def q_union_byname(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName: position-independent union (schema evolution safety
    — plain union would silently mis-zip the columns)."""
    o = t(spark, sf_dir, "orders")
    open_o = o.filter(F.col("o_orderstatus") == "O").select(
        "o_orderkey", "o_totalprice", F.lit("open").alias("src")
    )
    done_o = o.filter(F.col("o_orderstatus") == "F").select(
        F.lit("done").alias("src"), F.col("o_totalprice"), F.col("o_orderkey")
    )
    return open_o.unionByName(done_o)


@query(
    "q_percentile",
    oracle="""
        WITH r AS (
            SELECT l_returnflag, l_extendedprice AS p,
                   row_number() OVER (PARTITION BY l_returnflag
                                      ORDER BY l_extendedprice) AS rn,
                   count(*) OVER (PARTITION BY l_returnflag) AS n
            FROM lineitem)
        SELECT l_returnflag,
               max(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT) THEN p END) AS p50,
               max(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT) THEN p END) AS p90
        FROM r GROUP BY l_returnflag
    """,
    tags=("agg", "percentile", "window"),
)
def q_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact *discrete* percentiles (value at position ⌈p·n⌉): a raw
    stored value passes through — no interpolation arithmetic, so the
    oracle matches bit-for-bit. (Continuous percentile formulas differ
    across engines in the last ulp, which flips rounding at .xx5
    boundaries; the approx sketch twin is q_approx_stats, rows-only.)"""
    from pyspark.sql import Window

    w = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
    r = t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_extendedprice").alias("p"),
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("l_returnflag")).alias("n"),
    )
    return r.groupBy("l_returnflag").agg(
        F.max(F.when(F.col("rn") == F.ceil(0.5 * F.col("n")), F.col("p"))).alias("p50"),
        F.max(F.when(F.col("rn") == F.ceil(0.9 * F.col("n")), F.col("p"))).alias("p90"),
    )


@query("q_approx_stats", oracle=None, tags=("agg", "approx", "sketch"))
def q_approx_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate sketches: HLL++ count-distinct and approximate
    percentile. Rows-only check (sketch values are engine-specific);
    pytest bounds them against exact answers."""
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey").alias("approx_parts"),
            F.percentile_approx("l_extendedprice", 0.5).alias("approx_p50"),
        )
    )


@query(
    "q_binary_funcs",
    oracle="""
        SELECT doc_id,
               octet_length(encode(text)) AS n_bytes,
               base64(encode(substring(text, 1, 12))) AS head_b64
        FROM documents
    """,
    tags=("binary", "multimodal"),
)
def q_binary_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column functions (multimodal plumbing): encode to bytes,
    byte length, base64."""
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.octet_length(F.encode("text", "UTF-8")).alias("n_bytes"),
        F.base64(F.encode(F.substring("text", 1, 12), "UTF-8")).alias("head_b64"),
    )


@query(
    "q_unpivot",
    oracle="""
        SELECT l_returnflag, 'min_price' AS stat, min(l_extendedprice) AS val
        FROM lineitem GROUP BY l_returnflag
        UNION ALL
        SELECT l_returnflag, 'max_price' AS stat, max(l_extendedprice) AS val
        FROM lineitem GROUP BY l_returnflag
    """,
    tags=("unpivot",),
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide stats → long rows) via ``stack`` — the inverse of
    q_pivot."""
    wide = (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.min("l_extendedprice").alias("min_price"),
            F.max("l_extendedprice").alias("max_price"),
        )
    )
    return wide.selectExpr(
        "l_returnflag",
        "stack(2, 'min_price', min_price, 'max_price', max_price) AS (stat, val)",
    )


@query(
    "q_date_spine",
    oracle="""
        WITH spine AS (
            SELECT unnest(generate_series(TIMESTAMP '1995-01-01',
                                          TIMESTAMP '2001-08-01',
                                          INTERVAL 1 MONTH)) AS month_start)
        SELECT CAST(s.month_start AS DATE) AS month_start,
               count(o.o_orderkey) AS n_orders
        FROM spine s
        LEFT JOIN orders o
          ON date_trunc('month', o.o_orderdate) = s.month_start
        GROUP BY 1
    """,
    tags=("array", "join", "date"),
)
def q_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-spine pattern: generate a dense month sequence (sequence +
    explode — a generator, no source table) and left-join facts onto it
    so empty months survive with zero counts."""
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1995-01-01").cast("timestamp_ntz"),
                F.lit("2001-08-01").cast("timestamp_ntz"),
                F.expr("INTERVAL 1 MONTH"),
            )
        ).alias("month_start")
    )
    o = t(spark, sf_dir, "orders").select(
        F.date_trunc("month", "o_orderdate").cast("timestamp_ntz").alias("m"), "o_orderkey"
    )
    return (
        spine.join(o, o.m == spine.month_start, "left")
        .groupBy(F.col("month_start").cast("date").alias("month_start"))
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@query(
    "ns_embedding_near_pairs",
    oracle="""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               round(list_cosine_similarity(a.v, b.v), 6) AS cosine
        FROM e a JOIN e b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(a.v, b.v) >= 0.4
    """,
    tags=("northstar", "similarity", "dedup", "oracle_tier"),
)
def ns_embedding_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (threshold 0.4) — exact
    all-pairs ground truth, QUADRATIC BY DESIGN (``oracle_tier`` tag):
    it exists to pin the LSH-bucketed scale path and must not be run on
    a large corpus. Production-scale near-pair search is
    ns_lsh_cosine_topk / ns_lsh_topk_indexed (operators/similarity.py,
    operators/ann_index.py), pinned equal/recall-1.0 against this."""
    return embedding_near_pairs(t(spark, sf_dir, "embeddings"), threshold=0.4)


@query(
    "q_from_xml",
    oracle="""
        SELECT p_partkey, p_name, p_type
        FROM part WHERE p_partkey % 11 = 0
    """,
    tags=("xml", "functions"),
)
def q_from_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``from_xml`` (native XML support, Spark 4.0): serialize each part
    row to an XML fragment JVM-side, parse it back with a schema, and
    return the parsed fields — the oracle is the ORIGINAL columns, so
    the gate proves the XML round trip is lossless. The synthetic part
    names/types carry no XML-special characters (verified), so no
    escaping layer is needed; int fields re-enter exactly via the
    schema cast."""
    xml = F.concat(
        F.lit("<p><k>"), F.col("p_partkey").cast("string"),
        F.lit("</k><n>"), F.col("p_name"),
        F.lit("</n><t>"), F.col("p_type"), F.lit("</t></p>"),
    )
    parsed = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_partkey") % 11 == 0)
        .select(F.from_xml(xml, "k BIGINT, n STRING, t STRING").alias("x"))
    )
    return parsed.select(
        F.col("x.k").alias("p_partkey"),
        F.col("x.n").alias("p_name"),
        F.col("x.t").alias("p_type"),
    )


@query(
    "q_xml_roundtrip",
    oracle="""
        SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority
        FROM orders WHERE o_orderkey % 97 = 0
    """,
    tags=("xml", "scan", "sink"),
)
def q_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML SOURCE + SINK (native in Spark 4): a slice of orders lands
    as XML files (rowTag rows) and is read back with an explicit
    schema; the oracle is the parquet truth, so the gate proves the
    storage round trip is lossless. Exact-typed columns only — floats
    through a TEXT format are the one lossy temptation this query
    deliberately avoids (the parquet lane stays the production path;
    XML is an interchange format)."""
    import tempfile

    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"]
    sliced = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 97 == 0)
        .select(*cols)
    )
    out = tempfile.mkdtemp(prefix="q_xml_") + "/orders_xml"
    sliced.write.format("xml").option("rowTag", "order").save(out)
    return (
        spark.read.format("xml")
        .option("rowTag", "order")
        .schema(
            "o_orderkey BIGINT, o_custkey BIGINT,"
            " o_orderstatus STRING, o_orderpriority STRING"
        )
        .load(out)
        .select(*cols)
    )
