"""Training-data pipeline operators over the documents corpus.

The operations a 100 TB LLM-corpus build runs between raw crawl and
tokenizer — beyond dedup/similarity/quality-scoring (northstar.py),
a pipeline needs: text normalization, hard quality gates, REPRODUCIBLE
sampling and split assignment (content-hash based, so re-runs and
late-arriving shards get identical assignments — never ``rand()``),
source-mixture reweighting, and a seeded deterministic shuffle.

Everything is pure JVM expression algebra (no Python in any per-row
path) and every query carries a DuckDB oracle — determinism across
engines is exactly the property a reproducible pipeline leans on. The
hash primitives use md5 hex (identical on both engines); bucket
membership tests use hex-prefix classes rather than bigint conversion
so no engine-specific hex→int function is needed.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from map_reduce_framework_using_python_spark.operators.ranks import bucketed_rank
from map_reduce_framework_using_python_spark.plans.core import half_up, query, t


@query(
    "ns_text_normalize",
    oracle="""
        SELECT doc_id,
               trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                                   ' +', ' ', 'g')) AS norm_text
        FROM documents
    """,
    tags=("northstar", "pipeline", "text"),
)
def ns_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical text normalization: lowercase → strip non-alnum →
    collapse whitespace → trim. The pre-tokenization cleanup pass;
    one narrow projection, no shuffle."""
    d = t(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower("text"), r"[^a-z0-9 ]", " "), r" +", " "
        )
    )
    return d.select("doc_id", norm.alias("norm_text"))


@query(
    "ns_quality_filter",
    oracle="""
        SELECT doc_id, n_chars, n_tokens
        FROM (SELECT doc_id, n_chars,
                     length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens,
                     CAST(length(replace(text, ' ', '')) AS DOUBLE)
                       / (length(text) - length(replace(text, ' ', '')) + 1) AS mean_word_len
              FROM documents)
        WHERE n_chars BETWEEN 100 AND 2000
          AND n_tokens BETWEEN 20 AND 400
          AND mean_word_len BETWEEN 2.0 AND 12.0
    """,
    tags=("northstar", "pipeline", "filter"),
)
def ns_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style hard quality gate: length, token-count, and mean-word-
    length bounds. Pure scan-side predicates — at 100 TB this prunes
    before anything expensive runs (and the length predicate on the
    typed metadata column pushes into the parquet scan)."""
    d = t(spark, sf_dir, "documents")
    n_tokens = (
        F.length("text") - F.length(F.regexp_replace("text", " ", "")) + F.lit(1)
    )
    mean_wl = (
        F.length(F.regexp_replace("text", " ", "")).cast("double") / n_tokens
    )
    return (
        d.withColumn("n_tokens", n_tokens)
        .withColumn("_mwl", mean_wl)
        .filter(
            F.col("n_chars").between(100, 2000)
            & F.col("n_tokens").between(20, 400)
            & F.col("_mwl").between(2.0, 12.0)
        )
        .select("doc_id", "n_chars", "n_tokens")
    )


@query(
    "ns_hash_sample",
    oracle="""
        SELECT doc_id, lang
        FROM documents
        WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '0'
    """,
    tags=("northstar", "pipeline", "sampling"),
)
def ns_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible 1/16 corpus sample by content-hash prefix — the
    sound way to sample at scale: no rand() (irreproducible), no
    LIMIT (orders the world), stable under re-partitioning and
    re-runs, and composable (the same predicate yields the same
    sample on any engine)."""
    d = t(spark, sf_dir, "documents")
    return d.filter(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) == "0"
    ).select("doc_id", "lang")


@query(
    "ns_train_val_test",
    oracle="""
        SELECT split, count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM (SELECT n_chars,
                     CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('e', 'f') THEN 'test'
                          WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('c', 'd') THEN 'val'
                          ELSE 'train' END AS split
              FROM documents)
        GROUP BY 1
    """,
    tags=("northstar", "pipeline", "sampling"),
)
def ns_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment by hash-prefix class
    (12/2/2 of 16): every engine, every re-run, every shard arrives at
    the same split — the property that keeps eval sets uncontaminated
    as the corpus grows."""
    d = t(spark, sf_dir, "documents")
    h = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    split = (
        F.when(h.isin("e", "f"), "test").when(h.isin("c", "d"), "val").otherwise("train")
    )
    return (
        d.withColumn("split", split)
        .groupBy("split")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("total_chars"))
    )


@query(
    "ns_mixture_upsample",
    oracle="""
        SELECT lang, count(*) AS n_rows, count(DISTINCT doc_id) AS n_docs
        FROM (SELECT d.doc_id, d.lang
              FROM documents d,
                   UNNEST(range(CASE WHEN d.lang = 'en' THEN 1
                                     WHEN d.lang = 'zh' THEN 3
                                     ELSE 2 END)) AS r(i))
        GROUP BY 1
    """,
    tags=("northstar", "pipeline", "mixture"),
)
def ns_mixture_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-mixture reweighting by replication: each language gets an
    integer weight (en×1, zh×3, others×2) and rows are exploded to that
    multiplicity — how a corpus hits its target mixture without a
    separate sampling job. JVM-side ``explode(sequence(...))``; the
    blow-up is bounded by the weight table, never data-dependent."""
    d = t(spark, sf_dir, "documents")
    weight = (
        F.when(F.col("lang") == "en", 1).when(F.col("lang") == "zh", 3).otherwise(2)
    )
    return (
        d.withColumn("_i", F.explode(F.sequence(F.lit(1), weight)))
        .groupBy("lang")
        .agg(F.count("*").alias("n_rows"), F.count_distinct("doc_id").alias("n_docs"))
    )


@query(
    "ns_seeded_shuffle",
    oracle="""
        SELECT doc_id,
               row_number() OVER (ORDER BY md5('seed42' || CAST(doc_id AS VARCHAR)), doc_id)
                 AS shuffle_rank
        FROM documents
    """,
    tags=("northstar", "pipeline", "sampling"),
)
def ns_seeded_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded deterministic global shuffle: order by md5(seed ‖ id).
    Changing the seed re-shuffles; the same seed reproduces the exact
    epoch order on any engine.

    The global epoch rank is assembled scale-safely via bucketed_rank
    (operators/ranks.py): the md5 key's first two hex chars are 256
    order-consistent buckets (prefix order == full-string order), each
    ranked in parallel, stitched with broadcast prefix-sum offsets — the
    uniform hash makes the buckets perfectly balanced, so this is the
    rare global rank with ZERO skew risk. (At 100 TB you'd widen the
    prefix and usually skip materializing ranks entirely — write with
    the writer range-partitioned on the key.)"""
    d = t(spark, sf_dir, "documents")
    key = F.md5(F.concat(F.lit("seed42"), F.col("doc_id").cast("string")))
    ranked = bucketed_rank(
        d.select("doc_id", key.alias("_key")),
        bucket=F.substring(F.col("_key"), 1, 2),
        order_by=[F.col("_key"), F.col("doc_id")],
        rank_col="shuffle_rank",
        total_col="_n",
    )
    # shuffle_rank stays BIGINT: an int cast overflows (ANSI abort) past
    # 2^31 documents — the very scale this query advertises; the oracle's
    # row_number() is BIGINT and int/bigint share a type family in the
    # parity gate (r7 pipeline review).
    return ranked.select("doc_id", F.col("shuffle_rank").alias("shuffle_rank"))


@query(
    "ns_corpus_report",
    oracle="""
        SELECT source,
               count(*) AS n_docs,
               count(DISTINCT lang) AS n_langs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars,
               floor(CAST(avg(n_chars) AS DOUBLE) * 100 + 0.5) / 100 AS avg_chars,
               count(DISTINCT md5(text)) AS n_unique_texts
        FROM documents
        GROUP BY source
    """,
    tags=("northstar", "pipeline", "report"),
)
def ns_corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus health report: volume, language spread, and
    exact-duplicate pressure (distinct content hashes vs rows) — the
    dashboard a curation run watches. One partial-agg shuffle."""
    d = t(spark, sf_dir, "documents")
    return d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.count_distinct("lang").alias("n_langs"),
        F.sum("n_chars").alias("total_chars"),
        half_up(F.avg("n_chars")).alias("avg_chars"),
        F.count_distinct(F.md5("text")).alias("n_unique_texts"),
    )



#: The ONE copy of the duplicate-candidate GRAPH (r7 pipeline review:
#: ns_dup_clusters and ns_dedup_keep_best carried byte-identical Spark
#: blocks AND oracle CTE text): prefix/suffix 100-char md5 keying,
#: union, self-join, distinct — and its recursive-CTE oracle twin.
_DUP_GRAPH_CTES = """
        keyed AS (
            SELECT doc_id, md5(substring(text, 1, 100)) AS k FROM documents
            UNION ALL
            SELECT doc_id, md5(substring(text, greatest(length(text) - 99, 1), 100)) AS k
            FROM documents),
        edges AS (
            SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
            FROM keyed a JOIN keyed b ON a.k = b.k AND a.doc_id < b.doc_id),
        sym AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
        walk(node, label) AS (
            SELECT src, src FROM sym
            UNION
            SELECT s.dst, w.label FROM walk w JOIN sym s ON s.src = w.node),
        comp AS (SELECT node, min(label) AS component FROM walk GROUP BY node)"""


def _dup_pair_graph(d):
    """Candidate duplicate pairs: docs sharing a 100-char prefix or
    suffix hash (the Spark twin of :data:`_DUP_GRAPH_CTES`)."""
    prefix = F.md5(F.substring("text", 1, 100))
    suffix = F.md5(F.expr("substring(text, greatest(length(text) - 99, 1), 100)"))
    keyed = d.select("doc_id", prefix.alias("k")).unionAll(
        d.select("doc_id", suffix.alias("k"))
    )
    a = keyed.select(F.col("doc_id").alias("doc_a"), "k")
    b = keyed.select(F.col("doc_id").alias("doc_b"), "k")
    return (
        a.join(b, "k")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


@query(
    "ns_dup_clusters",
    oracle="""\
        WITH RECURSIVE""" + _DUP_GRAPH_CTES + """
        SELECT d.doc_id, coalesce(c.component, d.doc_id) AS cluster_id
        FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
    """,
    tags=("northstar", "pipeline", "dedup", "iterative"),
)
def ns_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate CLUSTERS (not just pairs): connected components over a
    shared-prefix/suffix-hash candidate graph, via iterative min-label
    propagation (`operators/graph.py` — one shuffle per round,
    localCheckpoint lineage truncation, converges in O(diameter)).
    The DuckDB oracle computes the same closure with a recursive CTE —
    an oracle-checked ITERATIVE algorithm, not just relational algebra.
    Cluster id = min doc_id of the group (deterministic keep-witness)."""
    from map_reduce_framework_using_python_spark.operators.graph import dedup_clusters

    d = t(spark, sf_dir, "documents")
    pairs = _dup_pair_graph(d)
    return dedup_clusters(pairs, d, id_col="doc_id")


def _bpe_oracle() -> str:
    from map_reduce_framework_using_python_spark.functions.bpe import (
        PRETOKEN_RE,
        oracle_encode_sql,
    )

    return f"""
        WITH words AS (SELECT doc_id,
                              unnest(regexp_extract_all(text, '{PRETOKEN_RE}')) AS w
                       FROM documents),
             wcnt AS (SELECT doc_id, w, count(*) AS cnt FROM words GROUP BY 1, 2),
             enc AS (SELECT w, {oracle_encode_sql("w")} AS n_tok
                     FROM (SELECT DISTINCT w FROM wcnt)),
             per_doc AS (SELECT doc_id, sum(cnt * n_tok) AS n_bpe
                         FROM wcnt JOIN enc USING (w) GROUP BY 1)
        SELECT d.doc_id,
               CAST(coalesce(p.n_bpe, 0) AS BIGINT) AS n_bpe_tokens,
               length(d.text) - length(replace(d.text, ' ', '')) + 1 AS n_ws_tokens
        FROM documents d LEFT JOIN per_doc p USING (doc_id)
    """


@query(
    "ns_token_count_bpe",
    oracle=_bpe_oracle(),
    tags=("northstar", "pipeline", "text", "tokenizer"),
)
def ns_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL merge-table BPE token counting (replaces the round-4 regex
    approximation): GPT-2-style pre-tokenize, then encode each word
    with the canonical greedy lowest-rank merge loop over the frozen
    40-rule merge table (functions/bpe.py) — the actual tokenizer-cost
    model for context budgeting, next to the whitespace count.

    Scale shape: the Python merge loop (Arrow-batched pandas UDF) runs
    per DISTINCT word — vocabulary-bounded, never per occurrence; the
    corpus-sized (doc, word, count) table takes ONE vocabulary-keyed
    shuffle-hash join to pick up per-word token counts (same
    de-broadcast rule as ns_bigram_lm_score: a corpus-derived vocab
    can outgrow a broadcast). Raw text never shuffles. The DuckDB twin
    applies the SAME merge table as a rank-ordered replace chain —
    provably equal to the greedy loop (functions/bpe.py docstring,
    property-tested in tests/test_bpe.py)."""
    from map_reduce_framework_using_python_spark.functions.bpe import (
        PRETOKEN_RE,
        bpe_encode,
    )

    d = t(spark, sf_dir, "documents")
    words = d.select(
        "doc_id",
        F.explode(F.regexp_extract_all("text", F.lit(PRETOKEN_RE), 0)).alias("w"),
    )
    wcnt = words.groupBy("doc_id", "w").agg(F.count("*").alias("cnt"))

    @F.pandas_udf("long")
    def n_bpe(col: pd.Series) -> pd.Series:
        return col.map(lambda w: len(bpe_encode(w)))

    enc = wcnt.select("w").distinct().withColumn("n_tok", n_bpe("w"))
    per_doc = (
        wcnt.join(enc.hint("shuffle_hash"), "w")
        .groupBy("doc_id")
        .agg(F.sum(F.col("cnt") * F.col("n_tok")).alias("n_bpe"))
    )
    ws = F.length("text") - F.length(F.regexp_replace("text", " ", "")) + F.lit(1)
    return (
        d.select("doc_id", ws.alias("n_ws_tokens"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bpe", F.lit(0)).cast("long").alias("n_bpe_tokens"),
            "n_ws_tokens",
        )
    )


@query(
    "q_gap_fill",
    oracle="""
        WITH hourly AS (
            SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
                   round(sum(value), 2) AS total
            FROM events
            WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-01'
              AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-02'
            GROUP BY 1, 2),
        spine AS (
            SELECT t.event_type, s.h
            FROM (SELECT DISTINCT event_type FROM events) t
            CROSS JOIN (SELECT unnest(generate_series(TIMESTAMP '2024-01-01',
                                                      TIMESTAMP '2024-01-01 23:00:00',
                                                      INTERVAL 1 HOUR)) AS h) s)
        SELECT s.event_type, s.h AS hour,
               coalesce(hr.total,
                        last_value(hr.total IGNORE NULLS)
                          OVER (PARTITION BY s.event_type ORDER BY s.h
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS filled_total,
               hr.total IS NULL AS was_gap
        FROM spine s LEFT JOIN hourly hr ON hr.event_type = s.event_type AND hr.h = s.h
    """,
    tags=("timeseries", "spine", "window"),
)
def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill: hourly totals per event type joined onto a
    generated hour spine, missing hours forward-filled with the last
    observed value (window ``last(ignorenulls)``) and flagged. The
    resample-and-fill primitive every metrics pipeline needs; the spine
    is JVM ``sequence``/``explode`` — planned, never materialized on
    the driver."""
    ev = t(spark, sf_dir, "events").filter(
        (F.col("ts") >= F.lit("2024-01-01").cast("timestamp_ntz"))
        & (F.col("ts") < F.lit("2024-01-02").cast("timestamp_ntz"))
    )
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.round(F.sum("value"), 2).alias("total"))
    hours = t(spark, sf_dir, "events").select("event_type").distinct().crossJoin(
        F.broadcast(
            ev.sparkSession.range(1).select(
                F.explode(
                    F.sequence(
                        F.lit("2024-01-01 00:00:00").cast("timestamp_ntz"),
                        F.lit("2024-01-01 23:00:00").cast("timestamp_ntz"),
                        F.expr("INTERVAL 1 HOUR"),
                    )
                ).alias("h")
            )
        )
    )
    joined = hours.join(
        hourly,
        (hours.event_type == hourly.event_type) & (hours.h == hourly.h),
        "left",
    ).select(hours.event_type, hours.h.alias("hour"), hourly.total)
    w2 = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "event_type",
        "hour",
        F.coalesce("total", F.last("total", ignorenulls=True).over(w2)).alias("filled_total"),
        F.col("total").isNull().alias("was_gap"),
    )


@query(
    "ns_dedup_keep_best",
    oracle="""\
        WITH RECURSIVE""" + _DUP_GRAPH_CTES + """,
        clustered AS (
            SELECT d.doc_id, d.n_chars, coalesce(c.component, d.doc_id) AS cluster_id
            FROM documents d LEFT JOIN comp c ON c.node = d.doc_id)
        SELECT cluster_id, doc_id AS kept_doc, n_chars
        FROM (SELECT *, row_number() OVER (PARTITION BY cluster_id
                                           ORDER BY n_chars DESC, doc_id) AS rn
              FROM clustered)
        WHERE rn = 1
    """,
    tags=("northstar", "pipeline", "dedup", "iterative"),
)
def ns_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup pipeline end-to-end: candidate graph → connected
    components (iterative) → keep ONE representative per duplicate
    cluster, chosen by quality (longest doc, min-id tiebreak) rather
    than arbitrary — the policy that decides what 100 TB of training
    data actually keeps. Window rank-1 inside each cluster."""
    from pyspark.sql import Window

    from map_reduce_framework_using_python_spark.operators.graph import dedup_clusters

    d = t(spark, sf_dir, "documents")
    pairs = _dup_pair_graph(d)
    clustered = dedup_clusters(pairs, d, id_col="doc_id").join(
        d.select("doc_id", "n_chars"), "doc_id"
    )
    w = Window.partitionBy("cluster_id").orderBy(F.col("n_chars").desc(), "doc_id")
    return (
        clustered.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("cluster_id", F.col("doc_id").alias("kept_doc"), "n_chars")
    )


@query(
    "ns_stratified_sample",
    oracle="""
        SELECT lang, count(*) AS n_sampled
        FROM documents
        WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN
              (CASE WHEN lang = 'en' THEN '0' ELSE '?' END,
               CASE WHEN lang = 'en' THEN '?' ELSE '0' END,
               CASE WHEN lang = 'en' THEN '?' ELSE '1' END,
               CASE WHEN lang = 'en' THEN '?' ELSE '2' END,
               CASE WHEN lang = 'en' THEN '?' ELSE '3' END)
        GROUP BY lang
    """,
    tags=("northstar", "pipeline", "sampling"),
)
def ns_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified hash sampling: per-stratum rates from the same
    deterministic hash — here 1/16 of English (over-represented) and
    4/16 of every other language. The downsample-the-majority-class
    primitive, reproducible like every other hash-based op."""
    d = t(spark, sf_dir, "documents")
    h = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    keep = F.when(F.col("lang") == "en", h == "0").otherwise(h.isin("0", "1", "2", "3"))
    return d.filter(keep).groupBy("lang").agg(F.count("*").alias("n_sampled"))


def _bpe_encode_oracle() -> str:
    from map_reduce_framework_using_python_spark.functions.bpe import (
        PRETOKEN_RE,
        oracle_tokens_sql,
    )

    return f"""
        WITH pre AS (SELECT doc_id,
                            regexp_extract_all(text, '{PRETOKEN_RE}') AS a
                     FROM documents),
             words AS (SELECT doc_id, a[CAST(i AS INT)] AS w,
                              CAST(i AS BIGINT) AS i
                       FROM pre,
                            LATERAL unnest(generate_series(1, len(a))) t(i)),
             enc AS (SELECT w, {oracle_tokens_sql("w")} AS tok_str
                     FROM (SELECT DISTINCT w FROM words)),
             per_doc AS (SELECT doc_id,
                                string_agg(e.tok_str, ' ' ORDER BY i)
                                    AS token_seq,
                                CAST(sum(len(string_split(e.tok_str, ' ')))
                                     AS BIGINT) AS n_bpe_tokens
                         FROM words JOIN enc e USING (w) GROUP BY 1)
        SELECT d.doc_id,
               coalesce(p.token_seq, '') AS token_seq,
               coalesce(p.n_bpe_tokens, 0) AS n_bpe_tokens
        FROM documents d LEFT JOIN per_doc p USING (doc_id)
    """


@query(
    "ns_bpe_encode",
    oracle=_bpe_encode_oracle(),
    tags=("northstar", "pipeline", "text", "tokenizer"),
)
def ns_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer APPLY — the full BPE token SEQUENCE per document
    (r10, completing the lane: ns_bpe_train learns the merge table,
    ns_token_count_bpe prices documents, this EMITS the stream a
    training pipeline actually feeds to packing): GPT-2-style
    pre-tokenize, encode each distinct word with the canonical greedy
    merge loop (functions/bpe.py), and reassemble each document's
    tokens in pre-token order, space-joined (arrays would defeat the
    value-hash compare; the string splits back losslessly because BPE
    symbols never contain spaces).

    Scale shape = the count form's plus the one unavoidable assembly
    exchange: the Python loop runs per DISTINCT word (Arrow-batched,
    vocabulary-bounded), a vocabulary-keyed shuffle-hash join carries
    each word's token string onto the positioned occurrences, and ONE
    doc_id exchange assembles the sequence (array_sort over the
    collected (pos, toks) structs — no window). Raw text never
    shuffles; the assembled stream is the same size as the text, the
    floor for any tokenizer apply. The DuckDB twin applies the SAME
    merge table as the rank-ordered replace chain (provably equal to
    the greedy loop — functions/bpe.py) and reassembles with an
    ordered string_agg."""
    from map_reduce_framework_using_python_spark.functions.bpe import (
        PRETOKEN_RE,
        bpe_encode,
    )

    d = t(spark, sf_dir, "documents")
    words = d.select(
        "doc_id",
        F.posexplode(
            F.regexp_extract_all("text", F.lit(PRETOKEN_RE), 0)
        ).alias("i", "w"),
    )

    @F.pandas_udf("string")
    def toks(col: pd.Series) -> pd.Series:
        return col.map(lambda w: " ".join(bpe_encode(w)))

    enc = words.select("w").distinct().withColumn("tok_str", toks("w"))
    per_doc = (
        words.join(enc.hint("shuffle_hash"), "w")
        .groupBy("doc_id")
        .agg(
            F.concat_ws(
                " ",
                F.expr(
                    "transform(array_sort(collect_list(struct(i, tok_str))),"
                    " s -> s.tok_str)"
                ),
            ).alias("token_seq"),
            F.sum(F.size(F.split("tok_str", " "))).cast("bigint").alias(
                "n_bpe_tokens"
            ),
        )
    )
    return (
        d.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("token_seq", F.lit("")).alias("token_seq"),
            F.coalesce("n_bpe_tokens", F.lit(0)).cast("bigint").alias(
                "n_bpe_tokens"
            ),
        )
    )
