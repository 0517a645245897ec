"""Training-pipeline operators, part 2: chunking, decontamination, TF-IDF.

Three more passes a 100 TB corpus build runs between crawl and
tokenizer (complementing pipeline_queries.py / northstar.py):

* **Chunking** — split documents into fixed-width overlapping windows
  (the unit LLM pretraining actually consumes). Pure expression
  algebra: `sequence()` of chunk starts + `posexplode` — no Python,
  no shuffle; output size is data-proportional.
* **Decontamination** — flag corpus documents sharing character
  shingles with a held-out benchmark set. The benchmark shingle set is
  tiny relative to the corpus, so it broadcasts; the corpus side never
  shuffles raw text, only (doc_id, 128-bit digest).
* **TF-IDF** — corpus-level term statistics (document frequency,
  total term frequency, idf). Two hash aggregates with map-side
  partial agg; idf is rounded half-up on both engines (plans/core.py
  rationale — `ln` may differ in the last ulp across libm builds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_framework_using_python_spark.plans.core import half_up, query, t

#: Chunk window/stride (chars) — overlapping windows, stride < window.
_CHUNK_LEN, _CHUNK_STRIDE = 500, 400
#: Decontamination shingle width / stride (chars).
_SHINGLE_LEN, _SHINGLE_STRIDE = 30, 10


@query(
    "ns_chunk_documents",
    oracle=f"""
        SELECT doc_id,
               CAST(g AS BIGINT) AS chunk_start,
               md5(substr(text, CAST(g AS INT), {_CHUNK_LEN})) AS chunk_hash,
               length(substr(text, CAST(g AS INT), {_CHUNK_LEN})) AS chunk_len
        FROM documents,
             LATERAL unnest(generate_series(1, n_chars, {_CHUNK_STRIDE})) t(g)
    """,
    tags=("northstar", "pipeline", "chunking"),
)
def ns_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-width character chunks (window 500, stride
    400): the pre-tokenization windowing pass. `sequence()` generates
    chunk starts JVM-side and `explode` fans out — a narrow map-only
    plan whose output is bounded by ~1.25× input bytes; chunk content
    leaves the stage only as a 128-bit digest here (real pipelines
    would write the substring column instead)."""
    d = t(spark, sf_dir, "documents")
    return (
        # n_chars >= 1 guard (r7 review): Spark's sequence(1, 0, 400)
        # throws 'Illegal sequence boundaries' where the oracle's
        # generate_series(1, 0, 400) is simply empty — filter empty
        # docs out first so both engines emit no chunks for them.
        d.filter(F.col("n_chars") >= 1)
        .select(
            "doc_id",
            "text",
            F.explode(
                F.sequence(
                    F.lit(1), F.col("n_chars").cast("int"), F.lit(_CHUNK_STRIDE)
                )
            ).alias("g"),
        )
        .select(
            "doc_id",
            F.col("g").cast("bigint").alias("chunk_start"),
            F.md5(F.expr(f"substring(text, g, {_CHUNK_LEN})")).alias("chunk_hash"),
            F.length(F.expr(f"substring(text, g, {_CHUNK_LEN})")).alias("chunk_len"),
        )
    )


@query(
    "ns_decontaminate",
    oracle=f"""
        WITH sh AS (SELECT doc_id, source,
                           md5(substr(text, CAST(g AS INT), {_SHINGLE_LEN})) AS h
                    FROM documents,
                         LATERAL unnest(generate_series(
                             1, greatest(n_chars - {_SHINGLE_LEN - 1}, 1),
                             {_SHINGLE_STRIDE})) t(g)),
             bench AS (SELECT DISTINCT h FROM sh WHERE source = 'src0'),
             corp AS (SELECT DISTINCT doc_id, h FROM sh WHERE source <> 'src0')
        SELECT corp.doc_id, count(*) AS n_hits
        FROM corp JOIN bench USING (h)
        GROUP BY 1
    """,
    tags=("northstar", "pipeline", "decontamination"),
)
def ns_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: corpus documents sharing ≥1 character
    30-shingle (stride 10) with the held-out set (source='src0'),
    with the overlapping-shingle count as evidence.

    Scale shape: the benchmark side is fixed-size (a benchmark suite,
    not the corpus) → its distinct digest set broadcasts; the corpus
    side is one explode + two hash aggregates shuffling only (doc_id,
    digest) pairs — raw text never crosses the wire. This is the same
    architecture as MinHash-LSH dedup (operators/dedup.py) with the
    candidate set replaced by a fixed reference."""
    d = t(spark, sf_dir, "documents")
    sh = d.select(
        "doc_id",
        "source",
        "text",
        F.explode(
            F.sequence(
                F.lit(1),
                F.greatest(
                    F.col("n_chars") - (_SHINGLE_LEN - 1), F.lit(1)
                ).cast("int"),
                F.lit(_SHINGLE_STRIDE),
            )
        ).alias("g"),
    ).select(
        "doc_id",
        "source",
        F.md5(F.expr(f"substring(text, g, {_SHINGLE_LEN})")).alias("h"),
    )
    bench = sh.filter(F.col("source") == "src0").select("h").distinct()
    corp = sh.filter(F.col("source") != "src0").select("doc_id", "h").distinct()
    return (
        corp.join(F.broadcast(bench), "h")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hits"))
    )


@query(
    "ns_tfidf",
    oracle="""
        WITH words AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                       FROM documents),
             tf AS (SELECT term, doc_id, count(*) AS tf
                    FROM words GROUP BY 1, 2),
             stats AS (SELECT term, count(*) AS df,
                              CAST(sum(tf) AS BIGINT) AS tf_total
                       FROM tf GROUP BY 1),
             n AS (SELECT count(*) AS n_docs FROM documents)
        SELECT term, df, tf_total,
               floor(ln(CAST(n_docs AS DOUBLE) / df) * 10000 + 0.5) / 10000 AS idf
        FROM stats, n
    """,
    tags=("northstar", "pipeline", "text"),
)
def ns_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus term statistics: document frequency, total term
    frequency, and idf = ln(N/df) per term (rounded 4dp half-up, both
    engines — plans/core.py).

    Two-level aggregation — (term, doc) then (term) — each with
    map-side partial agg; the vocabulary (not the corpus) bounds the
    final exchange, which is exactly why TF-IDF scales: 100 TB of text
    reduces to |vocab| rows before anything wide happens."""
    d = t(spark, sf_dir, "documents")
    words = d.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    )
    tf = words.groupBy("term", "doc_id").agg(F.count("*").alias("tf"))
    stats = tf.groupBy("term").agg(
        F.count("*").alias("df"), F.sum("tf").alias("tf_total")
    )
    n = d.agg(F.count("*").alias("n_docs"))
    return stats.crossJoin(F.broadcast(n)).select(
        "term",
        "df",
        "tf_total",
        half_up(F.log(F.col("n_docs").cast("double") / F.col("df")), 4).alias("idf"),
    )


@query(
    "ns_word_cooccurrence",
    oracle="""
        WITH w AS (SELECT DISTINCT doc_id,
                          unnest(string_split(text, ' ')) AS word
                   FROM documents)
        SELECT a.word AS word_a, b.word AS word_b, count(*) AS n_docs
        FROM w a JOIN w b ON a.doc_id = b.doc_id AND a.word < b.word
        GROUP BY 1, 2
        HAVING count(*) >= 50
    """,
    tags=("northstar", "text", "cooccurrence"),
)
def ns_word_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word co-occurrence with min-support (market-basket over the
    corpus) — the classic MR 'pairs' job (the reference's users would
    write a pair-emitting mapper; `Readme.md:6`), as declarative Spark.

    Scale shape: the self-join is per-document and bounded by each
    document's DISTINCT vocabulary (not its length), so the blow-up is
    |vocab_d|² per doc — the standard market-basket cost — and the
    support filter collapses the result before anything leaves the
    aggregate. The join key is doc_id: one co-partitioned shuffle."""
    d = t(spark, sf_dir, "documents")
    w = d.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("word")
    ).distinct()
    a = w.select("doc_id", F.col("word").alias("word_a"))
    b = w.select("doc_id", F.col("word").alias("word_b"))
    return (
        a.join(b, "doc_id")
        .filter(F.col("word_a") < F.col("word_b"))
        .groupBy("word_a", "word_b")
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") >= 50)
    )


@query(
    "ns_event_transitions",
    oracle="""
        WITH s AS (SELECT user_id, event_type,
                          lead(event_type) OVER (PARTITION BY user_id
                                                 ORDER BY ts, event_id) AS next_type
                   FROM events)
        SELECT event_type, next_type, count(*) AS n
        FROM s WHERE next_type IS NOT NULL
        GROUP BY 1, 2
    """,
    tags=("events", "path"),
)
def ns_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order path analysis: counts of (event_type → next event
    type) transitions per user timeline — the empirical Markov matrix
    behind funnel design. One (user, time) window pass + one bounded
    aggregate (|event types|² rows out)."""
    from pyspark.sql import Window

    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = e.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    return s.groupBy("event_type", "next_type").agg(F.count("*").alias("n"))


@query(
    "ns_corpus_build",
    oracle="""
        WITH gated AS (SELECT doc_id, text, lang, n_chars
                       FROM documents
                       WHERE n_chars BETWEEN 100 AND 2000),
             deduped AS (SELECT min(doc_id) AS doc_id
                         FROM gated GROUP BY md5(text)),
             survivors AS (SELECT g.doc_id, g.lang, g.n_chars
                           FROM gated g JOIN deduped d ON g.doc_id = d.doc_id)
        SELECT doc_id, lang, n_chars,
               CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('e','f')
                         THEN 'test'
                    WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('c','d')
                         THEN 'val'
                    ELSE 'train' END AS split
        FROM survivors
    """,
    tags=("northstar", "pipeline", "capstone"),
)
def ns_corpus_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus-build capstone: quality gate → exact dedup (min-id
    witness per content hash) → reproducible split assignment, composed
    as ONE declarative plan (each stage individually oracle-gated:
    ns_quality_filter, ns_dedup_exact, ns_train_val_test).

    Scale shape is the sum of its parts: the gate is scan-side, the
    dedup shuffles only (digest, doc_id), the split is a pure
    projection — so the whole pipeline is one scan + one exchange, and
    Catalyst fuses the rest. This is the query a user actually ships."""
    d = t(spark, sf_dir, "documents").filter(F.col("n_chars").between(100, 2000))
    keep = d.groupBy(F.md5("text").alias("h")).agg(F.min("doc_id").alias("doc_id"))
    survivors = d.join(keep.select("doc_id"), "doc_id")
    first_hex = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    return survivors.select(
        "doc_id",
        "lang",
        "n_chars",
        F.when(first_hex.isin("e", "f"), "test")
        .when(first_hex.isin("c", "d"), "val")
        .otherwise("train")
        .alias("split"),
    )


@query(
    "ns_fuzzy_match",
    oracle="""
        WITH p AS (SELECT doc_id, source, substr(text, 1, 40) AS prefix
                   FROM documents)
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               levenshtein(a.prefix, b.prefix) AS edit_dist
        FROM p a JOIN p b ON b.doc_id = a.doc_id + 1
        WHERE levenshtein(a.prefix, b.prefix) <= 28
    """,
    tags=("northstar", "text", "fuzzy"),
)
def ns_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance fuzzy matching (levenshtein ≤ 28 on 40-char
    prefixes, adjacent-id candidate pairs). The candidate generation is
    a narrow equi-join — at scale you'd block candidates first (LSH /
    sorted-neighborhood, operators/dedup.py) and levenshtein-verify
    only within blocks, exactly this verify step; cost is bounded by
    the fixed prefix length, not document size."""
    d = t(spark, sf_dir, "documents")
    p = d.select(
        "doc_id", F.substring("text", 1, 40).alias("prefix")
    )
    a = p.select(F.col("doc_id").alias("doc_a"), F.col("prefix").alias("pa"))
    b = p.select(F.col("doc_id").alias("doc_b"), F.col("prefix").alias("pb"))
    return (
        a.join(b, F.col("doc_b") == F.col("doc_a") + 1)
        .select(
            "doc_a",
            "doc_b",
            F.levenshtein("pa", "pb").alias("edit_dist"),
        )
        .filter(F.col("edit_dist") <= 28)
    )
