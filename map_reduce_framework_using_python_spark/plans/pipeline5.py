"""Training-pipeline operators, part 5: exact substring-span dedup.

Document-level dedup (ns_dedup_exact / minhash / simhash) misses the
dominant contamination mode in web corpora: long verbatim passages
(boilerplate, licenses, quoted articles) embedded in otherwise-distinct
documents. The standard counter-pass — "exact substring deduplication"
in Lee et al., *Deduplicating Training Data Makes Language Models
Better* (ACL 2022) — finds token spans repeated across documents and
measures how much of each document is covered by them.

The production implementation uses a suffix array over the whole
corpus; the MapReduce-friendly equivalent (and what the reference's
users would write as a mapper/reducer pair over ``documents``,
`Readme.md:6`) is fixed-width token n-gram fingerprinting: every
``_SPAN_W``-token window is hashed, windows whose digest occurs in ≥2
distinct documents are "duplicated spans", and each document reports
its duplicated-position count. That is exactly the statistic the
span-removal pass consumes (positions covered by a shared span get
cut), kept on the integer grid so both engines agree bit-for-bit.

Scale shape (100 TB): one narrow explode fans each document into
(doc_id, digest) pairs — raw text never leaves the scan stage, only
128-bit digests cross the wire. Two hash aggregates (digest→doc-count,
doc→position-count) and one digest-keyed shuffle join; no self-join of
the corpus, no driver-side state. At real scale the digest would be
``xxhash64`` (8 bytes) instead of md5 — md5 is used here because both
engines spell it identically for the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_framework_using_python_spark.plans.core import query, t

#: Span width in tokens. Lee et al. use 50 BPE tokens; the synthetic
#: docs are ~20-80 words, so 8 keeps the statistic non-degenerate.
_SPAN_W = 8


@query(
    "ns_span_dedup",
    oracle=f"""
        WITH toks AS (SELECT doc_id, string_split(text, ' ') AS a
                      FROM documents),
             sp AS (SELECT doc_id,
                           md5(array_to_string(
                               list_slice(a, CAST(g AS INT),
                                          CAST(g AS INT) + {_SPAN_W - 1}),
                               ' ')) AS h
                    FROM toks,
                         LATERAL unnest(generate_series(
                             1, greatest(len(a) - {_SPAN_W - 1}, 1))) t(g)),
             dup AS (SELECT h FROM sp
                     GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
             tot AS (SELECT doc_id, count(*) AS n_spans FROM sp GROUP BY 1),
             hit AS (SELECT doc_id, count(*) AS n_dup_spans
                     FROM sp JOIN dup USING (h) GROUP BY 1)
        SELECT tot.doc_id, tot.n_spans,
               coalesce(hit.n_dup_spans, 0) AS n_dup_spans
        FROM tot LEFT JOIN hit USING (doc_id)
    """,
    tags=("northstar", "pipeline", "dedup"),
)
def ns_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring-span dedup statistics: for every document, the
    number of 8-token window positions and how many of those positions
    carry a span that also occurs in at least one OTHER document.

    ``slice(a, g, W)`` truncates at the end of the array exactly like
    DuckDB's ``list_slice(a, g, g+W-1)``; documents shorter than W
    tokens contribute their single truncated span, so every document
    appears in the output (n_dup_spans = 0 when clean).

    Scale shape (r7 pipeline review — the prior groupBy+join-back form
    planned THREE corpus scans): one scan, one digest exchange. The
    duplicate flag is ``min(doc_id) ≠ max(doc_id)`` over an unordered
    window on the digest — "appears in ≥2 distinct docs" without a
    count(DISTINCT), which windows can't do — then one doc_id exchange
    aggregates the per-doc stats (the paragraph_dedup_stats pattern,
    plan-shape-pinned at 1 scan).
    """
    d = t(spark, sf_dir, "documents")
    sp = (
        d.select(
            "doc_id",
            F.split(F.col("text"), " ").alias("a"),
        )
        .select(
            "doc_id",
            F.col("a"),
            F.explode(
                F.sequence(
                    F.lit(1),
                    F.greatest(
                        F.size("a") - (_SPAN_W - 1), F.lit(1)
                    ),
                )
            ).alias("g"),
        )
        .select(
            "doc_id",
            F.md5(
                F.concat_ws(" ", F.expr(f"slice(a, g, {_SPAN_W})"))
            ).alias("h"),
        )
    )
    from pyspark.sql import Window

    wh = Window.partitionBy("h")
    flagged = sp.withColumn(
        "_dup",
        (F.min("doc_id").over(wh) != F.max("doc_id").over(wh)).cast("long"),
    )
    return flagged.groupBy("doc_id").agg(
        F.count("*").alias("n_spans"),
        F.sum("_dup").alias("n_dup_spans"),
    )
