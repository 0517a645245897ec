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


#: Minimum repeat length (tokens) for the variable-length span finder.
#: Lee et al. use 50 BPE tokens; the synthetic docs are ~20-80 words,
#: so 12 keeps the statistic non-degenerate (45 maximal spans, lengths
#: 23-93, at sf0.01) while preserving the algorithm exactly.
_ES_MIN = 12


def exact_substring_spans(
    docs: DataFrame,
    min_len: int = _ES_MIN,
    text_col: str = "text",
    id_col: str = "doc_id",
    digest: str = "md5",
) -> DataFrame:
    """Maximal runs of DUPLICATED token positions of length ≥
    ``min_len`` — the variable-length ExactSubstr form of Lee et al.
    (ACL 2022) §4.1, which ns_span_dedup's per-document COUNTS cannot
    express: the removal pass needs (start, end) extents, and two
    abutting repeats vs one long repeat are different cut lists even
    when the counts tie.

    Suffix-array-free construction: every duplicated substring of
    length L ≥ k covers a run of L−k+1 consecutive positions whose
    stride-1 k-shingles each occur at ≥2 (doc, pos) sites in the
    corpus (k = ``min_len``; intra-document repeats count, as in the
    paper). So: hash every k-shingle, keep duplicated digests, and
    merge consecutive surviving positions per document
    (gaps-and-islands). Each emitted span is a maximal run of
    duplicated shingle positions — the UNION OF COVERS of duplicated
    substrings, which is exactly what the removal pass consumes. Note
    the union can FUSE two abutting repeats whose straddling shingles
    are each duplicated against different sources, so an emitted span
    need not itself occur verbatim at ≥2 sites as one substring;
    removal semantics and the oracle are unaffected (both encode the
    same position-cover reduction). Emits ``(doc_id, start_pos,
    end_pos, span_len)`` on the 1-based token grid, ``span_len =
    end_pos − start_pos + 1 ≥ min_len``; documents shorter than
    ``min_len`` contribute their single truncated shingle (the
    ns_span_dedup convention), so a whole-short-doc duplicate still
    surfaces.

    Scale shape (100 TB): raw text never leaves the scan — the fan-out
    is (doc_id, position, 128-bit digest). One digest-keyed exchange
    decides duplication (count ≥ 2 via an unordered window — never a
    corpus self-join), one doc_id exchange orders positions for the
    island merge, and the final group-by reuses that partitioning
    (doc_id ⊆ the grouping key). Per-document window state is bounded
    by the longest document, not the corpus.
    """
    from pyspark.sql import Window

    from map_reduce_framework_using_python_spark.operators.dedup_index import (
        shingle_instances,
    )

    k = int(min_len)
    sp = shingle_instances(docs, text_col, id_col, k, digest)
    dup_pos = sp.withColumn(
        "_n", F.count("*").over(Window.partitionBy("h"))
    ).filter(F.col("_n") >= 2)
    isl = dup_pos.withColumn(
        "grp",
        F.col("g")
        - F.row_number().over(Window.partitionBy("doc_id").orderBy("g")),
    )
    return (
        isl.groupBy("doc_id", "grp")
        .agg(
            F.min("g").alias("start_pos"),
            (F.max("g") + F.lit(k - 1)).cast("long").alias("end_pos"),
        )
        .select(
            "doc_id",
            "start_pos",
            "end_pos",
            (F.col("end_pos") - F.col("start_pos") + 1).alias("span_len"),
        )
    )


@query(
    "ns_exact_substring_spans",
    oracle=f"""
        WITH toks AS (SELECT doc_id, string_split(text, ' ') AS a
                      FROM documents),
             sp AS (SELECT doc_id, CAST(g AS BIGINT) AS g,
                           md5(array_to_string(
                               list_slice(a, CAST(g AS INT),
                                          CAST(g AS INT) + {_ES_MIN - 1}),
                               ' ')) AS h
                    FROM toks,
                         LATERAL unnest(generate_series(
                             1, greatest(len(a) - {_ES_MIN - 1}, 1))) t(g)),
             dup AS (SELECT h FROM sp GROUP BY h HAVING count(*) >= 2),
             pos AS (SELECT doc_id, g FROM sp JOIN dup USING (h)),
             isl AS (SELECT doc_id, g,
                            g - row_number() OVER (PARTITION BY doc_id
                                                   ORDER BY g) AS grp
                     FROM pos)
        SELECT doc_id,
               min(g) AS start_pos,
               max(g) + {_ES_MIN - 1} AS end_pos,
               max(g) + {_ES_MIN} - min(g) AS span_len
        FROM isl
        GROUP BY doc_id, grp
    """,
    tags=("northstar", "pipeline", "dedup"),
)
def ns_exact_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variable-length exact-substring dedup (Lee et al. ExactSubstr):
    every MAXIMAL token span of length ≥ 12 that occurs at two or more
    (document, position) sites in the corpus, as (doc_id, start_pos,
    end_pos, span_len) cut extents on the 1-based token grid — the
    input the paper's removal pass consumes, where ns_span_dedup
    reports only per-document coverage counts. See
    :func:`exact_substring_spans` for the suffix-array-free reduction
    and the 100 TB shape (digests-only shuffles, no corpus self-join);
    the planted-repeat pins (boundary exactness, intra-doc repeats,
    blocked-stride misses) live in tests/test_pipeline5_spans.py."""
    return exact_substring_spans(t(spark, sf_dir, "documents"))


def exact_substring_apply(
    docs: DataFrame,
    min_len: int = _ES_MIN,
    text_col: str = "text",
    id_col: str = "doc_id",
    digest: str = "md5",
) -> DataFrame:
    """The REMOVAL pass over :func:`exact_substring_spans`'s extents —
    Lee et al. §4.1's ExactSubstr-dedup applied keep-one: for every
    duplicated ``min_len``-shingle, the lexicographically first
    (doc_id, position) site is the canonical copy and survives; every
    OTHER site's tokens are cut. Keep-one at shingle granularity makes
    the paper's ambiguous "remove from all but one" deterministic and
    oracle-expressible: when N docs share a span, the min-doc keeps it
    intact (all its shingle sites rank first) and the rest trim it;
    misaligned extents trim exactly their shared part; an intra-doc
    repeat keeps its first occurrence. A token is removed iff ANY
    covering shingle site is a non-canonical duplicate. Emits every
    document as ``(doc_id, clean_text, n_removed)`` — untouched docs
    pass through verbatim with n_removed = 0; a fully-duplicated doc
    emits ''.

    Scale shape: the spans pipeline's digest exchange grows one
    row_number (total order (doc_id, g) within each digest — partition
    size = a digest's duplication multiplicity, never corpus-bounded),
    removal positions island-merge per doc into RANGES (few per doc),
    and ONE doc_id join carries the ranges array back onto the text —
    the rebuild is a map-side JVM filter/transform over the token
    array, the paragraph-apply economics (2 corpus scans: digests,
    then the one text join-back).
    """
    from pyspark.sql import Window

    from map_reduce_framework_using_python_spark.operators.dedup_index import (
        shingle_instances,
    )

    k = int(min_len)
    base = docs.select(
        F.col(id_col).alias("doc_id"), F.split(F.col(text_col), " ").alias("a")
    )
    sp = shingle_instances(docs, text_col, id_col, k, digest)
    wh = Window.partitionBy("h")
    rem = (
        sp.withColumn("_n", F.count("*").over(wh))
        .withColumn(
            "_rn", F.row_number().over(wh.orderBy("doc_id", "g"))
        )
        .filter((F.col("_n") >= 2) & (F.col("_rn") > 1))
    )
    ranges = (
        rem.withColumn(
            "grp",
            F.col("g")
            - F.row_number().over(Window.partitionBy("doc_id").orderBy("g")),
        )
        .groupBy("doc_id", "grp")
        .agg(
            F.min("g").alias("rs"),
            (F.max("g") + F.lit(k - 1)).cast("long").alias("re"),
        )
        .groupBy("doc_id")
        .agg(F.collect_list(F.struct("rs", "re")).alias("spans"))
    )
    return (
        base.join(ranges, "doc_id", "left")
        .withColumn(
            "spans",
            F.coalesce(
                F.col("spans"),
                F.expr("CAST(array() AS array<struct<rs:bigint,re:bigint>>)"),
            ),
        )
        .withColumn(
            "_kept",
            F.expr(
                "filter(zip_with(a, sequence(1L, cast(size(a) AS BIGINT)),"
                " (t, p) -> struct(t, p)),"
                " s -> NOT exists(spans, r -> s.p BETWEEN r.rs AND r.re))"
            ),
        )
        .select(
            "doc_id",
            F.concat_ws(" ", F.expr("transform(_kept, s -> s.t)")).alias(
                "clean_text"
            ),
            (F.size("a") - F.size("_kept")).cast("long").alias("n_removed"),
        )
    )


@query(
    "ns_exact_substring_apply",
    oracle=f"""
        WITH toks AS (SELECT doc_id, string_split(text, ' ') AS a
                      FROM documents),
             sp AS (SELECT doc_id, CAST(g AS BIGINT) AS g,
                           md5(array_to_string(
                               list_slice(a, CAST(g AS INT),
                                          CAST(g AS INT) + {_ES_MIN - 1}),
                               ' ')) AS h
                    FROM toks,
                         LATERAL unnest(generate_series(
                             1, greatest(len(a) - {_ES_MIN - 1}, 1))) t(g)),
             st AS (SELECT doc_id, g,
                           count(*) OVER (PARTITION BY h) AS n,
                           row_number() OVER (PARTITION BY h
                                              ORDER BY doc_id, g) AS rn
                    FROM sp),
             rem AS (SELECT doc_id, g FROM st WHERE n >= 2 AND rn > 1),
             tok AS (SELECT doc_id, a[CAST(p AS INT)] AS t,
                            CAST(p AS BIGINT) AS p
                     FROM toks,
                          LATERAL unnest(generate_series(1, len(a))) s(p)),
             keep AS (SELECT tok.doc_id, tok.t, tok.p
                      FROM tok
                      WHERE NOT EXISTS (
                          SELECT 1 FROM rem
                          WHERE rem.doc_id = tok.doc_id
                            AND tok.p BETWEEN rem.g
                                          AND rem.g + {_ES_MIN - 1})),
             agg AS (SELECT doc_id,
                            coalesce(string_agg(t, ' ' ORDER BY p), '')
                                AS clean_text,
                            count(*) AS n_kept
                     FROM keep GROUP BY doc_id)
        SELECT toks.doc_id,
               coalesce(agg.clean_text, '') AS clean_text,
               len(toks.a) - coalesce(agg.n_kept, 0) AS n_removed
        FROM toks LEFT JOIN agg USING (doc_id)
    """,
    tags=("northstar", "pipeline", "dedup"),
)
def ns_exact_substring_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr-dedup REWRITE (Lee et al. §4.1, keep-one): every
    document with non-canonical duplicated ≥12-token spans cut out, as
    (doc_id, clean_text, n_removed) — the lexicographically first
    (doc_id, position) site of each duplicated shingle is the
    canonical copy and survives; all other sites trim. Untouched docs
    pass through verbatim with n_removed = 0. See
    :func:`exact_substring_apply` for the determinized keep-one
    semantics and the 2-scan shape (digests decide, ONE doc_id join
    carries the removal ranges back onto text, rebuild is a map-side
    JVM array filter)."""
    return exact_substring_apply(t(spark, sf_dir, "documents"))


#: Batch/corpus split for the span ingest screen (the paragraph-screen
#: convention): every 16th doc arrives as the batch, the rest are the
#: already-indexed corpus.
_SBATCH_MOD, _SBATCH_REM = 16, 7


def _ensure_shingle_index(spark: SparkSession, sf_dir: str) -> str:
    """Build-or-reuse the corpus shingle-digest index under /tmp via
    the shared fingerprint-guarded machinery (the
    _ensure_paragraph_index pattern: corrupt meta = stale rebuild,
    atomic fingerprint write, full-path cache tag)."""
    import os

    from map_reduce_framework_using_python_spark.operators.dedup_index import (
        build_shingle_index,
    )
    from map_reduce_framework_using_python_spark.sources.io import (
        ensure_fingerprinted_layout,
        layout_cache_tag,
        source_fingerprint,
    )

    root = os.environ.get("SPARK_GRAFT_DEDUP_INDEX_ROOT", "/tmp/spark_graft_dedup")
    path = os.path.join(root, layout_cache_tag(sf_dir), f"shingle{_ES_MIN}")

    def build(p: str) -> None:
        corpus = t(spark, sf_dir, "documents").filter(
            F.col("doc_id") % _SBATCH_MOD != _SBATCH_REM
        )
        build_shingle_index(corpus, p, min_len=_ES_MIN)

    return ensure_fingerprinted_layout(
        path,
        "_dedup_meta.json",
        source_fingerprint(os.path.join(sf_dir, "documents.parquet")),
        build,
    )


@query(
    "ns_span_screen",
    oracle=f"""
        WITH toks AS (SELECT doc_id, string_split(text, ' ') AS a
                      FROM documents),
             sp AS (SELECT doc_id, CAST(g AS BIGINT) AS g,
                           md5(array_to_string(
                               list_slice(a, CAST(g AS INT),
                                          CAST(g AS INT) + {_ES_MIN - 1}),
                               ' ')) AS h
                    FROM toks,
                         LATERAL unnest(generate_series(
                             1, greatest(len(a) - {_ES_MIN - 1}, 1))) t(g)),
             c AS (SELECT h, count(*) AS cnt FROM sp GROUP BY 1)
        SELECT doc_id,
               count(*) AS n_positions,
               CAST(sum(CASE WHEN cnt >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_dup,
               floor(CAST(sum(CASE WHEN cnt >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
                     / count(*) * 1000000.0 + 0.5) / 1000000.0 AS dup_frac
        FROM sp JOIN c USING (h)
        WHERE doc_id % {_SBATCH_MOD} = {_SBATCH_REM}
        GROUP BY 1
    """,
    tags=("northstar", "pipeline", "dedup", "index"),
)
def ns_span_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplication stats for an ARRIVING batch (doc_id
    ≡ 7 mod 16) against the PERSISTED shingle-digest index of the rest
    of the corpus — the ingest path of the variable-length ExactSubstr
    lane: corpus text is never re-digested; the probe scans the
    fixed-width instance table semi-pruned map-side by the broadcast
    batch digest set, plus one batch-sized digest window. The verdict
    is EXACTLY the one-shot duplicated-position count over
    (corpus ∪ batch) restricted to batch docs ((count_index ≥ 1) OR
    (count_batch ≥ 2) ⇔ total ≥ 2), which the oracle states directly.
    See operators/dedup_index.incremental_span_stats."""
    from map_reduce_framework_using_python_spark.operators.dedup_index import (
        incremental_span_stats,
    )

    d = t(spark, sf_dir, "documents")
    path = _ensure_shingle_index(spark, sf_dir)
    return incremental_span_stats(
        spark, d.filter(F.col("doc_id") % _SBATCH_MOD == _SBATCH_REM), path
    )


@query(
    "ns_span_screen_apply",
    oracle=f"""
        WITH toks AS (SELECT doc_id, string_split(text, ' ') AS a
                      FROM documents),
             sp AS (SELECT doc_id, CAST(g AS BIGINT) AS g,
                           md5(array_to_string(
                               list_slice(a, CAST(g AS INT),
                                          CAST(g AS INT) + {_ES_MIN - 1}),
                               ' ')) AS h
                    FROM toks,
                         LATERAL unnest(generate_series(
                             1, greatest(len(a) - {_ES_MIN - 1}, 1))) t(g)),
             st AS (SELECT doc_id, g,
                           count(*) OVER (PARTITION BY h) AS n,
                           row_number() OVER (
                               PARTITION BY h
                               ORDER BY (CASE WHEN doc_id % {_SBATCH_MOD}
                                                   = {_SBATCH_REM}
                                         THEN 1 ELSE 0 END),
                                        doc_id, g) AS rn
                    FROM sp),
             rem AS (SELECT doc_id, g FROM st
                     WHERE n >= 2 AND rn > 1
                       AND doc_id % {_SBATCH_MOD} = {_SBATCH_REM}),
             bt AS (SELECT doc_id, a FROM toks
                    WHERE doc_id % {_SBATCH_MOD} = {_SBATCH_REM}),
             tok AS (SELECT doc_id, a[CAST(p AS INT)] AS t,
                            CAST(p AS BIGINT) AS p
                     FROM bt,
                          LATERAL unnest(generate_series(1, len(a))) s(p)),
             keep AS (SELECT tok.doc_id, tok.t, tok.p
                      FROM tok
                      WHERE NOT EXISTS (
                          SELECT 1 FROM rem
                          WHERE rem.doc_id = tok.doc_id
                            AND tok.p BETWEEN rem.g
                                          AND rem.g + {_ES_MIN - 1})),
             agg AS (SELECT doc_id,
                            coalesce(string_agg(t, ' ' ORDER BY p), '')
                                AS clean_text,
                            count(*) AS n_kept
                     FROM keep GROUP BY doc_id)
        SELECT bt.doc_id,
               coalesce(agg.clean_text, '') AS clean_text,
               len(bt.a) - coalesce(agg.n_kept, 0) AS n_removed
        FROM bt LEFT JOIN agg USING (doc_id)
    """,
    tags=("northstar", "pipeline", "dedup", "index"),
)
def ns_span_screen_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ExactSubstr REMOVAL pass on ingest: rewrite each batch doc
    (doc_id ≡ 7 mod 16) cutting every token covered by a non-canonical
    duplicated shingle, canonical being ARRIVAL-FIRST — an indexed
    corpus site wins outright (it arrived earlier by definition);
    batch-only repeats keep their first (doc_id, g) site. The oracle
    states arrival-first directly (rank ordered by (is_batch, doc_id,
    g) over corpus ∪ batch, restricted to batch docs), so the
    equivalence holds for any id split — and coincides with the
    one-shot lexicographic ns_exact_substring_apply whenever batch ids
    follow corpus ids (pinned in tests/test_span_ingest.py). See
    operators/dedup_index.incremental_span_apply."""
    from map_reduce_framework_using_python_spark.operators.dedup_index import (
        incremental_span_apply,
    )

    d = t(spark, sf_dir, "documents")
    path = _ensure_shingle_index(spark, sf_dir)
    return incremental_span_apply(
        spark, d.filter(F.col("doc_id") % _SBATCH_MOD == _SBATCH_REM), path
    )


@query(
    "st_span_dedup",
    oracle=None,
    tags=("streaming", "pipeline", "dedup", "index", "rows_only"),
)
def st_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ns_span_screen: batch docs arrive as a
    file-source stream, each micro-batch is screened against the
    shingle-digest index via foreachBatch, then appended to it
    (extend_index), so later batches dedup against earlier ones as
    well as the corpus. Rows-only for the driver (the drained
    single-batch result equals ns_span_screen; cross-batch
    first-occurrence semantics pinned in tests/test_span_ingest.py).
    The index is rebuilt in a scratch dir per run — extend_index
    appends must not poison the shared fingerprint-cached layout."""
    import os
    import tempfile

    from map_reduce_framework_using_python_spark.operators.dedup_index import (
        build_shingle_index,
    )
    from map_reduce_framework_using_python_spark.streaming.ingest import (
        read_documents_stream,
        span_screen_stream,
    )

    d = t(spark, sf_dir, "documents")
    work = tempfile.mkdtemp(prefix="st_span_dedup_")
    path = os.path.join(work, "idx")
    build_shingle_index(
        d.filter(F.col("doc_id") % _SBATCH_MOD != _SBATCH_REM), path,
        min_len=_ES_MIN,
    )
    return span_screen_stream(
        read_documents_stream(spark, sf_dir).filter(
            F.col("doc_id") % _SBATCH_MOD == _SBATCH_REM
        ),
        path,
        out_dir=os.path.join(work, "stats"),
        checkpoint_dir=os.path.join(work, "ckpt"),
    )
