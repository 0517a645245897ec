"""Training-pipeline operators, part 4: relevance ranking, sequence
packing, positional search, and n-gram rarity scoring.

Round-4 additions to the LLM-corpus surface (the reference's users
would hand-write each as a chain of MR jobs; `Readme.md:6`):

- **BM25 ranking** (``ns_bm25_topk``): the standard IR relevance
  function over the inverted-index statistics that ``ns_tfidf``
  already computes — per-term idf × saturated tf, length-normalized.
- **Sequence packing** (``ns_sequence_packing``): GPT-style corpus
  packing — concatenate all documents in a deterministic order and
  chop at fixed context-window boundaries; each document learns its
  global token offset, its context id, and whether it straddles a
  boundary. The global running token count uses the bucketed
  distributed cumsum (operators/ranks.py), NOT a single-partition
  window.
- **Positional phrase search** (``ns_phrase_search``): a positional
  inverted index (term → (doc, pos) postings) and a two-term phrase
  query answered by a posting-list self-intersection at pos+1.
- **Bigram rarity** (``ns_bigram_rarity``): language-model-flavoured
  doc scoring on exact integer arithmetic — each document's mean
  corpus-frequency of its bigrams (low mean ⇒ rare constructions,
  high ⇒ boilerplate). The LM-scoring quality gate of a corpus build,
  kept on the integer grid so both engines agree bit-for-bit.

Cross-engine determinism notes: every floating expression is written
with the IDENTICAL operation structure on both sides (plans/core.py
money/rounding doctrine); sums that feed doubles are either exact
integers (rarity) or fixed-arity fixed-order additions (BM25's 3-term
score), never engine-ordered double aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_framework_using_python_spark.operators.ranks import bucketed_cumsum
from map_reduce_framework_using_python_spark.plans.core import half_up, query, t

# BM25 parameters (Robertson/Lucene defaults) and the fixed query.
_K1 = 1.2
_B = 0.75
_TERMS = ("spark", "window", "join")

# Sequence-packing context size (tokens per training example).
_CTX = 2048


def _words(d: DataFrame) -> DataFrame:
    return d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("term"))


@query(
    "ns_bm25_topk",
    oracle=f"""
        WITH docs AS (SELECT doc_id,
                             len(string_split(text, ' ')) AS dl
                      FROM documents),
             corpus AS (SELECT count(*) AS n_docs,
                               CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
                        FROM docs),
             tf AS (SELECT doc_id, term, count(*) AS tf
                    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                          FROM documents)
                    WHERE term IN ('{_TERMS[0]}', '{_TERMS[1]}', '{_TERMS[2]}')
                    GROUP BY 1, 2),
             df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
             scored AS (
                SELECT tf.doc_id, tf.term,
                       ln(1 + (n_docs - df + 0.5) / (df + 0.5))
                         * (tf * ({_K1} + 1))
                         / (tf + {_K1} * (1 - {_B} + {_B} * dl / avgdl)) AS s
                FROM tf
                JOIN df USING (term)
                JOIN docs USING (doc_id), corpus),
             pivoted AS (
                SELECT doc_id,
                       coalesce(max(CASE WHEN term = '{_TERMS[0]}' THEN s END), 0)
                         AS s0,
                       coalesce(max(CASE WHEN term = '{_TERMS[1]}' THEN s END), 0)
                         AS s1,
                       coalesce(max(CASE WHEN term = '{_TERMS[2]}' THEN s END), 0)
                         AS s2
                FROM scored GROUP BY 1)
        SELECT doc_id,
               floor(CAST(s0 + s1 + s2 AS DOUBLE) * 10000 + 0.5) / 10000 AS bm25
        FROM pivoted
        ORDER BY s0 + s1 + s2 DESC, doc_id
        LIMIT 20
    """,
    tags=("northstar", "pipeline", "text", "ranking"),
)
def ns_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-20 documents for the fixed query ``spark window join``
    (k1=1.2, b=0.75, Lucene's non-negative ``ln(1 + …)`` idf).

    Scale shape: the posting scan filters to the query's terms BEFORE
    the (doc, term) aggregate, so the shuffle carries only matching
    postings; df (3 rows) and the corpus stats (1 row) broadcast onto
    the scored postings; the 3-term score is a fixed-order pivoted sum
    (s0+s1+s2 — never an engine-ordered double aggregation), and the
    top-20 is TakeOrderedAndProject, not a global sort.

    Reference parity: the reference's users would run this as three
    chained MR jobs (tf job, df job, score/sort job) — `Readme.md:6`.
    """
    piv = _bm25_pivoted(t(spark, sf_dir, "documents"))
    total = F.col("s0") + F.col("s1") + F.col("s2")
    return (
        piv.select("doc_id", total.alias("_raw"), half_up(total, 4).alias("bm25"))
        .orderBy(F.col("_raw").desc(), "doc_id")
        .limit(20)
        .select("doc_id", "bm25")
    )


def _bm25_pivoted(d: DataFrame) -> DataFrame:
    """(doc_id, s0, s1, s2) — raw per-term BM25 scores for the fixed
    query, pivoted to a fixed-order sum (never an engine-ordered double
    aggregation). Shared by ns_bm25_topk and the hybrid-RRF lexical
    leg, so the two can never drift."""
    docs = d.select("doc_id", F.size(F.split(F.col("text"), " ")).alias("dl"))
    corpus = docs.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )
    tf = (
        _words(d)
        .filter(F.col("term").isin(*_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    idf = F.log(
        1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    s = idf * (F.col("tf") * (_K1 + 1)) / (
        F.col("tf") + _K1 * (1 - _B + _B * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        tf.join(F.broadcast(df_), "term")
        .join(docs, "doc_id")
        .crossJoin(F.broadcast(corpus))
        .select("doc_id", "term", s.alias("s"))
    )
    return scored.groupBy("doc_id").agg(
        *[
            F.coalesce(
                F.max(F.when(F.col("term") == term, F.col("s"))), F.lit(0.0)
            ).alias(f"s{i}")
            for i, term in enumerate(_TERMS)
        ]
    )


@query(
    "ns_sequence_packing",
    oracle=f"""
        WITH docs AS (SELECT doc_id, md5(text) AS h,
                             len(string_split(text, ' ')) AS n_tokens
                      FROM documents),
             packed AS (
                SELECT doc_id, n_tokens,
                       sum(n_tokens) OVER (ORDER BY h, doc_id
                                           ROWS UNBOUNDED PRECEDING) AS cum_end
                FROM docs)
        SELECT doc_id, n_tokens,
               CAST(cum_end - n_tokens AS BIGINT) AS offset_start,
               CAST(floor((cum_end - n_tokens) / {_CTX}) AS BIGINT) AS context_id,
               CAST(floor((cum_end - 1) / {_CTX})
                    - floor((cum_end - n_tokens) / {_CTX}) AS BIGINT)
                 AS n_boundaries_crossed
        FROM packed
    """,
    tags=("northstar", "pipeline", "packing"),
)
def ns_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style sequence packing: every document is laid out in a
    deterministic content-hash order, token offsets accumulate
    globally, and the stream is chopped into 2048-token context
    windows. Each document reports its global ``offset_start``, the
    ``context_id`` its first token lands in, and how many window
    boundaries it straddles (tokenizer-side splitting cost).

    The global running token count is the SCALE-CRITICAL part: a
    naive ``sum() OVER (ORDER BY …)`` with no partition funnels the
    corpus through one task. This uses the bucketed distributed
    cumsum (operators/ranks.py:bucketed_cumsum — per-bucket window +
    broadcast prefix offsets), so the oracle's global window is what
    the plan REPLACES, at identical output.
    """
    d = t(spark, sf_dir, "documents")
    docs = d.select(
        "doc_id",
        F.md5(F.col("text")).alias("h"),
        F.size(F.split(F.col("text"), " ")).alias("n_tokens"),
    )
    packed = bucketed_cumsum(
        docs,
        bucket=F.substring("h", 1, 1),
        order_by=[F.col("h"), F.col("doc_id")],
        weight=F.col("n_tokens").cast("long"),
        cum_col="cum_end",
    )
    start = F.col("cum_end") - F.col("n_tokens")
    return packed.select(
        "doc_id",
        "n_tokens",
        start.alias("offset_start"),
        F.floor(start / _CTX).alias("context_id"),
        (
            F.floor((F.col("cum_end") - 1) / _CTX) - F.floor(start / _CTX)
        ).alias("n_boundaries_crossed"),
    )


@query(
    "ns_phrase_search",
    oracle="""
        WITH postings AS (
            SELECT doc_id, w.term, w.pos
            FROM documents,
                 LATERAL (SELECT arr[i] AS term, i AS pos
                          FROM (SELECT string_split(text, ' ') AS arr) s,
                               unnest(generate_series(1, len(s.arr))) AS g(i)) w
            WHERE w.term IN ('hash', 'join'))
        SELECT a.doc_id, count(*) AS n_hits, min(a.pos) AS first_pos
        FROM postings a
        JOIN postings b
          ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        WHERE a.term = 'hash' AND b.term = 'join'
        GROUP BY a.doc_id
    """,
    tags=("northstar", "pipeline", "text", "search"),
)
def ns_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional inverted index + phrase query: find documents
    containing the exact phrase ``"hash join"`` by intersecting the
    two terms' positional posting lists at ``pos_b = pos_a + 1`` —
    the standard IR phrase-query algorithm (NOT a substring scan, so
    it extends to k-term phrases and proximity windows).

    Scale shape: postings are filtered to the phrase's terms at the
    explode (predicate pushed below the shuffle), the self-join keys
    on doc_id (one co-partitioned exchange), and per-doc hit counts
    aggregate map-side. Posting positions are 1-based in both engines.
    """
    d = t(spark, sf_dir, "documents")
    postings = d.select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), " ")).alias("pos0", "term"),
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "term")
    postings = postings.filter(F.col("term").isin("hash", "join"))
    a = postings.filter(F.col("term") == "hash").select(
        F.col("doc_id").alias("doc_a"), F.col("pos").alias("pos_a")
    )
    b = postings.filter(F.col("term") == "join").select(
        F.col("doc_id").alias("doc_b"), F.col("pos").alias("pos_b")
    )
    return (
        a.join(
            b,
            (F.col("doc_a") == F.col("doc_b"))
            & (F.col("pos_b") == F.col("pos_a") + 1),
        )
        .select(F.col("doc_a").alias("doc_id"), "pos_a")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hits"), F.min("pos_a").alias("first_pos"))
    )


@query(
    "ns_bigram_rarity",
    oracle="""
        WITH b AS (
            SELECT doc_id, arr[i] || ' ' || arr[i + 1] AS bigram
            FROM (SELECT doc_id, string_split(text, ' ') AS arr FROM documents) s,
                 unnest(generate_series(1, len(arr) - 1)) AS g(i)),
             freq AS (SELECT bigram, count(*) AS corpus_freq FROM b GROUP BY 1)
        SELECT doc_id,
               count(*) AS n_bigrams,
               CAST(sum(corpus_freq) AS BIGINT) AS sum_freq,
               floor(CAST(sum(corpus_freq) AS DOUBLE) / count(*) * 100 + 0.5) / 100
                 AS mean_freq
        FROM b JOIN freq USING (bigram)
        GROUP BY doc_id
    """,
    tags=("northstar", "pipeline", "text", "quality"),
)
def ns_bigram_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM rarity scoring: each document's mean corpus frequency
    over its (order-preserving, with duplicates) bigrams. Low mean ⇒
    rare constructions; high mean ⇒ boilerplate — the cheap
    language-model quality gate of a corpus build, and deliberately
    EXACT: counts are integers, the only division happens once at the
    end on identical operands, so no engine-ordered double sum exists
    anywhere (NOTES.md money-rounding doctrine).

    Scale shape: bigram corpus frequencies aggregate to ≤|vocab|²
    rows with map-side partial aggregation; the join back to the
    per-doc bigram stream keys on the bigram string (one shuffle
    each side); the final per-doc aggregate is map-side combinable.
    """
    from map_reduce_framework_using_python_spark.operators.text import (
        word_bigrams,
    )

    d = t(spark, sf_dir, "documents")
    # Safe zip_with/slice bigrams (r7 review): the old
    # sequence/element_at form evaluated sequence(1, 0) as the
    # DESCENDING [1, 0] on a single-token doc and crashed with an ANSI
    # element_at(arr, 0) error where the oracle's generate_series(1, 0)
    # is simply empty. Tokenizer and ' ' separator unchanged — they
    # are what this query's oracle encodes.
    bigrams = d.select(
        "doc_id",
        F.explode(word_bigrams(F.split(F.col("text"), " "), sep=" ")).alias(
            "bigram"
        ),
    )
    freq = bigrams.groupBy("bigram").agg(F.count("*").alias("corpus_freq"))
    return (
        bigrams.join(freq, "bigram")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum("corpus_freq").alias("sum_freq"),
            half_up(
                F.sum("corpus_freq").cast("double") / F.count("*"), 2
            ).alias("mean_freq"),
        )
    )


# The PII query synthesizes a deterministic PII-bearing string per doc
# (the corpus itself is a clean word soup) with IDENTICAL expression
# structure on both engines, then runs the sequential redaction pass.
# {S} is the engine's string type name: STRING (Spark) / VARCHAR (DuckDB).
_PII_INJECT_SQL = """
    'u' || CAST(doc_id AS {S})
    || CASE WHEN doc_id % 3 = 0
            THEN ' mail user' || CAST(doc_id AS {S}) || '@ex'
                 || CAST(doc_id % 10 AS {S}) || '.com'
            ELSE ' mail none' END
    || CASE WHEN doc_id % 4 = 0
            THEN ' ssn ' || lpad(CAST(doc_id % 1000 AS {S}), 3, '0')
                 || '-' || lpad(CAST(doc_id % 100 AS {S}), 2, '0')
                 || '-' || lpad(CAST(doc_id % 10000 AS {S}), 4, '0')
            ELSE '' END
    || CASE WHEN doc_id % 5 = 0
            THEN ' tel +1 202-555-' || lpad(CAST(doc_id % 10000 AS {S}), 4, '0')
            ELSE '' END
    || CASE WHEN doc_id % 7 = 0
            THEN ' ip 10.' || CAST(doc_id % 256 AS {S})
                 || '.0.' || CAST(doc_id % 100 AS {S})
            ELSE '' END
"""


def _pii_oracle() -> str:
    from map_reduce_framework_using_python_spark.operators.text import PII_RULES

    inject = _PII_INJECT_SQL.replace("{S}", "VARCHAR")
    sql = f"SELECT doc_id, {inject} AS s FROM documents"
    for name, pat, repl in PII_RULES:
        sql = (
            f"SELECT doc_id, * EXCLUDE (s),"
            f" len(regexp_extract_all(s, '{pat}')) AS n_{name},"
            f" regexp_replace(s, '{pat}', '{repl}', 'g') AS s"
            f" FROM ({sql}) sub"
        )
    names = ", ".join(
        f"n_{name}" for name, _, _ in PII_RULES
    )
    return f"SELECT doc_id, {names}, s AS redacted FROM ({sql}) fin"


@query(
    "ns_pii_redact",
    oracle=_pii_oracle(),
    tags=("northstar", "pipeline", "text", "compliance"),
)
def ns_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing pass (operators/text.py:redact_pii): emails, SSNs,
    phones, and IPv4s replaced by typed tokens, with per-category
    occurrence counts, over a deterministically injected PII column
    (the synthetic corpus itself is clean). Sequential rule order is
    part of the contract — an SSN is consumed by the SSN rule, never
    the broader phone rule.

    Scale shape: a single narrow projection — four regexp rewrites
    fused into one codegen stage, no shuffle, no Python in the row
    path. At 100 TB this is scan-bound, exactly as a compliance pass
    should be."""
    from map_reduce_framework_using_python_spark.operators.text import redact_pii

    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_PII_INJECT_SQL.replace("{S}", "STRING")).alias("pii_text")
    )
    return redact_pii(d, text_col="pii_text").drop("pii_text")


#: RRF constant (Cormack et al. 2009's k=60) and per-leg candidate depth.
_RRF_K = 60
_RRF_DEPTH = 50


@query(
    "ns_hybrid_rrf",
    oracle=f"""
        WITH docs AS (SELECT doc_id,
                             len(string_split(text, ' ')) AS dl
                      FROM documents),
             corpus AS (SELECT count(*) AS n_docs,
                               CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
                        FROM docs),
             tf AS (SELECT doc_id, term, count(*) AS tf
                    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                          FROM documents)
                    WHERE term IN ('{_TERMS[0]}', '{_TERMS[1]}', '{_TERMS[2]}')
                    GROUP BY 1, 2),
             df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
             scored AS (
                SELECT tf.doc_id, tf.term,
                       ln(1 + (n_docs - df + 0.5) / (df + 0.5))
                         * (tf * ({_K1} + 1))
                         / (tf + {_K1} * (1 - {_B} + {_B} * dl / avgdl)) AS s
                FROM tf
                JOIN df USING (term)
                JOIN docs USING (doc_id), corpus),
             pivoted AS (
                SELECT doc_id,
                       coalesce(max(CASE WHEN term = '{_TERMS[0]}' THEN s END), 0)
                         AS s0,
                       coalesce(max(CASE WHEN term = '{_TERMS[1]}' THEN s END), 0)
                         AS s1,
                       coalesce(max(CASE WHEN term = '{_TERMS[2]}' THEN s END), 0)
                         AS s2
                FROM scored GROUP BY 1),
             lex AS (SELECT doc_id,
                            CAST(row_number() OVER (
                                ORDER BY s0 + s1 + s2 DESC, doc_id
                            ) AS INTEGER) AS lex_rank
                     FROM pivoted WHERE doc_id <> 0
                     QUALIFY lex_rank <= {_RRF_DEPTH}),
             q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
                   FROM embeddings WHERE vec_id = 0),
             cos AS (SELECT e.vec_id AS doc_id,
                            CAST(floor(list_cosine_similarity(
                                CAST(e.embedding AS DOUBLE[]), q.qv
                            ) * 1000000.0 + 0.5) AS BIGINT) AS c6
                     FROM embeddings e, q WHERE e.vec_id <> 0),
             vec AS (SELECT doc_id,
                            CAST(row_number() OVER (
                                ORDER BY c6 DESC, doc_id
                            ) AS INTEGER) AS vec_rank
                     FROM cos QUALIFY vec_rank <= {_RRF_DEPTH}),
             fused AS (SELECT coalesce(l.doc_id, v.doc_id) AS doc_id,
                              l.lex_rank, v.vec_rank,
                              CAST(floor((coalesce(1.0 / ({_RRF_K} + l.lex_rank), 0.0)
                                        + coalesce(1.0 / ({_RRF_K} + v.vec_rank), 0.0))
                                         * 1000000.0 + 0.5) AS BIGINT) AS rrf6
                       FROM lex l FULL JOIN vec v ON l.doc_id = v.doc_id)
        SELECT doc_id, lex_rank, vec_rank, rrf6 / 1000000.0 AS rrf
        FROM fused
        ORDER BY rrf6 DESC, doc_id
        LIMIT 20
    """,
    tags=("northstar", "pipeline", "text", "similarity", "ranking"),
)
def ns_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval with reciprocal rank fusion (Cormack et al.
    2009, k=60): the BM25 lexical leg (the fixed 3-term query, shared
    scorer `_bm25_pivoted` — ns_bm25_topk and this leg can never drift)
    fused with the embedding-cosine leg (query vector vec_id=0) over
    the UNION of both candidate lists — 1/(k+rank) per leg, missing leg
    contributes 0. The retrieval shape a RAG/curation stack actually
    serves: lexical catches exact terminology, vector catches
    paraphrase, RRF needs no score calibration because it consumes only
    RANKS (integers — which is also what makes the full DuckDB oracle
    exact: every fused score derives from small-integer arithmetic on
    the same 1e-6 grid).

    Scale shape: each leg is its own top-{_RRF_DEPTH}
    (TakeOrderedAndProject — no global sort), ranked AFTER the limit
    with a window over ≤{_RRF_DEPTH} rows (the bounded-wall convention;
    never a corpus-sized unpartitioned window), fused with a full outer
    join over ≤2·{_RRF_DEPTH} rows."""
    from pyspark.sql import Window

    from map_reduce_framework_using_python_spark.operators.similarity import (
        _query_vector,
        cosine_scores,
    )

    d = t(spark, sf_dir, "documents")
    emb = t(spark, sf_dir, "embeddings")

    total = F.col("s0") + F.col("s1") + F.col("s2")
    lex50 = (
        _bm25_pivoted(d)
        .filter(F.col("doc_id") != 0)
        .select("doc_id", total.alias("_t"))
        .orderBy(F.col("_t").desc(), "doc_id")
        .limit(_RRF_DEPTH)
    )
    lex = lex50.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("_t").desc(), "doc_id"))
        .cast("int")
        .alias("lex_rank"),
    )

    qv = _query_vector(emb, "embedding", "vec_id", 0)
    c6 = F.floor(F.col("cosine_raw") * 1e6 + F.lit(0.5)).cast("bigint")
    vec50 = (
        cosine_scores(emb.filter(F.col("vec_id") != 0), qv)
        .select(F.col("vec_id").alias("doc_id"), c6.alias("_c6"))
        .orderBy(F.col("_c6").desc(), "doc_id")
        .limit(_RRF_DEPTH)
    )
    vec = vec50.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("_c6").desc(), "doc_id"))
        .cast("int")
        .alias("vec_rank"),
    )

    rrf6 = F.floor(
        (
            F.coalesce(1.0 / (_RRF_K + F.col("lex_rank")), F.lit(0.0))
            + F.coalesce(1.0 / (_RRF_K + F.col("vec_rank")), F.lit(0.0))
        )
        * 1e6
        + F.lit(0.5)
    ).cast("bigint")
    return (
        lex.join(vec, "doc_id", "full")
        .select("doc_id", "lex_rank", "vec_rank", rrf6.alias("_rrf6"))
        .orderBy(F.col("_rrf6").desc(), "doc_id")
        .limit(20)
        .select(
            "doc_id", "lex_rank", "vec_rank",
            (F.col("_rrf6") / 1e6).alias("rrf"),
        )
    )
