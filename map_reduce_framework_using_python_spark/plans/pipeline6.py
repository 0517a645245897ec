"""Training-pipeline operators, part 6: embedding quantization, bigram
LM scoring, and scored decontamination.

Three ops a large-scale training-data pipeline runs between curation
and serving (the reference's users would express each as a
mapper/reducer pair over ``documents``/``embeddings``, `Readme.md:6`;
here they are single declarative plans):

- **int8 quantization** (``ns_int8_quantize``): per-vector symmetric
  int8 — the storage/serving format for ANN indexes (4× smaller than
  float32, SIMD-friendly). Map-only array algebra: scale =
  127/max|x|, q = floor(x·scale + 0.5). No shuffle at all.
- **bigram LM scoring** (``ns_bigram_lm_score``): mean log P(w2|w1)
  per document under the corpus's own bigram model — the classic
  cheap fluency/perplexity signal for quality filtering (the
  KenLM-style gate in CCNet/RedPajama pipelines, computed exactly
  instead of from a pretrained model). Vocabulary-bounded exchanges:
  raw text never shuffles, only bigram keys and counts do.
- **scored decontamination** (``ns_shingle_containment``): containment
  |shingles(d) ∩ benchmark| / |shingles(d)| of every training doc
  against a held-out benchmark partition — the graded version of
  ns_decontaminate's boolean verdict (plans/pipeline2.py). Only
  128-bit digests cross the wire; the benchmark digest set is
  broadcast-sized.

Determinism rules (plans/core.py): every float that reaches the output
is either derived from exact integers or quantized to a fixed grid
BEFORE any cross-row float sum — per-bigram log-terms land on a 1e-9
integer grid and are summed as BIGINT (order-independent), so both
engines agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_framework_using_python_spark.plans.core import half_up, persist_lane, query, t

#: Fixed-point grid for per-bigram log-probability terms: quantizing
#: each term to 1e-9 then summing as BIGINT makes the per-document sum
#: independent of addition order (a raw double sum is not).
_LOG_GRID = 1_000_000_000.0

#: Shingle width (words) for containment scoring.
_SHINGLE_W = 5


@query(
    "ns_int8_quantize",
    oracle="""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             m AS (SELECT vec_id, v,
                          list_max(list_transform(v, x -> abs(x))) AS ma
                   FROM e),
             s AS (SELECT vec_id, v,
                          CASE WHEN ma > 0 THEN 127.0 / ma ELSE 0.0 END AS sc
                   FROM m)
        SELECT vec_id,
               floor(sc * 1000000.0 + 0.5) / 1000000.0 AS qscale,
               array_to_string(
                   list_transform(v, x -> CAST(floor(x * sc + 0.5) AS INT)),
                   ',') AS q
        FROM s
    """,
    tags=("northstar", "pipeline", "embedding", "quantization"),
)
def ns_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization of the embedding column:
    scale = 127/max|x| (0 for an all-zero vector), q_i = half-up round
    of x_i·scale — the int8 storage format ANN serving uses.

    Scale shape: map-only ``transform``/``array_max`` array algebra
    inside whole-stage codegen — zero shuffle, zero Python; at 100 TB
    this is a pure scan→write pass. The reference would need a full
    mapper over every row to do the same (`Worker/worker_v1.py:113`).
    Rounding is the explicit floor(x+0.5) form on both engines
    (plans/core.py determinism rules). The quantized vector is emitted
    comma-joined — the repo's oracle-surface rule for list values
    (q_collect_sorted): scalars hash identically everywhere, raw array
    columns have no proven driver-hasher precedent."""
    e = t(spark, sf_dir, "embeddings")
    v = F.transform("embedding", lambda x: x.cast("double"))
    ma = F.array_max(F.transform(v, F.abs))
    sc = F.when(ma > 0, F.lit(127.0) / ma).otherwise(F.lit(0.0))
    return e.select(
        "vec_id",
        half_up(sc, 6).alias("qscale"),
        F.array_join(
            F.transform(v, lambda x: F.floor(x * sc + F.lit(0.5)).cast("int")), ","
        ).alias("q"),
    )


_BIGRAM_LM_ORACLE = f"""
    WITH w AS (SELECT doc_id, string_split_regex(trim(text), ' +') AS ws
               FROM documents),
         bg AS (SELECT doc_id,
                       unnest(list_transform(
                           list_zip(ws[1:len(ws)-1], ws[2:len(ws)]),
                           p -> p[1] || chr(1) || p[2])) AS bg
                FROM w WHERE len(ws) > 1),
         c12 AS (SELECT bg, count(*) AS n12 FROM bg GROUP BY 1),
         c1 AS (SELECT string_split(bg, chr(1))[1] AS w1, count(*) AS n1
                FROM bg GROUP BY 1),
         q AS (SELECT b.doc_id,
                      CAST(floor(ln(CAST(c12.n12 AS DOUBLE) / c1.n1)
                                 * {_LOG_GRID} + 0.5) AS BIGINT) AS li
               FROM bg b
               JOIN c12 USING (bg)
               JOIN c1 ON string_split(b.bg, chr(1))[1] = c1.w1)
    SELECT doc_id, count(*) AS n_bigrams,
           floor(CAST(CAST(sum(li) AS BIGINT) AS DOUBLE)
                 / (count(*) * {_LOG_GRID}) * 1000000.0 + 0.5) / 1000000.0
               AS avg_logp
    FROM q GROUP BY 1
"""


def _bigram_lm(spark: SparkSession, sf_dir: str, model_join: str) -> DataFrame:
    """Shared builder for the bigram-LM fluency score; ``model_join``
    picks how the per-bigram model lands on the corpus-sized (doc,
    bigram) table:

    - ``"shuffle"`` — shuffle-hash join on the bigram key. The
      100 TB-safe default: a corpus-derived bigram model is itself
      billions of distinct rows (Heaps' law bounds it by vocabulary²,
      not corpus size — big enough to kill a broadcast, small enough
      that the per-reducer hash table fits once hash-partitioned).
      Both sides partition on ``bg``; no driver collect, no sort.
    - ``"broadcast"`` — explicit ``F.broadcast`` of the model. Right
      only when the model is KNOWN small (pruned top-K vocab, or a
      fixed pretrained table), so the corpus side never shuffles for
      the join at all.
    """
    d = t(spark, sf_dir, "documents")
    ws = F.split(F.trim(F.col("text")), " +")
    nw = F.size(F.col("ws"))
    from map_reduce_framework_using_python_spark.operators.text import (
        word_bigrams,
    )

    bigrams = word_bigrams(F.col("ws"))
    bg = (
        d.select("doc_id", ws.alias("ws"))
        .filter(nw > 1)
        .select("doc_id", F.explode(bigrams).alias("bg"))
    )
    # Persisted (lazily — the r7 persist discipline; lane-scoped
    # unpersist via persist_lane, r15): TWO consumers read c12 — the unigram-prefix aggregate
    # c1 and the model join below — and their differing projections
    # defeat ReuseExchange, so without the persist Catalyst re-derives
    # the whole corpus scan + split + bigram explode for each
    # (measured r14: 3 corpus scans/explodes per LM derivation, 2 of
    # them for the model). c12 is VOCABULARY-bounded (Heaps' law —
    # distinct bigrams, not corpus rows), so caching it is bounded
    # model state, never a corpus-sized cache; the corpus now pays
    # exactly 2 scans: one to build c12, one for the scored join.
    c12 = persist_lane(
        "bigram_c12", sf_dir, bg.groupBy("bg").agg(F.count("*").alias("n12"))
    )
    # Unigram-prefix counts derive from the bigram counts (sum n12 per
    # w1) — aggregating the vocabulary-sized c12, not a second pass
    # over the corpus-sized exploded table. Spark's sum(bigint) stays
    # bigint; values are identical to counting bg directly.
    c1 = (
        c12.groupBy(F.split("bg", "\x01").getItem(0).alias("w1"))
        .agg(F.sum("n12").alias("n1"))
    )
    li = F.floor(
        F.log(F.col("n12").cast("double") / F.col("n1")) * _LOG_GRID + F.lit(0.5)
    ).cast("bigint")
    # Fold the unigram denominators into the model FIRST (vocab-sized ⋈
    # vocab-sized on w1), producing one (bg → li) table — so the
    # corpus-sized bg table pays exactly ONE model join, not two.
    model = (
        c12.withColumn("w1", F.split("bg", "\x01").getItem(0))
        .join(c1.hint("shuffle_hash"), "w1")
        .select("bg", li.alias("li"))
    )
    if model_join == "broadcast":
        scored = bg.join(F.broadcast(model), "bg")
    else:
        scored = bg.join(model.hint("shuffle_hash"), "bg")
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        half_up(
            F.sum("li").cast("double") / (F.count("*") * F.lit(_LOG_GRID)), 6
        ).alias("avg_logp"),
    )


@query(
    "ns_bigram_lm_score",
    oracle=_BIGRAM_LM_ORACLE,
    tags=("northstar", "pipeline", "quality", "lm"),
)
def ns_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean log P(w2|w1) under the corpus's own bigram
    model: P(w2|w1) = count(w1,w2)/count(w1·) with counts over all
    documents — the cheap KenLM-style fluency gate, computed exactly.
    Lower (more negative) = rarer transitions = less fluent text.
    Distinct from ns_bigram_rarity (plans/pipeline4.py), which scores
    raw JOINT bigram frequency: a document full of common words in odd
    orders is unremarkable to rarity but penalized here, because the
    CONDITIONAL P(w2|w1) is what word order perturbs.

    Scale shape: one explode to (doc, bigram) pairs — raw text stays in
    the scan stage, only bigram STRINGS and counts shuffle, and those
    exchanges are vocabulary-bounded (Heaps' law), not corpus-bounded.
    Two hash aggs build the (bg → log-term) model; the corpus pays ONE
    shuffle-hash join on the bigram key — never a broadcast of the
    model, which at 100 TB is billions of distinct bigrams and would
    OOM the driver or silently fall back past the audited plan (see
    :func:`_bigram_lm`; the broadcast twin exists for known-small
    models). Determinism: each log-term is quantized to the 1e-9 grid
    and summed as BIGINT, so the per-doc mean is
    addition-order-independent."""
    return _bigram_lm(spark, sf_dir, "shuffle")


@query(
    "ns_bigram_lm_score_broadcast",
    oracle=_BIGRAM_LM_ORACLE,
    tags=("northstar", "pipeline", "quality", "lm"),
)
def ns_bigram_lm_score_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast-model twin of ns_bigram_lm_score — identical output,
    different physical plan: the (bg → log-term) model is explicitly
    broadcast, so the corpus-sized (doc, bigram) side never shuffles
    for the scoring join. Correct ONLY when the model is known to be
    broadcast-sized (threshold-pruned top-K vocabulary, or a fixed
    pretrained LM table); the registered default takes the shuffle
    path because a corpus-derived model does not fit a broadcast at
    100 TB. Benched against the shuffle twin at scale10x."""
    return _bigram_lm(spark, sf_dir, "broadcast")


#: Weighted-sample size and the uniform-hash denominator (16^8 + 1, so
#: u ∈ (0, 1) strictly — u = 0 would make ln(u) undefined).
_WS_K = 25
_WS_DEN = float(16**8 + 1)


@query(
    "ns_weighted_sample",
    oracle=f"""
        WITH u AS (SELECT doc_id, n_chars,
                          (CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                                AS BIGINT) + 1) / {_WS_DEN} AS uni
                   FROM documents)
        SELECT doc_id, n_chars,
               floor(ln(uni) / n_chars * 1000000000.0 + 0.5) / 1000000000.0 AS key
        FROM u
        ORDER BY ln(uni) / n_chars DESC, doc_id
        LIMIT {_WS_K}
    """,
    tags=("northstar", "pipeline", "sampling"),
)
def ns_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis A-ES):
    each document draws u ∈ (0,1) and the top-k by u^(1/w) — computed
    as ln(u)/w for numerical sanity — form the sample, with w = n_chars
    so long documents are proportionally likelier. Deterministic: u is
    md5-derived (the same no-rand() rule as ns_hash_sample), so the
    sample is reproducible across engines, retries, and partitionings.

    Scale shape: map-side key computation + TakeOrderedAndProject top-k
    — per-partition heaps then a k-row merge on the driver, never a
    global sort; the classic one-pass distributed weighted reservoir.
    The emitted key is rounded to the 1e-9 grid; the ORDER BY uses the
    raw double (identical on both engines from identical integers)."""
    d = t(spark, sf_dir, "documents")
    uni = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
            "bigint"
        )
        + 1
    ) / F.lit(_WS_DEN)
    # nullif (r7 review): ANSI divide-by-zero would abort the whole
    # top-k on one zero-length doc, where the oracle's ln(u)/0 is NULL
    # and simply sorts last — NULL/NULL agree on both engines.
    key_raw = F.log(uni) / F.nullif(F.col("n_chars"), F.lit(0))
    return (
        d.select("doc_id", "n_chars", key_raw.alias("_kr"))
        .orderBy(F.col("_kr").desc(), "doc_id")
        .limit(_WS_K)
        .select("doc_id", "n_chars", half_up(F.col("_kr"), 9).alias("key"))
    )


@query(
    "ns_source_gini",
    oracle="""
        WITH r AS (SELECT source, n_chars,
                          row_number() OVER (PARTITION BY source
                                             ORDER BY n_chars, doc_id) AS i,
                          count(*) OVER (PARTITION BY source) AS n
                   FROM documents)
        SELECT source,
               CAST(max(n) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars,
               floor((2.0 * CAST(CAST(sum(i * n_chars) AS BIGINT) AS DOUBLE)
                      / (CAST(max(n) AS DOUBLE) * CAST(CAST(sum(n_chars) AS BIGINT) AS DOUBLE))
                      - (CAST(max(n) AS DOUBLE) + 1.0) / CAST(max(n) AS DOUBLE))
                     * 1000000.0 + 0.5) / 1000000.0 AS gini
        FROM r GROUP BY source
    """,
    tags=("northstar", "pipeline", "mixture", "stats"),
)
def ns_source_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of document-length concentration per source —
    the inequality signal a mixture-balancing pass watches (a source
    whose token mass sits in a few giant documents needs different
    sampling than a uniform one). Exact rank formula
    G = 2·Σ(i·x_i)/(n·Σx_i) − (n+1)/n over lengths sorted ascending,
    ties broken by doc_id for cross-engine determinism.

    Scale shape: the rank window partitions BY SOURCE (natural spread —
    never a single global partition), then one hash agg; every term is
    exact integer arithmetic until the final 1e-6-grid division."""
    from pyspark.sql import Window

    d = t(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    r = d.select(
        "source",
        F.col("n_chars").cast("bigint").alias("x"),
        F.row_number().over(w).cast("bigint").alias("i"),
        F.count("*").over(Window.partitionBy("source")).cast("bigint").alias("n"),
    )
    n = F.max("n").cast("double")
    s = F.sum("x").cast("double")
    si = F.sum(F.col("i") * F.col("x")).cast("double")
    return r.groupBy("source").agg(
        F.max("n").alias("n_docs"),
        F.sum("x").alias("total_chars"),
        half_up(F.lit(2.0) * si / (n * s) - (n + F.lit(1.0)) / n, 6).alias("gini"),
    )


@query(
    "ns_shingle_containment",
    oracle=f"""
        WITH toks AS (SELECT doc_id, string_split(text, ' ') AS a
                      FROM documents),
             sh AS (SELECT DISTINCT doc_id,
                           md5(array_to_string(
                               list_slice(a, CAST(g AS INT),
                                          CAST(g AS INT) + {_SHINGLE_W - 1}),
                               ' ')) AS h
                    FROM toks,
                         LATERAL unnest(generate_series(
                             1, greatest(len(a) - {_SHINGLE_W - 1}, 1))) t(g)),
             bench AS (SELECT DISTINCT h FROM sh WHERE doc_id % 17 = 0),
             tr AS (SELECT doc_id, h FROM sh WHERE doc_id % 17 <> 0)
        SELECT tr.doc_id,
               count(*) AS n_shingles,
               count(bench.h) AS n_hits,
               floor(CAST(count(bench.h) AS DOUBLE) / count(*)
                     * 1000000.0 + 0.5) / 1000000.0 AS containment
        FROM tr LEFT JOIN bench ON tr.h = bench.h
        GROUP BY 1
    """,
    tags=("northstar", "pipeline", "decontamination"),
)
def ns_shingle_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scored decontamination: containment |shingles(d) ∩ benchmark| /
    |shingles(d)| of every training document against the held-out
    benchmark partition (docs with doc_id % 17 == 0 stand in for the
    eval set, as in ns_train_val_test's hash split). The graded twin of
    ns_decontaminate's boolean verdict — thresholding this column IS
    the drop rule.

    Scale shape: documents fan out to (doc_id, md5-of-5-word-shingle)
    pairs — only 128-bit digests shuffle; the distinct benchmark digest
    set is a small fraction of the corpus (broadcast-joined), and the
    containment ratio is exact int/int arithmetic on the 1e-6 grid."""
    d = t(spark, sf_dir, "documents")
    a = F.split(F.col("text"), " ")
    n = F.size(F.col("a"))
    sh = (
        d.select("doc_id", a.alias("a"))
        .select(
            "doc_id",
            "a",
            F.explode(
                F.sequence(F.lit(1), F.greatest(n - (_SHINGLE_W - 1), F.lit(1)))
            ).alias("g"),
        )
        .select(
            "doc_id",
            F.md5(F.concat_ws(" ", F.slice(F.col("a"), F.col("g"), _SHINGLE_W))).alias(
                "h"
            ),
        )
        .distinct()
    )
    bench = (
        sh.filter(F.col("doc_id") % 17 == 0)
        .select(F.col("h").alias("bh"))
        .distinct()
    )
    tr = sh.filter(F.col("doc_id") % 17 != 0)
    joined = tr.join(F.broadcast(bench), tr.h == bench.bh, "left")
    return joined.groupBy("doc_id").agg(
        F.count("*").alias("n_shingles"),
        F.count("bh").alias("n_hits"),
        half_up(F.count("bh").cast("double") / F.count("*"), 6).alias("containment"),
    )


#: Semantic-decontamination flag threshold on the 1e-6 cosine grid
#: (0.30 ≈ p75–p90 of the synthetic corpus's max-cosine distribution —
#: both classes non-empty at every driver SF).
_SEMDECON_TAU6 = 300_000

#: Shared by the batch query below and its ingest twin
#: (st_semantic_decontaminate): the verdicts depend only on
#: (vector, frozen benchmark, τ) — never on other batch members or
#: micro-batch boundaries — so ONE SQL describes both.
_SEMDECON_ORACLE = f"""
        WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
                   FROM embeddings),
             bench AS (SELECT v FROM e WHERE vec_id % 16 = 7),
             corp AS (SELECT * FROM e WHERE vec_id % 16 <> 7),
             mx AS (SELECT c.vec_id, c.label,
                           max(list_cosine_similarity(c.v, b.v)) AS m
                    FROM corp c CROSS JOIN bench b GROUP BY 1, 2)
        SELECT vec_id, label,
               floor(m * 1000000.0 + 0.5) / 1000000.0 AS max_cosine,
               CAST(floor(m * 1000000.0 + 0.5) AS BIGINT)
                   >= {_SEMDECON_TAU6} AS contaminated
        FROM mx
"""


@query(
    "ns_semantic_decontaminate",
    oracle=_SEMDECON_ORACLE,
    tags=("northstar", "pipeline", "decontamination", "similarity"),
)
def ns_semantic_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEMANTIC decontamination: flag training vectors whose max cosine
    against the held-out benchmark slice (vec_id % 16 == 7, the batch-
    slice convention) clears τ=0.30 — the embedding-space complement of
    the n-gram screens (ns_decontaminate catches verbatim/near-verbatim
    leaks; this catches paraphrased eval items that share no shingle,
    the screen Phi/LLaMA-class reports run alongside exact matching).
    Emits the full decision table (vec_id, label, max_cosine,
    contaminated) — thresholding IS the drop rule, graded like
    ns_shingle_containment.

    Scale shape: the benchmark side is a benchmark SUITE, not the
    corpus — fixed-size, broadcast (the ns_decontaminate digest-set
    architecture; NOT plan literals, the r8 IVF lesson: a broadcast
    join keeps the plan O(1) in |bench|). Corpus vectors score
    map-side against the broadcast (JVM zip_with/aggregate fold, no
    UDF), and the partial max-aggregate collapses each vector to ONE
    narrow row before the only exchange (vec_id, label, max) — corpus
    embeddings never shuffle. Flag and report ride the 1e-6 grid so
    both engines decide boundary cases identically. Scoring core shared
    with the ingest gate: operators/similarity.benchmark_max_cosine."""
    from map_reduce_framework_using_python_spark.operators.similarity import (
        benchmark_max_cosine,
    )

    e = t(spark, sf_dir, "embeddings")
    return benchmark_max_cosine(
        e.filter(F.col("vec_id") % 16 != 7),
        e.filter(F.col("vec_id") % 16 == 7),
        _SEMDECON_TAU6,
    )


@query(
    "ns_semantic_decontaminate_lsh",
    oracle=None,  # recall < 1 by construction (bucketed candidates) —
    # pinned against the exact form in tests/test_similarity.py:
    # flags ⊆ exact flags (candidate cosine is exact, so no false
    # positives) with measured recall at the fixed seed.
    tags=("northstar", "pipeline", "decontamination", "similarity",
          "sketch", "rows_only"),
)
def ns_semantic_decontaminate_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB SCALE path of ns_semantic_decontaminate for LARGE
    benchmark suites: random-hyperplane LSH buckets both sides and
    corpus vectors score only same-bucket (Hamming ≤ 2 multi-probe)
    benchmark candidates — |corpus|·|ball-hit| cosines instead of
    |corpus|·|bench| (the lsh_cosine_topk contract applied to the
    decontamination join). See
    operators/similarity.benchmark_max_cosine_lsh.

    probe_hamming=3 here: the registry τ (0.30) sits in the
    LOW-similarity regime where per-plane collision is only
    p = 1 − θ/π ≈ 0.60, so the default radius-2 ball recalls ~0.32 —
    radius 3 (93 of 256 buckets) buys 0.69 on this corpus (measured,
    pinned). At the thresholds real decontamination runs (τ ≥ 0.9 →
    p ≈ 0.9) the radius-2 ball already recalls ~0.96 per item — the
    planted-pair pin in tests/test_similarity.py exercises exactly
    that regime. The knobs are the contract, not a footnote: LSH
    pruning is for NEAR-DUPLICATE-grade thresholds.

    suppress_regime_warning: this registry entry IS the documented
    under-recall form (the pins above state its measured recall), so
    the low-τ RuntimeWarning is opted out here — otherwise every
    driver/sweep execution would warn unconditionally, and a config
    escalating warnings to errors would fail a deliberate call (r10
    advice). Ad-hoc callers still get the guard."""
    from map_reduce_framework_using_python_spark.operators.similarity import (
        benchmark_max_cosine_lsh,
    )

    e = t(spark, sf_dir, "embeddings")
    return benchmark_max_cosine_lsh(
        e.filter(F.col("vec_id") % 16 != 7),
        e.filter(F.col("vec_id") % 16 == 7),
        _SEMDECON_TAU6,
        probe_hamming=3,
        dim=64,  # the testdata embedding width — keeps plan-build lazy
        suppress_regime_warning=True,
    )


@query(
    "ns_semantic_decontaminate_kmeans",
    oracle=None,  # recall < 1 by construction (routed candidates) —
    # pinned against the exact form in tests/test_similarity.py:
    # flags ⊆ exact flags (candidate cosine is exact, so no false
    # positives) with recall ≥ 0.9 AT the registry τ=0.30 — the
    # low-threshold guarantee the hyperplane form cannot give.
    tags=("northstar", "pipeline", "decontamination", "similarity",
          "sketch", "rows_only"),
)
def ns_semantic_decontaminate_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LOW-τ scale path of ns_semantic_decontaminate (r10, closing
    the r9 verdict's one honest contract gap): the LSH form's
    hyperplane buckets recall only 0.69 at the registry τ=0.30 —
    per-plane collision p≈0.6 makes low thresholds structurally hard
    for data-independent buckets. This form clusters the BENCHMARK
    (spark.ml KMeans, the SemDeDup trick applied to the decon join)
    and routes each corpus vector to its n_probe nearest centroids
    map-side (broadcast one-row struct-array of centroids — no plan
    literals, no routing shuffle), scoring only co-routed candidates
    exactly. A miss now requires the argmax bench item to sit in an
    unprobed CLUSTER of the benchmark's own geometry, not an unprobed
    random halfspace: measured recall at τ=0.30 is ≥0.93 at
    n_probe=k/2 and pinned ≥0.9 in tests/test_similarity.py. Cost per
    corpus vector: k centroid cosines + ~(n_probe/k)·|bench| exact
    ones — the dial real decon sweeps turn (near-dup τ → small
    n_probe; paraphrase-grade τ → k/2). See
    operators/similarity.benchmark_max_cosine_kmeans."""
    from map_reduce_framework_using_python_spark.operators.similarity import (
        benchmark_max_cosine_kmeans,
    )

    e = t(spark, sf_dir, "embeddings")
    return benchmark_max_cosine_kmeans(
        e.filter(F.col("vec_id") % 16 != 7),
        e.filter(F.col("vec_id") % 16 == 7),
        _SEMDECON_TAU6,
        k=6,
        n_probe=4,
    )


def _semdecon_kmeans_lloyd_oracle() -> str:
    """Full DuckDB oracle for the LLOYD-fit kmeans-routed semantic
    decontamination (r14): a deterministic k-means chain over the
    BENCH slice (``_kmeans_ctes`` with ``src=``), per-corpus-vector
    cosine ranking of the rounded centroids (the exact routing
    expression _kmeans_route_score evaluates, cn included so the
    floats are bit-identical), candidates restricted to the probed
    clusters' bench members, and the grid-quantized max-cosine verdict
    — the routed scale path under the hash gate where the spark.ml
    forms are recall-pinned."""
    from map_reduce_framework_using_python_spark.plans.clustering_queries import (
        _kmeans_ctes,
    )

    k, ni, dim, n_probe = 6, 2, 64, 4
    ctes = [
        "e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v"
        " FROM embeddings)",
        "benchv AS (SELECT vec_id, v FROM e WHERE vec_id % 16 = 7)",
        "corp AS (SELECT vec_id, label, v FROM e WHERE vec_id % 16 <> 7)",
    ]
    ctes += _kmeans_ctes(k, ni, dim, pfx="b", vexpr="v", src="benchv")
    return (
        "WITH " + ",\n".join(ctes)
        + f""",
        ball AS (SELECT cluster, v AS bv FROM ba{ni}),
        route AS (SELECT vec_id, cluster FROM (
            SELECT c.vec_id, ct.cluster,
                   row_number() OVER (PARTITION BY c.vec_id ORDER BY
                     -(list_sum(list_transform(list_zip(c.v, ct.cent),
                                               p -> p[1] * p[2])))
                     / (sqrt(list_sum(list_transform(c.v, x -> x * x)))
                        * sqrt(list_sum(list_transform(ct.cent,
                                                       x -> x * x)))),
                     ct.cluster) AS rr
            FROM corp c CROSS JOIN bcent{ni} ct)
            WHERE rr <= {n_probe}),
        mx AS (SELECT c.vec_id,
                      max(list_cosine_similarity(c.v, ball.bv)) AS m
               FROM corp c
               JOIN route r ON r.vec_id = c.vec_id
               JOIN ball ON ball.cluster = r.cluster
               GROUP BY 1)
        SELECT c.vec_id, c.label,
               floor(m * 1000000.0 + 0.5) / 1000000.0 AS max_cosine,
               coalesce(CAST(floor(m * 1000000.0 + 0.5) AS BIGINT)
                        >= {_SEMDECON_TAU6}, false) AS contaminated
        FROM corp c LEFT JOIN mx ON mx.vec_id = c.vec_id
    """
    )


@query(
    "ns_semantic_decontaminate_kmeans_lloyd",
    oracle=_semdecon_kmeans_lloyd_oracle(),
    tags=("northstar", "pipeline", "decontamination", "similarity",
          "sketch"),
)
def ns_semantic_decontaminate_kmeans_lloyd(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The kmeans-ROUTED decontamination scale path under the FULL
    DuckDB hash gate (r14): the benchmark slice is clustered by the
    deterministic Lloyd kernel (k-smallest-id init, half-up 1e-6
    centroid rounding — SQL-replayable, where the spark.ml fit of
    ns_semantic_decontaminate_kmeans can only be recall-pinned), each
    corpus vector routes map-side to its n_probe nearest centroids BY
    COSINE off one broadcast row, and only co-routed bench members
    score exactly; verdicts ride the 1e-6 grid. Routing/scoring tail
    byte-shared with the spark.ml forms (_kmeans_route_score), so the
    oracle also gates the machinery those rows-only forms run."""
    from map_reduce_framework_using_python_spark.operators.similarity import (
        benchmark_max_cosine_kmeans_lloyd,
    )

    e = t(spark, sf_dir, "embeddings")
    return benchmark_max_cosine_kmeans_lloyd(
        e.filter(F.col("vec_id") % 16 != 7),
        e.filter(F.col("vec_id") % 16 == 7),
        _SEMDECON_TAU6,
        k=6,
        n_probe=4,
        n_iter=2,
    )


def _ensure_semdecon_kmeans_bench(spark: SparkSession, sf_dir: str) -> str:
    """Build-or-reuse the persisted decon quantizer artifact under /tmp
    via the shared fingerprint-guarded machinery (the
    _ensure_paragraph_index pattern)."""
    import os

    from map_reduce_framework_using_python_spark.operators.similarity import (
        build_semdecon_kmeans_bench,
    )
    from map_reduce_framework_using_python_spark.sources.io import (
        ensure_fingerprinted_layout,
        layout_cache_tag,
        source_fingerprint,
    )

    root = os.environ.get("SPARK_GRAFT_DEDUP_INDEX_ROOT", "/tmp/spark_graft_dedup")
    path = os.path.join(root, layout_cache_tag(sf_dir), "semdecon_kmeans_k6")

    def build(p: str) -> None:
        bench = t(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 16 == 7)
        build_semdecon_kmeans_bench(bench, p, k=6)

    return ensure_fingerprinted_layout(
        path,
        "_dedup_meta.json",
        source_fingerprint(os.path.join(sf_dir, "embeddings.parquet")),
        build,
    )


@query(
    "ns_semantic_decontaminate_kmeans_indexed",
    oracle=None,  # rows-only: pinned EQUAL to the inline kmeans form
    # (tests/test_similarity.py — shared _kmeans_route_score tail), whose
    # own recall-at-τ pin gates the routing quality.
    tags=("northstar", "pipeline", "decontamination", "similarity",
          "index", "rows_only"),
)
def ns_semantic_decontaminate_kmeans_indexed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The DEPLOYMENT form of the routed decontamination path: the
    benchmark's coarse quantizer is persisted ONCE at benchmark-freeze
    time (operators/similarity.build_semdecon_kmeans_bench — clustered
    candidate ball + bounded centroid JSON, fingerprint-cached here
    like the ANN/paragraph layouts) and each corpus or micro-batch
    probe routes against the artifact with NO spark.ml action in the
    query path. Same verdicts as ns_semantic_decontaminate_kmeans by
    construction (shared routing/scoring tail); measured at the
    10×/125-bench scenario the indexed probe runs 1.7 s vs the exact
    form's 3.2–4.3 s and the fit-in-path inline form's 4.6 s — with
    the fit moved into the artifact, the routed form wins at every
    benchmark size (bench.py scale10x_semdecon kmeans_indexed_exec,
    tools/semdecon_crossover_probe.py)."""
    from map_reduce_framework_using_python_spark.operators.similarity import (
        benchmark_max_cosine_kmeans_indexed,
    )

    e = t(spark, sf_dir, "embeddings")
    path = _ensure_semdecon_kmeans_bench(spark, sf_dir)
    return benchmark_max_cosine_kmeans_indexed(
        e.filter(F.col("vec_id") % 16 != 7), path, _SEMDECON_TAU6, n_probe=4
    )


#: Feature-hashing embedder dimensionality (small enough for a 16-column
#: oracle; the Spark side generalizes to any power of two).
_FH_DIM = 16


def _fh_oracle() -> str:
    b = "CAST(concat('0x', substr(md5(tok), 1, 8)) AS BIGINT) % {d}".format(d=_FH_DIM)
    sgn = ("CASE WHEN CAST(concat('0x', substr(md5(tok), 9, 8)) AS BIGINT) % 2 = 0 "
           "THEN 1 ELSE -1 END")
    sums = ",\n".join(
        f"SUM(CASE WHEN bucket = {i} THEN sgn ELSE 0 END) AS s{i}"
        for i in range(_FH_DIM)
    )
    nrm = " + ".join(f"s{i}*s{i}" for i in range(_FH_DIM))
    comps = ",\n".join(
        f"CASE WHEN nrm > 0 THEN floor(CAST(s{i} AS DOUBLE) / nrm * 1000000.0 + 0.5)"
        f" / 1000000.0 ELSE 0.0 END AS e{i}"
        for i in range(_FH_DIM)
    )
    return f"""
        WITH tok AS (SELECT doc_id, t.tok
                     FROM (SELECT doc_id,
                                  string_split_regex(trim(text), ' +') AS ws
                           FROM documents) s,
                          unnest(s.ws) AS t(tok)
                     WHERE t.tok <> ''),
             h AS (SELECT doc_id, {b} AS bucket, {sgn} AS sgn FROM tok),
             s AS (SELECT doc_id, count(*) AS n_tokens, {sums}
                   FROM h GROUP BY 1),
             n AS (SELECT *, sqrt({nrm}) AS nrm FROM s)
        SELECT doc_id, n_tokens, {comps}
        FROM n
    """


#: Document-space semantic-decontamination threshold: the 16-dim
#: hash-embed space is CROWDED (bag-of-words over a shared vocabulary —
#: measured corpus median max-cosine vs the held-out slice is ~0.84),
#: so the flag threshold is near-verbatim-grade, NOT the 64-dim
#: embedding table's 0.30. Both classes non-empty at every driver SF
#: (86/470, 55/470, 2425/4705 flagged at sf0.001/0.01/0.1).
_DOC_DECON_TAU6 = 900_000


def _doc_decon_oracle() -> str:
    """Full SQL twin of ns_doc_decontaminate: the _fh_oracle embed CTEs
    for all documents, split on the held-out slice, 16-term cosine (the
    left-to-right sum parses to the same IEEE order Spark's ZipWith
    fold evaluates, so raw cosines are bit-equal), max per corpus doc,
    1e-6 grid + flag."""
    b = "CAST(concat('0x', substr(md5(tok), 1, 8)) AS BIGINT) % {d}".format(d=_FH_DIM)
    sgn = ("CASE WHEN CAST(concat('0x', substr(md5(tok), 9, 8)) AS BIGINT) % 2 = 0 "
           "THEN 1 ELSE -1 END")
    sums = ",\n".join(
        f"SUM(CASE WHEN bucket = {i} THEN sgn ELSE 0 END) AS s{i}"
        for i in range(_FH_DIM)
    )
    nrm = " + ".join(f"s{i}*s{i}" for i in range(_FH_DIM))
    comps = ",\n".join(
        f"floor(CAST(s{i} AS DOUBLE) / nrm * 1000000.0 + 0.5) / 1000000.0 AS e{i}"
        for i in range(_FH_DIM)
    )
    dot = " + ".join(f"c.e{i}*b.e{i}" for i in range(_FH_DIM))
    cn = " + ".join(f"c.e{i}*c.e{i}" for i in range(_FH_DIM))
    bn = " + ".join(f"b.e{i}*b.e{i}" for i in range(_FH_DIM))
    return f"""
        WITH tok AS (SELECT doc_id, t.tok
                     FROM (SELECT doc_id,
                                  string_split_regex(trim(text), ' +') AS ws
                           FROM documents) s,
                          unnest(s.ws) AS t(tok)
                     WHERE t.tok <> ''),
             h AS (SELECT doc_id, {b} AS bucket, {sgn} AS sgn FROM tok),
             s AS (SELECT doc_id, {sums} FROM h GROUP BY 1),
             n AS (SELECT *, sqrt({nrm}) AS nrm FROM s),
             e AS (SELECT doc_id, {comps} FROM n WHERE nrm > 0),
             corp AS (SELECT * FROM e WHERE doc_id % 17 <> 0),
             bench AS (SELECT * FROM e WHERE doc_id % 17 = 0),
             mx AS (SELECT c.doc_id,
                           max(({dot}) / (sqrt({cn}) * sqrt({bn}))) AS m
                    FROM corp c CROSS JOIN bench b GROUP BY 1)
        SELECT doc_id,
               floor(m * 1000000.0 + 0.5) / 1000000.0 AS max_cosine,
               CAST(floor(m * 1000000.0 + 0.5) AS BIGINT)
                   >= {_DOC_DECON_TAU6} AS contaminated
        FROM mx
    """


@query(
    "ns_doc_decontaminate",
    oracle=_doc_decon_oracle(),
    tags=("northstar", "pipeline", "decontamination", "embedding", "text"),
)
def ns_doc_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic decontamination over raw DOCUMENTS — the oracle-gated
    batch twin of the curation capstone's contamination leg: hash-embed
    every document (operators/similarity.hash_embed_array, the exact
    featurizer the leg's persisted benchmark table uses), hold out the
    doc_id % 17 == 0 slice as the benchmark suite (the
    ns_shingle_containment convention, so the three decontamination
    screens share one split), and flag corpus docs whose max cosine
    clears τ=0.90 on the 1e-6 grid. Completes the decon matrix: n-gram
    boolean, n-gram scored, embedding-table semantic, and now
    document-text semantic — each form fully DuckDB-gated.

    Scale shape: the embed is one vocabulary-free (doc_id, small-ints)
    exchange per side; the benchmark side is a fixed-size suite
    (broadcast); scoring is the shared benchmark_max_cosine core —
    map-side JVM folds, partial max-agg, one narrow exchange. Docs the
    embedder cannot score (no tokens, or sign-cancelled zero vectors —
    the nrm > 0 guard on BOTH engines) are absent, matching the leg's
    'unscorable passes to the quality gate' contract."""
    from map_reduce_framework_using_python_spark.operators.similarity import (
        benchmark_max_cosine,
        hash_embed_array,
    )

    d = t(spark, sf_dir, "documents")
    nonzero = lambda df: df.filter(  # noqa: E731
        F.aggregate(F.col("emb"), F.lit(0.0), lambda a, x: a + x * x) > 0
    )
    return benchmark_max_cosine(
        nonzero(hash_embed_array(d.filter(F.col("doc_id") % 17 != 0))),
        nonzero(hash_embed_array(d.filter(F.col("doc_id") % 17 == 0))),
        _DOC_DECON_TAU6,
        vec_col="emb",
        id_col="doc_id",
        label_col=None,
    )


@query(
    "ns_hash_embed",
    oracle=_fh_oracle(),
    tags=("northstar", "pipeline", "embedding", "text"),
)
def ns_hash_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashing text embedder (the "hashing trick", Weinberger
    et al. 2009): every token occurrence votes ±1 into one of 16
    md5-derived buckets, and the per-document vote vector is
    L2-normalized — a deterministic, vocabulary-free bag-of-words
    embedding. This closes the text→vector gap in the pipeline: the
    other embedding ops (ANN, SemDeDup, quantization) consume a given
    embedding column; this one MANUFACTURES one from raw text, exactly
    the kind of cheap featurization a 100 TB corpus pass runs before
    clustering or near-dup blocking.

    Scale shape: explode → one partial+final hash aggregate keyed on
    doc_id (16 conditional integer sums, map-side combined), then
    map-only normalization — one vocabulary-free shuffle of (doc_id,
    small ints); no model state at all. Determinism: bucket and sign
    come from disjoint md5 substrings (decorrelated), components are
    integer-sum / sqrt(integer-sum) doubles — identical on both
    engines — then half_up-quantized to 1e-6. The 16 components are
    emitted as typed scalar columns (e0..e15): scalars hash
    identically everywhere, and 16 is plenty for blocking-grade
    similarity while keeping the oracle a finite column list.

    Build note (r7): the 16 agg branches and 16 normalized components
    are generated-SQL ``F.expr`` strings, not Column-API trees — the
    Column build cost ~0.35 s of driver-side Python per call (the bulk
    of this query's bench wall-clock, misread in round 6 as an
    execution regression; see operators/similarity._bucket_expr for
    the same fix on the ANN probe). Values are pinned identical."""
    d = t(spark, sf_dir, "documents")
    tok = (
        d.select("doc_id", F.explode(F.split(F.trim(F.col("text")), " +")).alias("tok"))
        .filter(F.col("tok") != "")
        .select(
            "doc_id",
            F.expr(
                "pmod(CAST(conv(substring(md5(tok), 1, 8), 16, 10) AS BIGINT), "
                f"{_FH_DIM})"
            ).alias("bucket"),
            F.expr(
                "CASE WHEN pmod(CAST(conv(substring(md5(tok), 9, 8), 16, 10) "
                "AS BIGINT), 2) = 0 THEN 1 ELSE -1 END"
            ).alias("sgn"),
        )
    )
    sums = tok.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        *[
            F.expr(f"sum(CASE WHEN bucket = {i} THEN sgn ELSE 0 END)").alias(f"s{i}")
            for i in range(_FH_DIM)
        ],
    )
    # ``floor(x * 1e6 + 0.5) / 1e6`` is plans/core.half_up verbatim.
    nrm_sql = "sqrt(" + " + ".join(f"s{i} * s{i}" for i in range(_FH_DIM)) + ")"
    comps = [
        F.expr(
            f"CASE WHEN {nrm_sql} > 0 THEN "
            f"floor(s{i} / {nrm_sql} * 1000000.0 + 0.5) / 1000000.0 "
            "ELSE 0.0D END"
        ).alias(f"e{i}")
        for i in range(_FH_DIM)
    ]
    return sums.select("doc_id", "n_tokens", *comps)


@query(
    "ns_source_overlap",
    oracle="""
        WITH tok AS (SELECT doc_id, source, string_split(text, ' ') AS w
                     FROM documents),
             sh AS (SELECT DISTINCT source,
                           w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
                    FROM tok, UNNEST(range(1, len(w) - 1)) AS t(i)),
             counts AS (SELECT source, count(*) AS n FROM sh GROUP BY 1),
             shared AS (SELECT a.source AS source_a, b.source AS source_b,
                               count(*) AS n_shared
                        FROM sh a
                        JOIN sh b ON a.shingle = b.shingle
                                 AND a.source < b.source
                        GROUP BY 1, 2)
        SELECT s.source_a, s.source_b, s.n_shared,
               floor(CAST(s.n_shared AS DOUBLE)
                     / (ca.n + cb.n - s.n_shared) * 1000000.0 + 0.5)
                   / 1000000.0 AS jaccard
        FROM shared s
        JOIN counts ca ON ca.source = s.source_a
        JOIN counts cb ON cb.source = s.source_b
    """,
    tags=("northstar", "pipeline", "dedup", "analysis"),
)
def ns_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination matrix: for every pair of sources,
    how many distinct word 3-gram shingles they share and the Jaccard
    of their shingle sets — the corpus-analysis view of
    decontamination (ns_decontaminate asks "is THIS doc leaked";
    this asks "WHICH feeds overlap", the report that decides whether
    a source is worth ingesting at all).

    Scale shape: distinct (shingle, source) — the source dimension is
    small, so this is a shingle-bounded exchange — then per-shingle
    source-set pairing via collect_set + double explode: ONE exchange
    on the shingle key instead of a two-sided self-join, and the
    per-shingle pair blow-up is bounded by |sources|², a dimension
    constant, never corpus-sized (same bucket-pairing shape as
    minhash_lsh_pairs). Counts are exact integers; only the final
    Jaccard is quantized (half_up 1e-6, both engines)."""
    from map_reduce_framework_using_python_spark.operators.dedup import word_shingles

    d = t(spark, sf_dir, "documents")
    sh = (
        d.select("source", F.explode(word_shingles("text", 3)).alias("shingle"))
        .distinct()
    )
    counts = sh.groupBy("source").agg(F.count("*").alias("n"))
    shared = (
        sh.groupBy("shingle")
        .agg(F.collect_set("source").alias("srcs"))
        .filter(F.size("srcs") > 1)
        .select(F.explode("srcs").alias("source_a"), F.col("srcs"))
        .select("source_a", F.explode("srcs").alias("source_b"))
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").alias("n_shared"))
    )
    ca = counts.select(F.col("source").alias("source_a"), F.col("n").alias("na"))
    cb = counts.select(F.col("source").alias("source_b"), F.col("n").alias("nb"))
    jac = F.col("n_shared") / (F.col("na") + F.col("nb") - F.col("n_shared"))
    return (
        shared.join(F.broadcast(ca), "source_a")
        .join(F.broadcast(cb), "source_b")
        .select("source_a", "source_b", "n_shared", half_up(jac, 6).alias("jaccard"))
    )


@query(
    "ns_token_entropy",
    oracle=f"""
        WITH tok AS (SELECT doc_id, t.tok
                     FROM (SELECT doc_id,
                                  string_split_regex(trim(text), ' +') AS ws
                           FROM documents) s,
                          unnest(s.ws) AS t(tok)
                     WHERE t.tok <> ''),
             tf AS (SELECT doc_id, tok, count(*) AS c
                    FROM tok GROUP BY 1, 2),
             n AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
                          count(*) AS n_distinct
                   FROM tf GROUP BY 1),
             q AS (SELECT tf.doc_id,
                          CAST(floor(-(CAST(tf.c AS DOUBLE) / n.n_tokens)
                                     * ln(CAST(tf.c AS DOUBLE) / n.n_tokens)
                                     * {_LOG_GRID} + 0.5) AS BIGINT) AS li
                   FROM tf JOIN n USING (doc_id)
                   WHERE tf.c < n.n_tokens)
        SELECT n.doc_id, n.n_tokens, n.n_distinct,
               floor(COALESCE(CAST(CAST(sum(q.li) AS BIGINT) AS DOUBLE), 0.0)
                     / {_LOG_GRID} * 1000000.0 + 0.5) / 1000000.0 AS entropy
        FROM n LEFT JOIN q ON q.doc_id = n.doc_id
        GROUP BY 1, 2, 3
    """,
    tags=("northstar", "pipeline", "quality", "text"),
)
def ns_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Shannon entropy of the token distribution,
    H = -Σ p·ln p — the classic gibberish/boilerplate signal (a doc
    repeating one token has H=0; rich vocabulary pushes H toward
    ln(n_distinct)); the CCNet-family quality gates threshold on
    exactly this.

    Scale shape: one (doc, token) hash agg then one doc-keyed agg —
    both map-side combined, vocabulary-free, no model state.
    Determinism (plans/core.py rules): each term's -p·ln p lands on
    the 1e-9 integer grid BEFORE the cross-row sum (BIGINT — addition-
    order-independent), with the single-token term (p=1, contribution
    exactly 0) excluded on both engines so no -0.0/ln(1) noise enters
    the grid; the final entropy is half_up-quantized to 1e-6."""
    d = t(spark, sf_dir, "documents")
    tok = (
        d.select("doc_id", F.explode(F.split(F.trim(F.col("text")), " +")).alias("tok"))
        .filter(F.col("tok") != "")
    )
    tf = tok.groupBy("doc_id", "tok").agg(F.count("*").alias("c"))
    p = F.col("c").cast("double") / F.col("n_tokens")
    li = F.floor(-p * F.log(p) * F.lit(_LOG_GRID) + F.lit(0.5)).cast("bigint")
    n = tf.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"), F.count("*").alias("n_distinct")
    )
    return (
        tf.join(n, "doc_id")
        .select(
            "doc_id", "n_tokens", "n_distinct",
            F.when(F.col("c") < F.col("n_tokens"), li).otherwise(F.lit(None)).alias("li"),
        )
        .groupBy("doc_id", "n_tokens", "n_distinct")
        .agg(
            half_up(
                F.coalesce(F.sum("li").cast("double"), F.lit(0.0)) / _LOG_GRID, 6
            ).alias("entropy")
        )
    )
