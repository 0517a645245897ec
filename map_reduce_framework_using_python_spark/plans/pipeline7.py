"""Training-pipeline operators, part 7: DSIR importance weights,
CCNet-style perplexity bucketing, and distributed BPE tokenizer
training.

Three curation ops from the published LLM-data-pipeline literature (the
reference's users would chain mapper/reducer jobs over ``documents``
for each, `Readme.md:6`; here each is one declarative plan):

- **DSIR importance weights** (``ns_dsir_weights``): Data Selection via
  Importance Resampling (Xie et al., NeurIPS 2023). Hashed unigram
  features (md5-prefix buckets), a Laplace-smoothed bag-of-buckets
  model of the TARGET distribution (here: the ``lang='en'`` slice)
  against the RAW corpus, and per-document log importance weight
  log p_target(d) − log p_raw(d) = Σ_tokens log-ratio(bucket(token)).
  Documents whose token mix looks like the target get weights > 0 and
  survive the downstream weighted resample (ns_weighted_sample).
- **CCNet perplexity buckets**: per-language head/middle/tail terciles
  of the bigram-LM fluency score (ns_bigram_lm_score) — the CCNet
  (Wenzek et al. 2020) quality stratification that lets a pipeline
  keep "head" text and downsample "tail" per language instead of
  applying one global threshold. Two forms: ``ns_ccnet_buckets_scaled``
  (the gated production headline — histogram thresholds, windows only
  over the bounded score grid) and ``ns_ccnet_buckets`` (the exact
  NTILE parity fixture).
- **BPE tokenizer training** (``ns_bpe_train``): learn the merge table
  itself (Sennrich et al. 2016) — not just apply one
  (ns_token_count_bpe). One corpus-sized pass builds the distinct
  (word, count) vocabulary; every subsequent merge round runs over
  that vocabulary-sized table only: explode adjacent symbol pairs,
  weighted pair-count agg, argmax with a deterministic tie-break, and
  a JVM-side ``aggregate`` fold applies the merge greedily
  left-to-right. The driver pulls exactly ONE row per round (the
  winning pair — model state, like the k-means centroids in
  operators/clustering.py), never data.

Determinism rules (plans/core.py): per-bucket log-ratios land on the
1e-9 integer grid BEFORE any cross-row sum, and per-doc scores reach
aggregation as exact 1e-6-grid integers — both engines sum BIGINTs, so
order of addition cannot diverge them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from map_reduce_framework_using_python_spark.plans.core import persist_lane, query, t
from map_reduce_framework_using_python_spark.plans.pipeline6 import (
    _BIGRAM_LM_ORACLE,
    _LOG_GRID,
    _bigram_lm,
)

#: Hashed-feature space: the first two md5 hex chars → 256 buckets.
#: DSIR's paper uses 10k hashed n-gram buckets; 256 keeps the bucket
#: model human-checkable while exercising the identical shape (the
#: bucket width is a constant, not a scale knob — the model is always
#: exactly B rows no matter the corpus size). Imported from the
#: operator module so the oracle grids can never drift from the
#: Spark-side expressions.
from map_reduce_framework_using_python_spark.operators.dsir import (  # noqa: E402
    DSIR_BUCKETS as _DSIR_BUCKETS,
    LOG_GRID as _OP_LOG_GRID,
)

# The oracle strings quantize on pipeline6's grid; the operator module
# must agree or Spark and DuckDB would round on different grids.
assert _OP_LOG_GRID == _LOG_GRID


#: The DSIR weight computation as a reusable oracle fragment: a full
#: SELECT producing (doc_id, n_tokens, log_weight) — registered as
#: ns_dsir_weights directly and re-wrapped as a CTE by ns_dsir_resample.
_DSIR_ORACLE = f"""
        WITH tokd AS (SELECT doc_id, lang,
                             unnest(string_split_regex(trim(text), ' +')) AS w
                      FROM documents),
             tok AS (SELECT doc_id, substr(md5(w), 1, 2) AS b, lang
                     FROM tokd WHERE w <> ''),
             m AS (SELECT b, count(*) AS n_r,
                          sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS n_t
                   FROM tok GROUP BY 1),
             tt AS (SELECT CAST(sum(n_r) AS BIGINT) AS t_r,
                           CAST(sum(n_t) AS BIGINT) AS t_t FROM m),
             model AS (SELECT b,
                              CAST(floor((ln(CAST(n_t + 1 AS DOUBLE) / (t_t + {_DSIR_BUCKETS}))
                                          - ln(CAST(n_r + 1 AS DOUBLE) / (t_r + {_DSIR_BUCKETS})))
                                         * {_LOG_GRID} + 0.5) AS BIGINT) AS li
                       FROM m, tt)
        SELECT doc_id, count(*) AS n_tokens,
               floor(CAST(CAST(sum(li) AS BIGINT) AS DOUBLE) / {_LOG_GRID}
                     * 1000000.0 + 0.5) / 1000000.0 AS log_weight
        FROM tok JOIN model USING (b)
        GROUP BY 1
"""


@query(
    "ns_dsir_weights",
    oracle=_DSIR_ORACLE,
    tags=("northstar", "pipeline", "sampling", "dsir"),
)
def ns_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document DSIR importance weight: Σ over token occurrences of
    log-ratio between the Laplace-smoothed hashed-unigram model of the
    TARGET slice (``lang='en'``) and of the raw corpus. Positive →
    target-like, negative → off-distribution; feed into
    ns_weighted_sample / ns_pps_sample to realize the resample.

    Scale shape: tokens explode once and carry only a 2-char bucket id
    — raw text never leaves the scan stage. The bucket model is a
    256-row hash agg (map-side combine collapses every partition to
    ≤256 rows before the exchange) and is broadcast back onto the
    token stream — broadcast is RIGHT here, unlike the bigram-LM model
    (plans/pipeline6.py), because the feature space is a fixed B=256
    rows by construction, not vocabulary-sized. The only
    corpus-proportional exchange is the final per-doc partial agg of
    (bigint, bigint) pairs. Per-bucket log-ratios are 1e-9-grid
    integers before summation (plans/core.py determinism rules)."""
    return _dsir_weights(spark, sf_dir)


def _dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Model build + scoring live in operators/dsir.py so the same
    # expressions serve the persisted-model ingest lane
    # (streaming/quality_gate.py). Corpus totals come from an
    # unpartitioned window over the ≤256-row model table — NOT a second
    # aggregation of the token stream: a crossJoin with m.agg(...)
    # makes Catalyst re-derive the model from the corpus, i.e. a third
    # full scan+explode (see dsir_model's docstring).
    from map_reduce_framework_using_python_spark.operators.dsir import (
        dsir_model,
        dsir_score,
    )

    d = t(spark, sf_dir, "documents")
    return dsir_score(d, dsir_model(d, F.col("lang") == "en"))


#: Resample size and the uniform-hash denominator (16^8 + 1 keeps
#: u ∈ (0, 1) strictly — the same construction as ns_weighted_sample,
#: and the double −ln(−ln(u)) needs u ∉ {0, 1}).
_DSIR_K = 25
_DSIR_DEN = float(16**8 + 1)


@query(
    "ns_dsir_resample",
    oracle=f"""
        WITH dw AS ({_DSIR_ORACLE}),
             g AS (SELECT doc_id, n_tokens, log_weight,
                          log_weight - ln(-ln(
                              (CAST(concat('0x', substr(md5(concat('gum',
                                   CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT)
                               + 1) / {_DSIR_DEN})) AS gk
                   FROM dw)
        SELECT doc_id, n_tokens, log_weight,
               floor(gk * 1000000000.0 + 0.5) / 1000000000.0 AS key
        FROM g
        ORDER BY gk DESC, doc_id
        LIMIT {_DSIR_K}
    """,
    tags=("northstar", "pipeline", "sampling", "dsir"),
)
def ns_dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The second half of DSIR: sample k documents WITHOUT replacement
    with probability ∝ exp(log_weight) via the Gumbel top-k trick —
    key = log_weight − ln(−ln(u)) with u md5-derived (no rand(), so the
    sample reproduces on any engine / retry / partitioning), take the
    top k. Target-like documents dominate the resampled corpus exactly
    as the DSIR paper prescribes; together with ns_dsir_weights this is
    the full select-then-resample loop.

    Scale shape: the weight plan (see ns_dsir_weights) plus a map-side
    Gumbel key and a ``TakeOrderedAndProject`` top-k — per-partition
    heaps, a k-row driver merge, never a global sort. The Gumbel key is
    built from the ALREADY-QUANTIZED 1e-6-grid log_weight, so both
    engines order identical doubles (ties broken by doc_id); the
    emitted key is rounded to the 1e-9 grid."""
    dw = _dsir_weights(spark, sf_dir)
    uni = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("gum"), F.col("doc_id").cast("string"))), 1, 8),
            16,
            10,
        ).cast("bigint")
        + 1
    ) / F.lit(_DSIR_DEN)
    gk = F.col("log_weight") - F.log(-F.log(uni))
    return (
        dw.select("doc_id", "n_tokens", "log_weight", gk.alias("_gk"))
        .orderBy(F.col("_gk").desc(), "doc_id")
        .limit(_DSIR_K)
        .select(
            "doc_id",
            "n_tokens",
            "log_weight",
            (F.floor(F.col("_gk") * 1e9 + F.lit(0.5)) / 1e9).alias("key"),
        )
    )


@query(
    "ns_ccnet_buckets",
    oracle=f"""
        WITH lm AS ({_BIGRAM_LM_ORACLE}),
             j AS (SELECT lm.doc_id, d.lang, lm.avg_logp
                   FROM lm JOIN documents d USING (doc_id)),
             nt AS (SELECT lang,
                           CAST(floor(avg_logp * 1000000.0 + 0.5) AS BIGINT) AS li6,
                           ntile(3) OVER (PARTITION BY lang
                                          ORDER BY avg_logp DESC, doc_id) AS tert
                    FROM j)
        SELECT lang,
               CASE tert WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                         ELSE 'tail' END AS bucket,
               count(*) AS n_docs,
               floor(CAST(CAST(sum(li6) AS BIGINT) AS DOUBLE) / count(*) + 0.5)
                   / 1000000.0 AS mean_logp
        FROM nt GROUP BY 1, 2
    """,
    tags=("northstar", "pipeline", "quality", "lm"),
)
def ns_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style quality stratification: per-language head/middle/tail
    terciles of the bigram-LM fluency score, with per-bucket volume and
    mean score — the table a curation run thresholds on ("keep head,
    sample middle, drop tail") so quality cuts adapt per language
    instead of penalizing low-resource ones with a global bar.

    Composes the shuffle-join bigram LM (plans/pipeline6.py) with an
    exact NTILE(3) windowed per language. Since round 6 this is the
    PARITY FIXTURE, not the production path: at 100 TB a dominant
    language makes the single per-lang window partition a straggler,
    and the gated/benched headline is :func:`ns_ccnet_buckets_scaled`,
    whose windows run over the bounded score histogram instead and
    which carries its own full DuckDB oracle. The mean score is
    aggregated from exact 1e-6-grid integers, so both engines sum
    identical BIGINTs."""
    lm = _bigram_lm(spark, sf_dir, "shuffle")
    d = t(spark, sf_dir, "documents").select("doc_id", "lang")
    j = lm.join(d, "doc_id")
    w = Window.partitionBy("lang").orderBy(F.desc("avg_logp"), "doc_id")
    li6 = F.floor(F.col("avg_logp") * 1e6 + F.lit(0.5)).cast("bigint")
    nt = j.select("lang", li6.alias("li6"), F.ntile(3).over(w).alias("tert"))
    bucket = (
        F.when(F.col("tert") == 1, "head")
        .when(F.col("tert") == 2, "middle")
        .otherwise("tail")
    )
    return nt.groupBy("lang", bucket.alias("bucket")).agg(
        F.count("*").alias("n_docs"),
        (
            F.floor(F.sum("li6").cast("double") / F.count("*") + F.lit(0.5)) / 1e6
        ).alias("mean_logp"),
    )


#: Merge rounds learned by ns_bpe_train. Each round is one
#: vocabulary-sized job; 8 rounds keeps the registry query cheap while
#: exercising the full loop (real tokenizer training runs ~30k rounds
#: of the same shape — the per-round cost is what scales, not K).
_BPE_ROUNDS = 8


def _bpe_pair_table(cur: DataFrame) -> DataFrame:
    """Adjacent-symbol pair table (cnt, p) of a (cnt, syms) frame — the
    ONE copy of the pair-explode expression both BPE trainers count
    over (r7 review: the sequential and batched trainers carried
    byte-identical blocks whose drift would hollow out the pinned
    sequential==batched equality)."""
    n = F.size("syms")
    return cur.filter(n > 1).select(
        "cnt",
        F.explode(
            F.zip_with(
                F.slice("syms", 1, n - 1),
                F.expr("slice(syms, 2, size(syms) - 1)"),
                lambda x, y: F.concat(x, F.lit("\x01"), y),
            )
        ).alias("p"),
    )


def _bpe_merge_fold(a: str, b: str, ab: str):
    """Greedy left-to-right merge fold for one accepted pair — shared
    by both trainers (see :func:`_bpe_pair_table`)."""
    return lambda acc, s: F.when(
        (F.size(acc) > 0)
        & (F.element_at(acc, -1) == F.lit(a))
        & (s == F.lit(b)),
        F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(ab))),
    ).otherwise(F.concat(acc, F.array(s)))


def bpe_train(words: DataFrame, rounds: int = _BPE_ROUNDS) -> list[tuple[int, str, str, int]]:
    """Learn a BPE merge table from a (w, cnt) vocabulary DataFrame.

    Returns ``[(rank, left, right, pair_count), ...]`` — the classic
    Sennrich et al. 2016 procedure, distributed:

    - symbols start as single characters of each distinct word;
    - each round explodes adjacent symbol pairs weighted by word count,
      hash-aggregates pair counts (vocabulary-bounded — map-side
      combine collapses them before the exchange), and takes the
      argmax via ``TakeOrderedAndProject`` (ties broken by pair string,
      so reruns and engines agree);
    - the winning merge is applied with a JVM-side ``F.aggregate`` fold
      (greedy left-to-right, no re-merge across a just-merged token —
      the fold's accumulator tail is the merged token, which no longer
      equals ``left``), then the vocabulary is ``localCheckpoint``-ed
      to cut the per-round lineage (same pattern as the connected-
      components loop in operators/graph.py).

    The corpus is read ONCE (the word-count agg the caller supplies);
    every round after that touches only the distinct-word table. The
    driver receives exactly one row per round — model state, not data.
    """
    cur = words.withColumn("syms", F.split("w", "")).localCheckpoint()
    merges: list[tuple[int, str, str, int]] = []
    for r in range(1, rounds + 1):
        pairs = _bpe_pair_table(cur)
        top = (
            pairs.groupBy("p")
            .agg(F.sum("cnt").alias("c"))
            .orderBy(F.desc("c"), "p")
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b = top[0]["p"].split("\x01")
        merges.append((r, a, b, int(top[0]["c"])))
        merged = F.aggregate(
            "syms", F.array().cast("array<string>"), _bpe_merge_fold(a, b, a + b)
        )
        cur = cur.withColumn("syms", merged).localCheckpoint()
    return merges


def bpe_train_batched(
    words: DataFrame, rounds: int = _BPE_ROUNDS, batch_size: int = 8
) -> list[tuple[int, str, str, int]]:
    """Batched BPE training (VERDICT r6 item 5): accept up to
    ``batch_size`` COMPATIBLE merges per distributed round, cutting the
    driver round-trips (and barrier jobs) ~batch_size× — the standard
    move that makes a 50k-merge production vocabulary ~12k jobs instead
    of 50k. :func:`bpe_train` stays as the exact 1-per-round parity
    fixture (the CCNet scaled/exact precedent).

    Compatibility (the exactness condition): within a round, pairs are
    taken in (count desc, pair) order and accepted greedily iff their
    symbols are disjoint from every already-accepted pair's symbols and
    merged tokens. Merging a pair only touches adjacencies containing
    its own symbols, so a DISJOINT pair's count is invariant under it —
    the sequential trainer would therefore pick the same pairs with the
    same counts in the same order, and the batch equals ``batch_size``
    sequential rounds EXCEPT when a mid-round merge CREATES a new pair
    (x, ab) whose count would out-rank a later batch member; sequential
    would then interleave it. That window is the documented
    approximation (tests pin exact equality on a corpus where it is
    empty, and standard practice accepts it at scale — Sennrich-style
    trainers batch exactly this way). The first candidate is always
    accepted, so progress is guaranteed.

    Apply stays one Spark job per round: the accepted merges compose as
    a chain of the same greedy left-to-right JVM folds, in acceptance
    order, inside one ``localCheckpoint``-ed pass.

    ``batch_size`` default 8 (r9, from the NON-saturating curve —
    tools/bpe_curve.py --synthetic, NOTES.md): at both 256 and 512
    merges batch=8 beats batch=4 on wall AND merge-set fidelity vs the
    exact trainer (256: 45.0 s/81% vs 48.6 s/75%; 512: 75.9 s/77% vs
    102.5 s/68%), while batch=16 craters fidelity (62% at 256). The r8
    batch=4 pick came from the saturating 88-merge corpus, where the
    sizes tied on wall and 4 had the edge on fidelity."""
    cur = words.withColumn("syms", F.split("w", "")).localCheckpoint()
    merges: list[tuple[int, str, str, int]] = []
    while len(merges) < rounds:
        pairs = _bpe_pair_table(cur)
        want = min(batch_size, rounds - len(merges))
        top = (
            pairs.groupBy("p")
            .agg(F.sum("cnt").alias("c"))
            .orderBy(F.desc("c"), "p")
            .limit(batch_size * 4)  # slack for conflict skips
            .collect()
        )
        if not top:
            break
        accepted: list[tuple[str, str, int]] = []
        used: set[str] = set()
        for row in top:
            if len(accepted) >= want:
                break
            a, b = row["p"].split("\x01")
            if {a, b, a + b} & used:
                continue
            accepted.append((a, b, int(row["c"])))
            used |= {a, b, a + b}
        for a, b, c in accepted:
            merges.append((len(merges) + 1, a, b, c))
            cur = cur.withColumn(
                "syms",
                F.aggregate(
                    "syms",
                    F.array().cast("array<string>"),
                    _bpe_merge_fold(a, b, a + b),
                ),
            )
        cur = cur.localCheckpoint()
    return merges


@query(
    "ns_bpe_train_batched",
    oracle=None,  # iterative argmax loop — no ANSI-SQL twin; pinned
    # equal to the sequential trainer on a compatible corpus and to
    # itself across batch sizes in tests/test_pipeline7.py.
    tags=("northstar", "pipeline", "tokenizer", "rows_only"),
)
def ns_bpe_train_batched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched-round BPE training (up to 8 compatible merges per
    distributed round — the 8-merge demo table in ~1 job instead of 8):
    the production path for vocabulary-scale training; see
    :func:`bpe_train_batched` for the exactness condition and the r9
    curve behind the batch-size default."""
    d = t(spark, sf_dir, "documents")
    words = (
        d.select(F.explode(F.split(F.trim("text"), " +")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
    )
    merges = bpe_train_batched(words)
    return spark.createDataFrame(
        [(r, a, b, a + b, c) for r, a, b, c in merges],
        "rank int, left string, right string, merged string, pair_count bigint",
    )


@query(
    "ns_bpe_train",
    oracle=None,  # iterative argmax loop — no ANSI-SQL twin; pinned
    # against a pure-Python reference BPE in tests/test_pipeline7.py.
    tags=("northstar", "pipeline", "tokenizer"),
)
def ns_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn the first 8 BPE merges from the corpus and return the
    merge table (rank, left, right, merged, pair_count) — tokenizer
    TRAINING, the op that produces the merge table ns_token_count_bpe
    applies. See :func:`bpe_train` for the distributed procedure and
    its scale shape."""
    d = t(spark, sf_dir, "documents")
    words = (
        d.select(F.explode(F.split(F.trim("text"), " +")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
    )
    merges = bpe_train(words)
    return spark.createDataFrame(
        [(r, a, b, a + b, c) for r, a, b, c in merges],
        "rank int, left string, right string, merged string, pair_count bigint",
    )


def _ensure_dsir_model(spark: SparkSession, sf_dir: str) -> str:
    """Build-or-reuse the persisted DSIR bucket model under /tmp,
    trained on the corpus slice (doc_id ≢ 7 mod 16) with lang='en' as
    the target — fingerprint-guarded against corpus refresh, the same
    rule as every derived layout (northstar._ensure_dedup_index)."""
    import os

    from map_reduce_framework_using_python_spark.operators.dsir import (
        build_dsir_model,
        model_meta,
    )
    from map_reduce_framework_using_python_spark.plans.northstar import (
        _BATCH_MOD,
        _BATCH_REM,
    )
    from map_reduce_framework_using_python_spark.sources.io import source_fingerprint

    from map_reduce_framework_using_python_spark.sources.io import layout_cache_tag

    root = os.environ.get("SPARK_GRAFT_DSIR_MODEL_ROOT", "/tmp/spark_graft_dsir")
    # Full-path tag (shared helper): same-basename corpora must not
    # thrash one model slot (r7 review).
    path = os.path.join(root, layout_cache_tag(sf_dir), "b256")
    src = source_fingerprint(os.path.join(sf_dir, "documents.parquet"))
    from map_reduce_framework_using_python_spark.operators.dsir import LAYOUT_VERSION

    meta = model_meta(path)
    if meta.get("src") == src and meta.get("layout") == LAYOUT_VERSION:
        return path
    corpus = t(spark, sf_dir, "documents").filter(
        F.col("doc_id") % _BATCH_MOD != _BATCH_REM
    )
    build_dsir_model(spark, corpus, F.col("lang") == "en", path, fingerprint=src)
    return path


#: Oracle twin of the persisted-model ingest gate: train the model on
#: the corpus slice, score the arriving slice, keep ⇔ Σ li ≥ 0 (an
#: exact BIGINT comparison on both engines).
_DSIR_GATE_ORACLE = f"""
    WITH corpus AS (SELECT * FROM documents WHERE doc_id % 16 <> 7),
         batch AS (SELECT * FROM documents WHERE doc_id % 16 = 7),
         tokc AS (SELECT substr(md5(w), 1, 2) AS b, lang
                  FROM (SELECT lang,
                               unnest(string_split_regex(trim(text), ' +')) AS w
                        FROM corpus)
                  WHERE w <> ''),
         m AS (SELECT b, count(*) AS n_r,
                      sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS n_t
               FROM tokc GROUP BY 1),
         tt AS (SELECT CAST(sum(n_r) AS BIGINT) AS t_r,
                       CAST(sum(n_t) AS BIGINT) AS t_t FROM m),
         model AS (SELECT b,
                          CAST(floor((ln(CAST(n_t + 1 AS DOUBLE) / (t_t + {_DSIR_BUCKETS}))
                                      - ln(CAST(n_r + 1 AS DOUBLE) / (t_r + {_DSIR_BUCKETS})))
                                     * {_LOG_GRID} + 0.5) AS BIGINT) AS li
                   FROM m, tt),
         tokb AS (SELECT doc_id, substr(md5(w), 1, 2) AS b
                  FROM (SELECT doc_id,
                               unnest(string_split_regex(trim(text), ' +')) AS w
                        FROM batch)
                  WHERE w <> '')
    SELECT doc_id, count(*) AS n_tokens,
           floor(CAST(CAST(sum(li) AS BIGINT) AS DOUBLE) / {_LOG_GRID}
                 * 1000000.0 + 0.5) / 1000000.0 AS log_weight,
           CAST(sum(li) AS BIGINT) >= 0 AS keep
    FROM tokb JOIN model USING (b)
    GROUP BY 1
"""


@query(
    "ns_temperature_mixture",
    oracle="""
        WITH s AS (SELECT source, count(*) AS n_docs,
                          CAST(sum(n_chars) AS BIGINT) AS mass
                   FROM documents GROUP BY 1),
             sh AS (SELECT source, n_docs, mass,
                           CAST(mass AS DOUBLE)
                               / CAST(sum(mass) OVER () AS BIGINT) AS share
                    FROM s),
             w AS (SELECT source, n_docs, mass, share,
                          CAST(floor(sqrt(share) * 1000000000.0 + 0.5)
                               AS BIGINT) AS w9
                   FROM sh),
             p AS (SELECT source, n_docs, mass, share,
                          CAST(w9 AS DOUBLE)
                              / CAST(sum(w9) OVER () AS BIGINT) AS pt
                   FROM w),
             b AS (SELECT source, n_docs, mass, share, pt,
                          pt / share AS boost
                   FROM p)
        SELECT source, n_docs,
               floor(share * 1000000.0 + 0.5) / 1000000.0 AS share,
               floor(pt * 1000000.0 + 0.5) / 1000000.0 AS p_target,
               floor(boost / max(boost) OVER () * 1000000.0 + 0.5)
                   / 1000000.0 AS sample_rate
        FROM b
    """,
    tags=("northstar", "pipeline", "mixture"),
)
def ns_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixture (the multilingual-sampling rule
    of Conneau & Lample 2019, τ = 0.5): per-source natural share of the
    corpus mass, target probability p_s ∝ share_s^τ, and the relative
    sampling rate (p_s / share_s, normalized so the most-boosted source
    samples at 1.0) — the table a mixture-realization pass (hash-
    threshold sampling, ns_stratified_sample) consumes to flatten a
    skewed source distribution without a separate counting job per
    source.

    Determinism: τ = 0.5 is computed with ``sqrt``, which IEEE 754
    requires to be correctly rounded — bit-identical on both engines
    (pow(x, τ) would not be). The weight sum crosses rows as 1e-9-grid
    BIGINTs, so no float accumulates in engine-specific order; every
    emitted double derives from identical bits and lands half-up on the
    1e-6 grid. All windows run over the ≤|sources|-row aggregate, never
    the corpus."""
    d = t(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(
        F.count("*").alias("n_docs"), F.sum("n_chars").alias("mass")
    )
    wall = Window.partitionBy()
    share = F.col("mass").cast("double") / F.sum("mass").over(wall)
    w9 = F.floor(F.sqrt(share) * 1e9 + F.lit(0.5)).cast("bigint")
    sh = s.select("source", "n_docs", "mass", share.alias("share"), w9.alias("w9"))
    pt = F.col("w9").cast("double") / F.sum("w9").over(wall)
    b = sh.select("source", "n_docs", "share", pt.alias("pt")).withColumn(
        "boost", F.col("pt") / F.col("share")
    )
    from map_reduce_framework_using_python_spark.plans.core import half_up

    return b.select(
        "source",
        "n_docs",
        half_up(F.col("share"), 6).alias("share"),
        half_up(F.col("pt"), 6).alias("p_target"),
        half_up(F.col("boost") / F.max("boost").over(wall), 6).alias("sample_rate"),
    )


@query(
    "ns_corpus_drift",
    oracle=f"""
        WITH tok AS (SELECT source, substr(md5(w), 1, 2) AS b
                     FROM (SELECT source,
                                  unnest(string_split_regex(trim(text), ' +')) AS w
                           FROM documents)
                     WHERE w <> ''),
             c AS (SELECT source, b, count(*) AS n FROM tok GROUP BY 1, 2),
             base AS (SELECT source, b, n,
                             CAST(sum(n) OVER (PARTITION BY source) AS BIGINT) AS ns,
                             CAST(sum(n) OVER (PARTITION BY b) AS BIGINT) AS nb,
                             CAST(sum(n) OVER () AS BIGINT) AS ng
                      FROM c),
             terms AS (SELECT source,
                              CAST(floor(
                                  (CAST(n + 1 AS DOUBLE) / (ns + {_DSIR_BUCKETS})
                                   - CAST(nb - n + 1 AS DOUBLE)
                                     / (ng - ns + {_DSIR_BUCKETS}))
                                  * (ln(CAST(n + 1 AS DOUBLE) / (ns + {_DSIR_BUCKETS}))
                                     - ln(CAST(nb - n + 1 AS DOUBLE)
                                          / (ng - ns + {_DSIR_BUCKETS})))
                                  * {_LOG_GRID} + 0.5) AS BIGINT) AS psi9
                       FROM base)
        SELECT source,
               floor(CAST(CAST(sum(psi9) AS BIGINT) AS DOUBLE) / {_LOG_GRID}
                     * 1000000.0 + 0.5) / 1000000.0 AS psi
        FROM terms GROUP BY 1
    """,
    tags=("northstar", "pipeline", "quality", "drift"),
)
def ns_corpus_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population stability index of each source against the REST of
    the corpus over the 256 hashed-unigram buckets:
    PSI = Σ_b (p_b − q_b)·ln(p_b/q_b), Laplace-smoothed — the standard
    drift monitor (PSI < 0.1 stable, > 0.25 shifted) a curation
    pipeline watches when a feed starts delivering different text than
    the corpus it feeds.

    Scale shape: one token explode carrying (source, 2-char bucket),
    one (source, b) hash agg — at most |sources|·256 rows after
    map-side combine — then bucket/source-keyed joins among
    model-sized tables only. Per-(source, bucket) PSI terms are
    quantized to the 1e-9 integer grid BEFORE the per-source sum
    (plans/core.py rules), so engines sum identical BIGINTs.

    A held-out-vs-corpus PSI over TIME windows is this same plan with
    ``source`` swapped for an ingest-batch id — the streaming twin
    would ride quality_gate.py's persisted bucket counts."""
    tok = (
        t(spark, sf_dir, "documents")
        .select("source", F.explode(F.split(F.trim(F.col("text")), " +")).alias("w"))
        # w <> '': the oracle filters empty tokens; without the twin
        # filter a whitespace-only document hashes a phantom '' token
        # into its source's buckets and every PSI term shifts (the
        # dsir._buckets rule — r7 pipeline review, latent on current
        # fixtures which carry no empty docs).
        .filter(F.col("w") != "")
        .select("source", F.substring(F.md5("w"), 1, 2).alias("b"))
    )
    c = tok.groupBy("source", "b").agg(F.count("*").alias("n"))
    # All three totals as WINDOWS over the ≤|sources|·256-row count
    # table — separate groupBy branches would make Catalyst re-derive c
    # from the corpus once per branch (measured: 4 full scans before
    # this rewrite; the same trap dsir_model's docstring documents).
    base = c.select(
        "source",
        "b",
        "n",
        F.sum("n").over(Window.partitionBy("source")).alias("ns"),
        F.sum("n").over(Window.partitionBy("b")).alias("nb"),
        F.sum("n").over(Window.partitionBy()).alias("ng"),
    )
    p = (F.col("n") + 1).cast("double") / (F.col("ns") + _DSIR_BUCKETS)
    q = (F.col("nb") - F.col("n") + 1).cast("double") / (
        F.col("ng") - F.col("ns") + _DSIR_BUCKETS
    )
    psi9 = F.floor((p - q) * (F.log(p) - F.log(q)) * _LOG_GRID + F.lit(0.5)).cast(
        "bigint"
    )
    terms = base.select("source", psi9.alias("psi9"))
    return terms.groupBy("source").agg(
        (
            F.floor(F.sum("psi9").cast("double") / _LOG_GRID * 1e6 + F.lit(0.5)) / 1e6
        ).alias("psi")
    )


#: The CCNet threshold-assignment as a reusable oracle fragment: a full
#: SELECT producing (doc_id, lang, li6, bucket) — consumed by
#: ns_ccnet_buckets_scaled (aggregate) and ns_ccnet_sample (realize the
#: stratified cut, plans/pipeline8.py).
_CCNET_ASSIGN_ORACLE = f"""
        WITH lm AS ({_BIGRAM_LM_ORACLE}),
             s AS (SELECT lm.doc_id, d.lang,
                          CAST(floor(avg_logp * 1000000.0 + 0.5) AS BIGINT) AS li6
                   FROM lm JOIN documents d USING (doc_id)),
             h AS (SELECT lang, li6, count(*) AS cnt FROM s GROUP BY 1, 2),
             c AS (SELECT lang, li6, cnt,
                          CAST(sum(cnt) OVER (PARTITION BY lang
                                              ORDER BY li6 DESC) AS BIGINT) AS cum,
                          CAST(sum(cnt) OVER (PARTITION BY lang) AS BIGINT) AS n
                   FROM h),
             th AS (SELECT lang,
                           max(CASE WHEN cum >= (n + 2) // 3 THEN li6 END)
                               AS t_head,
                           max(CASE WHEN cum >= (2 * n + 2) // 3 THEN li6 END)
                               AS t_mid
                    FROM c GROUP BY 1)
        SELECT s.doc_id, s.lang, li6,
               CASE WHEN li6 >= t_head THEN 'head'
                    WHEN li6 >= t_mid THEN 'middle'
                    ELSE 'tail' END AS bucket
        FROM s JOIN th USING (lang)
"""


def _ccnet_scaled_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared builder: (doc_id, lang, li6, bucket) under the
    histogram-threshold assignment — the Spark twin of
    :data:`_CCNET_ASSIGN_ORACLE`. See ns_ccnet_buckets_scaled for the
    scale rationale."""
    lm = _bigram_lm(spark, sf_dir, "shuffle")
    d = t(spark, sf_dir, "documents").select("doc_id", "lang")
    li6 = F.floor(F.col("avg_logp") * 1e6 + F.lit(0.5)).cast("bigint")
    # Persisted (lazily — the r7 discipline, same as the capstone's
    # tokc): the histogram below AND the final assignment join both
    # consume s, and their differing projections defeat ReuseExchange —
    # without the persist the ENTIRE bigram-LM pipeline (corpus scan +
    # explode + model join) is derived twice per assignment (measured
    # r14: ns_ccnet_buckets_scaled paid 2× the LM's corpus work). s is
    # one NARROW row per doc (doc_id, lang, li6 — the guide-§8
    # lightweight-proxy shape), spillable at scale via the default
    # MEMORY_AND_DISK level.
    s = persist_lane(
        "ccnet_score_proxy", sf_dir,
        lm.join(d, "doc_id").select("doc_id", "lang", li6.alias("li6")),
    )
    h = s.groupBy("lang", "li6").agg(F.count("*").alias("cnt"))
    c = h.select(
        "lang",
        "li6",
        F.sum("cnt")
        .over(Window.partitionBy("lang").orderBy(F.desc("li6")))
        .alias("cum"),
        F.sum("cnt").over(Window.partitionBy("lang")).alias("n"),
    )
    th = c.groupBy("lang").agg(
        F.max(
            F.when(F.col("cum") >= F.expr("(n + 2) DIV 3"), F.col("li6"))
        ).alias("t_head"),
        F.max(
            F.when(F.col("cum") >= F.expr("(2 * n + 2) DIV 3"), F.col("li6"))
        ).alias("t_mid"),
    )
    bucket = (
        F.when(F.col("li6") >= F.col("t_head"), "head")
        .when(F.col("li6") >= F.col("t_mid"), "middle")
        .otherwise("tail")
    )
    return s.join(F.broadcast(th), "lang").select(
        "doc_id", "lang", "li6", bucket.alias("bucket")
    )


@query(
    "ns_ccnet_buckets_scaled",
    oracle=f"""
        WITH b AS ({_CCNET_ASSIGN_ORACLE})
        SELECT lang, bucket, count(*) AS n_docs,
               floor(CAST(CAST(sum(li6) AS BIGINT) AS DOUBLE) / count(*) + 0.5)
                   / 1000000.0 AS mean_logp
        FROM b GROUP BY 1, 2
    """,
    tags=("northstar", "pipeline", "quality", "lm"),
)
def ns_ccnet_buckets_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION form of the CCNet stratification (the gated
    headline since round 6; the exact-NTILE ``ns_ccnet_buckets`` is the
    parity fixture): per-language tercile THRESHOLDS from the
    score HISTOGRAM, assigned back via a broadcast join — no window
    ever touches a corpus-sized table, so a dominant language cannot
    produce a straggler partition at 100 TB.

    Threshold semantics (deterministic, engine-portable — this is what
    makes the form fully DuckDB-oracle-able where the earlier
    ``percentile_approx`` sketch twin was not): with scores on the
    1e-6 grid, t_head(lang) = the score at descending rank ⌈n/3⌉ and
    t_mid = at rank ⌈2n/3⌉, both read off the cumulative histogram;
    head = li6 ≥ t_head, middle = li6 ≥ t_mid, tail below. All docs
    sharing a boundary score land in the same bucket (threshold
    assignment), which is where it differs from rank-splitting NTILE —
    by at most the boundary tie multiplicities (pinned in
    tests/test_pipeline7.py).

    Scale shape: the shuffle-join bigram LM, one (lang, li6) hash agg —
    the histogram, whose size is bounded by the SCORE GRID
    (range/1e-6), not the corpus — windows over that histogram only,
    a ≤|langs|-row threshold table broadcast onto the scored docs, and
    a final (lang, bucket) agg. The dominant-language window partition
    is ≤ |distinct grid values|, corpus-size-independent. Rank
    arithmetic ((n+2) DIV 3) and the cumulative sums are exact BIGINTs
    on both engines; the histogram has one row per (lang, li6), so the
    cumulative window has no ordering ties and RANGE/ROWS frames
    agree."""
    return (
        _ccnet_scaled_assign(spark, sf_dir)
        .groupBy("lang", "bucket")
        .agg(
            F.count("*").alias("n_docs"),
            (
                F.floor(F.sum("li6").cast("double") / F.count("*") + F.lit(0.5)) / 1e6
            ).alias("mean_logp"),
        )
    )


@query(
    "ns_quality_classifier",
    oracle=None,  # rows-only: the verdict table of a fitted spark.ml
    # logistic model — no SQL twin exists; the hard gate is the pytest
    # pin over THIS registry fn (AUC > 0.99, agreement > 0.95 on the
    # held slice of the planted corpus, tests/test_quality_model.py).
    tags=("northstar", "pipeline", "quality", "rows_only"),
)
def ns_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learned (fastText-style) quality classifier, gated in the
    driver's suite via a PLANTED-SIGNAL corpus generated
    deterministically inside the query (r9 verdict item 7: the
    operator was pytest-only because the synthetic corpus carries no
    real quality signal — measured AUC ≈ 0.6 on an honest fit, so a
    corpus-level query would be flaky or fake). Train on the
    doc_id%4≠3 slice (weak label = the planted ``good`` flag), score
    the HELD-OUT doc_id%4=3 slice with the broadcast-coefficient
    map-only pass (operators/quality_model.score_quality — never
    model.transform, whose closure drags the live session into tasks),
    and emit the per-document verdict table (doc_id, good, p_quality,
    keep). ``sf_dir`` is unused by construction — the fixture corpus
    IS the point; like the streaming entries, calling this runs the
    model fit (a bounded spark.ml action: 256 coefficients of driver
    state)."""
    from map_reduce_framework_using_python_spark.operators.quality_model import (
        planted_quality_corpus,
        score_quality,
        train_quality_classifier,
    )

    d = planted_quality_corpus(spark)
    train = d.filter(F.col("doc_id") % 4 != 3)
    held = d.filter(F.col("doc_id") % 4 == 3)
    model = train_quality_classifier(train, F.col("good"))
    return score_quality(held, model).join(
        held.select("doc_id", "good"), "doc_id"
    ).select("doc_id", "good", "p_quality", "keep")


@query(
    "ns_toxicity_tagger",
    oracle=None,  # rows-only: the verdict table of a fitted spark.ml
    # logistic model — no SQL twin; the hard gate is the pytest pin
    # over THIS registry fn (AUC > 0.95 and recall ≥ 0.9 at the
    # recall-first gate on the held slice, tests/test_quality_model.py).
    tags=("northstar", "pipeline", "quality", "safety", "rows_only"),
)
def ns_toxicity_tagger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Toxicity/safety-style tagger — the second registry-gated tagger
    under the planted-signal discipline (r11, VERDICT item 6),
    completing the quality-tagging story real pipelines run alongside
    DSIR/CCNet. Deliberately a HARDER planted signal than
    ns_quality_classifier's disjoint vocabularies: positives are RARE
    (15% — the fit is class-weighted, operators/quality_model.
    train_tagger_weighted) and a toxic doc is 80% neutral tokens with
    an 8-token lexicon burst (bag-of-words overlap), so the gate
    actually exercises imbalance handling. Train on the doc_id%4≠3
    slice, score the HELD-OUT doc_id%4=3 slice with the
    broadcast-coefficient map-only pass at the RECALL-FIRST operating
    point (tau=0.3 — a missed toxic doc costs more than a false flag
    sent to review), emit (doc_id, toxic, p_toxic, flagged). ``sf_dir``
    is unused by construction — the fixture corpus IS the point;
    calling this runs the model fit (bounded spark.ml action: 256
    coefficients of driver state)."""
    from map_reduce_framework_using_python_spark.operators.quality_model import (
        planted_toxicity_corpus,
        score_tagger,
        train_tagger_weighted,
    )

    d = planted_toxicity_corpus(spark)
    train = d.filter(F.col("doc_id") % 4 != 3)
    held = d.filter(F.col("doc_id") % 4 == 3)
    model = train_tagger_weighted(train, F.col("toxic"))
    return score_tagger(held, model, tau=0.3).join(
        held.select("doc_id", "toxic"), "doc_id"
    ).select("doc_id", "toxic", "p_toxic", "flagged")


@query(
    "st_toxicity_gate",
    oracle=None,
    tags=("streaming", "pipeline", "quality", "safety", "rows_only"),
)
def st_toxicity_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Toxicity tagging ON INGEST: the held slice of the planted corpus
    arrives as micro-batches (3 files → 3 AvailableNow batches) and is
    scored per batch by the tagger FITTED ONCE on the train slice
    before the stream starts — the frozen-yardstick shape of
    st_dsir_gate applied to the safety tagger. Per-batch cost: one
    map-side featurize + the broadcast-coefficient fold; the train
    slice is never touched after the fit. Rows-only (fitted spark.ml
    state); drained == one-shot score_tagger pinned in
    tests/test_quality_model.py. Like every streaming entry, calling
    this RUNS the drain and returns the materialized verdicts."""
    import tempfile

    from map_reduce_framework_using_python_spark.operators.quality_model import (
        planted_toxicity_corpus,
        train_tagger_weighted,
    )
    from map_reduce_framework_using_python_spark.streaming.quality_gate import (
        tagger_stream,
    )

    d = planted_toxicity_corpus(spark)
    train = d.filter(F.col("doc_id") % 4 != 3)
    held = d.filter(F.col("doc_id") % 4 == 3)
    model = train_tagger_weighted(train, F.col("toxic"))
    work = tempfile.mkdtemp(prefix="st_toxicity_")
    src = f"{work}/held"
    held.select("doc_id", "text").repartition(3).write.parquet(src)
    stream = spark.readStream.schema("doc_id BIGINT, text STRING").option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    return tagger_stream(
        stream, model, out_dir=f"{work}/verdicts",
        checkpoint_dir=f"{work}/ckpt", tau=0.3,
    )
