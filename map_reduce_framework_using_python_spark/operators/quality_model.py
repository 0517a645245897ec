"""Trained quality classifier: the discriminative twin of the DSIR
generative ratio (operators/dsir.py), over the same idea of hashed
bag-of-words features.

This is the fastText-style quality model of the GPT-3/LLaMA data
pipelines: take a weakly-labeled "high quality" slice (here the
``lang='en'`` documents — the same weak label DSIR targets), featurize
documents as hashed term-frequency vectors, fit a logistic regression,
and score everything. DSIR answers "how target-like is this document"
with closed-form count ratios; the classifier answers it with a learned
decision boundary that can also weigh NEGATIVE evidence (a bucket
common in the raw corpus but rare in the target pulls the score down
only as much as the fitted weight says, not as much as the raw ratio).

Spark-first shape: ``Tokenizer``-free (split is a plain expression),
``HashingTF`` (murmur3, fixed 256-dim — the spark.ml twin of the md5
bucketing in operators/dsir.py), ``LogisticRegression`` via
L-BFGS ``treeAggregate`` (driver holds only the 256-dim coefficient
vector — model state, like the k-means centroids). Scoring is a
map-only pass with the broadcast model; nothing corpus-sized ever
reaches the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Feature space width — matches DSIR_BUCKETS so the two models are
#: comparable experiments on the same capacity.
N_FEATURES = 256


def _featurize(docs: DataFrame, label: Column | None = None):
    from pyspark.ml.feature import HashingTF

    # array_remove '': split('', ' +') yields [''] for empty/whitespace
    # docs, which would hash a phantom feature into murmur3('')'s
    # bucket — the dsir._buckets w != '' rule, propagated to the
    # declared twin (r7 operators-2 review).
    toks = F.array_remove(F.split(F.trim(F.col("text")), " +"), "")
    cols = ["doc_id", toks.alias("toks")]
    if label is not None:
        # NULL weak labels (e.g. lang IS NULL under lang == 'en') map to
        # not-positive, matching dsir.bucket_counts' when/otherwise —
        # a NULL label would otherwise kill LogisticRegression.fit with
        # an opaque executor error.
        cols.append(
            F.when(label, F.lit(1.0)).otherwise(F.lit(0.0)).alias("label")
        )
    tf = HashingTF(inputCol="toks", outputCol="features", numFeatures=N_FEATURES)
    return tf.transform(docs.select(*cols))


def train_quality_classifier(docs: DataFrame, is_positive: Column):
    """Fit the 256-dim logistic model on weakly-labeled documents.
    Returns the fitted ``LogisticRegressionModel`` (driver-side state:
    one 256-float vector + intercept)."""
    from pyspark.ml.classification import LogisticRegression

    lr = LogisticRegression(
        featuresCol="features",
        labelCol="label",
        maxIter=50,
        regParam=0.01,
        standardization=True,
    )
    return lr.fit(_featurize(docs, is_positive))


def score_quality(docs: DataFrame, model) -> DataFrame:
    """(doc_id, p_quality, keep): P(positive | doc) under the fitted
    model, quantized to the 1e-6 grid for stable downstream compares,
    and the model's decision at the default 0.5 threshold (margin > 0).

    Deliberately NOT ``model.transform``: the fitted
    ``LogisticRegressionModel`` carries its training summary, and the
    summary holds the live ``SparkSession`` — so the transform UDF's
    closure drags the whole session (including its non-serializable
    ``ObservationManager``) into every task, which crashes with
    ``Task not serializable`` as soon as the session has ever run an
    ``Observation``. The model STATE is just 256 coefficients + an
    intercept, so we lift those to the driver once (exactly like the
    k-means centroids in operators/clustering.py) and score with JVM
    array expressions over the hashed features: margin = b + Σ wᵢxᵢ,
    p = σ(margin). Map-only, whole-stage-codegen, nothing but literals
    in the closure — the shape a 100 TB scoring pass wants anyway."""
    from pyspark.ml.functions import vector_to_array

    coef = [float(c) for c in model.coefficients]
    intercept = float(model.intercept)
    x = vector_to_array(F.col("features"))
    w = F.array(*[F.lit(c) for c in coef])
    margin = F.lit(intercept) + F.aggregate(
        F.zip_with(x, w, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))
    return _featurize(docs).select(
        "doc_id",
        (F.floor(p * 1e6 + F.lit(0.5)) / 1e6).alias("p_quality"),
        (margin > 0).alias("keep"),
    )


def auc(scored_with_truth: DataFrame, score_col: str, truth_col: str) -> float:
    """Exact ROC-AUC via the rank-sum (Mann–Whitney) identity with
    average ranks for score ties — computed WITHOUT a global window.

    A ``row_number() OVER (ORDER BY score)`` funnels the whole scored
    corpus through one task (the scale-killer ``operators/ranks.py``
    exists to avoid), and ties only ever occur at EQUAL scores — so the
    corpus-sized rank pass collapses to a per-score aggregate: for each
    distinct score, (row count, positive count); the average rank of
    that tie group is ``rows_below + (cnt + 1)/2``. The prefix count of
    strictly-smaller scores comes from :func:`~.ranks.bucketed_cumsum`
    over the per-score table — which is bounded by the score grid
    (``score_quality`` emits the 1e-6 grid), never corpus-sized, and
    the cumsum itself is the two-pass bucketed shape, no single-task
    window anywhere. One final aggregate pulls three scalars.

    NULL-truth rows are EXCLUDED before ranking — an unlabeled row
    must neither hold a rank nor join a class, or the rank-sum counts
    (positive, unlabeled) pairs and the "AUC" can exceed 1 (the
    replaced window implementation had exactly that latent bug). NaN
    scores sort last (Spark double order), so their bucket is pinned
    above every finite floor(s·16); a NULL score fails fast via the
    bucketed_cumsum non-null contract."""
    from map_reduce_framework_using_python_spark.operators.ranks import (
        bucketed_cumsum,
    )

    # Classify and filter on try_cast: a truth value that is not a
    # valid boolean (e.g. the string 'unknown') must neither throw
    # (ANSI cast) nor pass an isNotNull filter to hold a rank while
    # joining neither class — that inflated the AUC (r7 review).
    truth = F.col(truth_col).try_cast("boolean")
    labeled = scored_with_truth.filter(truth.isNotNull())
    per_score = labeled.groupBy(F.col(score_col).alias("_s")).agg(
        F.count("*").alias("_cnt"),
        F.sum(F.when(truth, 1).otherwise(0)).alias("_pos"),
        F.sum(F.when(~truth, 1).otherwise(0)).alias("_neg"),
    )
    # floor(s*16) is monotone along s (negatives included) — the
    # order-consistent bucket contract of bucketed_cumsum. NaN sorts
    # ABOVE every double in Spark's ordering, but floor(NaN*16) would
    # land it in bucket 0 — pin it to a sentinel above any finite
    # bucket instead so the contract holds.
    bucket = F.when(F.isnan(F.col("_s")), F.lit(2**62).cast("long")).otherwise(
        F.floor(F.col("_s") * 16)
    )
    cum = bucketed_cumsum(
        per_score,
        bucket=bucket,
        order_by=[F.col("_s")],
        weight=F.col("_cnt"),
        cum_col="_cum",
    )
    avg_rank = (F.col("_cum") - F.col("_cnt")) + (F.col("_cnt") + 1) / 2.0
    agg = cum.agg(
        F.sum(F.col("_pos") * avg_rank).alias("rp"),
        F.sum("_pos").alias("np"),
        F.sum("_neg").alias("nn"),
    ).first()
    if not agg["np"] or not agg["nn"]:
        raise ValueError(
            f"AUC undefined: {agg['np'] or 0} positives, {agg['nn'] or 0} negatives"
        )
    return float(
        (agg["rp"] - agg["np"] * (agg["np"] + 1) / 2.0) / (agg["np"] * agg["nn"])
    )


def train_tagger_weighted(docs: DataFrame, is_positive: Column):
    """Class-imbalance-aware twin of :func:`train_quality_classifier`
    for RARE-positive taggers (toxicity/safety screens run at 1–15%
    positive rates, where an unweighted logistic fit under-weights the
    minority class and the recall-first operating point suffers):
    positives are weighted ``n_neg/n_pos`` so both classes contribute
    equal total loss — the standard balanced-class reweighting. The
    class counts come from ONE bounded aggregate (two longs to the
    driver); fails loudly on a single-class corpus, where the fit (and
    AUC downstream) is undefined."""
    from pyspark.ml.classification import LogisticRegression

    feats = _featurize(docs, is_positive)
    counts = feats.agg(
        F.sum("label").alias("pos"), F.count("*").alias("n")
    ).first()
    pos, n = int(counts["pos"] or 0), int(counts["n"])
    if pos == 0 or pos == n:
        raise ValueError(
            f"train_tagger_weighted: single-class corpus ({pos}/{n} positive)"
        )
    w_pos = float(n - pos) / float(pos)
    weighted = feats.withColumn(
        "w",
        F.when(F.col("label") == 1.0, F.lit(w_pos)).otherwise(F.lit(1.0)),
    )
    lr = LogisticRegression(
        featuresCol="features",
        labelCol="label",
        weightCol="w",
        maxIter=50,
        regParam=0.01,
        standardization=True,
    )
    return lr.fit(weighted)


def score_tagger(
    docs: DataFrame,
    model,
    tau: float = 0.3,
    score_col: str = "p_toxic",
    flag_col: str = "flagged",
) -> DataFrame:
    """(doc_id, <score_col>, <flag_col>): P(positive | doc) under the
    fitted model at an EXPLICIT operating point — safety taggers gate
    recall-first (``tau`` below 0.5 over-flags by design; a missed
    toxic document costs more than a false flag sent to review). Same
    broadcast-coefficient map-only scoring as :func:`score_quality`
    (never ``model.transform`` — its closure drags the live session
    into tasks); the flag compares the 1e-6-QUANTIZED probability to
    ``tau`` so the verdict is grid-stable across runs and engines."""
    from pyspark.ml.functions import vector_to_array

    coef = [float(c) for c in model.coefficients]
    intercept = float(model.intercept)
    x = vector_to_array(F.col("features"))
    w = F.array(*[F.lit(c) for c in coef])
    margin = F.lit(intercept) + F.aggregate(
        F.zip_with(x, w, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))
    pq = F.floor(p * 1e6 + F.lit(0.5)) / 1e6
    return _featurize(docs).select(
        "doc_id",
        pq.alias(score_col),
        (pq > F.lit(tau)).alias(flag_col),
    )


#: Planted-signal vocabularies: quality and junk documents draw from
#: DISJOINT token sets, so a correct classifier separates them almost
#: perfectly while any feature/weighting regression craters the AUC.
_PLANTED_GOOD = (
    "the quick brown fox jumps over the lazy dog with great prose".split()
)
_PLANTED_JUNK = "zx qq kpw vrt zzz uu glorp blat xx yy wub nrg".split()


#: Toxicity-tagger planted vocabularies. Unlike the quality corpus's
#: DISJOINT vocabularies, toxic documents here are MOSTLY neutral text
#: with a BURST of lexicon tokens mixed in — the mixed-signal shape a
#: real safety screen faces — and positives are RARE (15%), so the
#: gate also exercises the class-weighted fit and the recall-first
#: operating point. All lexicon tokens are nonsense placeholders.
_NEUTRAL_VOCAB = (
    "alpha bridge cloud delta ember forest garden harbor island jungle "
    "keel lumen meadow north opal prism quartz river stone timber"
).split()
_TOXIC_LEXICON = "grawlix snarlwort hexbane viletongue cursefang blightmaw".split()


def planted_toxicity_corpus(
    spark,
    n: int = 600,
    seed: int = 11,
    toxic_frac: float = 0.15,
    burst: int = 8,
    doc_len: int = 40,
) -> DataFrame:
    """Deterministic planted-signal corpus for gating the toxicity
    tagger: every doc draws ``doc_len`` neutral tokens; ``toxic_frac``
    of docs get ``burst`` random positions overwritten from the toxic
    lexicon (so a toxic doc is still 80% neutral — bag-of-words overlap
    the quality corpus deliberately lacks). Seeded ``random.Random`` →
    bit-identical rows across runs and consumers (the
    planted_quality_corpus rule)."""
    import random

    rng = random.Random(seed)
    rows = []
    for i in range(n):
        toks = [rng.choice(_NEUTRAL_VOCAB) for _ in range(doc_len)]
        toxic = rng.random() < toxic_frac
        if toxic:
            for p in rng.sample(range(doc_len), burst):
                toks[p] = rng.choice(_TOXIC_LEXICON)
        rows.append((i, " ".join(toks), toxic))
    return spark.createDataFrame(rows, "doc_id long, text string, toxic boolean")


def planted_quality_corpus(spark, n: int = 400, seed: int = 7) -> DataFrame:
    """Deterministic planted-signal corpus for gating the learned
    quality classifier: the synthetic testdata's languages and sources
    share one vocabulary (measured — an honest corpus fit tops out
    near AUC 0.6), so the operator is gated on a corpus with a REAL
    signal instead: ~half the docs draw 30 tokens from the good
    vocabulary, half from the junk one, label independent of doc_id
    parity. Seeded ``random.Random`` → bit-identical rows across runs,
    machines, and the registry/pytest consumers (the ns_hash_sample
    determinism rule applied to a fixture)."""
    import random

    rng = random.Random(seed)
    rows = []
    for i in range(n):
        good = rng.random() < 0.5
        vocab = _PLANTED_GOOD if good else _PLANTED_JUNK
        rows.append((i, " ".join(rng.choice(vocab) for _ in range(30)), good))
    return spark.createDataFrame(rows, "doc_id long, text string, good boolean")
