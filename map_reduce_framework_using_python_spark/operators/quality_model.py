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

    cols = ["doc_id", F.split(F.trim(F.col("text")), " +").alias("toks")]
    if label is not None:
        cols.append(label.cast("double").alias("label"))
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
    and the model's own decision. Map-only: the 256-dim model is a
    broadcast task binary; no shuffle at all."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(_featurize(docs))
    return scored.select(
        "doc_id",
        (
            F.floor(
                vector_to_array(F.col("probability"))[1] * 1e6 + F.lit(0.5)
            )
            / 1e6
        ).alias("p_quality"),
        (F.col("prediction") > 0.5).alias("keep"),
    )


def auc(scored_with_truth: DataFrame, score_col: str, truth_col: str) -> float:
    """Exact ROC-AUC via the rank-sum (Mann–Whitney) identity, computed
    distributed: AUC = (Σ ranks of positives − n⁺(n⁺+1)/2) / (n⁺·n⁻),
    with average ranks for score ties. One window over the score order
    + one aggregate — no driver-side sklearn."""
    from pyspark.sql import Window

    w = Window.orderBy(score_col)
    ranked = scored_with_truth.select(
        F.col(truth_col).cast("int").alias("y"),
        F.avg(F.row_number().over(w)).over(Window.partitionBy(score_col)).alias("r"),
    )
    agg = ranked.agg(
        F.sum(F.when(F.col("y") == 1, F.col("r"))).alias("rp"),
        F.sum(F.when(F.col("y") == 1, 1).otherwise(0)).alias("np"),
        F.sum(F.when(F.col("y") == 0, 1).otherwise(0)).alias("nn"),
    ).first()
    if not agg["np"] or not agg["nn"]:
        raise ValueError(
            f"AUC undefined: {agg['np'] or 0} positives, {agg['nn'] or 0} negatives"
        )
    return float(
        (agg["rp"] - agg["np"] * (agg["np"] + 1) / 2.0) / (agg["np"] * agg["nn"])
    )
