"""Pins for the learned quality classifier (operators/quality_model.py).

The synthetic corpus's languages and sources share one vocabulary
(measured — an honest fit tops out near AUC 0.6), so a corpus-level
"quality" query would be either flaky or fake. The operator is pinned
on the package's planted-signal corpus instead
(operators/quality_model.planted_quality_corpus): quality and junk
documents draw from shifted vocabularies, and the classifier must
separate them almost perfectly, score deterministically, and agree
with the generative DSIR ratio on the same planted signal. Since r10
the same fixture gates the REGISTRY query ns_quality_classifier, so
the driver's suite exercises the operator too — the hard AUC gate over
that query lives here.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from map_reduce_framework_using_python_spark.operators.quality_model import (
    auc,
    planted_quality_corpus as _planted_corpus,
    score_quality,
    train_quality_classifier,
)


def test_classifier_separates_planted_signal(spark):
    d = _planted_corpus(spark)
    train = d.filter(F.col("doc_id") % 4 != 3)
    held = d.filter(F.col("doc_id") % 4 == 3)
    model = train_quality_classifier(train, F.col("good"))
    scored = score_quality(held, model).join(held.select("doc_id", "good"), "doc_id")
    assert auc(scored, "p_quality", "good") > 0.99
    agree = scored.filter(F.col("keep") == F.col("good")).count() / scored.count()
    assert agree > 0.95


def test_classifier_scores_are_fit_deterministic(spark):
    d = _planted_corpus(spark)
    lab = F.col("good")
    a = score_quality(d, train_quality_classifier(d, lab)).collect()
    b = score_quality(d, train_quality_classifier(d, lab)).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_classifier_and_dsir_agree_on_planted_signal(spark):
    """The discriminative (LR) and generative (DSIR ratio) models must
    rank the same planted-vocabulary docs on the same side."""
    from map_reduce_framework_using_python_spark.operators.dsir import (
        dsir_gate,
        dsir_model,
    )

    d = _planted_corpus(spark)
    lr = train_quality_classifier(d, F.col("good"))
    lr_scores = score_quality(d, lr)
    gen = dsir_gate(d, dsir_model(d, F.col("good")))
    j = (
        lr_scores.select("doc_id", "keep")
        .join(gen.select("doc_id", F.col("keep").alias("gen_keep")), "doc_id")
        .join(d.select("doc_id", "good"), "doc_id")
    )
    n = j.count()
    assert j.filter(F.col("keep") == F.col("gen_keep")).count() / n > 0.95
    assert j.filter(F.col("gen_keep") == F.col("good")).count() / n > 0.95


def test_auc_helper_is_correct_on_known_cases(spark):
    df = spark.createDataFrame(
        [(0.9, True), (0.8, False), (0.7, True), (0.1, False)],
        "s double, y boolean",
    )
    # pairs: (0.9,0.8)+, (0.9,0.1)+, (0.7,0.8)-, (0.7,0.1)+ → 3/4
    assert abs(auc(df, "s", "y") - 0.75) < 1e-9
    perfect = spark.createDataFrame(
        [(0.9, True), (0.8, True), (0.2, False)], "s double, y boolean"
    )
    assert abs(auc(perfect, "s", "y") - 1.0) < 1e-9
    # ties get average ranks: all-equal scores → AUC exactly 0.5
    tied = spark.createDataFrame(
        [(0.5, True), (0.5, False), (0.5, True), (0.5, False)],
        "s double, y boolean",
    )
    assert abs(auc(tied, "s", "y") - 0.5) < 1e-9


def test_featurize_and_auc_guards(spark):
    """r7 operators-2 review pins: (a) empty/whitespace docs contribute
    no phantom '' feature and NULL weak labels train as not-positive
    instead of killing fit; (b) auc excludes truth values that cast to
    NULL boolean instead of letting them hold ranks."""
    from pyspark.sql import functions as F

    from map_reduce_framework_using_python_spark.operators.quality_model import (
        auc,
        score_quality,
        train_quality_classifier,
    )

    docs = spark.createDataFrame(
        [(1, "good clean text here", "en"), (2, "   ", None),
         (3, "spam spam spam", "xx"), (4, "more good text", "en")],
        "doc_id long, text string, lang string",
    )
    model = train_quality_classifier(docs, F.col("lang") == "en")  # NULL lang ok
    scored = score_quality(docs, model)
    assert scored.count() == 4
    truthy = scored.withColumn(
        "truth",
        F.when(F.col("doc_id") == 1, "true")
        .when(F.col("doc_id") == 3, "false")
        .otherwise("unknown"),  # casts to NULL boolean: must not rank
    )
    a = auc(truthy, score_col="p_quality", truth_col="truth")
    assert 0.0 <= a <= 1.0


def test_registry_query_separates_planted_signal(spark):
    """The driver-facing ns_quality_classifier query (the r10 registry
    presence for this operator) must carry the SAME guarantee as the
    operator pins: near-perfect separation on its held-out slice of
    the deterministic planted corpus, in both threshold (keep) and
    ranking (AUC) terms, with one verdict row per held-out doc."""
    from map_reduce_framework_using_python_spark.plans.core import REGISTRY

    scored = REGISTRY["ns_quality_classifier"].fn(spark, "unused").cache()
    n = scored.count()
    assert n == _planted_corpus(spark).filter(F.col("doc_id") % 4 == 3).count()
    agree = scored.filter(F.col("keep") == F.col("good")).count() / n
    assert agree > 0.95
    assert auc(scored, "p_quality", "good") > 0.99
    scored.unpersist()


def test_toxicity_tagger_recall_first_gate(spark):
    """The second registry-gated tagger (r11): class-weighted fit on a
    RARE-positive (15%) mixed-vocabulary burst corpus, scored at the
    recall-first operating point (tau=0.3). Pins: AUC > 0.95 ranking,
    recall ≥ 0.9 on held-out positives (the property a safety screen
    is FOR), precision > 0.5 (over-flagging is allowed, flooding is
    not), one verdict row per held doc, fit determinism."""
    from map_reduce_framework_using_python_spark.operators.quality_model import (
        auc,
        planted_toxicity_corpus,
    )
    from map_reduce_framework_using_python_spark.plans.core import REGISTRY

    scored = REGISTRY["ns_toxicity_tagger"].fn(spark, "unused").cache()
    n = scored.count()
    held = planted_toxicity_corpus(spark).filter(F.col("doc_id") % 4 == 3)
    assert n == held.count()
    pos = scored.filter(F.col("toxic"))
    n_pos = pos.count()
    assert 0 < n_pos < 0.3 * n  # the imbalance is real (planted 15%)
    recall = pos.filter(F.col("flagged")).count() / n_pos
    assert recall >= 0.9, recall
    n_flagged = scored.filter(F.col("flagged")).count()
    precision = pos.filter(F.col("flagged")).count() / max(1, n_flagged)
    assert precision > 0.5, precision
    assert auc(scored, "p_toxic", "toxic") > 0.95
    again = REGISTRY["ns_toxicity_tagger"].fn(spark, "unused")
    assert sorted(map(tuple, scored.collect())) == sorted(
        map(tuple, again.collect())
    )
    scored.unpersist()


def test_weighted_trainer_guards_single_class(spark):
    """A single-class corpus must fail loudly at fit time (the AUC
    downstream is undefined), not crash inside spark.ml."""
    import pytest as _pytest

    from map_reduce_framework_using_python_spark.operators.quality_model import (
        train_tagger_weighted,
    )

    docs = spark.createDataFrame(
        [(1, "alpha bridge", True), (2, "cloud delta", True)],
        "doc_id long, text string, toxic boolean",
    )
    with _pytest.raises(ValueError, match="single-class"):
        train_tagger_weighted(docs, F.col("toxic"))


def test_toxicity_stream_equals_one_shot(spark):
    """The streaming tagger gate (st_toxicity_gate) must drain to
    exactly the one-shot score_tagger verdicts over the same held
    slice under the same frozen model — each verdict depends only on
    (doc, model), so micro-batch boundaries cannot change it."""
    from map_reduce_framework_using_python_spark.operators.quality_model import (
        planted_toxicity_corpus,
        score_tagger,
        train_tagger_weighted,
    )
    from map_reduce_framework_using_python_spark.plans.core import REGISTRY

    streamed = REGISTRY["st_toxicity_gate"].fn(spark, "unused").collect()
    d = planted_toxicity_corpus(spark)
    model = train_tagger_weighted(
        d.filter(F.col("doc_id") % 4 != 3), F.col("toxic")
    )
    oneshot = score_tagger(
        d.filter(F.col("doc_id") % 4 == 3), model, tau=0.3
    ).collect()
    assert sorted(map(tuple, streamed)) == sorted(map(tuple, oneshot))
