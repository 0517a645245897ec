"""DSIR (Data Selection via Importance Resampling, Xie et al. 2023) as
composable operators: a hashed-unigram bucket model of a TARGET
distribution vs the raw corpus, and a scorer that applies a model —
in-memory or persisted — to any document frame.

Split out of plans/pipeline7.py so the model can be TRAINED ONCE on the
corpus, persisted next to it, and then applied to data the model never
saw — the ingest-lane shape (streaming/quality_gate.py): at 100 TB you
do not re-derive corpus statistics per arriving batch; you freeze them,
fingerprint them against their source, and broadcast the fixed 256-row
table into each scoring pass.

Determinism: per-bucket log-ratios are quantized to the 1e-9 integer
grid at model-build time, so scoring is pure BIGINT summation —
micro-batch boundaries, partitionings, and engines cannot reorder a
float sum that never happens (plans/core.py rules).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

#: Hashed-feature space: first two md5 hex chars → 256 buckets. The
#: model is always exactly ≤256 rows no matter the corpus size — the
#: property that makes broadcasting it CORRECT, not just convenient.
DSIR_BUCKETS = 256

#: Fixed-point grid for the per-bucket log-ratio (plans/pipeline6.py's
#: grid — both modules must agree so oracles stay shared).
LOG_GRID = 1_000_000_000.0

_MODEL_SCHEMA = "b STRING, li BIGINT"

#: Bump when the on-disk artifact set changes (2 = model + counts,
#: 3 = + calibrated tau in the meta). A persisted dir with an older
#: layout is rebuilt even when its source fingerprint still matches —
#: fingerprints version the DATA, this versions the ARTIFACT SHAPE
#: (found the hard way: a pre-counts model dir satisfied the
#: fingerprint check and broke the drift monitor's counts read).
LAYOUT_VERSION = 3


def _buckets(docs: DataFrame, extra: list[str] | None = None) -> DataFrame:
    """(doc_id[, extra...], b): one row per token occurrence, carrying
    only the 2-hex-char bucket id — raw text never leaves the scan."""
    cols = ["doc_id", *(extra or [])]
    return (
        docs.select(
            *cols, F.explode(F.split(F.trim(F.col("text")), " +")).alias("w")
        )
        # split('', ' +') returns [''] on BOTH engines — without this
        # filter an empty/whitespace-only doc contributes one phantom
        # ''-token (bucket md5('')[0:2] = 'd4') to every model, PSI,
        # and score (r7 review). The oracle twins carry the matching
        # w <> '' filter.
        .filter(F.col("w") != "")
        .select(*cols, F.substring(F.md5("w"), 1, 2).alias("b"))
    )


def bucket_counts(docs: DataFrame, is_target: Column) -> DataFrame:
    """(b, n_r, n_t): per-bucket raw and target token-occurrence counts
    — the sufficient statistic both the DSIR model and the PSI drift
    monitor derive from. One corpus pass; map-side combine collapses
    every partition to ≤256 rows before the exchange."""
    tok = _buckets(docs.withColumn("_t", is_target), ["_t"])
    return tok.groupBy("b").agg(
        F.count("*").alias("n_r"),
        F.sum(F.when(F.col("_t"), 1).otherwise(0)).alias("n_t"),
    )


def dsir_model(docs: DataFrame, is_target: Column) -> DataFrame:
    """Laplace-smoothed target-vs-raw log-ratio per hash bucket:
    li = floor((ln p_target(b) − ln p_raw(b)) · GRID + 0.5).

    One corpus pass (bucket hash agg with map-side combine → ≤256
    rows); corpus totals come from an unpartitioned window over those
    256 rows — NOT a second corpus aggregation (see plans/pipeline7.py
    for the Catalyst re-derivation trap this avoids).
    """
    return model_from_counts(bucket_counts(docs, is_target))


def model_from_counts(m: DataFrame) -> DataFrame:
    """The (b, li) model derived from a (b, n_r, n_t) count table —
    counts in hand (freshly aggregated or reloaded from disk), this is
    pure 256-row arithmetic."""
    wall = Window.partitionBy()
    tot = m.select(
        "b",
        "n_r",
        "n_t",
        F.sum("n_r").over(wall).alias("t_r"),
        F.sum("n_t").over(wall).alias("t_t"),
    )
    li = F.floor(
        (
            F.log((F.col("n_t") + 1).cast("double") / (F.col("t_t") + DSIR_BUCKETS))
            - F.log((F.col("n_r") + 1).cast("double") / (F.col("t_r") + DSIR_BUCKETS))
        )
        * LOG_GRID
        + F.lit(0.5)
    ).cast("bigint")
    return tot.select("b", li.alias("li"))


def dsir_score(docs: DataFrame, model: DataFrame) -> DataFrame:
    """Score documents under a bucket model: (doc_id, n_tokens,
    log_weight) with log_weight = Σ li / GRID on the 1e-6 output grid.
    The model is broadcast (≤256 rows by construction); the only
    corpus-proportional exchange is the doc-keyed partial agg."""
    return (
        _buckets(docs)
        .join(F.broadcast(model), "b")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            (
                F.floor(F.sum("li").cast("double") / LOG_GRID * 1e6 + F.lit(0.5))
                / 1e6
            ).alias("log_weight"),
        )
    )


def dsir_gate(
    docs: DataFrame, model: DataFrame, tau: float = 0.0, unscored: str = "drop"
) -> DataFrame:
    """Score + keep verdict: keep ⇔ the MEAN per-token log-ratio is
    ≥ ``tau``. With the default tau=0 the document must look at least
    as target-like as not — an exact BIGINT comparison (Σ li ≥ 0), so
    the verdict is bit-stable under any partitioning or batch boundary
    (the property st_dsir_gate's oracle relies on).

    A non-zero tau is the CALIBRATED operating point: corpora whose
    target slice shares the raw vocabulary (so every doc's expected
    weight sits slightly below 0 — Jensen: E_r[log t/r] = −KL(r‖t))
    gate on the corpus's own score distribution instead of the
    absolute axis. build_dsir_model freezes the corpus median
    per-token ratio as meta['tau'] for exactly this use; the verdict
    stays exact-integer (Σ li ≥ round(tau·GRID)·n_tokens).

    ``unscored`` — what happens to a doc the gate CANNOT score (empty
    text, or every token in a bucket absent from the model, so the
    inner join on covered buckets yields no rows): ``"drop"`` (default,
    the oracle twin's behavior — the doc produces no verdict row) or
    ``"reject"`` (emit ``keep=False`` with n_tokens=0 and a NULL
    log_weight — what a PIPELINE caller wants, so no doc ever silently
    vanishes between curated and rejected; r7 review moved this here
    from a caller-side bandaid so every gate consumer shares it)."""
    if unscored not in ("drop", "reject"):
        raise ValueError(f"unscored must be 'drop' or 'reject': {unscored!r}")
    tau_grid = int(round(tau * LOG_GRID))
    scored = (
        _buckets(docs)
        .join(F.broadcast(model), "b")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            (
                F.floor(F.sum("li").cast("double") / LOG_GRID * 1e6 + F.lit(0.5))
                / 1e6
            ).alias("log_weight"),
            (F.sum("li") >= F.lit(tau_grid) * F.count("*")).alias("keep"),
        )
    )
    if unscored == "drop":
        return scored
    return (
        docs.select("doc_id")
        .join(scored, "doc_id", "left")
        .withColumn("n_tokens", F.coalesce(F.col("n_tokens"), F.lit(0)))
        .withColumn("keep", F.coalesce(F.col("keep"), F.lit(False)))
    )


# ------------------------------------------------------------ drift (PSI)


def psi_vs_counts(docs: DataFrame, counts: DataFrame) -> DataFrame:
    """Population stability index of ``docs`` against a reference
    bucket-count table: Σ_b (p_b − q_b)·ln(p_b/q_b), Laplace-smoothed,
    with p the batch distribution and q the reference — the drift
    alarm an ingest pipeline raises when a feed's text stops looking
    like the corpus its models were trained on.

    All 256 reference buckets participate (batch-absent buckets count
    0 — smoothing keeps the log finite); per-bucket terms land on the
    1e-9 integer grid before the sum. Returns one row
    ``(n_tokens, psi)``, or zero rows for a token-free batch (an empty
    batch has no distribution to compare)."""
    bc = (
        _buckets(docs)
        .groupBy("b")
        .agg(F.count("*").alias("n"))
    )
    wall = Window.partitionBy()
    # FULL outer: a batch bucket the reference never saw is exactly the
    # drift signal (p > 0 vs smoothed-floor q), and a reference bucket
    # absent from the batch still contributes its (0 vs q) term. Both
    # tables are ≤256 rows — the join is trivia either way.
    j = (
        counts.join(bc, "b", "full")
        .select(
            "b",
            F.coalesce(F.col("n"), F.lit(0)).alias("n"),
            F.coalesce(F.col("n_r"), F.lit(0)).alias("n_r"),
        )
        .select(
            "n",
            "n_r",
            F.sum("n").over(wall).alias("nt"),
            F.sum("n_r").over(wall).alias("rt"),
        )
    )
    p = (F.col("n") + 1).cast("double") / (F.col("nt") + DSIR_BUCKETS)
    q = (F.col("n_r") + 1).cast("double") / (F.col("rt") + DSIR_BUCKETS)
    psi9 = F.floor((p - q) * (F.log(p) - F.log(q)) * LOG_GRID + F.lit(0.5)).cast(
        "bigint"
    )
    return (
        j.select(psi9.alias("psi9"), F.col("nt").alias("n_tokens"))
        .groupBy("n_tokens")
        .agg(
            (
                F.floor(F.sum("psi9").cast("double") / LOG_GRID * 1e6 + F.lit(0.5))
                / 1e6
            ).alias("psi")
        )
        .filter(F.col("n_tokens") > 0)
        .select("n_tokens", "psi")
    )


# ------------------------------------------------------------ persistence


def build_dsir_model(
    spark: SparkSession,
    docs: DataFrame,
    is_target: Column,
    path: str,
    fingerprint: dict | None = None,
) -> None:
    """Train the bucket model and persist it (parquet + meta manifest),
    alongside the raw bucket COUNTS it derives from — the sufficient
    statistic the ingest drift monitor (psi_vs_counts) compares
    arriving batches against, frozen at the same instant as the model.

    ``fingerprint`` should be ``source_fingerprint(<corpus parquet>)``
    (sources/io.py) — the stale-layout guard every derived artifact in
    this repo stores: a regenerated corpus with the same cardinality
    still forces a rebuild (NOTES.md round-4 hardening)."""
    bucket_counts(docs, is_target).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "counts")
    )
    # Derive the model from the counts JUST WRITTEN — one corpus pass
    # total, and the persisted pair is consistent by construction.
    model_from_counts(load_bucket_counts(spark, path)).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(path, "model"))
    # Calibrated operating point: the corpus's own median per-token
    # log-ratio, frozen with the model. dsir_gate(tau=meta['tau'])
    # then keeps "the better-than-median half" — the right gate when
    # target and raw share a vocabulary and the absolute axis is
    # uninformative (see dsir_gate's docstring). One scoring pass over
    # the training docs, a percentile_approx agg; the driver receives
    # one float (model state).
    scored = dsir_score(docs, load_dsir_model(spark, path))
    tau_row = scored.agg(
        F.percentile_approx(
            F.col("log_weight") / F.col("n_tokens"), 0.5, 100000
        ).alias("tau")
    ).first()
    with open(os.path.join(path, "_dsir_meta.json"), "w") as fh:
        json.dump(
            {
                "buckets": DSIR_BUCKETS,
                "layout": LAYOUT_VERSION,
                "tau": float(tau_row["tau"] if tau_row["tau"] is not None else 0.0),
                "src": fingerprint or {},
            },
            fh,
        )


def load_dsir_model(spark: SparkSession, path: str) -> DataFrame:
    """Read a persisted model with its explicit schema (an empty model
    dir must still probe cleanly — the dedup-index lesson)."""
    return spark.read.schema(_MODEL_SCHEMA).parquet(os.path.join(path, "model"))


def load_bucket_counts(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema("b STRING, n_r BIGINT, n_t BIGINT").parquet(
        os.path.join(path, "counts")
    )


def model_meta(path: str) -> dict:
    meta_path = os.path.join(path, "_dsir_meta.json")
    if not os.path.exists(meta_path):
        return {}
    with open(meta_path) as fh:
        return json.load(fh)
