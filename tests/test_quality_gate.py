"""Pins for the persisted-model ingest quality gate
(operators/dsir.py + streaming/quality_gate.py).

The oracle gate (st_dsir_gate) already proves the drained stream equals
the SQL twin; here we pin the pieces the oracle can't see — persistence
round-trips, the fingerprint rebuild guard, micro-batch invariance
against the one-shot batch scorer, and empty-input behavior.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from map_reduce_framework_using_python_spark.operators.dsir import (
    build_dsir_model,
    dsir_gate,
    dsir_model,
    dsir_score,
    load_dsir_model,
    model_meta,
)
from map_reduce_framework_using_python_spark.plans.northstar import (
    _BATCH_MOD,
    _BATCH_REM,
)
from map_reduce_framework_using_python_spark.streaming.ingest import (
    read_documents_stream,
)
from map_reduce_framework_using_python_spark.streaming.quality_gate import gate_stream
from tests.conftest import SF_SMOKE


def _corpus(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet").filter(
        F.col("doc_id") % _BATCH_MOD != _BATCH_REM
    )


def _batch(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet").filter(
        F.col("doc_id") % _BATCH_MOD == _BATCH_REM
    )


def test_model_persistence_roundtrip(spark):
    """Scoring with the RELOADED model must equal scoring with the
    in-memory one — bit-for-bit, since the persisted table is exact
    (string bucket, BIGINT log-ratio)."""
    corpus, batch = _corpus(spark), _batch(spark)
    model = dsir_model(corpus, F.col("lang") == "en")
    with tempfile.TemporaryDirectory() as d:
        build_dsir_model(spark, corpus, F.col("lang") == "en", d)
        reloaded = load_dsir_model(spark, d)
        a = sorted(tuple(r) for r in dsir_score(batch, model).collect())
        b = sorted(tuple(r) for r in dsir_score(batch, reloaded).collect())
        assert a == b
        # the model itself round-trips exactly
        assert sorted(tuple(r) for r in model.collect()) == sorted(
            tuple(r) for r in reloaded.collect()
        )


def test_model_meta_records_fingerprint(spark):
    corpus = _corpus(spark)
    with tempfile.TemporaryDirectory() as d:
        build_dsir_model(
            spark, corpus, F.col("lang") == "en", d, fingerprint={"bytes": 123}
        )
        meta = model_meta(d)
        assert meta["buckets"] == 256
        assert meta["layout"] == 3
        assert meta["src"] == {"bytes": 123}
        # tau is the corpus median per-token ratio — a small negative
        # number here (shared-vocabulary corpus: E_r[log t/r] = −KL < 0)
        assert isinstance(meta["tau"], float) and -1.0 < meta["tau"] < 0.5
        assert model_meta(os.path.join(d, "nope")) == {}


def test_gate_stream_equals_one_shot_batch(spark):
    """Micro-batch invariance: draining the document stream through
    foreachBatch yields exactly the verdicts of one-shot scoring —
    every verdict depends only on (doc, frozen model)."""
    corpus, batch = _corpus(spark), _batch(spark)
    with tempfile.TemporaryDirectory() as d:
        model_path = os.path.join(d, "model")
        build_dsir_model(spark, corpus, F.col("lang") == "en", model_path)
        streamed = gate_stream(
            read_documents_stream(spark, SF_SMOKE).filter(
                F.col("doc_id") % _BATCH_MOD == _BATCH_REM
            ),
            model_path,
            out_dir=os.path.join(d, "out"),
            checkpoint_dir=os.path.join(d, "ckpt"),
        )
        one_shot = dsir_gate(
            batch, load_dsir_model(spark, model_path), unscored="reject"
        )
        assert sorted(tuple(r) for r in streamed.collect()) == sorted(
            tuple(r) for r in one_shot.collect()
        )


def test_gate_keep_is_the_exact_integer_verdict(spark):
    """keep ⇔ Σ li ≥ 0. In particular a tiny negative sum that ROUNDS
    to log_weight 0.0 must still be keep=False — the verdict is exact,
    not derived from the rounded display value."""
    corpus, batch = _corpus(spark), _batch(spark)
    model = dsir_model(corpus, F.col("lang") == "en")
    rows = dsir_gate(batch, model).collect()
    assert rows
    for r in rows:
        if r["log_weight"] > 0:
            assert r["keep"] is True
        if r["log_weight"] < 0:
            assert r["keep"] is False


def test_gate_stream_empty_input(spark):
    corpus = _corpus(spark)
    with tempfile.TemporaryDirectory() as d:
        model_path = os.path.join(d, "model")
        build_dsir_model(spark, corpus, F.col("lang") == "en", model_path)
        streamed = gate_stream(
            read_documents_stream(spark, SF_SMOKE).filter(F.lit(False)),
            model_path,
            out_dir=os.path.join(d, "out"),
            checkpoint_dir=os.path.join(d, "ckpt"),
        )
        assert streamed.count() == 0
        assert streamed.columns == ["doc_id", "n_tokens", "log_weight", "keep"]


# ------------------------------------------------------------ drift (PSI)


def test_drift_stream_equals_one_shot_psi(spark):
    """AvailableNow over one parquet file = one micro-batch, so the
    drained drift stream must emit exactly the one-shot PSI of the
    batch slice against the frozen corpus counts."""
    from map_reduce_framework_using_python_spark.operators.dsir import (
        load_bucket_counts,
        psi_vs_counts,
    )
    from map_reduce_framework_using_python_spark.streaming.quality_gate import (
        drift_stream,
    )

    corpus, batch = _corpus(spark), _batch(spark)
    with tempfile.TemporaryDirectory() as d:
        model_path = os.path.join(d, "model")
        build_dsir_model(spark, corpus, F.col("lang") == "en", model_path)
        streamed = drift_stream(
            read_documents_stream(spark, SF_SMOKE).filter(
                F.col("doc_id") % _BATCH_MOD == _BATCH_REM
            ),
            model_path,
            out_dir=os.path.join(d, "out"),
            checkpoint_dir=os.path.join(d, "ckpt"),
        ).collect()
        one_shot = psi_vs_counts(
            batch, load_bucket_counts(spark, model_path)
        ).collect()
        assert len(streamed) == len(one_shot) == 1
        assert (streamed[0]["n_tokens"], streamed[0]["psi"]) == (
            one_shot[0]["n_tokens"],
            one_shot[0]["psi"],
        )


def test_psi_of_corpus_against_itself_is_near_zero(spark):
    """Self-PSI must be ~0 (not exactly 0: the batch excludes nothing,
    but smoothing perturbs p and q identically, so every term is 0 up
    to the 1e-9 term grid)."""
    from map_reduce_framework_using_python_spark.operators.dsir import (
        bucket_counts,
        psi_vs_counts,
    )

    corpus = _corpus(spark)
    counts = bucket_counts(corpus, F.col("lang") == "en")
    rows = psi_vs_counts(corpus, counts).collect()
    assert len(rows) == 1
    assert abs(rows[0]["psi"]) < 1e-5


def test_psi_detects_a_shifted_batch(spark):
    """A batch drawn from a single source must read as drifted
    relative to the mixed corpus — PSI well above the self-PSI."""
    from map_reduce_framework_using_python_spark.operators.dsir import (
        bucket_counts,
        psi_vs_counts,
    )

    corpus = _corpus(spark)
    counts = bucket_counts(corpus, F.col("lang") == "en")
    one_lang = corpus.filter(F.col("lang") != "en").limit(40)
    psi = psi_vs_counts(one_lang, counts).collect()[0]["psi"]
    self_psi = psi_vs_counts(corpus, counts).collect()[0]["psi"]
    assert psi > self_psi + 0.01


def test_psi_empty_batch_emits_nothing(spark):
    from map_reduce_framework_using_python_spark.operators.dsir import (
        bucket_counts,
        psi_vs_counts,
    )

    corpus = _corpus(spark)
    counts = bucket_counts(corpus, F.col("lang") == "en")
    empty = corpus.filter(F.lit(False))
    assert psi_vs_counts(empty, counts).count() == 0


def test_stale_layout_forces_model_rebuild(spark, tmp_path, monkeypatch):
    """A persisted dir whose meta predates the counts artifact (layout
    < 2) must be rebuilt even though its source fingerprint matches —
    fingerprints version the data, LAYOUT_VERSION versions the
    artifact shape."""
    import json

    from map_reduce_framework_using_python_spark.plans.pipeline7 import (
        _ensure_dsir_model,
    )

    monkeypatch.setenv("SPARK_GRAFT_DSIR_MODEL_ROOT", str(tmp_path))
    path = _ensure_dsir_model(spark, SF_SMOKE)
    assert os.path.isdir(os.path.join(path, "counts"))
    # simulate a pre-counts artifact: drop counts, age the layout tag
    import shutil

    shutil.rmtree(os.path.join(path, "counts"))
    meta_file = os.path.join(path, "_dsir_meta.json")
    with open(meta_file) as fh:
        meta = json.load(fh)
    meta["layout"] = 1
    with open(meta_file, "w") as fh:
        json.dump(meta, fh)
    path2 = _ensure_dsir_model(spark, SF_SMOKE)
    assert path2 == path
    assert os.path.isdir(os.path.join(path, "counts"))  # rebuilt


def test_psi_counts_batch_tokens_in_reference_unseen_buckets(spark):
    """A batch token hashing to a bucket the reference never saw must
    still count (full-outer join): n_tokens covers the whole batch and
    the unseen bucket contributes a positive drift term."""
    from map_reduce_framework_using_python_spark.operators.dsir import (
        bucket_counts,
        psi_vs_counts,
    )

    ref = spark.createDataFrame(
        [(1, "alpha alpha alpha", "en")], "doc_id long, text string, lang string"
    )
    counts = bucket_counts(ref, F.col("lang") == "en")
    batch = spark.createDataFrame(
        [(2, "alpha zulu", "en")], "doc_id long, text string, lang string"
    )
    row = psi_vs_counts(batch, counts).collect()[0]
    assert row["n_tokens"] == 2  # zulu's unseen bucket still counted
    assert row["psi"] > 0


def test_semdecon_stream_equals_one_shot_batch(spark):
    """Micro-batch invariance for the semantic-decontamination gate:
    draining the embedding stream yields exactly the one-shot verdicts
    of the shared scoring core — each verdict depends only on
    (vector, frozen benchmark, tau). Multiple maxFilesPerTrigger-1
    batches would be ideal, but the parquet source is one file; the
    at-least-once read-back dedup is covered by the shared contract."""
    from map_reduce_framework_using_python_spark.operators.similarity import (
        benchmark_max_cosine,
    )
    from map_reduce_framework_using_python_spark.plans.pipeline6 import (
        _SEMDECON_TAU6,
    )
    from map_reduce_framework_using_python_spark.streaming.ann_ingest import (
        read_embeddings_stream,
    )
    from map_reduce_framework_using_python_spark.streaming.quality_gate import (
        semdecon_stream,
    )

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    bench = emb.filter(F.col("vec_id") % 16 == 7)
    with tempfile.TemporaryDirectory() as d:
        streamed = semdecon_stream(
            read_embeddings_stream(spark, SF_SMOKE).filter(
                F.col("vec_id") % 16 != 7
            ),
            bench,
            _SEMDECON_TAU6,
            out_dir=os.path.join(d, "out"),
            checkpoint_dir=os.path.join(d, "ckpt"),
        )
        one_shot = benchmark_max_cosine(
            emb.filter(F.col("vec_id") % 16 != 7), bench, _SEMDECON_TAU6
        )
        assert sorted(tuple(r) for r in streamed.collect()) == sorted(
            tuple(r) for r in one_shot.collect()
        )


def test_semdecon_stream_empty_input(spark):
    from map_reduce_framework_using_python_spark.plans.pipeline6 import (
        _SEMDECON_TAU6,
    )
    from map_reduce_framework_using_python_spark.streaming.ann_ingest import (
        read_embeddings_stream,
    )
    from map_reduce_framework_using_python_spark.streaming.quality_gate import (
        semdecon_stream,
    )

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    with tempfile.TemporaryDirectory() as d:
        out = semdecon_stream(
            read_embeddings_stream(spark, SF_SMOKE).filter(F.col("vec_id") < 0),
            emb.filter(F.col("vec_id") % 16 == 7),
            _SEMDECON_TAU6,
            out_dir=os.path.join(d, "out"),
            checkpoint_dir=os.path.join(d, "ckpt"),
        )
        assert out.count() == 0
