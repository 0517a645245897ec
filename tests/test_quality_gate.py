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
        assert model_meta(d) == {"buckets": 256, "src": {"bytes": 123}}
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
        one_shot = dsir_gate(batch, load_dsir_model(spark, model_path))
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
